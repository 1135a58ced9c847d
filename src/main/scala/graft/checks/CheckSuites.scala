package graft.checks

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Runtime-loaded declarative DQ suites — the reference's Great
  * Expectations workflow (etl/utils/base_table.py:155-167: pick
  * `expectations/<table>.json` by table name at run time, skip when the
  * file is absent) re-expressed over the compiled [[Check]] ADT: the JSON
  * is the CONFIG surface a data steward edits without recompiling, the
  * ADT stays the single evaluator ([[Checks.evaluate]], one aggregation
  * job per rule). Parsing is strict — an unknown expectation type or a
  * malformed rule throws rather than silently disabling a gate.
  */
object CheckSuites {

  /** `<suiteDir>/<table>.json` → checks; None when no suite file exists
    * (the reference's "skip validation" case, base_table.py:161-166).
    */
  def load(suiteDir: String, table: String): Option[Seq[Check]] = {
    val p = Paths.get(suiteDir, s"$table.json")
    if (!Files.isRegularFile(p)) None
    else Some(parse(Files.readString(p)))
  }

  /** Parse one GE-style expectation suite document (the reference's own
    * files parse unchanged: expectations/orders.json, fact_orders.json,
    * daily_order_metrics.json).
    */
  def parse(json: String): Seq[Check] = {
    val doc = JsonMethods.parse(json)
    (doc \ "expectations") match {
      case JArray(exps) => exps.map(expectation)
      case other => throw new IllegalArgumentException(
        s"expectation suite needs an 'expectations' array, got $other")
    }
  }

  private def expectation(e: JValue): Check = {
    val kwargs = e \ "kwargs"
    def str(k: String): String = (kwargs \ k) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(
        s"kwargs.$k: expected string, got $other")
    }
    def num(k: String): Double = (kwargs \ k) match {
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JString(s) => s.toDouble
      case other => throw new IllegalArgumentException(
        s"kwargs.$k: expected number, got $other")
    }
    // GE serializes booleans inconsistently (the reference's own suite
    // has "strict_max": "True") — accept both spellings
    def bool(k: String, default: Boolean): Boolean = (kwargs \ k) match {
      case JBool(b) => b
      case JString(s) => s.equalsIgnoreCase("true")
      case JNothing | JNull => default
      case other => throw new IllegalArgumentException(
        s"kwargs.$k: expected boolean, got $other")
    }
    def strings(k: String): Seq[String] = (kwargs \ k) match {
      case JArray(xs) => xs.map {
        case JString(s) => s
        case JInt(i) => i.toString
        case JLong(l) => l.toString
        case JDouble(d) => d.toString
        case other => throw new IllegalArgumentException(
          s"kwargs.$k: non-scalar element $other")
      }
      case other => throw new IllegalArgumentException(
        s"kwargs.$k: expected array, got $other")
    }
    (e \ "expectation_type") match {
      case JString("expect_column_values_to_be_unique") =>
        Unique(Seq(str("column")))
      case JString("expect_compound_columns_to_be_unique") =>
        Unique(strings("column_list"))
      case JString("expect_column_max_to_be_between") =>
        MaxInRange(str("column"), num("min_value"), num("max_value"),
          strict = bool("strict_max", default = false))
      case JString("expect_column_values_to_not_be_null") =>
        (kwargs \ "mostly") match {
          case JNothing | JNull => NotNull(Seq(str("column")))
          case _ => NullRatioBelow(str("column"), 1.0 - num("mostly"))
        }
      case JString("expect_table_row_count_to_be_between") =>
        RowCountInRange(num("min_value").toLong, num("max_value").toLong)
      case JString("expect_column_values_to_be_in_set") =>
        ValuesInSet(str("column"), strings("value_set"))
      case JString(other) => throw new IllegalArgumentException(
        s"unsupported expectation_type '$other' — a skipped rule is a " +
          "disabled gate, refusing to load the suite")
      case other => throw new IllegalArgumentException(
        s"expectation needs a string expectation_type, got $other")
    }
  }
}
