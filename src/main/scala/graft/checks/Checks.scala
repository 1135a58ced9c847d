package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gate: a ~100-LoC replacement for the reference's Great
  * Expectations dependency (etl/utils/base_table.py:140-196 + the JSON
  * suites under etl/great_expectations/expectations). The reference's three suites
  * express exactly two check kinds: column-uniqueness (`order_id`,
  * `order_date`) and a bounded max (`total_price_mean` strictly inside
  * (0, 100000)); both are modeled as ADT cases evaluated with single-pass
  * aggregations (no per-row collect — scales to arbitrary table sizes).
  */
sealed trait Check {
  def description: String
}

/** expect_column_values_to_be_unique (per column set). */
final case class Unique(columns: Seq[String]) extends Check {
  override def description: String = s"unique(${columns.mkString(", ")})"
}

/** expect_column_max_to_be_between(column, lo, hi, strict_max). */
final case class MaxInRange(
    column: String, lo: Double, hi: Double, strict: Boolean = true)
    extends Check {
  override def description: String =
    s"max($column) in ${if (strict) s"($lo, $hi)" else s"[$lo, $hi]"}"
}

/** expect_column_values_to_not_be_null. */
final case class NotNull(columns: Seq[String]) extends Check {
  override def description: String = s"not_null(${columns.mkString(", ")})"
}

/** expect_column_values_to_not_be_null(mostly = 1 − maxRatio): tolerate
  * a bounded null fraction — the practical form for optional fields fed
  * by flaky upstreams.
  */
final case class NullRatioBelow(column: String, maxRatio: Double)
    extends Check {
  override def description: String = s"null_ratio($column) <= $maxRatio"
}

/** expect_table_row_count_to_be_between — the cheapest canary for a
  * broken upstream extract (0 rows) or a runaway join (row explosion).
  */
final case class RowCountInRange(lo: Long, hi: Long) extends Check {
  override def description: String = s"row_count in [$lo, $hi]"
}

/** expect_column_values_to_be_in_set (categorical domain pin). */
final case class ValuesInSet(column: String, allowed: Seq[String])
    extends Check {
  override def description: String =
    s"$column in {${allowed.mkString(", ")}}"
}

final case class CheckViolation(check: Check, detail: String)

object Checks {

  /** Evaluate all checks; empty result = pass. Each check costs one
    * aggregation job; uniqueness uses groupBy+count (map-side partial
    * aggregation, no row materialization on the driver).
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): Seq[CheckViolation] =
    checks.flatMap {
      case c @ Unique(cols) =>
        val dup = df.groupBy(cols.map(col): _*).count()
          .where(col("count") > 1).limit(1).count()
        if (dup > 0) Some(CheckViolation(c, "duplicate key values present"))
        else None
      case c @ MaxInRange(column, lo, hi, strict) =>
        val row = df.agg(max(col(column).cast("double"))).first()
        // GE parity: expect_column_max_to_be_between FAILS when the
        // column has no non-null values (max undefined ⇒ not "between")
        // — an empty gold table slipping through the gate unnoticed is
        // exactly what the bound exists to catch (ChecksSpec pins this)
        if (row.isNullAt(0))
          Some(CheckViolation(c, "no non-null values: max undefined"))
        else {
          val m = row.getDouble(0)
          val ok = if (strict) m > lo && m < hi else m >= lo && m <= hi
          if (ok) None else Some(CheckViolation(c, s"max = $m out of range"))
        }
      case c @ NotNull(cols) =>
        val pred = cols.map(col(_).isNull).reduce(_ || _)
        val bad = df.where(pred).limit(1).count()
        if (bad > 0) Some(CheckViolation(c, "null values present"))
        else None
      case c @ NullRatioBelow(column, maxRatio) =>
        val row = df.agg(count(lit(1)).as("n"),
          count(col(column)).as("nn")).first()
        val n = row.getLong(0)
        // vacuously true on empty input: a null RATIO bound constrains
        // composition, not presence — pair with RowCountInRange to catch
        // empties (unlike MaxInRange, where an undefined max must fail)
        if (n == 0) None
        else {
          val ratio = (n - row.getLong(1)).toDouble / n
          if (ratio <= maxRatio) None
          else Some(CheckViolation(c, f"null ratio = $ratio%.4f"))
        }
      case c @ RowCountInRange(lo, hi) =>
        val n = df.count()
        if (n >= lo && n <= hi) None
        else Some(CheckViolation(c, s"row count = $n"))
      case c @ ValuesInSet(column, allowed) =>
        val bad = df.where(col(column).isNotNull
          && !col(column).isin(allowed: _*)).limit(1).count()
        if (bad > 0)
          Some(CheckViolation(c, "values outside the allowed set"))
        else None
    }
}

/** One row-level quality rule: `name` lands in the violation list of any
  * row whose predicate is FALSE. Predicates must decide null handling
  * explicitly (a null predicate counts as passing, like GE's `mostly`
  * semantics for absent values).
  */
final case class RowRule(name: String, predicate: org.apache.spark.sql.Column)

/** Row-level DQ QUARANTINE — the production alternative to the all-or-
  * nothing validation gate above: instead of failing the load when any
  * row is bad, split it. Good rows continue down the pipeline; bad rows
  * land in a quarantine table with a deterministic, rule-ordered
  * violation list for triage/replay. One projection pass, no shuffle,
  * no per-row driver work — the violation column is a codegen'd
  * concat_ws over when-expressions.
  */
object Quarantine {

  /** All rows, with a `violations` column: comma-joined names of failed
    * rules in declaration order; empty string = clean row.
    */
  def withViolations(df: DataFrame, rules: Seq[RowRule]): DataFrame =
    df.withColumn("violations",
      concat_ws(",", rules.map(r => when(!r.predicate, r.name)): _*))

  /** (clean rows without the helper column, quarantined rows with it). */
  def split(df: DataFrame, rules: Seq[RowRule]): (DataFrame, DataFrame) = {
    val flagged = withViolations(df, rules)
    (flagged.where(col("violations") === "").drop("violations"),
      flagged.where(col("violations") =!= ""))
  }
}
