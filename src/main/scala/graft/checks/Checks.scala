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

  /** Evaluate all checks; empty result = pass. ONE conditional
    * aggregation pass probes every check of the suite at once
    * (optimization guide §1.2 / the same shape as TxTable's merged
    * constraint gate: K checks previously cost K full scans of the
    * gated table — on a violation-free load, the common case, every
    * scan ran to completion, so a single pass is strictly cheaper at
    * any scale). Per-check details (the measured max, the null ratio,
    * the row count) come out of the same aggregated row, so the
    * violation messages are byte-identical to the per-check passes'.
    * Uniqueness aggregates `count_distinct(struct(cols))` against the
    * row count — the same null semantics as a groupBy (a struct of
    * nulls is one group) with map-side partial aggregation.
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): Seq[CheckViolation] =
    evaluateEach(df, checks).flatten

  /** Per-check results in `checks` order (None = pass) — the single
    * aggregation pass behind [[evaluate]], exposed so a checkpoint
    * harness can report every expectation individually without paying
    * one Spark job per expectation.
    */
  def evaluateEach(df: DataFrame,
      checks: Seq[Check]): Seq[Option[CheckViolation]] = {
    if (checks.isEmpty) return Nil
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      c match {
        case Unique(cols) => Seq(
          count(lit(1)).as(s"__n_$i"),
          count_distinct(struct(cols.map(col): _*)).as(s"__d_$i"))
        case MaxInRange(column, _, _, _) =>
          Seq(max(col(column).cast("double")).as(s"__m_$i"))
        case NotNull(cols) => Seq(
          sum(when(cols.map(col(_).isNull).reduce(_ || _), 1L)
            .otherwise(0L)).as(s"__b_$i"))
        case NullRatioBelow(column, _) => Seq(
          count(lit(1)).as(s"__n_$i"), count(col(column)).as(s"__nn_$i"))
        case RowCountInRange(_, _) =>
          Seq(count(lit(1)).as(s"__n_$i"))
        case ValuesInSet(column, allowed) => Seq(
          sum(when(col(column).isNotNull
            && !col(column).isin(allowed: _*), 1L).otherwise(0L))
            .as(s"__b_$i"))
      }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    def long(name: String): Long =
      // sum() over zero rows is NULL; every NULL-able probe here means
      // "no rows matched"
      if (row.isNullAt(row.fieldIndex(name))) 0L
      else row.getLong(row.fieldIndex(name))
    checks.zipWithIndex.map { case (c, i) =>
      c match {
        case Unique(_) =>
          if (long(s"__n_$i") > long(s"__d_$i"))
            Some(CheckViolation(c, "duplicate key values present"))
          else None
        case MaxInRange(_, lo, hi, strict) =>
          // GE parity: expect_column_max_to_be_between FAILS when the
          // column has no non-null values (max undefined ⇒ not
          // "between") — an empty gold table slipping through the gate
          // unnoticed is exactly what the bound exists to catch
          // (ChecksSpec pins this)
          if (row.isNullAt(row.fieldIndex(s"__m_$i")))
            Some(CheckViolation(c, "no non-null values: max undefined"))
          else {
            val m = row.getDouble(row.fieldIndex(s"__m_$i"))
            val ok = if (strict) m > lo && m < hi else m >= lo && m <= hi
            if (ok) None
            else Some(CheckViolation(c, s"max = $m out of range"))
          }
        case NotNull(_) =>
          if (long(s"__b_$i") > 0)
            Some(CheckViolation(c, "null values present"))
          else None
        case NullRatioBelow(_, maxRatio) =>
          val n = long(s"__n_$i")
          // vacuously true on empty input: a null RATIO bound
          // constrains composition, not presence — pair with
          // RowCountInRange to catch empties (unlike MaxInRange, where
          // an undefined max must fail)
          if (n == 0) None
          else {
            val ratio = (n - long(s"__nn_$i")).toDouble / n
            if (ratio <= maxRatio) None
            else Some(CheckViolation(c, f"null ratio = $ratio%.4f"))
          }
        case RowCountInRange(lo, hi) =>
          val n = long(s"__n_$i")
          if (n >= lo && n <= hi) None
          else Some(CheckViolation(c, s"row count = $n"))
        case ValuesInSet(_, _) =>
          if (long(s"__b_$i") > 0)
            Some(CheckViolation(c, "values outside the allowed set"))
          else None
      }
    }
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
