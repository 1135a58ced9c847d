package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  * Composed from built-ins per the extension preference order (compose >
  * custom Expression > custom SparkPlan): tag both inputs, union them,
  * and carry the right side's columns forward with a single
  * partition-by-key ordered window (`last_value(ignoreNulls)`), then keep
  * the left rows. ONE shuffle on the join key, no range-explosion, no
  * per-key driver work — at 100 TB this is a single hash partitioning of
  * both inputs, which is the lower bound for any keyed temporal join.
  *
  * Semantics: for each left row, the right row with the greatest
  * rightTime <= leftTime (ties on time resolved toward the right side —
  * i.e. a right row at exactly leftTime matches), like DuckDB/kdb ASOF
  * JOIN. Rows with no earlier right row get nulls (left outer).
  *
  * `right` must be unique per (key, rightTime) — pre-dedup if not, or
  * which of the tied rows wins is undefined.
  */
object AsOfJoin {

  def leftAsOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String): DataFrame = {
    val rightCols =
      right.columns.filter(c => c != key && c != rightTime).toSeq
    val payload = rightCols.map(c => col(c)) :+
      col(rightTime).as("__rt")

    val taggedRight = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__src"),
      struct(payload: _*).as("__r"))
    val taggedLeft = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__src"),
      lit(null).cast(taggedRight.schema("__r").dataType).as("__r"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__row"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, 0)

    taggedRight
      .withColumn("__row", lit(null)
        .cast(taggedLeft.schema("__row").dataType))
      .unionByName(taggedLeft)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__src") === 1)
      .select(
        (left.columns.map(c => col(s"__row.$c").as(c)) ++
          rightCols.map(c => col(s"__asof.$c").as(c)) :+
          col(s"__asof.__rt").as(s"asof_$rightTime")).toIndexedSeq: _*)
  }
}
