package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-visible capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Determinism contract: every query's output ordering is made
  * total (ORDER BY a unique key set) on BOTH sides, aggregates over
  * doubles go through exact decimal sums, and every computed column is
  * aliased identically in Spark and SQL (the driver's compare keys on
  * column names).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"query name must be stable/simple: $name")
}

object Q {
  /** Materialization point for multi-consumer frames — see [[Mat]]. */
  def mat(df: DataFrame): DataFrame = Mat(df)

  def registry(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracles(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
