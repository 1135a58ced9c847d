package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def registered: Seq[Q] =
    ParityQueries.all ++ CoreQueries.all ++ ExtQueries.all ++
      CurationQueries.all ++ ProfileQueries.all ++ PipelineQueries.all ++
      ScaleQueries.all ++ CorpusQueries.all ++ SemanticQueries.all ++
      LakeQueries.all ++ CatalogQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The daily-order-report slice (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.q01DailyOrderMetrics.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Q.registry(registered)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Q.oracles(registered)
}
