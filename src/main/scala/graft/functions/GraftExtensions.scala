package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Delegating parser: the lake-maintenance statement shapes
  * ([[graft.lake.LakeSql]]) plan here; every other statement goes to
  * Spark's own parser verbatim — `spark.sql("OPTIMIZE '<path>'")`
  * works and nothing else changes. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    graft.lake.LakeSql.parse(sqlText)
      .orElse(graft.lake.LakeSql.selectPlan(sqlText, delegate.parsePlan))
      .orElse(graft.lake.LakeSql.detailPlan(sqlText))
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String) =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String) =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String) =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String) = delegate.parseQuery(s)
  override def parseRoutineParam(s: String) = delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String) = delegate.parseTableSchema(s)
  override def parseDataType(s: String) = delegate.parseDataType(s)
}

/** Session-extension entry point registering graft's native Catalyst
  * expressions, so a deployment can enable them cluster-wide with
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * instead of calling the per-session `register(spark)` helpers. Both
  * routes install the same builders; the helpers remain for harness and
  * test sessions created before the library is on the extensions path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // Cost-based join reorder over LAKE relations: Spark's own "Join
    // Reorder" batch runs AFTER "Early Filter and Projection
    // Push-Down", where a V1-fallback scan has been wrapped in
    // V1ScanWrapper — which drops SupportsReportStatistics, so the
    // log-derived rowCount/column stats the catalog scan reports
    // ([[graft.lake.catalog.TxLakeTable]]) are invisible to the
    // built-in rule. The PRE-CBO batch runs while leaves are still
    // stats-bearing DataSourceV2Relations, so running the same
    // CostBasedJoinReorder there lets CBO reorder multi-join queries
    // over named lake tables. The rule self-gates on
    // spark.sql.cbo.enabled + spark.sql.cbo.joinReorder.enabled
    // (both default false) and is idempotent if the built-in batch
    // ever sees stats again.
    ext.injectPreCBORule(_ =>
      org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity.fromExpressions(exprs)))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName,
        "hyperplane_bands"),
      (exprs: Seq[Expression]) => HyperplaneBands.fromExpressions(exprs)))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash.fromExpressions(exprs)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain.fromExpressions(exprs)))
  }
}
