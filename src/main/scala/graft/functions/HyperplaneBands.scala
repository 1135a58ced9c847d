package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression computing [[graft.ext.SignLsh]]'s multi-band
  * random-hyperplane hashes in one primitive loop — the codegen'd
  * replacement for the `transform(sequence(...), aggregate(...))`
  * higher-order-function formulation, which is interpreted per lambda
  * step and gets re-evaluated on every scan of a self-joined plan
  * (bands · rowsPerBand · dim expression-tree evals per row per scan made
  * the embedding-dedup query two orders of magnitude slower than this).
  *
  * Semantics are EXACTLY SignLsh.bitsExpr/bandsExpr (and the DuckDB
  * oracle rendering): hyperplane j's Rademacher component for dim d is
  * derived from the LCG value (1103515245·(j·dim+d) + 12345) & 2^31−1,
  * bit 16; the projection is a strict sequential fold in doubles, so the
  * sign — and therefore every band hash — is bit-identical to the
  * higher-order-function and SQL formulations.
  */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands expects array<double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bands"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val dim = e.numElements()
    val out = new Array[Int](bands)
    var j = 0
    while (j < bands * rowsPerBand) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val s = (1103515245L * (j.toLong * dim + d) + 12345L) & 2147483647L
        acc += e.getDouble(d) * (if (((s >> 16) & 1L) == 1L) 1.0 else -1.0)
        d += 1
      }
      if (acc > 0) out(j / rowsPerBand) |= 1 << (j % rowsPerBand)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |int $dim = $e.numElements();
         |int[] $out = new int[$bands];
         |for (int $j = 0; $j < ${bands * rowsPerBand}; $j++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $dim; $d++) {
         |    long $s = (1103515245L * ($j * (long) $dim + $d) + 12345L)
         |      & 2147483647L;
         |    $acc += $e.getDouble($d)
         |      * (((($s >> 16) & 1L) == 1L) ? 1.0 : -1.0);
         |  }
         |  if ($acc > 0) $out[$j / $rowsPerBand] |= 1 << ($j % $rowsPerBand);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBands = copy(child = newChild)
}

object HyperplaneBands {
  /** Build from SQL call-site expressions: `hyperplane_bands(e, bands,
    * rowsPerBand)` — the latter two must be integer literals.
    */
  def fromExpressions(exprs: Seq[Expression]): HyperplaneBands = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        "hyperplane_bands(e, bands, rowsPerBand) expects exactly 3 " +
          s"arguments, got ${exprs.length}")
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"hyperplane_bands: $what must be an int literal, got $other")
    }
    HyperplaneBands(exprs(0), lit(exprs(1), "bands"),
      lit(exprs(2), "rowsPerBand"))
  }

  /** Register `hyperplane_bands(e, bands, rowsPerBand)` for use from
    * expr()/spark.sql in an already-built session (the
    * [[GraftExtensions]] route covers cluster-wide installation).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_bands", fromExpressions, "scala_udf")
}
