package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable polynomial string
  * hash ([[graft.queries.ExtQueries.mhBaseSpark]]): a Rabin-Karp fold of
  * Unicode code points, h ← (h·mult + cp) mod 2³¹−1, seeded with `salt`.
  * The higher-order-function rendering interprets one lambda step per
  * CHARACTER per row (and is re-evaluated on every scan of self-joined
  * plans), which puts an interpreter loop on the hot path of MinHash,
  * SimHash and content-defined-chunking dedup; this is the same codegen'd
  * primitive-loop replacement [[HyperplaneBands]] is for SignLsh.
  *
  * Semantics: identical to the HOF/DuckDB rendering per code point
  * (Spark `ascii`/`substring`/`length` and DuckDB `ascii`/`substring`/
  * `length` both operate on code points — verified for ASCII, Latin-1,
  * BMP and astral inputs). On the EMPTY string this expression returns
  * `salt` — the mathematical fold over zero elements and what DuckDB's
  * rendering computes; the raw Spark HOF instead built `sequence(1, 0)`
  * = [1, 0] (Spark infers step −1) and hashed two phantom characters,
  * so the HOF rendering carries an explicit empty-string guard.
  */
case class PolyHash(child: Expression, mult: Int, salt: Int)
    extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var h = salt.toLong
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * mult + cp) % P
    }
    h
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $e.toString();
         |long $h = ${salt}L;
         |for (int $i = 0; $i < $str.length(); ) {
         |  int $cp = $str.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * ${mult}L + $cp) % ${P}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PolyHash = copy(child = newChild)
}

object PolyHash {
  /** Build from SQL call-site expressions: `poly_hash(str, mult, salt)`
    * — mult and salt must be integer literals.
    */
  def fromExpressions(exprs: Seq[Expression]): PolyHash = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        "poly_hash(str, mult, salt) expects exactly 3 arguments, " +
          s"got ${exprs.length}")
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"poly_hash: $what must be an int literal, got $other")
    }
    PolyHash(exprs(0), lit(exprs(1), "mult"), lit(exprs(2), "salt"))
  }

  /** Register `poly_hash(str, mult, salt)` for expr()/spark.sql use in an
    * already-built session ([[GraftExtensions]] covers cluster-wide
    * installation).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", fromExpressions, "scala_udf")
}
