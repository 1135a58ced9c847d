package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}

/** Registration shim exposing Catalyst's native
  * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * (codegen'd, used internally by runtime row-level filtering, but NOT in
  * the public function registry) as `bloom_might_contain(bloom, key)`.
  * The bloom side must be a foldable binary literal — the serialized
  * `org.apache.spark.util.sketch.BloomFilter` bytes
  * (`DataFrameStatFunctions.bloomFilter` + `writeTo`); the probe calls
  * `mightContainLong(key)`, matching the putLong path that built the
  * sketch. This keeps the bloom pre-filter a pure codegen'd column
  * predicate — no typed-filter lambda, no per-row deserialization.
  */
object BloomMightContain {
  def fromExpressions(exprs: Seq[Expression]): BloomFilterMightContain = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        "bloom_might_contain(bloom, key) expects exactly 2 arguments, " +
          s"got ${exprs.length}")
    BloomFilterMightContain(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", fromExpressions, "scala_udf")
}
