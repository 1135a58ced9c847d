package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registration shim exposing Catalyst's native
  * [[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]
  * (the codegen'd aggregate behind runtime row-level filtering, not in
  * the public registry) as `bloom_filter_agg(hash, items, bits)`. The
  * child must be a LongType hash (pair it with `xxhash64(col)`); items
  * and bits are foldable long literals. The binary result is a
  * serialized `org.apache.spark.util.sketch.BloomFilter` — readable by
  * `BloomFilter.readFrom` and probe-compatible with
  * [[BloomMightContain]]'s `mightContainLong`. This is what lets the
  * lake build PER-FILE bloom filters in ONE distributed aggregation
  * (`groupBy(_metadata.file_path)`) instead of a job per file.
  */
object BloomAgg {
  def fromExpressions(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        "bloom_filter_agg(hash, items, bits) expects exactly 3 arguments, " +
          s"got ${exprs.length}")
    new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg", fromExpressions, "scala_udf")
}
