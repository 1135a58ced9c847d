package graft

import org.apache.spark.sql.types._

/** Whole-query partition-count invariance: every double in a compared
  * output must come from an ordered fold, an integer-derived single
  * division, or a decimal-cast sum — so changing
  * spark.sql.shuffle.partitions must not move a single bit. This is the
  * CI net behind the determinism conventions: an order-dependent SUM
  * over doubles introduced anywhere in these queries flips results
  * between partition counts long before the cross-engine oracle sees it.
  *
  * Coverage = the FULL registry, auto-selected by output schema: every
  * SparkEntry query whose result carries a floating-point column
  * (top-level, nested in a struct, or inside an array) is collected at
  * 5 and at 32 shuffle partitions and compared row-for-row — a newly
  * added order-dependent double aggregate fails here before the DuckDB
  * oracle ever sees it, and a new double-producing query is enrolled
  * automatically just by existing.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def hasFloating(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ArrayType(et, _) => hasFloating(et)
    case StructType(fields) => fields.exists(f => hasFloating(f.dataType))
    case MapType(k, v, _) => hasFloating(k) || hasFloating(v)
    case _ => false
  }

  test("every double-producing query is bit-identical across partition counts") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val names = SparkEntry.queries.keys.toSeq.sorted
    try {
      // pass 1 at 5 partitions doubles as the schema-driven selection
      // (construction is lazy for most queries; the few eager builders
      // run here exactly as they do under Verify)
      spark.conf.set(key, "5")
      val at5 = names.flatMap { n =>
        val df = SparkEntry.queries(n)(spark, dir)
        if (df.schema.exists(f => hasFloating(f.dataType)))
          Some(n -> df.collect().map(_.toString).toSeq)
        else None
      }.toMap
      // the registry-wide net must actually be catching the families
      // this spec exists for — an accidental schema change that drops
      // the selection to a handful would pass vacuously
      assert(at5.size >= 40,
        s"only ${at5.size} double-producing queries selected of " +
          s"${names.size} — selection broke?")
      spark.conf.set(key, "32")
      for (n <- at5.keys.toSeq.sorted) {
        val rows = SparkEntry.queries(n)(spark, dir)
          .collect().map(_.toString).toSeq
        assert(at5(n).nonEmpty, s"$n returned no rows")
        assert(at5(n) === rows,
          s"$n differs between 5 and 32 shuffle partitions")
      }
    } finally spark.conf.set(key, prev)
  }
}
