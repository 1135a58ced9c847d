package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Tripwire for testdata-encoding drift: the driver regenerates the sf*
  * parquet between rounds and has already shipped events.ts under three
  * different parquet encodings (TIMESTAMP(NANOS) → long under nanosAsLong,
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) → NTZ, plain TIMESTAMP).
  * Round 6 shipped 6 red streaming rows because the stream feed hard-coded
  * one of them. These asserts make the same breakage fail here in seconds:
  * whatever the on-disk encoding, (a) the batch loader must surface a
  * TimestampType in a sane epoch, and (b) the stream feed must see the
  * SAME min/max/count of ts as the batch table.
  */
class EncodingTripwireSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("batch events.ts is TimestampType in a sane epoch") {
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"Tables.load must normalize ts; got ${ev.schema("ts").dataType}")
    val r = ev.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"),
      count(lit(1)).as("n")).head()
    val (lo, hi, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0)
    // 2000-01-01 .. 2100-01-01 in µs: a nanos/micros misread lands 1000×
    // off (year 1970 or year 55790) and trips this immediately
    assert(lo > 946684800000000L && hi < 4102444800000000L,
      s"ts range [$lo, $hi] µs is outside 2000..2100 — encoding misread")
  }

  test("embeddings/documents keep the shapes the operator surface assumes") {
    import org.apache.spark.sql.types._
    // ANN/dedup operators cast embedding -> array<double> for the native
    // expressions and assume float32 on disk; documents drive every text
    // operator. A regenerated file changing element type or column names
    // should fail HERE, not as 20 red ANN rows.
    val emb = Tables.load(spark, dir, "embeddings")
    assert(emb.schema("embedding").dataType == ArrayType(FloatType, true)
      || emb.schema("embedding").dataType == ArrayType(FloatType, false),
      s"embedding arrived as ${emb.schema("embedding").dataType}")
    assert(emb.schema("vec_id").dataType == LongType)
    val dims = emb.select(size(col("embedding"))).distinct().collect()
    assert(dims.length == 1 && dims.head.getInt(0) > 0,
      "embedding dimensionality must be constant and positive")
    val doc = Tables.load(spark, dir, "documents")
    Seq("doc_id", "text", "lang", "source").foreach(c =>
      assert(doc.columns.contains(c), s"documents lost column $c"))
    assert(doc.where(col("text").isNull).count() == 0,
      "null text would crash the text operators")
  }

  test("stream feed sees the identical ts min/max/count as the batch table") {
    val batch = Tables.load(spark, dir, "events")
      .agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
    // the same probe+normalize path every streaming query runs, but over a
    // batch read so the comparison is one agg, not a full stream drain
    val feed = graft.queries.ExtQueries.normalizeStreamTs(
      spark.read.schema(
        graft.queries.ExtQueries.eventsStreamSchema(spark, dir))
        .parquet(s"$dir/events.parquet"))
    assert(feed.schema("ts").dataType == TimestampType)
    val f = feed.agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
    assert(f == batch,
      s"stream feed ts stats $f != batch $batch — feed adapter out of " +
        "step with Tables.load (testdata encoding drifted?)")
  }
}
