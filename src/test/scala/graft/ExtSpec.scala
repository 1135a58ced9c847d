package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.queries.ExtQueries
import graft.streaming.StreamOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world text", "en", "src1", 16L),
    (2L, "another document body here", "en", "src2", 26L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("binary payload carries bytes + typed metadata struct") {
    val b = Multimodal.withBinary(docs)
    assert(b.schema("payload").dataType.typeName === "binary")
    val row = b.where($"doc_id" === 1).select($"meta.mime", $"meta.source")
      .collect().head
    assert(row.getString(0) === "application/octet-stream")
    assert(row.getString(1) === "src1")
  }

  test("columnar PNG header read matches the mapPartitions parser") {
    // PNG dims at fixed offsets parse as pure column functions; the
    // two paths must agree on real containers AND on garbage
    val mixed = Seq(
      (1L, Multimodal.buildPng(1234, 77, "pixels".getBytes)),
      (2L, Multimodal.buildJpeg(640, 480, "scan".getBytes)), // not PNG
      (3L, "not media at all".getBytes))
      .toDF("doc_id", "payload")
    val viaColumns = Multimodal.pngHeaderColumns(mixed)
      .select($"doc_id", $"format", $"width", $"height")
      .as[(Long, String, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(viaColumns === Seq(
      (1L, "png", 1234, 77),
      (2L, "unknown", 0, 0), // JPEG needs the segment-scan parser
      (3L, "unknown", 0, 0)))
    // on PNG rows the codegen'd path agrees exactly with the parser
    val viaParser = Multimodal.decodeMedia(mixed)
      .where($"format" === "png")
      .select($"doc_id", $"width", $"height")
      .as[(Long, Int, Int)].collect().toSeq
    assert(viaParser === Seq((1L, 1234, 77)))
  }

  test("real header decode: PNG IHDR and JPEG SOF dimensions parse from " +
    "bytes the fixture formula cannot predict") {
    // hand-built containers with arbitrary dimensions — no doc_id
    // relationship at all, so a formula-shortcut 'decoder' cannot pass
    val png = Multimodal.buildPng(1920, 1080, "pixels!".getBytes)
    assert(Multimodal.parseHeader(png) === (("png", 1920, 1080)))
    val jpg = Multimodal.buildJpeg(640, 487, "scanline".getBytes)
    assert(Multimodal.parseHeader(jpg) === (("jpeg", 640, 487)))
    // byte-size contracts the oracle relies on
    assert(png.length === 57 + 7)
    assert(jpg.length === 27 + 8)
    // the Spark decode stage recovers them through mapPartitions
    val frames = Seq((1L, png), (2L, jpg)).toDF("doc_id", "payload")
    val got = Multimodal.decodeMedia(frames).orderBy("doc_id")
      .as[Multimodal.MediaInfo].collect().toSeq
    assert(got === Seq(
      Multimodal.MediaInfo(1L, "png", 1920, 1080, png.length),
      Multimodal.MediaInfo(2L, "jpeg", 640, 487, jpg.length)))
  }

  test("malformed media falls back to unknown, never throws") {
    assert(Multimodal.parseHeader("just some text".getBytes)
      === (("unknown", 0, 0)))
    assert(Multimodal.parseHeader(Array.empty[Byte]) === (("unknown", 0, 0)))
    // a truncated PNG: signature only, no IHDR to read
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(Multimodal.parseHeader(sig) === (("unknown", 0, 0)))
    // PNG magic but a first chunk that is not IHDR
    val bad = sig ++ Array.fill[Byte](16)(7)
    assert(Multimodal.parseHeader(bad) === (("unknown", 0, 0)))
    // JPEG SOI followed by garbage (no 0xff marker structure)
    assert(Multimodal.parseHeader(
      Array(0xff, 0xd8, 0x00, 0x01, 0x02, 0x03).map(_.toByte))
      === (("unknown", 0, 0)))
    // JPEG that ends before any SOF frame header
    assert(Multimodal.parseHeader(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) === (("unknown", 0, 0)))
    // and the whole decode stage survives a mixed good/garbage batch
    val mixed = Seq(
      (1L, Multimodal.buildPng(8, 4, Array.empty[Byte])),
      (2L, "garbage".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.decodeMedia(mixed).orderBy("doc_id")
      .as[Multimodal.MediaInfo].collect().toSeq
    assert(got.head.format === "png" && got.head.width === 8)
    assert(got(1).format === "unknown" && got(1).width === 0)
  }

  test("resize plan scales the PARSED dimensions; unparseable rows drop") {
    val mixed = Seq(
      (1L, Multimodal.buildPng(64, 48, "pix".getBytes)),
      (2L, Multimodal.buildJpeg(320, 200, "scan".getBytes)),
      (3L, "garbage".getBytes)) // nothing to resize
      .toDF("doc_id", "payload")
    val r = Multimodal.resizePlan(mixed, 32, 24).orderBy("doc_id").collect()
    assert(r.length === 2, "unparseable payloads must drop out")
    assert(r(0).getAs[Int]("src_width") === 64)
    assert(r(0).getAs[Double]("scale_x") === 0.5)
    assert(r(0).getAs[Double]("scale_y") === 0.5)
    assert(r(1).getAs[Int]("src_width") === 320)
    assert(r(1).getAs[Double]("scale_x") === 32.0 / 320)
    assert(r(1).getAs[Double]("scale_y") === 24.0 / 200)
  }

  test("frame sampler slices by the width the HEADER declares") {
    // a 300-byte body behind a PNG header declaring width 64:
    // ceil(300/64) = 5 frames, every 2nd → idx 0, 2, 4
    val d = Seq((9L, Multimodal.buildPng(64, 7, ("x" * 300).getBytes)),
      (10L, "garbage".getBytes)) // emits nothing, kills nothing
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleMediaFrames(d, everyK = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Long]("doc_id")).forall(_ === 9L))
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4))
    // all-'x' frames 0 and 2 are identical bytes → identical checksum;
    // the final partial frame (300 - 4*64 = 44 bytes) differs
    assert(frames(0).getAs[String]("checksum")
      === frames(1).getAs[String]("checksum"))
    assert(frames(2).getAs[String]("checksum")
      !== frames(0).getAs[String]("checksum"))
    // and the checksum is over the BODY bytes, not container framing
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("x" * 64).getBytes).map(b => f"${b & 0xff}%02x").mkString
    assert(frames(0).getAs[String]("checksum") === expected)
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // base well after epoch: an event time of exactly 0 equals the initial
  // watermark and is discarded as late by watermark-stateful operators
  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  test("streaming dedup drops duplicate ids within the watermark") {
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val rows = Seq((1L, ts(0), "a"), (1L, ts(1), "a-dup"),
      (2L, ts(2), "b"))
      .toDF("event_id", "ts", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    rows.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(rows.schema).parquet(s"$dir/in")
    val q = StreamOps.dedupStream(stream).writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try q.processAllAvailable()
    finally q.stop()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L))
  }


  test("file sink writes only watermark-finalized windows with a commit log") {
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    // windows: [0,5) holds 2 events, [5,10) holds 1; the event at
    // minute 120 drives the final watermark to 120 − 60 = minute 60, so
    // both early windows flush to parquet and the [120,125) window dies
    // unemitted in state — the append-mode contract, observed through
    // real files instead of the memory sink
    val rows = Seq(
      (1L, ts(0), "view", "1.0"), (2L, ts(3), "view", "2.0"),
      (3L, ts(7), "click", "3.0"), (4L, ts(120), "view", "4.0"))
      .toDF("event_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_file_sink")
    rows.write.mode("overwrite").parquet(s"$dir/in")
    val out = StreamOps.runToFileSink(spark, s"$dir/in", rows.schema,
      df => StreamOps.windowedEventCounts(df, "5 minutes", "1 hour")
        .select(col("window.start").as("ws"), col("event_type"),
          col("n_events")),
      s"$dir/out", s"$dir/ckpt", statePartitions = Some(4))
    val got = out.select($"ws", $"event_type", $"n_events")
      .as[(Timestamp, String, Long)]
      .collect().toSeq.sortBy(r => (r._1.getTime, r._2))
    assert(got === Seq((ts(0), "view", 2L), (ts(5), "click", 1L)))
    // the exactly-once machinery: the sink's own _spark_metadata log,
    // which spark.read consults so half-committed batches are invisible
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/out/_spark_metadata")))
  }

  test("AvailableNow backfill drains the backlog, then terminates itself") {
    import org.apache.spark.sql.streaming.Trigger
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val rows = (1L to 20L).map(i => (i, ts(i), s"p$i"))
      .toDF("event_id", "ts", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow")
    rows.write.mode("overwrite").parquet(s"$dir/in")
    // the scheduled-batch shape: process everything that exists now in
    // bounded micro-batches (rate limit forces >1), then stop on its own
    // — no external processAllAvailable/stop choreography
    def run(): Unit = {
      val q = spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/in")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").format("parquet")
        .option("path", s"$dir/out")
        .start()
      assert(q.awaitTermination(120000), "query did not self-terminate")
      assert(!q.isActive)
    }
    run()
    assert(spark.read.parquet(s"$dir/out").count() === 20)
    // a later scheduled run resumes from the checkpoint: nothing new to
    // do, terminates on its own, no duplicates land
    run()
    assert(spark.read.parquet(s"$dir/out").count() === 20)
  }

  test("lake sink lands batches as partitions; same-id replay is idempotent") {
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val rows = Seq((1L, ts(0), "a"), (2L, ts(1), "b"), (3L, ts(2), "c"))
      .toDF("event_id", "ts", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_sink")
    rows.write.mode("overwrite").parquet(s"$dir/in")
    val target = s"$dir/bronze"
    // checkpoint-LOSS path: each run gets a fresh checkpoint, so batch 0
    // is re-delivered with the same id and the dynamic partition
    // overwrite rewrites etl_batch=0 instead of duplicating it (the
    // single-batch case; multi-batch resume needs the shared checkpoint —
    // next test)
    var run = 0
    def ingestOnce(): Unit = {
      run += 1
      val stream = spark.readStream.schema(rows.schema).parquet(s"$dir/in")
      val q = StreamOps.startLakeSink(stream, target, "lake_sink_spec",
        s"$dir/chk$run")
      try q.processAllAvailable()
      finally q.stop()
    }
    ingestOnce()
    val first = spark.read.parquet(target)
    assert(first.count() === 3)
    assert(first.columns.contains("etl_batch"))
    ingestOnce()
    val second = spark.read.parquet(target)
    assert(second.count() === 3)
    assert(second.select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
  }

  test("lake sink checkpoint resumes across micro-batches without duplicates") {
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    def file(id: Long, p: String, dir: String): Unit =
      Seq((id, ts(id), p)).toDF("event_id", "ts", "payload")
        .write.mode("append").parquet(dir)
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_resume")
    val schema = Seq((1L, ts(0), "x")).toDF("event_id", "ts", "payload")
      .schema
    val target = s"$dir/bronze"
    val chk = s"$dir/chk" // SHARED across restarts
    // maxFilesPerTrigger=1 → one micro-batch per file, so the run spans
    // multiple batch ids — the shape whose restart (without a checkpoint)
    // could re-chunk the source into fewer batches and leave the prior
    // run's higher etl_batch partitions behind as duplicates
    def ingest(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val q = StreamOps.startLakeSink(stream, target, "lake_resume_spec",
        chk)
      try q.processAllAvailable()
      finally q.stop()
    }
    file(1L, "a", s"$dir/in")
    file(2L, "b", s"$dir/in")
    ingest()
    val first = spark.read.parquet(target)
    assert(first.count() === 2)
    assert(first.select("etl_batch").distinct().count() === 2)
    // new data arrives while the query is down; the restart must resume
    // AFTER the committed batches — only the new file becomes a batch
    file(3L, "c", s"$dir/in")
    ingest()
    val second = spark.read.parquet(target)
    assert(second.count() === 3)
    assert(second.select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
    assert(second.select("etl_batch").distinct().count() === 3)
  }

  test("streaming dedup re-admits an id after its watermark state expires") {
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val schema = Seq((1L, ts(0), "x")).toDF("event_id", "ts", "payload")
      .schema
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_late")
    Seq((1L, ts(0), "first")).toDF("event_id", "ts", "payload")
      .write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamOps.dedupStream(stream, "10 minutes").writeStream
      .outputMode("append").format("memory").queryName("dedup_late").start()
    try {
      q.processAllAvailable()
      // batch 2: a DIFFERENT key advances the watermark to ts(50) —
      // state for id 1 (expires at ts(10)) is evicted only after this
      Seq((2L, ts(60), "advance")).toDF("event_id", "ts", "payload")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      // batch 3: id 1 again, well past its expired state → re-admitted
      Seq((1L, ts(70), "again")).toDF("event_id", "ts", "payload")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
    } finally q.stop()
    val payloads = spark.table("dedup_late").select("payload")
      .collect().map(_.getString(0)).sorted
    assert(payloads.toSeq === Seq("advance", "again", "first"))
  }

  test("stateful sessionize emits a session when the gap closes") {
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val events = Seq(
      StreamOps.Event(1, 10, ts(0)), StreamOps.Event(1, 11, ts(10)),
      StreamOps.Event(1, 12, ts(120)), // 110-min gap → closes session 1
      StreamOps.Event(2, 20, ts(5)))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    events.toDS().write.mode("overwrite")
      .parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(events.toDS().schema).parquet(s"$dir/in")
      .as[StreamOps.Event]
    val q = StreamOps.sessionize(stream).writeStream
      .outputMode("append").format("memory").queryName("sessions").start()
    try q.processAllAvailable()
    finally q.stop()
    // append mode only emits CLOSED sessions; user 1's first session is
    // the only closed one in this batch
    val closed = spark.table("sessions").as[StreamOps.SessionAgg]
      .collect().toSeq
    assert(closed === Seq(StreamOps.SessionAgg(1, ts(0), ts(10), 2)))
  }
}

/** MinHash/SimHash recall on crafted near-duplicates (the testdata has no
  * oracle for Spark-internal hashes; these pin the semantics instead).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("minhash LSH surfaces a crafted near-duplicate pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash")
    Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, base + " phi", "en", "s", (base.length + 4).toLong), // near-dup
      (2L, "totally different words entirely unrelated content body",
        "en", "s", 54L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtQueries.extDedupMinhashLsh.run(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (a, b, j) => a == 0 && b == 1 && j > 0.8 })
    assert(!out.exists { case (a, b, _) => b == 2 || a == 2 })
  }

  test("embedding-cosine dedup finds a crafted duplicate vector pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft_embdup")
    // 64-dim, matching the real embeddings table (the LSH hyperplane
    // family is generated for dim 64)
    val v = Array.tabulate(64)(i => (if (i % 2 == 0) 0.5f else -0.25f))
    val other = Array.tabulate(64)(i => (if (i % 3 == 0) -0.8f else 0.6f))
    Seq((0L, v.toSeq, 0), (1L, v.map(_ * 1.001f).toSeq, 0),
      (2L, other.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = ExtQueries.extDedupEmbedding.run(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((0L, 1L)))
    assert(!out.exists { case (a, b) => a == 2 || b == 2 })
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_simhash")
    Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, base + " phi chi", "en", "s", (base.length + 8).toLong),
      (2L, "totally different words entirely unrelated content body",
        "en", "s", 54L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ExtQueries.extDedupSimhash.run(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((0L, 1L)))
    assert(!out.exists { case (a, b) => b == 2 || a == 2 })
  }
}

/** The gram document-frequency cap (the 100 TB hot-key guard in the
  * n-gram dedup family): dropped grams must be non-discriminative — the
  * ≥ 0.5-Jaccard pair set on the corpus is unchanged by the cap.
  */
class NgramCapSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private val dir = "/root/testdata/sf0.001"

  private def jaccardPairs(g: DataFrame): Set[(Long, Long)] = {
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    g.as("g1")
      .join(g.as("g2"),
        col("g1.gram") === col("g2.gram")
          && col("g1.doc_id") < col("g2.doc_id"))
      .groupBy(col("g1.doc_id").as("doc_a"), col("g2.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .where(col("inter").cast("double")
        / (col("sa.sz") + col("sb.sz") - col("inter")) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("the df cap is active on the corpus yet changes no >=0.5 pair") {
    val uncapped = ExtQueries.grams(spark, dir)
    val capped = ExtQueries.cappedGrams(spark, dir)
    val dropped = uncapped.count() - capped.count()
    assert(dropped > 0, "cap should actually drop boilerplate grams here")
    assert(jaccardPairs(capped) === jaccardPairs(uncapped))
  }
}

/** The ext_approx_cardinality driver verdict asserts only the 3×rsd
  * statistical envelope; this pins the tighter 1×rsd (5%) accuracy on
  * the shipped corpora, where HLL++ (rsd 0.05) comfortably holds.
  */
class HllAccuracySpec extends SparkSpec {
  test("HLL vocab estimate is within 1×rsd of exact on sf0.001/sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("source"),
          explode(split(col("text"), " ")).as("word"))
        .groupBy(col("source"))
        .agg(approx_count_distinct(col("word")).as("est"),
          countDistinct(col("word")).as("exact"))
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        val (est, exact) = (r.getAs[Long]("est"), r.getAs[Long]("exact"))
        assert(math.abs(est - exact) <= 0.05 * exact,
          s"$dir source=${r.get(0)}: est=$est exact=$exact")
      }
    }
  }
}

/** Multi-band random-hyperplane LSH: recall on true near-dups, bounded
  * band-bucket population on the real embeddings, and cross-run
  * determinism of the hyperplane family.
  */
class SignLshSpec extends SparkSpec {
  import spark.implicits._
  import graft.ext.SignLsh

  private val dir = "/root/testdata/sf0.001"

  test("every crafted near-duplicate pair is an LSH candidate") {
    // 20 base vectors, each cloned with ~1e-3 relative noise → 20 true
    // near-dup pairs at cosine ≈ 1; banded collision P ≈ 96 % per pair
    // at cos 0.95 and these sit far above that
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20).flatMap { k =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val noisy = v.map(x => x * (1.0 + 0.001 * rnd.nextGaussian()))
      Seq((k.toLong, v.toSeq), (k.toLong + 1000, noisy.toSeq))
    }
    val df = rows.toDF("vec_id", "e")
    val cand = SignLsh
      .candidatePairs(df, "vec_id", "e", dim = 64, bands = 16,
        rowsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { k =>
      assert(cand.contains((k.toLong, k.toLong + 1000)),
        s"near-dup pair $k missing from candidates")
    }
  }

  test("band-bucket population stays bounded on the real embeddings") {
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val n = emb.count()
    val maxPop = SignLsh
      .withBandHashes(emb, "e", dim = 64, bands = 16, rowsPerBand = 16)
      .groupBy($"band", $"bh").agg(count(lit(1)).as("pop"))
      .agg(max($"pop")).collect().head.getLong(0)
    // 16-bit band keys: even this clustered synthetic corpus keeps every
    // bucket under 10 % of N (the round-1 single 8-bit bucket held ~25 %+
    // of N in one bucket); random data would sit near 1
    assert(maxPop <= n / 10, s"max band-bucket pop $maxPop vs n=$n")
  }

  test("native hyperplane_bands equals the HOF/SQL formulation exactly") {
    // the DuckDB oracle replicates the HOF rendering, so the native
    // expression must match it band-for-band
    graft.functions.HyperplaneBands.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val rows = emb.select($"vec_id",
        expr("hyperplane_bands(e, 16, 16)").as("native"),
        expr(SignLsh.bandsExpr(
          s"(${SignLsh.bitsExpr("e", 64, 256).replace('\n', ' ')})",
          16, 16)).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"vec ${r.get(0)}")
    }
  }

  test("the hyperplane family is deterministic across invocations") {
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    def sig() = SignLsh
      .withBandHashes(emb, "e", dim = 64, bands = 16, rowsPerBand = 16)
      .select($"vec_id", $"band", $"bh")
      .orderBy($"vec_id", $"band")
      .collect().toSeq
    assert(sig() === sig())
  }

  test("bucketCap drops a degenerate hot bucket; cool pairs survive") {
    // degenerate corpus: `cap + 2` IDENTICAL vectors collide in every
    // band (one bucket holds them all — (cap+2)(cap+1)/2 pairs uncapped)
    // plus one crafted near-dup pair of a distinct direction
    val cap = graft.queries.ExtQueries.lshBucketCap
    val rnd = new scala.util.Random(11)
    val hotVec = Array.fill(64)(rnd.nextGaussian()).toSeq
    val coolVec = Array.fill(64)(rnd.nextGaussian())
    val coolNoisy = coolVec.map(x => x * (1.0 + 1e-4 * rnd.nextGaussian()))
    val rows = (0 until cap.toInt + 2).map(i => (i.toLong, hotVec)) ++
      Seq((9000L, coolVec.toSeq), (9001L, coolNoisy.toSeq))
    val df = rows.toDF("vec_id", "e")
    val capped = SignLsh
      .candidatePairs(df, "vec_id", "e", dim = 64, bands = 16,
        rowsPerBand = 16, bucketCap = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((9000L, 9001L)),
      "only the cool near-dup pair survives the bucket cap")
    // and without the cap, the hot bucket would have flooded candidates
    val uncapped = SignLsh
      .candidatePairs(df, "vec_id", "e", dim = 64, bands = 16,
        rowsPerBand = 16)
      .count()
    assert(uncapped > (cap * (cap - 1)) / 2,
      "the degenerate bucket is genuinely quadratic without the cap")
  }
}

/** Leakage-safe splitting: the one invariant that matters — no near-dup
  * pair may straddle train/valid/test — plus coincidence with the
  * per-doc hash convention for docs outside any near-dup component.
  */
class LeakageSafeSplitSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("near-dup pairs never straddle splits; singletons match doc hash") {
    val out = ExtQueries.extSplitLeakageSafe.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val prs = ExtQueries.jaccardPairs(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(prs.nonEmpty, "the corpus must exercise the non-trivial path")
    prs.foreach { case (a, b) =>
      assert(out(a)._1 === out(b)._1, s"pair ($a,$b) in different components")
      assert(out(a)._2 === out(b)._2, s"pair ($a,$b) straddles splits")
    }
    val inPairs = prs.flatMap(p => Seq(p._1, p._2)).toSet
    def ph(x: String): Long =
      x.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % 2147483647L)
    out.foreach { case (d, (compId, split)) =>
      if (!inPairs.contains(d)) {
        assert(compId === d, s"doc $d outside any pair must be a singleton")
        val h = ph(s"spl:$d"); val h2 = (h * h + h) % 2147483647L
        val want =
          if (h2 % 100 < 90) "train"
          else if (h2 % 100 < 95) "valid" else "test"
        assert(split === want, s"singleton $d diverges from the doc hash")
      }
    }
  }

  test("a long near-dup CHAIN collapses to one component and one split") {
    // sliding 16-token windows over one token stream, stride 4:
    // consecutive docs share 12 tokens → 10 of 14 shingles → Jaccard
    // 10/18 ≈ 0.56 (an edge); docs two apart share 6 of 22 ≈ 0.27 (no
    // edge). 8 docs → a pure chain of graph DIAMETER 7 — the case a
    // fixed small pass count would split into several components,
    // letting directly-paired near-dups straddle train/valid.
    val dir = java.nio.file.Files.createTempDirectory("graft_chain")
    val stream = (0 until 16 + 7 * 4).map(i => s"tok$i")
    val docs = (0 until 8).map { d =>
      (d.toLong, stream.slice(4 * d, 4 * d + 16).mkString(" "),
        "en", "s", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the chain actually has the intended shape
    val prs = ExtQueries.jaccardPairs(spark, dir.toString)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(prs === (0L until 7L).map(i => (i, i + 1)).toSet,
      s"fixture must be a pure chain: $prs")
    val out = ExtQueries.extSplitLeakageSafe.run(spark, dir.toString)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(out.size === 1,
      s"all 8 chained docs must share one component+split: $out")
  }

  test("a corpus with ZERO near-dup pairs takes the singleton fallback") {
    // every text is a single token → no 3-token shingles → jaccardPairs
    // is EMPTY and so is the label frame; sum(comp) over it is SQL NULL
    // — the degenerate corpus that used to NPE instead of reaching the
    // documented per-doc singleton assignment
    val dir = java.nio.file.Files.createTempDirectory("graft_pairless")
    (0 until 12).map(i => (i.toLong, s"solo$i", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(ExtQueries.jaccardPairs(spark, dir.toString).isEmpty,
      "fixture must generate no near-dup pairs")
    val out = ExtQueries.extSplitLeakageSafe.run(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length === 12)
    out.foreach { case (doc, comp, split) =>
      assert(comp === doc, s"pairless doc $doc must be its own component")
      assert(Set("train", "valid", "test").contains(split))
    }
  }
}
