package graft.queries

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-construction operators for a training-data pipeline, round 4:
  * priority-aware cross-source dedup (keep the copy from the most
  * curated source), domain-mixture weight computation (the per-source
  * sampling rates that hit a target token mixture), and a positional
  * inverted-index build (the search-side artifact BM25/decontamination
  * consume).
  *
  * Determinism rules (same as [[ExtQueries]]): integer arithmetic and
  * single double divisions only; every multi-element aggregation is
  * explicitly ordered before rendering to a string; no engine-internal
  * hash functions in compared columns.
  */
object CorpusQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Cross-source priority dedup: within each duplicate group keep the
    * copy from the MOST CURATED source (lowest priority rank), breaking
    * ties by doc_id — the canonical-copy selection step every multi-source
    * corpus build runs (e.g. prefer the curated dump over the crawl).
    * The synthetic corpus has no exact text dupes, so the dup-group key
    * is the (lang, n_words) content signature — a stand-in with real
    * groups; the selection semantics are the operator under test.
    * Source priority reuses the corpus convention (source index mod 4,
    * as in ext_sample_stratified). Scale posture: one keyed window over
    * the group key — no all-pairs, no driver iteration.
    */
  val extCrossSourceDedup = Q(
    "ext_cross_source_dedup",
    (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"n_words")
        .orderBy($"priority", $"doc_id")
      t(s, dir, "documents")
        .select($"doc_id", $"lang", $"source",
          size(split($"text", " ")).cast("bigint").as("n_words"),
          (expr("cast(substring(source, 4, 10) as int)") % 4).as("priority"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_copies",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy($"lang", $"n_words")))
        .where($"rn" === 1 && $"n_copies" >= 2)
        .select($"lang", $"n_words", $"n_copies",
          $"doc_id".as("keep_doc_id"), $"source".as("keep_source"),
          ($"n_copies" - 1).as("n_removed"))
        .orderBy($"lang", $"n_words")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, lang, source,
           |         len(string_split(text, ' ')) AS n_words,
           |         CAST(substring(source, 4, 10) AS INT) % 4 AS priority
           |  FROM documents),
           |r AS (
           |  SELECT *,
           |         ROW_NUMBER() OVER (PARTITION BY lang, n_words
           |                            ORDER BY priority, doc_id) AS rn,
           |         COUNT(*) OVER (PARTITION BY lang, n_words) AS n_copies
           |  FROM d)
           |SELECT lang, n_words, n_copies, doc_id AS keep_doc_id,
           |       source AS keep_source, n_copies - 1 AS n_removed
           |FROM r WHERE rn = 1 AND n_copies >= 2
           |ORDER BY lang, n_words""".stripMargin))

  /** Domain-mixture weights: given per-source available token counts and
    * a target mixture (uniform here — the config is one literal away from
    * any published mix), compute each source's target token share, the
    * sampling probability (capped at 1 — you cannot exact-sample more
    * than once), and the epoch factor (>1 ⇒ the source must repeat to
    * fill its share, the LLaMA/Pile-style upsampling knob). One keyed
    * agg + one broadcast-sized count — scale-independent.
    */
  val extMixtureWeights = Q(
    "ext_mixture_weights",
    (s, dir) => {
      import s.implicits._
      val budget = 100000L
      val avail = t(s, dir, "documents")
        .select($"source", size(split($"text", " ")).as("n_words"))
        .groupBy($"source")
        .agg(sum($"n_words").as("tokens_available"))
      val n = avail.select(count(lit(1)).as("n_sources"))
      avail.crossJoin(n)
        .select($"source", $"tokens_available",
          (lit(budget).cast("double") / $"n_sources".cast("double"))
            .as("target_tokens"))
        .withColumn("epochs",
          $"target_tokens" / $"tokens_available".cast("double"))
        .withColumn("sample_weight", least(lit(1.0d), $"epochs"))
        .withColumn("direction",
          when($"epochs" > 1.0d, lit("upsample")).otherwise(lit("downsample")))
        .orderBy($"source")
    },
    Some("""WITH avail AS (
           |  SELECT source,
           |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           |           AS tokens_available
           |  FROM documents GROUP BY source),
           |n AS (SELECT COUNT(*) AS n_sources FROM avail),
           |tgt AS (
           |  SELECT source, tokens_available,
           |         CAST(100000 AS DOUBLE) / CAST(n_sources AS DOUBLE)
           |           AS target_tokens
           |  FROM avail, n)
           |SELECT source, tokens_available, target_tokens,
           |       target_tokens / CAST(tokens_available AS DOUBLE) AS epochs,
           |       LEAST(CAST(1.0 AS DOUBLE),
           |             target_tokens / CAST(tokens_available AS DOUBLE))
           |         AS sample_weight,
           |       CASE WHEN target_tokens / CAST(tokens_available AS DOUBLE)
           |                  > CAST(1.0 AS DOUBLE)
           |            THEN 'upsample' ELSE 'downsample' END AS direction
           |FROM tgt ORDER BY source""".stripMargin))

  /** Positional inverted-index build over word-3-gram terms: per term,
    * document frequency and the full posting list
    * `doc:pos1-pos2 doc:pos1 …` (docs ascending, positions ascending) —
    * the artifact phrase search, BM25 and n-gram decontamination read.
    * Output is bounded by the df band (2..6): singleton terms carry no
    * search value and boilerplate terms are exactly the high-df keys the
    * dedup family caps away. Scale posture: two keyed aggregations over
    * the exploded gram stream; per-key state is bounded by the df cap,
    * so no group outgrows an executor regardless of corpus size.
    */
  val extInvertedIndex = Q(
    "ext_inverted_index",
    (s, dir) => {
      import s.implicits._
      val grams = t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .where(size($"w") >= 3)
        .select($"doc_id", posexplode(expr(
          "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
        .toDF("doc_id", "pos", "gram")
      grams
        .groupBy($"gram", $"doc_id")
        .agg(array_join(sort_array(collect_list($"pos")), "-").as("poslist"))
        .groupBy($"gram")
        .agg(count(lit(1)).as("df"),
          array_join(
            transform(
              array_sort(collect_list(struct($"doc_id", $"poslist"))),
              e => concat(e("doc_id").cast("string"), lit(":"), e("poslist"))),
            " ").as("postings"))
        .where($"df".between(2, 6))
        .orderBy($"gram")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
           |  WHERE len(string_split(text, ' ')) >= 3),
           |g AS (
           |  SELECT doc_id, CAST(u.i AS INT) AS pos,
           |         concat_ws(' ', w[u.i + 1], w[u.i + 2], w[u.i + 3]) AS gram
           |  FROM d, UNNEST(range(len(w) - 2)) AS u(i)),
           |pd AS (
           |  SELECT gram, doc_id,
           |         string_agg(CAST(pos AS VARCHAR), '-' ORDER BY pos)
           |           AS poslist
           |  FROM g GROUP BY gram, doc_id),
           |idx AS (
           |  SELECT gram, COUNT(*) AS df,
           |         string_agg(CAST(doc_id AS VARCHAR) || ':' || poslist,
           |                    ' ' ORDER BY doc_id) AS postings
           |  FROM pd GROUP BY gram)
           |SELECT gram, df, postings FROM idx
           |WHERE df BETWEEN 2 AND 6
           |ORDER BY gram""".stripMargin))

  /** Token-balanced shard assignment: order documents by size
    * (longest-processing-time first), deal rank k to shard (k−1) mod 8 —
    * the round-robin LPT approximation that keeps output shards within
    * one max-document of each other, used when writing a corpus as
    * fixed-count shards for data loaders. The global size rank is
    * computed SCALABLY: `row_number() OVER (ORDER BY tokens DESC)` with
    * no partition key would collapse the corpus into one window
    * partition, so rows rank within token-count BANDS (floor(tokens/16)
    * — a coarsening of the sort key, so band boundaries respect the
    * global order) and add prefix-summed band offsets, the
    * ext_global_index technique keyed by size band instead of source.
    * The oracle is the naive global ROW_NUMBER — equality proves the
    * banded rank IS the global rank.
    */
  val extShardBalance = Q(
    "ext_shard_balance",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .select($"doc_id",
          size(split($"text", " ")).cast("bigint").as("tokens"))
        .withColumn("band", floor($"tokens" / 16L))
      val inBand = d.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"band").orderBy($"tokens".desc, $"doc_id")))
      val offsets = d.groupBy($"band")
        .agg(count(lit(1)).as("n"))
        .withColumn("offset",
          coalesce(sum($"n").over(org.apache.spark.sql.expressions.Window
            .orderBy($"band".desc)
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)), lit(0L)))
        .select($"band", $"offset")
      inBand.join(broadcast(offsets), Seq("band"))
        .select($"doc_id", $"tokens",
          (($"offset" + $"rk" - 1) % 8).as("shard"))
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (
           |  SELECT doc_id,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, tokens,
           |         ROW_NUMBER() OVER (ORDER BY tokens DESC, doc_id) AS rnk
           |  FROM d)
           |SELECT doc_id, tokens, (rnk - 1) % 8 AS shard
           |FROM r ORDER BY doc_id""".stripMargin))

  /** CDC apply (MERGE-style current-state materialization): fold a
    * change stream — keyed upserts and deletes with sequence numbers —
    * into a base snapshot, last-write-wins per key, deletes dropping the
    * row. The complement of ext_scd2_history (which keeps every
    * version): this materializes the CURRENT table, the lakehouse MERGE
    * every CDC-fed pipeline runs. The change stream is synthesized
    * deterministically from orders (every 5th key an upsert doubling the
    * price, every 15th a delete that outranks it). One keyed window —
    * at 100 TB the snapshot and the delta shuffle once on the key;
    * nothing rescans history.
    */
  /** The deterministic CDC change feed shared by the batch apply and the
    * streaming foreachBatch merge: base snapshot at seq 0, every 5th key
    * upserted (doubled price) at seq 1, every 15th deleted at seq 2.
    */
  private def cdcFeedSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    import s.implicits._
    val base = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus",
        $"o_totalprice".cast("decimal(18,2)").as("o_totalprice"),
        lit(0L).as("seq"), lit("U").as("op"))
    val upserts = base.where($"o_orderkey" % 5 === 0)
      .select($"o_orderkey", lit("X").as("o_orderstatus"),
        ($"o_totalprice" * 2).cast("decimal(18,2)").as("o_totalprice"),
        lit(1L).as("seq"), lit("U").as("op"))
    val deletes = base.where($"o_orderkey" % 15 === 0)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
        lit(2L).as("seq"), lit("D").as("op"))
    Seq(base, upserts, deletes)
  }

  val extCdcApply = Q(
    "ext_cdc_apply",
    (s, dir) => {
      import s.implicits._
      val Seq(base, upserts, deletes) = cdcFeedSlices(s, dir)
      graft.ext.Cdc.currentState(
        base.unionByName(upserts).unionByName(deletes), "o_orderkey")
        .select($"o_orderkey", $"o_orderstatus",
          $"o_totalprice".cast("double").as("o_totalprice"))
        .orderBy($"o_orderkey")
    },
    Some(cdcOracleSql))

  /** One oracle for both CDC applies: the batch window and the
    * batch-split-insensitive streaming merge must land on the SAME
    * current table.
    */
  private lazy val cdcOracleSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
      |         0 AS seq, 'U' AS op
      |  FROM orders),
      |ups AS (
      |  SELECT o_orderkey, 'X' AS o_orderstatus,
      |         CAST(o_totalprice * 2 AS DECIMAL(18,2)) AS o_totalprice,
      |         1 AS seq, 'U' AS op
      |  FROM base WHERE o_orderkey % 5 = 0),
      |dels AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, 2 AS seq,
      |         'D' AS op
      |  FROM base WHERE o_orderkey % 15 = 0),
      |merged AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |                               ORDER BY seq DESC, op DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM ups
      |        UNION ALL SELECT * FROM dels))
      |SELECT o_orderkey, o_orderstatus,
      |       CAST(o_totalprice AS DOUBLE) AS o_totalprice
      |FROM merged WHERE rn = 1 AND op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** Streaming CDC ingestion — the change feed arrives as a FILE STREAM
    * (one micro-batch per file via maxFilesPerTrigger=1) and a
    * foreachBatch sink MERGEs each batch into a parquet state "lake"
    * with [[graft.ext.Cdc.mergeState]] (tombstones retained, so the
    * final table is provably insensitive to where the batch boundaries
    * fall — the oracle is the BATCH apply's result). This is the
    * streaming half of the CDC family: ext_cdc_apply is the one-shot
    * window; this is the continuously-running lakehouse MERGE (a real
    * deployment swaps the overwrite for a transactional MERGE; the
    * per-batch keyed merge and tombstone contract are identical). Feed,
    * lake and checkpoint live under a PER-INVOCATION unique key (two
    * concurrent invocations on the same dataset dir — a parallel suite
    * next to a bench run — must not have one's rebuild delete the dirs
    * the other's stream is reading) and are removed on the way out, the
    * result eagerly materialized first.
    */
  val extStreamCdcApply = Q(
    "ext_stream_cdc_apply",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      // dir key: MD5 digest, not a sanitized path (lossy: '/a/sf0.001'
      // and '/a/sf0_001' would collide) nor a 32-bit hashCode
      val safe = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8"))
        .take(6).map(b => f"${b & 0xff}%02x").mkString
      val tmp = System.getProperty("java.io.tmpdir", "/tmp")
      def rmTree(p: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          val paths =
            try walk.iterator().asScala.toSeq.reverse
            finally walk.close()
          paths.foreach(java.nio.file.Files.delete)
        }
      // the feed is BUILT per invocation (a cached feed keyed by path
      // would silently replay stale changes after the dataset at `dir`
      // is regenerated) under a unique suffix, so a concurrent
      // invocation on the same dataset dir can never delete or overwrite
      // the dirs this stream is reading; everything is removed in the
      // finally once the result is materialized
      val key = safe + "-" + java.util.UUID.randomUUID().toString.take(8)
      val feedDir = java.nio.file.Paths.get(tmp, "graft_stream_cdcfeed", key)
      val lake = java.nio.file.Paths.get(tmp, "graft_stream_cdclake", key)
      val ckpt = java.nio.file.Paths.get(tmp, "graft_stream_cdcckpt", key)
      try {
        java.nio.file.Files.createDirectories(feedDir)
        cdcFeedSlices(s, dir).zipWithIndex.foreach { case (slice, i) =>
          val stage = feedDir.resolve(s"_stage_$i")
          slice.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val listing = java.nio.file.Files.list(stage)
          val part =
            try listing.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"no part file in $stage"))
            finally listing.close()
          java.nio.file.Files.move(part, feedDir.resolve(s"cdc_$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          rmTree(stage)
        }
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DecimalType(18, 2)),
          StructField("seq", LongType), StructField("op", StringType)))
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir.toString)
        // the last micro-batch's merged state, ALREADY materialized by
        // the in-batch localCheckpoint: the final result below reads
        // these in-memory blocks, so no eager lake re-read is needed and
        // the finally can delete the dirs under a still-lazy plan.
        // foreachBatch runs batches sequentially on the driver, so the
        // plain var is safe.
        var lastState: Option[DataFrame] = None
        val q = stream.writeStream
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                _: Long) =>
              val cur = lastState.getOrElse(batch.limit(0))
              // localCheckpoint materializes the merge BEFORE the
              // overwrite touches the directory being read
              val merged = graft.ext.Cdc
                .mergeState(cur, batch, "o_orderkey")
                .localCheckpoint(true)
              merged.write.mode("overwrite").parquet(lake.toString)
              lastState = Some(merged)
              ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        lastState.getOrElse(s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
          .where($"op" =!= "D")
          .select($"o_orderkey", $"o_orderstatus",
            $"o_totalprice".cast("double").as("o_totalprice"))
          .orderBy($"o_orderkey")
      } finally {
        rmTree(feedDir); rmTree(lake); rmTree(ckpt)
      }
    },
    Some(cdcOracleSql))

  /** Kolmogorov–Smirnov drift detection: per source, the KS statistic
    * between the source's doc-length distribution and the corpus-wide
    * one — the standard data-quality monitor for "did this feed's
    * distribution move". KS = max |ecdf_s − ecdf_corpus| evaluated at
    * every observed value (the supremum of a step-function difference
    * occurs at a jump point, so the observed-value grid is exact, not an
    * approximation). Deterministic: cumulative INTEGER counts, one
    * double division each, comparisons only. Scale posture: one
    * (source, value) agg, one |sources|×|distinct values| grid (bounded
    * by the VALUE DOMAIN — doc lengths — not the row count), and every
    * cumulative sum is the banded prefix-sum from ext_global_index:
    * rank within a fixed value band (partition size ≤ band width), then
    * add band offsets prefix-summed over the BAND-LEVEL table (rows =
    * |bands|) — no unpartitioned row-level window anywhere in the plan.
    * Counts are integers, so the banded decomposition equals the flat
    * cumulative bit-for-bit and the oracle keeps the naive formulation.
    */
  val extKsDrift = Q(
    "ext_ks_drift",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val bandW = 256L // value-band width: every window runs within a band
      val d = t(s, dir, "documents").select($"source", $"n_chars")
      val counts = d.groupBy($"source", $"n_chars")
        .agg(count(lit(1)).as("c"))
      val grid = d.select($"source").distinct()
        .crossJoin(d.select($"n_chars").distinct())
        .join(counts, Seq("source", "n_chars"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("band", expr(s"n_chars div $bandW"))
      // per-source ECDF, banded: within-band running count (partition ≤
      // bandW distinct values) + per-source band offsets prefix-summed
      // over the (source, band)-level table
      val wSrcBand = Window.partitionBy($"source", $"band")
        .orderBy($"n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
      val srcOffsets = grid.groupBy($"source", $"band")
        .agg(sum($"c").as("bc"))
        .withColumn("offset",
          coalesce(sum($"bc").over(
            Window.partitionBy($"source").orderBy($"band")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"source", $"band", $"offset")
      val nSrc = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      // corpus ECDF, banded the same way; the only unpartitioned window
      // runs over the BAND-LEVEL table (rows = |bands|), the
      // ext_global_index convention
      val caBand = d.groupBy($"n_chars").agg(count(lit(1)).as("ca"))
        .withColumn("band", expr(s"n_chars div $bandW"))
      val bandOffsets = caBand.groupBy($"band").agg(sum($"ca").as("bt"))
        .withColumn("aoffset",
          coalesce(sum($"bt").over(
            Window.orderBy($"band")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"band", $"aoffset")
      val corpusCum = caBand
        .withColumn("cum_in_band",
          sum($"ca").over(Window.partitionBy($"band").orderBy($"n_chars")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .join(broadcast(bandOffsets), Seq("band"))
        .select($"n_chars", ($"aoffset" + $"cum_in_band").as("cum_all"))
      val nAll = d.agg(count(lit(1)).as("n_all"))
      grid
        .withColumn("cum_in_band", sum($"c").over(wSrcBand))
        .join(broadcast(srcOffsets), Seq("source", "band"))
        .withColumn("cum_s", $"offset" + $"cum_in_band")
        .join(broadcast(corpusCum), Seq("n_chars"))
        .join(broadcast(nSrc), Seq("source"))
        .crossJoin(broadcast(nAll))
        .withColumn("diff",
          abs($"cum_s".cast("double") / $"n_s".cast("double")
            - $"cum_all".cast("double") / $"n_all".cast("double")))
        .groupBy($"source")
        .agg(max($"diff").as("ks_stat"))
        .withColumn("drifted", $"ks_stat" > 0.2d)
        .orderBy($"source")
    },
    Some("""WITH d AS (SELECT source, n_chars FROM documents),
           |counts AS (
           |  SELECT source, n_chars, COUNT(*) AS c
           |  FROM d GROUP BY source, n_chars),
           |grid AS (
           |  SELECT s.source, v.n_chars, COALESCE(c.c, 0) AS c
           |  FROM (SELECT DISTINCT source FROM d) s
           |  CROSS JOIN (SELECT DISTINCT n_chars FROM d) v
           |  LEFT JOIN counts c
           |    ON c.source = s.source AND c.n_chars = v.n_chars),
           |cums AS (
           |  SELECT source, n_chars,
           |         SUM(c) OVER (PARTITION BY source ORDER BY n_chars
           |                      ROWS UNBOUNDED PRECEDING) AS cum_s
           |  FROM grid),
           |ca AS (
           |  SELECT n_chars,
           |         SUM(c2) OVER (ORDER BY n_chars
           |                       ROWS UNBOUNDED PRECEDING) AS cum_all
           |  FROM (SELECT n_chars, COUNT(*) AS c2 FROM d GROUP BY n_chars)),
           |ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
           |na AS (SELECT COUNT(*) AS n_all FROM d)
           |SELECT g.source,
           |       MAX(abs(CAST(g.cum_s AS DOUBLE) / CAST(ns.n_s AS DOUBLE)
           |           - CAST(ca.cum_all AS DOUBLE) / CAST(na.n_all AS DOUBLE)))
           |         AS ks_stat,
           |       MAX(abs(CAST(g.cum_s AS DOUBLE) / CAST(ns.n_s AS DOUBLE)
           |           - CAST(ca.cum_all AS DOUBLE) / CAST(na.n_all AS DOUBLE)))
           |         > CAST(0.2 AS DOUBLE) AS drifted
           |FROM cums g
           |JOIN ca ON g.n_chars = ca.n_chars
           |JOIN ns ON g.source = ns.source
           |CROSS JOIN na
           |GROUP BY g.source ORDER BY g.source""".stripMargin))

  /** Deterministic bootstrap confidence intervals for a per-source
    * corpus metric (mean doc length): 50 resample replicates drawn by an
    * affine index generator instead of rand() — reproducible across
    * runs, engines and partitionings, like every sampling surface here.
    * Replicate means are single divisions of exact integer sums (bit
    * identical cross-engine); the 95% CI picks the rank-2 / rank-49
    * replicate (ceil(0.025·50) / ceil(0.975·50)) with the replicate id
    * breaking ties. Scale posture: the draw grid is B× the corpus — at
    * 100 TB you bootstrap the per-partition AGGREGATES, not rows; the
    * machinery (indexing by keyed window, affine draws, rank-selected
    * quantiles) is identical.
    */
  val extBootstrapCi = Q(
    "ext_bootstrap_ci",
    (s, dir) => {
      import s.implicits._
      val b = 50
      val loRk = math.ceil(0.025 * b).toInt
      val hiRk = math.ceil(0.975 * b).toInt
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"doc_id")
      val d = t(s, dir, "documents")
        .select($"source", $"doc_id", $"n_chars")
        .withColumn("idx", row_number().over(w) - 1)
      val counts = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val draws = counts
        .select($"source", $"n_s",
          explode(sequence(lit(0), lit(b - 1))).as("b"))
        .select($"source", $"n_s", $"b",
          explode(expr("sequence(0, n_s - 1)")).as("j"))
        .withColumn("idx",
          (lit(1103515245L) * $"b" + lit(69069L) * $"j" + lit(12345L))
            % $"n_s")
      val means = draws
        .join(d, Seq("source", "idx"))
        .groupBy($"source", $"b")
        .agg((sum($"n_chars").cast("double")
          / count(lit(1)).cast("double")).as("m"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"m", $"b")
      val ci = means
        .withColumn("rk", row_number().over(wRank))
        .groupBy($"source")
        .agg(max(when($"rk" === loRk, $"m")).as("ci_lo"),
          max(when($"rk" === hiRk, $"m")).as("ci_hi"))
      d.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          (sum($"n_chars").cast("double")
            / count(lit(1)).cast("double")).as("mean_obs"))
        .join(ci, Seq("source"))
        .select($"source", $"n_docs", $"mean_obs", $"ci_lo", $"ci_hi")
        .orderBy($"source")
    },
    Some {
      val b = 50
      val loRk = math.ceil(0.025 * b).toInt
      val hiRk = math.ceil(0.975 * b).toInt
      s"""WITH d AS (
           |  SELECT source, doc_id, n_chars,
           |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
           |           - 1 AS idx
           |  FROM documents),
           |counts AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
           |draws AS (
           |  SELECT c.source, c.n_s, b.b, j.j,
           |         (1103515245 * b.b + 69069 * j.j + 12345) % c.n_s AS idx
           |  FROM counts c,
           |       UNNEST(range($b)) AS b(b),
           |       UNNEST(range(c.n_s)) AS j(j)),
           |means AS (
           |  SELECT dr.source, dr.b,
           |         CAST(SUM(d.n_chars) AS DOUBLE)
           |           / CAST(COUNT(*) AS DOUBLE) AS m
           |  FROM draws dr JOIN d ON d.source = dr.source AND d.idx = dr.idx
           |  GROUP BY dr.source, dr.b),
           |ranked AS (
           |  SELECT source, m,
           |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY m, b)
           |           AS rk
           |  FROM means),
           |ci AS (
           |  SELECT source, MAX(CASE WHEN rk = $loRk THEN m END) AS ci_lo,
           |         MAX(CASE WHEN rk = $hiRk THEN m END) AS ci_hi
           |  FROM ranked GROUP BY source),
           |obs AS (
           |  SELECT source, COUNT(*) AS n_docs,
           |         CAST(SUM(n_chars) AS DOUBLE)
           |           / CAST(COUNT(*) AS DOUBLE) AS mean_obs
           |  FROM d GROUP BY source)
           |SELECT o.source, o.n_docs, o.mean_obs, c.ci_lo, c.ci_hi
           |FROM obs o JOIN ci c ON o.source = c.source
           |ORDER BY o.source""".stripMargin
    })

  /** Edit-distance near-dup pairs over 30-char prefixes (title/header
    * dedup — the string-metric member of the dedup family, next to the
    * token-set (Jaccard/MinHash), bit-vector (SimHash) and embedding
    * members). Candidate pairs come from (lang, HEAD TOKEN of the
    * prefix) blocking — never all-pairs, and the key is derived from
    * the COMPARED text itself, so near-identical prefixes (which share
    * their first word unless the edit hits it) land in the same block;
    * missing first-word edits is the standard blocking trade-off.
    * Like every other self-join family member, the block POPULATION is
    * capped at [[ExtQueries.lshBucketCap]]: a stop-word head token
    * ("The …") would otherwise put a large corpus fraction into one
    * block — k(k−1)/2 pairs on a skewed key, a quadratic straggler at
    * 100 TB. A dropped block discriminates nothing (its members are
    * mostly NOT near-dups of each other); recall for pairs whose only
    * shared block is hot drops by design (EditDistCapSpec pins both
    * sides). The oracle applies the identical cap. levenshtein is built
    * into both engines with the classic DP semantics, so distances
    * hash-compare.
    */
  val extDedupEditDistance = Q(
    "ext_dedup_edit_distance",
    (s, dir) => {
      import s.implicits._
      // materialized once: read by the block-population count AND the
      // capped self-join below
      val d = t(s, dir, "documents")
        .select($"doc_id", $"lang",
          substring($"text", 1, 30).as("prefix"))
        .withColumn("head", split($"prefix", " ")(0))
        .transform(Q.mat)
      val okBlocks = d.groupBy($"lang", $"head")
        .agg(count(lit(1)).as("bpop"))
        .where($"bpop" <= ExtQueries.lshBucketCap)
        .select($"lang", $"head")
      val capped = d.join(okBlocks, Seq("lang", "head"))
      capped.as("a").join(capped.as("b"),
          col("a.lang") === col("b.lang")
            && col("a.head") === col("b.head")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          levenshtein(col("a.prefix"), col("b.prefix")).as("dist"))
        .where($"dist" <= 10)
        .orderBy($"id_a", $"id_b")
    },
    Some(s"""WITH d AS (
           |  SELECT doc_id, lang, substring(text, 1, 30) AS prefix,
           |         string_split(substring(text, 1, 30), ' ')[1] AS head
           |  FROM documents),
           |ok AS (
           |  SELECT lang, head FROM d GROUP BY lang, head
           |  HAVING COUNT(*) <= ${ExtQueries.lshBucketCap}),
           |c AS (
           |  SELECT d.* FROM d JOIN ok USING (lang, head))
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |       CAST(levenshtein(a.prefix, b.prefix) AS INT) AS dist
           |FROM c a JOIN c b
           |  ON a.lang = b.lang AND a.head = b.head
           | AND a.doc_id < b.doc_id
           |WHERE levenshtein(a.prefix, b.prefix) <= 10
           |ORDER BY id_a, id_b""".stripMargin))

  /** Population Stability Index drift monitor — the OTHER standard
    * distribution-shift test next to [[extKsDrift]]: KS reports the max
    * ECDF gap (sensitive to a single sharp shift), PSI sums
    * (p_s − p_c)·ln(p_s/p_c) over fixed bins (sensitive to diffuse
    * reshaping; the credit-scoring convention: < 0.1 stable, > 0.25
    * shifted). Ten equal-width bins over the corpus value range with
    * INTEGER bin arithmetic (exact cross-engine); +1/B Laplace
    * smoothing keeps empty bins finite; ln runs on the portable
    * sqrt-chain ([[CurationQueries.portableLnOfU]]) over
    * greatest/least-normalized INTEGER ratios, sign split on the
    * integer compare — every double is a single division or product of
    * identical expression trees, so PSI hash-compares. Scale posture:
    * one (source, bin) agg + a |sources|×10 grid; the per-source sum is
    * a 10-element bin-ordered fold (bounded agg state by construction).
    * (The integer num/den products bound the exact path to ~3·10⁹ rows
    * per side before BIGINT overflow; past that, drop to the
    * per-probability doubles — the determinism argument is unchanged.)
    */
  val extPsiDrift = Q(
    "ext_psi_drift",
    (s, dir) => {
      import s.implicits._
      val B = 10
      val d = t(s, dir, "documents").select($"source", $"n_chars")
      val mm = d.agg(min($"n_chars").as("vmin"), max($"n_chars").as("vmax"),
        count(lit(1)).as("n_all"))
      val binned = d.crossJoin(broadcast(mm))
        .withColumn("bin", expr(
          s"least($B - 1, ((n_chars - vmin) * $B) div (vmax - vmin + 1))"))
      val srcCounts = binned.groupBy($"source", $"bin")
        .agg(count(lit(1)).as("c_sb"))
      val corpusCounts = binned.groupBy($"bin")
        .agg(count(lit(1)).as("c_cb"))
      val srcN = d.groupBy($"source").agg(count(lit(1)).as("n_s"))
      val bins = s.range(B).select($"id".as("bin"))
      val grid = d.select($"source").distinct().crossJoin(broadcast(bins))
      grid
        .join(srcCounts, Seq("source", "bin"), "left")
        .na.fill(0L, Seq("c_sb"))
        .join(broadcast(corpusCounts), Seq("bin"), "left")
        .na.fill(0L, Seq("c_cb"))
        .join(broadcast(srcN), "source")
        .crossJoin(broadcast(mm.select($"n_all")))
        .withColumn("p_s",
          ($"c_sb" + lit(1L)).cast("double")
            / ($"n_s" + lit(B.toLong)).cast("double"))
        .withColumn("p_c",
          ($"c_cb" + lit(1L)).cast("double")
            / ($"n_all" + lit(B.toLong)).cast("double"))
        .withColumn("num", ($"c_sb" + lit(1L)) * ($"n_all" + lit(B.toLong)))
        .withColumn("den", ($"c_cb" + lit(1L)) * ($"n_s" + lit(B.toLong)))
        .withColumn("rmax",
          greatest($"num", $"den").cast("double")
            / least($"num", $"den").cast("double"))
        .withColumn("y", expr(CurationQueries.sixSqrt("rmax")))
        .withColumn("u", ($"y" - lit(1.0d)) / ($"y" + lit(1.0d)))
        .withColumn("u2", $"u" * $"u")
        .withColumn("lnabs", expr(CurationQueries.portableLnOfU))
        .withColumn("lnr",
          when($"num" >= $"den", $"lnabs").otherwise(-$"lnabs"))
        .withColumn("term", ($"p_s" - $"p_c") * $"lnr")
        .groupBy($"source")
        .agg(expr(
          "aggregate(transform(array_sort(collect_list(struct(bin, term))), x -> x.term), 0D, (a, x) -> a + x)")
          .as("psi"))
        .withColumn("drifted", $"psi" > lit(0.25d))
        .orderBy($"source")
    },
    Some {
      val ln = CurationQueries.portableLnOfU
      s"""WITH d AS (SELECT source, n_chars FROM documents),
         |mm AS (SELECT MIN(n_chars) AS vmin, MAX(n_chars) AS vmax,
         |              COUNT(*) AS n_all FROM d),
         |b AS (
         |  SELECT source,
         |         LEAST(9, ((n_chars - vmin) * 10) // (vmax - vmin + 1))
         |           AS bin
         |  FROM d, mm),
         |sc AS (SELECT source, bin, COUNT(*) AS c_sb FROM b GROUP BY 1, 2),
         |cc AS (SELECT bin, COUNT(*) AS c_cb FROM b GROUP BY 1),
         |ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY 1),
         |grid AS (
         |  SELECT s.source, g.bin
         |  FROM (SELECT DISTINCT source FROM d) s,
         |       (SELECT unnest(range(10)) AS bin) g),
         |cells AS (
         |  SELECT grid.source, grid.bin,
         |         COALESCE(sc.c_sb, 0) AS c_sb,
         |         COALESCE(cc.c_cb, 0) AS c_cb, ns.n_s, mm.n_all
         |  FROM grid
         |  LEFT JOIN sc ON sc.source = grid.source AND sc.bin = grid.bin
         |  LEFT JOIN cc ON cc.bin = grid.bin
         |  JOIN ns ON ns.source = grid.source, mm),
         |t0 AS (
         |  SELECT source, bin,
         |         CAST(c_sb + 1 AS DOUBLE) / CAST(n_s + 10 AS DOUBLE) AS p_s,
         |         CAST(c_cb + 1 AS DOUBLE) / CAST(n_all + 10 AS DOUBLE) AS p_c,
         |         (c_sb + 1) * (n_all + 10) AS num,
         |         (c_cb + 1) * (n_s + 10) AS den
         |  FROM cells),
         |t1 AS (SELECT *, CAST(GREATEST(num, den) AS DOUBLE)
         |                 / CAST(LEAST(num, den) AS DOUBLE) AS rmax FROM t0),
         |t2 AS (SELECT *, ${CurationQueries.sixSqrt("rmax")} AS y FROM t1),
         |t3 AS (SELECT *, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u FROM t2),
         |t4 AS (SELECT *, u * u AS u2 FROM t3),
         |t5 AS (
         |  SELECT source, bin,
         |         (p_s - p_c) * (CASE WHEN num >= den THEN ($ln)
         |                             ELSE -($ln) END) AS term
         |  FROM t4),
         |agg AS (
         |  SELECT source,
         |         list_reduce([CAST(0 AS DOUBLE)] ||
         |           list(term ORDER BY bin), (a, x) -> a + x) AS psi
         |  FROM t5 GROUP BY source)
         |SELECT source, psi, psi > CAST(0.25 AS DOUBLE) AS drifted
         |FROM agg ORDER BY source""".stripMargin
    })

  val all: Seq[Q] =
    Seq(extCrossSourceDedup, extMixtureWeights, extInvertedIndex,
      extShardBalance, extCdcApply, extStreamCdcApply, extKsDrift,
      extBootstrapCi, extDedupEditDistance, extPsiDrift)
}
