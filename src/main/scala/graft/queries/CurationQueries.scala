package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data curation operators beyond the round-1/2 extension set:
  * deterministic weighted sampling (corpus mixing), repetition-based
  * quality signals (Gopher-style), BM25 retrieval over corpus statistics,
  * sub-document chunk-hash dedup (the exact-substring family), SCD-2
  * change history, a bloom-filter pre-filtered anti-join, and a
  * stream-stream interval join. Shares the engine-portable polynomial
  * hash family with [[ExtQueries]] so every deterministic surface has a
  * DuckDB oracle.
  *
  * Determinism rules (same as ExtQueries): double arithmetic is written
  * as the SAME expression tree on both engines (IEEE ops are exactly
  * specified, so +,-,*,/ on identical inputs are bit-identical);
  * multi-term double SUMS are avoided in favor of fixed-order explicit
  * addition (a grouped SUM's accumulation order is partition-dependent).
  */
object CurationQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic stratified sampling for training-mix construction:
    * keep a per-source fraction of documents chosen by a hash of the doc
    * id — reproducible across runs, engines and partitionings (unlike
    * rand()-based Dataset.sample), and carrying the inverse-probability
    * weight column downstream estimators need. The polynomial base hash
    * is LINEAR in the key digits, so on structured key sets (ids in
    * arithmetic progression) its low-order residues cluster; squaring
    * (h² + h mod p) breaks the linearity and restores uniform residues —
    * checked against per-source binomial bounds in CurationSpec.
    * Per-source rates (200‰..800‰ by source index mod 4) stand in for a
    * real mixing config. Scale posture: a pure column predicate — no
    * shuffle, fully pushdown-friendly, works identically on 100 TB.
    */
  val extSampleStratified = Q(
    "ext_sample_stratified",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("sk", concat(lit("smp:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % ExtQueries.mhP)
        .withColumn("rate_pm",
          (expr("cast(substring(source, 4, 10) as int)") % 4 + 1) * lit(200))
        .where($"h2" % 1000 < $"rate_pm")
        .select($"doc_id", $"source",
          ($"rate_pm".cast("double") / lit(1000.0d)).as("sample_rate"),
          (lit(1000.0d) / $"rate_pm".cast("double")).as("weight"))
        .orderBy($"doc_id")
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |         'smp:' || CAST(doc_id AS VARCHAR) AS sk,
            |         (CAST(substring(source, 4, 10) AS INT) % 4 + 1) * 200 AS rate_pm
            |  FROM documents),
            |h AS (
            |  SELECT doc_id, source, rate_pm,
            |         ${ExtQueries.mhBaseDuck("sk")} AS h
            |  FROM d)
            |SELECT doc_id, source,
            |       CAST(rate_pm AS DOUBLE) / CAST(1000 AS DOUBLE) AS sample_rate,
            |       CAST(1000 AS DOUBLE) / CAST(rate_pm AS DOUBLE) AS weight
            |FROM h
            |WHERE ((h * h + h) % ${ExtQueries.mhP}) % 1000 < rate_pm
            |ORDER BY doc_id""".stripMargin))

  /** Gopher-style repetition quality signals: distinct-word ratio, top
    * single-word frequency fraction, top word-bigram fraction (the
    * "fraction of characters in the most common n-gram" family of
    * Rae et al. 2021 §A1.1, word-level). Two keyed aggregations per doc
    * — no all-pairs, no driver loops; ratios are single double divisions
    * (bit-identical cross-engine).
    */
  val extQualityRepetition = Q(
    "ext_quality_repetition",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
      val wordStats = docs
        .select($"doc_id", size($"w").as("n_words"), explode($"w").as("word"))
        .groupBy($"doc_id", $"n_words", $"word")
        .agg(count(lit(1)).as("c"))
        .groupBy($"doc_id", $"n_words")
        .agg(count(lit(1)).as("n_distinct"), max($"c").as("top_w"))
      val bigramStats = docs
        .where(size($"w") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"))
          .as("bg"))
        .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id").agg(max($"c").as("top_bg"))
      wordStats.join(bigramStats, Seq("doc_id"), "left")
        .select($"doc_id", $"n_words".cast("bigint").as("n_words"),
          ($"n_distinct".cast("double") / $"n_words".cast("double"))
            .as("distinct_ratio"),
          ($"top_w".cast("double") / $"n_words".cast("double"))
            .as("top_word_frac"),
          (coalesce($"top_bg", lit(0L)).cast("double")
            / ($"n_words" - 1).cast("double")).as("top_bigram_frac"))
        .withColumn("is_repetitive", $"distinct_ratio" < 0.35)
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
           |wc AS (
           |  SELECT doc_id, n_words, word, COUNT(*) AS c
           |  FROM (SELECT doc_id, len(s) AS n_words, unnest(s) AS word FROM d) t
           |  GROUP BY 1, 2, 3),
           |wstats AS (
           |  SELECT doc_id, n_words, COUNT(*) AS n_distinct, MAX(c) AS top_w
           |  FROM wc GROUP BY 1, 2),
           |bg AS (
           |  SELECT doc_id, unnest(list_transform(range(len(s) - 1),
           |                 i -> s[i+1] || ' ' || s[i+2])) AS bg
           |  FROM d WHERE len(s) >= 2),
           |bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
           |bstats AS (SELECT doc_id, MAX(c) AS top_bg FROM bgc GROUP BY 1)
           |SELECT w.doc_id, CAST(w.n_words AS BIGINT) AS n_words,
           |       CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE) AS distinct_ratio,
           |       CAST(w.top_w AS DOUBLE) / CAST(w.n_words AS DOUBLE) AS top_word_frac,
           |       CAST(COALESCE(b.top_bg, 0) AS DOUBLE) / CAST(w.n_words - 1 AS DOUBLE) AS top_bigram_frac,
           |       CAST(w.n_distinct AS DOUBLE) / CAST(w.n_words AS DOUBLE) < 0.35 AS is_repetitive
           |FROM wstats w LEFT JOIN bstats b ON w.doc_id = b.doc_id
           |ORDER BY w.doc_id""".stripMargin))

  /** Portable natural log, bit-identical across engines: Spark's
    * Math.log and DuckDB's libm log may differ in the last ulp (observed
    * on 5/20 BM25 scores), which fails an exact cross-engine compare.
    * This formulation uses ONLY operations IEEE 754 requires to be
    * correctly rounded (+,−,×,÷,sqrt), so any two conforming engines
    * produce the same bits: ln(x) = 128·artanh(y) with y = x^(1/64) via
    * six nested sqrts (argument reduction), artanh by a 12-term Horner
    * series (u = (y−1)/(y+1) ≤ 0.17 for x ≤ 4·10⁹ ⇒ truncation < 1e-19).
    * Accuracy vs true ln is ~1e-13 relative (sqrt-chain rounding × 128)
    * — immaterial for scoring; determinism is exact. The returned SQL
    * fragment references columns `u` and `u2 = u·u` which callers
    * must stage first (both engines accept the identical fragment).
    */
  private[queries] val portableLnOfU: String = {
    val acc0 = "(CAST(1 AS DOUBLE)/CAST(23 AS DOUBLE))"
    val horner = (10 to 0 by -1).foldLeft(acc0)((acc, k) =>
      s"((CAST(1 AS DOUBLE)/CAST(${2 * k + 1} AS DOUBLE)) + u2 * $acc)")
    s"CAST(128 AS DOUBLE) * u * $horner"
  }
  private[queries] val sixSqrt: String => String =
    x => s"sqrt(sqrt(sqrt(sqrt(sqrt(sqrt($x))))))"

  /** BM25 retrieval (k1=1.2, b=0.75) of a fixed 3-term query over the
    * corpus: per-doc term frequencies joined with corpus document
    * frequencies and average doc length, Robertson idf
    * ln(1 + (N−df+0.5)/(df+0.5)) computed with [[portableLnOfU]] so both
    * engines produce identical doubles. The three per-term weights are
    * summed in a FIXED left-to-right order (a grouped double SUM would
    * be partition-order-dependent). Scale posture: tf is one keyed agg
    * over the token stream, df/avgdl are tiny broadcast aggregates,
    * top-k is TakeOrderedAndProject — no global sort.
    */
  val extBm25Search = Q(
    "ext_bm25_search",
    (s, dir) => {
      import s.implicits._
      val terms = Seq("spark", "join", "window")
      val docs = t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
      val dl = docs.select($"doc_id", size($"w").cast("double").as("dl"))
      val tf = docs
        .select($"doc_id", explode($"w").as("word"))
        .where($"word".isin(terms: _*))
        .groupBy($"doc_id", $"word").agg(count(lit(1)).cast("double").as("tf"))
      val dfreq = tf.groupBy($"word").agg(count(lit(1)).cast("double").as("df"))
      val corpus = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        sum($"dl").as("sum_dl"))
      val scored = tf
        .join(broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("xarg",
          lit(1.0d) + ($"n_docs" - $"df" + lit(0.5d)) / ($"df" + lit(0.5d)))
        .withColumn("y", expr(sixSqrt("xarg")))
        .withColumn("u", ($"y" - lit(1.0d)) / ($"y" + lit(1.0d)))
        .withColumn("u2", $"u" * $"u")
        .withColumn("idf", expr(portableLnOfU))
        .withColumn("tfw",
          ($"tf" * lit(2.2d))
            / ($"tf" + lit(1.2d)
              * (lit(0.25d) + lit(0.75d) * ($"dl" / ($"sum_dl" / $"n_docs")))))
        .withColumn("tscore", $"idf" * $"tfw")
      val perTerm = scored.groupBy($"doc_id").agg(
        sum(when($"word" === "spark", $"tscore")).as("s1"),
        sum(when($"word" === "join", $"tscore")).as("s2"),
        sum(when($"word" === "window", $"tscore")).as("s3"))
      perTerm
        .select($"doc_id",
          (coalesce($"s1", lit(0.0d)) + coalesce($"s2", lit(0.0d))
            + coalesce($"s3", lit(0.0d))).as("score"))
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            |dl AS (SELECT doc_id, CAST(len(s) AS DOUBLE) AS dl FROM d),
            |tf AS (
            |  SELECT doc_id, word, CAST(COUNT(*) AS DOUBLE) AS tf
            |  FROM (SELECT doc_id, unnest(s) AS word FROM d) t
            |  WHERE word IN ('spark', 'join', 'window')
            |  GROUP BY 1, 2),
            |dfreq AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
            |corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, SUM(dl) AS sum_dl FROM dl),
            |staged AS (
            |  SELECT tf.doc_id, tf.word, tf.tf, f.df, dl.dl, c.n_docs, c.sum_dl,
            |         CAST(1 AS DOUBLE) + (c.n_docs - f.df + CAST(0.5 AS DOUBLE))
            |           / (f.df + CAST(0.5 AS DOUBLE)) AS xarg
            |  FROM tf JOIN dfreq f ON tf.word = f.word
            |  JOIN dl ON tf.doc_id = dl.doc_id
            |  CROSS JOIN corpus c),
            |ustage AS (
            |  SELECT *, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u
            |  FROM (SELECT *, ${sixSqrt("xarg")} AS y FROM staged)),
            |scored AS (
            |  SELECT doc_id, word,
            |         ($portableLnOfU)
            |         * ((tf * CAST(2.2 AS DOUBLE))
            |            / (tf + CAST(1.2 AS DOUBLE)
            |               * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
            |                  * (dl / (sum_dl / n_docs))))) AS tscore
            |  FROM (SELECT *, u * u AS u2 FROM ustage)),
            |pt AS (
            |  SELECT doc_id,
            |         SUM(CASE WHEN word = 'spark' THEN tscore END) AS s1,
            |         SUM(CASE WHEN word = 'join' THEN tscore END) AS s2,
            |         SUM(CASE WHEN word = 'window' THEN tscore END) AS s3
            |  FROM scored GROUP BY 1)
            |SELECT doc_id,
            |       COALESCE(s1, CAST(0 AS DOUBLE)) + COALESCE(s2, CAST(0 AS DOUBLE))
            |         + COALESCE(s3, CAST(0 AS DOUBLE)) AS score
            |FROM pt
            |ORDER BY score DESC, doc_id
            |LIMIT 20""".stripMargin))

  /** Chunk doc-frequency cap (same rationale as
    * [[ExtQueries.gramDocFreqCap]]): a chunk shared by k docs costs k²
    * join rows and discriminates nothing once k is large.
    */
  private[graft] val chunkDocFreqCap = graft.ScaleConfig.chunkDocFreqCap

  /** Sub-document dedup via CONTENT-DEFINED chunking — the scalable
    * approximation of exact-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": shared
    * long substrings signal contamination even when full-doc similarity
    * is low). Chunk boundaries are chosen by word CONTENT (portable hash
    * of the word ≡ 0 mod 8 starts a new chunk — the rsync/LBFS trick),
    * so two documents sharing a long word run produce IDENTICAL interior
    * chunks regardless of where the run sits in each doc; fixed-stride
    * chunking would only match runs at equal offsets mod stride.
    * Expected chunk length 8 words; chunks under 4 words are dropped as
    * non-discriminative, and the chunk-key self-join applies the same
    * doc-frequency cap as the gram family ([[chunkDocFreqCap]]) — never
    * all-pairs. One window + one keyed agg per doc; inverted-index join.
    */
  val extDedupChunk = Q(
    "ext_dedup_chunk",
    (s, dir) => {
      import s.implicits._
      val tok = t(s, dir, "documents")
        .select($"doc_id", posexplode(split($"text", " ")))
        .toDF("doc_id", "pos", "word")
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seg = tok
        .withColumn("bd",
          when(expr(ExtQueries.mhBaseNative(s, "word")) % 8 === 0, 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"bd").over(w))
      val chunks = seg.groupBy($"doc_id", $"sid")
        .agg(count(lit(1)).as("nw"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct($"pos", $"word"))),
            x => x.getField("word"))).as("chunk"))
        .where($"nw" >= 4)
        .select($"doc_id", $"chunk").distinct()
        // the chunking window+agg over the token stream feeds the df
        // count and both self-join sides — materialize it exactly once
        .transform(Q.mat)
      val rare = chunks.groupBy($"chunk")
        .agg(count(lit(1)).as("cdf"))
        .where($"cdf" <= chunkDocFreqCap)
        .select($"chunk")
      val capped = chunks.join(rare, Seq("chunk"))
      capped.as("a")
        .join(capped.as("b"),
          col("a.chunk") === col("b.chunk")
            && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared_chunks"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            |tok AS (
            |  SELECT doc_id, unnest(range(1, len(s) + 1)) AS pos,
            |         unnest(s) AS word
            |  FROM d),
            |seg AS (
            |  SELECT doc_id, pos, word,
            |         SUM(CASE WHEN ${ExtQueries.mhBaseDuck("word")} % 8 = 0
            |                  THEN 1 ELSE 0 END)
            |           OVER (PARTITION BY doc_id ORDER BY pos
            |                 ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM tok),
            |ch AS (
            |  SELECT doc_id, sid, COUNT(*) AS nw,
            |         string_agg(word, ' ' ORDER BY pos) AS chunk
            |  FROM seg GROUP BY 1, 2),
            |c0 AS (SELECT DISTINCT doc_id, chunk FROM ch WHERE nw >= 4),
            |rare AS (SELECT chunk FROM c0 GROUP BY 1 HAVING COUNT(*) <= $chunkDocFreqCap),
            |c AS (SELECT c0.doc_id, c0.chunk FROM c0 JOIN rare USING (chunk))
            |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_chunks
            |FROM c a JOIN c b ON a.chunk = b.chunk AND a.doc_id < b.doc_id
            |GROUP BY 1, 2
            |ORDER BY doc_a, doc_b""".stripMargin))

  /** SCD type-2 history built from a change stream: each user's event
    * sequence becomes validity intervals [valid_from, valid_to) with an
    * is_current flag on the open row — the standard
    * dimension-change-tracking shape the reference's static dims lack.
    * One ranking window per user; no self-join (the naive formulation),
    * no driver loop.
    */
  val extScd2History = Q(
    "ext_scd2_history",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type".as("state"), $"ts")
        .withColumn("valid_to", lead($"ts", 1).over(w))
        .select($"user_id", $"event_id", $"state",
          $"ts".as("valid_from"), $"valid_to",
          $"valid_to".isNull.as("is_current"))
        .orderBy($"user_id", $"valid_from", $"event_id")
    },
    Some("""SELECT user_id, event_id, event_type AS state,
           |       CAST(ts AS TIMESTAMP) AS valid_from,
           |       LEAD(CAST(ts AS TIMESTAMP)) OVER
           |         (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
           |       LEAD(CAST(ts AS TIMESTAMP)) OVER
           |         (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL AS is_current
           |FROM events
           |ORDER BY user_id, valid_from, event_id""".stripMargin))

  /** Bloom-filter pre-filtered anti-join: drop a blocklist (here: the
    * non-representative duplicates from the exact-dedup ranking) from
    * the corpus WITHOUT shuffling the corpus. The serialized bloom
    * filter built over blocklist keys rides into the plan as a binary
    * literal probed by Catalyst's native codegen'd
    * `BloomFilterMightContain` (exposed as `bloom_might_contain` via
    * [[graft.functions.BloomMightContain]] — a pure column predicate, no
    * typed-filter lambda, no per-row deserialization).
    * `might_contain == false` proves non-membership (no false
    * negatives), so those rows pass with zero shuffle; only the
    * bloom-positive sliver takes the exact left_anti join that removes
    * false positives. Result is exactly the anti-join — the oracle
    * states it directly. At 100 TB this turns an all-corpus shuffle
    * into a broadcast probe + a join on ~fpp·N rows.
    */
  val extBloomPrefilter = Q(
    "ext_bloom_prefilter",
    (s, dir) => {
      import s.implicits._
      graft.functions.BloomMightContain.register(s)
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"lang", $"source", $"n_chars")
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      val blocklist = t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .where($"rn" > 1)
        .select($"doc_id")
      // size the sketch from the actual blocklist cardinality (one tiny
      // driver count — it sizes the sketch, it does not iterate rows)
      val nBlocked = math.max(blocklist.count(), 1000L)
      val bf = blocklist.stat.bloomFilter("doc_id", nBlocked, 0.01)
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os)
      // the sketch enters the plan as a FOLDABLE expression
      // (unhex of a literal) — BloomFilterMightContain requires the
      // bloom side to constant-fold so it deserializes once per task
      val hex = os.toByteArray.map("%02X".format(_)).mkString
      val probe = expr(s"bloom_might_contain(unhex('$hex'), doc_id)")
      val definiteKeep = docs.where(!probe)
      val maybeBlocked = docs.where(probe)
        .join(blocklist, Seq("doc_id"), "left_anti")
      definiteKeep.unionByName(maybeBlocked).orderBy($"doc_id")
    },
    Some("""SELECT doc_id, lang, source, n_chars
           |FROM documents
           |QUALIFY ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1
           |ORDER BY doc_id""".stripMargin))

  /** Structured Streaming stream-stream interval join
    * ([[graft.streaming.StreamOps.clickAttribution]]): purchases joined
    * to the same user's clicks within the preceding 30 minutes, both
    * sides watermarked so join state expires. Batch-equivalent oracle is
    * the corresponding range self-join.
    */
  val extStreamJoin = Q(
    "ext_stream_join",
    (s, dir) => {
      import s.implicits._
      val name = "stream_join_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, ExtQueries.streamSourceDir(dir, "join"),
        ExtQueries.eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.clickAttribution(
          ExtQueries.normalizeStreamTs(df)),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8))
        .orderBy($"purchase_id", $"click_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type,
           |                  CAST(ts AS TIMESTAMP) AS ts FROM events)
           |SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           |       c.event_id AS click_id, c.ts AS click_ts
           |FROM e p JOIN e c
           |  ON c.user_id = p.user_id
           | AND p.event_type = 'purchase' AND c.event_type = 'click'
           | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
           |ORDER BY purchase_id, click_id""".stripMargin))

  /** Stream-stream LEFT OUTER join ([[graft.streaming.StreamOps
    * .clickAttributionOuter]]): purchases without a click in the window
    * emit null click columns — but ONLY once the watermark proves no
    * future click can match. The oracle replicates both halves: the
    * inner matches, plus unmatched purchases the engine's left-state
    * eviction has finalized: the GLOBAL watermark is the minimum of the
    * per-side watermarks (each from its own filtered stream — the click
    * side's max can trail the purchase side's by hours), and a purchase
    * finalizes at p.ts ≤ W (no future click with ts > W can satisfy
    * click_ts ≤ p.ts). Purchases newer than W are correctly ABSENT when
    * the feed ends — the eviction contract itself is what the driver
    * hash-checks, verified at two scale factors with different
    * watermark-dominating sides.
    */
  val extStreamJoinOuter = Q(
    "ext_stream_join_outer",
    (s, dir) => {
      import s.implicits._
      val name = "stream_join_outer_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, ExtQueries.streamSourceDir(dir, "join_outer"),
        ExtQueries.eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.clickAttributionOuter(
          ExtQueries.normalizeStreamTs(df)),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8))
        .orderBy($"purchase_id", $"click_id".asc_nulls_first)
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type,
           |                  CAST(ts AS TIMESTAMP) AS ts FROM events),
           |matched AS (
           |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           |         c.event_id AS click_id, c.ts AS click_ts
           |  FROM e p JOIN e c
           |    ON c.user_id = p.user_id
           |   AND p.event_type = 'purchase' AND c.event_type = 'click'
           |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE),
           |mx AS (
           |  -- the engine's finalization bound, replicated exactly:
           |  -- each side's watermark derives from ITS OWN filtered
           |  -- stream (floor_ms(max event time) - the 10-min delay;
           |  -- Spark tracks watermarks at millisecond precision), the
           |  -- global watermark is their MINIMUM - null-propagating,
           |  -- because a side that saw no rows holds the global
           |  -- watermark at epoch and nothing ever finalizes - and
           |  -- Spark subtracts ONE MORE millisecond for state bounds
           |  -- derived from non-strict predicates
           |  -- (StreamingJoinHelper.getStateValueWatermark maps
           |  -- LessThanOrEqual/GreaterThanOrEqual with `_ - 1`)
           |  SELECT CASE WHEN mc IS NOT NULL AND mp IS NOT NULL
           |              THEN LEAST(mc, mp) - INTERVAL 10 MINUTE
           |                     - INTERVAL 1 MILLISECOND
           |         END AS wm
           |  FROM (SELECT
           |          date_trunc('milliseconds',
           |            MAX(CASE WHEN event_type = 'click' THEN ts END)) AS mc,
           |          date_trunc('milliseconds',
           |            MAX(CASE WHEN event_type = 'purchase' THEN ts END)) AS mp
           |        FROM e)),
           |unmatched AS (
           |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           |         CAST(NULL AS BIGINT) AS click_id,
           |         CAST(NULL AS TIMESTAMP) AS click_ts
           |  FROM e p, mx
           |  WHERE p.event_type = 'purchase'
           |    AND p.ts <= wm
           |    AND NOT EXISTS (
           |      SELECT 1 FROM e c
           |      WHERE c.event_type = 'click' AND c.user_id = p.user_id
           |        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE))
           |SELECT * FROM (SELECT * FROM matched
           |               UNION ALL SELECT * FROM unmatched)
           |ORDER BY purchase_id, click_id ASC NULLS FIRST""".stripMargin))

  /** Stream-stream FULL OUTER join: the left-outer contract above PLUS
    * unmatched clicks, whose finalization bound is ASYMMETRIC — a click
    * can still match future purchases up to 30 minutes ahead, so it
    * finalizes only at c.ts ≤ W − 30min, while a purchase finalizes at
    * p.ts ≤ W. The oracle replicates both bounds; the driver hash-checks
    * the asymmetry itself.
    */
  val extStreamJoinFullOuter = Q(
    "ext_stream_join_full_outer",
    (s, dir) => {
      import s.implicits._
      val name = "stream_join_fo_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, ExtQueries.streamSourceDir(dir, "join_fo"),
        ExtQueries.eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.clickAttributionFullOuter(
          ExtQueries.normalizeStreamTs(df)),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8))
        .orderBy($"user_id", $"purchase_id".asc_nulls_first,
          $"click_id".asc_nulls_first)
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type,
           |                  CAST(ts AS TIMESTAMP) AS ts FROM events),
           |matched AS (
           |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           |         c.event_id AS click_id, c.ts AS click_ts
           |  FROM e p JOIN e c
           |    ON c.user_id = p.user_id
           |   AND p.event_type = 'purchase' AND c.event_type = 'click'
           |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE),
           |mx AS (
           |  -- same finalization bound as ext_stream_join_outer:
           |  -- null-propagating min of per-side ms-floored watermarks,
           |  -- minus the engine's extra 1 ms for non-strict predicates
           |  SELECT CASE WHEN mc IS NOT NULL AND mp IS NOT NULL
           |              THEN LEAST(mc, mp) - INTERVAL 10 MINUTE
           |                     - INTERVAL 1 MILLISECOND
           |         END AS wm
           |  FROM (SELECT
           |          date_trunc('milliseconds',
           |            MAX(CASE WHEN event_type = 'click' THEN ts END)) AS mc,
           |          date_trunc('milliseconds',
           |            MAX(CASE WHEN event_type = 'purchase' THEN ts END)) AS mp
           |        FROM e)),
           |unmatched_p AS (
           |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           |         CAST(NULL AS BIGINT) AS click_id,
           |         CAST(NULL AS TIMESTAMP) AS click_ts
           |  FROM e p, mx
           |  WHERE p.event_type = 'purchase' AND p.ts <= wm
           |    AND NOT EXISTS (
           |      SELECT 1 FROM e c
           |      WHERE c.event_type = 'click' AND c.user_id = p.user_id
           |        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE)),
           |unmatched_c AS (
           |  SELECT c.user_id, CAST(NULL AS BIGINT) AS purchase_id,
           |         CAST(NULL AS TIMESTAMP) AS purchase_ts,
           |         c.event_id AS click_id, c.ts AS click_ts
           |  FROM e c, mx
           |  WHERE c.event_type = 'click'
           |    AND c.ts <= wm - INTERVAL 30 MINUTE
           |    AND NOT EXISTS (
           |      SELECT 1 FROM e p
           |      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
           |        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE))
           |SELECT * FROM (SELECT * FROM matched
           |               UNION ALL SELECT * FROM unmatched_p
           |               UNION ALL SELECT * FROM unmatched_c)
           |ORDER BY user_id, purchase_id ASC NULLS FIRST,
           |         click_id ASC NULLS FIRST""".stripMargin))

  /** Benchmark decontamination: flag training documents sharing any
    * 8-gram with the held-out eval set (docs 0-9 stand in for a
    * benchmark). The standard contamination test (GPT-3 appendix C /
    * PaLM-style n-gram overlap) at the standard shingle length class
    * (8-13 words). The eval gram set is small BY CONSTRUCTION (eval
    * benchmarks are tiny next to a training corpus), so it broadcasts
    * and the training side never shuffles — the decontamination shape
    * that works at 100 TB.
    */
  val extDecontaminate = Q(
    "ext_decontaminate",
    (s, dir) => {
      import s.implicits._
      def grams8(df: DataFrame) = df
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 8)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w)-8), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]))")))
          .as("gram"))
      val docs = t(s, dir, "documents")
      val evalGrams = grams8(docs.where($"doc_id" < 10))
        .select($"gram").distinct()
      grams8(docs.where($"doc_id" >= 10))
        .join(broadcast(evalGrams), Seq("gram"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_contaminated_grams"))
        .orderBy($"doc_id")
    },
    Some("""WITH g AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |           range(len(s) - 7),
           |           i -> s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4]
           |                || ' ' || s[i+5] || ' ' || s[i+6] || ' ' || s[i+7] || ' ' || s[i+8]))) AS gram
           |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
           |  WHERE len(s) >= 8),
           |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10)
           |SELECT g.doc_id, COUNT(*) AS n_contaminated_grams
           |FROM g JOIN ev USING (gram)
           |WHERE g.doc_id >= 10
           |GROUP BY 1
           |ORDER BY doc_id""".stripMargin))

  /** Vocabulary induction + out-of-vocabulary scoring: the top-20 corpus
    * words by frequency (ties broken lexicographically — deterministic
    * on both engines) form the vocabulary; each document is scored by
    * its OOV token fraction — the cheap tokenizer-coverage signal a
    * pipeline computes before committing to a vocab size. Vocab is
    * top-k of a keyed word count (broadcastable by construction);
    * per-doc scoring is one keyed agg over the token stream.
    */
  val extVocabOov = Q(
    "ext_vocab_oov",
    (s, dir) => {
      import s.implicits._
      val tok = t(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("word"))
      val vocab = tok.groupBy($"word").agg(count(lit(1)).as("freq"))
        .orderBy($"freq".desc, $"word")
        .limit(20)
        .select($"word")
      tok.join(broadcast(vocab).withColumn("in_vocab", lit(1L)),
          Seq("word"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
        .select($"doc_id", $"n_tokens",
          ($"n_oov".cast("double") / $"n_tokens".cast("double"))
            .as("oov_frac"))
        .orderBy($"doc_id")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
           |  FROM documents),
           |vocab AS (
           |  SELECT word FROM (
           |    SELECT word, COUNT(*) AS freq FROM tok GROUP BY 1)
           |  ORDER BY freq DESC, word LIMIT 20)
           |SELECT doc_id, COUNT(*) AS n_tokens,
           |       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |         / CAST(COUNT(*) AS DOUBLE) AS oov_frac
           |FROM tok LEFT JOIN vocab v ON tok.word = v.word
           |GROUP BY 1
           |ORDER BY doc_id""".stripMargin))

  /** Deterministic train/valid/test split assignment (90/5/5) by the
    * squared portable hash of the doc id — the split survives
    * re-partitioning, re-runs and engine changes, so no document ever
    * migrates between splits across pipeline versions (the property that
    * makes held-out sets trustworthy). Output is the per-(source, split)
    * census — the table a mixing config is audited against.
    */
  val extSplitAssign = Q(
    "ext_split_assign",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("sk", concat(lit("spl:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % ExtQueries.mhP)
        .withColumn("split",
          when($"h2" % 100 < 90, "train")
            .when($"h2" % 100 < 95, "valid")
            .otherwise("test"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"source", $"split")
    },
    Some(s"""WITH h AS (
            |  SELECT source,
            |         ${ExtQueries.mhBaseDuck("('spl:' || CAST(doc_id AS VARCHAR))")} AS h
            |  FROM documents)
            |SELECT source,
            |       CASE WHEN ((h * h + h) % ${ExtQueries.mhP}) % 100 < 90 THEN 'train'
            |            WHEN ((h * h + h) % ${ExtQueries.mhP}) % 100 < 95 THEN 'valid'
            |            ELSE 'test' END AS split,
            |       COUNT(*) AS n_docs
            |FROM h
            |GROUP BY 1, 2
            |ORDER BY source, split""".stripMargin))

  /** The COMPOSITE curation pipeline — the stages above chained the way a
    * production corpus build runs them, as one verified query:
    * 1. quality gate (the ext_text_filter heuristics) — cheapest first,
    *    shrinks everything downstream;
    * 2. exact content dedup (md5 keep-first) among survivors;
    * 3. benchmark decontamination — drop training docs sharing any
    *    8-gram with the held-out eval docs (ids < 10), and the eval docs
    *    themselves;
    * 4. deterministic train/valid/test assignment.
    * Output is the doc-level corpus manifest. Every stage is a keyed
    * shuffle or broadcast probe — composition adds no new scale hazard.
    */
  val extCurationPipeline = Q(
    "ext_curation_pipeline",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val quality = docs
        .select($"doc_id", $"text", $"lang", $"source",
          split($"text", " ").as("w"))
        .withColumn("n_words", size($"w"))
        .withColumn("awl",
          length(regexp_replace($"text", " ", "")).cast("double")
            / $"n_words")
        .withColumn("swr",
          size(expr(s"filter(w, x -> x IN (${ExtQueries.stopSqlList}))"))
            .cast("double") / $"n_words")
        .where($"n_words" >= 10 && $"awl" >= 3.0 && $"awl" <= 12.0
          && $"swr" >= 0.01)
        .select($"doc_id", $"text", $"lang", $"source", $"w")
      val wDedup = Window.partitionBy(md5($"text")).orderBy($"doc_id")
      val deduped = quality
        .withColumn("rn", row_number().over(wDedup))
        .where($"rn" === 1)
      def grams8(df: DataFrame) = df
        .where(size(col("w")) >= 8)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w)-8), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]))")))
          .as("gram"))
      val evalGrams = grams8(
        docs.select($"doc_id", split($"text", " ").as("w"))
          .where($"doc_id" < 10))
        .select($"gram").distinct()
      val contaminated = grams8(deduped.where($"doc_id" >= 10))
        .join(broadcast(evalGrams), Seq("gram"))
        .select($"doc_id").distinct()
      deduped
        .where($"doc_id" >= 10)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .withColumn("sk", concat(lit("spl:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % ExtQueries.mhP)
        .withColumn("split",
          when($"h2" % 100 < 90, "train")
            .when($"h2" % 100 < 95, "valid")
            .otherwise("test"))
        .select($"doc_id", $"lang", $"source", $"split")
        .orderBy($"doc_id")
    },
    Some(s"""WITH q AS (
            |  SELECT doc_id, text, lang, source, s AS w
            |  FROM (SELECT doc_id, text, lang, source,
            |               string_split(text, ' ') AS s,
            |               len(string_split(text, ' ')) AS n_words,
            |               CAST(length(replace(text, ' ', '')) AS DOUBLE)
            |                 / len(string_split(text, ' ')) AS awl,
            |               CAST(len(list_filter(string_split(text, ' '),
            |                        x -> x IN (${ExtQueries.stopSqlList}))) AS DOUBLE)
            |                 / len(string_split(text, ' ')) AS swr
            |        FROM documents)
            |  WHERE n_words >= 10 AND awl >= 3.0 AND awl <= 12.0 AND swr >= 0.01),
            |dd AS (
            |  SELECT doc_id, lang, source, w FROM q
            |  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
            |ev AS (
            |  SELECT DISTINCT unnest(list_distinct(list_transform(
            |           range(len(s) - 7),
            |           i -> s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4]
            |                || ' ' || s[i+5] || ' ' || s[i+6] || ' ' || s[i+7] || ' ' || s[i+8]))) AS gram
            |  FROM (SELECT string_split(text, ' ') AS s FROM documents
            |        WHERE doc_id < 10)
            |  WHERE len(s) >= 8),
            |tg AS (
            |  SELECT doc_id, unnest(list_distinct(list_transform(
            |           range(len(w) - 7),
            |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
            |                || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8]))) AS gram
            |  FROM dd WHERE doc_id >= 10 AND len(w) >= 8),
            |cont AS (SELECT DISTINCT tg.doc_id FROM tg JOIN ev USING (gram)),
            |kept AS (
            |  SELECT dd.doc_id, dd.lang, dd.source
            |  FROM dd ANTI JOIN cont ON dd.doc_id = cont.doc_id
            |  WHERE dd.doc_id >= 10),
            |h AS (
            |  SELECT doc_id, lang, source,
            |         ${ExtQueries.mhBaseDuck("('spl:' || CAST(doc_id AS VARCHAR))")} AS h
            |  FROM kept)
            |SELECT doc_id, lang, source,
            |       CASE WHEN ((h * h + h) % ${ExtQueries.mhP}) % 100 < 90 THEN 'train'
            |            WHEN ((h * h + h) % ${ExtQueries.mhP}) % 100 < 95 THEN 'valid'
            |            ELSE 'test' END AS split
            |FROM h
            |ORDER BY doc_id""".stripMargin))

  /** Source-level vocabulary overlap matrix: Jaccard similarity of the
    * distinct-word sets of every source pair — the corpus-composition
    * diagnostic that surfaces redundant / near-mirror sources before
    * doc-level dedup spends compute on them. The word-keyed join emits
    * one row per (word, source-pair); pair cardinality is bounded by
    * |sources|² (dozens at any corpus size), never by |docs|² — safe by
    * construction, unlike doc-level inverted indexes which need caps.
    */
  val extSourceOverlap = Q(
    "ext_source_overlap",
    (s, dir) => {
      import s.implicits._
      val vocab = t(s, dir, "documents")
        .select($"source", explode(split($"text", " ")).as("word"))
        .distinct()
      val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("sz"))
      val inter = vocab.as("a")
        .join(vocab.as("b"),
          col("a.word") === col("b.word")
            && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("sa"), col("source_a") === col("sa.source"))
        .join(sizes.as("sb"), col("source_b") === col("sb.source"))
        .select(col("source_a"), col("source_b"),
          (col("inter").cast("double")
            / (col("sa.sz") + col("sb.sz") - col("inter")).cast("double"))
            .as("vocab_jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH v AS (
           |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
           |  FROM documents),
           |sz AS (SELECT source, COUNT(*) AS sz FROM v GROUP BY 1),
           |inter AS (
           |  SELECT a.source AS source_a, b.source AS source_b,
           |         COUNT(*) AS inter
           |  FROM v a JOIN v b ON a.word = b.word AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT source_a, source_b,
           |       CAST(inter AS DOUBLE)
           |         / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS vocab_jaccard
           |FROM inter
           |JOIN sz sa ON source_a = sa.source
           |JOIN sz sb ON source_b = sb.source
           |ORDER BY source_a, source_b""".stripMargin))

  /** Per-label embedding centroid + cohesion: the deterministic,
    * oracle-checkable complement to the IVF/k-means index (whose fit is
    * not SQL-reproducible). Each vector gets its cosine to its own
    * label's centroid — the assignment-quality / cluster-cohesion signal
    * an embedding pipeline monitors. The per-dimension component sum is
    * a strict left fold in vec_id order on BOTH engines (bit-identical
    * doubles: a grouped double SUM is partition-order-dependent, and a
    * decimal-cast detour founders on the engines disagreeing about
    * double→decimal rounding at 12 fractional digits — observed). The
    * ordered fold collects one group's components per (label, dim) key —
    * bounded by vectors-per-label; at corpus scale swap to the
    * order-free decimal sum and accept a rows-only check, or tree-fold
    * in fixed blocks. Centroids are |labels|×dim tiny and broadcast.
    */
  val extLabelCentroid = Q(
    "ext_label_centroid",
    (s, dir) => {
      import s.implicits._
      val comps = t(s, dir, "embeddings")
        .select($"vec_id", $"label", posexplode($"embedding"))
        .toDF("vec_id", "label", "pos", "v")
        .withColumn("v", $"v".cast("double"))
      val cent = comps.groupBy($"label", $"pos")
        .agg((expr(
          "aggregate(transform(array_sort(collect_list(struct(vec_id, v))), x -> x.v), 0D, (a, x) -> a + x)")
          / count(lit(1)).cast("double")).as("c"))
        .groupBy($"label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
          .as("cent"))
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"label",
          $"embedding".cast("array<double>").as("e"))
      emb.join(broadcast(cent), Seq("label"))
        .withColumn("cos_to_centroid",
          expr(ExtQueries.dotFold.format("e", "cent"))
            / (expr(s"sqrt(${ExtQueries.dotFold.format("e", "e")})")
              * expr(s"sqrt(${ExtQueries.dotFold.format("cent", "cent")})")))
        .select($"vec_id", $"label".cast("int").as("label"),
          $"cos_to_centroid")
        .orderBy($"vec_id")
    },
    Some("""WITH comps AS (
           |  SELECT vec_id, label,
           |         unnest(range(len(embedding))) AS pos,
           |         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
           |  FROM embeddings),
           |cd AS (
           |  SELECT label, pos,
           |         list_reduce([CAST(0 AS DOUBLE)] || list(v ORDER BY vec_id),
           |                     (a, b) -> a + b)
           |           / CAST(COUNT(*) AS DOUBLE) AS c
           |  FROM comps GROUP BY 1, 2),
           |cent AS (
           |  SELECT label, list(c ORDER BY pos) AS cent FROM cd GROUP BY 1),
           |e AS (
           |  SELECT vec_id, label,
           |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings)
           |SELECT e.vec_id, CAST(e.label AS INT) AS label,
           |       list_reduce(list_transform(range(len(e.e)), i -> e.e[i+1]*c.cent[i+1]), (a,b) -> a+b)
           |         / (sqrt(list_reduce(list_transform(range(len(e.e)), i -> e.e[i+1]*e.e[i+1]), (a,b) -> a+b))
           |            * sqrt(list_reduce(list_transform(range(len(c.cent)), i -> c.cent[i+1]*c.cent[i+1]), (a,b) -> a+b))) AS cos_to_centroid
           |FROM e JOIN cent c ON e.label = c.label
           |ORDER BY e.vec_id""".stripMargin))

  /** Sequence packing for training-batch construction — the GPT-style
    * concat-and-chunk: documents are concatenated in a deterministic
    * order (per-source, by doc_id — at corpus scale, by (shard,
    * position)) and the token stream is cut into fixed
    * `contextTokens`-sized windows; a document straddling a cut belongs
    * to every window it overlaps. Emitted per doc: its token count, the
    * first/last window it lands in, and how many windows it spans — the
    * manifest a loader needs to materialize packed batches without
    * re-tokenizing. One keyed cumulative-sum window per source (BIGINT,
    * exact), no global sort, no shuffle beyond the per-source window —
    * the same plan at 100 TB.
    */
  val extPackSequences = Q(
    "ext_pack_sequences",
    (s, dir) => {
      import s.implicits._
      val context = 512L
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select($"doc_id", $"source",
          size(split($"text", " ")).cast("bigint").as("tokens"))
        .withColumn("cum", sum($"tokens").over(w))
        .select($"doc_id", $"source", $"tokens",
          expr(s"(cum - tokens) div $context").as("start_chunk"),
          expr(s"(cum - 1) div $context").as("end_chunk"))
        .withColumn("n_chunks", $"end_chunk" - $"start_chunk" + lit(1))
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, source,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, source, tokens,
           |         SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM d)
           |SELECT doc_id, source, tokens,
           |       CAST((cum - tokens) // 512 AS BIGINT) AS start_chunk,
           |       CAST((cum - 1) // 512 AS BIGINT) AS end_chunk,
           |       CAST((cum - 1) // 512 - (cum - tokens) // 512 + 1 AS BIGINT) AS n_chunks
           |FROM c ORDER BY doc_id""".stripMargin))

  /** Token-budget corpus selection — the data-mixing primitive: each
    * source contributes documents up to a fixed token budget, chosen in
    * deterministic hash order (squared portable hash, the family's
    * uniform-residue form) so the SAME subset is selected on every run,
    * engine, and partitioning — a rand()-ordered or first-k-by-position
    * fill would bias toward ingestion order. A doc is kept only if it
    * fits the remaining budget entirely (cum ≤ budget). One keyed
    * ranking window + cumulative sum per source; no global sort — the
    * identical plan at 100 TB with budgets in the billions of tokens.
    */
  val extTokenBudget = Q(
    "ext_token_budget_sample",
    (s, dir) => {
      import s.implicits._
      val budget = 800L
      val w = Window.partitionBy($"source")
        .orderBy($"h2", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select($"doc_id", $"source",
          size(split($"text", " ")).cast("bigint").as("tokens"))
        .withColumn("bk", concat(lit("bud:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "bk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % ExtQueries.mhP)
        .withColumn("cum_tokens", sum($"tokens").over(w))
        .where($"cum_tokens" <= budget)
        .select($"doc_id", $"source", $"tokens", $"cum_tokens")
        .orderBy($"doc_id")
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, source,
            |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
            |         ${ExtQueries.mhBaseDuck("('bud:' || CAST(doc_id AS VARCHAR))")} AS h
            |  FROM documents),
            |r AS (
            |  SELECT doc_id, source, tokens,
            |         SUM(tokens) OVER (PARTITION BY source
            |           ORDER BY ((h * h + h) % ${ExtQueries.mhP}), doc_id
            |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            |  FROM d)
            |SELECT doc_id, source, tokens, CAST(cum AS BIGINT) AS cum_tokens
            |FROM r WHERE cum <= 800 ORDER BY doc_id""".stripMargin))

  /** Span-level exact-substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): find the LONGEST
    * duplicated token span per document pair — the partial-duplication
    * signal doc-level Jaccard/MinHash misses (a 90-token boilerplate
    * block inside two otherwise-different docs barely moves their
    * Jaccard but is exactly what substring dedup removes before
    * training). Positional 8-grams (suffix-automaton stand-in) → the
    * gram doc-frequency cap ([[ExtQueries.gramDocFreqCap]], the family
    * hot-key guard) → shared-gram hits per pair → runs of CONSECUTIVE
    * matches on each alignment diagonal (pos_a − pos_b) via the
    * gaps-and-islands trick (pos_a − row_number is constant exactly on
    * a consecutive run; positions are unique per (pair, diag), so the
    * island key is exact). A run of r grams covers r+7 tokens; spans of
    * ≥ 3 runs (≥ 10 tokens) are reported. Scale posture: the capped
    * inverted gram index bounds the self-join (same bound as the
    * Jaccard family) — and because grams here are POSITIONAL (every
    * occurrence, not distinct-per-doc), a second cap bounds the per-doc
    * occurrence MULTIPLICITY ([[spanOccCap]]): a gram occurring o_a/o_b
    * times in a pair joins o_a·o_b hit rows, so a degenerate doc
    * repeating one rare gram thousands of times would be quadratic
    * inside a single pair (that pathology is intra-doc repetition —
    * ext_quality_repetition's signal, not a cross-doc span). The island
    * window is keyed by (pair, diagonal) — partition size ≤
    * min(|doc_a|, |doc_b|) grams, never corpus-scale.
    */
  /** Per-doc occurrence-multiplicity cap for the span-dedup gram index:
    * a gram a single doc repeats more than this is degenerate intra-doc
    * repetition (no cross-doc span signal) and would cost o_a·o_b join
    * rows inside one pair.
    */
  private[graft] val spanOccCap = graft.ScaleConfig.spanOccCap

  val extDedupSubstringSpan = Q(
    "ext_dedup_substring_span",
    (s, dir) => {
      import s.implicits._
      val minRun = 3
      // positional grams: no array_distinct — the diagonal run-length
      // needs every occurrence's position
      val g = t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .where(size($"w") >= 8)
        .select($"doc_id", posexplode(expr(
          "transform(sequence(0, size(w)-8), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4], w[i+5], w[i+6], w[i+7]))"))
          .as(Seq("pos", "gram")))
        .transform(Q.mat)
      val rare = g.groupBy($"doc_id", $"gram")
        .agg(count(lit(1)).as("occ"))
        .groupBy($"gram")
        .agg(count(lit(1)).as("gdf"), max($"occ").as("gmax"))
        .where($"gdf" <= ExtQueries.gramDocFreqCap
          && $"gmax" <= spanOccCap)
        .select($"gram")
      val cg = g.join(rare, Seq("gram")).transform(Q.mat)
      val hits = cg.as("a").join(cg.as("b"),
          col("a.gram") === col("b.gram")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
        .distinct()
      val w = Window.partitionBy($"doc_a", $"doc_b", $"diag")
        .orderBy($"pos_a")
      hits
        .withColumn("diag", $"pos_a" - $"pos_b")
        .withColumn("island", $"pos_a" - row_number().over(w))
        .groupBy($"doc_a", $"doc_b", $"diag", $"island")
        .agg(count(lit(1)).as("run_len"))
        .where($"run_len" >= minRun)
        .groupBy($"doc_a", $"doc_b")
        .agg(max($"run_len" + lit(7L)).as("max_span_tokens"),
          count(lit(1)).as("n_spans"))
        .orderBy($"doc_a", $"doc_b")
    },
    Some(s"""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS s FROM documents),
           |g AS (
           |  SELECT doc_id, u.i AS pos,
           |         s[u.i+1]||' '||s[u.i+2]||' '||s[u.i+3]||' '||s[u.i+4]||' '||s[u.i+5]||' '||s[u.i+6]||' '||s[u.i+7]||' '||s[u.i+8] AS gram
           |  FROM d, UNNEST(range(len(s) - 7)) AS u(i)
           |  WHERE len(s) >= 8),
           |rare AS (
           |  SELECT gram FROM (
           |    SELECT gram, COUNT(*) AS gdf, MAX(occ) AS gmax
           |    FROM (SELECT doc_id, gram, COUNT(*) AS occ
           |          FROM g GROUP BY 1, 2)
           |    GROUP BY gram)
           |  WHERE gdf <= ${ExtQueries.gramDocFreqCap}
           |    AND gmax <= $spanOccCap),
           |cg AS (SELECT g.* FROM g JOIN rare USING (gram)),
           |hits AS (
           |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         a.pos AS pos_a, b.pos AS pos_b
           |  FROM cg a JOIN cg b
           |    ON a.gram = b.gram AND a.doc_id < b.doc_id),
           |runs AS (
           |  SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
           |         pos_a - ROW_NUMBER() OVER (
           |           PARTITION BY doc_a, doc_b, pos_a - pos_b
           |           ORDER BY pos_a) AS island
           |  FROM hits),
           |sp AS (
           |  SELECT doc_a, doc_b, diag, island, COUNT(*) AS run_len
           |  FROM runs GROUP BY 1, 2, 3, 4)
           |SELECT doc_a, doc_b,
           |       CAST(MAX(run_len + 7) AS BIGINT) AS max_span_tokens,
           |       CAST(COUNT(*) AS BIGINT) AS n_spans
           |FROM sp WHERE run_len >= 3
           |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin))

  val all: Seq[Q] = Seq(extSampleStratified, extQualityRepetition,
    extBm25Search, extDedupChunk, extScd2History, extBloomPrefilter,
    extStreamJoin, extStreamJoinOuter, extStreamJoinFullOuter,
    extDecontaminate, extVocabOov, extSplitAssign,
    extCurationPipeline, extSourceOverlap, extLabelCentroid,
    extPackSequences, extTokenBudget, extDedupSubstringSpan)
}
