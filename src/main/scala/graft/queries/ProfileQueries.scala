package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 lake-operations + curation operators: per-column data
  * profiling, count-min-sketch heavy hitters, PII redaction, unigram-LM
  * quality scoring, and a small-file compaction round-trip. Same
  * determinism contract as [[CurationQueries]]: portable hashes/ln,
  * fixed-order double folds, identical aliases both engines.
  */
object ProfileQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic scratch directory for queries that exercise the
    * write path: keyed by (query, input dir) and OVERWRITTEN on every
    * run — fresh createTempDirectory names would leak a full table copy
    * into /tmp per invocation, growing without bound across runs.
    */
  private def scratch(name: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch/${name}_" +
      Integer.toHexString(dir.hashCode)

  // ---- 1. data profiling ----

  /** Per-column profile of a table in ONE pass (ANALYZE-style table
    * stats: null count, distinct count, min/max, total string length).
    * All columns aggregate in a single `agg` (Spark plans the multiple
    * count-distincts via one Expand — still one scan), then unpivot to
    * a row per column with `stack`. Scale posture: one scan + one
    * aggregate; at 100 TB swap `countDistinct` for approx; here it stays
    * exact so DuckDB reproduces it bit-for-bit.
    */
  private[graft] def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max"),
        sum(length(col(c).cast("string")).cast("long")).as(s"${c}__len"))
    } :+ count(lit(1)).as("n_rows")
    val stacked = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max, ${c}__len")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stacked) AS " +
          "(col_name, n_nulls, n_distinct, min_str, max_str, sum_len)")
      .withColumn("avg_len",
        col("sum_len").cast("double") / col("n_rows").cast("double"))
      .orderBy(col("col_name"))
  }

  val extProfileColumns = Q(
    "ext_profile_columns",
    (s, dir) =>
      profile(t(s, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars")),
    Some {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  MIN(CAST($c AS VARCHAR)) AS min_str,
           |  MAX(CAST($c AS VARCHAR)) AS max_str,
           |  CAST(SUM(length(CAST($c AS VARCHAR))) AS BIGINT) AS sum_len,
           |  CAST(SUM(length(CAST($c AS VARCHAR))) AS DOUBLE)
           |    / CAST(COUNT(*) AS DOUBLE) AS avg_len
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    })

  // ---- 2. count-min-sketch heavy hitters ----

  /** CMS geometry: d=4 independent hash rows × w=1024 buckets. The row
    * hashes are affine transforms of the shared portable polynomial base
    * hash, so DuckDB computes the IDENTICAL sketch and the ESTIMATE
    * column itself is hash-compared (unlike HLL, whose sketch is
    * engine-internal).
    */
  private val cmsW = 1024L
  private val cmsA = Seq(131L, 137L, 139L, 149L)
  private val cmsB = Seq(17L, 29L, 43L, 59L)

  /** Heavy hitters via count-min sketch: token stream → 4×1024 bucket
    * counts (a FIXED-size aggregate no matter the corpus size — the
    * whole point of the sketch), then candidate words probe the sketch
    * (estimate = min over rows of the probed bucket) and the top 20 by
    * estimate are emitted next to their exact counts. CMS never
    * underestimates; `overcount` shows the collision error directly.
    * Scale posture: the sketch build aggregates to 4096 cells (map-side
    * partial combine does almost all the work); the candidate set here
    * is the full vocabulary (bounded in this corpus) — at 100 TB
    * candidates come from a sample or a prior round, and the sketch
    * probe is a broadcast join either way.
    */
  val extHeavyHittersCms = Q(
    "ext_heavy_hitters_cms",
    (s, dir) => {
      import s.implicits._
      // hashed token stream feeds the sketch build AND the vocab agg —
      // materialize once (same convention as the dedup-family indexes)
      val based = Mat(t(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .withColumn("bh", expr(ExtQueries.mhBaseNative(s, "word"))))
      val entries = based.select(explode(array((0 until 4).map { i =>
        struct(lit(i).as("i"),
          (((lit(cmsA(i)) * $"bh" + lit(cmsB(i))) % ExtQueries.mhP) % cmsW)
            .as("bucket"))
      }: _*)).as("e")).select($"e.i", $"e.bucket")
      val cms = entries.groupBy($"i", $"bucket").agg(count(lit(1)).as("c"))
      val vocab = based.groupBy($"word")
        .agg(count(lit(1)).as("exact"), min($"bh").as("bh"))
      val probes = vocab.select($"word", $"exact",
        explode(array((0 until 4).map { i =>
          struct(lit(i).as("i"),
            (((lit(cmsA(i)) * $"bh" + lit(cmsB(i))) % ExtQueries.mhP) % cmsW)
              .as("bucket"))
        }: _*)).as("e")).select($"word", $"exact", $"e.i", $"e.bucket")
      probes.join(broadcast(cms), Seq("i", "bucket"))
        .groupBy($"word", $"exact").agg(min($"c").as("est"))
        .select($"word", $"exact", $"est", ($"est" - $"exact").as("overcount"))
        .orderBy($"est".desc, $"word")
        .limit(20)
    },
    Some {
      val p = ExtQueries.mhP
      val aList = cmsA.mkString("[", ",", "]")
      val bList = cmsB.mkString("[", ",", "]")
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         |b AS (SELECT word, ${ExtQueries.mhBaseDuck("word")} AS bh FROM w),
         |ii AS (SELECT unnest([0,1,2,3]) AS i),
         |e AS (
         |  SELECT i, ((($aList)[i+1] * bh + ($bList)[i+1]) % $p) % $cmsW AS bucket
         |  FROM b CROSS JOIN ii),
         |cms AS (SELECT i, bucket, COUNT(*) AS c FROM e GROUP BY 1, 2),
         |vocab AS (SELECT word, COUNT(*) AS exact, MIN(bh) AS bh FROM b GROUP BY 1),
         |probes AS (
         |  SELECT word, exact, i,
         |         ((($aList)[i+1] * bh + ($bList)[i+1]) % $p) % $cmsW AS bucket
         |  FROM vocab CROSS JOIN ii),
         |est AS (
         |  SELECT word, exact, MIN(c) AS est
         |  FROM probes JOIN cms USING (i, bucket) GROUP BY 1, 2)
         |SELECT word, exact, est, est - exact AS overcount
         |FROM est ORDER BY est DESC, word LIMIT 20""".stripMargin
    })

  // ---- 3. PII redaction ----

  /** Conservative regex syntax only — these compile identically under
    * Java regex (Spark) and RE2 (DuckDB): char classes, bounded repeats,
    * ASCII \\b. No lookaround, no backrefs (RE2 has neither).
    */
  private[graft] val emailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private[graft] val phonePat = """\b\d{3}-\d{3}-\d{4}\b"""
  private[graft] val ipPat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Chained redaction; email first (its local part may contain digits
    * a later pattern would otherwise bite into).
    */
  private[graft] def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPat, "<EMAIL>"),
        phonePat, "<PHONE>"),
      ipPat, "<IP>")

  /** PII scrubbing for training corpora: count and mask emails, phone
    * numbers and IPv4 addresses. The shipped corpus contains no PII, so
    * a deterministic contact string derived from `doc_id` is appended
    * first — the redaction machinery (the operator under test) then runs
    * over real positive matches, and DuckDB replicates both the
    * synthesis and the scrub. Scale posture: pure codegen'd column
    * expressions, no shuffle, pushdown-transparent.
    */
  val extPiiRedact = Q(
    "ext_pii_redact",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          concat($"text",
            lit(" contact user"), $"doc_id".cast("string"),
            lit("@mail.example.com call 555-"),
            lpad(($"doc_id" % 900L + 100L).cast("string"), 3, "0"),
            lit("-"),
            lpad(($"doc_id" % 9000L + 1000L).cast("string"), 4, "0"),
            lit(" from 10.0."), ($"doc_id" % 256L).cast("string"), lit(".1"))
            .as("pii_text"))
        .select($"doc_id",
          // Column-literal patterns, NOT SQL-string literals: Spark's
          // parser eats unrecognized backslash escapes ('\d' -> 'd')
          size(regexp_extract_all($"pii_text", lit(emailPat), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all($"pii_text", lit(phonePat), lit(0)))
            .cast("long").as("n_phones"),
          size(regexp_extract_all($"pii_text", lit(ipPat), lit(0)))
            .cast("long").as("n_ips"),
          redact($"pii_text").as("redacted"))
        .orderBy($"doc_id")
    },
    Some(
      s"""WITH aug AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR)
         |           || '@mail.example.com call 555-'
         |           || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0')
         |           || '-'
         |           || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')
         |           || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
         |           AS pii_text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(pii_text, '$emailPat')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(pii_text, '$phonePat')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(pii_text, '$ipPat')) AS BIGINT) AS n_ips,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(pii_text, '$emailPat', '<EMAIL>', 'g'),
         |      '$phonePat', '<PHONE>', 'g'),
         |    '$ipPat', '<IP>', 'g') AS redacted
         |FROM aug ORDER BY doc_id""".stripMargin))

  // ---- 4. unigram-LM quality scoring ----

  /** Stage the portable-ln inputs (y, u, u2) for `ln(x)` of column
    * expression `x`, leaving the result as `out`.
    */
  private def stageLn(df: DataFrame, x: String, out: String): DataFrame =
    df.withColumn("y", expr(CurationQueries.sixSqrt(x)))
      .withColumn("u",
        (col("y") - lit(1.0d)) / (col("y") + lit(1.0d)))
      .withColumn("u2", col("u") * col("u"))
      .withColumn(out, expr(CurationQueries.portableLnOfU))
      .drop("y", "u", "u2")

  /** Unigram language-model scoring (the CCNet/perplexity-filter shape):
    * train p(w) = c(w)/N on the corpus itself, score each document by
    * mean log-probability of its tokens. Documents of rare words score
    * low — the classic cheap quality/outlier signal. ln is the portable
    * sqrt-chain ([[CurationQueries.portableLnOfU]], exact cross-engine),
    * and the per-document sum folds contributions in WORD ORDER via a
    * sorted list (a grouped double SUM would be partition-order
    * dependent). Scale posture: one token-keyed agg for the LM (its
    * size = vocabulary, broadcastable), one (doc, word) agg for tf, one
    * doc-keyed fold; the per-doc list is bounded by doc vocabulary.
    * Valid for corpora up to ~4·10⁹ tokens per the ln reduction range —
    * beyond that, widen the sqrt chain by one level.
    */
  private[graft] def lmScore(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val dw = docs.select($"doc_id", explode(split($"text", " ")).as("word"))
    val lm = stageLn(
      dw.groupBy($"word").agg(count(lit(1)).as("c")),
      "CAST(c AS DOUBLE)", "ln_c").select($"word", $"ln_c")
    val lnTotal = stageLn(
      dw.agg(count(lit(1)).as("n")),
      "CAST(n AS DOUBLE)", "ln_t").select($"ln_t")
    val tf = dw.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(lm), "word")
      .crossJoin(broadcast(lnTotal))
      .withColumn("contrib",
        $"tf".cast("double") * ($"ln_c" - $"ln_t"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_words"),
        sort_array(collect_list(struct($"word", $"contrib"))).as("lst"))
      .withColumn("s",
        expr("aggregate(lst, CAST(0 AS DOUBLE), (acc, x) -> acc + x.contrib)"))
      .select($"doc_id", $"n_words",
        ($"s" / $"n_words".cast("double")).as("avg_logprob"))
      .orderBy($"doc_id")
  }

  val extLmQuality = Q(
    "ext_lm_quality",
    (s, dir) => lmScore(t(s, dir, "documents")),
    Some {
      s"""WITH dw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents),
         |wc AS (SELECT word, COUNT(*) AS c FROM dw GROUP BY 1),
         |lm AS (
         |  SELECT word, ($$LN) AS ln_c FROM (
         |    SELECT word, u, u * u AS u2 FROM (
         |      SELECT word, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u
         |      FROM (SELECT word, ${CurationQueries.sixSqrt("CAST(c AS DOUBLE)")} AS y
         |            FROM wc)))),
         |tot AS (
         |  SELECT ($$LN) AS ln_t FROM (
         |    SELECT u, u * u AS u2 FROM (
         |      SELECT (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u
         |      FROM (SELECT ${CurationQueries.sixSqrt("CAST(n AS DOUBLE)")} AS y
         |            FROM (SELECT COUNT(*) AS n FROM dw))))),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM dw GROUP BY 1, 2),
         |contrib AS (
         |  SELECT t.doc_id, t.word,
         |         CAST(t.tf AS DOUBLE) * (l.ln_c - tot.ln_t) AS contrib, t.tf
         |  FROM tf t JOIN lm l USING (word) CROSS JOIN tot),
         |agg AS (
         |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_words,
         |         list_reduce([CAST(0 AS DOUBLE)] || list(contrib ORDER BY word),
         |                     (a, b) -> a + b) AS s
         |  FROM contrib GROUP BY 1)
         |SELECT doc_id, n_words, s / CAST(n_words AS DOUBLE) AS avg_logprob
         |FROM agg ORDER BY doc_id""".stripMargin
        .replace("$LN", CurationQueries.portableLnOfU)
    })

  // ---- 5. compaction round-trip ----

  /** Small-file compaction as a harness-checkable round-trip: fragment
    * the documents table into many tiny files (16 per lang partition),
    * compact with [[graft.ext.Compaction]] (REBALANCE +
    * maxRecordsPerFile), and emit the compacted table's CONTENT — the
    * oracle is the original table, proving the rewrite is lossless.
    * The file-count reduction itself is asserted in ProfileSpec (DuckDB
    * cannot see our file layout).
    */
  val extCompactFiles = Q(
    "ext_compact_files",
    (s, dir) => {
      val tmp = scratch("compact", dir)
      val docs = t(s, dir, "documents")
      docs.repartition(16).write.partitionBy("lang")
        .mode("overwrite").parquet(s"$tmp/frag")
      graft.ext.Compaction.compact(s, s"$tmp/frag", s"$tmp/opt",
        Seq("lang"))
      s.read.parquet(s"$tmp/opt")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, text, lang, source, n_chars
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---- 6. load retention ----

  /** Load-partition retention (VACUUM): append two dated loads of the
    * documents table to a scratch lake, expire all but the newest with
    * [[graft.ext.Retention]] (pure metadata work — one listing + a
    * directory delete, no Spark job), and emit the surviving content.
    * The oracle reconstructs exactly the newest load, proving expiry
    * removed the old load and ONLY the old load.
    */
  val extRetentionExpire = Q(
    "ext_retention_expire",
    (s, dir) => {
      import s.implicits._
      val tmp = scratch("retention", dir)
      // append-mode loads: clear the previous run's scratch table first
      val root = new org.apache.hadoop.fs.Path(tmp)
      val fsys = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(root)) fsys.delete(root, true)
      val docs = t(s, dir, "documents")
      for (load <- Seq("2026-01-01 00:00:00", "2026-01-02 00:00:00"))
        docs.withColumn("etl_inserted",
            lit(java.sql.Timestamp.valueOf(load)))
          .write.mode("append").partitionBy("etl_inserted").parquet(tmp)
      graft.ext.Retention.expireLoads(s, tmp, keep = 1)
      s.read.parquet(tmp)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars",
          $"etl_inserted".cast("string").as("etl_inserted"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, text, lang, source, n_chars,
           |       '2026-01-02 00:00:00' AS etl_inserted
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---- 7. z-order layout ----

  /** Z-order (Morton-curve) layout round-trip: write events ordered
    * along the interleaved-bit curve over (user_id, day) with
    * [[graft.ext.ZOrderLayout]], then answer a single-user slice from
    * the rewritten files. The oracle is the same slice of the original
    * table — the layout changes WHERE rows live, never what they are.
    * LayoutSpec asserts the actual two-dimensional pruning property
    * (files touched ~√F on either dimension).
    */
  val extZorderLayout = Q(
    "ext_zorder_layout",
    (s, dir) => {
      import s.implicits._
      val tmp = scratch("zorder", dir)
      val ev = t(s, dir, "events")
        .withColumn("day", dayofmonth($"ts").cast("long"))
      graft.ext.ZOrderLayout.writeZOrder(ev, s"$tmp/z",
        "user_id", "day", bits = 10, partitions = 8)
      s.read.parquet(s"$tmp/z")
        .where($"user_id" === 3L)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
          $"day")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
           |       event_type, value,
           |       CAST(EXTRACT(day FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS day
           |FROM events WHERE user_id = 3 ORDER BY event_id""".stripMargin))

  // ---- 8. weighted sampling without replacement ----

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each doc draws u ∈ (0,1] from the squared portable hash and ranks
    * by -ln(u)/w with w = n_chars (longer docs proportionally likelier);
    * the k smallest keys ARE a weighted sample without replacement — one
    * pass, no sequential draws, the distributed-sampling standard. Both
    * ln terms stay in the portable sqrt-chain domain (u ≥ 1/(2³¹), so
    * the 64th root keeps |u'| ≤ 0.17), making the sample — not just its
    * size — engine-reproducible. Scale posture: pure column exprs +
    * TakeOrderedAndProject; no shuffle beyond top-k.
    */
  val extSampleWeighted = Q(
    "ext_sample_weighted",
    (s, dir) => {
      import s.implicits._
      val p = ExtQueries.mhP
      val hashed = t(s, dir, "documents")
        .withColumn("sk", concat(lit("wsp:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % p)
      val lnH = stageLn(hashed, "CAST(h2 + 1 AS DOUBLE)", "ln_h")
      val lnP = stageLn(lnH, s"CAST(${p + 1} AS DOUBLE)", "ln_p")
      lnP
        .withColumn("wkey",
          ($"ln_p" - $"ln_h")
            / greatest($"n_chars", lit(1L)).cast("double"))
        .select($"doc_id", $"source", $"n_chars", $"wkey")
        .orderBy($"wkey", $"doc_id")
        .limit(50)
    },
    Some {
      val p = ExtQueries.mhP
      val ln = (x: String, out: String, src: String) =>
        s"""SELECT *, ($$LN) AS $out FROM (
           |  SELECT *, u * u AS u2 FROM (
           |    SELECT *, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u
           |    FROM (SELECT *, ${CurationQueries.sixSqrt(x)} AS y FROM $src)))""".stripMargin
      s"""WITH hh AS (
         |  SELECT doc_id, source, n_chars, (h * h + h) % $p AS h2
         |  FROM (SELECT doc_id, source, n_chars,
         |          ${ExtQueries.mhBaseDuck("('wsp:' || CAST(doc_id AS VARCHAR))")} AS h
         |        FROM documents)),
         |lh AS (SELECT doc_id, source, n_chars, ln_h FROM (
         |  ${ln("CAST(h2 + 1 AS DOUBLE)", "ln_h", "hh")})),
         |lp AS (SELECT doc_id, source, n_chars, ln_h, ln_p FROM (
         |  ${ln(s"CAST(${p + 1} AS DOUBLE)", "ln_p", "lh")}))
         |SELECT doc_id, source, n_chars,
         |       (ln_p - ln_h) / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS wkey
         |FROM lp ORDER BY wkey, doc_id LIMIT 50""".stripMargin
        .replace("$LN", CurationQueries.portableLnOfU)
    })

  // ---- 9. incremental (new-vs-history) dedup ----

  /** Incremental ingestion dedup — the shape a GROWING corpus actually
    * runs: the already-ingested history is summarized as a bloom filter
    * over content fingerprints (built once per ingest, broadcast as a
    * foldable literal through the native codegen'd probe), and each NEW
    * document is classified `dup_history` (fingerprint already in the
    * corpus), `dup_batch` (keep-first within the incoming load), or
    * `new`. Only bloom-positive rows (~fpp·|new| false positives plus
    * true dups) reach the exact history join — the history itself is
    * never reshuffled. History/load split is the deterministic squared
    * hash (80/20); the incoming batch also carries a REPLAYED history
    * slice (h2%10=0 re-ingested, as real feeds do) and a RE-POSTED slice
    * (h2%10=9 content under fresh ids), so all three verdicts actually
    * occur on the shipped corpus (it has no natural exact dups).
    * Fingerprint is the portable poly-hash of the text (production would
    * use 128 bits; the 31-bit space is deterministic on both engines,
    * which is what the oracle checks).
    */
  val extDedupIncremental = Q(
    "ext_dedup_incremental",
    (s, dir) => {
      import s.implicits._
      graft.functions.BloomMightContain.register(s)
      val p = ExtQueries.mhP
      // hashed corpus feeds the history set, the bloom build, and three
      // incoming-batch slices — materialize once (ten lazy re-reads
      // otherwise: count, sketch, both filter branches, the join)
      val docs = Mat(t(s, dir, "documents")
        .withColumn("sk", concat(lit("inc:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % p)
        .withColumn("fp", expr(ExtQueries.mhBaseNative(s, "text")))
        .select($"doc_id", $"fp", $"h2"))
      val hist = Mat(docs.where($"h2" % 10 < 8).select($"fp").distinct())
      // re-posted ids must be provably disjoint from real ids on ANY
      // corpus (a fixed +1e6 collides once doc_ids pass a million,
      // breaking the keep-first total order): offset by max(doc_id)+1
      val repostOffset = docs.agg(max($"doc_id")).first().getLong(0) + 1L
      val newLoad = docs.where($"h2" % 10 >= 8)
        .unionByName(docs.where($"h2" % 10 === 0)) // replayed history
        .unionByName(docs.where($"h2" % 10 === 9) // re-posted, fresh id
          .withColumn("doc_id", $"doc_id" + lit(repostOffset)))
        .select($"doc_id", $"fp")
      val nHist = math.max(hist.count(), 1000L)
      val bf = hist.stat.bloomFilter("fp", nHist, 0.01)
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os)
      val hex = os.toByteArray.map("%02X".format(_)).mkString
      val probe = expr(s"bloom_might_contain(unhex('$hex'), fp)")
      val definiteNew = newLoad.where(!probe)
        .withColumn("hist_hit", lit(false))
      val maybe = newLoad.where(probe)
        .join(hist.withColumn("hist_hit", lit(true)), Seq("fp"), "left")
        .withColumn("hist_hit", coalesce($"hist_hit", lit(false)))
      val w = Window.partitionBy($"fp").orderBy($"doc_id")
      definiteNew.unionByName(maybe)
        .withColumn("rn", row_number().over(w))
        .select($"doc_id", $"fp",
          when($"hist_hit", "dup_history")
            .when($"rn" > 1, "dup_batch")
            .otherwise("new").as("status"))
        .orderBy($"doc_id")
    },
    Some {
      val p = ExtQueries.mhP
      s"""WITH d AS (
         |  SELECT doc_id,
         |         ${ExtQueries.mhBaseDuck("text")} AS fp,
         |         (h * h + h) % $p AS h2
         |  FROM (SELECT doc_id, text,
         |          ${ExtQueries.mhBaseDuck("('inc:' || CAST(doc_id AS VARCHAR))")} AS h
         |        FROM documents)),
         |hist AS (SELECT DISTINCT fp FROM d WHERE h2 % 10 < 8),
         |off AS (SELECT MAX(doc_id) + 1 AS o FROM d),
         |nw AS (
         |  SELECT doc_id, fp FROM d WHERE h2 % 10 >= 8
         |  UNION ALL SELECT doc_id, fp FROM d WHERE h2 % 10 = 0
         |  UNION ALL SELECT doc_id + (SELECT o FROM off), fp FROM d WHERE h2 % 10 = 9)
         |SELECT doc_id, fp,
         |       CASE WHEN fp IN (SELECT fp FROM hist) THEN 'dup_history'
         |            WHEN ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) > 1
         |              THEN 'dup_batch'
         |            ELSE 'new' END AS status
         |FROM nw ORDER BY doc_id""".stripMargin
    })

  // ---- 10. row-level DQ quarantine ----

  /** Row-level data-quality quarantine over orders: rather than failing
    * the whole load on any bad row (the validation-gate semantics the
    * lifecycle checks keep), [[graft.checks.Quarantine]] splits it —
    * every row is emitted with its rule-ordered violation list (empty =
    * clean), so good rows flow on and bad rows are triageable. Rules
    * here: a price upper bound and an order-status domain pin, both
    * violated by real rows of the shipped table. Pure codegen'd
    * projection — no shuffle, no driver work.
    */
  val extDqQuarantine = Q(
    "ext_dq_quarantine",
    (s, dir) => {
      import s.implicits._
      graft.checks.Quarantine.withViolations(
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice"),
        Seq(
          graft.checks.RowRule("price_bound", $"o_totalprice" <= 300000.0d),
          graft.checks.RowRule("status_domain",
            $"o_orderstatus".isin("O", "F"))))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
           |  concat_ws(',',
           |    CASE WHEN NOT (o_totalprice <= 300000) THEN 'price_bound' END,
           |    CASE WHEN NOT (o_orderstatus IN ('O', 'F')) THEN 'status_domain' END)
           |    AS violations
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 11. scalable global ordinal assignment ----

  /** Stable GLOBAL row ordinals (sample indices for a training corpus)
    * without the classic scale bug: `row_number() OVER (ORDER BY …)`
    * with no partition key collapses the whole table into ONE window
    * partition. Instead: rank within each source (a keyed window that
    * scales), aggregate one tiny row per source (count), prefix-sum
    * those on the broadcastable source dimension, and add. The result
    * equals the naive global ROW_NUMBER (the oracle) exactly; the plan
    * never materializes a single-partition exchange. The prefix sum runs
    * a window over the SOURCE-LEVEL table — rows = |sources|, which is
    * what makes it safe.
    */
  val extGlobalIndex = Q(
    "ext_global_index",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"source")
      val inSource = docs.withColumn("rk",
        row_number().over(
          Window.partitionBy($"source").orderBy($"doc_id")))
      val offsets = docs.groupBy($"source")
        .agg(count(lit(1)).as("n"))
        .withColumn("offset",
          coalesce(sum($"n").over(
            Window.orderBy($"source")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select($"source", $"offset")
      inSource.join(broadcast(offsets), "source")
        .select($"doc_id", $"source",
          ($"offset" + $"rk").as("global_pos"))
        .orderBy($"global_pos")
    },
    Some("""SELECT doc_id, source,
           |       ROW_NUMBER() OVER (ORDER BY source, doc_id) AS global_pos
           |FROM documents ORDER BY global_pos""".stripMargin))

  // ---- 12. incremental aggregate maintenance ----

  /** Materialized-aggregate MAINTENANCE: when a new load lands, update
    * per-source corpus metrics by merging the stored partial state with
    * the DELTA's partials — never rescanning history. Works for any
    * algebraic aggregate (decompose into sum/count/min/max partials;
    * derive avg at read). Here the "stored" state is the 80% history
    * slice's partials and the delta is the rest; the oracle computes the
    * same metrics with one flat full-corpus aggregate — equality proves
    * the merge algebra. At 100 TB this is the difference between an
    * incremental metrics refresh touching |delta| rows and a daily
    * full-corpus pass; the merge input is two |sources|-row frames.
    */
  val extAggIncremental = Q(
    "ext_agg_incremental",
    (s, dir) => {
      import s.implicits._
      val p = ExtQueries.mhP
      val docs = t(s, dir, "documents")
        .withColumn("sk", concat(lit("inc:"), $"doc_id".cast("string")))
        .withColumn("h", expr(ExtQueries.mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % p)
        .select($"doc_id", $"source", $"n_chars", $"h2")
      def partials(df: DataFrame): DataFrame =
        df.groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"))
      val stored = partials(docs.where($"h2" % 10 < 8)) // the MV state
      val delta = partials(docs.where($"h2" % 10 >= 8)) // today's load
      stored.unionByName(delta)
        .groupBy($"source").agg(
          sum($"n_docs").as("n_docs"),
          sum($"sum_chars").as("sum_chars"),
          min($"min_chars").as("min_chars"),
          max($"max_chars").as("max_chars"))
        .select($"source", $"n_docs", $"sum_chars", $"min_chars",
          $"max_chars",
          ($"sum_chars".cast("double") / $"n_docs".cast("double"))
            .as("avg_chars"))
        .orderBy($"source")
    },
    Some("""SELECT source,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           |  MIN(n_chars) AS min_chars,
           |  MAX(n_chars) AS max_chars,
           |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
           |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  // ---- 13. table diff / reconciliation ----

  /** Anti-entropy table reconciliation: verify a copy (migration,
    * compaction, replication) matches its source WITHOUT shipping rows —
    * per-group content checksums (count + order-independent XOR of the
    * portable row hash), one keyed agg per side, then a group-level
    * compare. Mismatched groups localize the damage to re-sync; at
    * 100 TB the network cost is |groups| rows, not the table. The
    * "copy" here is the corpus with one deterministically bit-rotted
    * document, so exactly one source group flags — proving the checksum
    * catches a single-row change and clears everything else.
    */
  val extTableDiff = Q(
    "ext_table_diff",
    (s, dir) => {
      import s.implicits._
      def summarize(df: DataFrame): DataFrame =
        df.withColumn("rk",
            concat($"doc_id".cast("string"), lit(":"), $"text"))
          .withColumn("h", expr(ExtQueries.mhBaseNative(s, "rk")))
          .groupBy($"source")
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("xh"))
      val left = summarize(t(s, dir, "documents"))
      val right = summarize(t(s, dir, "documents")
        .withColumn("text",
          when($"doc_id" === 42L, concat($"text", lit(" [bitrot]")))
            .otherwise($"text")))
      left.select($"source", $"n".as("n_left"), $"xh".as("xh_left"))
        .join(right.select($"source", $"n".as("n_right"),
          $"xh".as("xh_right")), Seq("source"), "full_outer")
        .select($"source",
          coalesce($"n_left", lit(0L)).as("n_left"),
          coalesce($"n_right", lit(0L)).as("n_right"),
          ($"n_left" === $"n_right" && $"xh_left" === $"xh_right")
            .as("in_sync"))
        .orderBy($"source")
    },
    Some {
      val h = ExtQueries.mhBaseDuck("(CAST(doc_id AS VARCHAR) || ':' || text)")
      s"""WITH lh AS (
         |  SELECT source, COUNT(*) AS n, bit_xor($h) AS xh
         |  FROM documents GROUP BY 1),
         |rdoc AS (
         |  SELECT doc_id, source,
         |         CASE WHEN doc_id = 42 THEN text || ' [bitrot]' ELSE text END AS text
         |  FROM documents),
         |rh AS (
         |  SELECT source, COUNT(*) AS n, bit_xor($h) AS xh
         |  FROM rdoc GROUP BY 1)
         |SELECT COALESCE(lh.source, rh.source) AS source,
         |       COALESCE(lh.n, 0) AS n_left, COALESCE(rh.n, 0) AS n_right,
         |       lh.n = rh.n AND lh.xh = rh.xh AS in_sync
         |FROM lh FULL OUTER JOIN rh ON lh.source = rh.source
         |ORDER BY source""".stripMargin
    })

  // ---- 14. character-entropy quality signal ----

  /** Character-level Shannon entropy per document (nats): the cheap
    * gibberish/boilerplate detector — near-zero for repeated-character
    * spam, ~ln(alphabet) for natural text. entropy = Σ (c/n)·ln(n/c)
    * over per-char counts, with ln the portable sqrt-chain (n/c ∈
    * [1, doc length] — comfortably inside the reduction range) and the
    * per-doc sum folded in CHARACTER order, so the scores are
    * bit-identical cross-engine. Scale posture: one (doc, char) keyed
    * agg (per-doc state bounded by the alphabet), one doc-keyed fold.
    */
  val extTextEntropy = Q(
    "ext_text_entropy",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"text", length($"text").cast("double").as("n"))
      val cc = docs
        .select($"doc_id", $"n", explode(split($"text", "")).as("ch"))
        .groupBy($"doc_id", $"n", $"ch")
        .agg(count(lit(1)).cast("double").as("c"))
      stageLn(cc, "n / c", "ln_nc")
        .withColumn("term", ($"c" / $"n") * $"ln_nc")
        .groupBy($"doc_id")
        .agg(
          expr("aggregate(transform(array_sort(collect_list(struct(ch, term))), x -> x.term), 0D, (a, x) -> a + x)")
            .as("entropy"),
          count(lit(1)).as("n_distinct_chars"))
        .withColumn("is_low_entropy", $"entropy" < lit(2.0d))
        .orderBy($"doc_id")
    },
    Some {
      s"""WITH d AS (
         |  SELECT doc_id, text, CAST(length(text) AS DOUBLE) AS n
         |  FROM documents),
         |cc AS (
         |  SELECT doc_id, n, ch, CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM (SELECT doc_id, n, unnest(string_split(text, '')) AS ch
         |        FROM d)
         |  GROUP BY doc_id, n, ch),
         |l AS (
         |  SELECT doc_id, ch, (c / n) * ($$LN) AS term FROM (
         |    SELECT *, u * u AS u2 FROM (
         |      SELECT *, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u
         |      FROM (SELECT *, ${CurationQueries.sixSqrt("n / c")} AS y
         |            FROM cc)))),
         |e AS (
         |  SELECT doc_id,
         |         list_reduce([CAST(0 AS DOUBLE)] || list(term ORDER BY ch),
         |                     (a, x) -> a + x) AS entropy,
         |         COUNT(*) AS n_distinct_chars
         |  FROM l GROUP BY doc_id)
         |SELECT doc_id, entropy, n_distinct_chars,
         |       entropy < CAST(2.0 AS DOUBLE) AS is_low_entropy
         |FROM e ORDER BY doc_id""".stripMargin
        .replace("$LN", CurationQueries.portableLnOfU)
    })

  // ---- 15. per-source quantile profile ----

  /** Per-source document-length quantiles (p50/p90/p99) by EXACT
    * rank selection over the value-level count table — not
    * `percentile_approx`: the GK sketch is only rank-exact while a
    * group holds fewer than ~accuracy/2 values, so hash-comparing it to
    * an exact oracle silently breaks once a source outgrows the sketch
    * (the category report keeps percentile_approx where approx IS the
    * contract). Scale posture: the quantile of a discrete column never
    * needs a row-level sort — aggregate to (source, value, count)
    * (bounded by the VALUE DOMAIN), one keyed cumulative window over
    * that value-level table, then pick min value with cum ≥ ceil(q·n).
    * Rank arithmetic is explicit DOUBLE in both engines (DuckDB's bare
    * `0.99 * n` is decimal math and can ceil differently), so the
    * selected ranks are bit-identical cross-engine at any group size.
    */
  val extQuantileProfile = Q(
    "ext_quantile_profile",
    (s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "documents")
        .groupBy($"source", $"n_chars")
        .agg(count(lit(1)).as("c"))
      val cum = counts.withColumn("cum",
        sum($"c").over(Window.partitionBy($"source").orderBy($"n_chars")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val ns = counts.groupBy($"source").agg(sum($"c").as("n"))
      def rk(q: Double) =
        ceil(lit(q) * $"n".cast("double")).cast("long")
      def pick(q: Double) =
        min(when($"cum" >= rk(q), $"n_chars")).cast("double")
      cum.join(broadcast(ns), "source")
        .groupBy($"source")
        .agg(max($"n").as("n_docs"),
          pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
        .orderBy($"source")
    },
    Some("""WITH counts AS (
           |  SELECT source, n_chars, COUNT(*) AS c
           |  FROM documents GROUP BY source, n_chars),
           |cum AS (
           |  SELECT source, n_chars, c,
           |         SUM(c) OVER (PARTITION BY source ORDER BY n_chars
           |                      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM counts),
           |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
           |       FROM counts GROUP BY source)
           |SELECT c.source, MAX(ns.n) AS n_docs,
           |       CAST(MIN(CASE WHEN c.cum >= CAST(ceil(CAST(0.5 AS DOUBLE) * CAST(ns.n AS DOUBLE)) AS BIGINT) THEN c.n_chars END) AS DOUBLE) AS p50,
           |       CAST(MIN(CASE WHEN c.cum >= CAST(ceil(CAST(0.9 AS DOUBLE) * CAST(ns.n AS DOUBLE)) AS BIGINT) THEN c.n_chars END) AS DOUBLE) AS p90,
           |       CAST(MIN(CASE WHEN c.cum >= CAST(ceil(CAST(0.99 AS DOUBLE) * CAST(ns.n AS DOUBLE)) AS BIGINT) THEN c.n_chars END) AS DOUBLE) AS p99
           |FROM cum c JOIN ns ON c.source = ns.source
           |GROUP BY c.source ORDER BY c.source""".stripMargin))

  // ---- 16. TF-IDF document vectors ----

  /** Per-document top-3 TF-IDF terms — the sparse document vectors
    * clustering/retrieval pipelines consume (vs BM25, which scores a
    * QUERY against docs; this materializes each doc's own
    * representation). tf is length-normalized (c/doc_len), idf = ln(N/df)
    * via the portable sqrt-chain (N/df ≥ 1, inside the reduction range);
    * both factors are single divisions, so scores are bit-identical
    * cross-engine. Scale posture: one (doc, word) agg for tf, one
    * vocab-sized agg for df (broadcast), one keyed top-k window —
    * WindowGroupLimit prunes below rank 3 before the sort completes.
    */
  val extTfidfVectors = Q(
    "ext_tfidf_vectors",
    (s, dir) => {
      import s.implicits._
      val dw = t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .select($"doc_id", size($"w").cast("double").as("dl"),
          explode($"w").as("word"))
      val tf = dw.groupBy($"doc_id", $"dl", $"word")
        .agg(count(lit(1)).cast("double").as("c"))
      val dfq = dw.select($"doc_id", $"word").distinct()
        .groupBy($"word").agg(count(lit(1)).cast("double").as("df"))
      val nDocs = dw.select($"doc_id").distinct()
        .agg(count(lit(1)).cast("double").as("n_docs"))
      val idf = stageLn(
        dfq.crossJoin(broadcast(nDocs)), "n_docs / df", "idf")
        .select($"word", $"idf")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"tfidf".desc, $"word")
      tf.join(broadcast(idf), "word")
        .withColumn("tfidf", ($"c" / $"dl") * $"idf")
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 3)
        .select($"doc_id", $"rank", $"word", $"tfidf")
        .orderBy($"doc_id", $"rank")
    },
    Some {
      s"""WITH dw AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
         |         unnest(string_split(text, ' ')) AS word
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, dl, word, CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM dw GROUP BY doc_id, dl, word),
         |dfq AS (
         |  SELECT word, CAST(COUNT(*) AS DOUBLE) AS df
         |  FROM (SELECT DISTINCT doc_id, word FROM dw) GROUP BY word),
         |nd AS (
         |  SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM dw),
         |idf AS (
         |  SELECT word, ($$LN) AS idf FROM (
         |    SELECT *, u * u AS u2 FROM (
         |      SELECT *, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u
         |      FROM (SELECT word, df, n_docs,
         |                   ${CurationQueries.sixSqrt("n_docs / df")} AS y
         |            FROM dfq, nd)))),
         |scored AS (
         |  SELECT tf.doc_id, tf.word, (tf.c / tf.dl) * idf.idf AS tfidf
         |  FROM tf JOIN idf ON tf.word = idf.word)
         |SELECT doc_id, rank, word, tfidf FROM (
         |  SELECT doc_id, word, tfidf,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |           ORDER BY tfidf DESC, word) AS INT) AS rank
         |  FROM scored)
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin
        .replace("$LN", CurationQueries.portableLnOfU)
    })

  /** Fixed feature-space dimension for DSIR hashed unigram features —
    * the paper's own device (hashed n-grams into a fixed bucket count):
    * the importance-weight table is EXACTLY this many rows at any
    * corpus size, so it broadcasts at 100 TB where a raw web vocabulary
    * (10⁸+ types) would not.
    */
  private[graft] val dsirBuckets = graft.ScaleConfig.dsirBuckets

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every training-pool document by how target-like its token
    * distribution is — log w(d) = Σ_f c_d(f)·ln(p_target(f)/p_corpus(f))
    * over HASHED unigram features (portable poly-hash mod
    * [[dsirBuckets]] — the paper hashes n-grams the same way precisely
    * so the feature space stays fixed-size), Laplace-smoothed over the
    * bucket count. Docs 0-9 stand in for the target domain (the
    * decontamination convention). The selection step keeps the
    * highest-weight docs; emitting the log-weight (not exp) keeps every
    * double a product/sum of portable-ln outputs, so the ranking
    * hash-compares. Scale posture: the log-ratio table is exactly
    * `dsirBuckets` rows (broadcast at any corpus size); per-doc scoring
    * is one keyed agg over (doc, bucket) counts with a bucket-ordered
    * fold — agg state ≤ dsirBuckets entries. Integer num/den
    * normalization and sign-split ln as in ext_psi_drift.
    */
  val extDsirLogweight = Q(
    "ext_dsir_logweight",
    (s, dir) => {
      import s.implicits._
      val B = dsirBuckets
      val tok = t(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .withColumn("bucket",
          expr(s"${ExtQueries.mhBaseNative(s, "word")} % $B"))
        .select($"doc_id", $"bucket")
        .transform(Q.mat)
      val target = tok.where($"doc_id" < 10)
      val nC = tok.agg(count(lit(1)).as("n_c"))
      val nT = target.agg(count(lit(1)).as("n_t"))
      val cT = target.groupBy($"bucket").agg(count(lit(1)).as("c_t"))
      val cC = tok.groupBy($"bucket").agg(count(lit(1)).as("c_c"))
      val wts = cC.join(cT, Seq("bucket"), "left")
        .na.fill(0L, Seq("c_t"))
        .crossJoin(broadcast(nC)).crossJoin(broadcast(nT))
        .withColumn("num", ($"c_t" + lit(1L)) * ($"n_c" + lit(B)))
        .withColumn("den", ($"c_c" + lit(1L)) * ($"n_t" + lit(B)))
        .withColumn("rmax",
          greatest($"num", $"den").cast("double")
            / least($"num", $"den").cast("double"))
        .withColumn("y", expr(CurationQueries.sixSqrt("rmax")))
        .withColumn("u", ($"y" - lit(1.0d)) / ($"y" + lit(1.0d)))
        .withColumn("u2", $"u" * $"u")
        .withColumn("lnabs", expr(CurationQueries.portableLnOfU))
        .withColumn("lnr",
          when($"num" >= $"den", $"lnabs").otherwise(-$"lnabs"))
        .select($"bucket", $"lnr")
      tok.where($"doc_id" >= 10)
        .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("c_db"))
        .join(broadcast(wts), "bucket")
        .withColumn("term", $"c_db".cast("double") * $"lnr")
        .groupBy($"doc_id")
        .agg(sum($"c_db").as("n_tokens"),
          expr(
            "aggregate(transform(array_sort(collect_list(struct(bucket, term))), x -> x.term), 0D, (a, x) -> a + x)")
            .as("log_weight"))
        .orderBy($"doc_id")
    },
    Some {
      val ln = CurationQueries.portableLnOfU
      val B = dsirBuckets
      s"""WITH tok AS (
         |  SELECT doc_id, ${ExtQueries.mhBaseDuck("word")} % $B AS bucket
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents)),
         |nc AS (SELECT COUNT(*) AS n_c FROM tok),
         |nt AS (SELECT COUNT(*) AS n_t FROM tok WHERE doc_id < 10),
         |ct AS (SELECT bucket, COUNT(*) AS c_t FROM tok
         |       WHERE doc_id < 10 GROUP BY 1),
         |cc AS (SELECT bucket, COUNT(*) AS c_c FROM tok GROUP BY 1),
         |w0 AS (
         |  SELECT cc.bucket,
         |         (COALESCE(ct.c_t, 0) + 1) * (nc.n_c + $B) AS num,
         |         (cc.c_c + 1) * (nt.n_t + $B) AS den
         |  FROM cc LEFT JOIN ct USING (bucket), nc, nt),
         |w1 AS (SELECT *, CAST(GREATEST(num, den) AS DOUBLE)
         |                 / CAST(LEAST(num, den) AS DOUBLE) AS rmax FROM w0),
         |w2 AS (SELECT *, ${CurationQueries.sixSqrt("rmax")} AS y FROM w1),
         |w3 AS (SELECT *, (y - CAST(1 AS DOUBLE)) / (y + CAST(1 AS DOUBLE)) AS u FROM w2),
         |w4 AS (SELECT *, u * u AS u2 FROM w3),
         |w5 AS (
         |  SELECT bucket, CASE WHEN num >= den THEN ($ln)
         |                      ELSE -($ln) END AS lnr
         |  FROM w4),
         |d AS (
         |  SELECT doc_id, bucket, COUNT(*) AS c_db FROM tok
         |  WHERE doc_id >= 10 GROUP BY 1, 2),
         |t AS (
         |  SELECT d.doc_id, d.bucket, d.c_db,
         |         CAST(d.c_db AS DOUBLE) * w5.lnr AS term
         |  FROM d JOIN w5 USING (bucket))
         |SELECT doc_id, CAST(SUM(c_db) AS BIGINT) AS n_tokens,
         |       list_reduce([CAST(0 AS DOUBLE)] ||
         |         list(term ORDER BY bucket), (a, x) -> a + x) AS log_weight
         |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  val all: Seq[Q] = Seq(extProfileColumns, extHeavyHittersCms,
    extPiiRedact, extLmQuality, extCompactFiles, extRetentionExpire,
    extZorderLayout, extSampleWeighted, extDedupIncremental,
    extDqQuarantine, extGlobalIndex, extAggIncremental, extTableDiff,
    extTextEntropy, extQuantileProfile, extTfidfVectors,
    extDsirLogweight)
}
