package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-training-data pipeline operators (BASELINE.json north star; SURVEY.md
  * §7.4): deduplication (exact, n-gram Jaccard, MinHash-LSH, SimHash),
  * similarity search over embeddings (brute-force + LSH-bucketed), text
  * analysis (fingerprinting, token counts, quality, language-ID, top
  * terms), and gap-based sessionization.
  *
  * Scale posture: every operator is keyed/partitioned — inverted-index
  * joins instead of all-pairs, LSH buckets instead of cross joins, window
  * functions instead of driver-side loops. Cross-engine determinism for
  * the oracles: integer/decimal arithmetic, and cosine computed as a
  * strict left fold in doubles (Spark `aggregate` ≡ DuckDB `list_reduce`,
  * verified bit-identical; DuckDB's own list_cosine_similarity computes in
  * float32 and does NOT match).
  */
object ExtQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private[queries] def stopSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  /** The engine-portable hash family shared by fingerprinting, MinHash
    * and SimHash: one polynomial base (rolling Rabin-Karp) hash per
    * string (fold of char codes mod p, p = 2³¹−1 prime), then affine
    * transforms h_i = (a_i·h + b_i) mod p — the classic universal-hash
    * construction. Pure 64-bit integer arithmetic with every
    * intermediate < 2⁶², so Spark and DuckDB compute identical values
    * (murmur3/xxhash64, which round 1 used, are Spark-internal and made
    * those queries rows-only-checkable).
    * NOTE: defined BEFORE every val that bakes these into an oracle
    * string — Scala object vals initialize in declaration order.
    */
  private[queries] val mhP = 2147483647L
  private def mhA(i: Int): Long = {
    val v = (1103515245L * (i + 1) + 12345L) % mhP
    if (v == 0) 1L else v
  }
  private def mhB(i: Int): Long = (1103515245L * (i + 101) + 12345L) % mhP
  /** Spark rendering of the base hash (fold of char codes, mod p). The
    * empty-string guard matters: Spark's `sequence(1, 0)` infers step −1
    * and yields [1, 0] (two phantom positions), where DuckDB's
    * `range(1, 1)` is empty — without the CASE the engines diverge on
    * '' (observed: 6727 vs 7). [[graft.functions.PolyHash]] is the
    * codegen'd equivalent (salt on empty by construction); this HOF
    * rendering remains the registration-free reference formulation and
    * the bit-equality witness in PolyHashSpec.
    */
  private[graft] def mhBaseSpark(col: String, mult: Int = 31, salt: Int = 7)
      : String =
    s"(CASE WHEN length($col) = 0 THEN ${salt}L ELSE " +
      s"aggregate(transform(sequence(1, length($col)), p -> " +
      s"cast(ascii(substring($col, p, 1)) as bigint)), ${salt}L, " +
      s"(h, c) -> (h * $mult + c) % $mhP) END)"

  /** Codegen'd rendering of the same hash ([[graft.functions.PolyHash]]):
    * registers the native function in the session and emits the call.
    * Use on hot paths (per-gram / per-token hashing); bit-identical to
    * [[mhBaseSpark]] and [[mhBaseDuck]].
    */
  private[queries] def mhBaseNative(s: SparkSession, col: String,
      mult: Int = 31, salt: Int = 7): String = {
    graft.functions.PolyHash.register(s)
    s"poly_hash($col, $mult, $salt)"
  }
  /** DuckDB rendering — list_reduce has no init, so the init is the
    * prepended first element.
    */
  private[queries] def mhBaseDuck(col: String, mult: Int = 31, salt: Int = 7)
      : String =
    s"list_reduce([CAST($salt AS BIGINT)] || list_transform(" +
      s"range(1, length($col) + 1), p -> " +
      s"CAST(ascii(substring($col, p, 1)) AS BIGINT)), " +
      s"(h, c) -> (h * $mult + c) % $mhP)"
  /** Band key from `rows` consecutive min-hashes: base-31 combine (values
    * < 2³¹·31³ < 2⁴⁶ — no overflow, no collision-relevant loss).
    */
  private def mhBandKey(hs: Seq[String]): String =
    hs.reduce((acc, h) => s"($acc * 31 + $h)")

  /** Word-3-gram shingles, distinct per doc (shared by the dedup family).
    * One row per (doc_id, gram) — the inverted-index representation that
    * scales: candidate pairs come from gram-key joins, never all-pairs.
    */
  private[graft] def grams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", split($"text", " ").as("w"))
      .where(size($"w") >= 3)
      .select($"doc_id", explode(array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
        .as("gram"))
  }

  /** The gram-frequency cap that makes the inverted-index self-join safe
    * at corpus scale (CCNet/Gopher practice): a gram appearing in k docs
    * costs k² join rows, so one boilerplate shingle shared by 1 % of a
    * 100 TB corpus is a quadratic hot key — and carries no dedup signal
    * (it discriminates nothing). Grams with document frequency >
    * `maxDocFreq` are dropped BEFORE the self-join; sizes and
    * intersections are both computed over the capped gram sets, so the
    * Jaccard semantics stay internally consistent. NgramCapSpec shows the
    * ≥ 0.5-pair set on this corpus is unchanged by the cap (the dropped
    * grams are non-discriminative boilerplate).
    */
  private[graft] val gramDocFreqCap = graft.ScaleConfig.gramDocFreqCap

  /** LSH bucket-population cap shared by the MinHash band join and the
    * SimHash block join: a bucket with k members contributes k(k−1)/2
    * candidate pairs, so one bucket a large corpus fraction hashes into
    * is a quadratic hot key (the same failure mode as an uncapped
    * boilerplate gram). Members of a dropped bucket still meet through
    * their other bands/blocks — a hot bucket discriminates nothing —
    * but candidate recall for pairs whose ONLY shared bucket is hot
    * drops by design (documented per query).
    */
  private[graft] val lshBucketCap = graft.ScaleConfig.lshBucketCap

  private[graft] def cappedGrams(s: SparkSession, dir: String,
      maxDocFreq: Long = gramDocFreqCap): DataFrame = {
    // both the df-count branch and the join probe read the exploded gram
    // stream; materialize it once instead of re-exploding the corpus
    val g = Mat(grams(s, dir))
    val rare = g.groupBy(col("gram"))
      .agg(count(lit(1)).as("gram_df"))
      .where(col("gram_df") <= maxDocFreq)
      .select(col("gram"))
    g.join(rare, Seq("gram")).select(col("doc_id"), col("gram"))
  }

  /** Document fingerprinting + token counting: md5 content hash, a
    * Rabin-Karp rolling polynomial hash (the [[mhBaseSpark]] family),
    * whitespace token count, the chars/4 BPE-style estimate, and a real
    * BPE-ish regex pre-tokenizer count (letter runs | digit runs |
    * single non-alphanumeric — the GPT-2-style split shape; the simple
    * alternation means Java regex and RE2 agree).
    */
  val extFingerprint = Q(
    "ext_text_fingerprint",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          md5($"text").as("fingerprint"),
          size(split($"text", " ")).cast("bigint").as("tokens_ws"),
          ceil($"n_chars" / 4.0).as("tokens_bpe_est"),
          size(expr(
            """regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"""))
            .cast("bigint").as("tokens_regex"),
          expr(mhBaseNative(s, "text")).as("rolling_hash"))
        .orderBy($"doc_id")
    },
    Some(s"""SELECT doc_id, md5(text) AS fingerprint,
            |       len(string_split(text, ' ')) AS tokens_ws,
            |       CAST(CEIL(n_chars / 4.0) AS BIGINT) AS tokens_bpe_est,
            |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS tokens_regex,
            |       ${mhBaseDuck("text")} AS rolling_hash
            |FROM documents ORDER BY doc_id""".stripMargin))

  /** Exact dedup, keep-first: one representative doc per (lang, source)
    * group — hash-partitioned ranking window, no global sort, no driver
    * loop (the §7.4 exact-dedup shape on the dedup key).
    */
  val extDedupExact = Q(
    "ext_dedup_exact",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"lang", $"source", $"doc_id", $"n_chars")
        .orderBy($"lang", $"source")
    },
    Some("""SELECT lang, source, doc_id, n_chars
           |FROM documents
           |QUALIFY ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1
           |ORDER BY lang, source""".stripMargin))

  /** The ≥ 0.5 word-3-gram-Jaccard near-dup pair set — shared by
    * [[extDedupNgramJaccard]] (which emits it) and
    * [[extDedupComponents]] (which clusters it).
    */
  private[graft] def jaccardPairs(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    // the inverted index feeds three consumers (both self-join sides +
    // sizes); materialize it once — at scale this is "build the gram
    // index, then run the dedup family off it", not three corpus passes
    val g = Mat(cappedGrams(s, dir))
    val sizes = g.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = g.as("g1")
      .join(g.as("g2"),
        col("g1.gram") === col("g2.gram")
          && col("g1.doc_id") < col("g2.doc_id"))
      .groupBy(col("g1.doc_id").as("doc_a"), col("g2.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double")
          / (col("sa.sz") + col("sb.sz") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= 0.5)
  }

  /** The matching DuckDB CTE chain, ending in a `pairs(doc_a, doc_b,
    * jaccard)` CTE (no trailing comma).
    */
  private[queries] val jaccardPairsDuckCtes: String =
    s"""g0 AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |           range(len(s) - 2),
       |           i -> s[i+1] || ' ' || s[i+2] || ' ' || s[i+3]))) AS gram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
       |  WHERE len(s) >= 3),
       |rare AS (SELECT gram FROM g0 GROUP BY 1 HAVING COUNT(*) <= $gramDocFreqCap),
       |g AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN rare USING (gram)),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
       |inter AS (
       |  SELECT g1.doc_id AS doc_a, g2.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM g g1 JOIN g g2 ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |         CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |  FROM inter
       |  JOIN sz sa ON doc_a = sa.doc_id
       |  JOIN sz sb ON doc_b = sb.doc_id
       |  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5)""".stripMargin

  /** Near-dup detection by word-3-gram Jaccard ≥ 0.5: inverted-index
    * self-join on gram (only docs sharing a shingle ever meet — the
    * scalable alternative to an all-pairs cross join), then exact
    * |A∩B| / (|A|+|B|−|A∩B|) from integer counts. Grams above the
    * document-frequency cap are dropped before the self-join (see
    * [[cappedGrams]]) — the oracle applies the identical cap.
    */
  val extDedupNgramJaccard = Q(
    "ext_dedup_ngram_jaccard",
    (s, dir) => jaccardPairs(s, dir).orderBy(col("doc_a"), col("doc_b")),
    Some(s"""WITH $jaccardPairsDuckCtes
           |SELECT doc_a, doc_b, jaccard FROM pairs
           |ORDER BY doc_a, doc_b""".stripMargin))

  /** Near-dup CONNECTED COMPONENTS + survivor selection — the step a
    * production dedup actually ships: pair emission (above) says who
    * collides; this says which docs to KEEP. Components come from
    * fixed-iteration min-label propagation over the symmetric pair
    * graph: label(v) ← min(label(v), min over neighbors) per pass, each
    * pass one keyed join + one keyed min-agg (never materializing
    * anything super-linear in |edges|). Iterations are fixed at 3 —
    * near-dup clusters are shallow (this corpus converges in 1 pass,
    * largest component 3 docs; a production run would iterate to
    * fixpoint with a convergence count, same per-pass plan) — and the
    * unrolled loop replays in DuckDB, so the driver hash-checks the
    * clustering itself. Survivor = the component's min doc_id
    * (keep-first, matching the exact-dedup family convention).
    */
  val extDedupComponents = Q(
    "ext_dedup_components",
    (s, dir) => {
      import s.implicits._
      val iters = 3
      val pairs = jaccardPairs(s, dir).select($"doc_a", $"doc_b")
      // The edge list is referenced once per iteration plus once for the
      // seed labels; uncached, each reference would replay the whole
      // inverted-index self-join (~8 executions for 3 iterations).
      // Persist it — it is the SMALL side (|near-dup pairs| ≪ |grams|) —
      // and symmetrize via ONE explode pass so the pair join itself
      // runs exactly once (a union of pairs with its swap would evaluate
      // the uncached pair lineage twice inside the materialization job).
      val edges = pairs
        .select(explode(array(
          struct($"doc_a".as("src"), $"doc_b".as("dst")),
          struct($"doc_b".as("src"), $"doc_a".as("dst")))).as("e"))
        .select($"e.src", $"e.dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = edges.select($"src".as("doc_id")).distinct()
        .withColumn("comp", $"doc_id")
      for (_ <- 1 to iters) {
        val viaNeighbor = edges
          .join(labels.select($"doc_id".as("dst"), $"comp"), Seq("dst"))
          .select($"src".as("doc_id"), $"comp")
        // eager localCheckpoint per pass: the label frame feeds the next
        // pass TWICE (union + join), so an unbroken lineage replays
        // 2^iters times and the analyzed plan doubles every pass — the
        // standard iterative-algorithm lineage truncation (GraphX/MLlib
        // do the same internally).
        labels = labels.union(viaNeighbor)
          .groupBy($"doc_id").agg(min($"comp").as("comp"))
          .transform(Q.mat)
      }
      edges.unpersist() // labels' lineage is truncated; edges can go
      labels
        .select($"doc_id", $"comp".as("component"),
          ($"doc_id" === $"comp").as("keep"))
        .orderBy($"doc_id")
    },
    Some {
      val iters = 3
      val lloyd = (1 to iters).map { i =>
        val prev = s"l${i - 1}"
        s"""l$i AS (
           |  SELECT doc_id, MIN(comp) AS comp FROM (
           |    SELECT doc_id, comp FROM $prev
           |    UNION ALL
           |    SELECT e.src AS doc_id, l.comp
           |    FROM edges e JOIN $prev l ON e.dst = l.doc_id)
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $jaccardPairsDuckCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS doc_id, src AS comp FROM edges),
         |$lloyd
         |SELECT doc_id, comp AS component, doc_id = comp AS keep
         |FROM l$iters ORDER BY doc_id""".stripMargin
    })

  /** MinHash + LSH banding candidates: 16 portable min-hashes per doc
    * over its doc-frequency-capped shingles (see [[cappedGrams]]),
    * 4 bands × 4 rows; docs sharing any band bucket become a candidate
    * pair, then candidates are verified with exact Jaccard. The oracle
    * replicates the full pipeline — the same universal-hash family is
    * computed in DuckDB SQL. MinhashSpec additionally pins recall on
    * crafted near-dups.
    */
  val extDedupMinhashLsh = Q(
    "ext_dedup_minhash_lsh",
    (s, dir) => {
      import s.implicits._
      val K = graft.ScaleConfig.minhashK
      val bands = graft.ScaleConfig.minhashBands
      val rows = K / bands
      // materialized once: the hashed gram index feeds the signature agg
      // AND the sizes/intersection verification below
      val g = cappedGrams(s, dir)
        .withColumn("bh0", expr(mhBaseNative(s, "gram")))
        .transform(Q.mat)
      val hashCols = (0 until K).map(i =>
        min(expr(s"(${mhA(i)}L * bh0 + ${mhB(i)}L) % $mhP")).as(s"h$i"))
      val sig = g.groupBy($"doc_id").agg(hashCols.head, hashCols.tail: _*)
      val bandRows = sig.select(
        $"doc_id",
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            expr(mhBandKey((b * rows until (b + 1) * rows)
              .map(i => s"h$i"))).as("bh"))): _*)).as("bb"))
        .select($"doc_id", $"bb.band", $"bb.bh")
      // band-bucket population cap (same rationale as the gram df cap):
      // a bucket holding k docs contributes k² candidate pairs, and a
      // bucket a large fraction of the corpus hashes into discriminates
      // nothing — at 100 TB one such bucket is a quadratic straggler.
      // The oracle applies the identical cap.
      val bandRowsM = Mat(bandRows) // 4 rows/doc, 3 readers
      val okBuckets = bandRowsM.groupBy($"band", $"bh")
        .agg(count(lit(1)).as("bpop"))
        .where($"bpop" <= lshBucketCap)
        .select($"band", $"bh")
      val cappedRows = bandRowsM.join(okBuckets, Seq("band", "bh"))
      val cand = cappedRows.as("x")
        .join(cappedRows.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // verify candidates with exact Jaccard (cheap: only candidate pairs)
      val sizes = g.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
      val inter = g.as("g1")
        .join(cand, col("g1.doc_id") === col("doc_a"))
        .join(g.as("g2"),
          col("g2.doc_id") === col("doc_b") && col("g1.gram") === col("g2.gram"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      cand.join(inter, Seq("doc_a", "doc_b"), "left")
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          coalesce((col("inter").cast("double")
            / (col("sa.sz") + col("sb.sz") - col("inter"))), lit(0.0))
            .as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some {
      val minCols = (0 until graft.ScaleConfig.minhashK)
        .map(i => s"MIN((${mhA(i)} * bh0 + ${mhB(i)}) % $mhP) AS h$i")
        .mkString(",\n           |         ")
      val bandSelects = (0 until graft.ScaleConfig.minhashBands).map { b =>
        val rpb = graft.ScaleConfig.minhashK / graft.ScaleConfig.minhashBands
        val key = mhBandKey((b * rpb until (b + 1) * rpb).map(i => s"h$i"))
        s"SELECT doc_id, $b AS band, $key AS bh FROM sig"
      }.mkString("\n           |  UNION ALL ")
      s"""WITH g0 AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |           range(len(s) - 2),
         |           i -> s[i+1] || ' ' || s[i+2] || ' ' || s[i+3]))) AS gram
         |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
         |  WHERE len(s) >= 3),
         |rare AS (SELECT gram FROM g0 GROUP BY 1 HAVING COUNT(*) <= $gramDocFreqCap),
         |g AS (SELECT g0.doc_id, g0.gram, ${mhBaseDuck("g0.gram")} AS bh0
         |      FROM g0 JOIN rare USING (gram)),
         |sig AS (
         |  SELECT doc_id,
         |         $minCols
         |  FROM g GROUP BY 1),
         |bandrows AS (
         |  $bandSelects),
         |okb AS (
         |  SELECT band, bh FROM bandrows
         |  GROUP BY 1, 2 HAVING COUNT(*) <= $lshBucketCap),
         |cb AS (SELECT bandrows.* FROM bandrows JOIN okb USING (band, bh)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM cb x JOIN cb y
         |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
         |inter AS (
         |  SELECT doc_a, doc_b, COUNT(*) AS inter
         |  FROM g g1 JOIN cand ON g1.doc_id = doc_a
         |  JOIN g g2 ON g2.doc_id = doc_b AND g1.gram = g2.gram
         |  GROUP BY 1, 2)
         |SELECT cand.doc_a AS doc_a, cand.doc_b AS doc_b,
         |       COALESCE(CAST(inter.inter AS DOUBLE) / (sa.sz + sb.sz - inter.inter), 0.0) AS jaccard
         |FROM cand
         |LEFT JOIN inter ON cand.doc_a = inter.doc_a AND cand.doc_b = inter.doc_b
         |JOIN sz sa ON cand.doc_a = sa.doc_id
         |JOIN sz sb ON cand.doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    })

  /** SimHash near-dup candidates: 62-bit signature (sign of per-bit vote
    * over two engine-portable 31-bit polynomial token hashes — round 1's
    * xxhash64 was Spark-internal and made this rows-only-checkable),
    * candidate pairs found by joining on 16-bit signature blocks (block
    * LSH for Hamming space). Pigeonhole guarantees a shared block only
    * for Hamming distance d ≤ 3; a pair with 4 ≤ d ≤ 12 is surfaced only
    * when its differing bits cluster into ≤ 3 of the 4 blocks, so the
    * `hamming ≤ 12` output has recall < 1 by design — acceptable
    * candidate generation (true near-dups sit at d ≈ 0-3), pinned by the
    * DedupSpec crafted pair. Block buckets above [[lshBucketCap]] are
    * dropped before the self-join (they are the quadratic hot keys and
    * discriminate nothing); pairs whose only shared block is hot are
    * additionally missed. The oracle replicates the exact hash family,
    * vote and cap in SQL.
    */
  val extDedupSimhash = Q(
    "ext_dedup_simhash",
    (s, dir) => {
      import s.implicits._
      val tok0 = t(s, dir, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("w"))
      // hash the DISTINCT vocabulary, then join back: the interpreted
      // char-fold runs |vocab| times instead of |token occurrences| —
      // at corpus scale the dictionary is orders of magnitude smaller
      // than the token stream (the values are identical either way, so
      // the oracle, which hashes per occurrence, is unaffected)
      val vocab = tok0.select($"w").distinct()
        .withColumn("b1", expr(mhBaseNative(s, "w", 31, 7)))
        .withColumn("b2", expr(mhBaseNative(s, "w", 37, 11)))
      val tok = tok0.join(vocab, Seq("w"))
      val bitCols = (0 until 62).map { i =>
        val src = if (i < 31) s"(b1 >> $i)" else s"(b2 >> ${i - 31})"
        sum(when(expr(s"$src & 1") === 1, 1).otherwise(-1)).as(s"b$i")
      }
      // one row per doc; the 62-vote token-stream agg above is the
      // expensive pass and feeds both the cap count and both self-join
      // sides — materialize it exactly once
      val sig = tok.groupBy($"doc_id").agg(bitCols.head, bitCols.tail: _*)
        .select($"doc_id",
          (0 until 62).map(i =>
            when(col(s"b$i") > 0, expr(s"shiftleft(1L, $i)")).otherwise(0L))
            .reduce(_ bitwiseOR _).as("sim"))
        .transform(Q.mat)
      val blocks = sig.select($"doc_id", $"sim",
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("blk"),
            expr(s"(sim >> ${b * 16}) & 65535").as("bv"))): _*)).as("bb"))
        .select($"doc_id", $"sim", $"bb.blk", $"bb.bv")
      // block-bucket population cap ([[lshBucketCap]]): on this corpus a
      // single block value can be shared by ~30 % of docs (measured: max
      // population 140/500 at sf0.01) — an uncapped join on it is the
      // quadratic hot key. True near-dups share all 4 blocks and still
      // meet via their rarer ones; the oracle applies the identical cap.
      val okBlocks = blocks.groupBy($"blk", $"bv")
        .agg(count(lit(1)).as("bpop"))
        .where($"bpop" <= lshBucketCap)
        .select($"blk", $"bv")
      val cappedBlocks = blocks.join(okBlocks, Seq("blk", "bv"))
      cappedBlocks.as("x")
        .join(cappedBlocks.as("y"),
          col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          expr("cast(bit_count(x.sim ^ y.sim) as int)").as("hamming"))
        .distinct()
        .where(col("hamming") <= 12)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some {
      val votes = (0 until 62).map { i =>
        val src = if (i < 31) s"(b1 >> $i)" else s"(b2 >> ${i - 31})"
        s"SUM(CASE WHEN ($src & 1) = 1 THEN 1 ELSE -1 END) AS b$i"
      }.mkString(",\n           |         ")
      val simBits = (0 until 62)
        .map(i => s"CASE WHEN b$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END")
        .mkString("\n           |         + ")
      val blockSelects = (0 until 4)
        .map(b => s"SELECT doc_id, sim, $b AS blk, (sim >> ${b * 16}) & 65535 AS bv FROM sig")
        .mkString("\n           |  UNION ALL ")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |th AS (
         |  SELECT doc_id,
         |         ${mhBaseDuck("w", 31, 7)} AS b1,
         |         ${mhBaseDuck("w", 37, 11)} AS b2
         |  FROM tok),
         |votes AS (
         |  SELECT doc_id,
         |         $votes
         |  FROM th GROUP BY 1),
         |sig AS (
         |  SELECT doc_id,
         |         $simBits AS sim
         |  FROM votes),
         |blocks AS (
         |  $blockSelects),
         |okb AS (
         |  SELECT blk, bv FROM blocks
         |  GROUP BY 1, 2 HAVING COUNT(*) <= $lshBucketCap),
         |cb AS (SELECT blocks.* FROM blocks JOIN okb USING (blk, bv))
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |       CAST(bit_count(xor(x.sim, y.sim)) AS INT) AS hamming
         |FROM cb x JOIN cb y
         |  ON x.blk = y.blk AND x.bv = y.bv AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sim, y.sim)) <= 12
         |ORDER BY doc_a, doc_b""".stripMargin
    })

  private[queries] val dotFold =
    "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  /** Brute-force exact cosine top-5 neighbors for the first 10 vectors:
    * the correctness baseline for similarity search. Cosine is a strict
    * left fold in doubles so the oracle (list_reduce) is bit-identical;
    * ranking ties break on neighbor id.
    */
  val extKnnBrute = Q(
    "ext_knn_cosine_brute",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
        .withColumn("nrm",
          expr(s"sqrt(${dotFold.format("e", "e")})"))
      val q = emb.where($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
      q.join(emb.select($"vec_id".as("nid"), $"e", $"nrm"),
          $"qid" =!= $"nid")
        .withColumn("cos",
          expr(dotFold.format("qe", "e")) / ($"qn" * $"nrm"))
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 5)
        .select($"qid", $"rank", $"nid", $"cos")
        .orderBy($"qid", $"rank")
    },
    Some("""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings),
           |n AS (
           |  SELECT vec_id, e,
           |         sqrt(list_reduce(list_transform(range(len(e)), i -> e[i+1]*e[i+1]), (a,b) -> a+b)) AS nrm
           |  FROM e),
           |p AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS nid,
           |         list_reduce(list_transform(range(len(q.e)), i -> q.e[i+1]*c.e[i+1]), (a,b) -> a+b)
           |           / (q.nrm * c.nrm) AS cos
           |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
           |SELECT qid, rank, nid, cos FROM (
           |  SELECT qid, nid, cos,
           |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS INT) AS rank
           |  FROM p)
           |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin))

  /** LSH-bucketed approximate neighbors: bucket = 8-bit sign pattern of
    * the first 8 dimensions (a fixed hyperplane family), candidates only
    * within the query's bucket — the scale path: the join is keyed on the
    * bucket, never all-pairs. Top-3 in-bucket by the same exact cosine.
    */
  val extKnnLsh = Q(
    "ext_knn_cosine_lsh",
    (s, dir) => {
      import s.implicits._
      val bucketExpr =
        "aggregate(sequence(0, 7), 0, (acc, i) -> acc + IF(e[i] > 0D, shiftleft(1, i), 0))"
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
        .withColumn("nrm", expr(s"sqrt(${dotFold.format("e", "e")})"))
        .withColumn("bucket", expr(bucketExpr))
      val q = emb.where($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"),
          $"bucket")
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
      q.join(emb.select($"vec_id".as("nid"), $"e", $"nrm", $"bucket"),
          Seq("bucket"))
        .where($"qid" =!= $"nid")
        .withColumn("cos",
          expr(dotFold.format("qe", "e")) / ($"qn" * $"nrm"))
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 3)
        .select($"qid", $"rank", $"nid", $"cos")
        .orderBy($"qid", $"rank")
    },
    Some("""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings),
           |n AS (
           |  SELECT vec_id, e,
           |         sqrt(list_reduce(list_transform(range(len(e)), i -> e[i+1]*e[i+1]), (a,b) -> a+b)) AS nrm,
           |         (CASE WHEN e[1] > 0 THEN 1 ELSE 0 END)
           |         + (CASE WHEN e[2] > 0 THEN 2 ELSE 0 END)
           |         + (CASE WHEN e[3] > 0 THEN 4 ELSE 0 END)
           |         + (CASE WHEN e[4] > 0 THEN 8 ELSE 0 END)
           |         + (CASE WHEN e[5] > 0 THEN 16 ELSE 0 END)
           |         + (CASE WHEN e[6] > 0 THEN 32 ELSE 0 END)
           |         + (CASE WHEN e[7] > 0 THEN 64 ELSE 0 END)
           |         + (CASE WHEN e[8] > 0 THEN 128 ELSE 0 END) AS bucket
           |  FROM e),
           |p AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS nid,
           |         list_reduce(list_transform(range(len(q.e)), i -> q.e[i+1]*c.e[i+1]), (a,b) -> a+b)
           |           / (q.nrm * c.nrm) AS cos
           |  FROM n q JOIN n c ON q.bucket = c.bucket
           |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
           |SELECT qid, rank, nid, cos FROM (
           |  SELECT qid, nid, cos,
           |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS INT) AS rank
           |  FROM p)
           |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin))

  /** Brute-force kNN again, but through the native Catalyst
    * [[graft.functions.CosineSimilarity]] expression (codegen'd primitive
    * loop instead of the higher-order-function chain) — bit-identical
    * results, so it shares the brute-force oracle.
    */
  val extKnnNative = Q(
    "ext_knn_cosine_native",
    (s, dir) => {
      import s.implicits._
      graft.functions.CosineSimilarity.register(s)
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      val q = emb.where($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"e".as("qe"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
      q.join(emb.select($"vec_id".as("nid"), $"e"), $"qid" =!= $"nid")
        .withColumn("cos", expr("cosine_sim(qe, e)"))
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 5)
        .select($"qid", $"rank", $"nid", $"cos")
        .orderBy($"qid", $"rank")
    },
    extKnnBrute.oracle)

  /** IVF (k-means inverted-file) approximate nearest neighbor — the
    * cluster-probing scale path next to the LSH-bucketed variant. The fit
    * is a deterministic Lloyd's loop (smallest-vec_id seeds, fixed
    * iterations, ordered-fold means — see [[graft.ext.Ivf]]), so the
    * WHOLE build+search replays in DuckDB and the row is hash-compared;
    * IvfSpec still measures recall against the brute-force baseline.
    */
  val extKnnIvf = Q(
    "ext_knn_cosine_ivf",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val index = graft.ext.Ivf.build(emb,
        k = graft.ScaleConfig.ivfK, iters = graft.ScaleConfig.lloydIters)
      graft.ext.Ivf
        .search(index, emb.where($"vec_id" < 10), topK = 5, nprobe = 4)
        .orderBy($"qid", $"rank")
    },
    Some(graft.ext.Ivf
      .duckOracleSql(k = graft.ScaleConfig.ivfK,
        iters = graft.ScaleConfig.lloydIters,
        maxQid = 10, topK = 5, nprobe = 4)))

  /** Scalar-int8-quantized cosine kNN (the memory-bandwidth scale path,
    * faiss-SQ8-style): per-vector symmetric quantization — scale =
    * max|x|/127, code = floor(x/scale + 0.5) ∈ [−127, 127] — then
    * candidates are scored by the INTEGER code dot product normalized by
    * the integer code norms. 4× smaller vectors (store codes + one scale)
    * and a vectorizable int inner loop replace the double fold on the
    * scan side; exact double cosine is emitted alongside so the row also
    * measures the quantization error (|qcos − cos| stays < 1e-2 here).
    * Every step is bit-portable: max/abs are exact, /,*,sqrt correctly
    * rounded from identical inputs, and the BIGINT sums are exact and
    * ORDER-FREE — no fold-ordering contortions needed, which is itself
    * the scale argument: integer accumulation commutes, so map-side
    * partial aggregation is safe at any parallelism. At 100 TB this
    * composes with the IVF/LSH bucketing (quantization cuts bytes/score,
    * bucketing cuts candidates).
    */
  val extKnnInt8 = Q(
    "ext_knn_cosine_int8",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
        .withColumn("scale",
          expr("aggregate(e, 0D, (m, x) -> greatest(m, abs(x))) / 127D"))
        .withColumn("q8",
          expr("transform(e, x -> cast(floor(x / scale + 0.5D) as bigint))"))
        .withColumn("qn",
          expr("sqrt(cast(aggregate(q8, 0L, (a, v) -> a + v * v) as double))"))
        .withColumn("nrm", expr(s"sqrt(${dotFold.format("e", "e")})"))
      val q = emb.where($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"e".as("qe"), $"q8".as("qq8"),
          $"qn".as("qqn"), $"nrm".as("qnrm"))
      val w = Window.partitionBy($"qid").orderBy($"qcos".desc, $"nid")
      q.join(emb.select($"vec_id".as("nid"), $"e", $"q8", $"qn", $"nrm"),
          $"qid" =!= $"nid")
        .withColumn("qcos",
          expr("cast(aggregate(zip_with(qq8, q8, (x, y) -> x * y), 0L, (a, v) -> a + v) as double)")
            / ($"qqn" * $"qn"))
        .withColumn("cos",
          expr(dotFold.format("qe", "e")) / ($"qnrm" * $"nrm"))
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 5)
        .select($"qid", $"rank", $"nid", $"qcos", $"cos")
        .orderBy($"qid", $"rank")
    },
    Some("""WITH e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           |  FROM embeddings),
           |sc AS (
           |  SELECT vec_id, e,
           |         list_reduce([CAST(0 AS DOUBLE)] || list_transform(e, x -> abs(x)),
           |                     (m, x) -> greatest(m, x)) / 127 AS scale
           |  FROM e),
           |c AS (
           |  SELECT vec_id, e,
           |         list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q8
           |  FROM sc),
           |n AS (
           |  SELECT vec_id, e, q8,
           |         sqrt(CAST(list_reduce(list_transform(q8, v -> v * v), (a,b) -> a+b) AS DOUBLE)) AS qn,
           |         sqrt(list_reduce(list_transform(range(len(e)), i -> e[i+1]*e[i+1]), (a,b) -> a+b)) AS nrm
           |  FROM c),
           |p AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS nid,
           |         CAST(list_reduce(list_transform(range(len(q.q8)), i -> q.q8[i+1]*c.q8[i+1]), (a,b) -> a+b) AS DOUBLE)
           |           / (q.qn * c.qn) AS qcos,
           |         list_reduce(list_transform(range(len(q.e)), i -> q.e[i+1]*c.e[i+1]), (a,b) -> a+b)
           |           / (q.nrm * c.nrm) AS cos
           |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
           |SELECT qid, rank, nid, qcos, cos FROM (
           |  SELECT qid, nid, qcos, cos,
           |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY qcos DESC, nid) AS INT) AS rank
           |  FROM p)
           |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin))

  /** Embedding-cosine near-dup pairs (the fifth dedup family member):
    * candidates from [[graft.ext.SignLsh]] multi-band random-hyperplane
    * LSH — 16 bands × 16 bits (256 deterministic hyperplanes), so each
    * band hashes into 65 536 buckets and in-band population stays bounded
    * (vs the round-1 single 8-bit bucket whose in-bucket all-pairs grew as
    * (N/256)²) — then exact fold-cosine ≥ 0.35 confirms. The threshold is
    * calibrated to this corpus (max pairwise cosine ≈ 0.51; true dups
    * would sit near 1.0, where banded collision probability is ≈ 96 %).
    * Band buckets above [[lshBucketCap]] are additionally dropped before
    * the self-join (replicated in the oracle): wide keys bound bucket
    * population for DISTRIBUTED embeddings, but a degenerate corpus
    * (many identical/zero vectors) still concentrates one bucket — the
    * cap makes this member uniformly hot-key-safe with the rest of the
    * family. The oracle replicates the exact LCG hyperplane family in
    * SQL.
    */
  val extDedupEmbedding = Q(
    "ext_dedup_embedding_cosine",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
        .withColumn("nrm", expr(s"sqrt(${dotFold.format("e", "e")})"))
      val cand = graft.ext.SignLsh.candidatePairs(
        emb, "vec_id", "e", dim = 64,
        bands = graft.ScaleConfig.signLshBands,
        rowsPerBand = graft.ScaleConfig.signLshRowsPerBand,
        bucketCap = Some(lshBucketCap))
      cand
        .join(emb.select($"vec_id".as("id_a"), $"e".as("ea"),
          $"nrm".as("na")), Seq("id_a"))
        .join(emb.select($"vec_id".as("id_b"), $"e".as("eb"),
          $"nrm".as("nb")), Seq("id_b"))
        .withColumn("cos",
          expr(dotFold.format("ea", "eb")) / ($"na" * $"nb"))
        .where($"cos" >= 0.35)
        .select($"id_a", $"id_b", $"cos")
        .orderBy($"id_a", $"id_b")
    },
    Some(s"""WITH e AS (
            |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            |  FROM embeddings),
            |n AS (
            |  SELECT vec_id, e,
            |         sqrt(list_reduce(list_transform(range(len(e)), i -> e[i+1]*e[i+1]), (a,b) -> a+b)) AS nrm,
            |         ${graft.ext.SignLsh.duckBitsExpr("e", 64,
                graft.ScaleConfig.signLshBands
                  * graft.ScaleConfig.signLshRowsPerBand)} AS bits
            |  FROM e),
            |sig AS (
            |  SELECT vec_id, e, nrm,
            |         ${graft.ext.SignLsh.duckBandsExpr("bits",
                graft.ScaleConfig.signLshBands,
                graft.ScaleConfig.signLshRowsPerBand)} AS bands
            |  FROM n),
            |bnd0 AS (
            |  SELECT vec_id, ub.band AS band, bands[ub.band + 1] AS bh
            |  FROM sig, (SELECT unnest(range(${graft.ScaleConfig.signLshBands})) AS band) ub),
            |okb AS (
            |  SELECT band, bh FROM bnd0
            |  GROUP BY 1, 2 HAVING COUNT(*) <= $lshBucketCap),
            |bnd AS (
            |  SELECT bnd0.* FROM bnd0 JOIN okb USING (band, bh)),
            |cand AS (
            |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
            |  FROM bnd x JOIN bnd y
            |    ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id)
            |SELECT id_a, id_b,
            |       list_reduce(list_transform(range(len(a.e)), i -> a.e[i+1]*b.e[i+1]), (x,y) -> x+y)
            |         / (a.nrm * b.nrm) AS cos
            |FROM cand JOIN sig a ON cand.id_a = a.vec_id
            |          JOIN sig b ON cand.id_b = b.vec_id
            |WHERE list_reduce(list_transform(range(len(a.e)), i -> a.e[i+1]*b.e[i+1]), (x,y) -> x+y)
            |         / (a.nrm * b.nrm) >= 0.35
            |ORDER BY id_a, id_b""".stripMargin))

  /** Text quality scoring: word count, distinct-word ratio, average word
    * length, stopword ratio — all integer-derived, deterministic.
    */
  val extTextQuality = Q(
    "ext_text_quality",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"), $"text", $"n_chars")
        .select($"doc_id",
          size($"w").as("n_words"),
          (size(array_distinct($"w")).cast("double") / size($"w"))
            .as("distinct_ratio"),
          (length(regexp_replace($"text", " ", "")).cast("double")
            / size($"w")).as("avg_word_len"),
          (size(expr(
            s"filter(w, x -> x IN ($stopSqlList))")).cast("double")
            / size($"w")).as("stopword_ratio"))
        .orderBy($"doc_id")
    },
    Some(s"""SELECT doc_id,
            |       CAST(len(s) AS INT) AS n_words,
            |       CAST(len(list_distinct(s)) AS DOUBLE) / len(s) AS distinct_ratio,
            |       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(s) AS avg_word_len,
            |       CAST(len(list_filter(s, x -> x IN ($stopSqlList))) AS DOUBLE) / len(s) AS stopword_ratio
            |FROM (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents)
            |ORDER BY doc_id""".stripMargin))

  /** Language-ID heuristic: stopword-hit ratio against an English
    * function-word list → 'en' / 'und' verdict per doc, plus corpus-level
    * counts per verdict.
    */
  val extLangId = Q(
    "ext_text_langid",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .select($"doc_id",
          (size(expr(s"filter(w, x -> x IN ($stopSqlList))"))
            .cast("double") / size($"w")).as("score"))
        .select($"doc_id", $"score",
          when($"score" >= 0.02, "en").otherwise("und").as("lang_pred"))
        .orderBy($"doc_id")
    },
    Some(s"""SELECT doc_id, score,
            |       CASE WHEN score >= 0.02 THEN 'en' ELSE 'und' END AS lang_pred
            |FROM (SELECT doc_id,
            |             CAST(len(list_filter(s, x -> x IN ($stopSqlList))) AS DOUBLE) / len(s) AS score
            |      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
            |ORDER BY doc_id""".stripMargin))

  /** Top-3 non-stopword terms per source: tokenize → explode → count →
    * ranking window (map-side partial counts, one shuffle on
    * (source, word), one on source).
    */
  val extTopTerms = Q(
    "ext_top_terms_per_source",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy($"cnt".desc, $"word")
      t(s, dir, "documents")
        .select($"source", explode(split($"text", " ")).as("word"))
        .where(!$"word".isin(stopwords: _*))
        .groupBy($"source", $"word").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w))
        .where($"rank" <= 3)
        .select($"source", $"rank", $"word", $"cnt")
        .orderBy($"source", $"rank")
    },
    Some(s"""SELECT source, rank, word, cnt FROM (
            |  SELECT source, word, cnt,
            |         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS INT) AS rank
            |  FROM (SELECT source, word, COUNT(*) AS cnt
            |        FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
            |        WHERE word NOT IN ($stopSqlList)
            |        GROUP BY 1, 2))
            |WHERE rank <= 3 ORDER BY source, rank""".stripMargin))

  /** Pure range join (no equi key) via bin-bucketing
    * ([[graft.ext.RangeJoin]]): events matched to supplier "value bands"
    * [s_acctbal/25 − 5, s_acctbal/25 + 5] by value containment, then
    * aggregated per event. The oracle is the naive BETWEEN theta join —
    * binning is internal and provably lossless.
    */
  val extRangeJoin = Q(
    "ext_range_join",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_id", $"value")
      val bands = t(s, dir, "supplier")
        .select($"s_suppkey",
          ($"s_acctbal" / 25 - 5).as("lo"),
          ($"s_acctbal" / 25 + 5).as("hi"))
      graft.ext.RangeJoin.binned(ev, "value", bands, "lo", "hi", 10.0)
        .groupBy($"event_id")
        .agg(count(lit(1)).as("n_bands"),
          min($"s_suppkey").as("min_supp"),
          max($"s_suppkey").as("max_supp"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, COUNT(*) AS n_bands,
           |       MIN(s_suppkey) AS min_supp, MAX(s_suppkey) AS max_supp
           |FROM events
           |JOIN (SELECT s_suppkey, s_acctbal / 25 - 5 AS lo,
           |             s_acctbal / 25 + 5 AS hi FROM supplier) b
           |  ON value >= b.lo AND value <= b.hi
           |GROUP BY 1 ORDER BY event_id""".stripMargin))

  /** C4-style document quality filter: composite keep/drop verdict with
    * the first failing rule as the reason — the decision layer on top of
    * ext_text_quality's metrics.
    */
  val extTextFilter = Q(
    "ext_text_filter",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"), $"text")
        .select($"doc_id",
          size($"w").as("n_words"),
          (length(regexp_replace($"text", " ", "")).cast("double")
            / size($"w")).as("awl"),
          (size(expr(s"filter(w, x -> x IN ($stopSqlList))")).cast("double")
            / size($"w")).as("swr"))
        .select($"doc_id",
          when($"n_words" < 10, "too_few_words")
            .when($"awl" < 3.0 || $"awl" > 12.0, "bad_word_length")
            .when($"swr" < 0.01, "no_function_words")
            .otherwise("keep").as("verdict"))
        .orderBy($"doc_id")
    },
    Some(s"""SELECT doc_id,
            |       CASE WHEN n_words < 10 THEN 'too_few_words'
            |            WHEN awl < 3.0 OR awl > 12.0 THEN 'bad_word_length'
            |            WHEN swr < 0.01 THEN 'no_function_words'
            |            ELSE 'keep' END AS verdict
            |FROM (SELECT doc_id,
            |             CAST(len(s) AS INT) AS n_words,
            |             CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(s) AS awl,
            |             CAST(len(list_filter(s, x -> x IN ($stopSqlList))) AS DOUBLE) / len(s) AS swr
            |      FROM (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents))
            |ORDER BY doc_id""".stripMargin))

  /** Gap-based sessionization (30-min inactivity): the classic streaming
    * session-window computed in batch — lag diff → session-start flags →
    * running sum as session index → per-session aggregates. One
    * hash-partition shuffle on user_id.
    */
  val extSessionize = Q(
    "ext_sessionize_events",
    (s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id")
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
        .withColumn("new_sess",
          when($"prev_us".isNull
            || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_idx",
          sum($"new_sess").over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("session_start"),
          max($"ts").as("session_end"))
        .orderBy($"user_id", $"session_idx")
    },
    Some("""WITH flagged AS (
           |  SELECT user_id, event_id, ts,
           |         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
           |              THEN 1 ELSE 0 END AS new_sess
           |  FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           |               LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
           |                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
           |        FROM events)),
           |sess AS (
           |  SELECT user_id, event_id, ts,
           |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           |  FROM flagged)
           |SELECT user_id, session_idx, COUNT(*) AS n_events,
           |       MIN(ts) AS session_start, MAX(ts) AS session_end
           |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin))

  /** Multimodal binary-column features via a REAL header decode: each
    * document's bytes are wrapped in a crafted PNG (even doc_id) or JPEG
    * (odd) container whose header carries dimensions derived from
    * doc_id, and [[graft.ext.Multimodal.decodeMedia]] recovers format +
    * width + height by PARSING the container bytes (PNG IHDR / JPEG SOF0
    * — public layouts) in the mapPartitions decode stage. The oracle
    * replicates the FIXTURE contract arithmetically (it cannot parse
    * binaries): 1 + id%512 × 1 + id%384, and the containers' exact byte
    * overhead (PNG 57, JPEG 27 + COM cap). A decoder that shortcut the
    * formula instead of reading bytes would pass — the spec half
    * (MultimodalSpec) pins real parsing via malformed/truncated inputs
    * and hand-built headers the formula cannot predict.
    */
  val extMultimodal = Q(
    "ext_multimodal_features",
    (s, dir) => {
      import s.implicits._
      graft.ext.Multimodal.decodeMedia(
        graft.ext.Multimodal.withMediaBinary(t(s, dir, "documents")))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
           |       CAST(1 + doc_id % 512 AS INT) AS width,
           |       CAST(1 + doc_id % 384 AS INT) AS height,
           |       CAST(CASE WHEN doc_id % 2 = 0
           |                 THEN 57 + octet_length(encode(text))
           |                 ELSE 27 + LEAST(octet_length(encode(text)), 60000)
           |            END AS INT) AS n_bytes
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** The raw events parquet schema EXACTLY as the file-stream source will
    * see it — probed from the actual file, never hard-coded: the driver has
    * regenerated events.parquet with different `ts` encodings across rounds
    * (TIMESTAMP(NANOS) → long under nanosAsLong; TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TIMESTAMP_NTZ; plain TIMESTAMP). One batch
    * read of the footer (metadata-only) keeps the stream schema in lock-step
    * with whatever encoding is on disk; [[normalizeStreamTs]] then maps any
    * of the three to µs TimestampType, mirroring [[graft.Tables.load]].
    */
  private[graft] def eventsStreamSchema(
      s: SparkSession, dir: String): org.apache.spark.sql.types.StructType =
    s.read.parquet(s"$dir/events.parquet").schema

  /** Stream-side twin of [[graft.Tables.load]]'s `ts` normalization:
    * long-nanos → µs timestamp; TIMESTAMP_NTZ → TimestampType (UTC
    * session, value-preserving); TimestampType passes through.
    */
  private[graft] def normalizeStreamTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** The file-stream source requires a directory: expose the single
    * events.parquet through a deterministic per-(sfDir, tag) link dir
    * (reused across invocations — no temp-dir leak per run); fall back
    * to a copy on filesystems without symlink support. `copies` > 1
    * presents the same file multiple times — the duplicate feed for the
    * streaming-dedup surface.
    */
  private[queries] def streamSourceDir(dir: String, tag: String, copies: Int = 1)
      : String = {
    val streamDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), s"graft_stream_$tag",
      dir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(streamDir)
    val target = java.nio.file.Paths.get(s"$dir/events.parquet")
    (0 until copies).foreach { i =>
      val link = streamDir.resolve(s"events_$i.parquet")
      if (!java.nio.file.Files.exists(link)) {
        try java.nio.file.Files.createSymbolicLink(link, target)
        catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            java.nio.file.Files.copy(target, link)
        }
      }
    }
    streamDir.toString
  }

  /** Multimodal frame sampling, header-driven
    * ([[graft.ext.Multimodal.sampleMediaFrames]]): each crafted media
    * container's opaque body is sliced into frames whose width the
    * DECODER reads from the real PNG IHDR / JPEG SOF header — never
    * from the fixture formula — and every 4th frame lands with its
    * checksum, one row per frame, streamed, never collected. The
    * ORACLE replicates the fixture's published contract arithmetically
    * (width = 1 + doc_id % 512; body = the text bytes, JPEG capped at
    * the COM segment's 60000-byte limit; pure-ASCII corpus makes
    * DuckDB's string substring byte-identical): a decoder that
    * misparsed one header would slice every frame of that document
    * wrong and break the hash.
    */
  val extMultimodalFrames = Q(
    "ext_multimodal_frames",
    (s, dir) => {
      import s.implicits._
      graft.ext.Multimodal.sampleMediaFrames(
        graft.ext.Multimodal.withMediaBinary(t(s, dir, "documents")))
        .orderBy($"doc_id", $"frame_idx")
    },
    Some("""SELECT doc_id, CAST(i AS INT) AS frame_idx,
           |       md5(substring(body, CAST(i * w + 1 AS INT), w)) AS checksum
           |FROM (SELECT doc_id, body, w,
           |             unnest(range(0, CAST(CEIL(octet_length(encode(body)) * 1.0 / w) AS BIGINT), 4)) AS i
           |      FROM (SELECT doc_id, CAST(1 + doc_id % 512 AS INT) AS w,
           |                   CASE WHEN doc_id % 2 = 0 THEN text
           |                        ELSE substring(text, 1, 60000) END AS body
           |            FROM documents)
           |      WHERE octet_length(encode(body)) > 0)
           |ORDER BY doc_id, frame_idx""".stripMargin))

  /** Structured Streaming: tumbling 5-minute windows × event_type driven
    * to completion over the static events parquet (complete mode, memory
    * sink). The oracle reproduces the windows with time_bucket — both
    * engines align buckets to midnight so the 5-minute grids coincide.
    */
  val extStreamWindowCounts = Q(
    "ext_stream_window_counts",
    (s, dir) => {
      import s.implicits._
      val name = "stream_counts_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, streamSourceDir(dir, "counts"), eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.windowedEventCounts(
          normalizeStreamTs(df)),
        name, statePartitions = Some(8))
        .select($"window.start".as("window_start"),
          $"window.end".as("window_end"),
          $"event_type", $"n_events",
          $"sum_value".cast("double").as("sum_value"))
        .orderBy($"window_start", $"event_type")
    },
    Some("""SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS window_start,
           |       time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) + INTERVAL 5 MINUTE AS window_end,
           |       event_type, COUNT(*) AS n_events,
           |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin))

  /** Spark's NATIVE session-window operator (session_window, batch form —
    * the same column works under streaming): 30-min-gap sessions per
    * user. Semantics differ from the lag-based [[extSessionize]] at a gap
    * of EXACTLY 30 min (session_window closes at gap ≥ window, the lag
    * formulation at gap > window), so the oracle uses `>=`; window end
    * is last-event-ts + gap by definition.
    */
  val extSessionWindow = Q(
    "ext_session_window",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("session_start"),
          $"w.end".as("session_end"), $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH flagged AS (
           |  SELECT user_id, event_id, ts,
           |         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us >= 1800000000
           |              THEN 1 ELSE 0 END AS new_sess
           |  FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           |               LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
           |                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
           |        FROM events)),
           |sess AS (
           |  SELECT user_id, ts,
           |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           |  FROM flagged)
           |SELECT user_id, MIN(ts) AS session_start,
           |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           |       COUNT(*) AS n_events
           |FROM sess GROUP BY user_id, session_idx
           |ORDER BY user_id, session_start""".stripMargin))

  /** Structured Streaming SLIDING windows (10-min window, 5-min slide):
    * every event lands in exactly two overlapping windows. The oracle
    * replicates via two shifted 5-min buckets per event.
    */
  val extStreamSlidingCounts = Q(
    "ext_stream_sliding_counts",
    (s, dir) => {
      import s.implicits._
      val name = "stream_sliding_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, streamSourceDir(dir, "sliding"), eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.windowedEventCounts(
          normalizeStreamTs(df),
          "10 minutes", "10 minutes", slide = Some("5 minutes")),
        name, statePartitions = Some(8))
        .select($"window.start".as("window_start"),
          $"window.end".as("window_end"),
          $"event_type", $"n_events",
          $"sum_value".cast("double").as("sum_value"))
        .orderBy($"window_start", $"event_type")
    },
    Some("""SELECT ws AS window_start, ws + INTERVAL 10 MINUTE AS window_end,
           |       event_type, COUNT(*) AS n_events,
           |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |FROM (SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP))
           |               - k.k * INTERVAL 5 MINUTE AS ws,
           |             event_type, value
           |      FROM events, (SELECT unnest([0, 1]) AS k) k)
           |GROUP BY 1, 2, 3
           |ORDER BY window_start, event_type""".stripMargin))

  /** Structured Streaming stateful sessionization
    * ([[graft.streaming.StreamOps.sessionize]],
    * flatMapGroupsWithState, append mode): 30-min-gap sessions emitted
    * when a later event closes them. With the whole parquet arriving as
    * one batch, the per-user event list is processed sorted by
    * (ts, event_id) — exactly the batch ext_sessionize semantics — and
    * each user's final session stays open in state, so the
    * batch-equivalent oracle is the sessionize SQL minus each user's
    * last session (QUALIFY session_idx < max).
    */
  val extStreamSessionize = Q(
    "ext_stream_sessionize",
    (s, dir) => {
      import s.implicits._
      val name = "stream_sessions_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, streamSourceDir(dir, "sessions"), eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.sessionize(
          normalizeStreamTs(df)
            .select($"user_id", $"event_id", $"ts")
            .as[graft.streaming.StreamOps.Event]).toDF(),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8))
        .select($"user_id", $"session_start", $"session_end", $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH flagged AS (
           |  SELECT user_id, event_id, ts,
           |         CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
           |              THEN 1 ELSE 0 END AS new_sess
           |  FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           |               LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
           |                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
           |        FROM events)),
           |sess AS (
           |  SELECT user_id, event_id, ts,
           |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           |  FROM flagged),
           |agg AS (
           |  SELECT user_id, session_idx, COUNT(*) AS n_events,
           |         MIN(ts) AS session_start, MAX(ts) AS session_end
           |  FROM sess GROUP BY 1, 2)
           |SELECT user_id, session_start, session_end, n_events
           |FROM agg
           |QUALIFY session_idx < MAX(session_idx) OVER (PARTITION BY user_id)
           |ORDER BY user_id, session_start""".stripMargin))

  /** Structured Streaming exact dedup
    * ([[graft.streaming.StreamOps.dedupStream]],
    * dropDuplicatesWithinWatermark, append mode): the source presents the
    * events file TWICE (two links in the stream dir), the stream drops
    * the duplicate ids, and the batch-equivalent oracle is simply the
    * events table — each id once.
    */
  /** Two-micro-batch feed for the late-data query: batch 1 (older mtime,
    * processed first) holds the LATER half of events so it drives the
    * watermark high; batch 2 holds the earlier half, so every one of its
    * rows arrives far behind that watermark. Files are REWRITTEN from the
    * normalized table (ts already TimestampType), making the feed's
    * schema self-describing whatever parquet encoding the driver shipped
    * this round. Built once per (sfDir), reused across invocations.
    */
  /** Content fingerprint of a parquet file-or-directory (size + mtime of
    * every data file): the staged-feed cache below must key on WHAT the
    * events table contains, not just where it lives — the driver
    * regenerates events.parquet in place across rounds, and a cache
    * keyed on the path alone would keep serving the previous round's
    * rows while the oracle reads the current table.
    */
  private def contentFingerprint(p: java.nio.file.Path): String = {
    import scala.jdk.CollectionConverters._
    val parts =
      if (java.nio.file.Files.isDirectory(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .toSeq.sortBy(_.toString)
        finally walk.close()
      } else Seq(p)
    val sig = parts.map(f => s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}").mkString("|")
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  /** Two-batch staged feed split at `split`: `lateFirst = true` stages
    * the LATER half as batch 1 (the late-data scenario — batch 2's rows
    * arrive behind the watermark); `false` stages in event-time order
    * (the restart-recovery scenario — no late data, the interesting
    * part is the boundary window spanning the two batches). */
  private def splitFeedDir(s: SparkSession, dir: String, split: String,
      tag: String, lateFirst: Boolean): String = {
    val fp = contentFingerprint(java.nio.file.Paths.get(s"$dir/events.parquet"))
    val out = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), s"graft_stream_$tag",
      dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + fp)
    val b1 = out.resolve("batch1.parquet")
    val b2 = out.resolve("batch2.parquet")
    if (!(java.nio.file.Files.exists(b1) && java.nio.file.Files.exists(b2))) {
      java.nio.file.Files.createDirectories(out)
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      def writeOne(df: DataFrame, dst: java.nio.file.Path,
          mtimeMs: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_late")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .filter(f => f.getName.startsWith("part-")
            && f.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // the file source replays oldest-mtime first: the mtimes ARE the
        // batch order
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val later = ev.where(col("ts") >= lit(split).cast("timestamp"))
      val earlier = ev.where(col("ts") < lit(split).cast("timestamp"))
      writeOne(if (lateFirst) later else earlier, b1, 1000000L)
      writeOne(if (lateFirst) earlier else later, b2, 2000000L)
    }
    out.toString
  }

  private def lateFeedDir(s: SparkSession, dir: String, split: String)
      : String = splitFeedDir(s, dir, split, "late", lateFirst = true)

  /** Structured Streaming LATE-DATA DROP: the feed presents the later
    * half of January first (one file per trigger), establishing a
    * watermark of max(ts) − 1 h; the second micro-batch then delivers
    * the earlier half — every row of it weeks behind the watermark, so
    * the windowed aggregation must DROP all of them, and append mode
    * must emit exactly the batch-1 windows the watermark closed (window
    * end ≤ watermark; later windows die unemitted in state). The oracle
    * reconstructs precisely that set relationally — a single late row
    * leaking in, or an unclosed window leaking out, breaks the hash.
    */
  val extStreamLateDrop = Q(
    "ext_stream_late_drop",
    (s, dir) => {
      import s.implicits._
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val split = "2024-01-16 00:00:00"
      val staged = lateFeedDir(s, dir, split)
      // fresh feed dir per run: stage 1 drops in the later half (the
      // drain commits its watermark), stage 2 the earlier = late half
      val feed = Paths.get(staged, "feed")
      if (Files.exists(feed)) {
        val ls = Files.list(feed)
        try ls.forEach(p => Files.delete(p)) finally ls.close()
      }
      Files.createDirectories(feed)
      def drop(n: String): () => Unit = () => {
        Files.copy(Paths.get(staged, n), feed.resolve(n),
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
      val schema = s.read.parquet(s"$staged/batch1.parquet").schema
      val name = "stream_late_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runStaged(
        s, feed.toString, schema,
        df => graft.streaming.StreamOps.windowedEventCounts(
          df, "5 minutes", "1 hour"),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8),
        stages = Seq(drop("batch1.parquet"), drop("batch2.parquet")))
        .select($"window.start".as("window_start"),
          $"window.end".as("window_end"),
          $"event_type", $"n_events",
          $"sum_value".cast("double").as("sum_value"))
        .orderBy($"window_start", $"event_type")
    },
    Some("""WITH b1 AS (
           |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
           |  FROM events
           |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'),
           |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM b1)
           |SELECT window_start, window_start + INTERVAL 5 MINUTE AS window_end,
           |       event_type, n_events, sum_value
           |FROM (
           |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           |         event_type, COUNT(*) AS n_events,
           |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |  FROM b1 GROUP BY 1, 2)
           |WHERE window_start + INTERVAL 5 MINUTE <= (SELECT w FROM wm)
           |ORDER BY window_start, event_type""".stripMargin))

  /** Structured Streaming CHECKPOINT RESTART ([[graft.streaming
    * .StreamOps.runWithRestart]]): the windowed aggregation runs as TWO
    * query incarnations over one checkpoint + parquet sink — batch 1
    * (events before an off-grid split instant), STOP, cold restart,
    * batch 2 (the rest). Exactly-once across the restart is the whole
    * claim: the recovered incarnation must neither re-emit batch 1's
    * windows (seen-files log + sink metadata) nor mis-count the
    * boundary window whose rows SPAN the restart (state-store
    * recovery — the split is deliberately not on the 5-minute grid).
    * The oracle is the single-run emission set: any duplicate, dropped
    * row, or split-brained boundary window breaks the hash.
    */
  val extStreamRestartRecovery = Q(
    "ext_stream_restart_recovery",
    (s, dir) => {
      import s.implicits._
      import java.nio.file.{Files, Paths, StandardCopyOption}
      import scala.jdk.CollectionConverters._
      val split = "2024-01-16 00:02:30" // off the 5-min grid on purpose
      val staged = splitFeedDir(s, dir, split, "restart", lateFirst = false)
      val base = Paths.get(System.getProperty("java.io.tmpdir", "/tmp"),
        "graft_stream_restart_run", dir.replaceAll("[^A-Za-z0-9]", "_"))
      def rmTree(p: java.nio.file.Path): Unit =
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          val paths =
            try walk.iterator().asScala.toSeq.reverse
            finally walk.close()
          paths.foreach(Files.delete)
        }
      rmTree(base) // fresh sink + checkpoint + feed per run
      val feed = base.resolve("feed")
      Files.createDirectories(feed)
      def drop(n: String): () => Unit = () => {
        Files.copy(Paths.get(staged, n), feed.resolve(n),
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
      val schema = s.read.parquet(s"$staged/batch1.parquet").schema
      graft.streaming.StreamOps.runWithRestart(
        s, feed.toString, schema,
        df => graft.streaming.StreamOps.windowedEventCounts(
            df, "5 minutes", "1 hour")
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n_events"),
            col("sum_value").cast("double").as("sum_value")),
        base.resolve("data").toString, base.resolve("ckpt").toString,
        statePartitions = Some(8),
        stagesBeforeRestart = Seq(drop("batch1.parquet")),
        stagesAfterRestart = Seq(drop("batch2.parquet")))
        .orderBy($"window_start", $"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
           |  FROM events),
           |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM ev)
           |SELECT window_start, window_start + INTERVAL 5 MINUTE AS window_end,
           |       event_type, n_events, sum_value
           |FROM (
           |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           |         event_type, COUNT(*) AS n_events,
           |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |  FROM ev GROUP BY 1, 2)
           |WHERE window_start + INTERVAL 5 MINUTE <= (SELECT w FROM wm)
           |ORDER BY window_start, event_type""".stripMargin))

  val extStreamDedup = Q(
    "ext_stream_dedup",
    (s, dir) => {
      import s.implicits._
      val name = "stream_dedup_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, streamSourceDir(dir, "dedup", copies = 2), eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.dedupStream(
          normalizeStreamTs(df)),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8))
        .select($"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id, event_type, value
           |FROM events ORDER BY event_id""".stripMargin))

  /** Stream-static enrichment ([[graft.streaming.StreamOps
    * .enrichWithDim]]): the event stream joins the bounded customer
    * dimension per micro-batch (broadcast — the stream never shuffles
    * for the lookup) and aggregates per (segment, event type). Complete
    * mode; after the drain the result equals the batch join, which is
    * exactly what the oracle checks.
    */
  val extStreamEnrich = Q(
    "ext_stream_enrich",
    (s, dir) => {
      import s.implicits._
      val name = "stream_enrich_" + math.abs(dir.hashCode).toString
      val dim = t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
      // no ts conversion: the enrichment is key-based, not event-time
      graft.streaming.StreamOps.runToCompletion(
        s, streamSourceDir(dir, "enrich"), eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.enrichWithDim(df, dim),
        name, statePartitions = Some(8))
        .select($"c_mktsegment", $"event_type", $"n_events",
          $"sum_value".cast("double").as("sum_value"))
        .orderBy($"c_mktsegment", $"event_type")
    },
    Some("""SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
           |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY c_mktsegment, event_type
           |ORDER BY c_mktsegment, event_type""".stripMargin))

  /** Spark's NATIVE session_window under STREAMING (the batch twin is
    * ext_session_window): 30-min-gap sessions per user with a 1-hour
    * watermark, append mode — a session is emitted only when the
    * watermark passes its END (last event + gap). The whole feed lands
    * in one micro-batch under watermark 0 (nothing dropped), the
    * watermark then advances to max(ts) − 1 h, and the no-data batch
    * flushes exactly the sessions closed below it; later sessions die
    * unemitted in state. The oracle reconstructs that emission set
    * relationally: the batch sessionization filtered to
    * session_end ≤ max(ts) − 1 h (with session_window's ≥-gap split
    * semantics, same as the batch oracle).
    */
  val extStreamSessionWindow = Q(
    "ext_stream_session_window",
    (s, dir) => {
      import s.implicits._
      val name = "stream_sesswin_" + math.abs(dir.hashCode).toString
      graft.streaming.StreamOps.runToCompletion(
        s, streamSourceDir(dir, "sesswin"), eventsStreamSchema(s, dir),
        df => normalizeStreamTs(df)
          .withWatermark("ts", "1 hour")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events")),
        name, org.apache.spark.sql.streaming.OutputMode.Append,
        statePartitions = Some(8))
        .select($"user_id", $"w.start".as("session_start"),
          $"w.end".as("session_end"), $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH ev AS (
           |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
           |  FROM events),
           |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM ev),
           |flagged AS (
           |  SELECT user_id, event_id, ts,
           |         CASE WHEN prev_us IS NULL
           |                   OR epoch_us(ts) - prev_us >= 1800000000
           |              THEN 1 ELSE 0 END AS new_sess
           |  FROM (SELECT user_id, event_id, ts,
           |               LAG(epoch_us(ts)) OVER
           |                 (PARTITION BY user_id ORDER BY ts, event_id)
           |                 AS prev_us
           |        FROM ev)),
           |sess AS (
           |  SELECT user_id, ts,
           |         CAST(SUM(new_sess) OVER (PARTITION BY user_id
           |               ORDER BY ts, event_id
           |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
           |  FROM flagged)
           |SELECT user_id, MIN(ts) AS session_start,
           |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           |       COUNT(*) AS n_events
           |FROM sess GROUP BY user_id, session_idx
           |HAVING MAX(ts) + INTERVAL 30 MINUTE <= (SELECT w FROM wm)
           |ORDER BY user_id, session_start""".stripMargin))

  /** Structured Streaming through a PARQUET FILE SINK
    * ([[graft.streaming.StreamOps.runToFileSink]]): the same 5-minute
    * windowed aggregation as ext_stream_window_counts, but append mode
    * writing real files with the sink's `_spark_metadata` exactly-once
    * log — the deployment pattern, proving the memory-sink harness the
    * other stream queries use is an observation convenience, not
    * load-bearing. Append emits only watermark-finalized windows: the
    * whole feed lands in one micro-batch (watermark 0 — nothing
    * dropped), the watermark then advances to max(ts) − 1 h, and the
    * no-data batch flushes every window whose END ≤ that watermark to
    * parquet; the last hour's windows die unemitted in state. The
    * oracle reconstructs exactly that set relationally. Sink +
    * checkpoint are recreated fresh per run — a stale `_spark_metadata`
    * from a previous run would mask the new files.
    */
  val extStreamFileSink = Q(
    "ext_stream_file_sink",
    (s, dir) => {
      import s.implicits._
      import scala.jdk.CollectionConverters._
      val base = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir", "/tmp"),
        "graft_stream_file_sink", dir.replaceAll("[^A-Za-z0-9]", "_"))
      def rmTree(p: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          val paths =
            try walk.iterator().asScala.toSeq.reverse
            finally walk.close()
          paths.foreach(java.nio.file.Files.delete)
        }
      rmTree(base)
      val result = graft.streaming.StreamOps.runToFileSink(
        s, streamSourceDir(dir, "filesink"), eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.windowedEventCounts(
            normalizeStreamTs(df), "5 minutes", "1 hour")
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n_events"),
            col("sum_value").cast("double").as("sum_value")),
        base.resolve("data").toString, base.resolve("ckpt").toString,
        statePartitions = Some(8))
      result.orderBy($"window_start", $"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
           |  FROM events),
           |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM ev)
           |SELECT window_start, window_start + INTERVAL 5 MINUTE AS window_end,
           |       event_type, n_events, sum_value
           |FROM (
           |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           |         event_type, COUNT(*) AS n_events,
           |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |  FROM ev GROUP BY 1, 2)
           |WHERE window_start + INTERVAL 5 MINUTE <= (SELECT w FROM wm)
           |ORDER BY window_start, event_type""".stripMargin))

  /** As-of join (point-in-time): each event matched to the user's most
    * recent order at event time — [[graft.ext.AsOfJoin]]'s union +
    * carry-forward-window composition (one shuffle). Oracle: DuckDB's
    * native ASOF LEFT JOIN. Orders are pre-deduped to one per
    * (user, date) — required for well-defined tie semantics.
    */
  val extAsOfJoin = Q(
    "ext_asof_join",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .groupBy($"o_custkey".as("user_id"),
          $"o_orderdate".as("order_ts"))
        .agg(max($"o_orderkey").as("order_id"))
      val events = t(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"ts")
      graft.ext.AsOfJoin
        .leftAsOf(events, orders, "user_id", "ts", "order_ts")
        .orderBy($"event_id")
    },
    Some("""WITH o AS (
           |  SELECT o_custkey AS user_id, o_orderdate AS order_ts,
           |         MAX(o_orderkey) AS order_id
           |  FROM orders GROUP BY 1, 2),
           |e AS (SELECT event_id, user_id, event_type,
           |             CAST(ts AS TIMESTAMP) AS ts FROM events)
           |SELECT e.event_id, e.user_id, e.event_type, e.ts,
           |       o.order_id, o.order_ts AS asof_order_ts
           |FROM e ASOF LEFT JOIN o
           |  ON e.user_id = o.user_id AND e.ts >= o.order_ts
           |ORDER BY event_id""".stripMargin))

  /** HyperLogLog++ approximate cardinality (vocabulary size per source)
    * next to the exact count. HLL register-merge is commutative, so the
    * estimate is deterministic across partitionings — but the sketch is
    * Spark-internal (DuckDB's approx_count_distinct differs), so the
    * compared output carries the DuckDB-reproducible exact count plus a
    * `within_5pct` accuracy verdict on the estimate: the driver confirms
    * both that the exact path agrees AND that the HLL estimate lands
    * inside a 3×rsd envelope (rsd is a standard deviation, not a bound,
    * and Spark's HLL++ uses linear counting at small range — not exact —
    * so the compared verdict asserts the statistically-safe 3σ band;
    * ExtSpec pins the tighter 1×rsd claim for the shipped test data).
    * The raw estimate itself stays out of the compared columns.
    */
  val extApproxCardinality = Q(
    "ext_approx_cardinality",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"source", explode(split($"text", " ")).as("word"))
        .groupBy($"source")
        .agg(approx_count_distinct($"word").as("vocab_approx"),
          countDistinct($"word").as("vocab_exact"))
        .select($"source", $"vocab_exact",
          (abs($"vocab_approx" - $"vocab_exact").cast("double")
            <= lit(0.15) * $"vocab_exact".cast("double"))
            .as("within_3rsd"))
        .orderBy($"source")
    },
    Some("""SELECT source, COUNT(DISTINCT word) AS vocab_exact,
           |       TRUE AS within_3rsd
           |FROM (SELECT source, unnest(string_split(text, ' ')) AS word
           |      FROM documents)
           |GROUP BY source ORDER BY source""".stripMargin))

  /** Leakage-safe train/valid/test assignment: hash the NEAR-DUP
    * COMPONENT representative, not the document — the split bug this
    * prevents is real and common (two near-duplicates landing one in
    * train and one in valid silently inflates eval: the model has
    * "seen" the valid doc). Components come from min-label propagation
    * over the capped Jaccard pair graph, iterated TO FIXPOINT — unlike
    * [[extDedupComponents]]'s documented fixed-pass shortcut, the
    * no-straddle invariant IS this query's contract, and a fixed pass
    * count would silently split a near-dup chain whose graph diameter
    * exceeds it. Convergence is detected by the monotone label sum
    * (labels only ever decrease, so an unchanged sum means an unchanged
    * labeling), with a loud failure at a pass bound far above any real
    * near-dup cluster's diameter. The oracle computes the same fixpoint
    * exactly via a recursive reachability CTE (min reachable doc_id =
    * the converged min label). Docs in no near-dup pair are their own
    * singleton component, so their assignment coincides with
    * [[CurationQueries.extSplitAssign]]'s per-doc hash; the 90/5/5
    * thresholds and the squared-hash split convention are shared.
    * Scale posture: capped edge generation + per-pass keyed join/agg;
    * pass count = component diameter (small for near-dup clusters: they
    * are dense by construction), each convergence check one tiny agg
    * over the label frame.
    */
  val extSplitLeakageSafe = Q(
    "ext_split_leakage_safe",
    (s, dir) => {
      import s.implicits._
      val maxPasses = 20
      val pairs = jaccardPairs(s, dir).select($"doc_a", $"doc_b")
      val edges = pairs
        .select(explode(array(
          struct($"doc_a".as("src"), $"doc_b".as("dst")),
          struct($"doc_b".as("src"), $"doc_a".as("dst")))).as("e"))
        .select($"e.src", $"e.dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var labels = Q.mat(edges.select($"src".as("doc_id")).distinct()
        .withColumn("comp", $"doc_id"))
      // sum(comp) over an EMPTY label frame is SQL NULL — a corpus with
      // zero near-dup pairs must take the per-doc singleton fallback
      // below, not NPE here (None ⇔ empty ⇔ already a fixpoint)
      def labelSum0(df: DataFrame): Option[Long] =
        Option(df.agg(sum($"comp")).head().getAs[java.lang.Long](0))
          .map(_.toLong)
      var labelSum = labelSum0(labels)
      var converged = labelSum.isEmpty
      var pass = 0
      while (!converged) {
        pass += 1
        if (pass > maxPasses)
          sys.error(s"min-label propagation not converged in $maxPasses " +
            "passes — near-dup component diameter is pathological")
        val viaNeighbor = edges
          .join(labels.select($"doc_id".as("dst"), $"comp"), Seq("dst"))
          .select($"src".as("doc_id"), $"comp")
        labels = labels.union(viaNeighbor)
          .groupBy($"doc_id").agg(min($"comp").as("comp"))
          .transform(Q.mat)
        // labels are monotonically non-increasing: an unchanged sum
        // means NO label changed → fixpoint
        val s2 = labelSum0(labels)
        converged = s2 == labelSum
        labelSum = s2
      }
      edges.unpersist()
      t(s, dir, "documents").select($"doc_id")
        .join(labels, Seq("doc_id"), "left")
        .withColumn("component", coalesce($"comp", $"doc_id"))
        .withColumn("sk", concat(lit("spl:"), $"component".cast("string")))
        .withColumn("h", expr(mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % mhP)
        .withColumn("split",
          when($"h2" % 100 < 90, "train")
            .when($"h2" % 100 < 95, "valid")
            .otherwise("test"))
        .select($"doc_id", $"component", $"split")
        .orderBy($"doc_id")
    },
    Some {
      // exact fixpoint via recursive reachability: min reachable doc_id
      // over the symmetrized pair graph IS the converged min label
      s"""WITH RECURSIVE $jaccardPairsDuckCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(doc_id, node) AS (
         |  SELECT DISTINCT src, src FROM edges
         |  UNION
         |  SELECT r.doc_id, e.dst
         |  FROM reach r JOIN edges e ON e.src = r.node),
         |lfix AS (SELECT doc_id, MIN(node) AS comp FROM reach GROUP BY 1),
         |cmp AS (
         |  SELECT d.doc_id, COALESCE(l.comp, d.doc_id) AS component
         |  FROM documents d LEFT JOIN lfix l ON d.doc_id = l.doc_id),
         |hh AS (
         |  SELECT doc_id, component,
         |         ${mhBaseDuck("('spl:' || CAST(component AS VARCHAR))")} AS h
         |  FROM cmp)
         |SELECT doc_id, component,
         |       CASE WHEN ((h * h + h) % $mhP) % 100 < 90 THEN 'train'
         |            WHEN ((h * h + h) % $mhP) % 100 < 95 THEN 'valid'
         |            ELSE 'test' END AS split
         |FROM hh ORDER BY doc_id""".stripMargin
    })

  /** Persisted incremental NEAR-dup index (round-12 verdict item 6):
    * the MinHash BAND TABLE lives as a transaction-log lake table,
    * MAINTAINED PER BATCH — new documents near-dup against the whole
    * ingested history by joining the STORED index, never by re-scanning
    * (or re-shingling) the corpus. Two batches prove incrementality:
    * batch 1 classifies against the created index (history bands) and
    * APPENDS its own bands as one atomic commit; batch 2 then matches
    * batch-1 documents THROUGH the stored index (an in-query REQUIRE
    * pins a batch-2 near-dup whose match is a batch-1 doc — an id no
    * history row carries). Near-dups are manufactured deterministically:
    * 10 % of history re-posted with one appended token (' zz'), and the
    * batch-1 slice re-posted into batch 2 (' qq') — MinHash-stable
    * perturbations. Candidate population is bounded by the SAME
    * [[lshBucketCap]] band-bucket cap as ext_dedup_minhash_lsh, applied
    * to the stored index side (PlanSpec verifies the predicate
    * structurally). Scale law: per-batch cost ∝ |batch| × bands +
    * matched-bucket membership; the history index is append-only and
    * never reshuffled — the growing-corpus shape a 100 TB ingest runs.
    * Oracle replays both phases relationally (index b = bands of every
    * doc ingested before batch b).
    */
  val extDedupIncrementalNear = Q(
    "ext_dedup_incremental_near",
    (s, dir) => {
      import s.implicits._
      val K = graft.ScaleConfig.minhashK
      val bands = graft.ScaleConfig.minhashBands
      val rpb = K / bands
      val root = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_scratch/dedup_incnear_" +
        Integer.toHexString(dir.hashCode)
      val docs = Q.mat(t(s, dir, "documents")
        .withColumn("sk", concat(lit("incn:"), $"doc_id".cast("string")))
        .withColumn("h", expr(mhBaseNative(s, "sk")))
        .withColumn("h2", ($"h" * $"h" + $"h") % mhP)
        .select($"doc_id", $"text", $"h2"))
      val off = docs.agg(max($"doc_id")).first().getLong(0) + 1L
      val history = docs.where($"h2" % 10 < 8).select($"doc_id", $"text")
      val batch1 = docs.where($"h2" % 10 === 8)
        .select($"doc_id", $"text")
        .unionByName(docs.where($"h2" % 10 === 0).select(
          ($"doc_id" + off).as("doc_id"),
          concat($"text", lit(" zz")).as("text")))
      val batch2 = docs.where($"h2" % 10 === 9)
        .select($"doc_id", $"text")
        .unionByName(docs.where($"h2" % 10 === 8).select(
          ($"doc_id" + off * 2).as("doc_id"),
          concat($"text", lit(" qq")).as("text")))
      def bandsOf(c: DataFrame): DataFrame = {
        val g = c.select($"doc_id", split($"text", " ").as("w"))
          .where(size($"w") >= 3)
          .select($"doc_id", explode(array_distinct(expr(
            "transform(sequence(0, size(w)-3), i -> " +
              "concat_ws(' ', w[i], w[i+1], w[i+2]))"))).as("gram"))
          .withColumn("bh0", expr(mhBaseNative(s, "gram")))
        val hashCols = (0 until K).map(i =>
          min((lit(mhA(i)) * $"bh0" + lit(mhB(i))) % mhP).as(s"h$i"))
        val sig = g.groupBy($"doc_id").agg(hashCols.head, hashCols.tail: _*)
        sig.select($"doc_id", explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            expr(mhBandKey((b * rpb until (b + 1) * rpb)
              .map(i => s"h$i"))).as("bh"))): _*)).as("bb"))
          .select($"doc_id", $"bb.band", $"bb.bh")
      }
      // the stored-index classification: band join against the LAKE
      // table, hot buckets capped on the index side, earliest matching
      // indexed doc reported
      def classify(idx: DataFrame, q: DataFrame, batchDocs: DataFrame,
          batchNo: Int): DataFrame = {
        val okb = idx.groupBy($"band", $"bh")
          .agg(count(lit(1)).as("bpop"))
          .where($"bpop" <= lshBucketCap).select($"band", $"bh")
        val capped = idx.join(okb, Seq("band", "bh"))
          .select($"band", $"bh", $"doc_id".as("idx_id"))
        val m = q.join(capped, Seq("band", "bh"))
          .groupBy($"doc_id").agg(min($"idx_id").as("match_id"))
        batchDocs.select($"doc_id").join(m, Seq("doc_id"), "left")
          .select($"doc_id", lit(batchNo).as("batch"),
            when($"match_id".isNotNull, "near_dup").otherwise("new")
              .as("status"),
            $"match_id")
      }
      val idx = new graft.lake.TxTable(s, root)
      idx.create(bandsOf(history)) // index v0: the ingested history
      val b1bands = Q.mat(bandsOf(batch1))
      val b1 = classify(idx.read(), b1bands, batch1, 1)
      idx.append(b1bands) // index v1: batch 1 is now history
      require(idx.version == 1L,
        s"index must advance one commit per batch, at v${idx.version}")
      val b2 = classify(idx.read(), bandsOf(batch2), batch2, 2)
      val out = Q.mat(b1.unionByName(b2))
      require(out.where($"status" === "near_dup").limit(1).count() > 0,
        "manufactured near-dups must be caught")
      // incrementality witness: a batch-2 near-dup matched a BATCH-1
      // document (ids h2%10=8 — present in no history row), which can
      // only have come from the bands batch 1 APPENDED to the index
      val b1NewIds = docs.where($"h2" % 10 === 8)
        .select($"doc_id".as("match_id"))
      require(out.where($"batch" === 2 && $"status" === "near_dup")
        .join(b1NewIds, Seq("match_id")).limit(1).count() > 0,
        "batch 2 must near-dup against batch-1 docs through the " +
          "STORED index")
      out.orderBy($"batch", $"doc_id")
    },
    Some {
      val K = graft.ScaleConfig.minhashK
      val bands = graft.ScaleConfig.minhashBands
      val rpb = K / bands
      val minCols = (0 until K)
        .map(i => s"MIN((${mhA(i)} * bh0 + ${mhB(i)}) % $mhP) AS h$i")
        .mkString(",\n           |         ")
      val bandSelects = (0 until bands).map { b =>
        val key = mhBandKey((b * rpb until (b + 1) * rpb).map(i => s"h$i"))
        s"SELECT doc_id, batch, $b AS band, $key AS bh FROM sig"
      }.mkString("\n           |  UNION ALL ")
      def classifySql(no: Int): String =
        s"""idx$no AS (SELECT band, bh, doc_id FROM bandrows
           |  WHERE batch < $no),
           |okb$no AS (SELECT band, bh FROM idx$no
           |  GROUP BY 1, 2 HAVING COUNT(*) <= $lshBucketCap),
           |m$no AS (
           |  SELECT q.doc_id, MIN(i.doc_id) AS match_id
           |  FROM (SELECT * FROM bandrows WHERE batch = $no) q
           |  JOIN (SELECT idx$no.* FROM idx$no JOIN okb$no
           |          USING (band, bh)) i
           |    USING (band, bh)
           |  GROUP BY 1),
           |c$no AS (
           |  SELECT c.doc_id, $no AS batch,
           |         CASE WHEN m.match_id IS NOT NULL THEN 'near_dup'
           |              ELSE 'new' END AS status,
           |         m.match_id
           |  FROM (SELECT doc_id FROM corpus WHERE batch = $no) c
           |  LEFT JOIN m$no m USING (doc_id))"""
      s"""WITH base AS (
         |  SELECT doc_id, text, (h * h + h) % $mhP AS h2
         |  FROM (SELECT doc_id, text,
         |          ${mhBaseDuck("('incn:' || CAST(doc_id AS VARCHAR))")} AS h
         |        FROM documents)),
         |off AS (SELECT MAX(doc_id) + 1 AS o FROM base),
         |corpus AS (
         |  SELECT doc_id, text, 0 AS batch FROM base WHERE h2 % 10 < 8
         |  UNION ALL SELECT doc_id, text, 1 FROM base WHERE h2 % 10 = 8
         |  UNION ALL SELECT doc_id + (SELECT o FROM off),
         |    text || ' zz', 1 FROM base WHERE h2 % 10 = 0
         |  UNION ALL SELECT doc_id, text, 2 FROM base WHERE h2 % 10 = 9
         |  UNION ALL SELECT doc_id + 2 * (SELECT o FROM off),
         |    text || ' qq', 2 FROM base WHERE h2 % 10 = 8),
         |g AS (
         |  SELECT doc_id, batch, unnest(list_distinct(list_transform(
         |           range(len(s) - 2),
         |           i -> s[i+1] || ' ' || s[i+2] || ' ' || s[i+3]))) AS gram
         |  FROM (SELECT doc_id, batch, string_split(text, ' ') AS s
         |        FROM corpus)
         |  WHERE len(s) >= 3),
         |gh AS (SELECT doc_id, batch, ${mhBaseDuck("gram")} AS bh0 FROM g),
         |sig AS (
         |  SELECT doc_id, batch,
         |         $minCols
         |  FROM gh GROUP BY 1, 2),
         |bandrows AS (
         |  $bandSelects),
         |${classifySql(1)},
         |${classifySql(2)}
         |SELECT * FROM c1 UNION ALL SELECT * FROM c2
         |ORDER BY batch, doc_id""".stripMargin
    })

  val all: Seq[Q] = Seq(extAsOfJoin, extApproxCardinality, extFingerprint,
    extDedupIncrementalNear,
    extDedupExact, extDedupNgramJaccard, extDedupComponents,
    extDedupMinhashLsh, extDedupSimhash, extDedupEmbedding, extKnnBrute,
    extKnnNative, extKnnLsh, extKnnIvf, extKnnInt8, extRangeJoin,
    extTextQuality,
    extTextFilter, extLangId, extTopTerms, extSessionize, extSessionWindow,
    extMultimodal, extMultimodalFrames, extStreamWindowCounts,
    extStreamSlidingCounts, extStreamSessionize, extStreamDedup,
    extStreamLateDrop, extStreamEnrich, extStreamFileSink,
    extStreamRestartRecovery,
    extStreamSessionWindow,
    extSplitLeakageSafe)
}
