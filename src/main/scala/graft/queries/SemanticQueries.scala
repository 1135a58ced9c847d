package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Semantic-level corpus operators, round 4: SemDeDup (cluster-scoped
  * embedding dedup — Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication") and an
  * iterative PageRank (the web-graph quality prior crawl-corpus curation
  * weighs documents by, computed BSP-style with DataFrame joins).
  *
  * Cross-engine determinism: all double reductions are vec_id- or
  * src-ordered strict left folds (the ext_label_centroid convention);
  * single divisions/multiplications mirror the oracle's expression tree
  * exactly.
  */
object SemanticQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // the shared fold formulation (bit-exactness depends on one copy)
  private val dotFold = ExtQueries.dotFold

  /** Width of the fixed src-range bands the PageRank inflow folds
    * within: a band covers `bandWidth` consecutive src ids, so (srcs
    * being distinct per dst) the level-1 agg buffer holds at most this
    * many entries — the hub-node state bound.
    */
  private[graft] val pagerankBandWidth = graft.ScaleConfig.pagerankBandWidth

  /** SemDeDup cluster-count law, k = max([[semanticKMin]], ⌈√N⌉) — the
    * published IVF sizing rule (FAISS: cells ≈ √N). Assignment cost N·k
    * and pair cost N·(N/k) BOTH land at N^1.5, the query's declared
    * law; the earlier constant-cluster-size law (k = ⌈N/64⌉) priced
    * assignment at N²/64 and measured ×35 for ×10 data in the sf0.1→sf1
    * spot-bench. Shared Spark/oracle.
    */
  private[graft] val semanticKMin = graft.ScaleConfig.semanticKMin
  private[graft] def semanticKFor(n: Long): Long =
    math.max(semanticKMin, math.ceil(math.sqrt(n.toDouble)).toLong)

  /** Hard population cap on a single cluster entering the pair join —
    * the structural backstop when the quantizer collapses (a degenerate
    * all-identical corpus piles everything into ONE cluster, and a
    * cluster with p members costs p(p−1)/2 pairs). Clusters above the
    * cap are dropped from pairing entirely (their members get no dedup
    * — the same documented trade as a hot LSH bucket: an over-cap
    * cluster signals quantizer degeneracy, and the periodic index
    * rebuild, not a quadratic join, is the remedy). The cap is
    * [[graft.ScaleConfig.semanticCapFactor]]× the corpus's EXPECTED
    * cluster size ⌈N/k⌉, so healthy skew survives at every corpus size;
    * replicated in the oracle; CI-pinned structurally by PlanSpec and
    * behaviorally by SemanticCapSpec.
    */
  private[graft] val semanticCapFactor = graft.ScaleConfig.semanticCapFactor
  private[graft] def semanticCapFor(n: Long): Long =
    semanticCapFactor *
      math.ceil(n.toDouble / semanticKFor(n).toDouble).toLong

  /** SemDeDup: k-means the embedding space (the deterministic Lloyd fit
    * shared with ext_knn_cosine_ivf), then look for near-duplicates ONLY
    * within each cluster — pairwise cosine against cluster peers, never
    * the corpus. Each removed item reports its most-similar lower-id
    * keeper. At 100 TB the pair count is Σ|cluster|² instead of N², and
    * both factors of that bound are enforced, not hoped for: k scales
    * as √N ([[semanticKFor]] — one metadata-cheap count(), then the
    * same Lloyd build), so assignment N·k and expected pair cost
    * N·(N/k) both follow the declared N^1.5 law; and any cluster that
    * exceeds [[semanticCapFor]] (capFactor× the expected size) is
    * dropped before pairing, bounding worst-case pair cost at
    * capFactor·N^1.5 even under a collapsed fit.
    * vs ext_dedup_embedding_cosine (sign-LSH banding): same contract,
    * different recall/cost trade — LSH recalls only hash-colliding
    * pairs, SemDeDup recalls ALL pairs co-assigned by the coarse
    * quantizer; published practice picks per corpus.
    */
  val extDedupSemantic = Q(
    "ext_dedup_semantic",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      // corpus-scaled cluster count — same formula as the oracle's kk
      // CTE (GREATEST(16, CEIL(SQRT(N)))); N is counted off the fit's
      // own materialized projection, not a separate corpus scan
      val (index, _, n) = graft.ext.Ivf.buildScaled(emb,
        kMin = semanticKMin, iters = graft.ScaleConfig.lloydIters)
      val cap = semanticCapFor(n)
      // three readers below (population census + both pair-join sides):
      // materialize the assignment once instead of re-running the E-step
      val a = Q.mat(index.assigned)
      val okc = a.groupBy($"cluster")
        .agg(count(lit(1)).as("cpop"))
        .where($"cpop" <= cap)
        .select($"cluster")
      val ac = a.join(okc, Seq("cluster"))
      val pairs = ac.select($"cluster", $"vec_id".as("keep_id"),
          $"e".as("ea"), $"nrm".as("na"))
        .join(ac.select($"cluster", $"vec_id".as("vec_id"),
          $"e".as("eb"), $"nrm".as("nb")), Seq("cluster"))
        .where($"keep_id" < $"vec_id")
        .withColumn("cos",
          expr(dotFold.format("ea", "eb")) / ($"na" * $"nb"))
        .where($"cos" >= 0.35)
      val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"keep_id")
      pairs
        .withColumn("rk", row_number().over(w))
        .where($"rk" === 1)
        .select($"vec_id".as("removed_id"), $"keep_id".as("dup_of"),
          $"cluster", $"cos")
        .orderBy($"removed_id")
    },
    Some(s"""WITH ${graft.ext.Ivf.duckAsgCtesDynK(
              s"GREATEST($semanticKMin, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT))",
              iters = graft.ScaleConfig.lloydIters)},
            |okc AS (
            |  SELECT cluster FROM asg
            |  GROUP BY 1 HAVING COUNT(*) <=
            |    (SELECT CAST($semanticCapFactor * CEIL(n / CAST(k AS DOUBLE))
            |            AS BIGINT) FROM kk)),
            |acs AS (SELECT asg.* FROM asg JOIN okc USING (cluster)),
            |pairs AS (
            |  SELECT a.cluster, a.vec_id AS keep_id, b.vec_id AS vec_id,
            |         ${graft.ext.Ivf.duckDot("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
            |  FROM acs a JOIN acs b
            |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
            |dup AS (
            |  SELECT vec_id, keep_id, cluster, cos,
            |         ROW_NUMBER() OVER (PARTITION BY vec_id
            |                            ORDER BY cos DESC, keep_id) AS rk
            |  FROM pairs WHERE cos >= 0.35)
            |SELECT vec_id AS removed_id, keep_id AS dup_of, cluster, cos
            |FROM dup WHERE rk = 1
            |ORDER BY removed_id""".stripMargin))

  /** Iterative PageRank over the customer↔supplier trade graph (edges =
    * distinct (customer, supplier) pairs with any order line,
    * symmetrized), 3 unrolled power iterations at damping 0.85 from the
    * uniform vector — the quality-prior computation crawl curation runs
    * over the link graph (cf. Common Crawl's harmonic-centrality
    * ranking). Node ids: customer = 2·c_custkey, supplier =
    * 2·s_suppkey + 1 — parity-disjoint at any key range (an additive
    * offset would collide once keys outgrow it).
    * Each iteration is one join + one two-level keyed aggregation; the
    * per-node contribution sum is a TWO-LEVEL deterministic fold: srcs
    * fold src-ordered WITHIN fixed src-range bands (band = src div
    * [[pagerankBandWidth]], so a band holds ≤ bandWidth distinct srcs —
    * the agg state is hard-capped even for a hub with millions of
    * in-edges), then the band sums fold band-ordered. Both levels
    * unroll identically in the oracle, so ranks are bit-identical
    * cross-engine. Scale posture: BSP iteration with a fixed pass
    * count, state = one (node, rank) table re-keyed per pass; nothing
    * collects to the driver; no per-node unbounded buffer (a single
    * flat src-ordered collect_list would be one — the r2 exact-
    * percentile hazard class).
    */
  val extPagerankIter = Q(
    "ext_pagerank_iter",
    (s, dir) => {
      import s.implicits._
      val fwd = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        .join(t(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
          $"o_orderkey" === $"l_orderkey")
        // disjoint node encoding: customer → 2k, supplier → 2k+1. A
        // fixed additive offset would silently merge nodes once keys
        // cross it (TPC-H has 150k customers PER scale factor); parity
        // encoding stays collision-free at any corpus size.
        .select(($"o_custkey" * 2L).as("src"),
          ($"l_suppkey" * 2L + 1L).as("dst"))
        .distinct()
      val sym = fwd.unionByName(fwd.select($"dst".as("src"), $"src".as("dst")))
      // out-degree joins once into the materialized edge list, so each
      // power iteration below is ONE join + ONE keyed agg (not two joins)
      val edges = Q.mat(sym.join(
        sym.groupBy($"src").agg(count(lit(1)).cast("double").as("outdeg")),
        Seq("src")))
      val nodes = edges.select($"src".as("node")).distinct()
      val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
      val r0 = nodes.crossJoin(nDf)
        .select($"node", $"n", (lit(1.0d) / $"n").as("rank"))
      // one power iteration: scatter rank/outdeg along edges, gather per
      // dst as a two-level fold — src-ordered within fixed src-range
      // bands (agg state ≤ bandWidth entries regardless of hub degree),
      // then band-ordered over the band sums
      def step(r: DataFrame): DataFrame =
        edges
          .join(r.withColumnRenamed("node", "src"), Seq("src"))
          .select($"dst".as("node"), $"n", $"src",
            ($"rank" / $"outdeg").as("contrib"))
          .groupBy($"node", $"n",
            expr(s"src div $pagerankBandWidth").as("band"))
          .agg(expr(
            "aggregate(transform(array_sort(collect_list(struct(src, contrib))), x -> x.contrib), 0D, (a, x) -> a + x)")
            .as("band_sum"))
          .groupBy($"node", $"n")
          .agg(expr(
            "aggregate(transform(array_sort(collect_list(struct(band, band_sum))), x -> x.band_sum), 0D, (a, x) -> a + x)")
            .as("inflow"))
          .select($"node", $"n",
            (lit(0.15d) / $"n" + lit(0.85d) * $"inflow").as("rank"))
      val r3 = step(step(step(r0)))
      r3.select($"node", $"rank").orderBy($"node")
    },
    Some {
      // one banded power iteration, unrolled three times — the two-CTE
      // pair mirrors the Spark two-level groupBy exactly (src-ordered
      // fold within a band, band-ordered fold of the band sums)
      def iter(prev: String, out: String): String =
        s"""${out}b AS (
           |  SELECT e.dst AS node, r.n,
           |         e.src // $pagerankBandWidth AS band,
           |         list_reduce(
           |           [CAST(0 AS DOUBLE)] ||
           |             list(r.rank / o.outdeg ORDER BY e.src),
           |           (a, x) -> a + x) AS band_sum
           |  FROM edges e JOIN $prev r ON e.src = r.node
           |              JOIN outdeg o ON e.src = o.src
           |  GROUP BY e.dst, r.n, band),
           |$out AS (
           |  SELECT node, n,
           |         0.15 / n + 0.85 * list_reduce(
           |           [CAST(0 AS DOUBLE)] ||
           |             list(band_sum ORDER BY band),
           |           (a, x) -> a + x) AS rank
           |  FROM ${out}b GROUP BY node, n)""".stripMargin
      s"""WITH fwd AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT src, dst FROM fwd
         |  UNION ALL SELECT dst AS src, src AS dst FROM fwd),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |outdeg AS (
         |  SELECT src, CAST(COUNT(*) AS DOUBLE) AS outdeg
         |  FROM edges GROUP BY src),
         |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (
         |  SELECT node, n, CAST(1.0 AS DOUBLE) / n AS rank
         |  FROM nodes, nn),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, rank FROM r3 ORDER BY node""".stripMargin
    })

  /** Product-quantization kNN (ADC over m=4 × 16-dim codebooks, 16
    * codes each): the memory-compression ANN variant — each candidate
    * costs m table lookups instead of a dim-length dot product, and the
    * corpus stores m bytes per vector instead of dim floats. Completes
    * the similarity-search family: brute/native (exact), LSH/IVF
    * (candidate pruning), int8 (scalar quantization), PQ (vector
    * quantization). PqSpec measures recall against the exact top-k.
    */
  val extKnnPq = Q(
    "ext_knn_cosine_pq",
    (s, dir) => graft.ext.Pq.searchAll(t(s, dir, "embeddings"),
      m = graft.ScaleConfig.pqM, subDim = graft.ScaleConfig.pqSubDim,
      k = graft.ScaleConfig.pqCodes, iters = graft.ScaleConfig.lloydIters,
      maxQid = 10, topK = 5),
    Some(graft.ext.Pq.duckOracleSql(
      m = graft.ScaleConfig.pqM, subDim = graft.ScaleConfig.pqSubDim,
      k = graft.ScaleConfig.pqCodes, iters = graft.ScaleConfig.lloydIters,
      maxQid = 10, topK = 5)))

  /** IVF-PQ ([[graft.ext.Pq.searchIvfPq]]): the production billion-scale
    * composition — the coarse quantizer prunes candidates to nprobe=4 of
    * 16 clusters, PQ codes score only the survivors via ADC. The whole
    * stack (coarse Lloyd + 4 subspace Lloyds + probe + ADC) replays in
    * DuckDB, so the row is hash-compared end to end.
    */
  val extKnnIvfPq = Q(
    "ext_knn_cosine_ivfpq",
    (s, dir) => graft.ext.Pq.searchIvfPq(t(s, dir, "embeddings"),
      coarseK = graft.ScaleConfig.ivfK, m = graft.ScaleConfig.pqM,
      subDim = graft.ScaleConfig.pqSubDim, k = graft.ScaleConfig.pqCodes,
      iters = graft.ScaleConfig.lloydIters, maxQid = 10, topK = 5,
      nprobe = 4),
    Some(graft.ext.Pq.duckIvfPqOracleSql(
      coarseK = graft.ScaleConfig.ivfK, m = graft.ScaleConfig.pqM,
      subDim = graft.ScaleConfig.pqSubDim, k = graft.ScaleConfig.pqCodes,
      iters = graft.ScaleConfig.lloydIters, maxQid = 10, topK = 5,
      nprobe = 4)))

  /** Incremental ANN ingestion: fit the IVF coarse quantizer on the
    * 80 % HISTORY slice (vec_id % 5 ≠ 0), then absorb the 20 % delta by
    * assigning each new vector to the FROZEN centroids — one E-step, no
    * refit ([[graft.ext.Ivf.assignNew]]). This is how a production ANN
    * index takes a delta load: re-clustering the corpus per ingest is a
    * non-starter at 100 TB (the full Lloyd pass costs iters × corpus
    * scans; the delta assign costs one broadcast join over the DELTA
    * only). The output pins each new vector's cluster and its cosine to
    * the frozen centroid, so the driver hash-checks both the frozen fit
    * (replayed on the history slice in DuckDB) and the E-step. Index
    * drift under a moving distribution is what ext_psi_drift/ext_ks_drift
    * monitor; a periodic rebuild restores optimality.
    */
  val extKnnIncrementalIngest = Q(
    "ext_knn_incremental_ingest",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val idx = graft.ext.Ivf.build(
        emb.where($"vec_id" % 5 =!= 0),
        k = graft.ScaleConfig.ivfK, iters = graft.ScaleConfig.lloydIters)
      val delta = graft.ext.Ivf.assignNew(idx, emb.where($"vec_id" % 5 === 0))
      delta.join(broadcast(idx.centroids), Seq("cluster"))
        .select($"vec_id", $"cluster",
          (expr(dotFold.format("e", "ce")) / ($"nrm" * $"cnrm"))
            .as("centroid_cos"))
        .orderBy($"vec_id")
    },
    Some {
      import graft.ext.Ivf
      s"""WITH e0 AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |h AS (SELECT vec_id, e FROM e0 WHERE vec_id % 5 <> 0),
         |${Ivf.duckFitAssignCtes("h", graft.ScaleConfig.ivfK,
             graft.ScaleConfig.lloydIters, "f")},
         |cent AS (
         |  SELECT cluster, ce, sqrt(${Ivf.duckDot("ce", "ce")}) AS cnrm
         |  FROM fcent),
         |d AS (
         |  SELECT vec_id, e, sqrt(${Ivf.duckDot("e", "e")}) AS nrm
         |  FROM e0 WHERE vec_id % 5 = 0),
         |a AS (
         |${Ivf.duckAssign("d", "cent")})
         |SELECT a.vec_id, a.cluster,
         |       ${Ivf.duckDot("a.e", "c.ce")} / (d.nrm * c.cnrm) AS centroid_cos
         |FROM a JOIN d ON a.vec_id = d.vec_id
         |       JOIN cent c ON a.cluster = c.cluster
         |ORDER BY a.vec_id""".stripMargin
    })

  /** The ANN index as a VERSIONED LAKE ARTIFACT (round-12 verdict item
    * 7): the IVF coarse quantizer's centroids and the assignment list
    * are transaction-log tables, so the index is time-travelable like
    * any other lake data. Lifecycle exercised end-to-end: build on the
    * 80 % history slice → persist (index v0) → delta-ingest the 20 %
    * slice by assigning to the FROZEN centroids READ FROM THE STORED
    * TABLE ([[graft.ext.Ivf.assignNew]]) → append as index v1 → serve
    * top-k through the STORED index at BOTH versions (v0 via time
    * travel — the pre-ingest index stays exactly queryable, the
    * rollback path a production service keeps for a bad ingest; a
    * rebuild on drift — ext_psi_drift's trigger — would land the same
    * way as v2+). Search cost is the ordinary IVF probe (nprobe of k
    * clusters, candidates ∝ probed membership); the oracle replays
    * build, frozen-centroid delta assign, and both versions' searches
    * relationally.
    */
  val extKnnIndexLake = Q(
    "ext_knn_index_lake",
    (s, dir) => {
      import s.implicits._
      val k = graft.ScaleConfig.ivfK
      val iters = graft.ScaleConfig.lloydIters
      val emb = t(s, dir, "embeddings")
      val built = graft.ext.Ivf.build(
        emb.where($"vec_id" % 5 =!= 0), k = k, iters = iters)
      val base = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft_scratch/knn_index_lake_" +
        Integer.toHexString(dir.hashCode)
      val cents = new graft.lake.TxTable(s, s"$base/centroids")
      val asg = new graft.lake.TxTable(s, s"$base/assigned")
      cents.create(built.centroids) // the frozen coarse quantizer
      asg.create(built.assigned
        .select($"vec_id", $"e", $"nrm", $"cluster")) // index v0
      // delta ingest THROUGH the stored quantizer — one E-step over the
      // delta only, appended as one atomic commit (index v1)
      val stored0 = graft.ext.Ivf.Index(asg.read(), cents.read())
      asg.append(graft.ext.Ivf
        .assignNew(stored0, emb.where($"vec_id" % 5 === 0))
        .select($"vec_id", $"e", $"nrm", $"cluster"))
      require(asg.version == 1L,
        s"index must version per ingest, at v${asg.version}")
      // serve from the STORED index: head, and v0 via time travel
      val queries = emb.where($"vec_id" < 10)
      def at(v: Option[Long]) =
        graft.ext.Ivf.Index(asg.read(v), cents.read())
      val r0 = graft.ext.Ivf.search(at(Some(0L)), queries,
        topK = 5, nprobe = 4).withColumn("idx_version", lit(0L))
      val r1 = graft.ext.Ivf.search(at(None), queries,
        topK = 5, nprobe = 4).withColumn("idx_version", lit(1L))
      r0.unionByName(r1).orderBy($"idx_version", $"qid", $"rank")
    },
    Some {
      import graft.ext.Ivf
      val k = graft.ScaleConfig.ivfK
      val iters = graft.ScaleConfig.lloydIters
      def searchSql(no: Int): String =
        s"""cand$no AS (
           |  SELECT p.qid, s.vec_id AS nid,
           |         ${Ivf.duckDot("p.qe", "s.e")} / (p.qn * s.nrm) AS cos
           |  FROM probes p JOIN idx$no s ON p.cluster = s.cluster
           |  WHERE p.qid <> s.vec_id),
           |r$no AS (
           |  SELECT CAST($no AS BIGINT) AS idx_version, qid, rank, nid, cos
           |  FROM (SELECT qid, nid, cos,
           |          CAST(ROW_NUMBER() OVER (PARTITION BY qid
           |            ORDER BY cos DESC, nid) AS INT) AS rank
           |        FROM cand$no)
           |  WHERE rank <= 5)"""
      s"""WITH e0 AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, e, sqrt(${Ivf.duckDot("e", "e")}) AS nrm FROM e0),
         |h AS (SELECT vec_id, e FROM e0 WHERE vec_id % 5 <> 0),
         |${Ivf.duckFitAssignCtes("h", k, iters, "f")},
         |cent AS (
         |  SELECT cluster, ce, sqrt(${Ivf.duckDot("ce", "ce")}) AS cnrm
         |  FROM fcent),
         |hasg AS (
         |  SELECT a.vec_id, a.e, n.nrm, a.cluster
         |  FROM fasg a JOIN n ON a.vec_id = n.vec_id),
         |d AS (SELECT vec_id, e FROM e0 WHERE vec_id % 5 = 0),
         |da AS (
         |${Ivf.duckAssign("d", "cent")}),
         |dasg AS (
         |  SELECT a.vec_id, a.e, n.nrm, a.cluster
         |  FROM da a JOIN n ON a.vec_id = n.vec_id),
         |idx0 AS (SELECT * FROM hasg),
         |idx1 AS (SELECT * FROM hasg UNION ALL SELECT * FROM dasg),
         |q AS (
         |  SELECT vec_id AS qid, e AS qe, nrm AS qn FROM n
         |  WHERE vec_id < 10),
         |probes AS (
         |  SELECT qid, qe, qn, cluster FROM (
         |    SELECT q.qid, q.qe, q.qn, c.cluster,
         |           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |             ${Ivf.duckDot("q.qe", "c.ce")} / (q.qn * c.cnrm) DESC,
         |             c.cluster) AS crank
         |    FROM q CROSS JOIN cent c)
         |  WHERE crank <= 4),
         |${searchSql(0)},
         |${searchSql(1)}
         |SELECT * FROM r0 UNION ALL SELECT * FROM r1
         |ORDER BY idx_version, qid, rank""".stripMargin
    })

  val all: Seq[Q] =
    Seq(extDedupSemantic, extPagerankIter, extKnnPq, extKnnIvfPq,
      extKnnIncrementalIngest, extKnnIndexLake)
}
