package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split each L2-normalized vector into `m`
  * subvectors, k-means each subspace independently (the deterministic
  * Lloyd fit shared with [[Ivf]]), and store each vector as `m` small
  * codes. Search is ADC (asymmetric distance computation): the query
  * builds an m×k lookup table of partial dot products against the
  * codebooks, and each candidate's approximate cosine is the sum of its
  * m table entries — the memory-compression half of billion-scale ANN
  * (IVF prunes candidates; PQ shrinks what each candidate costs to
  * score: m bytes instead of dim floats). [[searchIvfPq]] composes the
  * two halves into the production IVF-PQ stack.
  *
  * Scale posture: codebooks are m×k×subDim doubles — broadcast
  * literals; encoding is a per-row broadcast argmin (one corpus pass);
  * search joins the LUT to the code table on (sub, code) — keyed, never
  * all-pairs on raw vectors — and reduces per (query, candidate) with a
  * sub-ordered strict fold (m summands, fixed order, bit-identical
  * cross-engine).
  */
object Pq {

  // the ONE fold formulation every oracle depends on lives in Ivf
  private val dotFold = Ivf.dotFold

  /** `sv`: one materialized `(vec_id, sub, e)` frame holding EVERY
    * subspace slice; `cents`: `(sub, cluster, ce)` — all m codebooks.
    */
  private final case class Fitted(sv: DataFrame, cents: DataFrame)

  /** Slice out the m subspaces into ONE sub-keyed frame and fit all m
    * codebooks with a single batched Lloyd chain ([[Ivf.fitSub]]). The
    * fits are independent (disjoint codebooks, disjoint Lloyd state);
    * they used to run as m concurrent per-subspace chains, but each
    * chain was its own sequence of driver-synced multi-stage jobs — the
    * batched chain does every subspace's work in one seed job + `iters`
    * M-step jobs (round-14 profile: the IVF-PQ query ran 129 Spark jobs,
    * most of them PQ-fit fragments). Per-(sub, …) grouping keeps each
    * fit bit-identical to the sequential formulation the oracle replays.
    */
  private def fitSubspaces(emb: DataFrame, m: Int, subDim: Int, k: Int,
      iters: Int): Fitted = {
    val spark = emb.sparkSession
    import spark.implicits._
    // L2-normalization composed INTO the one materialized subspace
    // frame: the whole normalized vector `en` is never consumed — only
    // its m slices are — so the former separate Mat(normalized) action
    // (its own scan + localCheckpoint per PQ query) folds away; the
    // doubles are the identical expressions, just composed.
    val sv = graft.queries.Mat(emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e0"))
      .withColumn("nrm", expr(s"sqrt(${dotFold.format("e0", "e0")})"))
      .select($"vec_id", expr("transform(e0, x -> x / nrm)").as("en"))
      .select($"vec_id",
        posexplode(expr(s"transform(sequence(0, ${m - 1}), " +
          s"s -> slice(en, s * $subDim + 1, $subDim))")).as(Seq("sub", "e"))))
    Fitted(sv, Ivf.fitSub(sv, k, iters))
  }

  /** (vec_id, sub, code): each vector's m-code PQ encoding — one
    * sub-keyed E-step over the batched frame (same rows as the former
    * per-subspace assign+union: the window keys on (sub, vec_id)).
    */
  private def codesOf(f: Fitted): DataFrame =
    Ivf.assignSub(f.sv, f.cents)
      .select(col("vec_id"), col("sub"), col("cluster").as("code"))

  /** (qid, sub, code, pdot): each query's ADC lookup table — the former
    * per-subspace crossJoin+union as one sub-keyed broadcast join.
    */
  private def lutOf(f: Fitted, maxQid: Int): DataFrame =
    f.sv.where(col("vec_id") < maxQid)
      .join(broadcast(f.cents), Seq("sub"))
      .select(col("vec_id").as("qid"), col("sub"),
        col("cluster").as("code"),
        expr(dotFold.format("e", "ce")).as("pdot"))

  /** Sub-ordered strict fold of the m LUT entries per (query, candidate)
    * + top-k. `cand` must carry (qid, nid, sub, pdot).
    */
  private def adcTopK(cand: DataFrame, topK: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"qid").orderBy($"approx_cos".desc, $"nid")
    cand
      .groupBy($"qid", $"nid")
      .agg(expr(
        "aggregate(transform(array_sort(collect_list(struct(sub, pdot))), x -> x.pdot), 0D, (a, x) -> a + x)")
        .as("approx_cos"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= topK)
      .select($"qid", $"rank", $"nid", $"approx_cos")
      .orderBy($"qid", $"rank")
  }

  /** Flat PQ: encode + exhaustive ADC scan, parameter-matched to
    * [[duckOracleSql]]: queries are vec_id < maxQid, results top-k per
    * query by (approximate cosine desc, neighbor id).
    */
  def searchAll(emb: DataFrame, m: Int, subDim: Int, k: Int, iters: Int,
      maxQid: Int, topK: Int): DataFrame = {
    val subs = fitSubspaces(emb, m, subDim, k, iters)
    adcTopK(
      codesOf(subs).join(lutOf(subs, maxQid), Seq("sub", "code"))
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id").as("nid"), col("sub"),
          col("pdot")),
      topK)
  }

  /** IVF-PQ — the production composition: the coarse quantizer
    * ([[Ivf.build]]) prunes candidates to the `nprobe` nearest clusters,
    * and PQ codes score ONLY those survivors via ADC. At 100 TB this is
    * the standard shape: candidates shrink by k/nprobe, and each
    * survivor costs m lookups instead of a dim-length dot product.
    * Parameter-matched to [[duckIvfPqOracleSql]].
    */
  def searchIvfPq(emb: DataFrame, coarseK: Int, m: Int, subDim: Int,
      k: Int, iters: Int, maxQid: Int, topK: Int, nprobe: Int)
      : DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val spark = emb.sparkSession
    import spark.implicits._
    implicit val ec: scala.concurrent.ExecutionContext =
      graft.core.RunRegistry.sharedExecutionContext
    // the coarse index and the m codebooks are independent fits — build
    // them concurrently, like the subspaces themselves
    val indexF = Future { Ivf.build(emb, coarseK, iters) }
    val subs = fitSubspaces(emb, m, subDim, k, iters)
    val index = Await.result(indexF, Duration.Inf)
    // the nprobe nearest coarse clusters — Ivf's single probe stage
    val probes = Ivf
      .probe(index, Ivf.queryFrame(emb.where($"vec_id" < maxQid)), nprobe)
      .select($"qid", $"cluster")
    val cand = probes
      .join(index.assigned.select($"vec_id".as("nid"), $"cluster"),
        Seq("cluster"))
      .where($"qid" =!= $"nid")
      .select($"qid", $"nid")
    adcTopK(
      cand
        .join(codesOf(subs).withColumnRenamed("vec_id", "nid"), Seq("nid"))
        .join(lutOf(subs, maxQid), Seq("qid", "sub", "code"))
        .select($"qid", $"nid", $"sub", $"pdot"),
      topK)
  }

  // ---- DuckDB oracle generators ----

  private def subCtes(m: Int, subDim: Int, k: Int, iters: Int): String =
    (0 until m).map { s =>
      s"""sub$s AS (
         |  SELECT vec_id, en[${s * subDim + 1}:${(s + 1) * subDim}] AS e
         |  FROM en),
         |${Ivf.duckFitAssignCtes(s"sub$s", k, iters, s"s$s")}""".stripMargin
    }.mkString(",\n")

  private def codesUnion(m: Int): String = (0 until m)
    .map(s => s"SELECT vec_id, $s AS sub, cluster AS code FROM s${s}asg")
    .mkString("\n  UNION ALL ")

  private def lutUnion(m: Int, maxQid: Int): String = (0 until m)
    .map(s => s"""SELECT s.vec_id AS qid, $s AS sub, c.cluster AS code,
                 |       ${Ivf.duckDot("s.e", "c.ce")} AS pdot
                 |  FROM sub$s s CROSS JOIN s${s}cent c
                 |  WHERE s.vec_id < $maxQid""".stripMargin)
    .mkString("\n  UNION ALL ")

  private def adcTopKSql(topK: Int): String =
    s"""acc AS (
       |  SELECT qid, nid,
       |         list_reduce([CAST(0 AS DOUBLE)] || list(pdot ORDER BY sub),
       |                     (a, x) -> a + x) AS approx_cos
       |  FROM scored GROUP BY qid, nid)
       |SELECT qid, rank, nid, approx_cos FROM (
       |  SELECT qid, nid, approx_cos,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY approx_cos DESC, nid) AS INT) AS rank
       |  FROM acc)
       |WHERE rank <= $topK ORDER BY qid, rank""".stripMargin

  /** Flat PQ encode+search as one DuckDB query over `embeddings` —
    * one [[Ivf.duckFitAssignCtes]] Lloyd chain per subspace.
    */
  def duckOracleSql(m: Int, subDim: Int, k: Int, iters: Int,
      maxQid: Int, topK: Int): String =
    s"""WITH e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |nr AS (
       |  SELECT vec_id, e, sqrt(${Ivf.duckDot("e", "e")}) AS nrm FROM e0),
       |en AS (
       |  SELECT vec_id, list_transform(e, x -> x / nrm) AS en FROM nr),
       |${subCtes(m, subDim, k, iters)},
       |codes AS (
       |  ${codesUnion(m)}),
       |lut AS (
       |  ${lutUnion(m, maxQid)}),
       |scored AS (
       |  SELECT l.qid, co.vec_id AS nid, l.sub, l.pdot
       |  FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.code
       |  WHERE co.vec_id <> l.qid),
       |${adcTopKSql(topK)}""".stripMargin

  /** IVF-PQ as one DuckDB query: the [[Ivf.duckAsgCtes]] coarse chain
    * (ending in `asg`/`cent`) + per-subspace PQ chains over the
    * normalized vectors + probe-pruned ADC scoring.
    */
  def duckIvfPqOracleSql(coarseK: Int, m: Int, subDim: Int, k: Int,
      iters: Int, maxQid: Int, topK: Int, nprobe: Int): String =
    s"""WITH ${Ivf.duckAsgCtes(coarseK, iters)},
       |en AS (
       |  SELECT vec_id, list_transform(e, x -> x / nrm) AS en FROM n),
       |${subCtes(m, subDim, k, iters)},
       |codes AS (
       |  ${codesUnion(m)}),
       |lut AS (
       |  ${lutUnion(m, maxQid)}),
       |q AS (
       |  SELECT vec_id AS qid, e AS qe, nrm AS qn FROM n
       |  WHERE vec_id < $maxQid),
       |probes AS (
       |  SELECT qid, cluster FROM (
       |    SELECT q.qid, c.cluster,
       |           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |             ${Ivf.duckDot("q.qe", "c.ce")} / (q.qn * c.cnrm) DESC,
       |             c.cluster) AS crank
       |    FROM q CROSS JOIN cent c)
       |  WHERE crank <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS nid
       |  FROM probes p JOIN asg a ON p.cluster = a.cluster
       |  WHERE a.vec_id <> p.qid),
       |scored AS (
       |  SELECT c.qid, c.nid, l.sub, l.pdot
       |  FROM cand c
       |  JOIN codes co ON co.vec_id = c.nid
       |  JOIN lut l ON l.qid = c.qid AND l.sub = co.sub
       |            AND l.code = co.code),
       |${adcTopKSql(topK)}""".stripMargin
}
