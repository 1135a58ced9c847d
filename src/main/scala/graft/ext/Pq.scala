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
  * score: m bytes instead of dim floats).
  *
  * Scale posture: codebooks are m×k×subDim doubles — broadcast
  * literals; encoding is a per-row broadcast argmin (one corpus pass);
  * search joins the LUT to the code table on (sub, code) — keyed, never
  * all-pairs on raw vectors — and reduces per (query, candidate) with a
  * sub-ordered strict fold (m summands, fixed order, bit-identical
  * cross-engine).
  */
object Pq {

  private val dotFold =
    "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  /** Encode + ADC search in one plan, parameter-matched to
    * [[duckOracleSql]]: queries are vec_id < maxQid, results are top-k
    * per query by (approximate cosine desc, neighbor id).
    */
  def searchAll(emb: DataFrame, m: Int, subDim: Int, k: Int, iters: Int,
      maxQid: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val en = graft.queries.Mat(emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e0"))
      .withColumn("nrm", expr(s"sqrt(${dotFold.format("e0", "e0")})"))
      .select($"vec_id", expr("transform(e0, x -> x / nrm)").as("en")))
    val parts = (0 until m).map { sub =>
      val sv = graft.queries.Mat(en.select($"vec_id",
        expr(s"slice(en, ${sub * subDim + 1}, $subDim)").as("e")))
      val cents = Ivf.centroidsOf(spark, Ivf.fit(sv, k, iters))
      val codes = Ivf.assign(sv, cents)
        .select($"vec_id", lit(sub).as("sub"), $"cluster".as("code"))
      val lut = sv.where($"vec_id" < maxQid)
        .crossJoin(broadcast(cents))
        .select($"vec_id".as("qid"), lit(sub).as("sub"),
          $"cluster".as("code"), expr(dotFold.format("e", "ce")).as("pdot"))
      (codes, lut)
    }
    val codes = parts.map(_._1).reduce(_ unionByName _)
    val lut = parts.map(_._2).reduce(_ unionByName _)
    val w = Window.partitionBy($"qid").orderBy($"approx_cos".desc, $"nid")
    codes.join(lut, Seq("sub", "code"))
      .where($"qid" =!= $"vec_id")
      .groupBy($"qid", $"vec_id".as("nid"))
      .agg(expr(
        "aggregate(transform(array_sort(collect_list(struct(sub, pdot))), x -> x.pdot), 0D, (a, x) -> a + x)")
        .as("approx_cos"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= topK)
      .select($"qid", $"rank", $"nid", $"approx_cos")
      .orderBy($"qid", $"rank")
  }

  /** The same encode+search as one DuckDB query over `embeddings` —
    * one [[Ivf.duckFitAssignCtes]] Lloyd chain per subspace.
    */
  def duckOracleSql(m: Int, subDim: Int, k: Int, iters: Int,
      maxQid: Int, topK: Int): String = {
    def dot(a: String, b: String) = Ivf.duckDot(a, b)
    val subs = (0 until m).map { s =>
      s"""sub$s AS (
         |  SELECT vec_id, en[${s * subDim + 1}:${(s + 1) * subDim}] AS e
         |  FROM en),
         |${Ivf.duckFitAssignCtes(s"sub$s", k, iters, s"s$s")}""".stripMargin
    }.mkString(",\n")
    val codesUnion = (0 until m)
      .map(s => s"SELECT vec_id, $s AS sub, cluster AS code FROM s${s}asg")
      .mkString("\n  UNION ALL ")
    val lutUnion = (0 until m)
      .map(s => s"""SELECT s.vec_id AS qid, $s AS sub, c.cluster AS code,
                   |       ${dot("s.e", "c.ce")} AS pdot
                   |  FROM sub$s s CROSS JOIN s${s}cent c
                   |  WHERE s.vec_id < $maxQid""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |nr AS (
       |  SELECT vec_id, e, sqrt(${dot("e", "e")}) AS nrm FROM e0),
       |en AS (
       |  SELECT vec_id, list_transform(e, x -> x / nrm) AS en FROM nr),
       |$subs,
       |codes AS (
       |  $codesUnion),
       |lut AS (
       |  $lutUnion),
       |cand AS (
       |  SELECT l.qid, co.vec_id AS nid, l.sub, l.pdot
       |  FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.code
       |  WHERE co.vec_id <> l.qid),
       |acc AS (
       |  SELECT qid, nid,
       |         list_reduce([CAST(0 AS DOUBLE)] || list(pdot ORDER BY sub),
       |                     (a, x) -> a + x) AS approx_cos
       |  FROM cand GROUP BY qid, nid)
       |SELECT qid, rank, nid, approx_cos FROM (
       |  SELECT qid, nid, approx_cos,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |           ORDER BY approx_cos DESC, nid) AS INT) AS rank
       |  FROM acc)
       |WHERE rank <= $topK ORDER BY qid, rank""".stripMargin
  }
}
