package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the vector
  * space with k-means, then search only the `nprobe` clusters whose
  * centroids are nearest to the query — the classic trade of recall for a
  * k/nprobe-fold reduction in candidates. At 100 TB: the index build is
  * one MLlib k-means fit + one assignment pass; search is a centroid
  * broadcast (k × dim doubles — tiny), a cluster-keyed join (never
  * all-pairs), and a per-query top-k window.
  *
  * Exact cosine within probed clusters reuses the fold formulation
  * (ExtQueries.dotFold) so IVF results are comparable to the brute-force
  * baseline in IvfSpec's recall measurement.
  */
object Ivf {

  private val dotFold =
    "aggregate(zip_with(%s, %s, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  final case class Index(assigned: DataFrame, centroids: DataFrame)

  /** Build the index: seeded k-means over the embedding column.
    * `assigned` carries (vec_id, e, nrm, cluster); `centroids` is k rows
    * of (cluster, ce, cnrm).
    */
  def build(emb: DataFrame, k: Int, seed: Long = 42L): Index = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("nrm", expr(s"sqrt(${dotFold.format("e", "e")})"))
      .withColumn("fv", array_to_vector($"e"))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("fv")
      .fit(base)
    val assigned = model.transform(base)
      .select($"vec_id", $"e", $"nrm", $"prediction".as("cluster"))
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cluster", "ce")
      .withColumn("ce", $"ce".cast("array<double>"))
      .withColumn("cnrm", expr(s"sqrt(${dotFold.format("ce", "ce")})"))
    Index(assigned, centroids)
  }

  /** Probe the `nprobe` nearest clusters per query, exact cosine inside,
    * top-k per query.
    */
  def search(
      index: Index, queries: DataFrame, topK: Int, nprobe: Int)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries
      .select($"vec_id".as("qid"), $"embedding".cast("array<double>").as("qe"))
      .withColumn("qn", expr(s"sqrt(${dotFold.format("qe", "qe")})"))
    val wProbe = Window.partitionBy($"qid").orderBy($"ccos".desc, $"cluster")
    val probes = q.crossJoin(broadcast(index.centroids))
      .withColumn("ccos",
        expr(dotFold.format("qe", "ce")) / ($"qn" * $"cnrm"))
      .withColumn("crank", row_number().over(wProbe))
      .where($"crank" <= nprobe)
      .select($"qid", $"qe", $"qn", $"cluster")
    val wTop = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
    probes
      .join(index.assigned
        .select($"vec_id".as("nid"), $"e", $"nrm", $"cluster"),
        Seq("cluster"))
      .where($"qid" =!= $"nid")
      .withColumn("cos", expr(dotFold.format("qe", "e")) / ($"qn" * $"nrm"))
      .withColumn("rank", row_number().over(wTop))
      .where($"rank" <= topK)
      .select($"qid", $"rank", $"nid", $"cos")
  }
}
