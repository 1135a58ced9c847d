package graft

import org.apache.spark.sql.functions._

import graft.queries.SemanticQueries

/** Semantic-operator contracts the DuckDB oracle can't express: SemDeDup's
  * keep/remove invariants and recall against the brute-force pair set;
  * PageRank's conservation (stochastic-matrix) property.
  */
class SemanticSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("semdedup removes only toward a lower-id same-cluster near-dup") {
    val removed = SemanticQueries.extDedupSemantic.run(spark, dir).collect()
    assert(removed.nonEmpty)
    removed.foreach { r =>
      assert(r.getAs[Long]("dup_of") < r.getAs[Long]("removed_id"))
      assert(r.getAs[Double]("cos") >= 0.35)
    }
    // one verdict per removed id
    val ids = removed.map(_.getAs[Long]("removed_id"))
    assert(ids.distinct.length === ids.length)
  }

  test("semdedup finds every within-cluster pair brute force finds") {
    // the SAME k law as the query (k = max(16, ceil(sqrt N))) — a fixed
    // k here would cluster differently and compare the wrong universe
    val (index, _, _) = graft.ext.Ivf.buildScaled(
      Tables.load(spark, dir, "embeddings"),
      kMin = SemanticQueries.semanticKMin,
      iters = graft.ScaleConfig.lloydIters)
    val a = index.assigned
    val dotFold =
      "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    // brute-force ALL pairs, then keep those SemDeDup's quantizer co-assigns
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v))"))
    val brute = emb.select($"vec_id".as("ia"), $"e".as("ea"), $"nrm".as("na"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"e".as("eb"), $"nrm".as("nb")))
      .where($"ia" < $"ib")
      .withColumn("cos", expr(dotFold) / ($"na" * $"nb"))
      .where($"cos" >= 0.35)
      .join(a.select($"vec_id".as("ia"), $"cluster".as("ca")), Seq("ia"))
      .join(a.select($"vec_id".as("ib"), $"cluster".as("cb")), Seq("ib"))
      .where($"ca" === $"cb")
      .select($"ib").distinct().as[Long].collect().toSet
    val removed = SemanticQueries.extDedupSemantic.run(spark, dir)
      .select($"removed_id").as[Long].collect().toSet
    assert(brute === removed,
      "removed set = {higher id of every co-clustered near-dup pair}")
  }

  test("pagerank conserves total rank mass on the symmetric trade graph") {
    val ranks = SemanticQueries.extPagerankIter.run(spark, dir).collect()
    assert(ranks.nonEmpty)
    val total = ranks.map(_.getAs[Double]("rank")).sum
    assert(math.abs(total - 1.0) < 1e-9,
      s"symmetrized graph has no dangling mass; got $total")
    val n = ranks.length.toDouble
    ranks.foreach(r =>
      assert(r.getAs[Double]("rank") > 0.15 / n - 1e-12,
        "every node keeps at least the teleport share"))
  }
}

/** The SemDeDup cluster-population cap ([[SemanticQueries
  * .semanticClusterCap]]): the structural guard that keeps the
  * within-cluster pair join sub-quadratic even when the coarse quantizer
  * COLLAPSES — the degenerate all-identical-embedding corpus every
  * other dedup member already has a hot-key spec for. Pins both sides
  * of the trade: the collapsed cluster contributes ZERO pairs (uncapped
  * it would be p(p−1)/2 ≈ 45k for p = 300), and a healthy small cluster
  * still dedups.
  */
class SemanticCapSpec extends SparkSpec {
  import spark.implicits._

  test("a collapsed over-cap cluster is dropped; a cool near-dup pair survives") {
    // corpus N = 302 → k = max(16, ⌈√302⌉) = 18, expected size ⌈302/18⌉
    // = 17, cap = 4·17 = 68: the 300-strong collapsed pile is over-cap
    val cap = SemanticQueries.semanticCapFor(302L)
    assert(cap === 68L, "spec corpus is sized against the relative cap")
    val dir = java.nio.file.Files.createTempDirectory("graft_semcap")
    val rnd = new scala.util.Random(7)
    // hot block: cap+44 IDENTICAL vectors (ids 1..300) — a fully
    // collapsed quantizer piles them into one cluster of pop 300 > cap
    val hotVec = Array.fill(64)(rnd.nextGaussian().toFloat).toSeq
    // cool pair: same direction ± 1e-4 relative noise, ids 0 and 9001 —
    // id 0 seeds its own centroid (seeds = k smallest vec_ids), id 9001
    // joins it, so the pair sits in a pop-2 cluster under the cap
    val coolVec = Array.fill(64)(rnd.nextGaussian().toFloat)
    val coolNoisy =
      coolVec.map(x => x * (1.0f + 1e-4f * rnd.nextGaussian().toFloat))
    val rows = Seq((0L, coolVec.toSeq)) ++
      (1 to 300).map(i => (i.toLong, hotVec)) ++
      Seq((9001L, coolNoisy.toSeq))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SemanticQueries.extDedupSemantic.run(spark, dir.toString)
      .collect().map(r => (r.getAs[Long]("removed_id"), r.getAs[Long]("dup_of")))
    assert(out.toSeq === Seq((9001L, 0L)),
      "only the cool pair dedups; the 300-strong collapsed cluster " +
        "contributes zero of its ~45k uncapped pairs")
  }
}
