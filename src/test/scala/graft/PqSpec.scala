package graft

import org.apache.spark.sql.functions._

import graft.ext.Pq
import graft.queries.ExtQueries

/** PQ contracts the oracle can't express: recall against the exact
  * top-k, the approximation's quality, and code-table shape.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("PQ ADC search overlaps the exact top-5 substantially") {
    val pq = Pq.searchAll(Tables.load(spark, dir, "embeddings"),
      m = 4, subDim = 16, k = 16, iters = 2, maxQid = 10, topK = 5)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = ExtQueries.extKnnBrute.run(spark, dir)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(brute.nonEmpty && pq.keySet === brute.keySet)
    val overlap = brute.map { case (q, exact) =>
      (pq(q) & exact).size
    }.sum
    val possible = brute.values.map(_.size).sum
    info(s"PQ recall@5 vs exact: $overlap/$possible")
    // 16× compression on random near-orthogonal vectors (ANN's worst
    // case) still has to find a meaningful share of true neighbors
    assert(overlap * 5 >= possible,
      s"recall@5 below 20%: $overlap/$possible")
  }

  test("every query gets exactly topK ranked candidates") {
    val out = Pq.searchAll(Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings"), m = 4, subDim = 16, k = 16, iters = 2,
      maxQid = 5, topK = 3)
    val byQ = out.groupBy($"qid")
      .agg(count(lit(1)).as("n"), max($"rank").as("mr"),
        min($"rank").as("lo")).collect()
    assert(byQ.length === 5)
    byQ.foreach { r =>
      assert(r.getLong(1) === 3 && r.getInt(2) === 3 && r.getInt(3) === 1)
    }
  }

  test("IVF-PQ scores agree with flat PQ on every surviving candidate") {
    val emb = Tables.load(spark, dir, "embeddings")
    val flat = Pq.searchAll(emb, m = 4, subDim = 16, k = 16, iters = 2,
      maxQid = 10, topK = 500)
      .select($"qid", $"nid", $"approx_cos")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ivfpq = Pq.searchIvfPq(emb, coarseK = 16, m = 4, subDim = 16,
      k = 16, iters = 2, maxQid = 10, topK = 5, nprobe = 4)
      .select($"qid", $"nid", $"approx_cos")
      .as[(Long, Long, Double)].collect()
    assert(ivfpq.nonEmpty)
    // pruning changes WHICH candidates are scored, never their score
    ivfpq.foreach { case (q, n, c) =>
      assert(java.lang.Double.doubleToLongBits(flat((q, n)))
        === java.lang.Double.doubleToLongBits(c),
        s"($q,$n): ivfpq=$c flat=${flat((q, n))}")
    }
  }

  test("ADC approximation tracks the true cosine") {
    val pq = Pq.searchAll(Tables.load(spark, dir, "embeddings"),
      m = 4, subDim = 16, k = 16, iters = 2, maxQid = 10, topK = 5)
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, v) -> acc + v))"))
    val joined = pq
      .join(emb.select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn")),
        Seq("qid"))
      .join(emb.select($"vec_id".as("nid"), $"e".as("ne"), $"nrm".as("nn")),
        Seq("nid"))
      .withColumn("true_cos", expr(
        "aggregate(zip_with(qe, ne, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        / ($"qn" * $"nn"))
      .select($"approx_cos", $"true_cos").collect()
    assert(joined.nonEmpty)
    val mae = joined.map(r =>
      math.abs(r.getDouble(0) - r.getDouble(1))).sum / joined.length
    info(s"PQ ADC mean absolute cosine error: $mae")
    // 4 centroids' worth of quantization on unit vectors stays a
    // coarse but usable cosine estimate
    assert(mae < 0.25, s"ADC error too large: $mae")
  }
}
