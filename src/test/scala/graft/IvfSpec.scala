package graft

import org.apache.spark.sql.functions._

import graft.ext.Ivf
import graft.queries.ExtQueries

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF search recalls most brute-force top-1 neighbors") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    val index = Ivf.build(emb, k = 16)
    val queries = emb.where($"vec_id" < 10)
    val ivfTop1 = Ivf.search(index, queries, topK = 1, nprobe = 4)
      .select($"qid", $"nid").as[(Long, Long)].collect().toMap
    val bruteTop1 = ExtQueries.extKnnBrute.run(spark, dir)
      .where($"rank" === 1)
      .select($"qid", $"nid").as[(Long, Long)].collect().toMap
    // random near-orthogonal vectors are ANN's worst case; still, probing
    // 4/16 clusters must recover a solid majority of true top-1s
    val hits = bruteTop1.count { case (q, n) => ivfTop1.get(q).contains(n) }
    assert(bruteTop1.nonEmpty)
    assert(hits >= bruteTop1.size / 2,
      s"recall@nprobe=4: $hits/${bruteTop1.size}")
  }

  test("IVF candidate set is bounded by the probed clusters") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val index = Ivf.build(emb, k = 8)
    val out = Ivf.search(index, emb.where($"vec_id" < 5), 3, 2)
    // every query returns at most topK rows with ranks 1..3
    val byQ = out.groupBy("qid").agg(count(lit(1)).as("n"),
      max("rank").as("mr")).collect()
    assert(byQ.nonEmpty)
    byQ.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getInt(2) <= 3)
    }
  }

  test("assignNew to frozen centroids IS the build-time E-step") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val index = Ivf.build(emb, k = 8)
    // re-assigning the indexed corpus itself must reproduce the build's
    // final assignment exactly — assignNew adds no fit of its own
    val re = Ivf.assignNew(index, emb)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toSet
    val orig = index.assigned
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toSet
    assert(re === orig)
  }
}
