package graft

import org.apache.spark.sql.functions._

import graft.ext.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive theta join, any bin width") {
    val points = Seq((1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 55.5),
      (5L, -3.2), (6L, 100.0)).toDF("id", "v")
    val ranges = Seq((10L, -5.0, 0.0), (20L, 5.0, 15.0), (30L, 50.0, 60.0),
      (40L, 99.0, 100.0), (50L, 200.0, 300.0)).toDF("rid", "lo", "hi")
    val naive = points.join(ranges, $"v" >= $"lo" && $"v" <= $"hi")
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    for (w <- Seq(1.0, 7.0, 10.0, 1000.0)) {
      val binned = RangeJoin.binned(points, "v", ranges, "lo", "hi", w)
        .select("id", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned === naive, s"binWidth=$w")
    }
    // boundary semantics: inclusive on both ends
    assert(naive.contains((1L, 10L))) // v=0.0 at hi boundary
    assert(naive.contains((3L, 20L))) // v=10.0 inside
    assert(naive.contains((6L, 40L))) // v=100.0 at hi boundary
  }
}
