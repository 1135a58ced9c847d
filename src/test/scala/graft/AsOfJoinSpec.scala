package graft

import java.sql.Timestamp

import graft.ext.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("asof picks the latest right row at or before each left time") {
    val quotes = Seq(
      (1L, ts(0), 100.0), (1L, ts(10), 110.0), (1L, ts(20), 120.0),
      (2L, ts(5), 50.0))
      .toDF("k", "qt", "price")
    val trades = Seq(
      (1L, ts(10), "exact-tie"),   // matches the ts(10) quote (<=)
      (1L, ts(15), "between"),     // matches ts(10)
      (1L, ts(99), "after-all"),   // matches ts(20)
      (2L, ts(0), "before-any"),   // no quote yet → nulls
      (3L, ts(7), "no-key"))       // key absent → nulls
      .toDF("k", "tt", "label")
    val out = AsOfJoin.leftAsOf(trades, quotes, "k", "tt", "qt")
      .orderBy("k", "tt")
      .collect()
      .map(r => (r.getAs[String]("label"),
        Option(r.getAs[java.lang.Double]("price")).map(_.toDouble)))
    assert(out.toSeq === Seq(
      ("exact-tie", Some(110.0)),
      ("between", Some(110.0)),
      ("after-all", Some(120.0)),
      ("before-any", None),
      ("no-key", None)))
  }
}
