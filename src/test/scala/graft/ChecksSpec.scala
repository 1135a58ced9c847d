package graft

import graft.checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("Unique passes on unique keys and fails on duplicates") {
    val ok = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val dup = Seq((1, "a"), (1, "b")).toDF("id", "v")
    assert(Checks.evaluate(ok, Seq(Unique(Seq("id")))).isEmpty)
    assert(Checks.evaluate(dup, Seq(Unique(Seq("id")))).nonEmpty)
    // composite key: (1,a),(1,b) is unique as a pair
    assert(Checks.evaluate(dup, Seq(Unique(Seq("id", "v")))).isEmpty)
  }

  test("MaxInRange honors strict vs inclusive bounds") {
    val df = Seq(10.0, 99.0).toDF("m")
    assert(Checks.evaluate(df, Seq(MaxInRange("m", 0, 100))).isEmpty)
    assert(Checks.evaluate(df, Seq(MaxInRange("m", 0, 99))).nonEmpty)
    assert(Checks
      .evaluate(df, Seq(MaxInRange("m", 0, 99, strict = false))).isEmpty)
  }

  test("MaxInRange fails on empty input (GE parity: max undefined)") {
    // expect_column_max_to_be_between fails when no non-null values
    // exist — an empty gold table must not slip through the gate
    val df = Seq.empty[Double].toDF("m")
    assert(Checks.evaluate(df, Seq(MaxInRange("m", 0, 1))).nonEmpty)
  }

  test("NotNull flags null values") {
    val df = Seq((Some(1), "a"), (None, "b")).toDF("id", "v")
    assert(Checks.evaluate(df, Seq(NotNull(Seq("v")))).isEmpty)
    assert(Checks.evaluate(df, Seq(NotNull(Seq("id")))).nonEmpty)
  }

  test("NullRatioBelow bounds the null fraction; vacuous on empty") {
    val df = Seq(Some(1), None, Some(3), Some(4)).toDF("id") // 25 % null
    assert(Checks.evaluate(df, Seq(NullRatioBelow("id", 0.25))).isEmpty)
    assert(Checks.evaluate(df, Seq(NullRatioBelow("id", 0.2))).nonEmpty)
    // ratio constrains composition, not presence — empties are the
    // RowCountInRange check's job (contrast: MaxInRange fails on empty)
    val empty = Seq.empty[Option[Int]].toDF("id")
    assert(Checks.evaluate(empty, Seq(NullRatioBelow("id", 0.0))).isEmpty)
  }

  test("RowCountInRange catches empty extracts and row explosions") {
    val df = Seq(1, 2, 3).toDF("id")
    assert(Checks.evaluate(df, Seq(RowCountInRange(1, 10))).isEmpty)
    assert(Checks.evaluate(df, Seq(RowCountInRange(4, 10))).nonEmpty)
    assert(Checks.evaluate(df, Seq(RowCountInRange(0, 2))).nonEmpty)
    val empty = Seq.empty[Int].toDF("id")
    assert(Checks.evaluate(empty, Seq(RowCountInRange(1, 10))).nonEmpty)
  }

  test("ValuesInSet pins a categorical domain, ignoring nulls") {
    val df = Seq(Some("a"), Some("b"), None).toDF("v")
    assert(Checks
      .evaluate(df, Seq(ValuesInSet("v", Seq("a", "b")))).isEmpty)
    assert(Checks
      .evaluate(df, Seq(ValuesInSet("v", Seq("a")))).nonEmpty)
  }

  test("a mixed suite evaluates in ONE pass with per-check fidelity") {
    // one check of every kind, some failing — results must come back in
    // check order with the same details the per-check passes produced,
    // and the whole suite must cost ONE Spark job (the optimization:
    // K checks previously scanned the gated table K times)
    val df = Seq((Some(1), "a", 10.0), (Some(1), "b", 99.0),
      (None, "c", 50.0)).toDF("id", "v", "m")
    val suite = Seq(
      Unique(Seq("id")),              // fails: two id=1 (nulls are a group)
      Unique(Seq("id", "v")),         // passes: pairs unique
      MaxInRange("m", 0, 99),         // fails strictly: max == hi
      NotNull(Seq("id")),             // fails: one null
      NullRatioBelow("id", 0.5),      // passes: 1/3 <= 0.5
      RowCountInRange(1, 10),         // passes
      ValuesInSet("v", Seq("a", "b"))) // fails: "c" outside
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val per = Checks.evaluateEach(df, suite)
      // listener events are posted asynchronously; a short settle is
      // enough for a just-finished local job's JobStart to land
      Thread.sleep(200)
      assert(per.map(_.isDefined) ===
        Seq(true, false, true, true, false, false, true))
      assert(per(2).get.detail === "max = 99.0 out of range")
      // AQE may split the aggregation into a couple of stage jobs, but
      // the old shape was >= 7 jobs (one per check) — pin "one action"
      assert(jobs <= 3, s"expected one aggregation action, saw $jobs jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
