package graft

import org.apache.spark.sql.functions._

import graft.ext.Compaction
import graft.queries.ProfileQueries

/** Behavioral coverage for the round-4 operators; the driver oracle
  * checks cross-engine parity, these pin the semantics on crafted data.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("character entropy matches an exact java.lang.Math recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = ProfileQueries.extTextEntropy.run(spark, dir)
      .select($"doc_id", $"entropy").as[(Long, Double)].collect().toMap
    val texts = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(out.size === texts.length)
    texts.foreach { case (id, text) =>
      val n = text.length.toDouble
      val exact = text.groupBy(identity).values
        .map(g => (g.length / n) * math.log(n / g.length)).sum
      assert(math.abs(out(id) - exact) < 1e-9,
        s"doc $id: portable-ln entropy ${out(id)} vs exact $exact")
      assert(out(id) >= 0.0)
    }
  }

  test("tf-idf top terms match an exact java.lang.Math recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = ProfileQueries.extTfidfVectors.run(spark, dir).collect()
    val texts = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val words = texts.map { case (id, t) => id -> t.split(" ") }.toMap
    val n = texts.length.toDouble
    val df = words.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, word) = (r.getAs[Long]("doc_id"), r.getAs[String]("word"))
      val ws = words(id)
      val exact = (ws.count(_ == word) / ws.length.toDouble) *
        math.log(n / df(word))
      assert(math.abs(r.getAs[Double]("tfidf") - exact) < 1e-9,
        s"doc $id '$word': ${r.getAs[Double]("tfidf")} vs $exact")
    }
  }

  test("quantile profile ranks match a driver-side exact selection") {
    val dir = "/root/testdata/sf0.001"
    val rows = ProfileQueries.extQuantileProfile.run(spark, dir).collect()
    val bySource = Tables.load(spark, dir, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1)
    assert(rows.length === bySource.size)
    rows.foreach { r =>
      val vs = bySource(r.getAs[String]("source")).map(_._2.toDouble).sorted
      def rank(p: Double) = vs(math.ceil(p * vs.length).toInt - 1)
      assert(r.getAs[Double]("p50") === rank(0.5))
      assert(r.getAs[Double]("p90") === rank(0.9))
      assert(r.getAs[Double]("p99") === rank(0.99))
    }
  }

  test("profile counts nulls, distincts and lengths per column") {
    val df = Seq(
      (Some(1L), Some("aa")), (Some(2L), None), (None, Some("bbbb")))
      .toDF("id", "txt")
    val p = ProfileQueries.profile(df, Seq("id", "txt"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("id").getAs[Long]("n_nulls") === 1L)
    assert(p("id").getAs[Long]("n_distinct") === 2L)
    assert(p("txt").getAs[Long]("n_nulls") === 1L)
    assert(p("txt").getAs[Long]("sum_len") === 6L) // "aa" + "bbbb"
    assert(p("txt").getAs[String]("min_str") === "aa")
    assert(p("txt").getAs[String]("max_str") === "bbbb")
    assert(p("id").getAs[Long]("n_rows") === 3L)
  }

  test("count-min estimates never underestimate; exact for the heavy hitter") {
    val rows = ProfileQueries.extHeavyHittersCms
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"CMS underestimated ${r.getAs[String]("word")}")
      assert(r.getAs[Long]("overcount")
        === r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
    // top entry is ranked by estimate; with 4x1024 cells over a small
    // vocabulary the heavy hitter's estimate should be collision-free
    assert(rows.head.getAs[Long]("overcount") === 0L)
  }

  test("PII redaction masks emails, phones and IPv4s, leaves prose alone") {
    val df = Seq(
      "reach bob.smith+x@corp.example.org or 555-123-4567 via 10.1.2.3",
      "no pii here, just words and 42 numbers").toDF("t")
    val out = df.select(ProfileQueries.redact($"t").as("r"))
      .as[String].collect()
    assert(out(0) === "reach <EMAIL> or <PHONE> via <IP>")
    assert(out(1) === "no pii here, just words and 42 numbers")
  }

  test("LM scoring ranks a common-word doc above a rare-word doc") {
    val docs = Seq(
      (1L, "the the the the"), // all high-frequency
      (2L, "the the zzyzx the"), // one hapax
      (3L, "the quux zzyzx corge")) // mostly hapax
      .toDF("doc_id", "text")
    val scores = ProfileQueries.lmScore(docs)
      .collect().map(r => r.getAs[Long]("doc_id")
        -> r.getAs[Double]("avg_logprob")).toMap
    assert(scores(1) > scores(2))
    assert(scores(2) > scores(3))
    assert(scores.values.forall(v => v < 0.0 && !v.isNaN))
  }

  test("weighted sampling favors long documents") {
    val dir = "/root/testdata/sf0.01"
    val sample = ProfileQueries.extSampleWeighted.run(spark, dir).collect()
    assert(sample.length === 50)
    val sampleMean = sample.map(_.getAs[Long]("n_chars")).sum.toDouble / 50
    val corpusMean = spark.read.parquet(s"$dir/documents.parquet")
      .agg(avg($"n_chars")).first().getDouble(0)
    // length-proportional weights must pull the sample mean well above
    // the corpus mean (size-biased sampling)
    assert(sampleMean > corpusMean * 1.2,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("incremental dedup yields all three verdicts with correct counts") {
    val byStatus = ProfileQueries.extDedupIncremental
      .run(spark, "/root/testdata/sf0.001").collect()
      .groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    // replayed history docs flag dup_history; re-posted fresh-id copies
    // flag dup_batch; untouched incoming docs stay new
    assert(byStatus.getOrElse("dup_history", 0) > 0)
    assert(byStatus.getOrElse("dup_batch", 0) > 0)
    assert(byStatus.getOrElse("new", 0) > 0)
    // every re-posted copy's ORIGINAL (h2%10==9, smaller id) must stay
    // 'new' — keep-first within the batch
    assert(byStatus("dup_batch") <= byStatus("new"))
  }

  test("quarantine splits rows and orders violation names by rule") {
    import graft.checks.{Quarantine, RowRule}
    val df = Seq((1, 50, "O"), (2, 500, "O"), (3, 50, "X"), (4, 500, "X"))
      .toDF("id", "price", "status")
    val rules = Seq(
      RowRule("price", $"price" <= 100),
      RowRule("status", $"status" === "O"))
    val (good, bad) = Quarantine.split(df, rules)
    assert(good.select("id").as[Int].collect().toSeq === Seq(1))
    val reasons = bad.orderBy("id")
      .select("id", "violations").collect()
      .map(r => r.getInt(0) -> r.getString(1))
    assert(reasons === Array(
      2 -> "price", 3 -> "status", 4 -> "price,status"))
    assert(!good.columns.contains("violations"))
  }

  test("compaction collapses fragmented partitions and loses nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(16).write.partitionBy("lang")
      .mode("overwrite").parquet(s"$tmp/frag")
    val stats = Compaction.compact(spark, s"$tmp/frag", s"$tmp/opt",
      Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(stats.filesBefore >= 16) // genuinely fragmented before
    assert(stats.filesAfter <= langs) // ~1 file per partition after
    assert(stats.filesAfter < stats.filesBefore)
    val rt = spark.read.parquet(s"$tmp/opt")
    assert(rt.count() === docs.count())
    // content identical, not just cardinality
    assert(rt.select("doc_id", "text").except(
      docs.select("doc_id", "text")).isEmpty)
  }
}

/** DSIR importance log-weights: the query must equal the textbook
  * formula (driver-side recompute with Math.log) and rank target-like
  * documents above target-unlike ones on a crafted corpus.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("log-weights match the textbook recompute on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val B = graft.queries.ProfileQueries.dsirBuckets
    // the portable poly-hash (mult 31, salt 7, mod 2^31−1) → bucket
    def bucket(w: String): Long =
      w.foldLeft(7L)((h, c) => (h * 31 + c.toLong) % 2147483647L) % B
    val out = graft.queries.ProfileQueries.extDsirLogweight
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .as[(Long, String)].collect()
      .map { case (d, w) => (d, bucket(w)) }
    val nC = toks.length.toLong
    val tgt = toks.filter(_._1 < 10)
    val nT = tgt.length.toLong
    val cT = tgt.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cC = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pool = toks.filter(_._1 >= 10).groupBy(_._1)
    assert(out.keySet === pool.keySet)
    pool.foreach { case (doc, ws) =>
      val lw = ws.groupBy(_._2).map { case (b, occ) =>
        occ.length * math.log(
          ((cT.getOrElse(b, 0L) + 1).toDouble * (nC + B))
            / ((cC(b) + 1).toDouble * (nT + B)))
      }.sum
      val (nTok, got) = out(doc)
      assert(nTok === ws.length.toLong)
      assert(math.abs(got - lw) < math.max(1e-9, 1e-11 * math.abs(lw)),
        s"doc $doc: $got vs $lw")
    }
  }

  test("target-like documents outrank target-unlike ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir")
    val tgtText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs =
      (0L until 10L).map(i => (i, tgtText, "en", "s", 0L)) ++ Seq(
        (100L, "alpha beta gamma delta epsilon iota kappa mu",
          "en", "s", 0L), // mostly target vocabulary
        (101L, "nu xi omicron pi rho sigma tau upsilon",
          "en", "s", 0L)) // disjoint vocabulary
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.ProfileQueries.extDsirLogweight
      .run(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(100L) > out(101L),
      s"target-like must outrank: ${out(100L)} vs ${out(101L)}")
    assert(out(101L) < 0.0, "a fully off-target doc scores negative")
  }
}
