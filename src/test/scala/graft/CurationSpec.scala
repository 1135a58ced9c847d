package graft

import org.apache.spark.sql.functions._

import graft.queries.CurationQueries

/** Specs for the training-data curation operators
  * (graft.queries.CurationQueries). The oracle-backed invariants are
  * checked against Spark-side recomputations here; the DuckDB
  * cross-engine check is the harness's job.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and hits per-source rates") {
    val a = CurationQueries.extSampleStratified.run(spark, dir)
    val b = CurationQueries.extSampleStratified.run(spark, dir)
    assert(a.collect().toSeq === b.collect().toSeq)
    // per-source observed rate within a loose binomial tolerance of the
    // configured rate (sources are small at sf0.001 — just bound it)
    val total = Tables.load(spark, dir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val kept = a.groupBy($"source")
      .agg(count(lit(1)).as("k"), first($"sample_rate").as("rate"))
    val joined = kept.join(total, "source").collect()
    joined.foreach { r =>
      val k = r.getAs[Long]("k").toDouble
      val n = r.getAs[Long]("n").toDouble
      val rate = r.getAs[Double]("rate")
      assert(math.abs(k / n - rate) <= 0.35,
        s"source ${r.getAs[String]("source")}: kept ${k / n}, want ~$rate")
    }
    // weights are inverse rates
    a.select($"sample_rate" * $"weight").collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("repetition signals: ratios bounded and detect a crafted loop") {
    import spark.implicits._
    val base = CurationQueries.extQualityRepetition.run(spark, dir)
    base.collect().foreach { r =>
      val dr = r.getAs[Double]("distinct_ratio")
      val tw = r.getAs[Double]("top_word_frac")
      assert(dr > 0 && dr <= 1.0)
      assert(tw > 0 && tw <= 1.0)
    }
    // a 50×-repeated bigram must be flagged repetitive via crafted table
    val tmp = java.nio.file.Files.createTempDirectory("curation_rep")
    Seq((1L, Array.fill(50)("ab cd").mkString(" "), "en", "src0", 249L),
      (2L, (1 to 60).map(i => s"w$i").mkString(" "), "en", "src1", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val crafted = CurationQueries.extQualityRepetition
      .run(spark, tmp.toString).collect()
    val loopy = crafted.find(_.getAs[Long]("doc_id") == 1L).get
    val varied = crafted.find(_.getAs[Long]("doc_id") == 2L).get
    assert(loopy.getAs[Boolean]("is_repetitive"))
    assert(loopy.getAs[Double]("top_bigram_frac")
      > varied.getAs[Double]("top_bigram_frac"))
    assert(!varied.getAs[Boolean]("is_repetitive"))
  }

  test("bm25 ranks a doc containing all query terms above one with none") {
    val scores = CurationQueries.extBm25Search.run(spark, dir).collect()
    assert(scores.nonEmpty)
    assert(scores.forall(_.getAs[Double]("score") > 0))
    // descending, tie-broken by doc_id
    val pairs = scores.map(r =>
      (r.getAs[Double]("score"), r.getAs[Long]("doc_id"))).toSeq
    assert(pairs === pairs.sortBy { case (sc, id) => (-sc, id) })
    // every scored doc actually contains at least one query term
    val ids = scores.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = Tables.load(spark, dir, "documents")
      .where($"text".rlike("\\b(spark|join|window)\\b"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm))
  }

  test("chunk dedup finds a shared run at DIFFERENT offsets, not disjoint docs") {
    // content-defined boundaries align on the words themselves, so the
    // 60-word shared run is found even though it starts at offset 3 in
    // doc 1 and offset 0 in doc 2 (fixed-stride chunking would miss it)
    val shared = (1 to 60).map(i => s"s$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("curation_chunk")
    Seq(
      (1L, s"intro words here $shared tail one", "en", "src0", 0L),
      (2L, s"$shared completely different ending words", "en", "src1", 0L),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "), "en", "src2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val pairs = CurationQueries.extDedupChunk.run(spark, tmp.toString)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L
      && r.getAs[Long]("doc_b") == 2L))
    assert(!pairs.exists(r => r.getAs[Long]("doc_a") == 3L
      || r.getAs[Long]("doc_b") == 3L))
  }

  test("scd2 history: one open row per user, intervals chain exactly") {
    val h = CurationQueries.extScd2History.run(spark, dir)
    val users = h.select($"user_id").distinct().count()
    assert(h.where($"is_current").count() === users)
    // each closed row's valid_to equals the user's next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"valid_from", $"event_id")
    val chained = h.withColumn("next_from", lead($"valid_from", 1).over(w))
    assert(chained.where($"valid_to".isNotNull
      && ($"valid_to" =!= $"next_from")).count() === 0)
  }

  test("bloom prefilter equals the exact anti-join it accelerates") {
    val got = CurationQueries.extBloomPrefilter.run(spark, dir)
      .collect().toSeq
    val docs = Tables.load(spark, dir, "documents")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"source").orderBy($"doc_id")
    val want = docs.withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id").collect().toSeq
    assert(got === want)
  }

  test("decontamination flags the doc sharing an 8-gram with the eval set") {
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("curation_decon")
    Seq(
      (5L, s"eval doc text $run end of it", "en", "src0", 0L),
      (100L, s"training doc containing $run plus unrelated tail words", "en", "src1", 0L),
      (200L, (1 to 30).map(i => s"q$i").mkString(" "), "en", "src2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val flagged = CurationQueries.extDecontaminate.run(spark, tmp.toString)
      .collect()
    assert(flagged.map(_.getAs[Long]("doc_id")).toSeq === Seq(100L))
    assert(flagged.head.getAs[Long]("n_contaminated_grams") >= 3)
  }

  test("vocab OOV: fractions bounded, token counts exact, deterministic") {
    val a = CurationQueries.extVocabOov.run(spark, dir)
    val rows = a.collect()
    rows.foreach { r =>
      val f = r.getAs[Double]("oov_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    val counts = Tables.load(spark, dir, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("bigint").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("n_tokens") === counts(r.getAs[Long]("doc_id"))))
    assert(rows.toSeq === CurationQueries.extVocabOov.run(spark, dir)
      .collect().toSeq)
  }

  test("curation pipeline: invariants of every stage hold on the output") {
    val manifest = CurationQueries.extCurationPipeline.run(spark, dir)
    val kept = manifest.collect()
    assert(kept.nonEmpty)
    // eval docs excluded
    assert(kept.forall(_.getAs[Long]("doc_id") >= 10L))
    // no two kept docs share content (exact-dedup stage)
    val docs = Tables.load(spark, dir, "documents")
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    val hashes = docs.where($"doc_id".isin(keptIds.toSeq: _*))
      .select(md5($"text")).collect().map(_.getString(0))
    assert(hashes.length === hashes.distinct.length)
    // decontamination: no kept doc shares an 8-gram with the eval set
    val overlap = CurationQueries.extDecontaminate.run(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptIds.intersect(overlap).isEmpty)
    // split census sums to the manifest and is ~90/5/5
    val bySplit = kept.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.length).toMap
    assert(bySplit.values.sum === kept.length)
    assert(bySplit("train").toDouble / kept.length > 0.8)
  }

  test("source overlap: full pair matrix, jaccard bounded, symmetric-free") {
    val m = CurationQueries.extSourceOverlap.run(spark, dir).collect()
    val nSources = Tables.load(spark, dir, "documents")
      .select($"source").distinct().count().toInt
    assert(m.length === nSources * (nSources - 1) / 2)
    m.foreach { r =>
      val j = r.getAs[Double]("vocab_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      // doc_a < doc_b convention: each unordered pair appears once
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("label centroid: one cosine per vector, bounded, deterministic") {
    val a = CurationQueries.extLabelCentroid.run(spark, dir).collect()
    assert(a.length === Tables.load(spark, dir, "embeddings").count())
    a.foreach { r =>
      val c = r.getAs[Double]("cos_to_centroid")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
    val b = CurationQueries.extLabelCentroid.run(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("stream-stream join matches the batch range join") {
    val got = CurationQueries.extStreamJoin.run(spark, dir).collect().toSeq
    val e = Tables.load(spark, dir, "events")
    val p = e.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
    val c = e.where($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"),
        $"ts".as("click_ts"))
    val want = p.join(c, $"cu" === $"user_id"
        && $"click_ts" <= $"purchase_ts"
        && $"click_ts" >= $"purchase_ts" - expr("INTERVAL 1800 SECONDS"))
      .select($"user_id", $"purchase_id", $"purchase_ts",
        $"click_id", $"click_ts")
      .orderBy($"purchase_id", $"click_id").collect().toSeq
    assert(got === want)
  }

  test("near-dup components: pair-consistent labels, one survivor each") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001 has too few collisions
    val comps = graft.queries.ExtQueries.extDedupComponents
      .run(spark, sf01).collect()
    assert(comps.nonEmpty)
    val label = comps.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    // labels converged: both endpoints of every near-dup pair share a
    // component, and the label is a real member id ≤ every member
    val pairs = graft.queries.ExtQueries.jaccardPairs(spark, sf01)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(label(a) === label(b), s"pair ($a,$b) split across components")
    }
    label.foreach { case (id, c) => assert(c <= id && label(c) === c) }
    // exactly one survivor per component, and it is the min member
    val byComp = comps.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (c, members) =>
      val keepers = members.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length === 1)
      assert(keepers.head.getAs[Long]("doc_id")
        === members.map(_.getAs[Long]("doc_id")).min)
      assert(keepers.head.getAs[Long]("doc_id") === c)
    }
  }

  test("token-budget sample: bounded per source, deterministic, binding") {
    val sf01 = "/root/testdata/sf0.01"
    val a = CurationQueries.extTokenBudget.run(spark, sf01).collect()
    val b = CurationQueries.extTokenBudget.run(spark, sf01).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    val bySource = a.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, docs) =>
      val total = docs.map(_.getAs[Long]("tokens")).sum
      assert(total <= 800L, s"$src over budget: $total")
      assert(total === docs.map(_.getAs[Long]("cum_tokens")).max)
    }
    // the budget actually binds: not every document was selected
    val corpus = Tables.load(spark, sf01, "documents").count()
    assert(a.length < corpus)
  }

  test("sequence packing: chunk arithmetic is a consistent manifest") {
    val rows = CurationQueries.extPackSequences.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val C = 512L
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      var prevEnd = 0L
      ordered.foreach { r =>
        val tokens = r.getAs[Long]("tokens")
        val start = r.getAs[Long]("start_chunk")
        val end = r.getAs[Long]("end_chunk")
        // recompute the cumulative stream: start/end derive from it
        assert(start === cum / C)
        assert(end === (cum + tokens - 1) / C)
        assert(r.getAs[Long]("n_chunks") === end - start + 1)
        // the stream is gapless: a doc starts in the chunk where the
        // previous doc ended (or the next one at an exact boundary)
        assert(start === prevEnd || start === prevEnd + 1)
        cum += tokens
        prevEnd = end
      }
    }
  }
}
