package graft

import org.apache.spark.sql.functions._

import graft.queries.{CorpusQueries, ScaleQueries}

/** Property tests for the round-4 corpus-construction operators. The
  * driver's DuckDB oracle certifies cross-engine value equality; these
  * specs pin the SEMANTIC contracts the oracle SQL alone can't express
  * (selection minimality, budget conservation, index invertibility, the
  * shuffle-free physical plan).
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("cross-source dedup keeps the min-(priority, doc_id) copy per group") {
    val kept = CorpusQueries.extCrossSourceDedup.run(spark, dir).collect()
    assert(kept.nonEmpty)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"source",
        size(split($"text", " ")).cast("bigint").as("n_words"),
        (expr("cast(substring(source, 4, 10) as int)") % 4).as("priority"))
      .collect()
      .groupBy(r => (r.getString(1), r.getLong(3)))
    kept.foreach { k =>
      val group = docs((k.getString(0), k.getLong(1)))
      assert(group.length === k.getLong(2), "n_copies is the group size")
      val best = group.minBy(r => (r.getInt(4), r.getLong(0)))
      assert(k.getLong(3) === best.getLong(0), "keep_doc_id is the best copy")
      assert(k.getString(4) === best.getString(2))
    }
    // only real duplicate groups are reported
    assert(kept.forall(_.getLong(2) >= 2))
  }

  test("mixture weights conserve the token budget and cap sampling at 1") {
    val rows = CorpusQueries.extMixtureWeights.run(spark, dir).collect()
    val nSources = Tables.load(spark, dir, "documents")
      .select($"source").distinct().count()
    assert(rows.length === nSources)
    val budget = rows.map(_.getAs[Double]("target_tokens")).sum
    assert(math.abs(budget - 100000.0) < 1e-6, "targets partition the budget")
    rows.foreach { r =>
      val avail = r.getAs[Long]("tokens_available").toDouble
      val epochs = r.getAs[Double]("epochs")
      val weight = r.getAs[Double]("sample_weight")
      assert(weight <= 1.0 + 1e-12)
      assert(math.abs(epochs * avail - r.getAs[Double]("target_tokens")) < 1e-6)
      assert(r.getAs[String]("direction")
        === (if (epochs > 1.0) "upsample" else "downsample"))
    }
  }

  test("inverted index postings parse back to real gram occurrences") {
    val idx = CorpusQueries.extInvertedIndex.run(spark, dir)
      .limit(50).collect()
    assert(idx.nonEmpty)
    val texts = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    idx.foreach { r =>
      val gram = r.getString(0)
      val postings = r.getString(2).split(" ")
      assert(postings.length === r.getLong(1), "df = posting-list length")
      // docs ascending
      val docIds = postings.map(_.split(":")(0).toLong)
      assert(docIds.sameElements(docIds.sorted))
      postings.foreach { p =>
        val Array(doc, poslist) = p.split(":")
        val words = texts(doc.toLong).split(" ")
        poslist.split("-").map(_.toInt).foreach { pos =>
          assert(words.slice(pos, pos + 3).mkString(" ") === gram,
            s"position $pos in doc $doc holds the gram")
        }
      }
    }
  }

  test("shard assignment balances token totals to within one max doc") {
    val out = CorpusQueries.extShardBalance.run(spark, dir).collect()
    assert(out.nonEmpty)
    val byShard = out.groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("tokens")).sum)
    assert(byShard.size === 8, "all 8 shards populated")
    val maxDoc = out.map(_.getAs[Long]("tokens")).max
    assert(byShard.values.max - byShard.values.min <= maxDoc,
      s"LPT round-robin keeps shards within one max document: $byShard")
  }

  test("cdc apply deletes, upserts and passes through the right keys") {
    val out = CorpusQueries.extCdcApply.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val base = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(base.nonEmpty)
    base.foreach { case (k, b) =>
      if (k % 15 == 0) assert(!out.contains(k), s"$k deleted")
      else if (k % 5 == 0) {
        assert(out(k).getString(1) === "X", s"$k upserted status")
        val expected = BigDecimal(b.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 2
        assert(math.abs(out(k).getDouble(2) - expected.toDouble) < 1e-9)
      } else {
        assert(out(k).getString(1) === b.getString(1), s"$k untouched")
      }
    }
    assert(out.size === base.count { case (k, _) => k % 15 != 0 })
  }

  test("ks drift statistic matches a driver-side exact recompute") {
    val out = CorpusQueries.extKsDrift.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val data = Tables.load(spark, dir, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val all = data.map(_._2).sorted
    def ecdf(xs: Array[Long], v: Long): Double = {
      var lo = 0; var hi = xs.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (xs(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toDouble / xs.length
    }
    data.groupBy(_._1).foreach { case (src, rows) =>
      val xs = rows.map(_._2).sorted
      val ks = all.distinct.map(v =>
        math.abs(ecdf(xs, v) - ecdf(all, v))).max
      assert(math.abs(out(src) - ks) < 1e-12,
        s"$src: query=${out(src)} exact=$ks")
      assert(out(src) >= 0.0 && out(src) <= 1.0)
    }
  }

  test("the bucketed-join layout joins with zero shuffle exchanges") {
    ScaleQueries.writeBucketed(spark, dir)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val joined = spark.table(ScaleQueries.bucketedName("orders", dir))
        .join(spark.table(ScaleQueries.bucketedName("customer", dir)),
          col("o_custkey") === col("c_custkey"))
      joined.count()
      assert(graft.ext.Bucketing.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString)
    } finally spark.conf.set(key, prev)
  }

  test("bootstrap CI matches a driver-side replicate recompute") {
    val out = CorpusQueries.extBootstrapCi.run(spark, dir).collect()
    val data = Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    assert(out.length === data.size)
    out.foreach { r =>
      val src = r.getString(0)
      val vals = data(src).sortBy(_._2).map(_._3)
      val n = vals.length
      val reps = (0 until 50).map { b =>
        val s = (0 until n).map { j =>
          vals(((1103515245L * b + 69069L * j + 12345L) % n).toInt)
        }.sum
        s.toDouble / n.toDouble
      }.sorted
      assert(math.abs(r.getAs[Double]("ci_lo") - reps(1)) < 1e-12)
      assert(math.abs(r.getAs[Double]("ci_hi") - reps(48)) < 1e-12)
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    }
  }

  test("the dry-run pipeline query writes nothing to its lake root") {
    graft.queries.PipelineQueries.dryRunReport.run(spark, dir).count()
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), "graft_lake_dry", safe)
    assert(!java.nio.file.Files.exists(root),
      s"dry run must not materialize a lake at $root")
  }

  test("salted-join query equals the unsalted formulation") {
    val salted = ScaleQueries.extSkewSaltedJoin.run(spark, dir).collect()
    val li = Tables.load(spark, dir, "lineitem")
    val sup = Tables.load(spark, dir, "supplier")
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
      .orderBy($"s_nationkey").collect()
    assert(salted.toSeq === plain.toSeq)
  }
}

/** The (lang, head-token) block-population cap in the edit-distance
  * near-dup family (the 100 TB hot-key guard shared with the
  * MinHash/SimHash bucket caps): a stop-word head token must not become
  * a quadratic self-join key. Pins BOTH sides of the trade-off — a hot
  * block is dropped entirely, and near-dups in cool blocks still pair.
  */
class EditDistCapSpec extends SparkSpec {
  import spark.implicits._

  test("a hot head-token block is dropped; cool-block near-dups survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_editcap")
    val cap = graft.queries.ExtQueries.lshBucketCap.toInt
    // hot block: cap+2 docs all headed by the stop word "The", pairwise
    // near-identical prefixes — uncapped this is (cap+2)(cap+1)/2 pairs
    val hot = (0 until cap + 2).map { i =>
      (i.toLong, f"The quick brown fox number $i%03d jumps on", "en", "s",
        40L)
    }
    // cool block: one crafted near-dup pair under a rare head token
    val cool = Seq(
      (9000L, "Zyzzyva report alpha beta gamma delta", "en", "s", 37L),
      (9001L, "Zyzzyva report alpha beta gamma delt", "en", "s", 36L))
    (hot ++ cool).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CorpusQueries.extDedupEditDistance
      .run(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((9000L, 9001L)),
      "only the cool-block pair survives; the hot block contributes none")
  }
}

/** Span-level substring dedup: the gaps-and-islands run length must
  * translate exactly into token-span length, sub-threshold overlaps must
  * stay silent, and only genuinely overlapping pairs may appear.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  test("a shared 20-token block reports a 20-token span; 9 tokens do not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_span")
    val block = (1 to 20).map(i => s"c$i").mkString(" ")
    val small = (1 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, ((1 to 10).map(i => s"a$i").mkString(" ")) + " " + block,
        "en", "s", 0L),
      (1L, ((1 to 12).map(i => s"b$i").mkString(" ")) + " " + block,
        "en", "s", 0L),
      // 9 shared tokens = a run of 2 grams, below the 3-run threshold
      (2L, ((1 to 10).map(i => s"d$i").mkString(" ")) + " " + small,
        "en", "s", 0L),
      (3L, ((1 to 10).map(i => s"e$i").mkString(" ")) + " " + small,
        "en", "s", 0L),
      (4L, (1 to 40).map(i => s"f$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CurationQueries.extDedupSubstringSpan
      .run(spark, dir.toString).collect()
    assert(out.length === 1, out.mkString(", "))
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === (0L, 1L))
    assert(r.getLong(2) === 20L, "13 consecutive grams cover 20 tokens")
    assert(r.getLong(3) === 1L, "one island on one diagonal")
  }
}

/** PSI drift: the binned index must match a driver-side recompute of
  * the textbook formula, and a genuinely shifted source must cross the
  * 0.25 threshold while identically-distributed sources stay near 0.
  */
class PsiDriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiOf(rows: Seq[(String, Long)]): Map[String, Double] = {
    val all = rows.map(_._2)
    val (vmin, vmax) = (all.min, all.max)
    def bin(v: Long): Long = math.min(9L, (v - vmin) * 10 / (vmax - vmin + 1))
    val nAll = all.size.toLong
    val cAll = all.groupBy(bin).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).map { case (src, rs) =>
      val nS = rs.size.toLong
      val cS = rs.map(r => bin(r._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val psi = (0L until 10L).map { b =>
        val ps = (cS.getOrElse(b, 0L) + 1).toDouble / (nS + 10)
        val pc = (cAll.getOrElse(b, 0L) + 1).toDouble / (nAll + 10)
        (ps - pc) * math.log(ps / pc)
      }.sum
      src -> psi
    }
  }

  test("psi matches the textbook recompute on the real corpus") {
    val out = CorpusQueries.extPsiDrift.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val data = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect().toSeq
    val expect = psiOf(data)
    assert(out.keySet === expect.keySet)
    out.foreach { case (src, v) =>
      assert(math.abs(v - expect(src)) < 1e-9, s"$src: $v vs ${expect(src)}")
      assert(v >= 0.0, "PSI is a sum of (p-q)ln(p/q) terms, each >= 0")
    }
  }

  test("a shifted source crosses the 0.25 threshold; stable ones do not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psi")
    // stable sources spread over the LOW half of the range (bins 0-4) so
    // their own mass isn't one hot bin; the shifted source is a small
    // fraction of the corpus (PSI compares source vs the blend, so a
    // large shifted component would legitimately drag every source's
    // index up)
    val stable = (0 until 400).flatMap(i => Seq(
      (i.toLong, "x", "en", "src1", (100 + (i % 50) * 8).toLong),
      (1000L + i, "x", "en", "src2", (100 + (i % 50) * 8).toLong)))
    // src3 concentrates in the top of the range the others never touch
    val shifted = (0 until 20).map(i =>
      (2000L + i, "x", "en", "src3", (900 + i % 50).toLong))
    (stable ++ shifted)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusQueries.extPsiDrift.run(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val bySrc = out.map(r => r._1 -> r).toMap
    assert(bySrc("src3")._3, s"shifted source must flag: ${bySrc("src3")}")
    assert(!bySrc("src1")._3 && !bySrc("src2")._3,
      s"stable sources must not flag: $out")
  }
}

/** Degenerate-corpus edges for the round-5 monitors: a single-valued
  * corpus must not divide by zero or emit NaN, and a pairless corpus
  * must yield an empty (not failing) span report.
  */
class DriftEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("psi on a single-valued corpus is finite and zero-ish") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psi_edge")
    (0 until 50).flatMap(i => Seq(
      (i.toLong, "x", "en", "s1", 100L), (100L + i, "x", "en", "s2", 100L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusQueries.extPsiDrift.run(spark, dir.toString).collect()
    assert(out.length === 2)
    out.foreach { r =>
      val psi = r.getDouble(1)
      assert(!psi.isNaN && !psi.isInfinite)
      // not exactly 0: Laplace smoothing gives each of the 9 EMPTY bins
      // 1/(n_s+10) source mass vs 1/(n_all+10) corpus mass, a small-n
      // bias (~0.05 at n_s=50) that vanishes as n grows — what matters
      // is that identical sources sit far below the 0.25 threshold
      assert(psi < 0.1, s"identical sources must not drift: $psi")
      assert(!r.getBoolean(2))
    }
  }

  test("substring-span dedup on a pairless corpus is empty, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_span_edge")
    // every doc uses a disjoint vocabulary — no shared 8-gram anywhere
    (0 until 5).map(d =>
      (d.toLong, (1 to 20).map(i => s"w${d}_$i").mkString(" "),
        "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CurationQueries.extDedupSubstringSpan
      .run(spark, dir.toString).collect()
    assert(out.isEmpty)
  }
}
