package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bucketing, SkewJoin}
import graft.functions.CosineSimilarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the higher-order-function fold bitwise") {
    CosineSimilarity.register(spark)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val a = emb.as("a")
    val b = emb.as("b")
    val pairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .where(col("a.vec_id") < 5 && col("b.vec_id") < 20)
      .select(col("a.e").as("ea"), col("b.e").as("eb"))
    val both = pairs.select(
      expr("cosine_sim(ea, eb)").as("native"),
      (expr("aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        / (sqrt(expr("aggregate(zip_with(ea, ea, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
          * sqrt(expr("aggregate(zip_with(eb, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))))
        .as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_sim is usable from spark.sql and handles nulls") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 0D), array(1D, 0D)) AS c," +
        " cosine_sim(CAST(null AS ARRAY<DOUBLE>), array(1D)) AS n")
      .collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.isNullAt(1))
  }

  test("cosine_sim yields NULL on mismatched lengths, like the fold") {
    CosineSimilarity.register(spark)
    // interpreted path and codegen'd path both: the fold formulation
    // (zip_with pads with null → null propagates) returns NULL for
    // ragged arrays, and the native expression must match
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 2D, 3D), array(1D, 2D)) AS ragged," +
        " aggregate(zip_with(array(1D, 2D, 3D), array(1D, 2D)," +
        "   (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS fold")
      .collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
  }
}

class GraftExtensionsSpec extends SparkSpec {
  test("SparkSessionExtensions route installs the native functions") {
    val base = spark // make sure the shared context is up
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    // new session object on the SAME SparkContext, with extensions wired
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT cosine_sim(array(1D, 0D), array(1D, 0D)) AS c," +
          " hyperplane_bands(array(1D, 0D), 2, 2) AS b")
        .collect().head
      assert(r.getDouble(0) === 1.0)
      assert(r.getSeq[Int](1).length === 2)
    } finally {
      // restore the suite-shared session (do NOT stop s2 — shared context)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 10k rows of hot key 1 + a tail
    val big = spark.range(10000).select(lit(1L).as("k"), $"id".as("v"))
      .union(spark.range(100).select(($"id" % 7).as("k"), $"id".as("v")))
    val small = Seq((0L, "z"), (1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"), "inner")
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.orderBy("k").collect().toSeq
      === plain.orderBy("k").collect().toSeq)
  }
}

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without any shuffle exchange") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    val joined = Bucketing.bucketedJoin(
      spark, "b_orders", "b_lineitem", "o_orderkey")
    assert(joined.count() > 0)
    // disable broadcast to force the join to prove bucket co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val forced = Bucketing.bucketedJoin(
        spark, "b_orders", "b_lineitem", "o_orderkey")
      forced.count()
      assert(Bucketing.isShuffleFree(forced),
        forced.queryExecution.executedPlan.toString)
    } finally spark.conf
      .set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}

class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("z-order prunes on BOTH dimensions; range layout on one") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", dayofmonth($"ts").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_z")
    val z = tmp.resolve("z").toString
    val byUser = tmp.resolve("byUser").toString
    val parts = 16
    graft.ext.ZOrderLayout.writeZOrder(ev, z, "user_id", "day", 10, parts)
    graft.ext.RangeLayout.writeRangeLayout(ev, byUser, "user_id", parts)
    assert(spark.read.parquet(z).count() === ev.count())
    // narrow slices on each dimension (~1/10 of users, ~1/10 of days)
    val userPred = "user_id >= 30 AND user_id < 45"
    val dayPred = "day >= 3 AND day < 6"
    def touched(path: String, pred: String) =
      graft.ext.RangeLayout.filesTouched(spark, path, pred)
    // single-column layout: perfect on its own column, useless on the other
    assert(touched(byUser, userPred) <= 3)
    assert(touched(byUser, dayPred) >= parts - 2)
    // z-order: bounded on BOTH dimensions (√F-ish locality; a ~1/10
    // slice can straddle two top-level curve quadrants, so the loose
    // bound is "well under the ~all-files of the wrong-dimension case")
    assert(touched(z, userPred) <= 10,
      s"z layout touched ${touched(z, userPred)} files for a user slice")
    assert(touched(z, dayPred) <= 10,
      s"z layout touched ${touched(z, dayPred)} files for a day slice")
  }
}

class RangeLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range layout localizes a narrow filter to few files") {
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout")
    val ranged = tmp.resolve("ranged").toString
    val hashed = tmp.resolve("hashed").toString
    graft.ext.RangeLayout.writeRangeLayout(li, ranged, "l_shipdate", 8)
    li.repartition(8).write.mode("overwrite").parquet(hashed)
    // identical data under both layouts
    assert(spark.read.parquet(ranged).count() === li.count())
    // a ~1/8th shipdate slice (data spans 1995-01..2001-11): under range
    // layout its rows live in 1-2 adjacent files; under hash layout they
    // spread over every file
    val pred = "l_shipdate >= '1995-01-01' AND l_shipdate < '1995-11-01'"
    val fRange = graft.ext.RangeLayout.filesTouched(spark, ranged, pred)
    val fHash = graft.ext.RangeLayout.filesTouched(spark, hashed, pred)
    assert(fRange <= 3, s"range layout touched $fRange files")
    assert(fHash >= 7, s"hash layout touched only $fHash files")
    // and the slice itself is identical (as a multiset — the synthetic
    // lineitem has duplicate (orderkey, linenumber) pairs, so no short
    // column list gives a total order)
    val a = spark.read.parquet(ranged).where(pred)
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(hashed).where(pred)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}

/** The 100-TB skew story's OTHER half: [[graft.ext.SkewJoin]] shows
  * explicit salting; this shows the engine's own runtime remedy — AQE
  * detecting a skewed shuffle partition after the map stage and
  * splitting it across reducers — works under the session's planning,
  * so a hot key degrades into extra parallelism instead of one
  * straggler task. Thresholds are forced low to make a local-size
  * dataset "skewed"; the mechanism is identical at scale.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot key's partition in a sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // half the big side lands on key 0 (the hot partition must exceed
      // skewedPartitionFactor × the MEDIAN partition size, so the skew
      // has to dwarf the even remainder); payload inflates bytes
      val big = spark.range(120000).select(
        when($"id" % 2 === 0, 0L).otherwise($"id" % 1000).as("k"),
        concat(lit("x" * 120), $"id".cast("string")).as("payload"))
      val dim = spark.range(1000).select($"id".as("k"),
        concat(lit("d"), $"id".cast("string")).as("attr"))
      val joined = big.join(dim, "k")
      // collect() executes THIS dataset's plan (count() would build its
      // own aggregate plan and leave this one unfinalized)
      assert(joined.collect().length === 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

/** Regression coverage for the stale-managed-table-location cases
  * writeBucketed handles: a dead session's leftover directory (no
  * catalog entry) and a non-default database layout.
  */
class BucketedStaleLocationSpec extends SparkSpec {
  import spark.implicits._

  test("writeBucketed clears a dead session's leftover directory") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // simulate the dead-session residue: location exists, catalog empty
    val loc = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "stale_orphan_tbl")
    loc.mkdirs()
    java.nio.file.Files.writeString(
      loc.toPath.resolve("junk.parquet"), "not parquet")
    graft.ext.Bucketing.writeBucketed(df, "stale_orphan_tbl", "k", 2)
    assert(spark.table("stale_orphan_tbl").count() === 2)
  }

  test("writeBucketed resolves db-qualified locations for overwrites") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bspec")
    // twice: the second write exercises the catalog-location resolution
    graft.ext.Bucketing.writeBucketed(df, "graft_bspec.tbl", "k", 2)
    graft.ext.Bucketing.writeBucketed(df, "graft_bspec.tbl", "k", 2)
    assert(spark.table("graft_bspec.tbl").count() === 3)
    // and the dead-session path for the qualified name: drop from the
    // catalog, recreate the derived location, write again
    spark.sql("DROP TABLE graft_bspec.tbl")
    val loc = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "graft_bspec.db/tbl")
    loc.mkdirs()
    graft.ext.Bucketing.writeBucketed(df, "graft_bspec.tbl", "k", 2)
    assert(spark.table("graft_bspec.tbl").count() === 3)
  }

  test("writeBucketed refuses to destroy an EXTERNAL table's location") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val ext = java.nio.file.Files
      .createTempDirectory("graft_ext_tbl").toFile
    df.write.mode("overwrite").parquet(ext.getPath)
    spark.sql("DROP TABLE IF EXISTS ext_guard_tbl")
    // a datasource table with an explicit LOCATION is EXTERNAL
    spark.sql(s"CREATE TABLE ext_guard_tbl (k BIGINT, v STRING) " +
      s"USING PARQUET LOCATION '${ext.getPath}'")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Bucketing.writeBucketed(df, "ext_guard_tbl", "k", 2)
    }
    assert(e.getMessage.contains("EXTERNAL"))
    // the user data must be untouched
    assert(spark.read.parquet(ext.getPath).count() === 1)
    spark.sql("DROP TABLE ext_guard_tbl")
  }
}
