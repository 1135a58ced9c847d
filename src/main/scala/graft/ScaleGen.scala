package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived BENCH corpus generator — emphatically NOT an oracle input
  * (correctness stays gated on the driver's own testdata): replicate the
  * testdata N× so the scale spot-bench (BASELINE.md §scaling) can
  * measure empirical sf0.1→sf1 exponents instead of trusting the
  * "caps make it linear" claims.
  *
  * Fidelity decisions, per table family:
  *   - keyed tables replicate with SHIFTED keys (primary and foreign by
  *     the same per-table offset) so referential joins hold and per-key
  *     densities stay exactly the original's — copy i is a disjoint,
  *     identically-distributed universe;
  *   - document TEXT is token-remapped per copy (`c<i>x` prefix on every
  *     token) so cross-copy shingle/minhash similarity is ZERO — naive
  *     replication would make every document a 10-way near-duplicate and
  *     quadratically explode exactly the pair counts the dedup bench is
  *     supposed to show scaling linearly;
  *   - embeddings get a small deterministic per-copy jitter so no
  *     cross-copy zero-distance twins skew ANN top-k neighborhoods;
  *   - nation/region (bounded dimensions) copy once, unshifted.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> [copies=10]
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    def t(n: String) = Tables.load(spark, src, n)
    // one shift span per key domain: max+1 guarantees copy universes are
    // disjoint even for dense 0..max key spaces
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    val custSpan = span(t("customer"), "c_custkey")
    val ordSpan = span(t("orders"), "o_orderkey")
    val partSpan = span(t("part"), "p_partkey")
    val suppSpan = span(t("supplier"), "s_suppkey")
    val evSpan = span(t("events"), "event_id")
    val docSpan = span(t("documents"), "doc_id")
    val vecSpan = span(t("embeddings"), "vec_id")

    // the driver testdata convention is ONE parquet FILE per table (the
    // stream feed helpers link `<dir>/events.parquet` as a file); write
    // to a staging dir and move the single part file into place —
    // row-group splitting keeps scans parallel despite the single file
    def writeOneFile(df: DataFrame, name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("scalegen")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .filter(f => f.getName.startsWith("part-")
          && f.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(out, s"$name.parquet")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def replicate(name: String)(perCopy: (DataFrame, Int) => DataFrame)
        : Unit = {
      val base = t(name)
      val all = (0 until copies).map(i => perCopy(base, i))
        .reduce(_ unionAll _)
      writeOneFile(all, name)
      println(s"[scalegen] $name x$copies -> $out/$name.parquet")
    }
    def shift(df: DataFrame, i: Int, cols: (String, Long)*): DataFrame =
      cols.foldLeft(df) { case (d, (c, sp)) =>
        d.withColumn(c, col(c) + lit(i * sp))
      }

    replicate("customer")((d, i) => shift(d, i, "c_custkey" -> custSpan))
    replicate("orders")((d, i) =>
      shift(d, i, "o_orderkey" -> ordSpan, "o_custkey" -> custSpan))
    replicate("lineitem")((d, i) =>
      shift(d, i, "l_orderkey" -> ordSpan, "l_partkey" -> partSpan,
        "l_suppkey" -> suppSpan))
    replicate("part")((d, i) => shift(d, i, "p_partkey" -> partSpan))
    replicate("supplier")((d, i) => shift(d, i, "s_suppkey" -> suppSpan))
    replicate("events")((d, i) =>
      shift(d, i, "event_id" -> evSpan, "user_id" -> custSpan))
    replicate("documents") { (d, i) =>
      val s = shift(d, i, "doc_id" -> docSpan)
      if (i == 0) s
      else s
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"c${i}x$$1"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (d, i) =>
      val s = shift(d, i, "vec_id" -> vecSpan)
      if (i == 0) s
      else s.withColumn("embedding", expr(
        s"""transform(embedding, (x, j) ->
           |CAST(x + 0.01 * (CAST((vec_id * 31 + j * 7 + $i * 13) % 17
           |AS DOUBLE) - 8.0) AS FLOAT))""".stripMargin))
    }
    Seq("nation", "region").foreach { n =>
      writeOneFile(t(n), n)
      println(s"[scalegen] $n x1 -> $out/$n.parquet")
    }
  }
}
