package graft

import org.apache.spark.sql.SparkSession

import graft.core.FixedClock
import graft.layers.{EtlContext, Rainforest}
import graft.sources.RainforestFromTpch

/** Dev harness: build the full medallion lineage N times (default 2)
  * into FRESH lake roots inside one JVM, printing per-node build
  * seconds each pass. Separates one-time session costs (codegen /
  * writer / commit machinery warmup, absorbed by whichever node runs
  * FIRST — historically `dim_buyer` and its `appuser` upstream) from a
  * node's steady-state cost: a first-pass outlier that flattens on
  * pass 2 is warmup, not the node.
  *
  * Usage: runMain graft.LineageOnce [sfDir] [passes]
  */
object LineageOnce {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val stamp = java.util.UUID.randomUUID.toString.take(8)
    (1 to passes).foreach { pass =>
      graft.core.LineageTimings.clear()
      val base = s"${System.getProperty("java.io.tmpdir", "/tmp")}" +
        s"/graft_lineage_once/$stamp/pass$pass"
      val rf = new Rainforest(EtlContext(
        spark, RainforestFromTpch(sfDir), base, dataFormat = "txlog",
        clock = FixedClock.default))
      val t0 = System.nanoTime()
      (rf.silver ++ rf.gold).foreach(n => rf.ctx.registry.runOnce(n))
      val total = (System.nanoTime() - t0) / 1e9
      val times = graft.core.LineageTimings.snapshot.toSeq
        .sortBy(-_._2)
      println(f"[lineageonce] pass $pass total $total%.2f s")
      times.foreach { case (n, sec) =>
        println(f"[lineageonce]   $n%-24s ${sec}%.3f s")
      }
    }
    spark.stop()
  }
}
