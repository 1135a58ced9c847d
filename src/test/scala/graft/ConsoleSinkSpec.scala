package graft

import graft.core.FixedClock
import graft.layers.{EtlContext, Interface, Rainforest}
import graft.sources.RainforestFromTpch

/** The console report sink (SURVEY §2 S8 — the reference's run_etl.py
  * prints the stakeholder views with .show()): the one operator whose
  * output is a rendered terminal table, not a frame an oracle can hash.
  * Captures RunEtl's exact surface — fixed-clock pipeline run →
  * interface view → .show() — and asserts the rendered header and the
  * rendered row count against the view itself.
  */
class ConsoleSinkSpec extends SparkSpec {

  test("the .show() sink renders the daily order report header and rows") {
    val lake =
      java.nio.file.Files.createTempDirectory("graft_lake_console").toString
    val rf = new Rainforest(EtlContext(
      spark, RainforestFromTpch("/root/testdata/sf0.001"), lake,
      clock = FixedClock.default))
    val order = rf.ctx.registry.runOnce(rf.dailyOrderMetrics)
    Interface.createDailyOrderReportView(order.data)
    val report = Interface.dailyOrderReport(spark)

    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(buf) { report.show() } // RunEtl's exact call
    val out = buf.toString("UTF-8")
    val tableLines = out.linesIterator.filter(_.startsWith("|")).toSeq
    assert(tableLines.nonEmpty, s"no rendered table in: $out")

    // header row carries the stakeholder-facing column names (the view
    // renames order_date/total_price_sum/total_price_mean)
    val header = tableLines.head
    for (colName <- Seq("Date", "Revenue", "Mean Revenue"))
      assert(header.contains(colName), s"header missing $colName: $header")

    // rendered data rows = min(20, view rows) — .show()'s default page —
    // with the truncation trailer if and only if the view overflows it
    val total = report.count()
    val expected = math.min(20L, total)
    assert(expected > 0, "fixture must render at least one data row")
    assert((tableLines.size - 1).toLong === expected,
      s"rendered ${tableLines.size - 1} rows, view has $total")
    assert(out.contains("only showing top 20 rows") === (total > 20),
      "truncation trailer must match view size")
  }
}
