package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One local session per suite (mirrors the reference's session-scoped
  * conftest fixture, etl/test/conftest.py:6-77 — but with codegen left ON
  * and UTC forced).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    // SessionTuning here too: every suite then exercises the NIO local
    // filesystem the benched engine runs on (a regression in it fails
    // the whole suite, not just the bench)
    val s = SessionTuning(SparkSession.builder())
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      // suites own every table they vacuum and want instant reclaim;
      // the retention guard's own spec re-enables the check explicitly
      .config("spark.graft.lake.retentionDurationCheck", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
