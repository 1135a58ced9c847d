package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.checks._
import graft.core.FixedClock
import graft.layers.{BronzeNode, EtlContext}
import graft.sources.InMemorySource

/** Declarative DQ suites (reference parity: etl/utils/base_table.py:155-167
  * selects `expectations/<table>.json` at runtime; the suites under
  * etl/great_expectations/expectations are plain GE JSON). Pins: the
  * reference's own file shape parses into the ADT, unknown rules refuse to
  * load, and — the point of the feature — a threshold edit in the FILE
  * changes gate behavior with zero recompilation.
  */
class CheckSuitesSpec extends SparkSpec {

  // the reference's orders.json, verbatim shape — including the string
  // "True" GE writes for strict_max
  private val referenceShaped =
    """{
      |  "expectation_suite_name": "orders",
      |  "expectations": [
      |    {"expectation_type": "expect_column_values_to_be_unique",
      |     "kwargs": {"column": "order_date"}},
      |    {"expectation_type": "expect_column_max_to_be_between",
      |     "kwargs": {"column": "total_price_mean",
      |                "min_value": 0, "max_value": 100000,
      |                "strict_max": "True"}}
      |  ]
      |}""".stripMargin

  test("the reference's own suite shape parses into the compiled ADT") {
    assert(CheckSuites.parse(referenceShaped) ===
      Seq(Unique(Seq("order_date")),
        MaxInRange("total_price_mean", 0, 100000, strict = true)))
  }

  test("every supported expectation type maps; unknown types refuse to load") {
    val all = CheckSuites.parse(
      """{"expectations": [
        |  {"expectation_type": "expect_compound_columns_to_be_unique",
        |   "kwargs": {"column_list": ["a", "b"]}},
        |  {"expectation_type": "expect_column_values_to_not_be_null",
        |   "kwargs": {"column": "c"}},
        |  {"expectation_type": "expect_column_values_to_not_be_null",
        |   "kwargs": {"column": "d", "mostly": 0.95}},
        |  {"expectation_type": "expect_table_row_count_to_be_between",
        |   "kwargs": {"min_value": 1, "max_value": 500}},
        |  {"expectation_type": "expect_column_values_to_be_in_set",
        |   "kwargs": {"column": "e", "value_set": ["x", "y"]}}
        |]}""".stripMargin)
    assert(all(0) === Unique(Seq("a", "b")))
    assert(all(1) === NotNull(Seq("c")))
    assert(all(2).isInstanceOf[NullRatioBelow])
    val nr = all(2).asInstanceOf[NullRatioBelow]
    assert(nr.column === "d" && math.abs(nr.maxRatio - 0.05) < 1e-9)
    assert(all(3) === RowCountInRange(1, 500))
    assert(all(4) === ValuesInSet("e", Seq("x", "y")))
    intercept[IllegalArgumentException](CheckSuites.parse(
      """{"expectations": [{"expectation_type": "expect_column_magic",
        |"kwargs": {}}]}""".stripMargin))
  }

  test("editing a threshold in the suite FILE flips the gate — no recompile") {
    val suiteDir = Files.createTempDirectory("dq_suites").toString
    def writeSuite(maxValue: Double): Unit =
      Files.writeString(Paths.get(suiteDir, "region.json"),
        s"""{"expectations": [
           |  {"expectation_type": "expect_column_max_to_be_between",
           |   "kwargs": {"column": "r_regionkey",
           |              "min_value": -1, "max_value": $maxValue}}
           |]}""".stripMargin)
    val region = spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      concat(lit("REGION-"), col("id")).as("r_name"))
    def node(src: org.apache.spark.sql.DataFrame = region): BronzeNode =
      new BronzeNode(
        EtlContext(spark, InMemorySource(Map("region" -> src)),
          basePath = "unused", writeData = false, clock = FixedClock.default,
          checkSuiteDir = Some(suiteDir)),
        "region", "region", Seq("r_regionkey"), Seq("r_regionkey", "r_name"),
        checks = Seq(Unique(Seq("r_regionkey"))))
    writeSuite(maxValue = 10) // max key is 4: passes
    node().run()
    writeSuite(maxValue = 3) // the steward tightens the bound: same binary fails
    val e = intercept[graft.core.InvalidDataException](node().run())
    assert(e.getMessage.contains("max"))
    // while the file is live, it REPLACES the compiled unique check:
    // duplicate keys sail through under the file's max-only suite
    writeSuite(maxValue = 10)
    node(region.unionAll(region)).run()
    // file deleted → the compiled unique check takes over and fires
    Files.delete(Paths.get(suiteDir, "region.json"))
    node().run()
    intercept[graft.core.InvalidDataException](
      node(region.unionAll(region)).run())
  }
}
