package graft

import java.nio.file.Files

import graft.checks.Checkpoint
import graft.checks.Checkpoint.{YList, YMap, YNull, YStr}

/** The GE checkpoint orchestration analogue: mini-yaml strictness, the
  * action pipeline (store result → store eval params → update docs),
  * and the no-throw-on-failure contract (results, not exceptions — the
  * reference's run_checkpoint returns; the caller gates).
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private val shipped =
    "great_expectations/checkpoints/data_quality_checkpoint.yml"

  test("mini-yaml parses the reference checkpoint shape: ordered " +
      "action list, empty flow collections, bare-key nulls") {
    val doc = Checkpoint.parseYaml(Files.readString(
      java.nio.file.Paths.get(shipped)))
    assert(doc.str("name").contains("dq_checkpoint"))
    assert(doc.str("class_name").contains("Checkpoint"))
    assert(doc.get("run_name_template").contains(YNull))
    assert(doc.get("batch_request").contains(YMap(Vector.empty)))
    assert(doc.get("validations").contains(YList(Vector.empty)))
    val YList(items) = doc.get("action_list").get: @unchecked
    assert(items.size === 3)
    val names = items.collect { case m: YMap => m.str("name").get }
    assert(names === Vector("store_validation_result",
      "store_evaluation_params", "update_data_docs"))
    val classes = items.collect { case m: YMap =>
      m.get("action").collect { case a: YMap =>
        a.str("class_name").get }.get
    }
    assert(classes === Vector("StoreValidationResultAction",
      "StoreEvaluationParametersAction", "UpdateDataDocsAction"))
    // quoted scalars unwrap
    assert(Checkpoint.parseYaml("k: \"v s\"\n").str("k").contains("v s"))
  }

  test("mini-yaml is strict: tabs, unknown action classes, and " +
      "non-empty flow collections throw") {
    intercept[IllegalArgumentException] {
      Checkpoint.parseYaml("name: x\n\taction_list: []\n")
    }
    intercept[IllegalArgumentException] {
      Checkpoint.parseYaml("m: {a: 1}\n")
    }
    val bad = """name: cp
                |action_list:
                |  - name: store
                |    action:
                |      class_name: EmailOpsGenieAction
                |""".stripMargin
    val e = intercept[IllegalArgumentException](Checkpoint.parse(bad))
    assert(e.getMessage.contains("EmailOpsGenieAction"))
  }

  test("run(): failed expectations are RESULTS not exceptions; actions " +
      "store the result, eval params, and publish accumulating data docs") {
    val cfg = Checkpoint.load(shipped)
    val root = Files.createTempDirectory("graft_cp_store")
    val suites = Files.createTempDirectory("graft_cp_suites")
    Files.writeString(suites.resolve("dupes.json"),
      """{"expectations": [
        |  {"expectation_type": "expect_column_values_to_be_unique",
        |   "kwargs": {"column": "k"}},
        |  {"expectation_type": "expect_column_values_to_not_be_null",
        |   "kwargs": {"column": "v"}}
        |]}""".stripMargin)
    Files.writeString(suites.resolve("clean.json"),
      """{"expectations": [
        |  {"expectation_type": "expect_column_values_to_be_unique",
        |   "kwargs": {"column": "k"}}
        |]}""".stripMargin)
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val r1 = Checkpoint.run(cfg, Seq(dup -> "dupes"), suites.toString, root)
    assert(r1.size === 1)
    assert(!r1.head.success)
    assert(r1.head.results.map(e => (e.description, e.success)) ===
      Seq(("unique(k)", false), ("not_null(v)", true)))
    // stored validation result JSON carries the failure
    val stored = Files.readString(root.resolve("validations/dupes.json"))
    assert(stored.contains("\"success\":false"))
    assert(stored.contains("\"checkpoint\":\"dq_checkpoint\""))
    assert(Files.exists(root.resolve("evaluation_parameters/dupes.json")))
    val docs1 = Files.readString(root.resolve("data_docs/dupes.html"))
    assert(docs1.contains("FAIL") && docs1.contains("unique(k)"))

    // second run, different suite: docs ACCUMULATE like GE's site
    val clean = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r2 = Checkpoint.run(cfg, Seq(clean -> "clean"), suites.toString, root)
    assert(r2.head.success)
    val index = Files.readString(root.resolve("data_docs/index.html"))
    assert(index.contains("dupes") && index.contains("clean"))
    assert(index.contains("FAIL") && index.contains("PASS"))
  }

  test("run() on a suite the dir does not have throws (the reference " +
      "only builds validations for existing suites)") {
    val cfg = Checkpoint.load(shipped)
    val root = Files.createTempDirectory("graft_cp_none")
    val e = intercept[IllegalArgumentException] {
      Checkpoint.run(cfg, Seq(Seq(1).toDF("k") -> "absent"),
        root.toString, root)
    }
    assert(e.getMessage.contains("absent"))
  }
}
