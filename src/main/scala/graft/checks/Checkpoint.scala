package graft.checks

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Checkpoint orchestration — the reference's Great Expectations
  * checkpoint layer (etl/great_expectations/checkpoints/
  * data_quality_checkpoint.yml + etl/utils/base_table.py:177-196:
  * `context.run_checkpoint(checkpoint_name=..., validations=[...])`)
  * re-expressed over the compiled [[Check]] evaluator. The YAML file is
  * the orchestration config a steward edits without recompiling: which
  * actions run after validation, and in what order. Three reference
  * actions are modeled:
  *
  *   - `StoreValidationResultAction` — persist a per-suite result JSON
  *     (GE's validation store);
  *   - `StoreEvaluationParametersAction` — persist the checkpoint's
  *     evaluation-parameter map;
  *   - `UpdateDataDocsAction` — regenerate static HTML data docs from
  *     ALL stored validation results (GE's data-docs site).
  *
  * Parsing is strict (unknown action class names throw — a typo'd
  * action must not silently not-run), and [[run]] NEVER throws on a
  * failed expectation: like the reference's `run_checkpoint`, it
  * returns per-validation results and the CALLER decides whether to
  * gate the load (etl/utils/base_table.py returns the result; the node
  * refuses upstream).
  *
  * Scale posture: validation cost is [[Checks.evaluate]]'s — one
  * aggregation job per rule, no driver row work; the action layer
  * writes O(suites) small JSON/HTML files.
  */
object Checkpoint {

  // ---------------------------------------------------------------------
  // Mini-YAML: the strict subset the reference checkpoint file uses —
  // top-level map, nested maps by 2-space indent, lists of maps
  // ("- key: value"), inline {} / [] empties, bare "key:" = null.
  // Tabs, flow collections with content, and anchors are out of scope
  // and throw. ~90 lines beats a YAML dependency the sandbox cannot
  // resolve (zero egress), and strictness beats silently mis-parsing
  // an orchestration file.
  // ---------------------------------------------------------------------
  sealed trait Y
  final case class YStr(value: String) extends Y
  case object YNull extends Y
  final case class YMap(entries: Vector[(String, Y)]) extends Y {
    def get(key: String): Option[Y] = entries.find(_._1 == key).map(_._2)
    def str(key: String): Option[String] = get(key).collect {
      case YStr(s) => s
    }
  }
  final case class YList(items: Vector[Y]) extends Y

  def parseYaml(text: String): YMap = {
    val raw = text.split('\n')
    require(!raw.exists(_.contains('\t')),
      "mini-yaml: tabs are not allowed (use spaces)")
    // (indent, content), comments and blanks dropped; Array so the list
    // parser can rewrite "- key: v" items in place as one-deeper lines
    val lines: Array[(Int, String)] = raw.iterator
      .map(_.replaceAll("\\s+$", ""))
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .map { l =>
        val ind = l.indexWhere(_ != ' ')
        (ind, l.substring(ind))
      }.toArray
    var i = 0
    def peek: Option[(Int, String)] =
      if (i < lines.length) Some(lines(i)) else None
    def scalar(s: String): Y = s match {
      case "{}" => YMap(Vector.empty)
      case "[]" => YList(Vector.empty)
      case q if q.length >= 2 &&
        ((q.head == '"' && q.last == '"') ||
          (q.head == '\'' && q.last == '\'')) =>
        YStr(q.substring(1, q.length - 1))
      case other =>
        require(!other.startsWith("{") && !other.startsWith("["),
          s"mini-yaml: non-empty flow collections unsupported: $other")
        YStr(other)
    }
    def parseMap(indent: Int): YMap = {
      val entries = ListBuffer[(String, Y)]()
      while (peek.exists(p => p._1 == indent && !p._2.startsWith("- "))) {
        val (_, line) = lines(i); i += 1
        val ci = line.indexOf(':')
        require(ci > 0, s"mini-yaml: expected 'key:' in line: $line")
        val key = line.substring(0, ci).trim
        val rest = line.substring(ci + 1).trim
        val value: Y =
          if (rest.nonEmpty) scalar(rest)
          else peek match {
            case Some((ind2, c2)) if ind2 > indent && c2.startsWith("- ") =>
              parseList(ind2)
            case Some((ind2, _)) if ind2 > indent => parseMap(ind2)
            case _ => YNull
          }
        entries += key -> value
      }
      YMap(entries.toVector)
    }
    def parseList(indent: Int): YList = {
      val items = ListBuffer[Y]()
      while (peek.exists(p => p._1 == indent && p._2.startsWith("- "))) {
        val (_, line) = lines(i)
        val body = line.substring(2)
        if (body.contains(':')) {
          // "- key: v" is an item MAP whose first entry sits on the
          // dash line; rewrite as a one-deeper plain line and recurse
          lines(i) = (indent + 2, body)
          items += parseMap(indent + 2)
        } else {
          i += 1
          items += scalar(body.trim)
        }
      }
      YList(items.toVector)
    }
    val m = parseMap(lines.headOption.map(_._1).getOrElse(0))
    require(i == lines.length,
      s"mini-yaml: unparsed content from line: ${lines(i)._2}")
    m
  }

  // ---------------------------------------------------------------------
  // Checkpoint config + runner
  // ---------------------------------------------------------------------

  final case class Action(name: String, className: String)

  final case class Config(name: String, actions: Seq[Action],
      evaluationParameters: YMap)

  val supportedActions: Set[String] = Set(
    "StoreValidationResultAction", "StoreEvaluationParametersAction",
    "UpdateDataDocsAction")

  def parse(yamlText: String): Config = {
    val doc = parseYaml(yamlText)
    val name = doc.str("name").getOrElse(
      throw new IllegalArgumentException("checkpoint needs a 'name'"))
    val actions = doc.get("action_list") match {
      case Some(YList(items)) => items.map {
        case m: YMap =>
          val an = m.str("name").getOrElse(throw new
            IllegalArgumentException("action_list item needs a 'name'"))
          val cls = m.get("action") match {
            case Some(a: YMap) => a.str("class_name").getOrElse(throw new
              IllegalArgumentException(s"action '$an' needs class_name"))
            case other => throw new IllegalArgumentException(
              s"action '$an': expected a nested 'action' map, got $other")
          }
          require(supportedActions.contains(cls),
            s"unsupported checkpoint action class: $cls " +
              s"(supported: ${supportedActions.mkString(", ")})")
          Action(an, cls)
        case other => throw new IllegalArgumentException(
          s"action_list items must be maps, got $other")
      }
      case None | Some(YNull) => Nil
      case Some(other) => throw new IllegalArgumentException(
        s"action_list must be a list, got $other")
    }
    val evalParams = doc.get("evaluation_parameters") match {
      case Some(m: YMap) => m
      case _ => YMap(Vector.empty)
    }
    Config(name, actions, evalParams)
  }

  def load(path: String): Config = parse(Files.readString(Paths.get(path)))

  final case class ExpectationResult(
      description: String, success: Boolean, detail: String)

  final case class ValidationResult(
      suite: String, results: Seq[ExpectationResult]) {
    def success: Boolean = results.forall(_.success)
  }

  /** Run the checkpoint: validate each (dataframe, suite) pair against
    * `<suiteDir>/<suite>.json`, then execute the action list IN CONFIG
    * ORDER. Returns per-validation results (the reference's
    * `list_validation_results()`); failed expectations are RESULTS, not
    * exceptions — gating is the caller's decision.
    */
  def run(cfg: Config, validations: Seq[(DataFrame, String)],
      suiteDir: String, root: Path): Seq[ValidationResult] = {
    val results = validations.map { case (df, suite) =>
      val checks = CheckSuites.load(suiteDir, suite).getOrElse(
        throw new IllegalArgumentException(
          s"no expectation suite $suiteDir/$suite.json — the reference " +
            "builds checkpoint validations only for existing suites " +
            "(etl/utils/base_table.py:161-166)"))
      // ONE aggregation pass per (dataframe, suite) — per-expectation
      // results come from the same pass (Checks.evaluateEach), not one
      // Spark job per expectation
      val per = checks.zip(Checks.evaluateEach(df, checks)).map {
        case (c, None) =>
          ExpectationResult(c.description, success = true, "")
        case (c, Some(v)) =>
          ExpectationResult(c.description, success = false, v.detail)
      }
      ValidationResult(suite, per)
    }
    cfg.actions.foreach { a =>
      a.className match {
        case "StoreValidationResultAction" =>
          val dir = root.resolve("validations")
          Files.createDirectories(dir)
          results.foreach { r =>
            Files.writeString(dir.resolve(s"${r.suite}.json"),
              resultJson(cfg, r))
          }
        case "StoreEvaluationParametersAction" =>
          val dir = root.resolve("evaluation_parameters")
          Files.createDirectories(dir)
          val body = cfg.evaluationParameters.entries
            .map { case (k, v) =>
              js(k) + ":" + (v match {
                case YStr(s) => js(s); case _ => "null"
              })
            }.mkString("{", ",", "}")
          results.foreach { r =>
            Files.writeString(dir.resolve(s"${r.suite}.json"), body)
          }
        case "UpdateDataDocsAction" => updateDataDocs(root)
        case other => throw new IllegalArgumentException(
          s"unsupported action class: $other")
      }
    }
    results
  }

  private def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def resultJson(cfg: Config, r: ValidationResult): String = {
    val exps = r.results.map { e =>
      s"""{"expectation":${js(e.description)},"success":${e.success},""" +
        s""""detail":${js(e.detail)}}"""
    }.mkString("[", ",", "]")
    s"""{"checkpoint":${js(cfg.name)},"suite":${js(r.suite)},""" +
      s""""success":${r.success},"results":$exps}"""
  }

  /** Regenerate the static data-docs site from ALL stored validation
    * results under `<root>/validations/` — like GE's docs, the site
    * accumulates across runs, not just the triggering one.
    */
  private def updateDataDocs(root: Path): Unit = {
    implicit val fmts: Formats = DefaultFormats
    val valDir = root.resolve("validations")
    val stored: Seq[(String, Boolean, Seq[(String, Boolean, String)])] =
      if (!Files.isDirectory(valDir)) Nil
      else {
        val files = Files.list(valDir).toArray.toSeq
          .map(_.asInstanceOf[Path])
          .filter(_.getFileName.toString.endsWith(".json"))
          .sortBy(_.getFileName.toString)
        files.map { p =>
          val j = JsonMethods.parse(Files.readString(p))
          val suite = (j \ "suite").extract[String]
          val ok = (j \ "success").extract[Boolean]
          val exps = (j \ "results") match {
            case JArray(items) => items.map { e =>
              ((e \ "expectation").extract[String],
                (e \ "success").extract[Boolean],
                (e \ "detail").extract[String])
            }
            case _ => Nil
          }
          (suite, ok, exps)
        }
      }
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val docs = root.resolve("data_docs")
    Files.createDirectories(docs)
    val rows = stored.map { case (suite, ok, _) =>
      s"""<tr><td><a href="${esc(suite)}.html">${esc(suite)}</a></td>""" +
        s"""<td class="${if (ok) "pass" else "fail"}">""" +
        s"""${if (ok) "PASS" else "FAIL"}</td></tr>"""
    }.mkString("\n")
    Files.writeString(docs.resolve("index.html"),
      s"""<!doctype html><html><head><meta charset="utf-8">
         |<title>graft data docs</title><style>
         |table{border-collapse:collapse}td,th{border:1px solid #999;
         |padding:4px 8px}.pass{color:green}.fail{color:red}
         |</style></head><body><h1>Validation results</h1>
         |<table><tr><th>suite</th><th>status</th></tr>
         |$rows
         |</table></body></html>
         |""".stripMargin)
    stored.foreach { case (suite, ok, exps) =>
      val erows = exps.map { case (d, s, detail) =>
        s"""<tr><td>${esc(d)}</td><td class="${if (s) "pass" else
          "fail"}">${if (s) "PASS" else "FAIL"}</td>""" +
          s"""<td>${esc(detail)}</td></tr>"""
      }.mkString("\n")
      Files.writeString(docs.resolve(s"$suite.html"),
        s"""<!doctype html><html><head><meta charset="utf-8">
           |<title>${esc(suite)}</title><style>
           |table{border-collapse:collapse}td,th{border:1px solid #999;
           |padding:4px 8px}.pass{color:green}.fail{color:red}
           |</style></head><body>
           |<h1>${esc(suite)} — ${if (ok) "PASS" else "FAIL"}</h1>
           |<table><tr><th>expectation</th><th>status</th><th>detail</th>
           |</tr>
           |$erows
           |</table></body></html>
           |""".stripMargin)
    }
  }
}
