package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeSql, TxTable}

/** The SQL maintenance surface ([[graft.lake.LakeSql]]): statement
  * parsing, command execution over a real table through BOTH routes —
  * direct dispatch (`LakeSql.run`) and `spark.sql(...)` on a session
  * built with [[graft.functions.GraftExtensions]]'s injected parser —
  * and verbatim delegation of everything that is not a maintenance
  * statement.
  */
class LakeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"lakesql_$tag").resolve("tbl").toString

  test("parse recognizes exactly the maintenance shapes") {
    assert(LakeSql.parse("OPTIMIZE '/t/x'").isDefined)
    assert(LakeSql.parse("optimize '/t/x' zorder by (a, b)").isDefined)
    assert(LakeSql.parse("VACUUM '/t/x'").isDefined)
    assert(LakeSql.parse("VACUUM '/t/x' RETAIN 3 VERSIONS").isDefined)
    assert(LakeSql.parse("VACUUM LOG '/t/x' RETAIN 5 VERSIONS").isDefined)
    assert(LakeSql.parse("DESCRIBE HISTORY '/t/x'").isDefined)
    assert(LakeSql.parse("RESTORE '/t/x' TO VERSION AS OF 2").isDefined)
    assert(LakeSql.parse("SELECT 1").isEmpty)
    assert(LakeSql.parse("DESCRIBE TABLE t").isEmpty)
    assert(LakeSql.parse("OPTIMIZE tbl").isEmpty,
      "only quoted-path form is ours; bare identifiers delegate")
  }

  test("string literals with escaped quotes never desync the scanner") {
    import graft.lake.LakeSql.{DeleteCommand, UpdateCommand}
    // backslash escape: the WHERE inside the literal must not split
    LakeSql.parse(
      raw"UPDATE '/t/x' SET note = 'it\'s not a WHERE, honest' WHERE id = 1") match {
      case Some(UpdateCommand(p, sets, where)) =>
        assert(p === "/t/x")
        assert(sets === Seq(("note", raw"'it\'s not a WHERE, honest'")))
        assert(where === Some("id = 1"))
      case other => fail(s"expected UpdateCommand, got $other")
    }
    // doubled-quote escape, with a top-level comma after the literal
    LakeSql.parse(
      "UPDATE '/t/x' SET a = 'o''brien, esq', b = 2 WHERE b = 'x'") match {
      case Some(UpdateCommand(_, sets, where)) =>
        assert(sets === Seq(("a", "'o''brien, esq'"), ("b", "2")))
        assert(where === Some("b = 'x'"))
      case other => fail(s"expected UpdateCommand, got $other")
    }
    // DELETE predicate carrying both escape forms parses whole
    LakeSql.parse(
      raw"DELETE FROM '/t/x' WHERE name = 'a\'b' AND alt = 'c''d'") match {
      case Some(DeleteCommand(_, where)) =>
        assert(where === raw"name = 'a\'b' AND alt = 'c''d'")
      case other => fail(s"expected DeleteCommand, got $other")
    }
    // and the executed form round-trips through Spark's expr()
    val root = freshRoot("esc")
    val tab = new TxTable(spark, root)
    tab.create(spark.createDataFrame(Seq((1L, "keep"), (2L, "it's"))).toDF("id", "note"))
    LakeSql.run(spark, raw"DELETE FROM '$root' WHERE note = 'it\'s'")
    assert(tab.read().select("note").as[String].collect().toSeq === Seq("keep"))
    LakeSql.run(spark, raw"UPDATE '$root' SET note = 'o''k, fine' WHERE id = 1")
    assert(tab.read().select("note").as[String].head() === "o'k, fine")
  }

  test("the command family drives a real table end-to-end") {
    val root = freshRoot("e2e")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(0L, 100L).toDF("id").repartition(2))   // v0
    tab.append(spark.range(100L, 200L).toDF("id").repartition(2)) // v1
    tab.deleteWhere($"id" < 50L)                                  // v2
    val vOpt = LakeSql.run(spark, s"OPTIMIZE '$root'")
      .as[Long].head()
    assert(vOpt === 3L)
    val hist = LakeSql.run(spark, s"DESCRIBE HISTORY '$root'")
      .orderBy("version")
    assert(hist.select("op").as[String].collect().toSeq ===
      Seq("CREATE", "APPEND", "DELETE", "OPTIMIZE"))
    assert(hist.columns.contains("operation_metrics"))
    val vRest = LakeSql.run(spark, s"RESTORE '$root' TO VERSION AS OF 1")
      .as[Long].head()
    assert(vRest === 4L)
    assert(tab.read().count() === 200L, "the SQL restore undid the delete")
    val preview = LakeSql
      .run(spark, s"VACUUM '$root' RETAIN 1 VERSIONS RETAIN 0 HOURS DRY RUN")
      .as[String].collect()
    assert(preview.nonEmpty)
    assert(preview.forall(p =>
        new java.io.File(root, p).exists()),
      "DRY RUN must delete nothing")
    val removed = LakeSql.run(spark, s"VACUUM '$root' RETAIN 1 VERSIONS RETAIN 0 HOURS")
      .as[String].collect()
    assert(removed.nonEmpty, "the delete/optimize era files are unreferenced")
    assert(removed.sorted.toSeq === preview.sorted.toSeq,
      "the dry run previewed exactly the real run's reclaim set")
    assert(tab.read().count() === 200L, "vacuum never touches live files")
    intercept[IllegalArgumentException](LakeSql.run(spark, "SELECT 1"))
  }

  test("DML parsing: quoted-path shapes are ours, identifiers delegate, " +
      "keywords inside string literals and subqueries don't derail") {
    assert(LakeSql.parse("DELETE FROM '/t/x' WHERE id < 5").isDefined)
    assert(LakeSql.parse("DELETE FROM tbl WHERE id < 5").isEmpty)
    assert(LakeSql.parse("UPDATE '/t/x' SET a = 1, b = a + 2 WHERE c = 'x'")
      .isDefined)
    assert(LakeSql.parse("UPDATE tbl SET a = 1").isEmpty)
    assert(LakeSql.parse("MERGE INTO tbl USING s ON t.k = s.k " +
      "WHEN MATCHED THEN DELETE").isEmpty)
    // a WHERE inside a string literal stays part of the SET expression
    val u = LakeSql.parse("UPDATE '/t/x' SET a = ' WHERE ' WHERE b = 1")
    assert(u.exists {
      case LakeSql.UpdateCommand(_, sets, where) =>
        sets == Seq("a" -> "' WHERE '") && where.contains("b = 1")
      case _ => false
    })
    // comparison operators never split an assignment
    val u2 = LakeSql.parse("UPDATE '/t/x' SET a = b <= 3")
    assert(u2.exists {
      case LakeSql.UpdateCommand(_, sets, None) =>
        sets == Seq("a" -> "b <= 3")
      case _ => false
    })
    val m = LakeSql.parse(
      """MERGE INTO '/t/x' AS t
        |USING (SELECT k, v FROM src WHERE note = ' WHEN MATCHED ') AS s
        |ON t.k = s.k AND t.k2 = s.k2
        |WHEN MATCHED AND t.v < s.v THEN UPDATE SET v = s.v
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin
        .replace('\n', ' '))
    assert(m.exists {
      case LakeSql.MergeIntoCommand(_, src, keys, cls) =>
        src.startsWith("(") && keys == Seq("k", "k2") &&
          cls.map(_.matchKind) ==
            Seq("matched", "matched", "notMatched", "bySource") &&
          cls.head.cond.contains("t.v < s.v") &&
          cls.head.sets.contains(Seq("v" -> "s.v"))
      case _ => false
    })
    // ON must equate the SAME column both sides
    intercept[RuntimeException](LakeSql.parse(
      "MERGE INTO '/t/x' USING src ON t.a = s.b " +
        "WHEN MATCHED THEN DELETE"))
    intercept[IllegalArgumentException](LakeSql.parse(
      "MERGE INTO '/t/x' USING src ON t.k = s.k " +
        "WHEN NOT MATCHED THEN UPDATE SET a = 1"))
  }

  test("SQL DML drives a real table: DELETE, UPDATE, MERGE with " +
      "conditional clauses, SET *, and a subquery source") {
    val root = freshRoot("dml")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(0L, 100L)
      .select($"id", ($"id" % 10).as("grp"), lit(1L).as("v"))
      .repartition(2))                                            // v0
    val vDel = LakeSql.run(spark, s"DELETE FROM '$root' WHERE id >= 90")
      .as[Long].head()
    assert(vDel === 1L && tab.read().count() === 90L)
    val vUpd = LakeSql.run(spark,
      s"UPDATE '$root' SET v = v + grp WHERE grp >= 8").as[Long].head()
    assert(vUpd === 2L)
    assert(tab.read().where($"grp" === 9L).agg(sum($"v")).as[Long].head()
      === 9L * 10L, "v = 1 + 9 on the nine-group's 9 surviving rows")
    // merge: source updates evens' v, inserts beyond-range keys,
    // deletes multiples of 30; UPDATE SET * exercises schema alignment
    spark.range(0L, 120L, 2L)
      .select($"id", ($"id" % 10).as("grp"), lit(100L).as("v"))
      .createOrReplaceTempView("lakesql_dml_src")
    val vM = LakeSql.run(spark,
      s"""MERGE INTO '$root' AS t
         |USING (SELECT id, grp, v FROM lakesql_dml_src) AS s
         |ON t.id = s.id
         |WHEN MATCHED AND t.id % 30 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
        .replace('\n', ' ')).as[Long].head()
    assert(vM === 3L)
    val got = tab.read()
    assert(got.where($"id" % 30 === 0 && $"id" < 90).count() === 0L,
      "matched multiples of 30 deleted (90 re-arrives as an insert)")
    assert(got.where($"id" === 88L).select($"v").as[Long].head() === 100L,
      "matched even updated via SET *")
    assert(got.where($"id" >= 90L && $"id" % 2 === 0).count() === 15L,
      "90..118 evens inserted")
    assert(got.where($"id" === 9L).select($"v").as[Long].head() === 10L,
      "odd rows untouched by the merge")
    // by-source clause through SQL: source is the table itself filtered
    val vB = LakeSql.run(spark,
      s"""MERGE INTO '$root' AS t USING
         |(SELECT id FROM lakesql_dml_src WHERE 1=0) AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND t.id > 110 THEN DELETE"""
        .stripMargin.replace('\n', ' ')).as[Long].head()
    assert(vB === 4L)
    assert(tab.read().agg(max($"id")).as[Long].head() <= 110L)
  }

  test("SELECT over quoted paths: time travel by version and timestamp, " +
      "self-join of two slices, literals never misfire the scanner") {
    val root = freshRoot("sel")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(0L, 50L).toDF("id"))
    tab.append(spark.range(50L, 80L).toDF("id"))
    assert(LakeSql.run(spark,
      s"SELECT COUNT(*) AS c FROM '$root'").as[Long].head() === 80L)
    assert(LakeSql.run(spark,
      s"SELECT COUNT(*) AS c FROM '$root' VERSION AS OF 0")
      .as[Long].head() === 50L)
    val ts = tab.commitTimestamp(0L).get
    assert(LakeSql.run(spark,
      s"SELECT COUNT(*) AS c FROM '$root' TIMESTAMP AS OF $ts")
      .as[Long].head() === 50L)
    // head slice joined to the v0 slice; a string literal containing
    // "from 'x'" must not derail the path scan
    assert(LakeSql.run(spark,
      s"SELECT COUNT(*) AS c FROM '$root' h JOIN '$root' VERSION AS OF 0 v " +
        "ON h.id = v.id WHERE 'from ''q''' <> ''").as[Long].head() === 50L)
    // a non-query or path-free statement is not claimed
    assert(LakeSql.selectOverPaths(spark, "SELECT 1 + 1").isEmpty)
    intercept[IllegalArgumentException](
      LakeSql.run(spark, "EXPLAIN SELECT 1"))
  }

  test("SQL DDL: CTAS, INSERT INTO (named + positional VALUES), " +
      "ADD COLUMN, ADD CONSTRAINT") {
    val root = freshRoot("ddl")
    spark.range(0L, 40L).toDF("id").createOrReplaceTempView("ddl_src40")
    assert(LakeSql.run(spark,
      s"CREATE TABLE '$root' AS SELECT id FROM ddl_src40 WHERE id < 30")
      .as[Long].head() === 0L)
    assert(LakeSql.run(spark,
      s"INSERT INTO '$root' SELECT id FROM ddl_src40 WHERE id >= 30")
      .as[Long].head() === 1L)
    assert(LakeSql.run(spark,
      s"ALTER '$root' ADD COLUMN tag string").as[Long].head() === 2L)
    assert(LakeSql.run(spark,
      s"INSERT INTO '$root' VALUES (CAST(100 AS BIGINT), 'x')")
      .as[Long].head() === 3L)
    assert(LakeSql.run(spark,
      s"ALTER '$root' ADD CONSTRAINT small CHECK (id <= 100)")
      .as[Long].head() === 4L)
    intercept[Exception](LakeSql.run(spark,
      s"INSERT INTO '$root' VALUES (CAST(999 AS BIGINT), 'bad')"))
    val tab = new TxTable(spark, root)
    assert(tab.read().count() === 41L)
    assert(tab.read().where($"tag" === "x").select("id").as[Long]
      .collect().toSeq === Seq(100L))
    assert(tab.read().where($"id" < 100).select("tag").distinct()
      .collect().map(_.getString(0)).toSeq === Seq(null))
    // explicit column list maps by name order given
    assert(LakeSql.run(spark,
      s"INSERT INTO '$root' (tag, id) VALUES ('y', CAST(99 AS BIGINT))")
      .as[Long].head() === 5L)
    assert(tab.read().where($"tag" === "y").select("id").as[Long]
      .collect().toSeq === Seq(99L))
  }

  test("TABLE_CHANGES TVF, DESCRIBE DETAIL, RESTORE TIMESTAMP AS OF") {
    val root = freshRoot("tvf")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(0L, 30L).toDF("id"),
      enableChangeDataFeed = true)                       // v0
    tab.append(spark.range(30L, 40L).toDF("id"))         // v1
    tab.deleteWhere($"id" < 5L)                          // v2
    // the CDF slice as a SQL source, filtered and aggregated by Spark
    val byType = LakeSql.run(spark,
      s"SELECT _change_type AS t, COUNT(*) AS n FROM " +
        s"TABLE_CHANGES('$root', 1, 2) GROUP BY _change_type ORDER BY t")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byType === Seq(("delete", 5L), ("insert", 10L)))
    // DESCRIBE DETAIL through run(): rich frame, current version
    val det = LakeSql.run(spark, s"DESCRIBE DETAIL '$root'")
    assert(det.select("version").as[Long].head() === 2L)
    assert(det.select("num_rows").as[Long].head() === 35L)
    // time-traveled detail
    assert(LakeSql.run(spark, s"DESCRIBE DETAIL '$root' VERSION AS OF 0")
      .select("num_rows").as[Long].head() === 30L)
    // RESTORE by wall-clock instant: rewind to v1's stamp
    val ts1 = tab.commitTimestamp(1L).get
    val vRest = LakeSql.run(spark,
      s"RESTORE '$root' TO TIMESTAMP AS OF $ts1").as[Long].head()
    assert(vRest === 3L)
    assert(tab.read().count() === 40L, "the delete is undone")
  }

  test("spark.sql drives the same statements through the injected " +
      "parser; non-maintenance SQL delegates verbatim") {
    val root = freshRoot("inj")
    new TxTable(spark, root)
      .create(spark.range(0L, 60L).toDF("id").repartition(2))
    // a second session over the SAME SparkContext, built with the
    // extensions — a session's parser is fixed at build time, so the
    // suite-wide session cannot be retrofitted
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "must be a fresh session, not the suite's")
      val tab2 = new TxTable(s2, root)
      tab2.append(s2.range(60L, 120L).toDF("id").repartition(2))
      val v = s2.sql(s"OPTIMIZE '$root'")
        .collect().head.getLong(0)
      assert(v === 2L)
      val ops = s2.sql(s"DESCRIBE HISTORY '$root'")
        .orderBy("version").select("op")
        .collect().map(_.getString(0)).toSeq
      assert(ops === Seq("CREATE", "APPEND", "OPTIMIZE"))
      // delegation: ordinary SQL still parses and runs
      assert(s2.sql("SELECT 1 + 1").collect().head.getInt(0) === 2)
      // the SELECT-over-path surface rides the injected parser too
      assert(s2.sql(s"SELECT COUNT(*) AS c FROM '$root' VERSION AS OF 0")
        .collect().head.getLong(0) === 60L)
      assert(s2.sql(s"SELECT MAX(id) AS m FROM '$root'")
        .collect().head.getLong(0) === 119L)
      // ... and DESCRIBE DETAIL does
      assert(s2.sql(s"DESCRIBE DETAIL '$root'")
        .select("num_rows").collect().head.getLong(0) === 120L)
      // and the injected native functions resolve by name
      assert(s2.sql("SELECT poly_hash('a', 31, 7)").collect().nonEmpty)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
