package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted TABLE PROPERTIES (Delta's `Metadata.configuration` /
  * `ALTER TABLE ... SET TBLPROPERTIES`): free-form metadata plus the
  * engine-semantic `txlog.*` keys — appendOnly enforcement,
  * table-level vacuum retention, table-level auto-compaction — each a
  * metadata-only commit, time-travel visible, typo-guarded.
  */
class TxPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"txprops_$tag").resolve("t").toString

  private def base(root: String): TxTable = {
    val tab = new TxTable(spark, root)
    tab.create(spark.range(100).selectExpr("id AS k", "id * 2 AS v").toDF())
    tab
  }

  test("set/unset round-trip; versions are metadata-only commits; " +
      "time travel serves each version's own configuration") {
    val root = fresh("roundtrip")
    val tab = base(root)
    val v1 = tab.setTblProperties(Map("owner" -> "ml-data",
      "comment" -> "it''s fine"))
    assert(v1 === 1L)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(TxLog.snapshot(fs, p).meta.config ===
      Map("owner" -> "ml-data", "comment" -> "it''s fine"))
    // merge, not replace
    val v2 = tab.setTblProperties(Map("owner" -> "platform"))
    assert(TxLog.snapshot(fs, p).meta.config("owner") === "platform")
    assert(TxLog.snapshot(fs, p).meta.config.contains("comment"))
    // time travel sees v1's config
    assert(TxLog.snapshot(fs, p, Some(v1)).meta.config("owner") ===
      "ml-data")
    // idempotent set is a no-op (no new version)
    assert(tab.setTblProperties(Map("owner" -> "platform")) === v2)
    // unset removes; absent keys are ignored
    val v3 = tab.unsetTblProperties(Seq("comment", "never-was"))
    assert(v3 === v2 + 1)
    assert(TxLog.snapshot(fs, p).meta.config === Map("owner" -> "platform"))
    assert(tab.unsetTblProperties(Seq("never-was")) === v3)
    // data untouched throughout
    assert(tab.read().count() === 100L)
    // history records the property commits
    val ops = tab.history().select("op").as[String].collect().toSeq
    assert(ops.count(_ == "SET_TBLPROPERTIES") === 2)
    assert(ops.count(_ == "UNSET_TBLPROPERTIES") === 1)
  }

  test("unknown txlog.* keys refuse (typo guard); malformed semantic " +
      "values refuse") {
    val tab = base(fresh("validate"))
    intercept[IllegalArgumentException] {
      tab.setTblProperties(Map("txlog.appendonly" -> "true")) // bad case
    }
    intercept[IllegalArgumentException] {
      tab.setTblProperties(Map("txlog.appendOnly" -> "yes"))
    }
    intercept[IllegalArgumentException] {
      tab.setTblProperties(Map("txlog.retention.hours" -> "-3"))
    }
    intercept[IllegalArgumentException] {
      tab.setTblProperties(Map("txlog.autoCompact.minFiles" -> "0"))
    }
  }

  test("appendOnly: row-removing mutations refuse, appends and " +
      "OPTIMIZE proceed, insert-only MERGE passes, unset lifts") {
    val root = fresh("appendonly")
    val tab = base(root)
    tab.setTblProperties(Map(TxLog.propAppendOnly -> "true"))
    // the writer-feature stamp landed
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(TxLog.snapshot(fs, p).meta.writerFeats.contains("appendOnly"))
    // appends fine
    tab.append(spark.range(100, 110).selectExpr("id AS k", "id * 2 AS v")
      .toDF())
    // row-removing surfaces refuse
    def refuses(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("appendOnly"), e.getMessage)
    }
    refuses(tab.deleteWhere(col("k") < 5))
    refuses(tab.deleteWhereMergeOnRead(col("k") < 5))
    refuses(tab.update(col("k") < 5, Map("v" -> lit(0L))))
    refuses(tab.overwrite(spark.range(1).selectExpr("id AS k",
      "id AS v").toDF()))
    refuses(tab.restore(0L))
    // a MERGE that would rewrite matched files refuses...
    refuses(tab.merge(spark.range(50, 60)
      .selectExpr("id AS k", "id AS v").toDF(), Seq("k")))
    // ...an insert-only merge (no key overlap) is a pure append
    tab.merge(spark.range(200, 210).selectExpr("id AS k", "id AS v")
      .toDF(), Seq("k"))
    assert(tab.read().count() === 120L)
    // file-preserving maintenance allowed
    tab.optimize()
    assert(tab.read().count() === 120L)
    // unset lifts enforcement (the feature stamp stays — this client
    // understands it and re-reads the configuration)
    tab.unsetTblProperties(Seq(TxLog.propAppendOnly))
    tab.deleteWhere(col("k") >= 200)
    assert(tab.read().count() === 110L)
  }

  test("table-level retention: vacuum default honors " +
      "txlog.retention.hours = 0; an explicit higher RETAIN still wins") {
    val tab = base(fresh("retention"))
    tab.overwrite(spark.range(50).selectExpr("id AS k", "id AS v").toDF())
    // without the property (and without the session opt-out) the
    // default vacuum keeps the 168 h floor: nothing young is reclaimed
    assert(tab.vacuum(keepVersions = 1).isEmpty)
    tab.setTblProperties(Map(TxLog.propRetentionHours -> "0"))
    // the table's own persisted retention now allows instant reclaim
    val removed = tab.vacuum(keepVersions = 1)
    assert(removed.nonEmpty,
      "retention.hours=0 must let the default vacuum reclaim v0 files")
    assert(tab.read().count() === 50L)
    // an explicit window above the property is just used
    assert(tab.vacuum(keepVersions = 1,
      minAgeMs = 3600L * 1000).isEmpty)
  }

  test("table-level autoCompact: the property alone converges churn; " +
      "a session conf set to false overrides it") {
    val root = fresh("autocompact")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(10).selectExpr("id AS k").toDF())
    tab.setTblProperties(Map(TxLog.propAutoCompact -> "true",
      TxLog.propAutoCompactMinFiles -> "4"))
    (1 to 10).foreach(i =>
      tab.append(spark.range(i * 10L, i * 10L + 10L)
        .selectExpr("id AS k").toDF()))
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(TxLog.snapshot(fs, p).adds.size < 11,
      "the table property alone must trigger post-commit compaction")
    assert(tab.read().count() === 110L)
    // session conf (explicitly false) wins over the property
    val root2 = fresh("autocompact_off")
    val tab2 = new TxTable(spark, root2)
    tab2.create(spark.range(10).selectExpr("id AS k").toDF())
    tab2.setTblProperties(Map(TxLog.propAutoCompact -> "true",
      TxLog.propAutoCompactMinFiles -> "4"))
    spark.conf.set(TxTable.autoCompactKey, "false")
    try {
      (1 to 10).foreach(i =>
        tab2.append(spark.range(i * 10L, i * 10L + 10L)
          .selectExpr("id AS k").toDF()))
      val ops2 = tab2.history().select("op").as[String].collect()
      assert(!ops2.contains("OPTIMIZE"),
        "an explicit session-conf false must override the property " +
          "(no auto-compaction commit may land)")
    } finally spark.conf.unset(TxTable.autoCompactKey)
  }

  test("SQL surface: SET/UNSET TBLPROPERTIES over a quoted path; " +
      "DESCRIBE DETAIL surfaces the map") {
    val root = fresh("sql")
    val tab = base(root)
    LakeSql.run(spark, s"ALTER '$root' SET TBLPROPERTIES " +
      "('owner' = 'ml-data', 'txlog.retention.hours' = '24')").collect()
    val detail = tab.detail().select("properties").collect().head
      .getMap[String, String](0)
    assert(detail("owner") === "ml-data")
    assert(detail("txlog.retention.hours") === "24")
    LakeSql.run(spark,
      s"ALTER '$root' UNSET TBLPROPERTIES ('owner')").collect()
    val after = tab.detail().select("properties").collect().head
      .getMap[String, String](0)
    assert(!after.contains("owner"))
    // quotes in values unescape ('' → ')
    LakeSql.run(spark, s"ALTER '$root' SET TBLPROPERTIES " +
      "('note' = 'it''s quoted')").collect()
    assert(tab.detail().select("properties").collect().head
      .getMap[String, String](0)("note") === "it's quoted")
  }

  test("a MALFORMED property list errors whole — no partial apply") {
    val root = fresh("malformed")
    val tab = base(root)
    val vBefore = tab.version
    // a valid pair followed by junk must NOT commit the valid pair
    intercept[Exception] {
      LakeSql.run(spark, s"ALTER '$root' SET TBLPROPERTIES " +
        "('a' = '1', junk)").collect()
    }
    intercept[Exception] { // junk first, valid pair after
      LakeSql.run(spark, s"ALTER '$root' SET TBLPROPERTIES " +
        "(junk, 'a' = '1')").collect()
    }
    intercept[Exception] { // missing separator between two pairs
      LakeSql.run(spark, s"ALTER '$root' SET TBLPROPERTIES " +
        "('a' = '1' 'b' = '2')").collect()
    }
    intercept[Exception] { // UNSET with a malformed segment
      LakeSql.run(spark, s"ALTER '$root' UNSET TBLPROPERTIES " +
        "('a', junk)").collect()
    }
    assert(tab.version === vBefore,
      "a malformed list must not land any commit")
    val p = new org.apache.hadoop.fs.Path(root)
    assert(TxLog.snapshot(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
      .meta.config.isEmpty, "no pair from a malformed list may apply")
  }
}
