package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{TxLog, TxTable}
import graft.lake.TxLog.{Info, LogEntry}

/** Reader-features protocol gate ([[graft.lake.TxLog.Meta
  * .readerFeatures]]): the version-skew guard for a mixed-version
  * fleet. A table stamped with a feature this client does not
  * implement must refuse LOUDLY at snapshot resolution — the
  * alternative on 100 TB is a naive reader silently returning
  * deleted rows (deletion vectors) or misread columns (column
  * mapping). Stamps land in the SAME commit as the first dependent
  * state, so no window exists where the state is live but unguarded.
  */
class TxProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"txproto_$tag").resolve("tbl").toString

  private def docs(n: Int): DataFrame =
    spark.range(n).select($"id", concat(lit("doc-"), $"id").as("text"))

  private def fsOf(root: String) = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("an unknown reader feature refuses the read; time travel behind it works") {
    val root = freshRoot("alien")
    val tab = new TxTable(spark, root)
    tab.create(docs(5))
    val fs = fsOf(root)
    val p = new Path(root)
    val snap = TxLog.snapshot(fs, p)
    // a newer writer upgrades the table to a feature we don't have
    val evil = snap.meta.withReaderFeature("v9-time-crystals")
    assert(TxLog.tryCommit(fs, p, snap.version + 1, Seq(
      LogEntry(meta = Some(evil)),
      LogEntry(info = Some(Info("UPGRADE", snap.version))))))
    val err = intercept[IllegalArgumentException] { tab.read().count() }
    assert(err.getMessage.contains("v9-time-crystals"))
    assert(err.getMessage.contains("reader feature"))
    // the pre-upgrade version resolves under its own (clean) meta
    assert(tab.read(asOf = Some(snap.version)).count() === 5)
  }

  test("plain create/append stamps no reader feature") {
    val root = freshRoot("plain")
    val tab = new TxTable(spark, root)
    tab.create(docs(5))
    tab.append(docs(3))
    tab.deleteWhere($"id" === 1L) // copy-on-write: no read-side burden
    assert(TxLog.snapshot(fsOf(root), new Path(root)).meta.features === Nil)
  }

  test("the first deletion vector stamps deletionVectors in the same commit") {
    val root = freshRoot("dv")
    val tab = new TxTable(spark, root)
    tab.create(docs(10))
    val v = tab.deleteWhereMergeOnRead($"id" === 4L)
    val snap = TxLog.snapshot(fsOf(root), new Path(root))
    assert(snap.meta.features === List("deletionVectors"))
    // stamped exactly at the DV commit — no unguarded window before it
    assert(TxLog.snapshot(fsOf(root), new Path(root), Some(v - 1))
      .meta.features === Nil)
    // this client implements it: the read serves the un-deleted rows
    assert(tab.read().count() === 9)
    // idempotent: a second vectored delete re-stamps nothing
    tab.deleteWhereMergeOnRead($"id" === 5L)
    assert(TxLog.snapshot(fsOf(root), new Path(root))
      .meta.features === List("deletionVectors"))
  }

  test("rename and drop stamp columnMapping; both features coexist sorted") {
    val root = freshRoot("map")
    val tab = new TxTable(spark, root)
    // one multi-row file, so the delete vectors a position instead of
    // dropping a whole single-row file (which needs no DV state)
    tab.create(docs(5).coalesce(1))
    tab.deleteWhereMergeOnRead($"id" === 0L)
    tab.renameColumn("text", "body")
    val snap = TxLog.snapshot(fsOf(root), new Path(root))
    assert(snap.meta.features === List("columnMapping", "deletionVectors"))
    tab.dropColumn("body")
    assert(TxLog.snapshot(fsOf(root), new Path(root))
      .meta.features === List("columnMapping", "deletionVectors"))
  }

  test("an unknown WRITER feature refuses every mutation but reads stay open") {
    val root = freshRoot("walien")
    val tab = new TxTable(spark, root)
    tab.create(docs(5))
    val fs = fsOf(root)
    val p = new Path(root)
    val snap = TxLog.snapshot(fs, p)
    // a newer writer stamps a write-side feature we don't implement
    val evil = snap.meta.withWriterFeature("v9-row-tracking")
    assert(TxLog.tryCommit(fs, p, snap.version + 1, Seq(
      LogEntry(meta = Some(evil)),
      LogEntry(info = Some(Info("UPGRADE", snap.version))))))
    // READS are unaffected — writer features never gate a reader
    assert(tab.read().count() === 5)
    assert(tab.detail().collect().head
      .getAs[Seq[String]]("writer_features") === Seq("v9-row-tracking"))
    // every mutating path refuses loudly instead of silently breaking
    // the invariant the feature protects
    def refuses(op: => Any): Unit = {
      val e = intercept[IllegalArgumentException](op)
      assert(e.getMessage.contains("writer feature"), e.getMessage)
      assert(e.getMessage.contains("v9-row-tracking"), e.getMessage)
    }
    refuses(tab.append(docs(1)))
    refuses(tab.deleteWhere($"id" === 1L))
    refuses(tab.update($"id" === 1L, Map("text" -> lit("x"))))
    refuses(tab.merge(docs(1), Seq("id")))
    refuses(tab.mergeInto(docs(1), Seq("id")).whenNotMatchedInsert().execute())
    refuses(tab.applyChanges(
      docs(1).withColumn("_change_type", lit("insert")), Seq("id")))
    refuses(tab.optimize())
    refuses(tab.addConstraint("id IS NOT NULL"))
    refuses(tab.renameColumn("text", "body"))
    refuses(tab.dropColumn("text"))
    refuses(tab.restore(0L))
    // nothing landed
    assert(tab.read().count() === 5)
    assert(tab.version === snap.version + 1)
  }

  test("constraints, CDF, generated columns, DV and mapping stamp writer features") {
    val root = freshRoot("wstamp")
    val tab = new TxTable(spark, root)
    tab.create(docs(10).coalesce(1),
      generatedColumns = Map("id2" -> "id * 2"))
    def writerFeats = TxLog.snapshot(fsOf(root), new Path(root))
      .meta.writerFeats
    assert(writerFeats === List("generatedColumns"))
    tab.addConstraint("id IS NOT NULL")
    assert(writerFeats === List("checkConstraints", "generatedColumns"))
    tab.enableChangeDataFeed()
    assert(writerFeats ===
      List("changeDataFeed", "checkConstraints", "generatedColumns"))
    tab.deleteWhereMergeOnRead($"id" === 3L)
    assert(writerFeats.contains("deletionVectors"))
    tab.renameColumn("text", "body")
    assert(writerFeats.contains("columnMapping"))
    // this client implements all of them: writes keep flowing
    tab.append(docs(2).withColumnRenamed("text", "body"))
    assert(tab.read().count() === 11)
    // and a CDF-at-birth table stamps from v0
    val born = new TxTable(spark, freshRoot("wborn"))
    born.create(docs(3), enableChangeDataFeed = true)
    assert(TxLog.snapshot(fsOf(root), new Path(root)).meta // tab unaffected
      .writerFeats.contains("changeDataFeed"))
  }

  test("the stamp survives a checkpoint replay") {
    val root = freshRoot("ckpt")
    val tab = new TxTable(spark, root)
    tab.create(docs(10))
    tab.deleteWhereMergeOnRead($"id" === 2L)
    // push past the checkpoint interval so resolution seeds from it
    (1L to TxLog.checkpointInterval).foreach(i => tab.append(docs(1)))
    val snap = TxLog.snapshot(fsOf(root), new Path(root))
    val (replayed, fromCkpt) = TxLog.lastReplay.get()
    assert(fromCkpt, "resolution must have seeded from a checkpoint")
    assert(snap.meta.features === List("deletionVectors"))
  }
}
