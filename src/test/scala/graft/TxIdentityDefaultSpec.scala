package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{TxLog, TxTable}

/** IDENTITY columns (GENERATED ALWAYS AS IDENTITY, start 1 step 1) and
  * per-column DEFAULT values ([[graft.lake.TxTable.create]]): the
  * allocation/fill semantics the oracle query
  * (ext_lake_identity_default) pins relationally, plus every refusal
  * surface — explicit identity values, UPDATE/MERGE/RENAME/DROP on the
  * declared columns, and the writer-feature stamps that make a
  * version-skewed writer refuse instead of breaking the invariants.
  */
class TxIdentityDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"ident_$tag").resolve("tbl").toString

  private def docs(n: Int, from: Long = 0L): DataFrame =
    spark.range(from, from + n).select(
      $"id", concat(lit("doc-"), $"id").as("text"))

  test("identity allocates monotonically across commits; defaults fill " +
      "absent columns, explicit values win") {
    val tab = new TxTable(spark, freshRoot("alloc"))
    tab.create(docs(5).withColumn("status", lit("SEED")).coalesce(1),
      identityColumns = Seq("sn"),
      defaultValues = Map("status" -> "'NEW'"))
    tab.append(docs(3, from = 10L).coalesce(1))            // no status: default
    tab.append(docs(2, from = 20L)
      .withColumn("status", lit("EXPLICIT")).coalesce(1))  // explicit wins
    val got = tab.read().select($"id", $"status", $"sn")
      .as[(Long, String, Long)].collect()
    assert(got.length === 10)
    assert(got.map(_._3).toSet === (1L to 10L).toSet,
      "single-partition writes allocate contiguous identities from 1")
    assert(got.filter(r => r._1 >= 10L && r._1 < 20L)
      .forall(_._2 == "NEW"), "absent column takes the DEFAULT")
    assert(got.filter(_._1 >= 20L).forall(_._2 == "EXPLICIT"),
      "explicit values beat the DEFAULT")
    assert(got.filter(_._1 < 10L).forall(_._2 == "SEED"))
    // later allocations stay past earlier ones even per-commit
    val v0Max = tab.read(asOf = Some(0L)).agg(max($"sn"))
      .collect().head.getLong(0)
    val v1Min = tab.read(asOf = Some(1L)).where($"id" >= 10L)
      .agg(min($"sn")).collect().head.getLong(0)
    assert(v1Min > v0Max, "the watermark rides the log")
  }

  test("explicit identity values refuse on every ingest path; UPDATE/" +
      "MERGE/RENAME/DROP refuse the declared columns") {
    val tab = new TxTable(spark, freshRoot("refuse"))
    tab.create(docs(3).withColumn("status", lit("S")).coalesce(1),
      identityColumns = Seq("sn"),
      defaultValues = Map("status" -> "'NEW'"))
    // supplying the identity column refuses loudly
    intercept[IllegalArgumentException](
      tab.append(docs(1, from = 50L).withColumn("sn", lit(999L))))
    // UPDATE on the identity column refuses; other columns still work
    intercept[IllegalArgumentException](
      tab.update($"id" === 0L, Map("sn" -> lit(7L))))
    tab.update($"id" === 0L, Map("status" -> lit("U")))
    // keyed upserts refuse (allocation for a replaced row is ambiguous)
    intercept[IllegalArgumentException](
      tab.merge(docs(1).withColumn("status", lit("M")), Seq("id")))
    intercept[IllegalArgumentException](
      tab.mergeInto(docs(1), Seq("id"))
        .whenNotMatchedInsert().execute())
    // schema surgery on declared columns refuses
    intercept[IllegalArgumentException](tab.renameColumn("sn", "sn2"))
    intercept[IllegalArgumentException](tab.dropColumn("sn"))
    intercept[IllegalArgumentException](tab.renameColumn("status", "st"))
    intercept[IllegalArgumentException](tab.dropColumn("status"))
    // create refuses a frame that already carries the identity column
    intercept[IllegalArgumentException](
      new TxTable(spark, freshRoot("carry")).create(
        docs(2).withColumn("sn", lit(1L)), identityColumns = Seq("sn")))
  }

  test("both declarations stamp writer features and survive checkpoint " +
      "replay; allocation continues past it") {
    val tab = new TxTable(spark, freshRoot("ckpt"))
    tab.create(docs(2).withColumn("status", lit("S")).coalesce(1),
      identityColumns = Seq("sn"),
      defaultValues = Map("status" -> "'NEW'"))
    val feats = tab.detail().collect().head
      .getAs[scala.collection.Seq[String]]("writer_features")
    assert(feats.contains("identityColumns") &&
      feats.contains("defaultValues"))
    // push past the checkpoint interval so resolution seeds from it
    (1L to TxLog.checkpointInterval).foreach(i =>
      tab.append(docs(1, from = 100L + i).coalesce(1)))
    val (_, fromCkpt) = { tab.read().count(); TxLog.lastReplay.get() }
    assert(fromCkpt, "resolution must have seeded from a checkpoint")
    tab.append(docs(1, from = 200L).coalesce(1))
    val sns = tab.read().select($"sn").as[Long].collect()
    assert(sns.toSet.size === sns.length,
      "identities stay unique through checkpointed replay")
    assert(tab.read().where($"id" >= 100L).select($"status")
      .as[String].collect().forall(_ == "NEW"),
      "the DEFAULT declaration rides the checkpoint too")
  }

  test("concurrent identity appends never duplicate a value") {
    val tab = new TxTable(spark, freshRoot("race"))
    tab.create(docs(2).coalesce(1), identityColumns = Seq("sn"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until 4).map { i =>
          scala.concurrent.Future {
            barrier.await()
            tab.append(docs(3, from = 10L + i * 10L).coalesce(1))
          }
        }),
        scala.concurrent.duration.Duration(120, "s"))
    } finally pool.shutdown()
    val sns = tab.read().select($"sn").as[Long].collect()
    assert(sns.length === 14)
    assert(sns.toSet.size === 14,
      "racing appends must allocate disjoint identity ranges")
  }
}
