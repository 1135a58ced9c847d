package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ext.SkewJoin

/** Property tests (raw ScalaCheck API — the scalatest bridge artifact is
  * not on the offline classpath). Few cases per property: each case runs
  * Spark jobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withMaxSize(40)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("window dedup is idempotent and keeps the min value per key") {
    check(Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 10), Gen.choose(0, 1000)))) { xs =>
      val df = xs.toDF("k", "v")
      val dedup1 = df.groupBy($"k").agg(min($"v").as("v"))
      val once = dedup1.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val twice = dedup1.groupBy($"k").agg(min($"v").as("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val expected = xs.groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(_._2).min) }.toSet
      once == expected && twice == expected
    })
  }

  test("salted join equals plain join for any salt and key distribution") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 100))),
      Gen.choose(1, 8)) { (xs, salt) =>
      val big = xs.toDF("k", "v")
      val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (5L, "d"))
        .toDF("k", "name")
      val plain = big.join(small, Seq("k"), "inner")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val salted = SkewJoin.saltedInnerJoin(big, small, "k", salt)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      plain == salted
    })
  }

  test("decimal sums are identical across any repartitioning") {
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(-100000, 100000)),
      Gen.choose(1, 8)) { (cents, parts) =>
      val df = cents.toDF("c")
        .select(($"c".cast("decimal(18,2)") / 100).as("d"))
      val whole = df.agg(sum($"d")).collect().head.getDecimal(0)
      val split = df.repartition(parts).agg(sum($"d"))
        .collect().head.getDecimal(0)
      whole.compareTo(split) == 0
    })
  }

  test("cdc current-state equals a driver-side last-write-wins fold") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 8L), Gen.choose(0L, 6L),
      Gen.oneOf("U", "D")))) { raw =>
      // payload is a FUNCTION of (k, seq, op): rows fully tied on the
      // window ordering then carry equal payloads, so the row_number
      // pick among them (not contractually stable) cannot matter
      val ops = raw.map { case (k, seq, op) =>
        (k, seq, op, (k * 31 + seq * 7 + (if (op == "U") 1 else 0)).toInt)
      }
      val df = ops.toDF("k", "seq", "op", "payload")
      val got = graft.ext.Cdc.currentState(df, "k")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val expected = ops.groupBy(_._1).flatMap { case (k, es) =>
        // last write wins; seq ties break toward the upsert ('U' > 'D')
        val win = es.maxBy(e => (e._2, e._3))
        if (win._3 == "D") None else Some((k, win._4))
      }.toSet
      got == expected
    })
  }

  test("mergeState over ANY batch split equals the one-shot currentState") {
    // the streaming foreachBatch contract: tombstone-retaining merges
    // must make the final table independent of where the micro-batch
    // boundaries fall — including a delete arriving BEFORE a lower-seq
    // update for the same key
    check(Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.choose(0L, 8L), Gen.choose(0L, 6L), Gen.oneOf("U", "D"))),
      Gen.choose(1, 4)) { (raw, nBatches) =>
      val ops = raw.map { case (k, seq, op) =>
        (k, seq, op, (k * 31 + seq * 7 + (if (op == "U") 1 else 0)).toInt)
      }
      val df = ops.toDF("k", "seq", "op", "payload")
      val oneShot = graft.ext.Cdc.currentState(df, "k")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val batches = ops.zipWithIndex.groupBy(_._2 % nBatches)
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      val folded = batches.foldLeft(df.limit(0)) { (st, b) =>
        graft.ext.Cdc.mergeState(
          st, b.toDF("k", "seq", "op", "payload"), "k")
      }
      val got = folded.where($"op" =!= "D")
        .collect().map(r => (r.getLong(0), r.getInt(3))).toSet
      got == oneShot
    })
  }

  test("morton code round-trips both dimensions for any inputs") {
    check(Prop.forAll(
      Gen.choose(0L, 255L), Gen.choose(0L, 255L)) { (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(graft.ext.ZOrderLayout.mortonCode($"a", $"b", 8).as("m"))
        .collect().head.getLong(0)
      // deinterleave: even bits -> a, odd bits -> b
      val (da, db) = (0 until 8).foldLeft((0L, 0L)) { case ((x, y), i) =>
        (x | (((r >> (2 * i)) & 1L) << i),
         y | (((r >> (2 * i + 1)) & 1L) << i))
      }
      da == a && db == b
    })
  }
}
