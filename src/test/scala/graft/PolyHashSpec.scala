package graft

import org.apache.spark.sql.functions._

import graft.functions.PolyHash
import graft.queries.ExtQueries

/** PolyHash (native codegen'd polynomial hash) must be bit-identical to
  * the higher-order-function rendering it replaces on hot paths — the
  * HOF is itself the oracle-witness (mhBaseDuck computes the same fold
  * in DuckDB, covered by the minhash/simhash/fingerprint harness
  * oracles).
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private def bothHashes(values: Seq[String], mult: Int, salt: Int) = {
    PolyHash.register(spark)
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s")
      .select($"id", $"s",
        expr(s"poly_hash(s, $mult, $salt)").as("native"),
        expr(ExtQueries.mhBaseSpark("s", mult, salt)).as("hof"))
      .collect()
  }

  test("native hash equals the HOF fold on crafted strings incl. unicode") {
    val cases = Seq(
      "", "a", "ab", "hello world", " ", "  double  spaces ",
      "é", "€uro", "mixed é€ text", "𝄞 astral clef 𝄞",
      "x" * 5000, (0 until 500).map(i => s"w$i").mkString(" "))
    for ((mult, salt) <- Seq((31, 7), (37, 11))) {
      bothHashes(cases, mult, salt).foreach { r =>
        assert(r.getAs[Long]("native") === r.getAs[Long]("hof"),
          s"mult=$mult salt=$salt s=${r.getAs[String]("s").take(40)}")
      }
    }
  }

  test("native hash equals the HOF fold on every corpus document") {
    PolyHash.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id",
        expr("poly_hash(text, 31, 7)").as("native"),
        expr(ExtQueries.mhBaseSpark("text")).as("hof"))
    assert(docs.where($"native" =!= $"hof").count() === 0)
    assert(docs.count() > 0)
  }

  test("empty string hashes to the salt (the DuckDB/zero-fold semantic)") {
    PolyHash.register(spark)
    val r = Seq(Tuple1("")).toDF("s")
      .select(expr("poly_hash(s, 31, 7)").as("h")).collect().head
    assert(r.getAs[Long]("h") === 7L)
  }

  test("wrong arity raises a clear signature error, not IndexOutOfBounds") {
    PolyHash.register(spark)
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.HyperplaneBands.register(spark)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    for ((sql, want) <- Seq(
        ("SELECT poly_hash('a', 31)", "expects exactly 3"),
        ("SELECT cosine_sim(array(1.0D))", "expects exactly 2"),
        ("SELECT hyperplane_bands(array(1.0D))", "expects exactly 3"))) {
      val ex = intercept[Throwable] { spark.sql(sql).collect() }
      assert(messages(ex).exists(_.contains(want)),
        s"$sql → ${messages(ex).mkString(" | ")}")
    }
  }
}
