package graft

/** Whole-query partition-count invariance: every double in a compared
  * output must come from an ordered fold, an integer-derived single
  * division, or a decimal-cast sum — so changing
  * spark.sql.shuffle.partitions must not move a single bit. This is the
  * CI net behind the determinism conventions: an order-dependent SUM
  * over doubles introduced anywhere in these queries flips results
  * between partition counts long before the cross-engine oracle sees it.
  * Representative set = the most double-heavy members of each family.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val queries = Seq(
    "ext_pagerank_iter", "ext_bm25_search", "ext_tfidf_vectors",
    "ext_psi_drift", "ext_dsir_logweight", "ext_bootstrap_ci",
    "ext_lm_quality", "ext_text_entropy", "ext_label_centroid",
    "ext_knn_cosine_ivf")

  test("double-heavy queries are bit-identical across partition counts") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] =
      queries.map { n =>
        val rows = SparkEntry.queries(n)(spark, dir).collect()
          .map(_.toString).toSeq
        n -> rows
      }.toMap
    try {
      spark.conf.set(key, "5")
      val at5 = runAll()
      spark.conf.set(key, "32")
      val at32 = runAll()
      for (n <- queries) {
        assert(at5(n).nonEmpty, s"$n returned no rows")
        assert(at5(n) === at32(n),
          s"$n differs between 5 and 32 shuffle partitions")
      }
    } finally spark.conf.set(key, prev)
  }
}
