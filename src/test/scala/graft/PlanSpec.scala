package graft

import org.apache.spark.sql.execution.FormattedMode

import graft.queries.{CoreQueries, CurationQueries, ExtQueries,
  ProfileQueries, Q}

/** Automated plan audit: the scale claims the queries make (pushdown,
  * pruning, broadcast, top-k and window-limit pushdown, no accidental
  * cartesian products) asserted against the OPTIMIZED physical plan, so
  * a regression in plan shape fails CI instead of waiting for a bench
  * diff. Planning only — nothing here executes a job.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // materialization OFF: eager localCheckpoints would both execute jobs
  // here and truncate the plan at each checkpoint, hiding every join
  // upstream of one from the assertions below
  private def plan(q: Q): String =
    graft.queries.Mat.withoutMaterialization(
      q.run(spark, dir).queryExecution.explainString(FormattedMode))

  test("top-k order query plans as TakeOrderedAndProject, not a global sort") {
    assert(plan(CoreQueries.q07TopOrders).contains("TakeOrderedAndProject"))
  }

  test("latest-event-per-user pushes the rank filter into WindowGroupLimit") {
    assert(plan(CoreQueries.q06LatestEventPerUser)
      .contains("WindowGroupLimit"))
  }

  test("query-set filters push down to the parquet scan") {
    // kNN restricts queries to vec_id < 10: the scan itself must carry
    // the predicate, not a post-scan Filter alone
    val p = plan(ExtQueries.extKnnBrute)
    assert(p.contains("PushedFilters: [") && p.contains("LessThan(vec_id"))
  }

  test("fingerprinting scan is column-pruned to the referenced columns") {
    val p = plan(ExtQueries.extFingerprint)
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    // documents carries lang/source/label the query never touches
    readSchemas.foreach { rs =>
      assert(!rs.contains("lang") && !rs.contains("source"),
        s"unpruned scan: $rs")
    }
  }

  test("JDBC partitioned scan pushes predicate and partitioning to the database") {
    // the parquet scans have PushedFilters pinned below; S1's posture
    // needs the same — a filter on the partitioned Derby read must run
    // IN the database (PushedFilters on the JDBC relation), and the
    // relation must really be the 4-way partitioned read, or a 100 TB
    // extract serializes through one connection
    import org.apache.spark.sql.functions.col
    val p = CoreQueries.jdbcSupplierFrame(spark, dir)
      .where(col("S_ACCTBAL") > 0.0)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("JDBCRelation"), s"no JDBC relation in plan:\n$p")
    assert(p.contains("numPartitions=4"),
      "JDBC scan lost its partitioned-read shape")
    assert("(?i)PushedFilters: \\[[^\\]]*GreaterThan\\(S_ACCTBAL".r
      .findFirstIn(p).isDefined,
      s"acctbal predicate not pushed into the JDBC source:\n$p")
    // strongest form: the generated source-side SQL itself carries the
    // WHERE — the filter runs in the database, not post-extract
    assert("(?i)External engine query:[^\\n]*WHERE[^\\n]*S_ACCTBAL[^\\n]* > 0".r
      .findFirstIn(p).isDefined,
      s"source-side SQL lacks the WHERE:\n$p")
  }

  test("decontamination broadcasts the eval gram set") {
    val p = plan(CurationQueries.extDecontaminate)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("dedup candidate joins are keyed — no cartesian products anywhere") {
    for (q <- Seq(ExtQueries.extDedupNgramJaccard,
        ExtQueries.extDedupMinhashLsh, ExtQueries.extDedupSimhash,
        ExtQueries.extDedupComponents, CurationQueries.extDedupChunk,
        graft.queries.CorpusQueries.extDedupEditDistance)) {
      val p = plan(q)
      // the audit must actually SEE the candidate joins — if a future
      // materialization point truncates the plan above them, this fails
      // instead of the cartesian asserts passing vacuously
      assert(p.contains("Join"), s"${q.name}: no joins visible to audit")
      assert(!p.contains("CartesianProduct"), s"${q.name} plans all-pairs")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} plans an unkeyed join")
    }
  }

  test("CMS probe joins the 4096-cell sketch by broadcast") {
    val p = plan(ProfileQueries.extHeavyHittersCms)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("LM scoring broadcasts the vocabulary-sized model") {
    val p = plan(ProfileQueries.extLmQuality)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("PII redaction plans no aggregation shuffle — pure column work") {
    val p = plan(ProfileQueries.extPiiRedact)
    // the only exchange allowed is the presentation ORDER BY
    assert(!p.contains("hashpartitioning"))
  }

  test("semantic/graph/PQ operators never plan an unbounded cartesian") {
    // centroid probes use crossJoin(broadcast(cents)) by design — a
    // BroadcastNestedLoopJoin against a CONSTANT-size side (k or m×k
    // rows), which scales; what must never appear is CartesianProduct,
    // the sign of an unkeyed corpus-vs-corpus pairing
    for (q <- Seq(graft.queries.SemanticQueries.extDedupSemantic,
        graft.queries.SemanticQueries.extPagerankIter,
        graft.queries.SemanticQueries.extKnnPq)) {
      val p = plan(q)
      assert(p.contains("Join"), s"${q.name}: no joins visible to audit")
      assert(!p.contains("CartesianProduct"), s"${q.name} plans all-pairs")
    }
  }

  test("tf-idf top-k window takes the WindowGroupLimit pushdown") {
    val p = plan(ProfileQueries.extTfidfVectors)
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("sequence packing plans one keyed window, no global sort before it") {
    val p = plan(CurationQueries.extPackSequences)
    // the cumulative sum runs per-source (hash-partitioned window); the
    // only Exchange besides the final presentation ORDER BY is the
    // hashpartitioning on source
    assert(p.contains("Window"))
    assert(p.contains("hashpartitioning(source"))
  }

  test("every dedup-family member declares its candidate-population bound") {
    // Regression guard for the round-4 edit-distance miss: a self-join
    // dedup operator shipped with an uncapped blocking key. Every
    // dedup-family query MUST be registered here with the mechanism that
    // bounds its candidate population; an unregistered new member fails
    // this test with instructions, and "cap-filter" members are
    // structurally verified to carry the cap predicate in their
    // optimized plan (so deleting the cap also fails).
    val mechanism: Map[String, String] = Map(
      "ext_dedup_exact" -> "keyed-window", // ranking window, no self-join
      "ext_cross_source_dedup" -> "keyed-window",
      "ext_stream_dedup" -> "watermarked-state", // bounded streaming state
      "ext_dedup_ngram_jaccard" -> "cap-filter", // gramDocFreqCap
      "ext_dedup_minhash_lsh" -> "cap-filter", // lshBucketCap
      "ext_dedup_simhash" -> "cap-filter", // lshBucketCap
      "ext_dedup_chunk" -> "cap-filter", // chunkDocFreqCap
      "ext_dedup_substring_span" -> "cap-filter", // gramDocFreqCap
      "ext_dedup_edit_distance" -> "cap-filter", // lshBucketCap on blocks
      "ext_dedup_components" -> "cap-filter", // capped jaccard edges
      "ext_dedup_incremental" -> "bloom-exact-key", // bloom + exact fp join
      "ext_dedup_incremental_near" -> "cap-filter", // lshBucketCap on stored index
      "ext_dedup_semantic" -> "cap-filter", // semanticClusterCap + scaled k
      "ext_dedup_embedding_cosine" -> "cap-filter") // lshBucketCap on buckets
    val family = SparkEntry.queries.keys
      .filter(_.contains("dedup")).toSeq.sorted
    assert(family.nonEmpty)
    for (n <- family)
      assert(mechanism.contains(n),
        s"$n: dedup-family member with NO declared candidate-population " +
          "bound — cap its blocking key (the lshBucketCap pattern, " +
          "replicated in the oracle) and register the mechanism here")
    val capped = Seq(ExtQueries.extDedupNgramJaccard,
      ExtQueries.extDedupIncrementalNear,
      ExtQueries.extDedupMinhashLsh, ExtQueries.extDedupSimhash,
      CurationQueries.extDedupChunk,
      graft.queries.CorpusQueries.extDedupEditDistance,
      ExtQueries.extDedupComponents, ExtQueries.extDedupEmbedding,
      CurationQueries.extDedupSubstringSpan,
      graft.queries.SemanticQueries.extDedupSemantic)
    // anchored to the CAP COLUMNS and the ACTUAL cap constants — a bare
    // "<= 100" regex would be satisfied by any unrelated literal (and
    // break silently if a cap constant changes)
    // the semantic cap is RELATIVE to the plan corpus: compute the exact
    // literal the law produces for this dir's embeddings count
    val semCap = graft.queries.SemanticQueries.semanticCapFor(
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    val caps = Seq(ExtQueries.gramDocFreqCap, ExtQueries.lshBucketCap,
      CurationQueries.chunkDocFreqCap, CurationQueries.spanOccCap,
      semCap)
      .distinct.mkString("|")
    val capPredicate =
      s"(gram_df|bpop|gdf|gmax|cdf|cpop)#\\S+ <= ($caps)\\)".r
    for (q <- capped) {
      assert(mechanism(q.name) == "cap-filter")
      val p = plan(q)
      assert(capPredicate.findFirstIn(p).isDefined,
        s"${q.name}: no population-cap predicate in the optimized plan")
    }
  }
}
