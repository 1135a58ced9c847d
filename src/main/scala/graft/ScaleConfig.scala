package graft

/** The engine's scale knobs in ONE place, each with the law that says
  * how it moves when the corpus does — so a 100× scale-up is a config
  * review, not a code hunt across four query files. Every constant here
  * is interpolated into BOTH the Spark plan and the DuckDB oracle SQL of
  * the queries that use it (single definition ⇒ the two sides cannot
  * drift), and the cap constants are additionally pinned structurally in
  * PlanSpec's optimized-plan audit.
  *
  * The committed values are tuned for the driver's test corpora
  * (sf0.001–0.1: ≤ 60k docs, ≤ 2k embeddings). The "at 100 TB" column
  * is the law to apply, not a second set of magic numbers.
  */
object ScaleConfig {

  // ---- hot-key caps (the quadratic-self-join guards) ----

  /** Max document frequency for a shingle to enter the inverted-index
    * self-join (n-gram Jaccard, substring-span dedup). A gram in k docs
    * costs k² join rows and a boilerplate gram carries no dedup signal.
    * Law: INVARIANT in corpus size — it bounds per-key fan-out, not
    * coverage; raise only to trade cost for near-dup recall on corpora
    * whose true duplicates are highly replicated (k ≈ expected copies
    * of a genuinely duplicated passage, CCNet uses single digits).
    */
  val gramDocFreqCap = 5L

  /** Max population for an LSH bucket (MinHash band, SimHash block,
    * sign-LSH band, edit-distance (lang, head) block) to enter its
    * self-join: a bucket of p members is p(p−1)/2 candidate pairs, and
    * a bucket a large corpus fraction hashes into discriminates
    * nothing. Law: INVARIANT in corpus size (same reasoning as
    * [[gramDocFreqCap]]); if hot buckets are dropping real near-dups,
    * the fix is more bands/finer blocks (spreading the collisions), not
    * a larger cap.
    */
  val lshBucketCap = 100L

  /** Max document frequency for a content-defined chunk hash
    * (ext_dedup_chunk). Same law as [[gramDocFreqCap]].
    */
  val chunkDocFreqCap = 5L

  /** Max per-document multiplicity of one gram in span dedup
    * (ext_dedup_substring_span) — bounds the within-document blow-up of
    * the gram join. Law: INVARIANT (a property of documents, not of
    * corpus size).
    */
  val spanOccCap = 16L

  // ---- lake maintenance ----

  /** OPTIMIZE rewrites any file whose deletion vector shadows more than
    * this fraction of its physical rows, even if the file is otherwise
    * right-sized — reads pay the vector anti-join per scan, and past
    * this density the one-time rewrite is cheaper than the recurring
    * filter over mostly-dead rows. Law: INVARIANT in table size (a
    * per-file density, not a count); lower it on read-hot tables, raise
    * it on write-hot ones. Delta's own DV-compaction heuristic shape.
    */
  val dvRewriteFraction = 0.10

  /** Target ZCube size in ROWS for incremental clustering maintenance
    * ([[graft.lake.TxTable.optimize]] on a CLUSTER BY table): a stamped
    * cube whose live row total is below this merges into the next
    * pass's cube; at or above it the cube is STABLE and never rewritten
    * by routine maintenance again. Delta's ZCube MIN_CUBE_SIZE (100 GB)
    * in row terms. Law: rows ≈ targetCubeBytes / avgRowBytes —
    * INVARIANT in table size; it bounds rewrite amplification (a row is
    * re-clustered at most log₂(minCubeRows / appendBatchRows) times
    * before its cube goes stable) while keeping the cube COUNT — and so
    * the per-dimension pruning quality — from degrading as small
    * maintenance passes accumulate.
    */
  val minCubeRows = 1L << 22

  // ---- coarse quantization (IVF / SemDeDup / PQ) ----

  /** Cluster count for the FIXED-k IVF index demos (ext_knn_cosine_ivf
    * and friends) and the PQ coarse quantizer. Law: k ≈ N /
    * targetClusterSize for index BUILDS whose candidate lists must stay
    * bounded (published IVF practice: k ≈ √N to N/1k at billion scale,
    * trained on a sample); the kNN queries here keep a fixed small k
    * because their candidate sets are pruned per-query by nprobe — cost
    * is nprobe·N/k per query, linear in N at fixed k, so fixed k is a
    * recall/latency trade rather than a blow-up. SemDeDup, whose
    * WITHIN-cluster join is quadratic in cluster size, must NOT use
    * this — it derives k from the corpus (see [[semanticKMin]]).
    */
  val ivfK = 16

  /** Lloyd passes for every deterministic k-means fit. Law: INVARIANT
    * (fit quality knob; each pass is one broadcast-join + keyed agg scan
    * of the corpus, so passes × scans is the build cost).
    */
  val lloydIters = 2

  /** SemDeDup cluster-count law: k = max(kMin, ⌈√N⌉) — the published
    * IVF guideline (FAISS's "how big is my index": cells ≈ √N). With
    * k = √N the Lloyd ASSIGNMENT cost N·k and the within-cluster pair
    * cost Σ|c|² ≈ N·(N/k) BOTH land at N^1.5 — the declared law for
    * the whole query. The earlier k = ⌈N/64⌉ law held cluster sizes
    * (and so pair cost) constant but made assignment N²/64: the
    * sf0.1→sf1 spot-bench measured it ×35 for ×10 data — the suite's
    * only super-linear query (BASELINE.md §scaling) — which is exactly
    * the blow-up the √N rule exists to avoid.
    */
  val semanticKMin = 16L

  /** SemDeDup cluster-population cap as a MULTIPLE of the corpus's
    * EXPECTED cluster size ⌈N/k⌉: healthy skew survives, a collapsed
    * quantizer's pile is dropped before pairing (and signals a
    * rebuild). Worst-case pair cost ≤ N·capFactor·(N/k) =
    * capFactor·N^1.5 — the cap now TRACKS the law instead of a fixed
    * byte count, so it binds at every corpus size the same way.
    */
  val semanticCapFactor = 4L

  // ---- sign-LSH (embedding near-dup banding) ----

  /** Hyperplane-LSH shape for ext_dedup_embedding_cosine: bands ×
    * rowsPerBand sign bits. Law: rowsPerBand sets bucket selectivity
    * (collision probability per band = (1 − θ/π)^rows — INVARIANT in
    * N); bands set recall (1 − (1 − p^rows)^bands) and grow only to
    * buy recall, each band costing one pass over the signatures.
    */
  val signLshBands = 16
  val signLshRowsPerBand = 16

  // ---- MinHash ----

  /** MinHash signature size and LSH banding (bands × rowsPerBand =
    * minhashK). Law: same recall algebra as the sign-LSH shape;
    * INVARIANT in N. 16 hashes / 4 bands targets the ≥ 0.5-Jaccard
    * operating point ((1−(1−j⁴)⁴): j=0.5 → 0.23, j=0.8 → 0.86).
    */
  val minhashK = 16
  val minhashBands = 4

  // ---- PQ (vector quantization) ----

  /** Product-quantization shape: m subspaces × subDim dims, pqCodes
    * codewords per subspace codebook. Law: m·subDim = embedding dim
    * (data property); pqCodes is the memory/recall trade (8-bit = 256
    * codes is the published default; 16 here keeps the oracle's
    * unrolled Lloyd chains tractable), INVARIANT in N.
    */
  val pqM = 4
  val pqSubDim = 16
  val pqCodes = 16

  // ---- deterministic-fold banding ----

  /** Width of the fixed key-range bands that two-level ordered folds
    * use (PageRank hub inflow, KS corpus ECDF, banded prefix sums): the
    * level-1 agg buffer holds ≤ bandWidth entries regardless of key
    * skew. Law: INVARIANT in N — it bounds PER-GROUP state; band COUNT
    * grows with the key domain and shuffles freely.
    */
  val pagerankBandWidth = 1024L

  // ---- hashed feature spaces ----

  /** DSIR hashed-feature bucket count. Law: INVARIANT in N (the paper's
    * fixed hash dimension; 4096 soft-counts broadcast at any corpus
    * size). Raise only for feature-collision accuracy, not for scale.
    */
  val dsirBuckets = 4096L
}
