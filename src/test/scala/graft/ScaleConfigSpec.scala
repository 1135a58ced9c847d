package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural relations between the ScaleConfig knobs — the invariants
  * the scaling laws assume. Pure arithmetic (no Spark session): a
  * config edit that silently breaks a law fails here with the reason,
  * not three suites downstream.
  */
class ScaleConfigSpec extends AnyFunSuite {
  import ScaleConfig._

  test("semantic k law: floor below, N/target above, cap a multiple of target") {
    def k(n: Long): Long = math.max(semanticKMin,
      math.ceil(n / semanticTargetClusterSize.toDouble).toLong)
    assert(k(500) === semanticKMin, "test corpora stay on the floor")
    assert(k(2000) === 32L, "sf0.1 leaves the floor (the law engages)")
    assert(k(2000000) === 31250L, "k grows linearly with N")
    assert(semanticClusterCap % semanticTargetClusterSize === 0L &&
      semanticClusterCap / semanticTargetClusterSize >= 2L,
      "cap must give healthy skew headroom above the expected size")
  }

  test("band shapes divide evenly and caps are sane") {
    assert(minhashK % minhashBands === 0,
      "MinHash rows-per-band must be integral")
    assert(pqM * pqSubDim === 64,
      "PQ subspaces must tile the embedding dimension")
    assert(gramDocFreqCap >= 2L && lshBucketCap >= 2L,
      "a cap below 2 kills ALL candidate pairs")
    assert(lshBucketCap < semanticClusterCap,
      "LSH buckets are finer-grained than SemDeDup clusters by design")
  }
}
