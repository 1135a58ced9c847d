package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural relations between the ScaleConfig knobs — the invariants
  * the scaling laws assume. Pure arithmetic (no Spark session): a
  * config edit that silently breaks a law fails here with the reason,
  * not three suites downstream.
  */
class ScaleConfigSpec extends AnyFunSuite {
  import ScaleConfig._

  test("semantic k law: floor below, √N above, cap tracks expected size") {
    def k(n: Long): Long = math.max(semanticKMin,
      math.ceil(math.sqrt(n.toDouble)).toLong)
    def cap(n: Long): Long =
      semanticCapFactor * math.ceil(n.toDouble / k(n)).toLong
    assert(k(200) === semanticKMin, "test corpora stay on the floor")
    assert(k(2000) === 45L, "sf0.1 leaves the floor (the law engages)")
    assert(k(2000000) === 1415L,
      "k grows as √N — assignment stays N^1.5, never the N² a " +
        "constant-cluster-size law costs")
    assert(semanticCapFactor >= 2L,
      "cap must give healthy skew headroom above the expected size")
    // the cap follows the corpus: 4× the expected population at each N
    assert(cap(2000) === semanticCapFactor * 45L)
    assert(cap(2000000) === semanticCapFactor * 1414L)
  }

  test("band shapes divide evenly and caps are sane") {
    assert(minhashK % minhashBands === 0,
      "MinHash rows-per-band must be integral")
    assert(pqM * pqSubDim === 64,
      "PQ subspaces must tile the embedding dimension")
    assert(gramDocFreqCap >= 2L && lshBucketCap >= 2L,
      "a cap below 2 kills ALL candidate pairs")
    // LSH buckets stay finer-grained than SemDeDup clusters by design:
    // compare against the cap at the bench corpus scale (N = 2000)
    assert(lshBucketCap < semanticCapFactor * 45L,
      "LSH buckets are finer-grained than SemDeDup clusters by design")
  }
}
