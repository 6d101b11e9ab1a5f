package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Cache ownership: the iterative / multi-consumer queries materialize
  * their intermediates via localCheckpoint (context-cleaned when the
  * result is dropped) or persist scoped in try/finally — NOT via
  * unscoped Dataset.persist. A library user composing these in one
  * long-lived session must accumulate ZERO pinned cache-manager entries;
  * the Verify/Bench clearCache contract is a harness convenience, not a
  * correctness requirement for these operators.
  */
class CacheScopeSpec extends SparkSpec {

  private val scoped =
    Seq("q35_bottomk_quantile", "q40_pagerank", "q42_reach",
      "txt_bpe", "txt_bpe_encode", "emb_fps",
      // round-7 iterative additions: MMR rounds and k-core peels run on
      // localCheckpoint-pinned rounds, never unscoped persist
      "emb_mmr", "q46_kcore")

  test("scoped queries leave no cache-manager entries, run back-to-back") {
    // other suites share the session — measure growth, not emptiness
    val baseline = cacheEntries
    for (name <- scoped) {
      val n = SparkEntry.queries(name)(spark, sf).collect().length
      assert(n > 0, s"$name returned no rows")
      assert(cacheEntries == baseline,
        s"$name left ${cacheEntries - baseline} pinned cache entries " +
          "(unscoped persist) — composing callers would leak blocks")
    }
  }
}
