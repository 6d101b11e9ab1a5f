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
    // Other suites share the session AND (under sbt's parallel suite
    // execution) run concurrently, persisting/unpersisting their own
    // intermediates against the same cache manager — so a single global
    // before/after comparison is racy. Per query, sample the entry
    // count immediately around the run and retry up to 3 times: a REAL
    // leak (unscoped persist inside the query) grows the count on EVERY
    // attempt, while a concurrent suite's transient entry clears by the
    // next attempt.
    for (name <- scoped) {
      val grewEveryTime = (1 to 3).forall { _ =>
        val before = cacheEntries
        val n = SparkEntry.queries(name)(spark, sf).collect().length
        assert(n > 0, s"$name returned no rows")
        cacheEntries > before
      }
      assert(!grewEveryTime,
        s"$name left pinned cache entries on 3/3 runs " +
          "(unscoped persist) — composing callers would leak blocks")
    }
  }
}
