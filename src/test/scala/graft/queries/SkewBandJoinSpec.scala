package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The skew-aware band self-join must return EXACTLY the plain join's
  * pair set while splitting a hot bucket's work across salt groups —
  * the LSH skew case AQE can't re-split (the join feeds the distinct
  * aggregation keyed the same way).
  */
class SkewBandJoinSpec extends SparkSpec {
  import spark.implicits._

  /** 90%-hot corpus: 900 docs share ONE band bucket (the boilerplate
    * shingle case); 100 docs spread over 50 cold buckets (2 each); and
    * docs 0..9 ALSO share a cold bucket in another band, so some pairs
    * arise in both the hot and the cold branch (dedup must hold).
    */
  private lazy val bands = {
    val hot = (0L until 900L).map(i => (i, 0, "HOT"))
    val cold = (900L until 1000L).map(i => (i, 0, s"c${(i - 900) / 2}"))
    val overlap = (0L until 10L).map(i => (i, 1, "c0b"))
    (hot ++ cold ++ overlap).toDF("doc_id", "band", "bkey")
  }

  test("skew-aware pairs == plain pairs on a 90%-hot-bucket corpus") {
    val plain = DedupQueries.pairsOfBands(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = DedupQueries.pairsOfBandsSkewAware(bands, hot = 100, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
    // sanity on the fixture: the hot bucket dominates, pairs overlap
    // across branches, and nothing was double-counted
    assert(plain.size === 900 * 899 / 2 + 50 + 45 - 45)
  }

  test("salting bounds the hot bucket's per-task pair generation") {
    val salts = 8
    val m = 900L
    // reproduce the salted probe split: per-(bucket, salt) probe counts
    val probe = bands.filter($"bkey" === "HOT")
      .withColumn("__salt", pmod(hash($"doc_id"), lit(salts)))
      .groupBy($"__salt").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1))
    // every salt group is populated and no group exceeds 2× the even
    // share — so the m² pair generation spreads over `salts` tasks
    // instead of one
    assert(probe.length === salts)
    assert(probe.max <= 2 * m / salts,
      s"uneven salt split: ${probe.mkString(",")}")
    // per-salt pair output is ≤ share × bucket ≈ m²/salts, vs the plain
    // join's single m²/2 task — the bound the salt exists to provide
    val perSaltPairs = probe.map(_ * m).max
    assert(perSaltPairs < (m * m) / 2)
  }

  test("a corpus with no hot buckets takes the identical cold-only path") {
    val coldOnly = bands.filter($"bkey" =!= "HOT")
    val plain = DedupQueries.pairsOfBands(coldOnly)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = DedupQueries.pairsOfBandsSkewAware(coldOnly, hot = 100, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }
}
