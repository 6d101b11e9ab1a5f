package graft

import org.apache.spark.sql.functions._

/** The scale-probe amplifier must produce a corpus that is bigger but
  * structurally HONEST: unique keys, intact foreign keys, and — the
  * property the whole probe rests on — LINEAR dup/candidate mass
  * (identical copies would give quadratic LSH pair growth no real
  * corpus shows, and the probe would "find" curvature the engine
  * doesn't have).
  */
class ScaleProbeSpec extends SparkSpec {
  import spark.implicits._

  private val amp = 3
  private lazy val dest: String = {
    val d = graft.rawdata.Topic.tempDir("amp-probe")
    ScaleProbe.amplify(spark, sf, d, amp)
    d
  }

  test("amplified fact tables scale by amp with disjoint, join-consistent keys") {
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "events", "documents", "embeddings")) {
      val base = Tables.t(spark, sf, t).count()
      val big = Tables.t(spark, dest, t).count()
      assert(big === amp * base, s"$t must have amp x rows")
    }
    assert(Tables.t(spark, dest, "region").count() ===
      Tables.t(spark, sf, "region").count(), "dimensions stay fixed")
    val docIds = Tables.t(spark, dest, "documents").select($"doc_id")
    assert(docIds.distinct().count() === docIds.count(), "doc ids stay unique")
    // FK integrity inside every copy: orders -> customer, lineitem -> orders/part
    val o = Tables.t(spark, dest, "orders")
    val c = Tables.t(spark, dest, "customer")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() === 0L,
      "every amplified order keeps a matching amplified customer")
    val li = Tables.t(spark, dest, "lineitem")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count() === 0L,
      "every amplified lineitem keeps a matching amplified order")
  }

  test("amplified LSH candidate-pair mass is linear, never quadratic") {
    val basePairs = graft.queries.CorpusLshIndex.candidates(spark, sf).count()
    val pairs = graft.queries.CorpusLshIndex.candidates(spark, dest)
    // token-perturbed copies share no shingles, so candidates must stay
    // WITHIN copies — cross-copy pairs would be the amp² blowup identical
    // copies produce (tiny slack for a freak 4-minhash band collision)
    val cross = pairs
      .filter(($"doc_a" divide lit(ScaleProbe.KeyOffset)).cast("long") =!=
        ($"doc_b" divide lit(ScaleProbe.KeyOffset)).cast("long")).count()
    assert(cross <= 2, s"$cross cross-copy candidate pairs — copies are correlated")
    // per-copy pair mass varies with the copy's re-hashed minhash draws
    // (same jaccard structure, fresh band coin-flips) but each copy must
    // stay the same order as the base corpus — linear total, no blowup
    val perCopy = pairs
      .groupBy(($"doc_a" divide lit(ScaleProbe.KeyOffset)).cast("long").as("cp"))
      .count().select($"count").as[Long].collect()
    assert(perCopy.length === amp)
    assert(perCopy.forall(n => n <= 5 * math.max(1L, basePairs)),
      s"a copy's pair mass blew past 5x the base corpus: ${perCopy.toSeq} vs $basePairs")
  }

  test("amplified embeddings decorrelate across copies AND within each copy") {
    // cross-copy pairs of the SAME source vector must not dominate the
    // banded-LSH embed candidates: the per-vector offset pushes them
    // apart. Same-source pairs are (va % 2^32 == vb % 2^32).
    val pairs = graft.queries.CorpusLshIndex.embedPairs(spark, dest)
      .select($"vec_a", $"vec_b")
    val total = pairs.count()
    val sameSource = pairs
      .filter(pmod($"vec_a", lit(ScaleProbe.KeyOffset)) ===
        pmod($"vec_b", lit(ScaleProbe.KeyOffset))).count()
    assert(total > 0, "amplified embed index produced no candidates")
    assert(sameSource * 2 <= total,
      s"cross-copy self-pairs dominate ($sameSource of $total) — offset vectors too weak")
    // the round-9 regression this spec missed: a per-copy CONSTANT
    // offset collapsed every copy into one band bucket (all signatures
    // = sign(h·offset)), making the band join quadratic per copy —
    // 45 GB of shuffle at amp=100. Bound each copy's pair mass by a
    // small multiple of the base corpus's, like the text test above.
    val basePairs = graft.queries.CorpusLshIndex.embedPairs(spark, sf).count()
    val perCopy = pairs
      .groupBy(($"vec_a" divide lit(ScaleProbe.KeyOffset)).cast("long").as("cp"))
      .count().select($"count").as[Long].collect()
    // 10x base still rules out the collapse by orders of magnitude: a
    // one-bucket copy pairs ~n²/2 ≈ 2M per band vs base ~39k (randomized
    // copies legitimately sit a few x above the clustered base corpus)
    assert(perCopy.forall(n => n <= 10 * math.max(1L, basePairs)),
      s"a copy's embed pair mass blew past 10x the base corpus: ${perCopy.toSeq} vs $basePairs")
  }
}
