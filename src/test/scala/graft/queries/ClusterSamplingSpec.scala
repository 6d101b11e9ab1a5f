package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Structural invariants for dd_cluster (connected components) and the
  * sampling operators — properties the oracle's value-compare can't
  * state directly (transitivity, budgets, determinism).
  */
class ClusterSamplingSpec extends SparkSpec {

  test("dd_cluster: components contain every near-dup pair and are min-labeled") {
    val spark2 = spark
    import spark2.implicits._
    val clusters = SparkEntry.queries("dd_cluster")(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (doc, cid, n) => doc -> (cid, n) }.toMap
    spark.catalog.clearCache()
    assert(clusters.nonEmpty, "the sf0.001 corpus has known duplicates")

    // cluster id is the min member, size matches the member count
    val members = clusters.toSeq.groupBy(_._2._1).map { case (cid, ms) => cid -> ms.map(_._1) }
    for ((cid, docs) <- members) {
      assert(docs.min == cid, s"cluster $cid is not labeled by its min member")
      assert(docs.forall(d => clusters(d)._2 == docs.size.toLong))
      assert(docs.size >= 2, "singleton docs must not appear in the cluster output")
    }

    // transitive closure: both endpoints of every verified near-dup pair
    // share a cluster (the property pair output alone does not give you)
    val pairs = SparkEntry.queries("dd_jaccard")(spark, sf)
      .filter($"jaccard_ppm" >= 400000)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    for ((a, b) <- pairs)
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
  }

  test("samp_stratified: deterministic, within stratum bounds, small strata kept whole") {
    val spark2 = spark
    import spark2.implicits._
    val run1 = SparkEntry.queries("samp_stratified")(spark, sf).as[(String, Long)].collect()
    val run2 = SparkEntry.queries("samp_stratified")(spark, sf).as[(String, Long)].collect()
    assert(run1.sameElements(run2), "hash sampling must be run-to-run deterministic")
    val kept = run1.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val totals = graft.Tables.t(spark, sf, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- totals) {
      assert(kept.getOrElse(lang, 0L) <= n)
      // threshold = target*2^32 div n ≥ 2^32 when n ≤ target → keep all
      if (n <= 40L) assert(kept.getOrElse(lang, 0L) == n, s"small stratum $lang must be kept whole")
    }
  }

  test("samp_token_budget: every source stream selected, budget respected") {
    val spark2 = spark
    import spark2.implicits._
    val sel = SparkEntry.queries("samp_token_budget")(spark, sf)
      .as[(String, Long, Long)].collect()
    val sources = graft.Tables.t(spark, sf, "documents")
      .select($"source").distinct().as[String].collect().toSet
    assert(sel.map(_._1).toSet == sources, "no stream may starve (first doc always taken)")
    for ((src, docs) <- sel.groupBy(_._1)) {
      val toks = docs.map(_._3)
      // all but the last-admitted doc fit strictly under the budget
      assert(toks.sum - toks.max < 4000L, s"source $src blew its token budget")
    }
  }

  test("samp_softdedup: effective mass bounded by raw, exact when dup-free") {
    val spark2 = spark
    import spark2.implicits._
    val rows = SparkEntry.queries("samp_softdedup")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    for ((src, nDocs, nDup, nTok, effDocs, effTok, down) <- rows) {
      assert(nDup <= nDocs, s"$src: more dup docs than docs")
      // weights are in (0, 1]: effective mass never exceeds raw mass
      assert(effDocs <= nDocs * 1000000L, s"$src: eff docs exceed raw")
      assert(effTok <= nTok * 1000L, s"$src: eff tokens exceed raw")
      assert(down <= 1000000L, s"$src: downweight above unity")
      // floor(x/1) is exact, so a dup-free source is NOT downweighted at
      // all — and any dup doc (n>=2) strictly shrinks the doc mass
      if (nDup == 0L) {
        assert(effDocs == nDocs * 1000000L, s"$src: dup-free source downweighted")
        assert(effTok == nTok * 1000L, s"$src: dup-free token mass shrunk")
      } else assert(effDocs < nDocs * 1000000L, s"$src: dup docs at full weight")
    }
    // the corpus HAS duplicates (the dedup family's fixtures guarantee it)
    assert(rows.map(_._3).sum > 0L, "no source reports any duplicate docs")
  }

  test("samp_ess: ESS bounded by N and min-source size, shares consistent") {
    val spark2 = spark
    import spark2.implicits._
    val rows = SparkEntry.queries("samp_ess")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_._2).sum
    val essMilli = rows.head._5
    assert(rows.forall(_._5 == essMilli), "global ESS must be identical on every row")
    // ESS ≤ N holds for ANY positive weights by Cauchy-Schwarz — including
    // the nano-quantized ones the query actually sums — so floor rounding
    // cannot break it
    assert(essMilli <= nTotal * 1000L, s"ESS ${essMilli / 1000.0} exceeds corpus size $nTotal")
    // ESS ≥ min_s n_s (sw² ≥ Σw² pushes ESS above the smallest stratum);
    // quantization can only shave sub-milli amounts, leave 1‰ headroom
    val minSource = rows.map(_._2).min
    assert(essMilli >= minSource * 999L, s"ESS ${essMilli / 1000.0} below smallest source $minSource")
    // mix shares are a floor-divided partition of unity
    val shareSum = rows.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length,
      s"mix_share_ppm sums to $shareSum")
    assert(rows.forall(r => r._6 == essMilli * 1000L / nTotal), "ess_ratio_ppm inconsistent")
  }

  test("mm_phash_clusters: min-labeled components covering every hamming≤3 pair") {
    val spark2 = spark
    import spark2.implicits._
    val clusters = SparkEntry.queries("mm_phash_clusters")(spark, sf)
      .as[(String, String, Long)].collect()
      .map { case (p, c, n) => p -> (c, n) }.toMap
    spark.catalog.clearCache()
    assert(clusters.nonEmpty, "the sf0.001 asset corpus has known phash near-dups")
    val pairs = SparkEntry.queries("mm_phash_pairs")(spark, sf)
      .select($"pos_a", $"pos_b").as[(String, String)].collect()
    spark.catalog.clearCache()
    assert(pairs.nonEmpty)
    // transitive closure: both endpoints of every pair share a cluster
    for ((a, b) <- pairs)
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    def num(p: String) = p.stripPrefix("evt-").toLong
    val members = clusters.toSeq.groupBy(_._2._1).map { case (c, ms) => c -> ms.map(_._1) }
    for ((cid, ps) <- members) {
      assert(ps.map(num).min == num(cid), s"cluster $cid not labeled by its numeric-min member")
      assert(ps.forall(p => clusters(p)._2 == ps.size.toLong), s"cluster $cid size mismatch")
      assert(ps.size >= 2, "singleton assets must not appear in the cluster output")
    }
  }

  test("samp_hash_split: folds cover every doc, stay deterministic, balance near 900/50/50") {
    val out = SparkEntry.queries("samp_hash_split")(spark, sf).collect()
    spark.catalog.clearCache()
    val total = graft.Tables.t(spark, sf, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === total,
      "folds must partition the corpus (disjoint + complete)")
    // determinism: a rerun assigns identical fold counts
    val again = SparkEntry.queries("samp_hash_split")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // global fold balance: binomial(total, 0.9) 4-sigma envelope — loose
    // enough for the sf0.001 corpus, tight enough to catch a broken
    // bucket formula (e.g. mod on the wrong width)
    val train = out.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum.toDouble
    val sigma = math.sqrt(total * 0.9 * 0.1)
    assert(math.abs(train - total * 0.9) <= 4 * sigma + 1,
      s"train fold $train vs expected ${total * 0.9}")
  }
}
