package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Structural laws for the grouping-sets / attribution / Markov / Gram
  * operators — properties the DuckDB hash-compare can't articulate
  * (internal consistency between grouping levels, conservation of mass,
  * matrix shape), checked on sf0.001.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q32_grouping_sets levels are mutually consistent") {
    val out = SparkEntry.queries("q32_grouping_sets")(spark, sf)
      .select($"gid", $"n").as[(Long, Long)].collect()
    val total = graft.Tables.t(spark, sf, "lineitem").count()
    val byGid = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byGid(3L) === total, "grand-total row counts every lineitem")
    assert(byGid(1L) === total, "flag-level rows partition the table")
    assert(byGid(0L) === total, "(flag, status) rows partition the table")
  }

  test("ev_attribution conserves the purchase count and stays in-domain") {
    val out = SparkEntry.queries("ev_attribution")(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase").count()
    assert(out.map(_.getAs[Long]("n_purchases")).sum === purchases)
    val types = ev.select($"event_type").distinct().as[String].collect().toSet + "none"
    assert(out.map(_.getAs[String]("attrib_type")).forall(types.contains))
    // purchases never self-attribute: a purchase-only prefix lands in 'none'
    assert(!out.exists(_.getAs[String]("attrib_type") == "purchase"))
  }

  test("ev_markov rows are normalized conditional frequencies") {
    val out = SparkEntry.queries("ev_markov")(spark, sf)
      .select($"from_type", $"n", $"from_total", $"p_ppm")
      .as[(String, Long, Long, Long)].collect()
    val byFrom = out.groupBy(_._1)
    for ((from, rows) <- byFrom) {
      val totals = rows.map(_._3).distinct
      assert(totals.length === 1, s"$from has one normalizer")
      assert(rows.map(_._2).sum === totals.head, s"$from counts sum to its total")
      // floored ppms: within |to| of 1e6 from below, never above
      val pSum = rows.map(_._4).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rows.length,
        s"$from ppm sum $pSum out of range")
    }
    // transition mass = sum over users of (events - 1)
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.groupBy($"user_id").agg((count(lit(1)) - 1).as("m"))
      .agg(sum($"m")).as[Long].head()
    assert(out.map(_._2).sum === expected)
  }

  test("emb_gram emits the exact upper triangle with a PSD-consistent diagonal") {
    val out = SparkEntry.queries("emb_gram")(spark, sf)
      .select($"i", $"j", $"sxy", $"sxi", $"sxj", $"n")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val d = 64
    assert(out.length === d * (d + 1) / 2, "one cell per unordered dim pair")
    assert(out.forall { case (i, j, _, _, _, _) => i >= 1 && j >= i && j <= d })
    assert(out.map(_._6).distinct.length === 1, "one vector count")
    val diag = out.filter { case (i, j, _, _, _, _) => i == j }
    assert(diag.length === d)
    assert(diag.forall(_._3 >= 0L), "diagonal cells are sums of squares")
    // Cauchy–Schwarz on the exact integers: sxy² ≤ sii·sjj
    val dm = diag.map { case (i, _, s, _, _, _) => i -> BigInt(s) }.toMap
    assert(out.forall { case (i, j, s, _, _, _) => BigInt(s) * BigInt(s) <= dm(i) * dm(j) })
    // the per-dim sums column agrees with the diagonal's dimension order
    assert(out.forall { case (i, j, _, sxi, sxj, _) =>
      (i != j) || (sxi == sxj) })
  }

  test("emb_pca1 power iteration converges toward the dominant Gram direction") {
    val out = SparkEntry.queries("emb_pca1")(spark, sf)
      .select($"i", $"v1", $"v2", $"v3").as[(Long, Long, Long, Long)].collect()
    assert(out.length === 64)
    // renormalization bounds every round's vector to |v| <= 100, with the
    // max-magnitude coordinate actually reaching the bound's floor
    for (get <- Seq[((Long, Long, Long, Long)) => Long](_._2, _._3, _._4)) {
      val vs = out.map(get)
      assert(vs.forall(v => math.abs(v) <= 100L))
      assert(vs.map(math.abs).max >= 50L, "normalizer keeps the scale, not just the sign")
    }
    // successive rounds stabilize: v3 is closer to v2 than v2 is to v1
    // in L1 (power iteration contracts toward the dominant eigenvector)
    def l1(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    val v1 = out.map(_._2); val v2 = out.map(_._3); val v3 = out.map(_._4)
    assert(l1(v3, v2) <= l1(v2, v1), "iteration is contracting")
    // and v3 must agree with a plain-Scala replay of the same arithmetic
    // starting from v2 (one more exact integer round)
    val tri = SparkEntry.queries("emb_gram")(spark, sf)
      .select($"i", $"j", $"sxy").as[(Long, Long, Long)].collect()
    val g = tri.flatMap { case (i, j, s) =>
      if (i == j) Seq((i, j, s)) else Seq((i, j, s), (j, i, s)) }
    val v2m = out.map(r => r._1 -> r._3).toMap
    val w = g.groupBy(_._1).view.mapValues(_.map { case (_, j, s) => s * v2m(j) }.sum).toMap
    val m = w.values.map(math.abs).max
    val q = 1L + (m - 1L) / 100L
    val expectV3 = out.map { r =>
      val wi = w(r._1)
      math.floorDiv(wi, q)
    }
    assert(out.map(_._4).toSeq === expectV3.toSeq)
  }

  test("dd_canonical keeps exactly one best-quality member per cluster") {
    val out = SparkEntry.queries("dd_canonical")(spark, sf)
      .select($"doc_id", $"cluster_id", $"quality_ppm", $"canonical_doc", $"kept")
      .as[(Long, Long, Long, Long, Long)].collect()
    // total output covers the corpus exactly once
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.length === graft.Tables.t(spark, sf, "documents").count())
    val byCluster = out.groupBy(_._2)
    for ((_, rows) <- byCluster) {
      val kept = rows.filter(_._5 == 1L)
      assert(kept.length === 1, "one canonical per cluster")
      val canon = kept.head
      assert(rows.forall(_._4 == canon._1), "everyone points at the canonical")
      // canonical is max by (quality, then min doc_id)
      val best = rows.maxBy(r => (r._3, -r._1))
      assert(canon._1 === best._1, "canonical is the best-quality member")
    }
  }

  test("txt_cms never undercounts and is exact for dominant tokens") {
    val out = SparkEntry.queries("txt_cms")(spark, sf)
      .select($"tok", $"n_exact", $"cms_estimate").as[(String, Long, Long)].collect()
    assert(out.length === 20)
    // the count-min guarantee: estimates bound the truth from above
    assert(out.forall { case (_, exact, est) => est >= exact })
    // error is bounded by colliding mass: e·N/W with W=1024 over this
    // corpus leaves the top tokens' estimates within 2× of truth
    assert(out.forall { case (_, exact, est) => est <= 2 * exact })
  }

  test("q33_approx_quantile respects the sketch's rank-error bound") {
    val r = SparkEntry.queries("q33_approx_quantile")(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    val sorted = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_extendedprice".cast("double")).as[Double].collect().sorted
    assert(n === sorted.length)
    val tol = n / 10000 + 1 // accuracy=10000 ⇒ rank error ≤ n/accuracy
    for ((p, col) <- Seq(0.5 -> "approx_p50", 0.95 -> "approx_p95")) {
      val v = r.getAs[Double](col)
      val rank = sorted.count(_ <= v).toLong
      val target = (p * n).toLong
      assert(math.abs(rank - target) <= tol + 1,
        s"$col rank $rank vs target $target (tol $tol)")
    }
  }

  // the hand-built deterministic HLL (q34): m=64 registers give a
  // standard error of 1.04/√64 ≈ 13%; assert a generous 3σ envelope —
  // the VALUES are already hash-checked against the oracle, this guards
  // the estimator's statistical sanity
  test("q34 hand-built HLL estimates within the m=64 error envelope") {
    val rows = SparkEntry.queries("q34_hll_sketch")(spark, sf)
      .select($"hll_est", $"exact_distinct", $"err_ppm")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact, err) =>
      assert(est > 0 && exact > 0)
      assert(err <= 400000L, s"HLL est $est vs exact $exact (err $err ppm)")
      assert(err === math.abs(est - exact) * 1000000 / exact)
    }
  }

  // bottom-k (k=128) sample quantiles: the sample p50 must sit within
  // the ±3·√(p(1-p)/k) rank envelope of the true quantile
  test("q35 bottom-k sample quantiles respect the sampling rank envelope") {
    val rows = SparkEntry.queries("q35_bottomk_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_quantity".cast("long")).as[(String, Long)]
      .collect().groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    for (r <- rows) {
      val flag = r.getAs[String]("l_returnflag")
      val sorted = li(flag)
      val n = sorted.length
      val k = r.getAs[Long]("k_used").toDouble
      for ((p, col) <- Seq(0.5 -> "est_p50", 0.9 -> "est_p90")) {
        val est = r.getAs[Long](col)
        val rank = sorted.count(_ <= est).toDouble / n
        val tol = 3 * math.sqrt(p * (1 - p) / k) + 1.0 / k
        assert(math.abs(rank - p) <= tol,
          s"$flag $col: sample quantile at rank $rank vs $p (tol $tol)")
      }
    }
  }

  test("dd_bloom: no false negatives, verdicts partition the probe batch") {
    val out = SparkEntry.queries("dd_bloom")(spark, sf).collect()
    spark.catalog.clearCache()
    val probes = graft.Tables.t(spark, sf, "documents")
      .filter($"doc_id" % 10 === 0).count()
    assert(out.length.toLong === probes, "one verdict per probe doc")
    for (r <- out) {
      val (hit, dup) = (r.getAs[Boolean]("bloom_hit"), r.getAs[Boolean]("exact_dup"))
      // the bloom law: membership implies a hit — a miss PROVES novelty
      assert(!dup || hit, s"false negative at doc ${r.getAs[Long]("doc_id")}")
      val expected =
        if (dup) "true_dup" else if (hit) "false_pos" else "clean"
      assert(r.getAs[String]("verdict") === expected)
    }
  }

  test("ev_rfm conserves event and purchase mass, codes stay in-domain") {
    val out = SparkEntry.queries("ev_rfm")(spark, sf).collect()
    spark.catalog.clearCache()
    val ev = graft.Tables.events(spark, sf)
    assert(out.map(_.getAs[Long]("frequency")).sum === ev.count(),
      "per-user frequencies must partition the event count")
    val purchases = ev.filter($"event_type" === "purchase")
      .agg(sum($"value")).as[Double].collect().head
    assert(math.abs(out.map(_.getAs[Double]("monetary")).sum - purchases) < 1e-6,
      "monetary mass must equal total purchase value")
    assert(out.map(_.getAs[Long]("rfm_code")).forall(c => c >= 111L && c <= 444L))
    val segs = Set("champion", "promising", "at_risk", "hibernating")
    assert(out.map(_.getAs[String]("segment")).forall(segs.contains))
  }

  test("dd_bloom fires true_dup on a corpus whose dups straddle the batch boundary") {
    // the driver fixture's duplicate groups never cross the %10 split,
    // so the membership path needs its own corpus: ids 10,20 duplicate
    // corpus docs 1,2 (whitespace/case variants — the normalizer must
    // erase them); 30 is novel.
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"), (3L, "eta theta iota"),
      (10L, "  Alpha   beta GAMMA "), (20L, "delta  epsilon zeta"),
      (30L, "totally novel text never seen")).toDF("doc_id", "text")
    val out = DedupQueries.bloomScreen(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(out(10L) === "true_dup")
    assert(out(20L) === "true_dup")
    assert(out(30L) !== "true_dup") // clean, or an honest false_pos
  }
}
