package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Property laws for the round-11 session-3 additions: cross-operator
  * identities (the channel family shares one user partition; the width
  * curve's 12-perm point IS dd_minhash_est; bpe_gain re-partitions
  * bpe_encode), brute-force recomputes of the closed forms (OLS slope,
  * 5-minute peak), and conservation against the raw tables.
  */
class Round11Laws3Spec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = {
    val rows = SparkEntry.queries(name)(spark, sf).collect()
    spark.catalog.clearCache()
    rows
  }

  test("q79/q75 agree on the discounted revenue total; the trade matrix shares floor-sum to par") {
    val q79 = run("q79_trade_matrix")
    val q75 = run("q75_brand_share")
    assert(q79.map(_.getAs[Long]("rev_cp")).sum === q75.map(_.getAs[Long]("rev_cp")).sum,
      "trade matrix and brand share disagree on world revenue")
    val shares = q79.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - q79.length)
  }

  test("q80_spend_bands partitions the buyers and conserves the order book") {
    val rows = run("q80_spend_bands")
    val buyers = Tables.t(spark, sf, "orders").select($"o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === buyers)
    val total = Tables.t(spark, sf, "orders")
      .agg(sum(($"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .collect().head.getDecimal(0).longValueExact()
    assert(rows.map(_.getAs[Long]("total_cents")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
      assert(java.lang.Long.toBinaryString(r.getAs[Long]("min_cents")).length - 1
        === r.getAs[Long]("band").toInt, "band does not match its own min")
    }
  }

  test("q81_qty_discount equals a BigInt OLS recompute from the raw columns") {
    val got = run("q81_qty_discount").head
    val xs = Tables.t(spark, sf, "lineitem")
      .select(expr("CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)"),
        expr("CAST(l_quantity AS BIGINT)"))
      .as[(Long, Long)].collect()
    val n = BigInt(xs.length)
    val sx = xs.map(t => BigInt(t._1)).sum
    val sy = xs.map(t => BigInt(t._2)).sum
    val sxy = xs.map(t => BigInt(t._1) * t._2).sum
    val sxx = xs.map(t => BigInt(t._1) * t._1).sum
    val num = (n * sxy - sx * sy) * 1000
    val den = n * sxx - sx * sx
    val want = if (den == 0) BigInt(0) else (num - num.mod(den)) / den
    assert(got.getAs[Long]("n_lines") === xs.length.toLong)
    assert(BigInt(got.getAs[Long]("slope_milli")) === want, "OLS slope diverged from BigInt truth")
  }

  test("ev_peak_rate equals a driver-side sliding scan over the per-minute counts") {
    val got = run("ev_peak_rate")
      .map(r => r.getString(0) -> (r.getAs[Long]("peak_minute"), r.getAs[Long]("peak_5m"))).toMap
    val perMin = Tables.events(spark, sf)
      .groupBy($"event_type", expr("unix_micros(ts) div 60000000").as("m"))
      .count().as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    perMin.foreach { case (t, mins) =>
      val best = mins.keys.toSeq.sorted.map { m =>
        m -> (0L to 4L).map(d => mins.getOrElse(m - d, 0L)).sum
      }.maxBy { case (m, s) => (s, -m) }
      assert(got(t) === best, s"type $t: stream peak ${got(t)} vs scan $best")
    }
    assert(got.keySet == perMin.keySet)
  }

  test("the channel family shares one user partition: first_touch, retention and value agree per channel") {
    val ft = run("ev_first_touch").map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val cr = run("ev_channel_retention")
      .map(r => (r.getString(0), r.getAs[Long]("n_users"), r.getAs[Long]("n_retained")))
    val cv = run("ev_channel_value")
      .map(r => (r.getString(0), r.getAs[Long]("n_users"), r.getAs[Long]("value_micro")))
    assert(cr.map(t => t._1 -> t._2).toMap === ft, "retention user partition drifted")
    assert(cv.map(t => t._1 -> t._2).toMap === ft, "value user partition drifted")
    cr.foreach { case (t, u, ret) => assert(ret <= u, s"$t retained > users") }
    // channel value totals conserve the purchase book
    val totalValue = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(28, 6))))
      .collect().head.getDecimal(0)
    assert(cv.map(_._3).sum === totalValue.multiply(new java.math.BigDecimal(1000000))
      .longValueExact(), "channel values do not conserve the purchase book")
  }

  test("dd_minhash_width: the 12-perm point IS dd_minhash_est's floored mean; pair counts match across widths") {
    val width = run("dd_minhash_width")
    val est = run("dd_minhash_est")
    val ns = width.map(_.getAs[Long]("n_pairs")).distinct
    assert(ns.length === 1 && ns.head === est.length.toLong)
    val w12 = width.find(_.getAs[Long]("width") == 12L).get
    val errs = est.map(_.getAs[Long]("err_ppm"))
    assert(w12.getAs[Long]("mean_err_ppm") === errs.sum / errs.length)
    assert(w12.getAs[Long]("max_err_ppm") === errs.max)
  }

  test("mm_shard_fill conserves mm_shard_pack's plan") {
    val fill = run("mm_shard_fill")
      .map(r => r.getString(0) -> (r.getAs[Long]("n_shards"), r.getAs[Long]("total_bytes"))).toMap
    val pack = run("mm_shard_pack")
      .map(r => (r.getString(0), r.getAs[Long]("shard"), r.getAs[Long]("n_bytes")))
    val want = pack.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).distinct.size.toLong, rs.map(_._3).sum)).toMap
    assert(fill === want)
  }

  test("samp_temp_sweep: tau=1 is the exact doc mixture and weights are monotone in corpus size at every tau") {
    val rows = run("samp_temp_sweep")
      .map(r => (r.getAs[Long]("tau_milli"), r.getString(1),
        r.getAs[Long]("n_docs"), r.getAs[Long]("w")))
    val full = rows.filter(_._1 == 1000L)
    full.foreach { case (_, _, n, w) => assert(w === n * 1000L) }
    rows.groupBy(_._1).foreach { case (tau, rs) =>
      val byN = rs.sortBy(_._3)
      byN.zip(byN.drop(1)).foreach { case (a, b) =>
        assert(a._4 <= b._4, s"tau=$tau weights not monotone in n")
      }
    }
  }

  test("txt_len_topshare: the top decile's mean length dominates the corpus mean (exact cross-multiplication)") {
    run("txt_len_topshare").foreach { r =>
      val (nd, nt, top) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("top_tokens"))
      val k = math.max(1L, nd / 10)
      assert(top * nd >= nt * k,
        s"${r.getString(0)}: top-$k docs carry less than their share")
      assert(top <= nt)
    }
  }

  test("txt_head_mass: nested heads, exact type counts, txt_bpe_gain re-partitions txt_bpe_encode") {
    val hm = run("txt_head_mass").sortBy(_.getAs[Long]("k"))
    val heads = hm.map(_.getAs[Long]("head_tokens"))
    assert(heads.zip(heads.tail).forall { case (a, b) => a <= b }, "head mass not monotone in k")
    hm.foreach { r =>
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("k"))
      assert(r.getAs[Long]("head_share_ppm") <= 1000000L)
    }
    val gain = run("txt_bpe_gain")
    val enc = run("txt_bpe_encode")
    assert(gain.map(_.getAs[Long]("n_subtok")).sum === enc.map(_.getAs[Long]("n_subtok")).sum,
      "source rollup and doc rollup disagree on total BPE symbols")
    assert(gain.map(_.getAs[Long]("n_chars")).sum === enc.map(_.getAs[Long]("n_chars")).sum)
  }

  test("q83_nation_arpu partitions the customer base and conserves the order book") {
    val rows = run("q83_nation_arpu")
    val custs = Tables.t(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === custs)
    rows.foreach(r => assert(r.getAs[Long]("n_buyers") <= r.getAs[Long]("n_customers")))
    val total = Tables.t(spark, sf, "orders")
      .agg(sum(($"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .collect().head.getDecimal(0).longValueExact()
    assert(rows.map(_.getAs[Long]("rev_cents")).sum === total)
  }

  test("rd_ulid_sanity is clean on the healthy topic; emb_label_balance conserves the corpus") {
    val sanity = run("rd_ulid_sanity").head
    assert(sanity.getAs[Long]("n_out_of_window") === 0L)
    assert(sanity.getAs[Long]("worst_skew_ms") === 0L)
    assert(sanity.getAs[Long]("n_messages") > 0L)
    val bal = run("emb_label_balance").head
    val vecs = Tables.t(spark, sf, "embeddings").count()
    assert(bal.getAs[Long]("n_vecs") === vecs)
    assert(bal.getAs[Long]("max_label") * bal.getAs[Long]("n_labels") >= vecs,
      "max label below the pigeonhole floor")
    assert(bal.getAs[Long]("balance_ppm") <= 1000000L)
    // error-rate conservation rides along: daily errors sum to the type count
    val er = run("ev_error_rate")
    val errors = Tables.events(spark, sf).filter($"event_type" === "error").count()
    assert(er.map(_.getAs[Long]("n_errors")).sum === errors)
    // share-skew sums to zero by construction up to floor slack
    val sk = run("samp_share_skew").map(_.getAs[Long]("skew_ppm"))
    assert(math.abs(sk.sum) <= sk.length.toLong, "signed skews do not cancel within floor slack")
  }
}
