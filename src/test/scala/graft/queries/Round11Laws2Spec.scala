package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Property laws for the round-11 session-2 additions — conservation
  * against the raw tables, monotonicity of swept curves, and the hard
  * ceilings (ppm ≤ 10⁶, entropy ≤ its ln ceiling) that make the
  * oracle-checked values meaningful.
  */
class Round11Laws2Spec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = {
    val rows = SparkEntry.queries(name)(spark, sf).collect()
    spark.catalog.clearCache()
    rows
  }

  test("ev_weekend_lift: weekend+weekday counts conserve the stream; lift is the exact cross-multiplied floor") {
    val rows = run("ev_weekend_lift")
    val totals = Tables.events(spark, sf).groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, we, wd) = (r.getString(0), r.getAs[Long]("n_weekend"), r.getAs[Long]("n_weekday"))
      assert(we + wd === totals(t), s"$t: $we + $wd != ${totals(t)}")
      if (wd > 0)
        assert(r.getAs[Long]("lift_ppm") === (we * 5000000L) / (wd * 2L))
    }
  }

  test("rd_retention_curve expired mass is monotone in the cutoff; rd_seek_cost touched mass is monotone in the tolerance") {
    val ret = run("rd_retention_curve").sortBy(_.getAs[Long]("q"))
    val exp = ret.map(_.getAs[Long]("n_msgs_expired"))
    assert(exp.zip(exp.tail).forall { case (a, b) => a <= b }, "reclaim not monotone in cutoff")
    ret.foreach(r => assert(r.getAs[Long]("n_msgs_expired") <= r.getAs[Long]("n_messages")))
    val seek = run("rd_seek_cost").sortBy(_.getAs[Long]("tol_ms"))
    val tch = seek.map(_.getAs[Long]("n_msgs_touched"))
    assert(tch.zip(tch.tail).forall { case (a, b) => a <= b }, "seek cost not monotone in tolerance")
    assert(tch.head > 0, "1h tolerance touched nothing — probe point off the topic")
    seek.foreach(r => assert(r.getAs[Long]("n_msgs_touched") <= r.getAs[Long]("n_messages")))
  }

  test("q74/q75: returned cents and brand revenue conserve the lineitem totals; shares obey the floor-sum law") {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val li = Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag",
        ($"l_extendedprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("p_cents"),
        expr("CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)").as("pct"))
      .agg(sum(when($"l_returnflag" === "R", $"p_cents").otherwise(0L).cast(dec)).as("ret"),
        sum(($"p_cents" * (lit(100L) - $"pct")).cast(dec)).as("rev"))
      .collect().head
    val q74 = run("q74_returns_by_month")
    assert(q74.map(_.getAs[Long]("ret_cents")).sum === li.getDecimal(0).longValueExact())
    q74.foreach(r => assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_lines")))
    val q75 = run("q75_brand_share")
    assert(q75.map(_.getAs[Long]("rev_cp")).sum === li.getDecimal(1).longValueExact())
    val shares = q75.map(_.getAs[Long]("share_ppm"))
    assert(shares.sum <= 1000000L && shares.sum >= 1000000L - q75.length,
      s"floor shares must sum into (1e6 - n, 1e6]: ${shares.sum}")
  }

  test("txt_burstiness: tf >= df >= 1 so burstiness floors at 1000 milli") {
    val rows = run("txt_burstiness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, df, b) = (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("burst_milli"))
      assert(df >= 1 && tf >= df)
      assert(b >= 1000L && b === (tf * 1000L) / df)
    }
  }

  test("emb_pq_code_balance: every subspace encodes the whole corpus; entropy respects the ln 16 ceiling") {
    val rows = run("emb_pq_code_balance")
    assert(rows.length === 8)
    val nv = rows.map(_.getAs[Long]("n_vecs")).distinct
    assert(nv.length === 1, "subspaces disagree on the encoded corpus size")
    val ln16 = graft.functions.FixedLnOps.lnMicro(16)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_used") >= 1 && r.getAs[Long]("n_used") <= 16)
      assert(r.getAs[Long]("entropy_micro") >= 0 && r.getAs[Long]("entropy_micro") <= ln16)
      assert(r.getAs[Long]("balance_ppm") <= 1000000L)
      assert(r.getAs[Long]("top_share_ppm") >= 1000000L / 16)
    }
  }

  test("mm_band_stats: all four bands sign the same asset set; pair mass dominates the max bucket's own pairs") {
    val rows = run("mm_band_stats")
    assert(rows.length === 4)
    val n = rows.map(_.getAs[Long]("n_assets")).distinct
    assert(n.length === 1, "bands disagree on the signed asset count")
    rows.foreach { r =>
      val (mx, pairs) = (r.getAs[Long]("max_bucket"), r.getAs[Long]("cand_pairs"))
      assert(pairs >= mx * (mx - 1) / 2)
    }
  }

  test("dd_keep_quality: agreement bounded by clusters, sacrifice non-negative, perfect agreement means zero loss") {
    val r = run("dd_keep_quality").head
    val (nc, na) = (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_agree"))
    assert(na <= nc && nc > 0)
    assert(r.getAs[Long]("mean_loss_ppm") >= 0)
    if (na == nc) assert(r.getAs[Long]("mean_loss_ppm") === 0L)
    assert(r.getAs[Long]("agree_ppm") === na * 1000000L / nc)
  }

  test("ev_stickiness and ev_activity_bands conserve users and respect their ceilings") {
    val st = run("ev_stickiness")
    assert(st.nonEmpty)
    st.foreach { r =>
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
      assert(r.getAs[Long]("max_dau") <= r.getAs[Long]("wau"))
      assert(r.getAs[Long]("mean_dau_milli") <= r.getAs[Long]("wau") * 1000L)
    }
    val bands = run("ev_activity_bands")
    val ev = Tables.events(spark, sf)
    val users = ev.select($"user_id").distinct().count()
    val events = ev.count()
    assert(bands.map(_.getAs[Long]("n_users")).sum === users)
    assert(bands.map(_.getAs[Long]("n_events")).sum === events)
  }

  test("ev_first_touch covers every user once; ev_activation_lag covers exactly the 5+-event users") {
    val ft = run("ev_first_touch")
    val ev = Tables.events(spark, sf)
    val users = ev.select($"user_id").distinct().count()
    assert(ft.map(_.getAs[Long]("n_users")).sum === users)
    ft.foreach(r => assert(r.getAs[Long]("n_purchasers") <= r.getAs[Long]("n_users")))
    val lag = run("ev_activation_lag")
    val activated = ev.groupBy($"user_id").count().filter($"count" >= 5).count()
    assert(lag.map(_.getAs[Long]("n_users")).sum === activated)
    lag.foreach(r => assert(r.getAs[Long]("min_lag_s") <= r.getAs[Long]("max_lag_s")))
  }

  test("grids conserve the corpus: txt_lang_grid, txt_quality_by_len, samp_quality_grid, mm_aspect_buckets") {
    val docs = Tables.t(spark, sf, "documents").count()
    assert(run("txt_lang_grid").map(_.getAs[Long]("n_docs")).sum === docs)
    assert(run("txt_quality_by_len").map(_.getAs[Long]("n_docs")).sum === docs)
    assert(run("samp_quality_grid").map(_.getAs[Long]("n_docs")).sum === docs)
    val mm = run("mm_aspect_buckets")
    assert(mm.map(_.getAs[Long]("n_assets")).sum === 500L)
    mm.foreach(r => assert(r.getAs[Long]("min_ar_milli") <= r.getAs[Long]("max_ar_milli")))
  }

  test("rd_dup_check is clean on the healthy topic; rd_group_entropy respects its ceilings") {
    val dup = run("rd_dup_check").head
    assert(dup.getAs[Long]("dup_ppm") === 0L, "the synthetic topic must have unique positions")
    assert(dup.getAs[Long]("n_positions") === dup.getAs[Long]("n_messages"))
    val ent = run("rd_group_entropy").head
    val lnG = graft.functions.FixedLnOps.lnMicro(ent.getAs[Long]("n_groups"))
    assert(ent.getAs[Long]("entropy_micro") >= 0 && ent.getAs[Long]("entropy_micro") <= lnG)
    assert(ent.getAs[Long]("balance_ppm") >= 0 && ent.getAs[Long]("balance_ppm") <= 1000000L)
    assert(ent.getAs[Long]("max_group") <= ent.getAs[Long]("n_messages"))
  }

  test("q76/q77/q78: late lines bounded, customer ledger partitions, seasonal index floor-averages to par") {
    val q76 = run("q76_late_ratio")
    q76.foreach(r => assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_lines")))
    val q77 = run("q77_one_timers")
    val custs = Tables.t(spark, sf, "customer").count()
    assert(q77.map(_.getAs[Long]("n_customers")).sum === custs)
    q77.foreach(r => assert(
      r.getAs[Long]("n_one_time") + r.getAs[Long]("n_never") <= r.getAs[Long]("n_customers")))
    val q78 = run("q78_seasonal_index")
    assert(q78.length === 12)
    // the month-weighted index floor-averages to ≤ par and within one
    // floor step per month of it
    val m = q78.map(_.getAs[Long]("n_months")).sum
    val wsum = q78.map(r => r.getAs[Long]("index_ppm") * r.getAs[Long]("n_months")).sum
    assert(wsum <= 1000000L * m && wsum > 1000000L * m - 1000000L,
      s"weighted seasonal index ${wsum / m} not at par")
  }

  test("emb_centroid_drift: halves partition every label and the drift cosine is a valid ppm") {
    val rows = run("emb_centroid_drift")
    val perLabel = Tables.t(spark, sf, "embeddings")
      .groupBy($"label".cast("long").as("l")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === perLabel.size)
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      assert(r.getAs[Long]("n_even") + r.getAs[Long]("n_odd") === perLabel(l))
      assert(r.getAs[Long]("cos_ppm") <= 1000000L)
    }
  }

  test("dd_cross_lang pairs are canonical and the flag matches the labels") {
    val rows = run("dd_cross_lang")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      assert(lo <= hi, s"pair ($lo, $hi) not canonicalized")
      assert(r.getAs[Long]("is_cross") === (if (lo == hi) 0L else 1L))
      assert(r.getAs[Long]("n_pairs") >= 1L)
    }
  }
}
