package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the distribution-audit batch (Lorenz / Benford / Heaps /
  * separability-AUC / triplet margins / one-permutation minhash):
  * conservation identities against independently-computed totals on the
  * real sf corpus, plus constructed extremes (identical docs, separated
  * clusters) where the exact answer is forced.
  */
class DistributionAuditSpec extends SparkSpec {
  import spark.implicits._

  // ---- ev_lorenz ------------------------------------------------------

  private lazy val lorenz =
    EventQueries.queries("ev_lorenz")(spark, sf).collect()

  test("ev_lorenz: decile populations and event mass conserve the stream totals") {
    val ev = graft.Tables.events(spark, sf)
    val users = ev.select($"user_id").distinct().count()
    val events = ev.count()
    assert(lorenz.map(_.getAs[Long]("n_users")).sum === users)
    assert(lorenz.map(_.getAs[Long]("n_events")).sum === events)
    assert(lorenz.last.getAs[Long]("cum_events") === events)
  }

  test("ev_lorenz: the curve is monotone and closes at exactly 10^6 ppm") {
    val shares = lorenz.map(_.getAs[Long]("cum_share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last === 1000000L)
    // convexity of the Lorenz curve: deciles are ordered by per-user
    // activity, so mean events/user per decile never decreases
    // (cross-multiplied — no float division)
    val means = lorenz.map(r =>
      (r.getAs[Long]("n_events"), r.getAs[Long]("n_users")))
    assert(means.zip(means.tail).forall { case ((e1, u1), (e2, u2)) =>
      e1 * u2 <= e2 * u1 })
  }

  // ---- ev_benford -----------------------------------------------------

  test("ev_benford: digit counts conserve the per-type positive-cents total; reference shares sum to exactly 10^6") {
    val rows = EventQueries.queries("ev_benford")(spark, sf).collect()
    assert(rows.forall(r => (1L to 9L).contains(r.getAs[Long]("digit"))))
    val expByDigit = rows.map(r =>
      r.getAs[Long]("digit") -> r.getAs[Long]("exp_ppm")).toMap
    assert(expByDigit.values.sum === 1000000L)
    val perType = rows.groupBy(_.getAs[String]("event_type"))
    val direct = graft.Tables.events(spark, sf)
      .select($"event_type", expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").as("c"))
      .filter($"c" > 0).groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, rs) <- perType) {
      assert(rs.map(_.getAs[Long]("n")).sum === direct(t))
      // floor rounding loses < 1 ppm per digit
      val obsSum = rs.map(_.getAs[Long]("obs_ppm")).sum
      assert(obsSum > 1000000L - 9 && obsSum <= 1000000L)
    }
  }

  // ---- txt_heaps ------------------------------------------------------

  test("txt_heaps: the curve closes on the exact corpus totals and is monotone") {
    val rows = TextQueries.queries("txt_heaps")(spark, sf).collect()
    assert(rows.length === 10)
    val docs = graft.Tables.t(spark, sf, "documents")
    assert(rows.last.getAs[Long]("n_docs") === docs.count())
    val totTok = docs.select(sum(size(split($"text", " +")).cast("long")))
      .head().getLong(0)
    assert(rows.last.getAs[Long]("cum_tokens") === totTok)
    val vocab = docs.select(explode(split($"text", " +")).as("w"))
      .filter(length($"w") > 0).select($"w").distinct().count()
    assert(rows.last.getAs[Long]("vocab") === vocab)
    assert(rows.map(_.getAs[Long]("new_types")).sum === vocab)
    Seq("n_docs", "cum_tokens", "vocab").foreach { c =>
      val xs = rows.map(_.getAs[Long](c))
      assert(xs.zip(xs.tail).forall { case (a, b) => a <= b }, c)
    }
  }

  // ---- emb_ood_auc ----------------------------------------------------

  test("emb_ood_auc: one row per label, pos+neg conserves the scored corpus, AUC in [0, 10^6]") {
    val rows = AnnQueries.queries("emb_ood_auc")(spark, sf).collect()
    val labels = graft.Tables.t(spark, sf, "embeddings")
      .select($"label").distinct().count()
    assert(rows.length === labels)
    val scored = graft.operators.VectorOps.quantized(spark, sf)
      .filter($"nn" > 0).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") === scored)
      val auc = r.getAs[Long]("auc_ppm")
      assert(auc >= 0L && auc <= 1000000L)
    }
  }

  test("emb_ood_auc: two orthogonal clusters separate perfectly (AUC exactly 10^6)") {
    val dir = graft.rawdata.Topic.tempDir("audit-emb-sep")
    val vecs = (0L until 6L).map { i =>
      val e = Array.fill(64)(0.0f)
      if (i < 3) e(0) = 1.0f else e(1) = 1.0f
      (i, e.toSeq, if (i < 3) 0 else 1)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = AnnQueries.queries("emb_ood_auc")(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getAs[Long]("auc_ppm") === 1000000L))
  }

  // ---- emb_triplet ----------------------------------------------------

  test("emb_triplet: margin bounds are ordered and semi-hard count is bounded by anchors") {
    val rows = AnnQueries.queries("emb_triplet")(spark, sf).collect()
    rows.foreach { r =>
      val (lo, mean, hi) = (r.getAs[Long]("min_margin_ppm"),
        r.getAs[Long]("mean_margin_ppm"), r.getAs[Long]("max_margin_ppm"))
      assert(lo <= mean && mean <= hi)
      assert(r.getAs[Long]("n_semi_hard") <= r.getAs[Long]("n_anchors"))
      assert(r.getAs[Long]("n_anchors") > 0L)
    }
  }

  // ---- dd_oph ---------------------------------------------------------

  private lazy val oph = DedupQueries.queries("dd_oph")(spark, sf).collect()

  test("dd_oph: slot agreement stays in [0, 16] and the ppm estimate is its exact floor division") {
    assert(oph.nonEmpty)
    oph.foreach { r =>
      val agree = r.getAs[Long]("n_agree")
      assert(agree >= 0L && agree <= 16L)
      assert(r.getAs[Long]("est_ppm") === (agree * 1000000L) / 16L)
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(r.getAs[Long]("est_ppm") - r.getAs[Long]("jaccard_ppm")))
    }
  }

  test("dd_oph: identical shingle sets agree on every densified slot (est exactly 10^6)") {
    // constructed exact duplicates: identical texts band identically, so
    // the candidate pair is guaranteed; OPH signatures are a pure
    // function of the shingle set, so all 16 densified slots agree
    val dir = graft.rawdata.Topic.tempDir("audit-oph-dup")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "en", "web"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "en", "web"),
      (3L, "entirely different vocabulary with no shared shingle content", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dup = DedupQueries.queries("dd_oph")(spark, dir).collect()
      .filter(r => r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("jaccard_ppm") === 1000000L)
    assert(dup.head.getAs[Long]("n_agree") === 16L)
    assert(dup.head.getAs[Long]("est_ppm") === 1000000L)
    assert(dup.head.getAs[Long]("err_ppm") === 0L)
  }

  // ---- samp_kfold -----------------------------------------------------

  test("samp_kfold: folds are disjoint-and-exhaustive (masses conserve the corpus) and shares close to 10^6") {
    val rows = SamplingQueries.queries("samp_kfold")(spark, sf).collect()
    assert(rows.forall(r => (0L until 5L).contains(r.getAs[Long]("fold"))))
    val direct = graft.Tables.t(spark, sf, "documents")
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, rs) <- rows.groupBy(_.getAs[String]("source"))) {
      assert(rs.map(_.getAs[Long]("n_docs")).sum === direct(src))
      val shares = rs.map(_.getAs[Long]("doc_share_ppm")).sum
      assert(shares > 1000000L - 5 && shares <= 1000000L)
    }
  }

  // ---- emb_norm_hist --------------------------------------------------

  test("emb_norm_hist: buckets partition the corpus and bound their own norms") {
    val rows = CurationQueries.queries("emb_norm_hist")(spark, sf).collect()
    val vecs = graft.Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === vecs)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("bucket"),
        r.getAs[Long]("min_norm_micro"), r.getAs[Long]("max_norm_micro"))
      assert(lo <= hi)
      assert(lo / 100000L === b && hi / 100000L === b)
    }
  }

  // ---- ev_volatility --------------------------------------------------

  test("ev_volatility: spikes are inside the total variation and the mean is its floor") {
    val rows = EventQueries.queries("ev_volatility")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getAs[Long]("total_variation")
      val n = r.getAs[Long]("n_steps")
      assert(math.abs(r.getAs[Long]("max_up")) <= tv)
      assert(math.abs(r.getAs[Long]("max_down")) <= tv)
      assert(r.getAs[Long]("mean_abs_change") === tv / n)
      assert(r.getAs[Long]("max_up") >= r.getAs[Long]("max_down"))
    }
  }

  // ---- txt_char_classes -----------------------------------------------

  test("txt_char_classes: class counts partition the exact character mass") {
    val rows = TextQueries.queries("txt_char_classes")(spark, sf).collect()
    val direct = graft.Tables.t(spark, sf, "documents")
      .groupBy($"lang").agg(sum(length($"text").cast("long")).as("nc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet === direct.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chars") === direct(r.getAs[String]("lang")))
      assert(r.getAs[Long]("n_alpha") + r.getAs[Long]("n_digit") +
        r.getAs[Long]("n_space") + r.getAs[Long]("n_other") ===
        r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("alpha_ppm") + r.getAs[Long]("digit_ppm") +
        r.getAs[Long]("space_ppm") <= 1000000L)
    }
  }

  // ---- dd_band_stats --------------------------------------------------

  test("dd_band_stats: every band covers the same signed corpus; pair mass bounds its own max bucket") {
    val rows = DedupQueries.queries("dd_band_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    // each doc with >= 1 shingle contributes exactly one bucket entry
    // per band, so n_docs is identical across bands
    assert(rows.map(_.getAs[Long]("n_docs")).distinct.length === 1)
    rows.foreach { r =>
      val m = r.getAs[Long]("max_bucket")
      assert(m <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("cand_pairs") >= m * (m - 1) / 2)
      assert(r.getAs[Long]("n_buckets") <= r.getAs[Long]("n_docs"))
    }
  }

  // ---- ann_cell_stats -------------------------------------------------

  test("ann_cell_stats: posting lists partition the indexed corpus and shares close to 10^6") {
    val rows = AnnQueries.queries("ann_cell_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vecs = graft.Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === vecs)
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }
}
