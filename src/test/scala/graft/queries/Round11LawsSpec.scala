package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Cross-operator laws for the round-11 additions — each query is
  * oracle-checked value-for-value by the driver; these pin the
  * PROPERTIES that make the values meaningful (funnel monotonicity,
  * closed-form identities vs brute force, completeness).
  */
class Round11LawsSpec extends SparkSpec {
  import spark.implicits._

  test("emb_dispersion equals the brute-force all-pairs mean exactly") {
    val got = SparkEntry.queries("emb_dispersion")(spark, sf).collect().head
    spark.catalog.clearCache()
    val qs = Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray
        .map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong))
    val n = qs.length
    // brute force over all ordered pairs in BigInt — the O(n²) truth the
    // operator's moment identity replaces
    var s = BigInt(0)
    for (i <- qs.indices; j <- qs.indices if i != j) {
      var d2 = BigInt(0)
      for (k <- qs(i).indices) {
        val dd = qs(i)(k) - qs(j)(k)
        d2 += BigInt(dd) * dd
      }
      s += d2
    }
    val want = s / (BigInt(n) * (n - 1))
    assert(got.getAs[Long]("n_vecs") === n.toLong)
    assert(BigInt(got.getAs[Long]("msd_q")) === want,
      "moment-identity dispersion diverged from brute force")
  }

  test("ann_probe_cost: per-query cost is monotone in nprobe and caps at the corpus") {
    val rows = SparkEntry.queries("ann_probe_cost")(spark, sf).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("qid"),
        r.getAs[Long]("n_cells"), r.getAs[Long]("n_scanned"), r.getAs[Long]("scan_ppm")))
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { case (np, _, nc, _, ppm) =>
      assert(nc === np, s"a query probed $nc cells at nprobe=$np")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    rows.groupBy(_._2).foreach { case (qid, qrows) =>
      val byNp = qrows.sortBy(_._1).map(_._4)
      assert(byNp.zip(byNp.tail).forall { case (a, b) => a <= b },
        s"query $qid: scanned rows not monotone in nprobe")
    }
  }

  test("pipe_from_topic: the manifest is a monotone funnel and admission respects the straddle rule") {
    val rows = SparkEntry.queries("pipe_from_topic")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (msgs, dist, qual, alloc, adm, admTok) =
        (r.getAs[Long]("n_msgs"), r.getAs[Long]("n_distinct"), r.getAs[Long]("n_quality"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Long]("n_admitted"),
          r.getAs[Long]("n_tokens_admitted"))
      assert(adm <= qual && qual <= dist && dist <= msgs,
        s"funnel not monotone: $msgs -> $dist -> $qual -> $adm")
      // straddle rule: the last admitted doc may overshoot, but its
      // START offset was under the allocation — with 2-token payloads
      // the overshoot is bounded by one payload
      assert(admTok < alloc + 2L || adm == 0,
        s"admitted tokens $admTok overshoot allocation $alloc by a full doc")
    }
    // the dedup stage is REAL on this topic (producers re-send props)
    assert(rows.exists(r => r.getAs[Long]("n_distinct") < r.getAs[Long]("n_msgs")),
      "no source deduplicated anything — fixture too weak")
  }

  test("txt_bpe_vocab: contiguous ids, chars then merges, merge count == txt_bpe") {
    val vocab = SparkEntry.queries("txt_bpe_vocab")(spark, sf).collect()
    val merges = SparkEntry.queries("txt_bpe")(spark, sf).count()
    spark.catalog.clearCache()
    val ids = vocab.map(_.getAs[Long]("id")).sorted
    assert(ids.toSeq === (0L until vocab.length.toLong))
    val (chars, ms) = vocab.partition(_.getAs[String]("kind") == "char")
    assert(chars.forall(_.getAs[String]("token").length == 1))
    assert(ms.length.toLong === merges, "vocab merge rows != learned merges")
    assert(chars.map(_.getAs[Long]("id")).max < ms.map(_.getAs[Long]("id")).min,
      "char ids must precede merge ids")
    // every merge token is reachable from the alphabet (its chars are in it)
    val alphabet = chars.map(_.getAs[String]("token").charAt(0)).toSet
    assert(ms.forall(_.getAs[String]("token").forall(alphabet)))
  }

  test("txt_bpe_saturation reconciles with the corpus token mass") {
    val sat = SparkEntry.queries("txt_bpe_saturation")(spark, sf).collect()
    spark.catalog.clearCache()
    val nTok = Tables.t(spark, sf, "documents")
      .select(explode(split($"text", " +")).as("tok"))
      .filter(length($"tok") > 0).count()
    assert(sat.map(_.getAs[Long]("n_tok")).sum === nTok)
    sat.foreach { r =>
      assert(r.getAs[Long]("n_saturated") <= r.getAs[Long]("n_tok"))
      assert(r.getAs[Long]("sat_ppm") <= 1000000L)
    }
  }

  test("ev_type_cooccur: counts bounded by marginals and complete over observed pairs") {
    val rows = SparkEntry.queries("ev_type_cooccur")(spark, sf).collect()
      .map(r => ((r.getAs[String]("type_a"), r.getAs[String]("type_b")),
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))))
      .toMap
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (nab, na, nb)) =>
      assert(a < b, "pairs must be ordered")
      assert(nab <= math.min(na, nb), s"($a,$b): co-count exceeds a marginal")
    }
    // completeness: recompute the observed pair set independently
    val act = Tables.events(spark, sf)
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"), $"event_type")
      .distinct().as[(Long, Long, String)].collect()
    val want = act.groupBy(e => (e._1, e._2)).values
      .flatMap(g => g.map(_._3).toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    assert(rows.keySet === want, "pair set differs from the independent recompute")
  }

  test("band histograms partition their domains with in-band extremes") {
    // ev_value_bands: every event lands in exactly one band, and the
    // band's extremes sit inside [2^band, 2^(band+1))
    val vb = SparkEntry.queries("ev_value_bands")(spark, sf).collect()
    spark.catalog.clearCache()
    val nEvents = Tables.events(spark, sf).count()
    assert(vb.map(_.getAs[Long]("n")).sum === nEvents)
    vb.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("band"), r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)) && lo <= hi,
        s"band $b extremes [$lo, $hi] out of range")
    }
    // dd_shingle_stats: every document is accounted for
    val sh = SparkEntry.queries("dd_shingle_stats")(spark, sf).collect()
    spark.catalog.clearCache()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(sh.map(_.getAs[Long]("n_docs")).sum === nDocs)
    sh.filter(_.getAs[Long]("band") >= 0).foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("band"), r.getAs[Long]("min_sh"), r.getAs[Long]("max_sh"))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"shingle band $b extremes [$lo, $hi] out of range")
    }
  }

  test("q71_discount_effect: discount bounded by gross, shares sum to ~1e6") {
    val rows = SparkEntry.queries("q71_discount_effect")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("disc_cp") <= 100L * r.getAs[Long]("gross_cents"))
      assert(r.getAs[Long]("disc_cp") === r.getAs[Long]("pct") * r.getAs[Long]("gross_cents"),
        "within a tier, discount must be exactly pct x gross")
    }
    val shares = rows.map(_.getAs[Long]("gross_share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L,
      s"floor shares sum $shares out of range")
  }

  test("rd_quiet gap counts reconcile with per-group message counts") {
    val quiet = SparkEntry.queries("rd_quiet")(spark, sf).collect()
      .map(r => r.getAs[String]("ordering_group") -> r.getAs[Long]("n_gaps")).toMap
    spark.catalog.clearCache()
    val perGroup = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    quiet.foreach { case (g, gaps) =>
      assert(gaps === perGroup(g) - 1, s"group $g: $gaps gaps for ${perGroup(g)} messages")
    }
  }
}
