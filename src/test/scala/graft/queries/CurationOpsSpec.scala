package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the round-5 curation operators — properties the
  * DuckDB oracle's value-equality can't express (cross-query relations,
  * partition/coverage laws).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dd_containment dominates jaccard on every shared pair and respects its threshold") {
    val cont = DedupQueries.queries("dd_containment")(spark, sf)
      .select($"doc_a", $"doc_b", $"containment_ppm", $"n_a", $"n_b").collect()
    assert(cont.nonEmpty, "expected at least one high-containment pair in the corpus")
    assert(cont.forall(_.getAs[Long]("containment_ppm") >= 600000L))
    assert(cont.forall(r => r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0))
    // containment uses min(|A|,|B|) as denominator, jaccard the union:
    // containment ≥ jaccard for the SAME pair, always
    val jac = DedupQueries.queries("dd_jaccard")(spark, sf)
      .select($"doc_a", $"doc_b", $"jaccard_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    cont.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      jac.get(key).foreach { j =>
        assert(r.getAs[Long]("containment_ppm") >= j,
          s"pair $key: containment below jaccard")
      }
    }
  }

  test("samp_shuffle is a permutation: every doc exactly once, per-shard positions contiguous from 1") {
    val out = SamplingQueries.queries("samp_shuffle")(spark, sf)
    val docs = graft.Tables.t(spark, sf, "documents").count()
    assert(out.count() === docs)
    assert(out.select($"doc_id").distinct().count() === docs)
    val bad = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("lo"), max($"pos").as("hi"))
      .filter($"lo" =!= 1L || $"hi" =!= $"n")
    assert(bad.count() === 0L, "positions must be 1..n per shard with no gaps")
  }

  test("samp_upsample: copies differ by at most one within a source and never drop docs at factor ≥ 1") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val perDoc = SamplingQueries.queries("samp_upsample")(spark, sf)
      .groupBy($"source", $"doc_id").agg(max($"copies").as("copies"),
        count(lit(1)).as("n_rows"))
    // explode emitted exactly `copies` rows per doc
    assert(perDoc.filter($"n_rows" =!= $"copies").count() === 0L)
    // within a source, every doc gets either base or base+1 copies
    val spread = perDoc.groupBy($"source")
      .agg((max($"copies") - min($"copies")).as("spread"))
    assert(spread.filter($"spread" > 1L).count() === 0L)
    // sources whose factor is ≥ 1 epoch keep every doc
    val nBySource = docs.groupBy($"source").agg(count(lit(1)).as("n"))
    val kept = perDoc.groupBy($"source").agg(count(lit(1)).as("n_kept"))
    val dropped = nBySource.join(kept, Seq("source"), "left")
      .filter(lit(120000L) >= $"n" * 1000L) // milli ≥ 1000 ⇔ n ≤ target
      .filter(coalesce($"n_kept", lit(0L)) =!= $"n")
    assert(dropped.count() === 0L, "upsampling (factor ≥ 1) must keep every doc")
  }

  test("ev_paths returns a descending top-10 over genuine event trigrams") {
    val rows = EventQueries.queries("ev_paths")(spark, sf).collect()
    assert(rows.length === 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    val types = graft.Tables.events(spark, sf)
      .select($"event_type").distinct().as[String].collect().toSet
    rows.foreach { r =>
      assert(types.contains(r.getAs[String]("step1")))
      assert(types.contains(r.getAs[String]("step2")))
      assert(types.contains(r.getAs[String]("step3")))
    }
  }

  test("emb_rp's relational sign signature equals the native HyperplaneBands expression") {
    val rp = AnnQueries.queries("emb_rp")(spark, sf)
      .select($"vec_id", $"sketch_sig")
    val native = graft.operators.VectorOps
      .withHyperplaneSig(graft.operators.VectorOps.quantized(spark, sf), 16)
      .select($"vec_id", $"sig".as("native_sig"))
    val diff = rp.join(native, Seq("vec_id"))
      .filter($"sketch_sig" =!= $"native_sig")
    assert(diff.count() === 0L,
      "the posexplode+join projection and the codegen'd banding expression must pack identical sign bits")
    assert(rp.count() === native.count())
  }

  test("dd_minhash_est: estimates are perm-quantized, errors bounded by the 12-perm std dev regime") {
    val rows = DedupQueries.queries("dd_minhash_est")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    val validEst = (0 to 12).map(k => (k.toLong * 1000000L) / 12L).toSet
    rows.foreach { r =>
      assert(validEst.contains(r.getAs[Long]("est_ppm")),
        s"est must be a multiple of 1/12: ${r.getAs[Long]("est_ppm")}")
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(r.getAs[Long]("est_ppm") - r.getAs[Long]("jaccard_ppm")))
    }
    // 12 perms ⇒ std ≈ √(J(1−J)/12) ≤ 0.145; the MEAN abs error across
    // candidate pairs must sit well inside one std (estimator unbiased)
    val meanErr = rows.map(_.getAs[Long]("err_ppm")).sum / rows.length
    assert(meanErr < 145000L, s"mean |est − exact| = $meanErr ppm — estimator looks broken")
  }

  test("txt_tfidf ranks each doc's terms by weight with rnk 1..3 and consistent tf/df") {
    val out = TextQueries.queries("txt_tfidf")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq === (1L to byRank.length).toSeq,
        s"doc $doc: ranks must be 1..k")
      val scores = byRank.map(_.getAs[Long]("score_ppm"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"doc $doc: scores must be non-increasing in rank")
    }
    assert(out.forall(r => r.getAs[Long]("tf") >= 1L && r.getAs[Long]("df") >= 1L))
    // df counts docs, so df ≤ total docs and tf ≥ 1 ⇒ score ≥ 1e6/df ≥ 1
    val docs = graft.Tables.t(spark, sf, "documents").count()
    assert(out.forall(_.getAs[Long]("df") <= docs))
  }

  test("txt_chunk tiles every doc: stride-64 chunks partition the tokens, stride-32 chunks cover each token ≤2×") {
    val chunks = CurationQueries.queries("txt_chunk")(spark, sf).collect()
    val nTok = TextQueries.queries("txt_tokens")(spark, sf)
      .select($"doc_id", $"n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      val n = nTok(doc)
      // chunk count = floor((n-1)/32) + 1, starts are 0, 32, 64, ...
      assert(rs.length === ((n - 1) / 32 + 1).toInt, s"doc $doc chunk count")
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      assert(sorted.map(_.getAs[Long]("start_tok")).toSeq ===
        sorted.indices.map(_ * 32L), s"doc $doc starts")
      // even chunks are the non-overlapping 64-token tiling: lengths sum to n
      val evenSum = sorted.filter(_.getAs[Long]("chunk_id") % 2 == 0)
        .map(_.getAs[Long]("n_tok")).sum
      assert(evenSum === n, s"doc $doc: even chunks must tile all $n tokens")
      assert(rs.forall(_.getAs[Long]("n_tok") <= 64L))
    }
  }

  test("dd_segment flags exact-duplicate docs as fully duplicated and never over-counts") {
    val seg = CurationQueries.queries("dd_segment")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(seg.forall { r =>
      r.getAs[Long]("n_dup_segs") <= r.getAs[Long]("n_segs") &&
        r.getAs[Long]("dup_tok") <= r.getAs[Long]("n_tok")
    })
    // a doc whose full text appears in another doc is 100% segment-duplicated
    val dupDocs = TextQueries.queries("txt_fingerprint")(spark, sf)
      .filter($"n_docs" >= 2).collect()
    if (dupDocs.nonEmpty) {
      val fullDup = seg.filter(_.getAs[Long]("dup_ppm") == 1000000L)
      assert(fullDup.nonEmpty,
        "exact-dup fingerprint groups exist but no doc is fully segment-duplicated")
    }
  }

  test("ev_funnel_time reconciles with ev_funnel counts and orders its latency stats") {
    val ft = EventQueries.queries("ev_funnel_time")(spark, sf).collect()
      .map(r => r.getAs[String]("step") -> r).toMap
    spark.catalog.clearCache()
    val f = EventQueries.queries("ev_funnel")(spark, sf).head()
    spark.catalog.clearCache()
    // every converting user contributes exactly one latency row per step
    assert(ft("view>click").getAs[Long]("n_users") === f.getAs[Long]("n_click"))
    assert(ft("click>purchase").getAs[Long]("n_users") === f.getAs[Long]("n_purchase"))
    ft.values.foreach { r =>
      assert(r.getAs[Long]("min_us") >= 0L, "funnel latencies are non-negative")
      assert(r.getAs[Long]("min_us") <= r.getAs[Long]("mean_us") &&
        r.getAs[Long]("mean_us") <= r.getAs[Long]("max_us"))
      assert(r.getAs[Long]("p50_s") <= r.getAs[Long]("p90_s") &&
        r.getAs[Long]("p90_s") <= r.getAs[Long]("max_us") / 1000000L)
      assert(r.getAs[Long]("min_us") / 1000000L <= r.getAs[Long]("p50_s"))
    }
  }

  test("ev_wau: weekly actives bound daily actives on exactly the active days") {
    val out = EventQueries.queries("ev_wau")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"),
        s"day ${r.getAs[Long]("day")}: WAU below DAU")
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
    // exactly the active days appear
    val days = graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 86400000000 AS day").distinct().count()
    assert(out.length.toLong === days)
  }

  test("txt_novelty: the first doc is all-novel and later exact duplicates are zero-novel") {
    val nov = TextQueries.queries("txt_novelty")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    spark.catalog.clearCache()
    assert(nov.values.forall(r => r.getAs[Long]("n_new") <= r.getAs[Long]("n_grams")))
    assert(nov(nov.keys.min).getAs[Long]("novelty_ppm") === 1000000L,
      "the corpus's first doc can only contain first-seen 3-grams")
    // in an exact-duplicate group every doc after the first contributes
    // nothing new
    val laters = graft.Tables.t(spark, sf, "documents")
      .groupBy(md5($"text").as("f"))
      .agg(count(lit(1)).as("n"), min($"doc_id").as("first"), max($"doc_id").as("last"))
      .filter($"n" >= 2)
      .select($"last").as[Long].collect()
      .filter(nov.contains)
    laters.foreach { id =>
      assert(nov(id).getAs[Long]("n_new") === 0L, s"later exact dup $id claims novel 3-grams")
    }
    // novelty is monotone evidence either way: totals must reconcile —
    // every distinct corpus 3-gram is novel in exactly one doc
    val distinctGrams = graft.Tables.t(spark, sf, "documents")
      .select(split($"text", " +").as("tk"))
      .where(expr("size(tk) >= 3"))
      .selectExpr(
        "explode(transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) AS g")
      .distinct().count()
    assert(nov.values.map(_.getAs[Long]("n_new")).sum === distinctGrams,
      "each distinct 3-gram must be counted novel exactly once")
  }

  test("dd_span agrees with dd_segment's duplicated mass and its runs tile that mass") {
    val span = CurationQueries.queries("dd_span")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    spark.catalog.clearCache()
    val seg = CurationQueries.queries("dd_segment")(spark, sf).collect()
    spark.catalog.clearCache()
    // exactly the docs with duplicated segments appear, with the SAME
    // total duplicated token mass — dd_span only restructures it into runs
    val dupDocs = seg.filter(_.getAs[Long]("n_dup_segs") > 0)
    assert(dupDocs.nonEmpty, "corpus has cross-doc duplicated segments")
    assert(span.keySet === dupDocs.map(_.getAs[Long]("doc_id")).toSet)
    dupDocs.foreach { r =>
      val s = span(r.getAs[Long]("doc_id"))
      assert(s.getAs[Long]("dup_tok") === r.getAs[Long]("dup_tok"))
      // runs partition the duplicated segments: counts and bounds agree
      assert(s.getAs[Long]("n_runs") >= 1L &&
        s.getAs[Long]("n_runs") <= r.getAs[Long]("n_dup_segs"))
      assert(s.getAs[Long]("max_run_segs") <= r.getAs[Long]("n_dup_segs"))
      assert(s.getAs[Long]("max_run_tok") <= s.getAs[Long]("dup_tok"))
    }
  }

  test("emb_quantize: int8 rounding error is bounded by scale/2 per dim and ~3937 ppm overall") {
    val out = CurationQueries.queries("emb_quantize")(spark, sf).collect()
    val dims = graft.Tables.t(spark, sf, "embeddings")
      .selectExpr("size(embedding) AS d").head().getInt(0)
    assert(out.forall(_.getAs[Long]("n_dims") == dims.toLong))
    // round-to-nearest ⇒ |127·q − code·scale| ≤ scale/2 (ties round up)
    assert(out.forall(r => 2L * r.getAs[Long]("max_err") <= r.getAs[Long]("scale")),
      "per-dim error exceeds the round-to-nearest bound")
    assert(out.forall(_.getAs[Long]("err_ppm") <= 3938L),
      "mean relative error exceeds the int8 quantization bound 0.5/127")
  }

  test("txt_bpe matches a driver-side batched-BPE reference for every merge") {
    val got = CurationQueries.queries("txt_bpe")(spark, sf).collect()
      .sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[Long]("pair_n")))
    // plain-Scala reference of the BATCHED+LAYERED algorithm — shared
    // with BpeVocabScaleSpec so small- and vocab-scale runs check the
    // identical executable spec (see BpeReference for the rule)
    val toks = graft.Tables.t(spark, sf, "documents")
      .selectExpr("explode(split(text, ' +')) AS tok")
      .filter($"tok" =!= "").collect().map(_.getString(0)).toSeq
    val ref = BpeReference.merges(toks)
    assert(got.toSeq === ref,
      s"BPE merge table diverged from the batched reference: got ${got.toSeq}, want $ref")
  }

  test("txt_bpe_encode compresses: n_tok ≤ n_subtok ≤ n_chars, covers every doc, merges actually fired") {
    val out = CurationQueries.queries("txt_bpe_encode")(spark, sf).collect()
    spark.catalog.clearCache()
    val docs = graft.Tables.t(spark, sf, "documents").count()
    assert(out.length === docs.toInt, "every doc must get an encode row")
    out.foreach { r =>
      val (nTok, nChars, nSub) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_chars"), r.getAs[Long]("n_subtok"))
      assert(nTok <= nSub, s"doc ${r.getLong(0)}: a token is at least one subword")
      assert(nSub <= nChars, s"doc ${r.getLong(0)}: merging can only shrink the symbol count")
      assert(r.getAs[Long]("subtok_ppm") <= 1000000L)
    }
    // 3 merge rounds on this corpus must compress at least one doc
    assert(out.exists(r => r.getAs[Long]("n_subtok") < r.getAs[Long]("n_chars")),
      "no doc compressed — the merges never applied")
  }

  test("samp_mixture shares sum to ~1e6 and counts reconcile with the corpus") {
    val out = CurationQueries.queries("samp_mixture")(spark, sf).collect()
    val docs = graft.Tables.t(spark, sf, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs)
    val docShare = out.map(_.getAs[Long]("doc_share_ppm")).sum
    val tokShare = out.map(_.getAs[Long]("tok_share_ppm")).sum
    // floor division under-counts by at most one ppm per stratum
    assert(docShare <= 1000000L && docShare > 1000000L - out.length,
      s"doc shares sum to $docShare")
    assert(tokShare <= 1000000L && tokShare > 1000000L - out.length,
      s"token shares sum to $tokShare")
  }

  test("emb_sim_hist bins partition the dd_embed pair relation exactly") {
    val hist = CurationQueries.queries("emb_sim_hist")(spark, sf).collect()
    assert(hist.nonEmpty)
    hist.foreach { r =>
      val (lo, mn, mx) = (r.getAs[Long]("lo_ppm"), r.getAs[Long]("min_ppm"), r.getAs[Long]("max_ppm"))
      assert(lo <= mn && mn <= mx && mx < lo + 50000L,
        s"bin ${r.getAs[Long]("bin")}: extremes [$mn,$mx] outside [$lo,${lo + 50000})")
    }
    // total pairs = the banded pair relation's cardinality
    val pairs = graft.operators.VectorOps.bandedCosinePairs(spark, sf, 100).count()
    assert(hist.map(_.getAs[Long]("n_pairs")).sum === pairs)
  }
}
