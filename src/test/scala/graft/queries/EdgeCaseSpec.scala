package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-document robustness under Spark 4's default ANSI mode:
  * empty docs (x/0 would throw DIVIDE_BY_ZERO), docs under 3 chars /
  * 3 tokens (sequence(a, b) counts DOWN when b < a, so unguarded
  * shingle/gram builders would index tk[-1] → INVALID_ARRAY_INDEX, or
  * emit bogus grams where the DuckDB oracle emits none).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  /** a documents table of pathological rows + a few normal ones, written
    * as parquet so the REAL query entries run against it end-to-end
    */
  private lazy val edgeDir: String = {
    val dir = graft.rawdata.Topic.tempDir("edge-docs")
    val docs = Seq(
      (1L, "", "en", "web"),                     // empty
      (2L, "a", "en", "web"),                    // 1 char, 1 token
      (3L, "ab", "en", "web"),                   // 2 chars
      (4L, "one two", "en", "web"),              // 2 tokens: no 3-shingle
      (5L, "one two three", "en", "web"),        // exactly one 3-shingle
      (6L, "the quick brown fox jumps over the lazy dog", "en", "web"),
      (7L, "the quick brown fox jumps over the lazy dog", "en", "web"), // dup of 6
      (8L, "a b", "fr", "wiki"),
      (9L, "completely different content here with several words", "de", "books"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("txt_quality survives empty and near-empty docs") {
    val out = TextQueries.queries("txt_quality")(spark, edgeDir).collect()
    assert(out.length === 9)
    val empty = out.find(_.getLong(0) == 1L).get
    assert(empty.getAs[Long]("punct_ppm") === 0L, "empty doc scores 0 punctuation")
  }

  test("txt_ngram_profile emits no grams for docs under 3 chars") {
    val out = TextQueries.queries("txt_ngram_profile")(spark, edgeDir)
      .select($"lang", $"gram", $"n", $"rnk").as[(String, String, Long, Long)]
      .collect().toSet
    // replay the profile in Scala: docs with fewer than 3 chars contribute
    // no grams; the rest contribute every length-3 substring, counted per
    // (lang, gram) and ranked (n desc, gram asc) with only rnk <= 5 kept
    val docs = Seq(
      ("en", ""), ("en", "a"), ("en", "ab"), ("en", "one two"),
      ("en", "one two three"),
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("fr", "a b"),
      ("de", "completely different content here with several words"))
    val expected = docs.filter(_._2.length >= 3)
      .flatMap { case (lang, text) => text.sliding(3).map(lang -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((lang, gram), n) => (lang, gram, n) }
      .groupBy(_._1).flatMap { case (_, gs) =>
        gs.sortBy { case (_, gram, n) => (-n, gram) }
          .take(5).zipWithIndex
          .map { case ((lang, gram, n), i) => (lang, gram, n, (i + 1).toLong) }
      }.toSet
    assert(out === expected)
  }

  test("shingles skip docs under 3 tokens instead of ANSI-crashing") {
    val sh = DedupQueries.shinglesOf(
      spark.read.parquet(s"$edgeDir/documents.parquet").select($"doc_id", $"text"))
    val perDoc = sh.groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    assert(!perDoc.contains(1L) && !perDoc.contains(2L) && !perDoc.contains(4L))
    assert(perDoc(5L) === 1L, "exactly one 3-shingle for a 3-token doc")
    assert(perDoc(6L) === 7L)
  }

  test("vocab, packing and pii scans survive the pathological corpus") {
    val vocab = TextQueries.queries("txt_vocab")(spark, edgeDir).collect()
    assert(vocab.nonEmpty)
    // "the" appears in docs 6, 7 (2x each) → 4 occurrences, 2 docs
    val the = vocab.find(_.getString(0) == "the").get
    assert(the.getAs[Long]("n_occurrences") === 4L && the.getAs[Long]("n_docs") === 2L)

    val bins = TextQueries.queries("txt_pack_bins")(spark, edgeDir).collect()
    // every doc lands in some bin; totals preserved
    assert(bins.map(_.getAs[Long]("n_docs")).sum === 9L)

    val pii = TextQueries.queries("txt_pii")(spark, edgeDir).collect()
    assert(pii.map(_.getAs[Long]("n_docs")).sum === 9L)
    assert(pii.forall(_.getAs[Long]("n_flagged") === 0L), "no pii patterns in the edge corpus")
  }

  test("clustering, decontamination and sampling on the pathological corpus") {
    // the only edges are the identical docs 6/7 → exactly one 2-cluster
    val clusters = DedupQueries.queries("dd_cluster")(spark, edgeDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(clusters === Set((6L, 6L, 2L), (7L, 6L, 2L)))
    spark.catalog.clearCache()

    // no doc_id is divisible by 17 → empty benchmark slice, empty result
    // (not a crash)
    assert(DedupQueries.queries("dd_decontam")(spark, edgeDir).count() === 0L)
    spark.catalog.clearCache()

    // every stratum is under the target → the threshold saturates ≥ 2^32
    // and the sample keeps the whole corpus
    assert(SamplingQueries.queries("samp_stratified")(spark, edgeDir).count() === 9L)
    // the budget dwarfs the corpus → every doc of every source selected
    assert(SamplingQueries.queries("samp_token_budget")(spark, edgeDir).count() === 9L)
  }

  test("the dedup chain end-to-end on the pathological corpus") {
    // must not throw, and must find the one exact-duplicate near-pair
    val pairs = DedupQueries.queries("dd_jaccard")(spark, edgeDir).collect()
    assert(pairs.exists(r => r.getLong(0) == 6L && r.getLong(1) == 7L &&
      r.getLong(2) == 1000000L), "identical docs have jaccard 1.0")
    val cleaned = DedupQueries.queries("pipe_clean_corpus")(spark, edgeDir)
    assert(cleaned.count() > 0)
    spark.catalog.clearCache()
  }

  test("phrase, bigram-LM, containment and upsample operators on the pathological corpus") {
    // only docs 6/7 reach 8 tokens (9 each): two 8-gram phrases, both
    // shared by exactly those two docs
    val phrases = TextQueries.queries("txt_phrases")(spark, edgeDir)
      .as[(String, Long, Long, Long)].collect()
    assert(phrases.length === 2)
    assert(phrases.forall { case (_, nDocs, nOcc, firstDoc) =>
      nDocs == 2L && nOcc == 2L && firstDoc == 6L })
    spark.catalog.clearCache()

    // docs with fewer than 2 tokens have no bigram and must be absent —
    // not crash; split("") yields one empty token, so doc 1 has ZERO
    // bigrams, docs 2/3 one token each
    val lm = TextQueries.queries("txt_bigram_lm")(spark, edgeDir).collect()
    val lmDocs = lm.map(_.getAs[Long]("doc_id")).toSet
    assert(!lmDocs.contains(1L) && !lmDocs.contains(2L) && !lmDocs.contains(3L))
    assert(lm.forall(r => r.getAs[Long]("min_pred_ppm") <= r.getAs[Long]("mean_pred_ppm")))
    // the duplicate docs 6/7 score identically
    val by67 = lm.filter(r => Set(6L, 7L)(r.getAs[Long]("doc_id")))
      .map(r => (r.getAs[Long]("n_bigrams"), r.getAs[Long]("mean_pred_ppm"), r.getAs[Long]("min_pred_ppm")))
    assert(by67.length === 2 && by67.distinct.length === 1)
    spark.catalog.clearCache()

    // identical docs contain each other completely
    val cont = DedupQueries.queries("dd_containment")(spark, edgeDir).collect()
    assert(cont.exists(r => r.getAs[Long]("doc_a") == 6L && r.getAs[Long]("doc_b") == 7L &&
      r.getAs[Long]("containment_ppm") == 1000000L))
    spark.catalog.clearCache()

    // a single-doc source (wiki, n=1) gets the full integer factor:
    // 120 milli-epochs div 1000 = 120 copies, numbered 1..120
    val up = SamplingQueries.queries("samp_upsample")(spark, edgeDir)
      .filter($"source" === "wiki")
      .as[(String, Long, Long, Long)].collect()
    assert(up.length === 120)
    assert(up.forall { case (_, docId, copies, _) => docId == 8L && copies == 120L })
    assert(up.map(_._4).sorted.toSeq === (1L to 120L))
  }

  test("chunking, segment dedup, BPE and mixture report on the pathological corpus") {
    // txt_chunk: the empty doc still yields one chunk (split('') is one
    // empty token, mirroring txt_tokens); no doc crashes the sequence()
    val chunks = CurationQueries.queries("txt_chunk")(spark, edgeDir).collect()
    val chunksByDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(chunksByDoc.keySet === (1L to 9L).toSet)
    assert(chunksByDoc.forall(_._2.length == 1), "all edge docs fit one chunk")
    // the duplicate docs 6/7 share a chunk hash
    val h67 = chunks.filter(r => Set(6L, 7L)(r.getAs[Long]("doc_id")))
      .map(_.getAs[String]("chunk_hash"))
    assert(h67.length === 2 && h67.distinct.length === 1)
    spark.catalog.clearCache()

    // dd_segment: identical docs are 100% duplicated, unique docs 0%
    val seg = CurationQueries.queries("dd_segment")(spark, edgeDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_ppm")).toMap
    assert(seg(6L) === 1000000L && seg(7L) === 1000000L)
    assert(seg(9L) === 0L)
    spark.catalog.clearCache()

    // txt_bpe: single-char and empty tokens survive merge training —
    // rounds run until the tiny vocab's pairs run dry, never past
    // BpeMerges, with contiguous round ranks
    val bpe = CurationQueries.queries("txt_bpe")(spark, edgeDir).collect()
    assert(bpe.length >= 3 && bpe.length <= CurationQueries.BpeMerges)
    assert(bpe.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to bpe.length.toLong))
    assert(bpe.forall(_.getAs[Long]("pair_n") >= 1L))
    spark.catalog.clearCache()

    // txt_bpe_encode: doc 1's only token is empty (filtered) → absent;
    // every other doc present with n_subtok ≤ n_chars
    val enc = CurationQueries.queries("txt_bpe_encode")(spark, edgeDir).collect()
    val encDocs = enc.map(_.getAs[Long]("doc_id")).toSet
    assert(encDocs === (2L to 9L).toSet)
    assert(enc.forall(r => r.getAs[Long]("n_subtok") <= r.getAs[Long]("n_chars")))
    spark.catalog.clearCache()

    // samp_mixture: shares stay exact on a 9-doc corpus
    val mix = CurationQueries.queries("samp_mixture")(spark, edgeDir).collect()
    assert(mix.map(_.getAs[Long]("n_docs")).sum === 9L)
    assert(mix.map(_.getAs[Long]("doc_share_ppm")).sum <= 1000000L)
    spark.catalog.clearCache()

    // dd_span: the identical docs 6/7 are each one single maximal run
    // covering the whole doc; nothing else is duplicated
    val span = CurationQueries.queries("dd_span")(spark, edgeDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(span.keySet === Set(6L, 7L))
    Seq(6L, 7L).foreach { id =>
      assert(span(id).getAs[Long]("n_runs") === 1L)
      assert(span(id).getAs[Long]("max_run_tok") === span(id).getAs[Long]("dup_tok"))
    }
    spark.catalog.clearCache()

    // txt_novelty: docs under 3 tokens are absent; the later exact dup 7
    // adds nothing; the first doc with 3-grams is fully novel
    val novOut = TextQueries.queries("txt_novelty")(spark, edgeDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(novOut.keySet === Set(5L, 6L, 7L, 9L), "only 3-token-plus docs have 3-grams")
    assert(novOut(5L).getAs[Long]("novelty_ppm") === 1000000L)
    assert(novOut(7L).getAs[Long]("n_new") === 0L, "exact dup of doc 6 adds nothing")
    assert(novOut(9L).getAs[Long]("novelty_ppm") === 1000000L)
  }

  test("the round-5 text/dedup/pipeline operators survive the pathological corpus") {
    // lexical stats: only docs with non-empty tokens contribute
    val hapax = TextQueries.queries("txt_hapax")(spark, edgeDir).collect()
    assert(hapax.forall(r => r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens")))
    assert(hapax.forall(r => r.getAs[Long]("ttr_ppm") <= 1000000L))

    // skip-grams / PMI: empty and 1-token docs contribute no pairs
    val sg = TextQueries.queries("txt_skipgrams")(spark, edgeDir).collect()
    assert(sg.forall(_.getAs[Long]("n") > 0))
    val pmi = TextQueries.queries("txt_pmi")(spark, edgeDir).collect()
    assert(pmi.forall(_.getAs[Long]("n_ab") >= 10L) || pmi.isEmpty)
    spark.catalog.clearCache()

    // prefix dedup: every edge doc is under 16 tokens -> no candidates
    assert(DedupQueries.queries("dd_prefix")(spark, edgeDir).count() === 0)

    // canonicalization covers the corpus once, exactly one keeper per
    // cluster (docs 6/7 are identical -> one cluster of two)
    val canon = DedupQueries.queries("dd_canonical")(spark, edgeDir).collect()
    assert(canon.length === 9)
    assert(canon.count(_.getAs[Long]("kept") == 1L) === 8)
    spark.catalog.clearCache()

    // funnel report: monotone non-increasing doc mass through the stages
    val rep = DedupQueries.queries("pipe_report")(spark, edgeDir).collect()
      .sortBy(_.getAs[Long]("stage"))
    assert(rep.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "quality", "exact_dedup", "near_dedup", "scrub"))
    val docsPerStage = rep.map(_.getAs[Long]("n_docs")).toSeq
    assert(docsPerStage.head === 9L)
    assert(docsPerStage.zip(docsPerStage.tail).forall { case (a, b) => b <= a })
    spark.catalog.clearCache()

    // leakage + histogram: run clean on the tiny corpus (no ANSI throws)
    DedupQueries.queries("dd_leakage")(spark, edgeDir).collect()
    DedupQueries.queries("dd_jaccard_hist")(spark, edgeDir).collect()
    SamplingQueries.queries("samp_curriculum")(spark, edgeDir).collect()
    spark.catalog.clearCache()
  }

  /** embeddings with degenerate vectors: all-zero, sub-quantization-unit
    * (rounds to the zero vector), one-hot, constant-negative, mixed —
    * written as parquet so the real entries run end-to-end
    */
  private lazy val edgeEmbDir: String = {
    val dir = graft.rawdata.Topic.tempDir("edge-emb")
    val dims = 64
    val vecs = Seq(
      (1L, Array.fill(dims)(0.0f), 0),                       // exactly zero
      (2L, Array.fill(dims)(1e-9f), 0),                      // quantizes to zero
      (3L, Array.tabulate(dims)(i => if (i == 0) 1.0f else 0.0f), 1), // one-hot
      (4L, Array.fill(dims)(-0.5f), 1),                      // all negative
      (5L, Array.tabulate(dims)(i => if (i % 2 == 0) 0.25f else -0.75f), 2))
      .toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("bloom screen and hash split survive pathological and empty-corpus shapes") {
    // the pathological corpus has no doc_id % 10 == 0 rows: an EMPTY
    // probe batch must yield an empty relation, not a crash
    assert(graft.SparkEntry.queries("dd_bloom")(spark, edgeDir).collect().isEmpty)
    // empty CORPUS side: every doc is a probe, the position relation is
    // empty — everything must come out clean (no null-hit miscounts)
    val allProbes = Seq((10L, "alpha"), (20L, "beta")).toDF("doc_id", "text")
    val out = DedupQueries.bloomScreen(allProbes).collect()
    assert(out.length === 2 && out.forall(_.getAs[String]("verdict") == "clean"))
    // the fold assignment covers the whole pathological corpus, empty doc included
    val split = graft.SparkEntry.queries("samp_hash_split")(spark, edgeDir).collect()
    assert(split.map(_.getAs[Long]("n_docs")).sum === 9L)
    spark.catalog.clearCache()
  }

  test("quantization and similarity histogram survive zero-norm vectors under ANSI mode") {
    // emb_quantize: scale-0 vectors hit the guarded division path
    val q = CurationQueries.queries("emb_quantize")(spark, edgeEmbDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(q.keySet === (1L to 5L).toSet)
    Seq(1L, 2L).foreach { v =>
      assert(q(v).getAs[Long]("scale") === 0L, s"vec $v must quantize to scale 0")
      assert(q(v).getAs[Long]("sum_abs_err") === 0L)
      assert(q(v).getAs[Long]("err_ppm") === 0L)
    }
    // one-hot and constant vectors quantize exactly: zero error
    assert(q(3L).getAs[Long]("sum_abs_err") === 0L)
    assert(q(4L).getAs[Long]("sum_abs_err") === 0L)
    spark.catalog.clearCache()

    // emb_sim_hist: zero-norm vectors are excluded from pairing instead
    // of producing a NaN cosine that ANSI CAST would throw on; the
    // remaining pairs (3,4), (3,5), (4,5) all land in valid bins
    val hist = CurationQueries.queries("emb_sim_hist")(spark, edgeEmbDir).collect()
    assert(hist.map(_.getAs[Long]("n_pairs")).sum === 3L)
    hist.foreach { r =>
      val (lo, mn, mx) = (r.getAs[Long]("lo_ppm"), r.getAs[Long]("min_ppm"), r.getAs[Long]("max_ppm"))
      assert(lo <= mn && mn <= mx && mx < lo + 50000L)
    }
    spark.catalog.clearCache()

    // the corpus-wide LSH chain tolerates the degenerate vectors too,
    // and semdedup still gives every vector (incl. zero-norm) a cluster
    val sdd = AnnQueries.queries("emb_semdedup")(spark, edgeEmbDir).collect()
    assert(sdd.map(_.getAs[Long]("vec_id")).toSet === (1L to 5L).toSet)
    assert(sdd.forall(_.getAs[Long]("cluster_id") >= 1L))
    spark.catalog.clearCache()
  }

  test("Gram, PCA, dim-stats, centroid and kNN ops survive degenerate vectors") {
    // emb_gram: zero vectors contribute zero cells, diagonal stays PSD
    val gram = CurationQueries.queries("emb_gram")(spark, edgeEmbDir).collect()
    assert(gram.length === 64 * 65 / 2)
    assert(gram.filter(r => r.getAs[Long]("i") == r.getAs[Long]("j"))
      .forall(_.getAs[Long]("sxy") >= 0L))
    spark.catalog.clearCache()

    // emb_pca1: renormalization guard handles the tiny matrix
    val pca = CurationQueries.queries("emb_pca1")(spark, edgeEmbDir).collect()
    assert(pca.length === 64)
    assert(pca.forall(r => math.abs(r.getAs[Long]("v3")) <= 100L))
    spark.catalog.clearCache()

    // emb_dim_stats: the all-zero dimensions report full zero counts
    val ds = CurationQueries.queries("emb_dim_stats")(spark, edgeEmbDir).collect()
    assert(ds.length === 64)
    assert(ds.forall(_.getAs[Long]("n") === 5L))
    assert(ds.forall(r => r.getAs[Long]("n_zero") <= 5L && r.getAs[Long]("msq_micro2") >= 0L))
    spark.catalog.clearCache()

    // emb_centroid_cos: the zero-centroid label is excluded by the
    // nn > 0 guard instead of dividing by sqrt(0)
    val cc = CurationQueries.queries("emb_centroid_cos")(spark, edgeEmbDir).collect()
    assert(cc.forall(r => math.abs(r.getAs[Long]("cos_ppm")) <= 1000000L))
    spark.catalog.clearCache()

    // emb_knn: zero-norm vectors emit no edges; ranks stay dense
    val knn = AnnQueries.queries("emb_knn")(spark, edgeEmbDir).collect()
    assert(!knn.exists(r => Set(1L, 2L).contains(r.getAs[Long]("vec_id"))))
    assert(knn.forall(_.getAs[Long]("rnk") >= 1L))
    spark.catalog.clearCache()
  }

  /** an events table whose JSON payloads cover every failure shape the
    * schema'd from_json parse must absorb: syntactically broken, key
    * absent, SQL NULL blob, explicit JSON null value
    */
  private lazy val edgeEvDir: String = {
    val dir = graft.rawdata.Topic.tempDir("edge-events")
    Seq(
      (1L, 1000000L, 1L, "click", 1.0, """{"k": 7}"""),
      (2L, 2000000L, 1L, "click", 1.0, "not json at all"),
      (3L, 3000000L, 2L, "view", 2.0, """{"other": 1}"""),
      (4L, 4000000L, 2L, "view", 2.0, null.asInstanceOf[String]),
      (5L, 5000000L, 3L, "view", 2.0, """{"k": null}"""),
      (6L, 6000000L, 3L, "view", 0.5, """{"k": 9}"""))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ev_props: malformed, missing and null payloads become NULL, never an error") {
    val out = EventQueries.queries("ev_props")(spark, edgeEvDir)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    // click: one good payload, one unparseable
    assert(out("click") === (("click", 2L, 1L, Some(7L), Some(7L), Some(7L), 1L)))
    // view: key-missing, blob-null and value-null all count as absent
    assert(out("view") === (("view", 4L, 1L, Some(9L), Some(9L), Some(9L), 1L)))
  }

  test("q39_triangles: K4 co-purchase graph counts 4 triangles, closure 1.0") {
    val dir = graft.rawdata.Topic.tempDir("edge-li")
    // orders 1:(a,b,c) 2:(b,c,d) 3:(a,d) 4:(a,c) 5:(a,b) 6:(b,d)
    // → the complete graph on {10,20,30,40}: every wedge closes
    Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 20L), (2L, 30L), (2L, 40L),
      (3L, 10L), (3L, 40L), (4L, 10L), (4L, 30L), (5L, 10L), (5L, 20L),
      (6L, 20L), (6L, 40L), (6L, 40L)) // duplicate line: same part twice
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Relational2.queries("q39_triangles")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    // K4: 4 nodes, 6 edges, degree 3 each → 12 wedges, 4 triangles,
    // global closure 3*4/12 = exactly 1.0
    assert(out.toSeq === Seq((4L, 6L, 3L, 12L, 4L, 1000000L)))
  }

  test("q37_fuzzy_join: pairs exist only inside the (brand, token) block") {
    val dir = graft.rawdata.Topic.tempDir("edge-part")
    Seq(
      (1L, "small ring", "Brand#1"),
      (2L, "small ring", "Brand#1"),   // dist 0 to 1
      (3L, "small rinx", "Brand#1"),   // dist 1 to 1 and 2
      (4L, "small ring", "Brand#2"),   // identical name, other brand: blocked out
      (5L, "large ring", "Brand#1"),   // dist 2 but different first token: blocked out
      (6L, "smallish completely different", "Brand#1")) // own block, no partner
      .toDF("p_partkey", "p_name", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = Relational2.queries("q37_fuzzy_join")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    // only Brand#1's {1,2,3} block pairs up: (1,2) exact, (1,3)+(2,3) near
    assert(out.toSeq === Seq(("Brand#1", 3L, 1L, 2L)))
  }
}
