package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Vocab-scale BPE demonstration (the round-9 ask): the driver testdata
  * corpus holds only 31 distinct words, so word-level merge training
  * saturates at ~45 merges no matter how many rounds run. This corpus
  * has ~1500 distinct 8–14-char words over the full 26-letter alphabet
  * — enough pair mass that the 12 batched rounds learn ≥256 merges
  * through the REAL registered operator path, and every one of them is
  * value-checked against the plain-Scala batched-BPE reference (the
  * same reference CurationOpsSpec replays at the small scale).
  */
class BpeVocabScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val richDir: String = {
    val dir = graft.rawdata.Topic.tempDir("bpe-scale")
    // ~1500 distinct deterministic words (8 + id%7 chars, chars from
    // hash(id, j)); 600 docs × 40 word draws by hash(doc_id, k)
    val wordExpr =
      """concat_ws('', transform(sequence(1, 8 + CAST(pmod(hash(doc_id, k), 1500) % 7 AS INT)),
        |  j -> chr(97 + pmod(hash(pmod(hash(doc_id, k), 1500), j), 26))))""".stripMargin
    spark.range(0, 600).toDF("doc_id")
      .withColumn("text",
        expr(s"concat_ws(' ', transform(sequence(1, 40), k -> $wordExpr))"))
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("txt_bpe learns >= 256 merges on a rich vocabulary, all reference-checked") {
    val got = CurationQueries.queries("txt_bpe")(spark, richDir).collect()
      .sortBy(_.getAs[Long]("rnk"))
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[Long]("pair_n")))
    spark.catalog.clearCache()

    assert(got.length >= 256,
      s"only ${got.length} merges learned — the vocab-scale claim needs >= 256")
    assert(got.length <= CurationQueries.BpeMerges)

    // the shared plain-Scala reference (BpeReference — the same
    // executable spec CurationOpsSpec checks at the small scale)
    val toks = spark.read.parquet(s"$richDir/documents.parquet")
      .selectExpr("explode(split(text, ' +')) AS tok")
      .filter($"tok" =!= "").collect().map(_.getString(0)).toSeq
    val ref = BpeReference.merges(toks)
    assert(got.toSeq === ref,
      "vocab-scale BPE merge table diverged from the batched reference")
  }

  test("min-support floor: selected merges unchanged, collected pair relation shrinks") {
    // the floor (BpeMinPair) prunes the driver-side collect; the claim it
    // must uphold is that no merge the UNFLOORED trainer would select sits
    // below it on the fixtures — proven by running the shared reference
    // at floor 1 vs the operator floor and requiring identical tables
    val toks = spark.read.parquet(s"$richDir/documents.parquet")
      .selectExpr("explode(split(text, ' +')) AS tok")
      .filter($"tok" =!= "").collect().map(_.getString(0)).toSeq
    assert(BpeReference.merges(toks, minPair = 1L) === BpeReference.merges(toks),
      "the floor changed a selected merge on the rich fixture")

    // ...and the prune is not vacuous: on a hapax-bearing corpus the raw
    // pair relation holds sub-floor pair types the floored collect never
    // ships, and the registered operator provably selects none of them
    val dir = graft.rawdata.Topic.tempDir("bpe-floor")
    Seq((0L, "zfzf zfzf qk"), (1L, "zfzf zfzf"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hapaxToks = Seq("zfzf", "zfzf", "qk", "zfzf", "zfzf")
    val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((w, n) <- hapaxToks.groupBy(identity).map { case (t, g) => t.toVector -> g.length.toLong };
         i <- 0 until w.length - 1) pc((w(i).toString, w(i + 1).toString)) += n
    assert(pc.valuesIterator.count(_ < CurationQueries.BpeMinPair) > 0,
      "hapax fixture lost its sub-floor pair type — fixture bug")
    val learned = CurationQueries.queries("txt_bpe")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(learned.nonEmpty)
    assert(learned.forall(_.getAs[Long]("pair_n") >= CurationQueries.BpeMinPair),
      "operator selected a sub-floor merge — the prune is not applied")
    assert(learned.toSeq.map(r =>
        (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[Long]("pair_n")))
      === BpeReference.merges(hapaxToks),
      "hapax-fixture merges diverged from the floored reference")
  }

  test("the saturated driver corpus stops at its dry round, not at BpeRounds") {
    // 31 distinct words run dry long before the 384-merge cap: the
    // early-exit keeps the learned table short AND proves rounds past
    // exhaustion are never scheduled (bench cost on real testdata stays
    // at the old depth)
    val small = CurationQueries.queries("txt_bpe")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(small.length < 256, "driver corpus unexpectedly rich — update the spec docs")
    assert(small.nonEmpty)
    assert(small.map(_.getAs[Long]("rnk")).sorted.toSeq === (1L to small.length.toLong))
  }
}
