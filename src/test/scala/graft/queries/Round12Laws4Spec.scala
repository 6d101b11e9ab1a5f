package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the round-12 corpus-card operators
  * (dd_norm_gain / pipe_datacard / txt_dup_lines) — the sf fixtures are
  * dup-free and newline-free, so the gain arithmetic, the redundancy
  * card and the line audit are pinned on planted data.
  */
class Round12Laws4Spec extends SparkSpec {
  import spark.implicits._

  test("dd_norm_gain: folding-only duplicates show up as exact gain ppm") {
    val d = graft.rawdata.Topic.tempDir("r12-norm-gain")
    // raw group {1,2} (byte-identical); doc 3 joins only after folding;
    // doc 4 unique
    Seq(
      (1L, "same text", "en", "a"), (2L, "same text", "en", "a"),
      (3L, "Same  TEXT", "en", "b"), (4L, "something else", "en", "a"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = DedupQueries.queries("dd_norm_gain")(spark, d).collect()
    assert(r.length === 1)
    val m = r.head.getValuesMap[Long](Seq("raw_groups", "raw_dup_docs", "raw_pairs",
      "norm_groups", "norm_dup_docs", "norm_pairs", "gain_ppm"))
    assert(m === Map(
      "raw_groups" -> 1L, "raw_dup_docs" -> 2L, "raw_pairs" -> 1L,
      "norm_groups" -> 1L, "norm_dup_docs" -> 3L, "norm_pairs" -> 3L,
      "gain_ppm" -> 666666L)) // (3 - 1)·10⁶ div 3
  }

  test("pipe_datacard: redundancy ppm and the (count desc, lang) majority tie-break") {
    val d = graft.rawdata.Topic.tempDir("r12-datacard")
    Seq(
      (1L, "x y", "en", "s"), (2L, "x  Y", "en", "s"),      // norm dups
      (3L, "unique one", "de", "s"), (4L, "another doc", "de", "s"),
      (5L, "solo doc here", "fr", "t"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = DedupQueries.queries("pipe_datacard")(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("exact_dup_ppm"), r.getAs[Long]("n_langs"),
          r.getAs[String]("top_lang"), r.getAs[Long]("top_lang_ppm"))))
      .toMap
    // s: 4 docs / 3 unique -> 250000 ppm; en and de tie at 2 -> "de" wins
    assert(rows("s") === ((4L, 3L, 250000L, 2L, "de", 500000L)))
    assert(rows("t") === ((1L, 1L, 0L, 1L, "fr", 1000000L)))
  }

  test("txt_dup_lines: repeated header lines carry the exact dup mass") {
    val d = graft.rawdata.Topic.tempDir("r12-dup-lines")
    Seq(
      (1L, "site header\nbody one", "en", "s"),
      (2L, "site header\nbody two", "en", "s"),
      (3L, "no dupes at all", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextQueries.queries("txt_dup_lines")(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("n_dup_lines"), r.getAs[Long]("dup_ppm"))))
      .toMap
    assert(rows === Map(
      "s" -> ((4L, 3L, 2L, 500000L)),
      "t" -> ((1L, 1L, 0L, 0L))))
  }
}
