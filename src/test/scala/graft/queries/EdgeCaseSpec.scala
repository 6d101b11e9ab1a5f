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
    val grams = TextQueries.queries("txt_ngram_profile")(spark, edgeDir)
      .agg(sum($"n")).as[Long].collect().head
    // doc lengths 0,1,2 contribute nothing; others contribute len-2 grams
    val expected = Seq(7, 13, 43, 43, 3, 51).map(n => math.max(0, n - 2)).sum
    assert(grams === expected)
  }

  test("shingles skip docs under 3 tokens instead of ANSI-crashing") {
    val sh = DedupQueries.shinglesOf(
      spark.read.parquet(s"$edgeDir/documents.parquet").select($"doc_id", $"text"))
    val perDoc = sh.groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    assert(!perDoc.contains(1L) && !perDoc.contains(2L) && !perDoc.contains(4L))
    assert(perDoc(5L) === 1L, "exactly one 3-shingle for a 3-token doc")
    assert(perDoc(6L) === 7L)
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
}
