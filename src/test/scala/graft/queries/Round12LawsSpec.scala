package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 hardening laws: the emb_centroid_drift degenerate corners
  * (one-parity labels, all-zero half-centroids) the full-outer rewrite
  * exists for, the q78_seasonal_index DECIMAL(38,0) headroom bound its
  * doc comment cites, and the txt_len_topshare floored-decile rule on a
  * hand-countable corpus.
  */
class Round12LawsSpec extends SparkSpec {
  import spark.implicits._

  /** embeddings with every drift corner planted: label 1 is stable
    * (identical direction in both parity halves → cos_ppm = 1e6),
    * label 2 lives ONLY in the even half (the inner-join-vanishing
    * case), label 3 has an all-zero even-half centroid (the 0/0 case),
    * label 4 flips direction between halves (cos = −1).
    */
  private lazy val driftDir: String = {
    val dir = graft.rawdata.Topic.tempDir("planted-drift")
    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 1),
      (2L, Array(3f, 0f, 0f, 0f), 1),
      (1L, Array(2f, 0f, 0f, 0f), 1),
      (3L, Array(2f, 0f, 0f, 0f), 1),
      (4L, Array(1f, 1f, 0f, 0f), 2),
      (6L, Array(2f, 2f, 0f, 0f), 2),
      (8L, Array(0f, 0f, 0f, 0f), 3),
      (9L, Array(1f, 2f, 3f, 4f), 3),
      (10L, Array(1f, 0f, 0f, 0f), 4),
      (11L, Array(-1f, 0f, 0f, 0f), 4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("emb_centroid_drift: one-parity labels surface with NULL cos_ppm instead of vanishing") {
    val rows = AnnQueries.queries("emb_centroid_drift")(spark, driftDir)
      .collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_even"), r.getAs[Long]("n_odd"),
          Option(r.getAs[java.lang.Long]("cos_ppm")).map(_.longValue()))))
      .toMap
    assert(rows === Map(
      1L -> ((2L, 2L, Some(1000000L))),   // same direction both halves
      2L -> ((2L, 0L, None)),             // even-only label: must NOT vanish
      3L -> ((1L, 1L, None)),             // zero even-half centroid: guarded 0/0
      4L -> ((1L, 1L, Some(-1000000L))))) // opposite directions
  }

  test("q78_seasonal_index: fixture headroom is >= 10 decimal orders under the 10^38 cap") {
    // widest intermediate is s_d·m·10⁶ ≤ G·|months|·10⁶ with G = total
    // revenue cents; pin the doc comment's bound with |months| at the
    // century cap (1200), not just the fixture's span
    val g = graft.Tables.t(spark, sf, "orders")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .cast("decimal(38,0)")).as("g"))
      .collect()(0).getDecimal(0).toBigInteger
    val widest = g.multiply(java.math.BigInteger.valueOf(1200L))
      .multiply(java.math.BigInteger.valueOf(1000000L))
    assert(widest.compareTo(java.math.BigInteger.TEN.pow(28)) < 0,
      s"q78 intermediate $widest within 10 orders of the DECIMAL(38,0) cap")
    val out = Relational3.queries("q78_seasonal_index")(spark, sf).collect()
    assert(out.length === 12)
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("index_ppm"))),
      "ANSI mode: overflow would THROW, and no index_ppm may be silently NULL")
  }

  /** documents sized so each floored-decile branch is hand-countable:
    * nd=15 → k=1 (floor), nd=5 → k=1 (the GREATEST floor), nd=20 → k=2.
    */
  private lazy val topshareDir: String = {
    val dir = graft.rawdata.Topic.tempDir("planted-topshare")
    val docs =
      // s15: doc i has i tokens (i = 1..15); top-1 doc mass = 15 of 120
      (1 to 15).map(i => (100L + i, ("w " * i).trim, "en", "s15")) ++
      // s5: five 2-token docs; top-1 = 2 of 10
      (1 to 5).map(i => (200L + i, "a b", "en", "s5")) ++
      // s20: doc i has i tokens (i = 1..20); top-2 = 20+19 = 39 of 210
      (1 to 20).map(i => (300L + i, ("w " * i).trim, "en", "s20"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("txt_len_topshare: GREATEST(1, nd div 10) picks the exact planted top docs") {
    val rows = TextQueries.queries("txt_len_topshare")(spark, topshareDir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("top_tokens"), r.getAs[Long]("top_share_ppm"))))
      .toMap
    assert(rows === Map(
      "s15" -> ((15L, 120L, 15L, 125000L)),
      "s5" -> ((5L, 10L, 2L, 200000L)),
      "s20" -> ((20L, 210L, 39L, 185714L))))
  }
}
