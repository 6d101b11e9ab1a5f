package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Non-vacuous evidence for the two operators whose driver CORRECTNESS
  * rows pass on ZERO rows (the sf fixtures contain no orderless
  * customer and no normalized-exact duplicate): plant fixtures where
  * the answer is hand-computable and assert the exact numbers. The
  * SurveySyncSpec zero-row guard names this suite as the exemption
  * evidence for both keys.
  */
class PlantedFixtureSpec extends SparkSpec {
  import spark.implicits._

  /** documents with known cross-source normalized-exact duplicates:
    * fingerprint group G1 (same text up to case/whitespace) has
    * alpha×2, beta×3, gamma×1; group G2 has alpha×1, beta×1; plus one
    * unique doc per source. Expected pair counts are pure combinatorics:
    * G1 → (α,α)=C(2,2)=1, (α,β)=2·3=6, (α,γ)=2, (β,β)=C(3,2)=3,
    * (β,γ)=3, (γ,γ)=C(1,2)=0 (dropped); G2 → (α,β)=1.
    */
  private lazy val dupDir: String = {
    val dir = graft.rawdata.Topic.tempDir("planted-cross-dups")
    Seq(
      (1L, "The  Quick fox", "en", "alpha"),
      (2L, "the quick FOX", "en", "alpha"),
      (3L, " the QUICK fox ", "en", "beta"),
      (4L, "the quick fox", "en", "beta"),
      (5L, "THE QUICK FOX", "en", "beta"),
      (6L, "the\tquick   fox", "en", "gamma"),
      (7L, "Hello World", "en", "alpha"),
      (8L, "hello  world", "en", "beta"),
      (9L, "only in alpha", "en", "alpha"),
      (10L, "only in beta", "en", "beta"),
      (11L, "only in gamma", "en", "gamma"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd_exact_cross: planted cross-source dups yield the exact combinatorial pair counts") {
    val rows = DedupQueries.queries("dd_exact_cross")(spark, dupDir)
      .collect()
      .map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("is_cross")))
      .toMap
    assert(rows === Map(
      ("alpha", "alpha") -> ((1L, 0L)),
      ("alpha", "beta") -> ((7L, 1L)),   // 6 from G1 + 1 from G2
      ("alpha", "gamma") -> ((2L, 1L)),
      ("beta", "beta") -> ((3L, 0L)),
      ("beta", "gamma") -> ((3L, 1L))))
    // (gamma, gamma) must be ABSENT: its one doc forms zero pairs, and
    // the pair-join form this replaced never emitted zero-pair groups
    assert(!rows.contains(("gamma", "gamma")))
  }

  test("dd_exact_cross: the counts arithmetic equals the row-level pair self-join it replaced") {
    val fp = spark.read.parquet(s"$dupDir/documents.parquet")
      .select(md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp"),
        $"source", $"doc_id")
    val oldForm = fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(least(col("a.source"), col("b.source")).as("src_lo"),
        greatest(col("a.source"), col("b.source")).as("src_hi"))
      .groupBy($"src_lo", $"src_hi")
      .agg(count(lit(1)).as("n_pairs"))
      .collect()
      .map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) ->
        r.getAs[Long]("n_pairs"))
      .toMap
    val newForm = DedupQueries.queries("dd_exact_cross")(spark, dupDir)
      .collect()
      .map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) ->
        r.getAs[Long]("n_pairs"))
      .toMap
    assert(newForm === oldForm)
  }

  /** customers where two of four have no order at all — the NOT-EXISTS
    * answer the sf fixtures never exercise (every generated customer
    * has an order, so q7_antijoin has returned 0 rows since round 4)
    */
  private lazy val orderlessDir: String = {
    val dir = graft.rawdata.Topic.tempDir("planted-orderless")
    Seq(
      (1L, "Customer#1", 0, 100.0, "BUILDING"),
      (2L, "Customer#2", 1, 200.0, "BUILDING"),
      (3L, "Customer#3", 2, 300.0, "MACHINERY"),
      (4L, "Customer#4", 3, 400.0, "AUTOMOBILE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(
      (10L, 1L, "O", 50.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (11L, 4L, "F", 60.0, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q7_antijoin: planted orderless customers land in exactly their segments") {
    val rows = Relational2.queries("q7_antijoin")(spark, orderlessDir)
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n_customers"))
      .toMap
    // custkeys 2 (BUILDING) and 3 (MACHINERY) have no orders; 1 and 4 do
    assert(rows === Map("BUILDING" -> 1L, "MACHINERY" -> 1L))
  }
}
