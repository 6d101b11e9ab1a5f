package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** The streaming cross-source exact-dup gate must (1) produce verdicts
  * identical to the batch join over the same rows and (2) obey the
  * incremental pair-count law that proves dd_exact_cross's counts
  * arithmetic in stream mode: one arrival's n_existing per dup_source
  * IS the (src_lo, src_hi) pair-count delta the arrival adds to the
  * batch operator — c for its own source (C(c+1,2) − C(c,2) = c), c′
  * for every other.
  */
class StreamExactCrossSpec extends SparkSpec {
  import spark.implicits._

  /** PlantedFixtureSpec's dup-group shape: G1 spans alpha×2/beta×3/
    * gamma×1 up to case/whitespace, G2 spans alpha/beta, plus uniques.
    */
  private def corpusDf = Seq(
    (1L, "The  Quick fox", "en", "alpha"),
    (2L, "the quick FOX", "en", "alpha"),
    (3L, " the QUICK fox ", "en", "beta"),
    (4L, "the quick fox", "en", "beta"),
    (5L, "THE QUICK FOX", "en", "beta"),
    (6L, "the\tquick   fox", "en", "gamma"),
    (7L, "Hello World", "en", "alpha"),
    (8L, "hello  world", "en", "beta"),
    (9L, "only in alpha", "en", "alpha"))
    .toDF("doc_id", "text", "lang", "source")

  test("stream verdicts are identical to the batch counts-store join") {
    val dir = graft.rawdata.Topic.tempDir("stream-exact-cross")
    // arrivals: a G1 dup from a NEW source, a G2 dup from beta, a novel doc
    Seq(
      (101L, "the QUICK   fox", "delta"),
      (102L, "HELLO world", "beta"),
      (103L, "entirely novel text", "alpha"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val (flags, caches) = ExactCrossStream.dupFlagsScoped(stream, corpusDf)
    val q = flags.writeStream.format("memory").queryName("xcflags")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .sql("SELECT doc_id, source, dup_source, n_existing FROM xcflags")
        .as[(Long, String, Option[String], Long)].collect().toSet
      assert(streamed === Set(
        (101L, "delta", Some("alpha"), 2L),
        (101L, "delta", Some("beta"), 3L),
        (101L, "delta", Some("gamma"), 1L),
        (102L, "beta", Some("alpha"), 1L),
        (102L, "beta", Some("beta"), 1L),
        (103L, "alpha", None, 0L)))

      // batch twin: the same join run as a plain DataFrame
      val batch = ExactCrossStream.dupFlags(spark.read.parquet(dir), corpusDf)
        .as[(Long, String, Option[String], Long)].collect().toSet
      assert(batch === streamed)
    } finally {
      q.stop()
      caches.close()
    }
  }

  test("one arrival's verdicts are exactly dd_exact_cross's pair-count delta") {
    // batch operator before/after adding arrival 101 (a G1 dup from delta)
    val before = graft.rawdata.Topic.tempDir("xc-before")
    val after = graft.rawdata.Topic.tempDir("xc-after")
    corpusDf.withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$before/documents.parquet")
    corpusDf.unionByName(
        Seq((101L, "the QUICK   fox", "en", "delta")).toDF("doc_id", "text", "lang", "source"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$after/documents.parquet")

    def pairs(d: String): Map[(String, String), Long] =
      DedupQueries.queries("dd_exact_cross")(spark, d).collect()
        .map(r => (r.getAs[String]("src_lo"), r.getAs[String]("src_hi")) ->
          r.getAs[Long]("n_pairs")).toMap
    val b = pairs(before)
    val delta = pairs(after).map { case (k, v) => k -> (v - b.getOrElse(k, 0L)) }
      .filter(_._2 != 0L)

    // the gate's verdicts for that single arrival, keyed canonically
    val (flags, caches) = ExactCrossStream.dupFlagsScoped(
      Seq((101L, "the QUICK   fox", "delta")).toDF("doc_id", "text", "source"),
      corpusDf)
    try {
      val fromGate = flags.filter($"dup_source".isNotNull)
        .select(least($"source", $"dup_source").as("lo"),
          greatest($"source", $"dup_source").as("hi"), $"n_existing")
        .as[(String, String, Long)].collect()
        .map { case (lo, hi, n) => (lo, hi) -> n }.toMap
      assert(fromGate === delta)
      assert(delta === Map(
        ("alpha", "delta") -> 2L, ("beta", "delta") -> 3L,
        ("delta", "gamma") -> 1L))
    } finally caches.close()
  }
}
