package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** The streaming source-mix monitor must (1) reach exactly the batch
  * datacard's per-(source, lang) counts relation on every snapshot,
  * (2) advance those counts INCREMENTALLY across micro-batches (the
  * online-drift property — counts after batch 2 equal the batch
  * aggregation of batch1 ∪ batch2), and (3) compose into the very
  * mixture columns pipe_datacard publishes — the aggregation proven in
  * both modes, the gate-admission rule.
  */
class StreamDatacardSpec extends SparkSpec {
  import spark.implicits._

  private def batch1 = Seq(
    (1L, "one two three", "en", "alpha"),
    (2L, "uno dos", "es", "alpha"),
    (3L, "one two", "en", "beta"),
    (4L, "eins zwei drei vier", "de", "beta"),
    (5L, "null lang doc", null.asInstanceOf[String], "beta"))
    .toDF("doc_id", "text", "lang", "source")

  // the drifted mix: es overtakes en in alpha, a NEW source appears
  private def batch2 = Seq(
    (6L, "tres cuatro cinco", "es", "alpha"),
    (7L, "seis siete", "es", "alpha"),
    (8L, "one more english", "en", "beta"),
    (9L, "fresh source doc", "en", "gamma"))
    .toDF("doc_id", "text", "lang", "source")

  private def snap(table: String): Set[(String, String, Long, Long)] =
    spark.sql(s"SELECT source, lang, c, tok FROM $table")
      .as[(String, String, Long, Long)].collect().toSet

  private def batchCounts(df: org.apache.spark.sql.DataFrame) =
    DedupQueries.datacardMixCounts(df)
      .as[(String, String, Long, Long)].collect().toSet

  test("stream counts equal the batch relation on every snapshot, incrementally") {
    val dir = graft.rawdata.Topic.tempDir("stream-datacard")
    batch1.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "64").parquet(dir)
    val q = DatacardStream.mixCounts(stream)
      .writeStream.format("memory").queryName("dcmix")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(snap("dcmix") === batchCounts(batch1),
        "first snapshot diverged from the batch counts relation")

      // online drift: new files land in the ingest dir, the SAME query
      // advances its state — no restart, no rebuild
      batch2.write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(snap("dcmix") === batchCounts(batch1.unionByName(batch2)),
        "post-drift snapshot diverged from the batch aggregation of the union")
    } finally q.stop()
  }

  test("composing a streamed snapshot yields pipe_datacard's mixture columns") {
    val dir = graft.rawdata.Topic.tempDir("stream-datacard-card")
    val all = batch1.unionByName(batch2)
    all.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = DatacardStream.mixCounts(stream)
      .writeStream.format("memory").queryName("dcmix2")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val card = DatacardStream.composeCard(spark.table("dcmix2"))
        .select($"source", $"n_docs", $"n_tokens", $"n_langs", $"top_lang",
          $"top_lang_ppm")
        .as[(String, Long, Long, Long, String, Long)].collect().toSet

      // batch twin over the same corpus dir (pipe_datacard reads
      // documents.parquet; its mixture columns must match field-for-field)
      val cdir = graft.rawdata.Topic.tempDir("stream-datacard-corpus")
      all.withColumn("n_chars", length($"text").cast("long"))
        .write.mode("overwrite").parquet(s"$cdir/documents.parquet")
      val fromBatch = DedupQueries.queries("pipe_datacard")(spark, cdir)
        .select($"source", $"n_docs", $"n_tokens", $"n_langs", $"top_lang",
          $"top_lang_ppm")
        .as[(String, Long, Long, Long, String, Long)].collect().toSet
      assert(card === fromBatch)
      // and the drifted mix is visible: es is alpha's majority now
      assert(card.exists(r => r._1 == "alpha" && r._5 == "es"))
    } finally q.stop()
  }

  test("a foreachBatch keyed-upsert sink in update mode composes the same card") {
    val dir = graft.rawdata.Topic.tempDir("stream-datacard-upsert")
    batch1.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "64").parquet(dir)
    // the documented upsert contract: each update-mode micro-batch emits
    // the CHANGED (source, lang) rows; the sink keeps only the latest
    // version per key (what a Delta MERGE / kv-store upsert would do)
    val store = new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Long)]()
    val q = DatacardStream.mixCounts(stream)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select($"source", $"lang", $"c", $"tok")
          .as[(String, String, Long, Long)].collect()
          .foreach { case (s, l, c, t) => store.put((s, l), (c, t)): Unit }
      }.start()
    try {
      q.processAllAvailable()
      batch2.write.mode("append").parquet(dir)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val snapshot = store.asScala.toSeq
        .map { case ((s, l), (c, t)) => (s, l, c, t) }
        .toDF("source", "lang", "c", "tok")
      // upserted snapshot == the batch counts relation of the full union,
      // and it composes into the identical card
      assert(snapshot.as[(String, String, Long, Long)].collect().toSet ===
        batchCounts(batch1.unionByName(batch2)))
      val card = DatacardStream.composeCard(snapshot)
        .select($"source", $"top_lang").as[(String, String)].collect().toSet
      assert(card.contains(("alpha", "es")))
    } finally q.stop()
  }

  test("a naive append of update-mode batches double-counts — composeCard refuses it") {
    val dir = graft.rawdata.Topic.tempDir("stream-datacard-append")
    batch1.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "64").parquet(dir)
    // the hazard the contract names: appending every update-mode batch
    // verbatim retains the STALE row version of any key updated across
    // micro-batches
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long, Long)]()
    val q = DatacardStream.mixCounts(stream)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select($"source", $"lang", $"c", $"tok")
          .as[(String, String, Long, Long)].collect().foreach(appended.add(_): Unit)
      }.start()
    try {
      q.processAllAvailable()
      batch2.write.mode("append").parquet(dir) // updates (alpha, es), (beta, en)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = appended.asScala.toSeq
      val naive = rows.toDF("source", "lang", "c", "tok")
      // the fixture genuinely produced a stale+fresh pair (not a vacuous
      // pass), and summing it WOULD double-count alpha's docs
      assert(rows.groupBy(r => (r._1, r._2)).exists(_._2.size > 1),
        "fixture failed to update a key across micro-batches")
      val naiveDocs = rows.filter(_._1 == "alpha").map(_._3).sum
      val trueDocs = batchCounts(batch1.unionByName(batch2))
        .filter(_._1 == "alpha").map(_._3).sum
      assert(naiveDocs > trueDocs, "expected the naive append to overcount")
      // the composeCard guard refuses the malformed snapshot loudly
      val e = intercept[IllegalArgumentException](DatacardStream.composeCard(naive))
      assert(e.getMessage.contains("duplicate (source, lang)"))
    } finally q.stop()
  }
}
