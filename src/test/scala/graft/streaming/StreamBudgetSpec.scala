package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.SamplingQueries

/** The streaming token-budget gate must admit EXACTLY the documents the
  * batch samp_token_budget selector keeps when the stream is replayed in
  * one micro-batch (the gate restores the deterministic (hash, doc_id)
  * admission order within a batch), and must respect the budget law —
  * every admitted doc started strictly below the budget — in any run.
  */
class StreamBudgetSpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 4000L // samp_token_budget's per-source budget

  test("one-batch replay admits exactly the batch samp_token_budget selection") {
    val dir = graft.rawdata.Topic.tempDir("stream-budget")
    val docs = Tables.t(spark, sf, "documents")
    docs.select($"source", $"doc_id", $"text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val q = BudgetStream.admitted(BudgetStream.fromDocs(stream), Budget)
      .writeStream.format("memory").queryName("budgeted").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT source, docId, nTok FROM budgeted")
        .as[(String, Long, Long)].collect().toSet
      val batch = SamplingQueries.queries("samp_token_budget")(spark, sf)
        .as[(String, Long, Long)].collect().toSet
      assert(streamed === batch, "stream gate and batch selector disagreed")
      assert(streamed.nonEmpty)
      // budget law: every admitted doc started strictly below the budget
      val admits = spark.sql("SELECT source, nTok, cumBefore FROM budgeted")
        .as[(String, Long, Long)].collect()
      assert(admits.forall(_._3 < Budget))
    } finally q.stop()
  }

  test("the gate stays closed across micro-batches once a source's budget is spent") {
    val dir = graft.rawdata.Topic.tempDir("stream-budget-2")
    val docs = Tables.t(spark, sf, "documents")
      .select($"source", $"doc_id", $"text")
    // two single-file appends → maxFilesPerTrigger=1 makes two micro-batches
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val q = BudgetStream.admitted(BudgetStream.fromDocs(stream), Budget)
      .writeStream.format("memory").queryName("budgeted2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val admits = spark.sql("SELECT source, docId, nTok, cumBefore FROM budgeted2")
        .as[(String, Long, Long, Long)].collect()
      assert(admits.nonEmpty)
      // each admitted doc saw a running total strictly below the budget,
      // and per source the admitted rows carry strictly increasing
      // cumBefore (the state never resets between micro-batches)
      assert(admits.forall(_._4 < Budget))
      admits.groupBy(_._1).values.foreach { rows =>
        val cums = rows.map(_._4).sorted
        assert(cums.distinct.length === cums.length, "running totals must advance")
      }
      // no doc admitted twice
      assert(admits.map(r => (r._1, r._2)).distinct.length === admits.length)
    } finally q.stop()
  }
}
