package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming IVF serving gate must answer exactly what the batch
  * ann_ivf_index probe answers for the same query vectors.
  */
class StreamIvfServeSpec extends SparkSpec {
  import spark.implicits._

  test("served top-k is row-identical to the batch index probe") {
    val dir = graft.rawdata.Topic.tempDir("stream-ivfserve")
    // arrivals = the batch operator's own query set (vec_id < 5)
    Tables.t(spark, sf, "embeddings")
      .filter($"vec_id" < 5)
      .select($"vec_id", $"embedding")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = graft.operators.VectorOps.quantize(
        spark.readStream.schema(schema).parquet(dir))
      .select($"vec_id", $"q", $"nn")

    val q = IvfServeStream.topk(stream, sf)
      .writeStream.format("memory").queryName("ivfserve").outputMode("append").start()
    try {
      q.processAllAvailable()
      val served = spark.sql("SELECT qid, rnk, cid, cosPpm FROM ivfserve")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = graft.SparkEntry.queries("ann_ivf_index")(spark, sf)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(served === batch)
      assert(served.nonEmpty)
    } finally q.stop()
  }
}
