package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming HLL gate must produce EXACTLY the batch estimate on the
  * same rows (shared md5 recipe, deterministic registers), and its state
  * must obey the sketch merge law (register-wise max = union sketch).
  */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming HLL estimate on a drained stream equals the batch estimate") {
    val docs = Tables.t(spark, sf, "documents")
      .select($"lang", $"doc_id")
    // batch truth
    val batch = SketchStream.hllDistinct(docs, "lang", "doc_id")
      .as[(String, Long)].collect().toMap
    // the same rows as a file-source stream, landed in two parquet
    // batches so the registers update incrementally across micro-batches
    val dir = graft.rawdata.Topic.tempDir("hll-stream")
    val rows = docs.as[(String, Long)].collect()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    h1.toSeq.toDF("lang", "doc_id").write.mode("append").parquet(dir)
    val schema = docs.schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = SketchStream.hllDistinct(stream, "lang", "doc_id")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      h2.toSeq.toDF("lang", "doc_id").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT g, hll_est FROM hll_stream")
        .as[(String, Long)].collect().toMap
      assert(streamed === batch)
      // sanity: the estimate is in the m=64 error envelope of the truth
      val exact = docs.groupBy($"lang").agg(countDistinct($"doc_id").as("n"))
        .as[(String, Long)].collect().toMap
      for ((g, est) <- streamed) {
        val n = exact(g)
        assert(math.abs(est - n).toDouble / n <= 0.4,
          s"$g: est $est vs exact $n")
      }
    } finally q.stop()
  }

  test("register merge law: union sketch = register-wise max of parts") {
    val docs = Tables.t(spark, sf, "documents").select($"lang", $"doc_id")
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val whole = SketchStream.hllRegisters(docs, "lang", "doc_id")
    val ra = SketchStream.hllRegisters(a, "lang", "doc_id")
    val rb = SketchStream.hllRegisters(b, "lang", "doc_id")
    val merged = ra.unionByName(rb)
      .groupBy($"g")
      .agg(max($"r0").as("r0"), (1 until 64).map(i => max(col(s"r$i")).as(s"r$i")): _*)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }
}
