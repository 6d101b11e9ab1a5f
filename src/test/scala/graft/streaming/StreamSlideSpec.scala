package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.CurationQueries

/** The streaming sliding-window gate must produce window verdicts
  * identical to the shared batch window builder + store join over the
  * same rows — and it must catch an offset-shifted duplicated block
  * arriving on the stream (the dd_slide property, online).
  */
class StreamSlideSpec extends SparkSpec {
  import spark.implicits._

  test("stream window verdicts are identical to the batch join; shifted block caught online") {
    val dir = graft.rawdata.Topic.tempDir("stream-slide")
    val docs = Tables.t(spark, sf, "documents")
    val corpus = docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
    // the stream: the odd docs PLUS a synthetic arrival that embeds a
    // 40-token block copied from corpus doc 0 at a +7-token offset
    val block = corpus
      .filter(size(split($"text", " +")) >= 40)
      .orderBy($"doc_id").limit(1)
      .select(expr(s"concat_ws(' ', slice(split(text, ' +'), 1, 40))"))
      .as[String].head()
    val shifted = ((0 until 7).map(i => s"zz$i") :+ block).mkString(" ")
    docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text")
      .unionByName(Seq((1000001L, shifted)).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val (flags, caches) = SlideStream.windowFlagsScoped(stream, corpus)
    val q = flags.writeStream.format("memory").queryName("slideflags")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, win_idx, h, known FROM slideflags")
        .as[(Long, Long, String, Long)].collect()
      assert(streamed.nonEmpty)

      // batch twin over the same rows
      val store = CurationQueries.slideWindows(corpus).select($"h").distinct()
        .as[String].collect().toSet
      val batch = CurationQueries.slideWindows(spark.read.parquet(dir))
        .as[(Long, Long, String)].collect()
        .map { case (id, w, h) => (id, w, h, if (store(h)) 1L else 0L) }
      assert(streamed.toSeq.sorted === batch.toSeq.sorted)

      // the shifted arrival's block windows are flagged known even
      // though no grid alignment exists (offset 7): a 40-token block at
      // offset 7 contributes 9 interior known windows starting at
      // win_idx 7 of the 47-token doc... (doc = 7 filler + 40 block =
      // 47 tokens → windows 0..15; those fully inside the block are
      // idx 7..15)
      val arrival = streamed.filter(_._1 == 1000001L)
      assert(arrival.nonEmpty)
      val known = arrival.filter(_._4 == 1L).map(_._2).sorted
      assert(known.toSeq === (7L to 15L),
        s"shifted block windows not caught online: $known")
      // and both verdicts occur overall
      assert(streamed.exists(_._4 == 0L))
    } finally {
      q.stop()
      caches.close()
    }
  }
}
