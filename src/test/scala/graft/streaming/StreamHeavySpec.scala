package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming Misra-Gries gate must uphold the summary laws per
  * source across micro-batches: exact totals, bounded candidate sets,
  * completeness for every token above total/(cap+1), and lower bounds
  * within total/(cap+1) of the truth.
  */
class StreamHeavySpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 64

  test("per-source MG state across micro-batches upholds the summary laws") {
    val dir = graft.rawdata.Topic.tempDir("stream-heavy")
    val docs = Tables.t(spark, sf, "documents").select($"source", $"doc_id", $"text")
    // two single-file appends → two micro-batches with maxFilesPerTrigger=1
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val q = HeavyStream.candidates(HeavyStream.fromDocs(stream), Cap)
      .writeStream.format("memory").queryName("heavycand").outputMode("append").start()
    try {
      q.processAllAvailable()
      val all = spark.sql("SELECT source, tok, lower, total FROM heavycand")
        .as[(String, String, Long, Long)].collect()
      assert(all.nonEmpty)
      // final emission per source = the rows carrying its max total
      val fin = all.groupBy(_._1).map { case (src, rows) =>
        val tmax = rows.map(_._4).max
        src -> rows.filter(_._4 == tmax)
      }
      val truth = docs.select($"source", explode(split($"text", " +")).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap

      fin.foreach { case (src, rows) =>
        val n = truth(src).values.sum
        assert(rows.head._4 === n, s"$src total not exact")
        assert(rows.length <= Cap, s"$src summary exceeds cap")
        val kept = rows.map(_._2).toSet
        val bound = n / (Cap + 1)
        truth(src).foreach { case (tok, c) =>
          if (c > bound) assert(kept.contains(tok), s"$src lost heavy token $tok")
        }
        rows.foreach { case (_, tok, lo, _) =>
          val t = truth(src).getOrElse(tok, 0L)
          assert(lo <= t && t - lo <= bound, s"$src $tok lower bound violated")
        }
      }
    } finally q.stop()
  }
}
