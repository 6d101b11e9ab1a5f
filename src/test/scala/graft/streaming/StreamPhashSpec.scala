package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The streaming phash gate's row-local signature must be bit-identical
  * to the batch grouped-aggregation signature, and its flags must equal
  * the batch banded-hamming join restricted to stream-vs-corpus pairs.
  */
class StreamPhashSpec extends SparkSpec {
  import spark.implicits._

  /** the batch operator's signature recipe (grouped ±1 bit sums) */
  private def batchSigs(p: org.apache.spark.sql.DataFrame) = {
    val grams = p.select($"position",
        explode(expr(
          "if(length(txt) < 4, array(), transform(sequence(1, length(txt) - 3), i -> substring(txt, i, 4)))")).as("g"))
      .withColumn("v", conv(substring(md5($"g"), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright($"v", b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$b")
    }
    val sigExpr = (0 until 32).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    grams.groupBy($"position").agg(bitSums.head, bitSums.tail: _*)
      .select($"position", sigExpr.as("phash"))
  }

  private def assets = Tables.events(spark, sf)
    .filter($"event_id" < 300)
    .select(concat(lit("evt-"), $"event_id").as("position"), $"ts",
      $"props".as("txt"))

  test("stream flags equal the batch banded-hamming join vs the corpus") {
    val dir = graft.rawdata.Topic.tempDir("stream-phash")
    // corpus = even events' props; stream = odd events' props
    val corpus = assets.filter(expr("CAST(substring(position, 5) AS BIGINT) % 2 = 0"))
      .select($"position", $"txt")
    assets.filter(expr("CAST(substring(position, 5) AS BIGINT) % 2 = 1"))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val (flags, caches) = PhashStream.flagsScoped(stream, corpus)
    val q = flags.writeStream.format("memory").queryName("phashflags")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT position, match_pos, hamming FROM phashflags")
        .as[(String, String, Long)].collect().toSet

      // batch twin: row-local sigs must equal grouped sigs, then the
      // same banded join restricted to stream-vs-corpus pairs
      val sigsAll = batchSigs(assets.select($"position", $"txt").filter(length($"txt") >= 4))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def eid(p: String) = p.drop(4).toLong
      val expect = for {
        (pa, ha) <- sigsAll.toSeq if eid(pa) % 2 == 1
        (pb, hb) <- sigsAll.toSeq if eid(pb) % 2 == 0
        if pa != pb
        band <- 0 until 4
        if ((ha >> (band * 8)) & 255) == ((hb >> (band * 8)) & 255)
        h = java.lang.Long.bitCount(ha ^ hb).toLong if h <= 3
      } yield (pa, pb, h)
      assert(streamed === expect.toSet)
      assert(streamed.nonEmpty, "gate found no near-dups — fixture degenerate")
    } finally {
      q.stop()
      caches.close()
    }
  }
}
