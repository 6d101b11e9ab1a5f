package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming perceptual-hash near-dup gate — mm_phash_pairs' streaming
  * twin: each arriving binary payload is phashed AS IT LANDS and probed
  * against the static corpus phash index, so an asset-ingest pipeline
  * flags visual near-duplicates before storing the payload.
  *
  * The phash here is computed ROW-LOCALLY (bit b set iff more than half
  * the row's 4-gram hashes have bit b set — exactly the batch
  * operator's sum(±1) > 0 rule, which is order-independent, so the two
  * forms are bit-identical; StreamPhashSpec asserts it per asset).
  * Row-locality is what makes the gate STATELESS apart from the
  * watermark-bounded pair dedup: the batch side computes the same
  * signature via a grouped aggregation, but a streaming groupBy would
  * be stateful — the same trade the winnowing gate documents. The gram
  * hash array is materialized once per row and shared by all 32 bit
  * tests. The probe is a stream-static equi join on the (band, 8-bit)
  * key — 4 probes multiplying the tiny arrival side, never the corpus —
  * with an exact hamming ≤ 3 verify on the joined 32-bit signatures.
  */
object PhashStream {

  /** (position[, ts], band, bits, phash) banded rows of a
    * (position[, ts], txt) relation — shared shape for the static index
    * and the arrival side. The signature is the native single-pass
    * phash32 kernel (row-local, codegen'd — what keeps the gate
    * stateless AND off the interpreted HOF path).
    */
  private def banded(p: DataFrame, carry: Seq[String]): DataFrame = {
    import p.sparkSession.implicits._
    val cols = carry.map(col) ++ Seq($"phash", $"bb.band".as("band"), $"bb.bits".as("bits"))
    p.filter(length($"txt") >= 4)
      .withColumn("phash",
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.functions.Phash32(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("txt")))))
      .select(carry.map(col) :+ $"phash" :+
        explode(expr(
          "transform(sequence(0, 3), b -> named_struct('band', b, 'bits', (phash >> (b * 8)) & 255))")).as("bb"): _*)
      .select(cols: _*)
  }

  /** near-dup flags. `assets`: streaming (position, ts, txt). `corpus`:
    * static (position, txt). Returns (position, ts, match_pos, hamming).
    */
  def flags(assets: DataFrame, corpus: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    flagsScoped(assets, corpus, watermark)._1

  def flagsScoped(assets: DataFrame, corpus: DataFrame,
      watermark: String = "1 hour"): (DataFrame, GateCaches) = {
    import corpus.sparkSession.implicits._
    val idx = banded(corpus, Seq("position"))
      .withColumnRenamed("position", "match_pos")
      .withColumnRenamed("phash", "match_phash")
      .persist()
    val out = banded(assets, Seq("position", "ts"))
      .join(idx, Seq("band", "bits"))
      .filter($"position" =!= $"match_pos")
      .withColumn("hamming",
        bit_count($"phash".bitwiseXOR($"match_phash")).cast("long"))
      .filter($"hamming" <= 3)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("position", "match_pos")
      .select($"position", $"ts", $"match_pos", $"hamming")
    (out, new GateCaches(Seq(idx)))
  }
}
