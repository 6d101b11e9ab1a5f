package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Streaming vector-similarity gate — dd_embed_lsh's stream twin: each
  * ARRIVING embedding is checked against the existing corpus's
  * hyperplane-LSH index and flagged with every corpus vector whose exact
  * quantized cosine clears the threshold. The embed-and-check-on-arrival
  * step of an ingest pipeline (near-dup refusal, similarity alerting)
  * without re-running the corpus-wide batch join.
  *
  * Scale shape: the streaming side is entirely NARROW and stateless —
  * quantization and the banding signature are per-row expressions (the
  * native HyperplaneBands codegen expression needs no aggregation), and
  * the multi-probe explode emits tables·(bits+1) rows per arrival.
  * Candidates come from a stream-static equi join against the persisted
  * corpus band table; verification is a second stream-static join to the
  * corpus vectors plus a per-row exact integer dot product. The only
  * stateful operator is the final watermark-bounded pair dedup (a pair
  * colliding in several probe tables would otherwise flag repeatedly).
  * The scoped overload hands back the [[GateCaches]] owning the
  * persisted corpus index relations — close it when the gate stops (the
  * plain overload leaves the scope to the caller's clearCache).
  */
object VectorStream {

  private val Tables = 10
  private val Bits = 8

  /** `arrivals`: streaming with (vec_id, embedding, ts). `corpus`:
    * static with (vec_id, embedding). Returns (vec_id, ts, match_vec,
    * cos_ppm) for every corpus vector above `thresholdPpm`.
    */
  def simFlags(arrivals: DataFrame, corpus: DataFrame,
      thresholdPpm: Long = 350000, watermark: String = "1 hour"): DataFrame =
    simFlagsScoped(arrivals, corpus, thresholdPpm, watermark)._1

  def simFlagsScoped(arrivals: DataFrame, corpus: DataFrame,
      thresholdPpm: Long = 350000, watermark: String = "1 hour"): (DataFrame, GateCaches) = {
    import corpus.sparkSession.implicits._
    val e = VectorOps.withHyperplaneBands(
      VectorOps.quantize(corpus).select($"vec_id", $"q", $"nn"), Tables, Bits).persist()
    // corpus side: exact band per table
    val bands = e.select($"vec_id".as("match_vec"), explode(expr(
      s"transform(sequence(0, ${Tables - 1}), t -> " +
        "named_struct('tbl', t, 'bits', bands[t]))")).as("bb"))
      .select($"match_vec", $"bb.tbl".as("tbl"), $"bb.bits".as("bits"))
      .persist()
    // stream side: own band + its one-bit flips per table (multi-probe)
    val probes = VectorOps.withHyperplaneBands(
      VectorOps.quantize(arrivals)
        .select($"vec_id", $"ts", $"q", $"nn"), Tables, Bits)
      .select($"vec_id", $"ts", $"q".as("qa"), $"nn".as("na"), explode(expr(
        s"""flatten(transform(sequence(0, ${Tables - 1}), t ->
           |  transform(sequence(-1, ${Bits - 1}), k -> named_struct('tbl', t, 'bits',
           |    CASE WHEN k = -1 THEN bands[t]
           |         ELSE bands[t] ^ shiftleft(1L, k) END))))""".stripMargin)).as("bb"))
      .select($"vec_id", $"ts", $"qa", $"na", $"bb.tbl".as("tbl"), $"bb.bits".as("bits"))
    val flagged = probes.join(bands, Seq("tbl", "bits"))
      .filter($"vec_id" =!= $"match_vec")
      .join(e.select($"vec_id".as("match_vec"), $"q".as("qb"), $"nn".as("nb")), Seq("match_vec"))
      .withColumn("dot", VectorOps.dotCol(col("qa"), col("qb")))
      .withColumn("cos_ppm",
        floor($"dot" / (sqrt($"na") * sqrt($"nb")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .filter($"cos_ppm" >= thresholdPpm)
    // pair dedup: multi-table probe collisions flag a pair repeatedly;
    // cos_ppm and ts are functions of the pair, so which duplicate
    // survives is immaterial. Streaming needs the watermark-bounded
    // form; the same gate evaluated over a batch left side (the spec's
    // truth path) uses plain dropDuplicates — identical semantics.
    val deduped =
      if (arrivals.isStreaming)
        flagged.withWatermark("ts", watermark)
          .dropDuplicatesWithinWatermark("vec_id", "match_vec")
      else flagged.dropDuplicates("vec_id", "match_vec")
    (deduped.select($"vec_id", $"ts", $"match_vec", $"cos_ppm"),
      new GateCaches(Seq(e, bands)))
  }
}
