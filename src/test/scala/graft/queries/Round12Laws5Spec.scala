package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture laws for the round-12 operators whose oracle rows,
  * while non-vacuous, exercise no interesting structure on the sf
  * fixtures: hubness on a fully-connected knn graph, topic group
  * spread, payload-size drift, source vocabulary overlap, the peak
  * capacity factor, and the lateral top-k (including the empty-nation
  * drop).
  */
class Round12Laws5Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("emb_hubness: six same-direction vectors form a complete knn graph (indeg 5 each)") {
    val d = graft.rawdata.Topic.tempDir("r12-hubness")
    // same direction, different magnitudes — cosine ties at 10⁶, LSH
    // puts identical signatures in one bucket, every vector's top-5 is
    // all five others; scale invariance rides along for free
    (0 to 5).map(i => (i.toLong, Array.tabulate(64)(j => ((j % 7) + 1).toFloat * (i + 1)), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val rows = AnnQueries.queries("emb_hubness")(spark, d).collect()
      .map(r => r.getAs[Long]("indeg") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("share_ppm")))).toMap
    assert(rows === Map(5L -> ((6L, 1000000L))))
  }

  private lazy val evDir: String = {
    val d = graft.rawdata.Topic.tempDir("r12-spread")
    Seq(
      // "error": one instant -> 1 daily file, span 1, fill 10⁶
      (1L, ts("2024-01-06 12:00:00"), 10L, "error", 0.0, """{"k": 1}"""),
      (2L, ts("2024-01-06 12:00:00"), 20L, "error", 0.0, """{"k": 22}"""),
      // "view": days d and d+2 -> 2 files over a 3-day span, fill 666666
      (3L, ts("2024-01-06 08:00:00"), 10L, "view", 1.0, """{"k": 333}"""),
      (4L, ts("2024-01-08 09:00:00"), 20L, "view", 1.0, """{"k": 4444}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("rd_group_spread: daily-file locality counts and fill ppm are exact") {
    val rows = graft.rawdata.RawdataQueries.queries("rd_group_spread")(spark, evDir)
      .collect()
      .map(r => r.getAs[String]("ordering_group") ->
        ((r.getAs[Long]("n_msgs"), r.getAs[Long]("n_files"),
          r.getAs[Long]("span_days"), r.getAs[Long]("fill_ppm")))).toMap
    assert(rows === Map(
      "error" -> ((2L, 1L, 1L, 1000000L)),
      "view" -> ((2L, 2L, 3L, 666666L))))
  }

  test("mm_size_drift: per-day mean size vs the key mean cross-multiplies exactly") {
    val rows = MultimodalQueries.queries("mm_size_drift")(spark, evDir).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("key")) ->
        ((r.getAs[Long]("day_n"), r.getAs[Long]("day_bytes"),
          r.getAs[Long]("drift_milli")))).toMap
    val d0 = Timestamp.valueOf("2024-01-06 00:00:00").getTime / 86400000L
    // props lens 8,9 | 10,13: wait — day 06 has events 1,2,3 (props 8,9,10)
    // and day 08 has event 4 (props 13 chars: {"k": 4444} is 11)
    // -> recompute below from the planted strings
    val p = Map(1L -> """{"k": 1}""", 2L -> """{"k": 22}""", 3L -> """{"k": 333}""", 4L -> """{"k": 4444}""")
    val dayAprops = p(1L).length + p(2L).length + p(3L).length
    val dayBprops = p(4L).length
    val keyProps = dayAprops + dayBprops
    assert(rows((d0, "props")) ===
      ((3L, dayAprops.toLong, (dayAprops.toLong * 4 * 1000) / (3 * keyProps))))
    assert(rows((d0 + 2, "props")) ===
      ((1L, dayBprops.toLong, (dayBprops.toLong * 4 * 1000) / (1 * keyProps))))
    // user payloads: "10","20","10","20" — uniform 2 chars, drift exactly 1000
    assert(rows((d0, "user"))._3 === 1000L)
    assert(rows((d0 + 2, "user"))._3 === 1000L)
  }

  test("txt_src_overlap: hand-computed vocabulary Jaccards incl. the zero-overlap pair") {
    val d = graft.rawdata.Topic.tempDir("r12-srcoverlap")
    Seq(
      (1L, "a b c", "en", "A"), (2L, "b c d", "en", "B"), (3L, "x", "en", "C"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextQueries.queries("txt_src_overlap")(spark, d).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_ppm")))).toMap
    assert(rows === Map(
      ("A", "B") -> ((2L, 500000L)),  // {b,c} of {a,b,c,d}
      ("A", "C") -> ((0L, 0L)),
      ("B", "C") -> ((0L, 0L))))
  }

  test("ev_peak_factor: planted hourly counts give the exact peak factor and duty cycle") {
    val d = graft.rawdata.Topic.tempDir("r12-peakfactor")
    Seq(
      (1L, ts("2024-01-06 08:10:00"), 10L, "view", 1.0, "{}"),
      (2L, ts("2024-01-06 08:40:00"), 20L, "view", 1.0, "{}"),
      (3L, ts("2024-01-06 09:30:00"), 10L, "view", 1.0, "{}"),
      (4L, ts("2024-01-06 11:30:00"), 20L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = EventQueries.queries("ev_peak_factor")(spark, d).collect()
    assert(r.length === 1)
    // hours 8,9,11: counts 2,1,1 -> span 4, active 3, peak 2:
    // factor = 2·1000·4 div 4 = 2000 milli, duty = 750000 ppm
    assert(r.head.getAs[Long]("span_hours") === 4L)
    assert(r.head.getAs[Long]("n_active_hours") === 3L)
    assert(r.head.getAs[Long]("peak_hour_n") === 2L)
    assert(r.head.getAs[Long]("peak_factor_milli") === 2000L)
    assert(r.head.getAs[Long]("duty_ppm") === 750000L)
  }

  test("q82_lateral_topk: per-nation top-2 with tie-break; empty nations drop") {
    val d = graft.rawdata.Topic.tempDir("r12-lateral")
    Seq((0, "ALFA", 0), (1, "BRAVO", 0), (2, "EMPTY", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq(
      (1L, "c1", 0, 50.0, "BUILDING"), (2L, "c2", 0, 90.0, "BUILDING"),
      (3L, "c3", 0, 90.0, "BUILDING"), // ties with c2 -> lower custkey wins
      (4L, "c4", 1, 10.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val rows = Relational3.queries("q82_lateral_topk")(spark, d).collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("c_custkey")))
    assert(rows.toSeq === Seq(
      ("ALFA", 2L), ("ALFA", 3L), // 90.0 tie -> custkey order, c1 (50) cut
      ("BRAVO", 4L)))             // EMPTY nation emits nothing
  }
}
