package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the round-12 event/dedup spectrum
  * operators (ev_new_vs_returning / ev_day_gaps / ev_dow_hour_heat /
  * dd_fp_sizes) — the sf fixtures exercise them broadly (sweep + oracle)
  * but contain no interesting dup-group spectrum, so the band arithmetic
  * and the new/returning split are pinned on planted data.
  */
class Round12Laws3Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val evDir: String = {
    val d = graft.rawdata.Topic.tempDir("r12-ev")
    // user 10 active on epoch days d0, d0+1, d0+3; user 20 on d0+1 only
    Seq(
      (1L, ts("2024-01-06 08:00:00"), 10L, "view", 1.0, "{}"),
      (2L, ts("2024-01-06 09:00:00"), 10L, "click", 1.0, "{}"),
      (3L, ts("2024-01-07 10:00:00"), 10L, "view", 1.0, "{}"),
      (4L, ts("2024-01-09 11:00:00"), 10L, "view", 1.0, "{}"),
      (5L, ts("2024-01-07 23:00:00"), 20L, "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("ev_new_vs_returning: first-seen day splits exactly") {
    val day0 = (Timestamp.valueOf("2024-01-06 00:00:00").getTime / 86400000L)
    val rows = EventQueries.queries("ev_new_vs_returning")(spark, evDir).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_returning"), r.getAs[Long]("new_ppm"))))
      .toMap
    assert(rows === Map(
      day0 -> ((1L, 1L, 0L, 1000000L)),        // user 10 first seen
      (day0 + 1) -> ((2L, 1L, 1L, 500000L)),   // user 20 new, user 10 back
      (day0 + 3) -> ((1L, 0L, 1L, 0L))))       // user 10 returning only
  }

  test("ev_day_gaps: per-user active-day lags histogram exactly") {
    val rows = EventQueries.queries("ev_day_gaps")(spark, evDir).collect()
      .map(r => r.getAs[Long]("gap_days") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("share_ppm")))).toMap
    // user 10 gaps: 1 (d0→d1) and 2 (d1→d3); user 20 has no gap
    assert(rows === Map(1L -> ((1L, 500000L)), 2L -> ((1L, 500000L))))
  }

  test("ev_dow_hour_heat: planted events land in their exact (dow, hour) cells") {
    val rows = EventQueries.queries("ev_dow_hour_heat")(spark, evDir).collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hod")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("share_ppm")))).toMap
    // 2024-01-06 = Saturday (dow 5), 01-07 = Sunday (6), 01-09 = Tuesday (1)
    assert(rows === Map(
      (5L, 8L) -> ((1L, 200000L)), (5L, 9L) -> ((1L, 200000L)),
      (6L, 10L) -> ((1L, 200000L)), (6L, 23L) -> ((1L, 200000L)),
      (1L, 11L) -> ((1L, 200000L))))
  }

  test("dd_fp_sizes: planted dup groups band by floor-log2 with exact pair mass") {
    val d = graft.rawdata.Topic.tempDir("r12-fp-sizes")
    // G1: 6 normalized-equal docs (band 2), G2: 2 (band 1), 1 unique (band 0)
    (Seq(
      (1L, "The  Quick fox"), (2L, "the quick FOX"), (3L, " the QUICK fox "),
      (4L, "the quick fox"), (5L, "THE QUICK FOX"), (6L, "the\tquick   fox"),
      (7L, "Hello World"), (8L, "hello  world"),
      (9L, "only one of me"))
      .map { case (id, tx) => (id, tx, "en", "src") })
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = DedupQueries.queries("dd_fp_sizes")(spark, d).collect()
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("doc_share_ppm"))))
      .toMap
    assert(rows === Map(
      0L -> ((1L, 1L, 0L, 111111L)),
      1L -> ((1L, 2L, 1L, 222222L)),
      2L -> ((1L, 6L, 15L, 666666L))))
  }

  test("samp_split_leak: planted cross-split dups count the exact leak pairs") {
    val d = graft.rawdata.Topic.tempDir("r12-split-leak")
    // split assignment is md5('split:<id>') — ids chosen so group G
    // ("quick fox" norms) lands train×2 (1, 4), val×1 (6), test×1 (2)
    // and group H ("hello world" norms) lands train (5) + test (3);
    // doc 7 is unique
    (Seq(
      (1L, "The  Quick fox"), (4L, "the quick fox"), (6L, "THE QUICK FOX"),
      (2L, "the quick FOX"),
      (5L, "Hello World"), (3L, "hello  world"),
      (7L, "nothing like me"))
      .map { case (id, tx) => (id, tx, "en", "src") })
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SamplingQueries.queries("samp_split_leak")(spark, d).collect()
      .map(r => (r.getAs[String]("split_lo"), r.getAs[String]("split_hi")) ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_pairs")))).toMap
    assert(rows === Map(
      ("test", "train") -> ((2L, 3L)),  // G: 1·2 + H: 1·1
      ("test", "val") -> ((1L, 1L)),
      ("train", "val") -> ((1L, 2L))))
  }

  test("ev_type_trend: planted weekly counts fit their exact integer slopes") {
    val d = graft.rawdata.Topic.tempDir("r12-trend")
    // 2024-01-04 / 11 / 18 are consecutive Thursdays — three distinct
    // epoch weeks with no boundary risk at noon
    val wk = Seq("2024-01-04 12:00:00", "2024-01-11 12:00:00", "2024-01-18 12:00:00")
    val evs = Seq.newBuilder[(Long, Timestamp, Long, String, Double, String)]
    var id = 0L
    def add(week: Int, tp: String, n: Int): Unit =
      (1 to n).foreach { _ => id += 1; evs += ((id, ts(wk(week)), 10L, tp, 1.0, "{}")) }
    add(0, "up", 1); add(1, "up", 2); add(2, "up", 3)     // +1/week -> 1000 milli
    add(0, "flat", 2); add(1, "flat", 2)                  // 0 milli
    add(1, "solo", 3)                                     // one week -> NULL
    evs.result().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventQueries.queries("ev_type_trend")(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_weeks"), r.getAs[Long]("n_events"),
          Option(r.getAs[java.lang.Long]("slope_milli")).map(_.longValue())))).toMap
    assert(rows === Map(
      "up" -> ((3L, 6L, Some(1000L))),
      "flat" -> ((2L, 4L, Some(0L))),
      "solo" -> ((1L, 3L, None))))
  }

  test("samp_epoch_plan: full epochs + ppm remainder hit the uniform target exactly") {
    val d = graft.rawdata.Topic.tempDir("r12-epoch")
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    (Seq((1L, ten, "en", "A")) ++ (2 to 4).map(i => (i.toLong, ten, "en", "B")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SamplingQueries.queries("samp_epoch_plan")(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("full_epochs"), r.getAs[Long]("rem_ppm")))).toMap
    // tt = 40, 2 sources -> target 20: A (10 tok) = 2 full epochs;
    // B (30 tok) = 0 full + 20/30 = 666666 ppm remainder
    assert(rows === Map(
      "A" -> ((10L, 20L, 2L, 0L)),
      "B" -> ((30L, 20L, 0L, 666666L))))
  }
}
