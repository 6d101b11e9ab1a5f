package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the skyline / peak-load / active-days / filter-funnel /
  * replay-estimate batch: the skyline is verified against a brute-force
  * dominance check of the whole sf0.001 part table (both directions —
  * soundness and completeness), the peak window is re-counted directly
  * at the reported minute, and the funnel and replay identities are
  * recomputed from their own outputs in exact BigInt math.
  */
class FrontierFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- q61_skyline ------------------------------------------------------

  private def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)

  test("q61_skyline: sound and complete against brute-force dominance per brand") {
    val sky = Relational3.queries("q61_skyline")(spark, sf).collect()
      .map(r => (r.getAs[String]("p_brand"),
        (r.getAs[Long]("price_cents"), r.getAs[Long]("p_size"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = graft.Tables.t(spark, sf, "part")
      .select($"p_brand",
        expr("CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)").as("pc"),
        $"p_size".cast("long").as("sz"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(sky.keySet === all.keySet)
    for ((brand, pts) <- all) {
      val frontier = sky(brand)
      // soundness: no part dominates a skyline member
      for (f <- frontier)
        assert(!pts.exists(p => dominates(p, f)), s"$brand $f dominated")
      // completeness: every non-member is dominated by someone
      for (p <- pts if !frontier.contains(p))
        assert(pts.exists(q => dominates(q, p)), s"$brand $p missing")
    }
  }

  test("q61_skyline: a constructed frontier with duplicates and a dominated bucket straddler") {
    val dir = graft.rawdata.Topic.tempDir("skyline-constructed")
    // prices chosen to straddle the $100 bucket boundary (10000 cents):
    // (99.99, 5) and (100.01, 9) are both on the frontier; (150.00, 9)
    // is dominated cross-bucket; the (99.99, 5) duplicate pair must BOTH
    // survive (neither strictly dominates the other)
    Seq(
      (1L, "B1", 99.99, 5L), (2L, "B1", 99.99, 5L),
      (3L, "B1", 100.01, 9L), (4L, "B1", 150.00, 9L),
      (5L, "B1", 80.00, 2L), (6L, "B1", 90.00, 2L),
      (7L, "B2", 500.00, 1L))
      .toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rows = Relational3.queries("q61_skyline")(spark, dir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[String]("p_brand")))
    assert(rows.toSet === Set((1L, "B1"), (2L, "B1"), (3L, "B1"),
      (5L, "B1"), (7L, "B2")))
  }

  // ---- ev_peak ----------------------------------------------------------

  test("ev_peak: the reported peak is achieved by a direct trailing-hour recount and bounds every minute") {
    val rows = EventQueries.queries("ev_peak")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perMin = graft.Tables.events(spark, sf)
      .groupBy($"event_type", expr("unix_micros(ts) div 60000000").as("m"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val peak = r.getAs[Long]("peak_events")
      val pm = r.getAs[Long]("peak_minute")
      val recount = (pm - 59 to pm).map(m => perMin.getOrElse((t, m), 0L)).sum
      assert(recount === peak, s"$t recount")
      // no single minute exceeds the trailing-hour peak
      val maxMin = perMin.collect { case ((tt, _), n) if tt == t => n }.max
      assert(maxMin <= peak)
      assert(r.getAs[Long]("n_active_minutes") ===
        perMin.keys.count(_._1 == t))
    }
  }

  test("ev_peak: a constructed burst reports the exact peak window and its earliest end-minute") {
    val dir = graft.rawdata.Topic.tempDir("peak-ev-burst")
    // minutes 0, 30, 59 fall in one trailing hour (peak 3 at minute 59);
    // minute 200 is an isolated 1-event window
    Seq(
      (1L, ts("2024-01-01 00:00:30"), 1L, "burst", 1.0, "{}"),
      (2L, ts("2024-01-01 00:30:00"), 2L, "burst", 1.0, "{}"),
      (3L, ts("2024-01-01 00:59:10"), 3L, "burst", 1.0, "{}"),
      (4L, ts("2024-01-01 03:20:00"), 4L, "burst", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventQueries.queries("ev_peak")(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("peak_events") === 3L)
    // timezone-independent: the peak window ends 59 minutes after the
    // first event's minute, whatever epoch that minute maps to
    val m0 = graft.Tables.events(spark, dir)
      .agg(min(expr("unix_micros(ts) div 60000000"))).head().getLong(0)
    assert(r.head.getAs[Long]("peak_minute") === m0 + 59L)
    assert(r.head.getAs[Long]("n_active_minutes") === 4L)
  }

  // ---- ev_active_days ---------------------------------------------------

  test("ev_active_days: count-of-counts conserves users and user-day mass") {
    val rows = EventQueries.queries("ev_active_days")(spark, sf).collect()
    val ud = graft.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(countDistinct(expr("unix_micros(ts) div 86400000000")).as("nd"))
      .collect().map(_.getLong(1))
    assert(rows.map(_.getAs[Long]("n_users")).sum === ud.length.toLong)
    assert(rows.map(r => r.getAs[Long]("n_days") * r.getAs[Long]("n_users")).sum
      === ud.sum)
    assert(rows.forall(_.getAs[Long]("n_days") >= 1L))
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }

  // ---- txt_filter_funnel --------------------------------------------------

  test("txt_filter_funnel: per-rule counts bound the conjunction and conserve the corpus") {
    val rows = TextQueries.queries("txt_filter_funnel")(spark, sf).collect()
    val direct = graft.Tables.t(spark, sf, "documents")
      .groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("source")).toSet === direct.keySet)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      assert(n === direct(r.getAs[String]("source")))
      val per = Seq("n_len", "n_wordlen", "n_stop", "n_ttr", "n_digit")
        .map(r.getAs[Long])
      assert(per.forall(c => c >= 0L && c <= n))
      assert(r.getAs[Long]("n_all") <= per.min)
      assert(r.getAs[Long]("pass_all_ppm") === r.getAs[Long]("n_all") * 1000000L / n)
    }
  }

  test("txt_filter_funnel: constructed docs fail exactly the rule they violate") {
    val dir = graft.rawdata.Topic.tempDir("funnel-docs")
    // 20 tokens, 20 distinct (TTR 1.0), 6 stopwords, mean word length
    // 69/20 = 3.45 in [3, 8], no digits — passes all five rules
    val good = ("the a of and to in " +
      Seq.tabulate(14)(i => s"wd${('a' + i).toChar}x").mkString(" "))
    val short = "the fox"                                          // fails f_len only
    val noStop = Seq.tabulate(20)(i => s"word$i").mkString(" ")    // fails f_stop
    val repeat = ("the " * 20).trim                                // TTR 1/20 fails f_ttr
    Seq((1L, good, "en", "sA"), (2L, short, "en", "sA"),
      (3L, noStop, "en", "sB"), (4L, repeat, "en", "sB"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.queries("txt_filter_funnel")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("sA").getAs[Long]("n_len") === 1L)     // short fails length
    assert(rows("sA").getAs[Long]("n_stop") === 2L)    // both have stopwords
    assert(rows("sA").getAs[Long]("n_all") === 1L)
    assert(rows("sB").getAs[Long]("n_stop") === 1L)    // noStop fails
    assert(rows("sB").getAs[Long]("n_ttr") === 1L)     // repeat fails
    assert(rows("sB").getAs[Long]("n_all") === 0L)
  }

  // ---- rd_replay ----------------------------------------------------------

  test("rd_replay: agrees with rd_backlog and its ETA is the exact BigInt identity") {
    val replay = graft.rawdata.RawdataQueries.queries("rd_replay")(spark, sf)
      .collect().map(r => r.getAs[String]("ordering_group") -> r).toMap
    val backlog = graft.rawdata.RawdataQueries.queries("rd_backlog")(spark, sf)
      .collect().map(r => r.getAs[String]("ordering_group") -> r).toMap
    assert(replay.keySet === backlog.keySet)
    for ((g, r) <- replay) {
      assert(r.getAs[Long]("n_total") === backlog(g).getAs[Long]("n_total"))
      assert(r.getAs[Long]("n_pending") === backlog(g).getAs[Long]("n_pending"))
      val (tot, pend, span) = (r.getAs[Long]("n_total"),
        r.getAs[Long]("n_pending"), r.getAs[Long]("span_ms"))
      val eta = if (span > 0)
        (BigInt(pend) * span * 1000 / (BigInt(tot) * 3600000)).toLong else 0L
      val rate = if (span > 0)
        (BigInt(tot) * 3600000 * 1000 / BigInt(span)).toLong else 0L
      assert(r.getAs[Long]("eta_milli_hours") === eta)
      assert(r.getAs[Long]("rate_per_hour_milli") === rate)
    }
  }
}
