package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the round-9 tail batch (rd_rate_hist / ev_session_hist /
  * ev_moments / txt_word_len_hist): conservation identities against
  * independently-computed totals on the real sf corpus, plus constructed
  * streams (constant, symmetric, single-user two-session) where the
  * exact answer is forced.
  */
class RateSessionMomentSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- rd_rate_hist ---------------------------------------------------

  test("rd_rate_hist: hourly counts conserve the topic total; group counts bounded by the topic's keyspace") {
    val rows = graft.rawdata.RawdataQueries.queries("rd_rate_hist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_messages")).sum === total)
    val hours = rows.map(_.getAs[Long]("hour"))
    assert(hours.zip(hours.tail).forall { case (a, b) => a < b })
    val maxGroups = rows.map(_.getAs[Long]("n_groups")).max
    rows.foreach { r =>
      assert(r.getAs[Long]("n_groups") >= 1L)
      // no hour can see more groups than messages
      assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_messages"))
    }
    assert(maxGroups >= 1L)
  }

  // ---- ev_session_hist --------------------------------------------------

  private lazy val sessionHist =
    EventQueries.queries("ev_session_hist")(spark, sf).collect()

  test("ev_session_hist: buckets partition the (user, session) space ev_session counts") {
    val perUser = EventQueries.queries("ev_session")(spark, sf)
      .agg(sum($"n_sessions"), sum($"n_events")).head()
    assert(sessionHist.map(_.getAs[Long]("n_sessions")).sum === perUser.getLong(0))
    assert(sessionHist.map(_.getAs[Long]("n_events")).sum === perUser.getLong(1))
    val buckets = Set("b0_1", "b1_2_3", "b2_4_7", "b3_8_15", "b4_ge_16")
    assert(sessionHist.forall(r => buckets.contains(r.getAs[String]("bucket"))))
    val shares = sessionHist.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - sessionHist.length && shares <= 1000000L)
  }

  test("ev_session_hist: a two-session user lands one session in each forced bucket") {
    val dir = graft.rawdata.Topic.tempDir("hist-ev-twosession")
    Seq(
      // session 1: two events 10 min apart -> depth 2 (bucket b1_2_3)
      (1L, ts("2024-01-01 00:00:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 00:10:00"), 7L, "click", 1.0, "{}"),
      // session 2: 2 h later -> depth 1 (bucket b0_1)
      (3L, ts("2024-01-01 02:30:00"), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.queries("ev_session_hist")(spark, dir).collect()
    val byBucket = rows.map(r => r.getAs[String]("bucket") ->
      (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    assert(byBucket === Map("b0_1" -> (1L, 1L), "b1_2_3" -> (1L, 2L)))
    rows.foreach(r =>
      assert(r.getAs[Long]("share_ppm") === 500000L))
  }

  // ---- ev_moments -------------------------------------------------------

  test("ev_moments: one row per type, counts conserved, variance non-negative") {
    val rows = EventQueries.queries("ev_moments")(spark, sf).collect()
    val direct = graft.Tables.events(spark, sf)
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet === direct.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === direct(r.getAs[String]("event_type")))
      assert(r.getAs[Long]("var_milli") >= 0L)
    }
  }

  test("ev_moments: a constant stream has zero variance and zero skew; a symmetric one zero skew") {
    val dir = graft.rawdata.Topic.tempDir("moments-ev-shapes")
    Seq(
      // "flat": every value identical
      (1L, ts("2024-01-01 00:00:00"), 1L, "flat", 5.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 2L, "flat", 5.0, "{}"),
      (3L, ts("2024-01-01 02:00:00"), 3L, "flat", 5.0, "{}"),
      // "sym": {4, 5, 6} symmetric about the exact integer mean
      (4L, ts("2024-01-01 00:00:00"), 1L, "sym", 4.0, "{}"),
      (5L, ts("2024-01-01 01:00:00"), 2L, "sym", 5.0, "{}"),
      (6L, ts("2024-01-01 02:00:00"), 3L, "sym", 6.0, "{}"),
      // "skewed": {1, 1, 10} pulls the tail right -> strictly positive g1
      (7L, ts("2024-01-01 00:00:00"), 1L, "skewed", 1.0, "{}"),
      (8L, ts("2024-01-01 01:00:00"), 2L, "skewed", 1.0, "{}"),
      (9L, ts("2024-01-01 02:00:00"), 3L, "skewed", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.queries("ev_moments")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("flat").getAs[Long]("mean_cents") === 500L)
    assert(rows("flat").getAs[Long]("var_milli") === 0L)
    assert(rows("flat").getAs[Long]("skew_milli") === 0L)
    // sym: cents {400,500,600}, d = {-100,0,100}, sd1=0, sd2=20000;
    // a = n*sd2 - sd1^2 = 60000, var_milli = floor(60000/9*1000 + .5)
    assert(rows("sym").getAs[Long]("var_milli") === 6666667L)
    assert(rows("sym").getAs[Long]("skew_milli") === 0L)
    assert(rows("skewed").getAs[Long]("skew_milli") > 0L)
  }

  // ---- txt_word_len_hist ------------------------------------------------

  test("txt_word_len_hist: per-language counts and character mass conserve the tokenized corpus") {
    val rows = TextQueries.queries("txt_word_len_hist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = graft.Tables.t(spark, sf, "documents")
      .select($"lang", explode(split($"text", " +")).as("w"))
      .filter(length($"w") > 0)
    val direct = toks.groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum(length($"w").cast("long")).as("chars"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet === direct.keySet)
    for ((lang, rs) <- rows.groupBy(_.getAs[String]("lang"))) {
      assert(rs.map(_.getAs[Long]("n")).sum === direct(lang)._1)
      assert(rs.map(r => r.getAs[Long]("len") * r.getAs[Long]("n")).sum ===
        direct(lang)._2)
      assert(rs.forall(_.getAs[Long]("len") >= 1L))
      val shares = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(shares > 1000000L - rs.length && shares <= 1000000L)
    }
  }
}
