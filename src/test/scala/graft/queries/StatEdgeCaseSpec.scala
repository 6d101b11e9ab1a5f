package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-stream robustness for the round-9 statistical family —
  * Spark 4 ANSI mode makes every unguarded x/0 or overflow a runtime
  * throw, so the zero-purchase / single-user / uniform-activity /
  * disjoint-vocabulary corners must be PROVEN, not assumed. Synthetic
  * tables are written as parquet so the real registry entries run
  * end-to-end against them.
  */
class StatEdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** events with NO purchase anywhere (survival/LTV must degrade to
    * empty, not throw) and uniform per-user activity (gini exactly 0)
    */
  private lazy val noPurchaseDir: String = {
    val dir = graft.rawdata.Topic.tempDir("edge-ev-nopurchase")
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "view", 1.0, "{}"),
      (2L, ts("2024-01-02 00:00:00"), 10L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 20L, "view", 1.0, "{}"),
      (4L, ts("2024-01-03 00:00:00"), 20L, "error", 1.0, "{}"),
      (5L, ts("2024-01-02 06:00:00"), 30L, "signup", 1.0, "{}"),
      (6L, ts("2024-01-04 00:00:00"), 30L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** a single user, purchasing on their first day (the one-event-time
    * survival curve; gini of one user)
    */
  private lazy val oneUserDir: String = {
    val dir = graft.rawdata.Topic.tempDir("edge-ev-oneuser")
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "signup", 1.0, "{}"),
      (2L, ts("2024-01-01 08:00:00"), 7L, "purchase", 9.5, "{}"),
      (3L, ts("2024-01-05 00:00:00"), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** documents where one lang is a single repeated token (Simpson = 1e6)
    * and two langs share no vocabulary (Jaccard = 0)
    */
  private lazy val docsDir: String = {
    val dir = graft.rawdata.Topic.tempDir("edge-docs-stat")
    Seq(
      (1L, "same same same same", "aa", "web"),
      (2L, "alpha beta gamma delta", "bb", "web"),
      (3L, "uno dos tres cuatro", "cc", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ev_survival: a stream with zero purchases yields an empty curve, no throw") {
    assert(EventQueries.queries("ev_survival")(spark, noPurchaseDir).count() === 0L)
  }

  test("ev_survival: one user purchasing on day 0 gives the single-step curve (n=1, d=1, s=0)") {
    val r = EventQueries.queries("ev_survival")(spark, oneUserDir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("t_day") === 0L)
    assert(r.head.getAs[Long]("n_risk") === 1L)
    assert(r.head.getAs[Long]("n_events") === 1L)
    assert(r.head.getAs[Long]("surv_ppm") === 0L)
  }

  test("ev_gini: uniform per-user activity scores exactly 0, top-decile k = n div 10") {
    val g = EventQueries.queries("ev_gini")(spark, noPurchaseDir).collect().head
    assert(g.getAs[Long]("n_users") === 3L)
    assert(g.getAs[Long]("gini_ppm") === 0L)
    assert(g.getAs[Long]("top_decile_users") === 0L)
    assert(g.getAs[Long]("top_decile_ppm") === 0L)
  }

  test("ev_gini: a single user is perfectly equal (gini 0), no division throw") {
    val g = EventQueries.queries("ev_gini")(spark, oneUserDir).collect().head
    assert(g.getAs[Long]("n_users") === 1L)
    assert(g.getAs[Long]("gini_ppm") === 0L)
  }

  test("ev_ltv: zero purchases yield an empty curve; one user yields its exact LTV") {
    assert(EventQueries.queries("ev_ltv")(spark, noPurchaseDir).count() === 0L)
    val r = EventQueries.queries("ev_ltv")(spark, oneUserDir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("cohort_users") === 1L)
    assert(r.head.getAs[Long]("week_value_micro") === 9500000L)
    assert(r.head.getAs[Long]("cum_ltv_micro_per_user") === 9500000L)
  }

  test("txt_simpson: a single repeated token scores exactly 1e6; 4 distinct tokens score 0") {
    val m = TextQueries.queries("txt_simpson")(spark, docsDir)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("simpson_ppm")).toMap
    assert(m("aa") === 1000000L)
    assert(m("bb") === 0L)
  }

  test("txt_lang_overlap: disjoint vocabularies keep their frame row with jaccard 0") {
    val rows = TextQueries.queries("txt_lang_overlap")(spark, docsDir).collect()
    assert(rows.length === 3, "all C(3,2) pairs present even with zero overlap")
    assert(rows.forall(_.getAs[Long]("n_common") === 0L))
    assert(rows.forall(_.getAs[Long]("jaccard_ppm") === 0L))
  }
}
