package graft.rawdata

import java.sql.Timestamp

import graft.SparkSpec

/** rd_backlog's missing-commit law: when NO message precedes the horizon
  * (a topic whose messages all share one ts_ms has span 0, horizon = min
  * ts, so the cursor aggregate is empty), the monitor must report
  * EVERYTHING pending — not silently 0, which is what a NULL cursor's
  * three-valued `ulid_hex > NULL` comparisons would produce.
  */
class BacklogDegenerateSpec extends SparkSpec {
  import spark.implicits._

  test("single-timestamp topic reports all messages pending, not zero") {
    val dir = Topic.tempDir("backlog-degenerate")
    val oneTs = Timestamp.valueOf("2024-01-15 00:00:00")
    Seq(
      (1L, oneTs, 10L, "click", 1.0, "{}"),
      (2L, oneTs, 11L, "click", 2.0, "{}"),
      (3L, oneTs, 12L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = RawdataQueries.queries("rd_backlog")(spark, dir).collect()
    assert(out.nonEmpty)
    val pending = out.map(r => r.getAs[Long]("n_pending")).sum
    val total = out.map(r => r.getAs[Long]("n_total")).sum
    assert(total === 3L)
    assert(pending === total,
      s"missing commit must report everything pending (got $pending of $total)")
    assert(out.forall(r => r.getAs[String]("first_pending_ulid") != null))
    assert(out.forall(r => r.getAs[Long]("pending_ppm") == 1000000L))
  }
}
