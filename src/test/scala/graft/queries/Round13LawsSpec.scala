package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 guard laws — the two ADVICE corners: mm_size_drift's
  * zero-byte key mean (ALL payloads of a key empty → NULL drift, never
  * an ANSI divide-by-zero) and ev_peak_factor's DECIMAL(38,0) headroom
  * for the peak·10³·span cross-multiplication.
  */
class Round13LawsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("mm_size_drift: a key whose payloads are ALL zero-length reports NULL drift") {
    val d = graft.rawdata.Topic.tempDir("r13-zero-bytes")
    // every props payload empty → key 'props' has key_bytes = 0 on both
    // days; key 'user' (the user-id string payload) stays non-empty
    Seq(
      (1L, ts("2024-01-06 08:00:00"), 10L, "view", 1.0, ""),
      (2L, ts("2024-01-06 09:00:00"), 20L, "view", 1.0, ""),
      (3L, ts("2024-01-08 10:00:00"), 10L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = MultimodalQueries.queries("mm_size_drift")(spark, d).collect()
    val props = rows.filter(_.getAs[String]("key") == "props")
    val user = rows.filter(_.getAs[String]("key") == "user")
    assert(props.length === 2 && user.length === 2, "both keys, both days, no row vanishes")
    assert(props.forall(r => r.getAs[Long]("day_bytes") === 0L &&
      r.isNullAt(r.fieldIndex("drift_milli"))),
      "zero key mean must surface as NULL drift, not throw or fabricate a ratio")
    assert(user.forall(r => !r.isNullAt(r.fieldIndex("drift_milli"))),
      "the guarded branch must not leak onto healthy keys")
    // equal-length user payloads ('10','20' then '10') → drift exactly 1000
    assert(user.forall(_.getAs[Long]("drift_milli") === 1000L))
  }

  test("ev_peak_factor: fixture headroom is >= 10 decimal orders under the 10^38 cap") {
    // widest intermediate is peak_hour_n·10³·span_hours ≤ n·10³·S with
    // n = total events and S the century cap in hours (~876 600) — pin
    // the DECIMAL(38,0) guard's bound the way q78's law does
    val n = java.math.BigInteger.valueOf(
      graft.Tables.events(spark, sf).count())
    val widest = n.multiply(java.math.BigInteger.valueOf(1000L))
      .multiply(java.math.BigInteger.valueOf(876600L))
    assert(widest.compareTo(java.math.BigInteger.TEN.pow(28)) < 0,
      s"ev_peak_factor intermediate $widest within 10 orders of the DECIMAL(38,0) cap")
    val out = EventQueries.queries("ev_peak_factor")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("peak_factor_milli"))),
      "ANSI mode: overflow would THROW, and no peak_factor_milli may be silently NULL")
    // the capacity-factor law: peak factor ≥ 1000 (peak ≥ mean) always
    assert(out.forall(_.getAs[Long]("peak_factor_milli") >= 1000L))
  }
}
