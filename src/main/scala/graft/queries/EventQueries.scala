package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.events

/** SURVEY §2.C — event-stream analytics over the `events` table (the
  * batch view of a consumed topic; the same transforms run unchanged on
  * TopicStream.messages in streaming mode — see TopicStreamSpec).
  *
  * Time is normalized to epoch MICROSECOND longs on both engines
  * (Spark `unix_micros` / DuckDB `epoch_us`) so nanosecond-parquet vs
  * microsecond-session differences can never skew parity. Every window
  * is partitioned by user or keyed by (window, type) — nothing funnels
  * through a single partition, so the shapes hold at 100 TB.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private def d6(c: Column): Column = c.cast(DecimalType(28, 6))
  private val HourUs = 3600L * 1000000L
  private val HalfHourUs = 1800L * 1000000L
  private val DayUs = 86400L * 1000000L
  private val WeekUs = 7L * 86400L * 1000000L
  private val GapUs = 1800L * 1000000L // 30 min session gap

  /** Inter-event gap buckets, coarse-to-fine powers of the natural
    * operational scales (1s/10s/1m/10m/1h/1d). A CASE chain of integer
    * comparisons — identical text runs on Spark and DuckDB, so the
    * histogram is bit-exact (a float log-bucket would not be). Labels
    * are lexicographically ordered so ORDER BY bucket is the natural
    * coarse-to-fine order on both engines.
    */
  private val GapBucketCase: String =
    """CASE WHEN delta_us < 1000000 THEN 'b0_lt_1s'
      |     WHEN delta_us < 10000000 THEN 'b1_1s_10s'
      |     WHEN delta_us < 60000000 THEN 'b2_10s_1m'
      |     WHEN delta_us < 600000000 THEN 'b3_1m_10m'
      |     WHEN delta_us < 3600000000 THEN 'b4_10m_1h'
      |     WHEN delta_us < 86400000000 THEN 'b5_1h_1d'
      |     ELSE 'b6_ge_1d' END""".stripMargin

  private def ev(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).select($"event_id", $"user_id", $"event_type", $"value",
      unix_micros($"ts").as("ts_us"))
  }

  val queries: Map[String, Q] = Map(
    // A/B experiment readout: users deterministically hash-split into
    // two arms (md5 — the same coin every engine flips, so assignment
    // replays exactly; the samp_hash_split rule applied to
    // experimentation), per-event-type arm means in exact integer
    // micro-units and the relative lift in ppm. Scale shape: one
    // partial-agg shuffle on (event_type, arm) — assignment is a narrow
    // projection, no user relation materialized anywhere — then a
    // |event_types|-row self-join. The experiment-analysis staple over
    // an event stream of any size.
    "ev_abtest" -> { (s, d) =>
      import s.implicits._
      val arm = expr(
        "CAST(conv(substring(md5(concat('arm:', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2")
      val g = ev(s, d)
        .withColumn("arm", arm)
        .groupBy($"event_type", $"arm")
        .agg(count(lit(1)).as("n"), sum(d6($"value")).as("sv"))
        // integral micro-units before the division (the ev_fill rule)
        .withColumn("mean_micro", expr("CAST(sv * 1000000 AS BIGINT) div n"))
      g.filter($"arm" === 0)
        .select($"event_type", $"n".as("n_a"), $"mean_micro".as("mean_a_micro"))
        .join(g.filter($"arm" === 1)
          .select($"event_type", $"n".as("n_b"), $"mean_micro".as("mean_b_micro")),
          Seq("event_type"))
        .withColumn("lift_ppm", expr(
          "((mean_b_micro - mean_a_micro) * 1000000) div greatest(1L, abs(mean_a_micro))"))
        .select($"event_type", $"n_a", $"n_b", $"mean_a_micro", $"mean_b_micro", $"lift_ppm")
        .orderBy($"event_type")
    },

    // sample-ratio-mismatch check (the A/B health gate run BEFORE
    // reading ev_abtest's lift: a biased assignment invalidates the
    // readout, and SRM is the canonical symptom): per event type, the
    // two arms' user-weighted event counts against the expected 50/50,
    // deviation in ppm with a 2 % flag. Same deterministic md5 arm as
    // ev_abtest (the two queries must agree on assignment by
    // construction). One (event_type, arm) partial agg; |types| rows.
    "ev_srm" -> { (s, d) =>
      import s.implicits._
      val arm = expr(
        "CAST(conv(substring(md5(concat('arm:', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2")
      ev(s, d)
        .withColumn("arm", arm)
        .groupBy($"event_type")
        .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"))
        .withColumn("n", $"n_a" + $"n_b")
        .withColumn("dev_ppm", expr("(abs(n_a * 2 - n) * 1000000) div n"))
        .withColumn("srm_flag", ($"dev_ppm" > 20000L).cast("long"))
        .select($"event_type", $"n_a", $"n_b", $"n", $"dev_ppm", $"srm_flag")
        .orderBy($"event_type")
    },

    // CUSUM drift detection over the hourly count series (the
    // change-point monitor that catches a sustained rate shift long
    // before any single hour looks anomalous — ev_anomaly's per-hour
    // z-test misses slow drifts by design). The sequential recurrence
    // S_i = max(0, S_{i-1} + (x_i − mean − slack)) looks
    // window-inexpressible, but has the exact closed form
    // S_i = P_i − min_{j≤i} P_j over the prefix sums P of the centered
    // series — so the whole detector is TWO stacked window functions
    // over the per-type hourly relation (|types|·|hours| rows, an
    // aggregate of the stream — never event-sized), integer-exact end
    // to end. Alert = S_i ≥ 8·slack with slack = max(1, mean div 10),
    // i.e. a sustained excess of ~80 % of an average hour. Scale shape:
    // one (type, hour) partial agg over events, then type-partitioned
    // windows on the tiny grid.
    "ev_cusum" -> { (s, d) =>
      import s.implicits._
      val hourly = ev(s, d)
        .groupBy($"event_type", ($"ts_us" - ($"ts_us" % HourUs)).as("win_us"))
        .agg(count(lit(1)).as("x"))
      val wType = Window.partitionBy($"event_type")
      val wOrd = Window.partitionBy($"event_type").orderBy($"win_us")
      hourly
        .withColumn("n_hours", count(lit(1)).over(wType))
        .withColumn("mean_x", expr("sum(x) over (partition by event_type) div n_hours"))
        .withColumn("slack", greatest(lit(1L), expr("mean_x div 10")))
        .withColumn("p", sum($"x" - $"mean_x" - $"slack").over(wOrd))
        .withColumn("s", $"p" - min($"p").over(wOrd))
        .withColumn("smax", max($"s").over(wType))
        .groupBy($"event_type")
        .agg(max($"n_hours").as("n_hours"), max($"mean_x").as("mean_x"),
          max($"s").as("max_cusum"),
          min(when($"s" === $"smax", $"win_us")).as("peak_win_us"),
          sum(when($"s" >= lit(8L) * $"slack", 1L).otherwise(0L)).as("n_alert_hours"))
        .orderBy($"event_type")
    },

    // tumbling 1h windows: one partial-aggregated shuffle on (window, type)
    "ev_tumbling" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy(($"ts_us" - ($"ts_us" % HourUs)).as("win_us"), $"event_type")
        .agg(count(lit(1)).as("n"), sum(d6($"value")).cast("double").as("total_value"))
        .orderBy($"win_us", $"event_type")
    },

    // sliding 1h windows hopping 30min: each event lands in exactly two
    // windows — explode to (event × 2) then the same keyed aggregation
    "ev_sliding" -> { (s, d) =>
      import s.implicits._
      val base = ev(s, d)
        .withColumn("w0", $"ts_us" - ($"ts_us" % HalfHourUs))
      base.select($"event_type", $"value", $"w0".as("win_us"))
        .unionByName(base.select($"event_type", $"value", ($"w0" - HalfHourUs).as("win_us")))
        .groupBy($"win_us", $"event_type")
        .agg(count(lit(1)).as("n"), sum(d6($"value")).cast("double").as("total_value"))
        .orderBy($"win_us", $"event_type")
    },

    // gap-based sessionization: lag + cumulative new-session flags inside
    // the per-user window (one shuffle on user_id)
    "ev_session" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, d)
        .withColumn("new_session",
          when(($"ts_us" - lag($"ts_us", 1).over(w)) > GapUs || lag($"ts_us", 1).over(w).isNull, 1L)
            .otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },

    // ordered funnel view→click→purchase within each user's timeline:
    // three conditional mins, all computed in one per-user aggregation pass
    "ev_funnel" -> { (s, d) =>
      import s.implicits._
      val base = ev(s, d)
      val v = base.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("v_us"))
      val c = base.filter($"event_type" === "click").select($"user_id", $"ts_us")
        .join(v, Seq("user_id"))
        .filter($"ts_us" >= $"v_us")
        .groupBy($"user_id").agg(min($"ts_us").as("c_us"))
      val p = base.filter($"event_type" === "purchase").select($"user_id", $"ts_us")
        .join(c, Seq("user_id"))
        .filter($"ts_us" >= $"c_us")
        .groupBy($"user_id").agg(min($"ts_us").as("p_us"))
      v.select(lit(1).as("one"), $"user_id").groupBy($"one").agg(count(lit(1)).as("n_view"))
        .join(c.select(lit(1).as("one"), $"user_id").groupBy($"one").agg(count(lit(1)).as("n_click")), "one")
        .join(p.select(lit(1).as("one"), $"user_id").groupBy($"one").agg(count(lit(1)).as("n_purchase")), "one")
        .drop("one")
    },

    // day-N retention cohorts on integer epoch-days (cohort = first active
    // day per user; one agg for cohorts, one distinct-count per offset)
    "ev_retention" -> { (s, d) =>
      import s.implicits._
      val activity = ev(s, d)
        .select($"user_id", ($"ts_us" - ($"ts_us" % DayUs)).as("day_us")).distinct()
      val cohort = activity.groupBy($"user_id").agg(min($"day_us").as("cohort_us"))
      activity.join(cohort, Seq("user_id"))
        .withColumn("offset_days", (($"day_us" - $"cohort_us") / DayUs).cast("long"))
        .filter($"offset_days" <= 7)
        .groupBy(($"cohort_us" / DayUs).cast("long").as("cohort_day"), $"offset_days")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_day", $"offset_days")
    },

    // weekly cohort retention MATRIX — ev_retention's day-level counts
    // normalized into the (cohort week x weeks-since-signup) rate grid a
    // growth dashboard plots: retained_ppm = users active at offset w as
    // ppm of the cohort's size. Integer div so the rates hash-match.
    // Scale shape: one distinct on (user, week) — partial-agg shuffle —
    // one cohort agg per user, one matrix agg on the tiny (weeks x
    // offsets) key space, and the size join keys on cohort_week (weeks-
    // sized relation, AQE broadcasts it). Nothing funnels through one
    // partition; the matrix itself is O(horizon²) rows at any corpus sf.
    "ev_cohort" -> { (s, d) =>
      import s.implicits._
      val weekly = ev(s, d)
        .select($"user_id", ($"ts_us" - ($"ts_us" % WeekUs)).as("week_us")).distinct()
      val cohort = weekly.groupBy($"user_id").agg(min($"week_us").as("cohort_us"))
      // the matrix feeds BOTH the offset-0 size relation and the rate
      // join — persist or the events scan runs twice (caller-scoped
      // cache, per the SparkEntry contract)
      val matrix = weekly.join(cohort, Seq("user_id"))
        .withColumn("offset_weeks", (($"week_us" - $"cohort_us") / WeekUs).cast("long"))
        .groupBy(($"cohort_us" / WeekUs).cast("long").as("cohort_week"), $"offset_weeks")
        .agg(countDistinct($"user_id").as("n_users"))
        .persist()
      val size = matrix.filter($"offset_weeks" === 0)
        .select($"cohort_week", $"n_users".as("cohort_size"))
      matrix.join(size, Seq("cohort_week"))
        .withColumn("retained_ppm", expr("(n_users * 1000000) div cohort_size"))
        .select($"cohort_week", $"offset_weeks", $"n_users", $"cohort_size", $"retained_ppm")
        .orderBy($"cohort_week", $"offset_weeks")
    },

    // inter-arrival gap histogram (ingest capacity / session-gap tuning:
    // where does the 30-min sessionization threshold sit in THIS
    // stream's gap distribution?): per-user consecutive-event deltas,
    // bucketed on operational scales by an integer CASE chain. Scale
    // shape: one per-user window lag (partitioned — never global), then
    // a partial-agg shuffle on the 7-bucket key; distinct users per
    // bucket rides the same shuffle.
    "ev_interarrival" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, d)
        .withColumn("delta_us", $"ts_us" - lag($"ts_us", 1).over(w))
        .filter($"delta_us".isNotNull)
        .withColumn("bucket", expr(GapBucketCase))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_gaps"),
          countDistinct($"user_id").as("n_users"),
          min($"delta_us").as("min_us"), max($"delta_us").as("max_us"))
        .orderBy($"bucket")
    },

    // hour-of-day x day-of-week seasonality profile (capacity planning /
    // anomaly baselining): event share per cell of the 7x24 grid, in
    // ppm. Day-of-week from pure epoch arithmetic — (epoch_day + 4) % 7,
    // 0 = Sunday (day 0 was a Thursday) — so no calendar/timezone
    // function can skew engine parity. Scale shape: one partial-agg
    // shuffle onto the fixed 168-cell key space, the total a 1-row
    // broadcast; the share numerator runs in DECIMAL(38,0) (n·10⁶
    // passes int64 only below ~9e12 events/cell — true at any test sf,
    // not at the cluster corpus).
    "ev_seasonality" -> { (s, d) =>
      import s.implicits._
      val cells = ev(s, d)
        .select(expr(s"((ts_us div $DayUs) + 4) % 7").as("dow"),
          expr(s"(ts_us % $DayUs) div $HourUs").as("hour"))
        .groupBy($"dow", $"hour").agg(count(lit(1)).as("n_events"))
        .persist() // feeds the 1-row total AND the share projection
      val tot = cells.agg(sum($"n_events").as("total")).withColumn("one", lit(1))
      cells.withColumn("one", lit(1)).join(broadcast(tot), Seq("one")).drop("one")
        .withColumn("share_ppm", expr(
          "CAST((CAST(n_events AS DECIMAL(38,0)) * 1000000) div total AS BIGINT)"))
        .select($"dow", $"hour", $"n_events", $"share_ppm")
        .orderBy($"dow", $"hour")
    },

    // seasonal-naive forecast baseline + backtest (the capacity-planning
    // sanity model any fancier forecaster must beat): predict each day's
    // per-type event count as the floored mean of all PRIOR same-weekday
    // counts, score the whole history, report per-type MAE / worst miss.
    // Integer floor-mean so the backtest is engine-exact. Scale shape:
    // the window runs over the DAILY relation (types x days — thousands
    // of rows at any corpus size, partitioned by (type, dow)), never over
    // raw events; days with no prior same-dow observation are unscored.
    "ev_forecast" -> { (s, d) =>
      import s.implicits._
      val daily = ev(s, d)
        .select($"event_type", expr(s"ts_us div $DayUs").as("day"))
        .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
        .withColumn("dow", expr("(day + 4) % 7"))
      val w = Window.partitionBy($"event_type", $"dow").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      daily
        .withColumn("psum", sum($"n").over(w))
        .withColumn("pcnt", count($"n").over(w))
        .filter($"pcnt" >= 1)
        .withColumn("err", abs($"n" - expr("psum div pcnt")))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_scored"),
          expr("sum(err) div count(1)").as("mae"),
          max($"err").as("max_err"))
        .orderBy($"event_type")
    },

    // keep latest event per (user, type) — the batch form of streaming
    // dropDuplicates-keep-last; per-key window, unique tie-break
    "ev_dedup_latest" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts_us".desc, $"event_id".desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"ts_us", $"event_id", $"value")
    },

    // daily event-rate anomalies: days whose count departs from the
    // type's mean by more than 2 population-stddevs. The 2σ test is
    // rearranged to pure integer arithmetic — (n·D − T)² > 4(D·Σn² − T²),
    // D=#days, T=Σn — so the answer is bit-exact on any engine (no
    // float sqrt/mean drift). Two partial-agg shuffles on tiny keyed
    // relations (types×days, then types); no window over raw events.
    "ev_anomaly" -> { (s, d) =>
      import s.implicits._
      // per-type stats come from a window over the DAILY relation (tiny:
      // types × days), not a second aggregation branch — Catalyst has no
      // cross-branch CSE, so an agg+join form would scan raw events twice
      val w = Window.partitionBy($"event_type")
      ev(s, d)
        .groupBy($"event_type", ($"ts_us" / DayUs).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dd", count(lit(1)).over(w))
        .withColumn("t", sum($"n").over(w))
        .withColumn("s2", sum($"n" * $"n").over(w))
        .filter(($"n" * $"dd" - $"t") * ($"n" * $"dd" - $"t") > lit(4L) * ($"dd" * $"s2" - $"t" * $"t"))
        .select($"event_type", $"day", $"n")
        .orderBy($"event_type", $"day")
    },

    // rolling 7-day event volume per type over the DAILY rollup — the
    // RANGE window frame (value-based, not row-based: days with no
    // events don't shrink the horizon). Scale shape: the raw-event
    // shuffle is one partial-agg on (type, day); the window runs over
    // the tiny daily relation (|types|·|days| rows), never raw events.
    "ev_rolling" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rangeBetween(-6, Window.currentRow)
      ev(s, d)
        .groupBy($"event_type", ($"ts_us" / DayUs).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_7d", sum($"n").over(w))
        .orderBy($"event_type", $"day")
    },

    // top user-journey 3-step paths (sequence mining lite): each user's
    // time-ordered event stream yields overlapping (step1, step2, step3)
    // trigrams via two leads over ONE per-user window sort, then the
    // count is a partial-agg shuffle on the tiny path-type key space.
    // 100 TB shape: one shuffle by user (the window), one by path triple
    // — path cardinality is |event_types|³ regardless of corpus size, so
    // the final top-10 sort is over a bounded relation.
    "ev_paths" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, d)
        .select($"user_id", $"event_type", $"ts_us", $"event_id")
        .withColumn("step2", lead($"event_type", 1).over(w))
        .withColumn("step3", lead($"event_type", 2).over(w))
        .filter($"step3".isNotNull)
        .groupBy($"event_type".as("step1"), $"step2", $"step3")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"step1", $"step2", $"step3")
        .limit(10)
    },

    // last-touch attribution: each purchase credits the most recent prior
    // NON-purchase event in the same user's timeline (the classic
    // marketing-attribution join, done as one ignore-nulls window pass —
    // no self-join, no as-of probe per purchase). 100 TB shape: one
    // shuffle by user for the window, then a partial-agg on the tiny
    // attribution-type key space.
    "ev_attribution" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(s, d)
        .withColumn("last_touch",
          last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .groupBy(coalesce($"last_touch", lit("none")).as("attrib_type"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(d6($"value")).cast("double").as("attributed_value"))
        .orderBy($"attrib_type")
    },

    // hour-of-day seasonality profile per type: counts + integer-ppm
    // share of the type's total — the load-shape fingerprint that feeds
    // capacity planning and anomaly baselines. One partial-agg shuffle
    // on (type, hour); the normalizing window runs over the
    // |types|·24-bounded relation.
    "ev_hourly" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"event_type")
      ev(s, d)
        .groupBy($"event_type", (($"ts_us" % DayUs) / HourUs).cast("long").as("hour"))
        .agg(count(lit(1)).as("n"))
        .withColumn("type_total", sum($"n").over(w))
        .withColumn("share_ppm", expr("(n * 1000000) div type_total"))
        .orderBy($"event_type", $"hour")
    },

    // hour-of-day regularity per event type — ev_hourly's 1-row-per-type
    // summary and the classic bot/automation signal: organic activity
    // spreads entropy near the ln 24 ceiling, cron-driven types collapse
    // toward one peak hour (low entropy, high peak share). Exact integer
    // micro-nats via the native ln_micro kernel over the
    // (type, hour-of-day) relation — ≤ 24·|types| rows whatever the
    // corpus size. Scale shape: one calendar-bounded partial agg, then a
    // |types|-row rollup; no windows.
    "ev_hourly_entropy" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      ev(s, d)
        .groupBy($"event_type", (($"ts_us" % DayUs) / HourUs).cast("long").as("hour"))
        .agg(count(lit(1)).as("c"))
        .groupBy($"event_type")
        .agg(sum($"c").as("n_events"),
          count(lit(1)).as("n_hours"),
          max($"c").as("peak_n"),
          sum($"c".cast(dec) * expr("ln_micro(c)")).as("slc"))
        .withColumn("entropy_micro",
          expr("ln_micro(n_events) - (slc div CAST(n_events AS DECIMAL(38,0)))").cast("long"))
        .withColumn("regularity_ppm",
          expr(s"(entropy_micro * 1000000) div ${graft.functions.FixedLnOps.lnMicro(24L)}"))
        .withColumn("peak_ppm", expr("(peak_n * 1000000) div n_events"))
        .select($"event_type", $"n_events", $"n_hours", $"entropy_micro",
          $"regularity_ppm", $"peak_ppm")
        .orderBy($"event_type")
    },

    // funnel drop-off report: per step the surviving-user count and the
    // integer-ppm conversion from the previous step — ev_funnel's rollup
    // re-shaped into the table a dashboard actually shows. Same three
    // ordered-first aggregations; the step table is built from the three
    // 1-row counts (plan-only, no driver actions).
    "ev_funnel_steps" -> { (s, d) =>
      import s.implicits._
      val base = ev(s, d)
      val v = base.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("v_us"))
      val c = base.filter($"event_type" === "click").select($"user_id", $"ts_us")
        .join(v, Seq("user_id")).filter($"ts_us" >= $"v_us")
        .groupBy($"user_id").agg(min($"ts_us").as("c_us"))
      val p = base.filter($"event_type" === "purchase").select($"user_id", $"ts_us")
        .join(c, Seq("user_id")).filter($"ts_us" >= $"c_us")
        .groupBy($"user_id").agg(min($"ts_us").as("p_us"))
      def cnt(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as(name)).withColumn("one", lit(1))
      cnt(v, "nv").join(cnt(c, "nc"), "one").join(cnt(p, "np"), "one")
        .select(explode(array(
          struct(lit(1L).as("step"), lit("view").as("step_name"),
            $"nv".as("n_users"), $"nv".as("prev")),
          struct(lit(2L).as("step"), lit("click").as("step_name"),
            $"nc".as("n_users"), $"nv".as("prev")),
          struct(lit(3L).as("step"), lit("purchase").as("step_name"),
            $"np".as("n_users"), $"nc".as("prev")))).as("st"))
        .select($"st.step".as("step"), $"st.step_name".as("step_name"),
          $"st.n_users".as("n_users"),
          when($"st.prev" === 0L, lit(0L))
            .otherwise(expr("(st.n_users * 1000000) div st.prev")).as("conv_prev_ppm"))
        .orderBy($"step")
    },

    // conversion-latency profile between funnel steps: for each converting
    // user the time from first view to first qualifying click and from
    // that click to first qualifying purchase, rolled up per step into
    // exact integer stats (min/max/floor-div mean in µs) and exact
    // second-resolution p50/p90 via the q35 value-histogram technique —
    // cumulative counts over the (step, latency-second) histogram, whose
    // window is bounded by the latency RANGE in seconds, never by users,
    // so the shape holds at 100 TB (a per-user rank window would not).
    "ev_funnel_time" -> { (s, d) =>
      import s.implicits._
      val base = ev(s, d)
      val v = base.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("v_us"))
      val c = base.filter($"event_type" === "click").select($"user_id", $"ts_us")
        .join(v, Seq("user_id")).filter($"ts_us" >= $"v_us")
        .groupBy($"user_id").agg(min($"ts_us").as("c_us"), min($"v_us").as("v0_us"))
      val p = base.filter($"event_type" === "purchase").select($"user_id", $"ts_us")
        .join(c.select($"user_id", $"c_us"), Seq("user_id")).filter($"ts_us" >= $"c_us")
        .groupBy($"user_id").agg(min($"ts_us").as("p_us"), min($"c_us").as("c0_us"))
      val lat = c.select(lit("view>click").as("step"), ($"c_us" - $"v0_us").as("lat_us"))
        .unionByName(p.select(lit("click>purchase").as("step"), ($"p_us" - $"c0_us").as("lat_us")))
      val stats = lat.groupBy($"step")
        .agg(count(lit(1)).as("n_users"), min($"lat_us").as("min_us"),
          max($"lat_us").as("max_us"), expr("sum(lat_us) div count(1)").as("mean_us"))
      val wCum = Window.partitionBy($"step").orderBy($"lat_s")
      val wGrp = Window.partitionBy($"step")
      val hist = lat.select($"step", expr("lat_us div 1000000").as("lat_s"))
        .groupBy($"step", $"lat_s").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(wCum))
        .withColumn("n", sum($"cnt").over(wGrp))
      def exactAt(q: Double) =
        min(when($"cum" >= greatest(lit(1L), ceil(lit(q) * $"n").cast("long")), $"lat_s"))
      val quants = hist.groupBy($"step")
        .agg(exactAt(0.5).as("p50_s"), exactAt(0.9).as("p90_s"))
      stats.join(quants, Seq("step"))
        .select($"step", $"n_users", $"min_us", $"max_us", $"mean_us", $"p50_s", $"p90_s")
        .orderBy($"step")
    },

    // rolling 7-day active users (DAU/WAU/stickiness): each distinct
    // (user, day) contributes to its own day's DAU and to the WAU of the
    // 7 target days it falls inside — a bounded 7× expansion of the
    // deduplicated activity relation followed by two keyed partial aggs,
    // instead of a range-window distinct (which no engine does exactly
    // without holding per-window user sets). The growth/engagement
    // ratio every event platform reports, engine-exact in ppm.
    "ev_wau" -> { (s, d) =>
      import s.implicits._
      val activity = ev(s, d)
        .select($"user_id", expr(s"ts_us div $DayUs").as("day")).distinct()
      val dau = activity.groupBy($"day").agg(count(lit(1)).as("dau"))
      val wau = activity
        .select($"user_id", explode(expr("sequence(day, day + 6)")).as("day"))
        .distinct() // a user active twice inside one window counts once
        .groupBy($"day").agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .withColumn("stickiness_ppm", expr("(dau * 1000000) div wau"))
        .orderBy($"day")
    },

    // volume trend per event type: exact integer least-squares slope over
    // the daily counts — slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²), emitted
    // in milli-events/day via the positive-remainder floor-div so both
    // engines produce the identical integer (no float regression). Scale
    // shape: one partial-agg shuffle to the daily rollup, then a 5-sum
    // agg on the tiny (type, day) relation — regression math never sees
    // raw events.
    "ev_trend" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy($"event_type", ($"ts_us" / DayUs).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("nd"),
          sum($"day").as("sx"), sum($"n").as("sy"),
          sum($"day" * $"n").as("sxy"), sum($"day" * $"day").as("sxx"))
        .withColumn("num", ($"nd" * $"sxy" - $"sx" * $"sy") * lit(1000L))
        .withColumn("den", $"nd" * $"sxx" - $"sx" * $"sx")
        .withColumn("slope_milli",
          when($"den" === 0L, lit(0L))
            .otherwise(expr("(num - pmod(num, den)) div den")))
        .select($"event_type", $"nd", $"sy".as("n_events"), $"slope_milli")
        .orderBy($"event_type")
    },

    // first-order Markov transition model over each user's event stream:
    // (from, to) transition counts + integer-ppm conditional probability.
    // One lead over the per-user window, one partial-agg shuffle on the
    // |event_types|²-bounded transition space; the normalizing window
    // runs over that tiny relation, never raw events.
    "ev_markov" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val tw = Window.partitionBy($"from_type")
      ev(s, d)
        .select($"user_id", $"event_type", $"ts_us", $"event_id")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("from_total", sum($"n").over(tw))
        .withColumn("p_ppm", expr("(n * 1000000) div from_total"))
        .orderBy($"from_type", $"to_type")
    },

    // 8-step forward distribution of the ev_markov chain from uniform —
    // the long-run traffic-share forecast (≈ the stationary distribution
    // once the chain mixes; an operator reads where sessions CONVERGE,
    // not where they start). Exact integer ppm end to end: the
    // transition matrix is ev_markov's floor-ppm rows, each step is
    // x'(b) = ⌊Σ_a x(a)·p(a,b) / 10⁶⌋ — floors compound identically on
    // both engines, so the 8-step unroll is oracle-exact. Mass below
    // 10⁶ after 8 steps is the floor loss plus flow into dead-end
    // states, reported implicitly by the shares. Scale shape: the
    // matrix is |types|²-bounded whatever the corpus size; 8 unrolled
    // tiny join+agg rounds, the only corpus-scale stage being
    // ev_markov's per-user lead window.
    "ev_stationary" -> { (s, d) =>
      import s.implicits._
      val uw = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val m = ev(s, d)
        .select($"user_id", $"event_type", $"ts_us", $"event_id")
        .withColumn("to_type", lead($"event_type", 1).over(uw))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p_ppm", expr("(n * 1000000) div sum(n) over (partition by from_type)"))
        .select($"from_type", $"to_type", $"p_ppm")
      // the transition matrix is |types|²-bounded (event types are a
      // bounded enum, like the 3-row scalar guards elsewhere) — collect
      // it ONCE and run the 8 power-iteration rounds on the driver in
      // the same exact Long arithmetic. r14 optimization: the unrolled
      // distributed form paid 8 exchanges + 8 broadcast builds (~1 s of
      // stage barriers at any scale) to multiply a ≤|types|² matrix; the
      // cluster-side work (the full corpus pass building m) is unchanged
      // and the iteration is bit-identical: x'(to) = Σ_from x(from)·p —
      // summed in Long, floored div 10⁶, keys = joined to_types only.
      val mat = m.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val states = mat.map(_._1).distinct
      // EMPTY corpus (or no user with two events): no transition matrix,
      // no states — the uniform prior over zero states is the empty
      // relation, not a divide-by-zero
      var x: Map[String, Long] =
        states.map(_ -> (if (states.isEmpty) 0L else 1000000L / states.length)).toMap
      for (_ <- 1 to 8) {
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        mat.foreach { case (f, t0, p) =>
          x.get(f).foreach(v => acc.update(t0, acc.getOrElse(t0, 0L) + v * p))
        }
        x = acc.iterator.map { case (t0, sm) => t0 -> sm / 1000000L }.toMap
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("x_ppm",
          org.apache.spark.sql.types.LongType, nullable = true)))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      x.toSeq.sortBy(_._1).foreach { case (t0, v) =>
        rows.add(org.apache.spark.sql.Row(t0, v))
      }
      s.createDataFrame(rows, schema).orderBy($"event_type")
    },

    // same-day event-type co-occurrence lift (the association signal
    // behind "users who error also retry"): over distinct (user, day,
    // type) activity slots, for each unordered type pair the observed
    // co-active user-day count vs independence — lift = c_ab·T / (c_a·c_b)
    // in exact ppm (DECIMAL cross-multiplied; a log-odds score would
    // carry libm rounding). Scale shape: ONE (user, day) shuffle groups
    // activity into sorted per-slot type arrays (the CoPurchaseGraph
    // pair-explode trick — no self-join of the activity relation), the
    // pair counts land on the |types|²-bounded key space, and the
    // marginals/total join back on that tiny relation.
    "ev_type_cooccur" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val act = ev(s, d)
        .select($"user_id", expr(s"ts_us div $DayUs").as("day"), $"event_type")
        .distinct()
      val byDay = act.groupBy($"user_id", $"day")
        .agg(array_sort(collect_set($"event_type")).as("ts"))
        .persist() // feeds the pair explode AND the slot total
      val pairs = byDay
        .select(explode($"ts").as("ta"), $"ts")
        .select($"ta", explode(expr("filter(ts, x -> x > ta)")).as("tb"))
        .groupBy($"ta".as("type_a"), $"tb".as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      val marg = act.groupBy($"event_type").agg(count(lit(1)).as("n"))
      val tot = byDay.agg(count(lit(1)).as("t")).withColumn("k", lit(1))
      pairs
        .join(marg.select($"event_type".as("type_a"), $"n".as("n_a")), Seq("type_a"))
        .join(marg.select($"event_type".as("type_b"), $"n".as("n_b")), Seq("type_b"))
        .withColumn("k", lit(1)).join(broadcast(tot), Seq("k"))
        .select($"type_a", $"type_b", $"n_ab", $"n_a", $"n_b",
          expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * t * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
            .as("lift_ppm"))
        .orderBy($"type_a", $"type_b")
    },

    // repeat-engagement rate per type — the loyalty/stickiness number
    // (a type whose users mostly fire it once is an acquisition event;
    // one they return to is a habit): users touching the type, users
    // touching it 2+ times, exact ppm. Two chained partial aggs
    // ((user, type) then type); no windows.
    "ev_repeaters" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_users"),
          sum(when($"k" >= 2L, 1L).otherwise(0L)).as("n_repeaters"))
        .withColumn("repeat_ppm", expr("(n_repeaters * 1000000) div n_users"))
        .orderBy($"event_type")
    },

    // weekend-vs-weekday rate lift per type — the one-number seasonality
    // summary behind ev_weekday's 7-bucket profile (is this type a
    // work-hours tool or a leisure product?): per-day weekend rate over
    // per-day weekday rate as exact ppm via cross-multiplication
    // (n_weekend·5·10⁶) div (n_weekday·2) — 1 000 000 means flat, no
    // float division anywhere. Arithmetic dow (the ev_weekday rule,
    // 0=Monday so weekend is dow≥5); a type never seen on a weekday
    // reports NULL rather than throwing under ANSI. Scale shape: one
    // partial agg onto |types| rows, no windows, no joins.
    "ev_weekend_lift" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .select($"event_type", expr(s"((ts_us div $DayUs) + 3) % 7").as("dow"))
        .groupBy($"event_type")
        .agg(sum(when($"dow" >= 5, 1L).otherwise(0L)).as("n_weekend"),
          sum(when($"dow" < 5, 1L).otherwise(0L)).as("n_weekday"))
        .withColumn("lift_ppm", expr(
          "CASE WHEN n_weekday = 0 THEN NULL ELSE (n_weekend * 5000000) div (n_weekday * 2) END"))
        .orderBy($"event_type")
    },

    // DAU/WAU stickiness per epoch week — the product-engagement ratio
    // every growth dashboard leads with (what share of a week's users
    // show up on an average day; ev_wau counts, this NORMALIZES): exact
    // ppm via (Σ daily-distinct · 10⁶) div (days · weekly-distinct),
    // mean DAU in milli. Epoch weeks (ts_us div WeekUs — the ev_wau
    // grain), so no calendar-origin disagreement can skew parity. Scale
    // shape: one distinct on (week, day, user) — the only corpus-width
    // shuffle — then two bounded rollups and a |weeks|-row join; no
    // windows.
    "ev_stickiness" -> { (s, d) =>
      import s.implicits._
      val du = ev(s, d)
        .select(expr(s"ts_us div $WeekUs").as("week"),
          expr(s"ts_us div $DayUs").as("day"), $"user_id")
        .distinct()
      val dau = du.groupBy($"week", $"day").agg(count(lit(1)).as("dau"))
      val days = dau.groupBy($"week")
        .agg(count(lit(1)).as("n_days"), sum($"dau").as("sum_dau"), max($"dau").as("max_dau"))
      val wau = du.select($"week", $"user_id").distinct()
        .groupBy($"week").agg(count(lit(1)).as("wau"))
      days.join(wau, Seq("week"))
        .select($"week", $"n_days", $"wau", $"max_dau",
          expr("(sum_dau * 1000) div n_days").as("mean_dau_milli"),
          expr("(sum_dau * 1000000) div (n_days * wau)").as("stickiness_ppm"))
        .orderBy($"week")
    },

    // per-user activity distribution in power-of-2 bands — the raw
    // SHAPE behind ev_gini/ev_lorenz's concentration numbers (a
    // power-law user base and a bimodal bot+casual base can share one
    // gini; the band histogram tells them apart, and it is what sizes
    // per-user state stores): band = exact ⌊log₂ events⌋ via
    // length(bin(k))−1, user and event mass per band + ppm share.
    // Scale shape: one per-user partial agg, ≤64-band rollup, share
    // window over the bounded band relation.
    "ev_activity_bands" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy($"user_id").agg(count(lit(1)).as("k"))
        .withColumn("band", expr("CAST(length(bin(k)) - 1 AS BIGINT)"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_users"), sum($"k").as("n_events"),
          min($"k").as("min_events"), max($"k").as("max_events"))
        .withColumn("t", sum($"n_users").over(Window.partitionBy(lit(1))))
        .select($"band", $"n_users",
          expr("(n_users * 1000000) div t").as("user_share_ppm"),
          $"n_events", $"min_events", $"max_events")
        .orderBy($"band")
    },

    // activation-velocity distribution — time from a user's FIRST event
    // to their FIFTH (the "aha-moment" latency growth teams instrument;
    // ev_conversion_lag times one funnel edge, this times depth-of-use):
    // per activated user, seconds from event 1 to event 5 in read order
    // (deterministic (ts, event_id) tie-break), power-of-2 second bands
    // (band of lag+1 so instant activation lands in band 0). Scale
    // shape: one per-user row_number window pruned to rows 1 and 5, a
    // per-user 2-row agg, ≤64-band rollup.
    "ev_activation_lag" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 || $"rn" === 5)
        .groupBy($"user_id")
        .agg(min(when($"rn" === 1, $"ts_us")).as("t1"),
          min(when($"rn" === 5, $"ts_us")).as("t5"))
        .filter($"t5".isNotNull)
        .withColumn("lag_s", expr("(t5 - t1) div 1000000"))
        .withColumn("band", expr("CAST(length(bin(lag_s + 1)) - 1 AS BIGINT)"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_users"),
          min($"lag_s").as("min_lag_s"), max($"lag_s").as("max_lag_s"))
        .orderBy($"band")
    },

    // first-touch acquisition mix — which event type each user STARTS
    // with (deterministic (ts, event_id) read order), how big each
    // entry channel is, and what share of its users ever purchase (the
    // acquisition-to-conversion table behind ev_attribution's credit
    // split — attribution divides credit for converters; this scores
    // the entry points themselves). Scale shape: one per-user
    // row_number window pruned to row 1, a distinct on purchasing
    // users, a user-keyed left join, |types| rollup.
    "ev_first_touch" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val first = ev(s, d)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type".as("first_type"))
      val buyers = ev(s, d).filter($"event_type" === "purchase")
        .select($"user_id").distinct().withColumn("b", lit(1L))
      first.join(buyers, Seq("user_id"), "left")
        .groupBy($"first_type")
        .agg(count(lit(1)).as("n_users"), sum(coalesce($"b", lit(0L))).as("n_purchasers"))
        .withColumn("t", sum($"n_users").over(Window.partitionBy(lit(1))))
        .select($"first_type", $"n_users",
          expr("(n_users * 1000000) div t").as("share_ppm"),
          $"n_purchasers",
          expr("(n_purchasers * 1000000) div n_users").as("purchase_ppm"))
        .orderBy($"first_type")
    },

    // peak sustained ingest rate per type — the provisioning number a
    // rate limiter / autoscaler is sized from (ev_peak_slot finds the
    // busiest calendar cell; this finds the worst 5-MINUTE burst
    // anywhere in the stream): max 5-minute rolling event count via a
    // RANGE frame over per-minute counts (range, not rows — missing
    // minutes must widen the window, not shrink it), earliest-minute
    // tie-break. Scale shape: one partial agg onto the calendar-bounded
    // (type, minute) relation; both windows run over that bounded
    // relation, never the stream.
    "ev_peak_rate" -> { (s, d) =>
      import s.implicits._
      val perMin = ev(s, d)
        .groupBy($"event_type", expr("ts_us div 60000000").as("minute"))
        .agg(count(lit(1)).as("n"))
      val wr = Window.partitionBy($"event_type").orderBy($"minute").rangeBetween(-4, 0)
      val wp = Window.partitionBy($"event_type").orderBy($"r5".desc, $"minute")
      perMin.withColumn("r5", sum($"n").over(wr))
        .withColumn("rn", row_number().over(wp)).filter($"rn" === 1)
        .select($"event_type", $"minute".as("peak_minute"), $"r5".as("peak_5m"))
        .orderBy($"event_type")
    },

    // daily error-rate curve — the SLO burn-down every on-call
    // dashboard leads with (ev_anomaly flags volume outliers; this
    // tracks the error SHARE, which moves even when volume doesn't):
    // per epoch day, events, error events, exact ppm. One partial agg
    // onto the calendar grid, no windows, no joins.
    "ev_error_rate" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"))
        .withColumn("error_ppm", expr("(n_errors * 1000000) div n_events"))
        .orderBy($"day")
    },

    // week-1 retention by acquisition channel — the table that prices
    // each entry channel (ev_first_touch scores conversion, this scores
    // STAYING: a channel whose users vanish inside 7 days is buying
    // traffic, not users; ev_retention tracks cohorts over time, this
    // attributes the D7 bar to the channel): per first-touch type,
    // users and users still active ≥ 7 days after their first event,
    // exact ppm. Scale shape: one per-user span agg + the row-1 window,
    // a user-keyed join, |types| rollup.
    "ev_channel_retention" -> { (s, d) =>
      import s.implicits._
      val base = ev(s, d)
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val first = base.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type".as("first_type"))
      val spans = base.groupBy($"user_id")
        .agg(min($"ts_us").as("t0"), max($"ts_us").as("t_last"))
      first.join(spans, Seq("user_id"))
        .groupBy($"first_type")
        .agg(count(lit(1)).as("n_users"),
          sum(when($"t_last" >= $"t0" + lit(7L * DayUs), 1L).otherwise(0L)).as("n_retained"))
        .withColumn("retained_ppm", expr("(n_retained * 1000000) div n_users"))
        .orderBy($"first_type")
    },

    // monetization by acquisition channel — purchase value attributed
    // to the user's first-touch type (the third leg of the channel
    // table: ev_first_touch = conversion, ev_channel_retention =
    // staying, this = value; together they price a channel): per
    // channel, users, purchases, exact micro-value and floored
    // micro-value per acquired user (non-purchasers included — channel
    // economics divide by ACQUIRED users, not buyers). Scale shape:
    // row-1 window + per-user purchase agg, user-keyed left join,
    // |types| rollup; value sums in DECIMAL(28,6) (the ev_ltv rule).
    "ev_channel_value" -> { (s, d) =>
      import s.implicits._
      val base = ev(s, d)
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val first = base.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type".as("first_type"))
      val pv = base.filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("np"), sum(d6($"value")).as("sv"))
      first.join(pv, Seq("user_id"), "left")
        .groupBy($"first_type")
        .agg(count(lit(1)).as("n_users"),
          sum(coalesce($"np", lit(0L))).as("n_purchases"),
          sum(coalesce($"sv", lit(0).cast(DecimalType(28, 6)))).as("tv"))
        .select($"first_type", $"n_users", $"n_purchases",
          expr("CAST(tv * 1000000 AS BIGINT)").as("value_micro"),
          expr("CAST(tv * 1000000 AS BIGINT) div n_users").as("value_micro_per_user"))
        .orderBy($"first_type")
    },

    // peak traffic slot per type — the single (day-of-week, hour) cell
    // each event type concentrates in, with its exact ppm share of the
    // type's traffic (the one-line answer behind ev_weekday × ev_hourly:
    // WHERE to schedule the batch window / staff the pager). Arithmetic
    // dow (the ev_weekday rule), deterministic earliest-slot tie-break.
    // Scale shape: one partial agg onto the |types|×168 grid, share +
    // rank windows over that bounded relation.
    "ev_peak_slot" -> { (s, d) =>
      import s.implicits._
      val c = ev(s, d)
        .groupBy($"event_type",
          expr(s"((ts_us div $DayUs) + 3) % 7").as("dow"),
          expr(s"(ts_us % $DayUs) div ${3600L * 1000000L}").as("hour"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_type", sum($"n").over(Window.partitionBy($"event_type")))
      val w = Window.partitionBy($"event_type").orderBy($"n".desc, $"dow", $"hour")
      c.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"event_type", $"dow", $"hour", $"n",
          expr("(n * 1000000) div n_type").as("share_ppm"))
        .orderBy($"event_type")
    },

    // view→purchase conversion-lag distribution — the funnel-LATENCY
    // number ev_funnel_time's step stats don't give as a shape: per
    // converting user, seconds from the FIRST view to the first purchase
    // at-or-after it, rolled into power-of-2 second bands (band of
    // lag_s + 1 so instant conversions land in band 0 instead of a log
    // of zero). Scale shape: one conditional per-user partial agg for
    // the first view, a purchases-only join co-keyed on user_id, a
    // second per-user partial agg, then a ≤64-band rollup.
    "ev_conversion_lag" -> { (s, d) =>
      import s.implicits._
      val firstView = ev(s, d)
        .filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts_us").as("view_us"))
      val conv = ev(s, d)
        .filter($"event_type" === "purchase")
        .join(firstView, Seq("user_id"))
        .filter($"ts_us" >= $"view_us")
        .groupBy($"user_id").agg(min($"ts_us" - $"view_us").as("lag_us"))
        .withColumn("lag_s", expr("lag_us div 1000000"))
      conv
        .withColumn("band", expr("CAST(length(bin(lag_s + 1)) - 1 AS BIGINT)"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_users"), min($"lag_s").as("min_s"), max($"lag_s").as("max_s"))
        .orderBy($"band")
    },

    // per-type transaction-value band profile: power-of-2 cent bands
    // (exact floor(log₂) via length(bin(x))−1, zero libm) with counts,
    // extremes and ppm share — the value-distribution shape behind
    // fraud/price-tier monitoring, where a mean (ev_moments) hides a
    // bimodal split. Scale shape: one narrow cents projection, partial
    // agg onto the ≤64-band-per-type space, share window over that
    // bounded relation.
    "ev_value_bands" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .withColumn("cents", expr("CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)"))
        .withColumn("band", expr("CAST(length(bin(cents)) - 1 AS BIGINT)"))
        .groupBy($"event_type", $"band")
        .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"), max($"cents").as("max_cents"))
        .withColumn("n_type", sum($"n").over(Window.partitionBy($"event_type")))
        .select($"event_type", $"band", $"n", $"min_cents", $"max_cents",
          expr("(n * 1000000) div n_type").as("share_ppm"))
        .orderBy($"event_type", $"band")
    },

    // per-type day-of-week traffic profile (the staffing/batch-window
    // calendar every ops team keeps): counts + exact ppm share per
    // (type, dow). Day-of-week computed ARITHMETICALLY from the epoch
    // day ((days + 3) mod 7, 0 = Monday; 1970-01-01 was a Thursday) —
    // engine date functions disagree on week origin (Spark dayofweek is
    // 1=Sunday, DuckDB's 0=Sunday), integer arithmetic can't. Scale
    // shape: one partial agg onto the |types|×7 key space, share window
    // over that bounded relation.
    "ev_weekday" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy($"event_type", expr(s"((ts_us div $DayUs) + 3) % 7").as("dow"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_type", sum($"n").over(Window.partitionBy($"event_type")))
        .select($"event_type", $"dow", $"n",
          expr("(n * 1000000) div n_type").as("share_ppm"))
        .orderBy($"event_type", $"dow")
    },

    // per-day traffic-mix drift: KL(day's event-type mix ‖ overall mix)
    // in exact integer micro-nats — the composition-change alarm next to
    // ev_anomaly's volume alarm (a day can keep its volume while its mix
    // rotates toward errors). txt_kl's overflow-free factored form with
    // day as the stratum: KL = ln Q − ln n_d − Σ c·(ln qc − ln c)/n_d,
    // termwise non-negative gap (qc ≥ c since the corpus contains the
    // day), every ln the native ln_micro kernel, so the oracle replays
    // bit-identically. Scale shape: one (day, type) partial agg, the
    // marginal join on the |types|-row relation, a |days|-row rollup.
    "ev_mix_drift" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val tc = ev(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"), $"event_type")
        .agg(count(lit(1)).as("c"))
      val q = tc.groupBy($"event_type").agg(sum($"c").as("qc"))
      tc.join(q, Seq("event_type"))
        .groupBy($"day").agg(
          sum($"c").as("n_events"),
          sum($"c".cast(dec) * (expr("ln_micro(qc)") - expr("ln_micro(c)"))).as("s_gap"))
        .withColumn("q_total", sum($"n_events").over(Window.partitionBy(lit(1))))
        .withColumn("kl_micro",
          expr("ln_micro(q_total) - ln_micro(n_events) - (s_gap div CAST(n_events AS DECIMAL(38,0)))")
            .cast("long"))
        .select($"day", $"n_events", $"kl_micro")
        .orderBy($"day")
    },

    // conditional next-event entropy per current type — ev_markov's
    // one-number-per-state summary (H(next | cur): a type whose
    // follow-up is predictable routes to a narrow handler; a
    // high-entropy type fans out). Exact integer micro-nats: H(next|a)
    // = ln c_a − (Σ_b c_ab·ln c_ab)/c_a with the native fixed-point
    // ln_micro kernel and DECIMAL(38,0) sums — c_a ≥ c_ab termwise, so
    // every summed gap is non-negative (no negative floor-division
    // trap) and the oracle replays bit-identically. Scale shape:
    // ev_markov's per-user LEAD window, one (from, to) partial agg,
    // then a |types|-row rollup; ln_micro is narrow codegen per
    // transition-matrix row.
    "ev_entropy_rate" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, d)
        .select($"user_id", $"event_type", $"ts_us", $"event_id")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .groupBy($"from_type").agg(
          sum($"n").as("n_trans"),
          count(lit(1)).as("n_next_types"),
          sum($"n".cast(dec) * expr("ln_micro(n)")).as("sln"))
        .withColumn("h_micro",
          expr("ln_micro(n_trans) - (sln div CAST(n_trans AS DECIMAL(38,0)))").cast("long"))
        .select($"from_type", $"n_trans", $"n_next_types", $"h_micro")
        .orderBy($"from_type")
    },

    // per-user event-type entropy distribution — the engagement-breadth
    // histogram (single-type users sit in bucket 0; explorers spread
    // right; the shape shift is the cohort-health signal next to
    // ev_rfm). Centinat buckets (10⁻² nat) keep the output bounded —
    // entropy ≤ ln |event types|, so the bucket space never grows with
    // users — while staying fine enough that a near-uniform corpus
    // doesn't collapse to one row (the fixed-coarse-bucket trap). Same
    // exact-integer H as txt_entropy, per user. Scale shape: two chained
    // partial aggs ((user, type) then user), ln_micro narrow per row,
    // one bounded-bucket rollup — no windows at all.
    "ev_user_entropy" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      ev(s, d)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        .groupBy($"user_id").agg(
          sum($"c").as("n"),
          sum($"c".cast(dec) * expr("ln_micro(c)")).as("slc"))
        .withColumn("h_micro",
          expr("ln_micro(n) - (slc div CAST(n AS DECIMAL(38,0)))").cast("long"))
        .groupBy(expr("h_micro div 10000").as("bucket"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"bucket")
    },

    // weekly cohort accounting — the growth ledger every event platform
    // keeps: per calendar week, how many users were active, how many are
    // new (no activity the week before), retained (active both weeks),
    // and churn-next (active this week, gone the next). Every metric is
    // keyed by a week the user WAS active, so no phantom-week rows.
    // Scale shape: one distinct on (user, week) — a partial-agg shuffle
    // over the deduplicated activity relation — then three self-joins on
    // (user_id, week±1), all co-partitioned on the same keys; the final
    // per-week rollup is |weeks|-bounded. No window over raw events.
    "ev_churn" -> { (s, d) =>
      import s.implicits._
      val act = ev(s, d)
        .select($"user_id", expr(s"ts_us div ${7 * DayUs}").as("week"))
        .distinct()
      val prev = act.select($"user_id", ($"week" + 1).as("week"))
      val next = act.select($"user_id", ($"week" - 1).as("week"))
      val flags = act
        .join(prev.withColumn("had_prev", lit(1)), Seq("user_id", "week"), "left")
        .join(next.withColumn("has_next", lit(1)), Seq("user_id", "week"), "left")
      flags.groupBy($"week")
        .agg(count(lit(1)).as("active"),
          count(when($"had_prev".isNull, 1)).as("new_users"),
          count($"had_prev").as("retained"),
          count(when($"has_next".isNull, 1)).as("churn_next"))
        .orderBy($"week")
    },

    // semi-structured payload extraction — every event carries a JSON
    // `props` blob (the universal "loose bag of attributes" column of
    // event pipelines); parse it ONCE with the schema'd from_json (typed
    // struct, no per-row UDF, stays columnar) and profile the extracted
    // field per event type: coverage (parse failures surface as NULL, so
    // n - n_k is the malformed/missing count), range, mass, cardinality.
    // Scale shape: parse is a narrow per-row pass; the agg is one
    // partial-agg shuffle on event_type; the distinct-count EXPAND is
    // bounded by the small extracted-value domain per type.
    "ev_props" -> { (s, d) =>
      import s.implicits._
      events(s, d)
        .select($"event_type",
          from_json($"props", lit("k BIGINT")).getField("k").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          count($"k").as("n_k"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"),
          countDistinct($"k").as("n_distinct_k"))
        .orderBy($"event_type")
    },

    // RFM user segmentation — the classic lifecycle scoring (recency /
    // frequency / monetary) every event-analytics stack ships. One
    // partial-agg shuffle on user_id computes all three signals; the
    // corpus reference instant (global max ts) is a 1-row aggregate
    // composed on a literal key, never a global window. Scores use FIXED
    // thresholds (not ntile) deliberately: quantile scoring needs a
    // global sort per dimension, and fixed cutoffs are what production
    // RFM uses anyway (stable across refreshes). Monetary is summed and
    // COMPARED in exact DECIMAL before the display cast, so the bucket
    // boundaries can never drift on float rounding between engines.
    "ev_rfm" -> { (s, d) =>
      import s.implicits._
      val e = ev(s, d)
      val ref = e.agg(max($"ts_us").as("ref_us")).withColumn("one", lit(1))
      e.groupBy($"user_id")
        .agg(max($"ts_us").as("last_us"),
          count(lit(1)).as("frequency"),
          sum(when($"event_type" === "purchase", d6($"value"))
            .otherwise(d6(lit(0)))).as("mon"))
        .withColumn("one", lit(1)).join(ref, Seq("one"))
        .withColumn("recency_hours", expr(s"(ref_us - last_us) div $HourUs"))
        .withColumn("r_score",
          when($"recency_hours" <= 6, 4L).when($"recency_hours" <= 24, 3L)
            .when($"recency_hours" <= 72, 2L).otherwise(1L))
        .withColumn("f_score",
          when($"frequency" >= 75, 4L).when($"frequency" >= 67, 3L)
            .when($"frequency" >= 60, 2L).otherwise(1L))
        .withColumn("m_score",
          when($"mon" >= 800, 4L).when($"mon" >= 590, 3L)
            .when($"mon" >= 490, 2L).otherwise(1L))
        .select($"user_id", $"recency_hours", $"frequency",
          $"mon".cast("double").as("monetary"),
          expr("r_score * 100 + f_score * 10 + m_score").as("rfm_code"),
          when($"r_score" >= 3 && $"f_score" >= 3, "champion")
            .when($"r_score" >= 3, "promising")
            .when($"f_score" >= 3, "at_risk")
            .otherwise("hibernating").as("segment"))
        .orderBy($"user_id")
    },

    // time-series gap filling — densify the hourly (type, window) grid
    // and carry the last observed mean value forward over the synthetic
    // rows (zero-fill for counts, LOCF for the level signal): the
    // "ALIGN/FILL" operator time-series stores ship, without which
    // downstream trend/anomaly math silently skips empty hours. Scale
    // shape: events reduce FIRST (one partial-agg shuffle onto the
    // |types|×|hours|-bounded grid); the dense axis comes from one
    // sequence() explode of the 1-row min/max bounds crossed with the
    // distinct type relation, the fill join and LOCF window then run on
    // grid-sized data — never event-sized. Sums in exact DECIMAL, mean
    // in floored integer milli-units, so LOCF values replay bit-for-bit.
    "ev_fill" -> { (s, d) =>
      import s.implicits._
      val hourly = ev(s, d)
        .groupBy(($"ts_us" - ($"ts_us" % HourUs)).as("win_us"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(d6($"value")).as("sv"))
        // exact integer micro-units BEFORE the division: decimal `div`
        // scale handling differs across engines by one ulp, int64 never
        .withColumn("sv_micro", expr("CAST(sv * 1000000 AS BIGINT)"))
        .withColumn("avg_milli", expr("sv_micro div (n * 1000)"))
      val bounds = ev(s, d).agg(
        (min($"ts_us") - (min($"ts_us") % HourUs)).as("lo"),
        (max($"ts_us") - (max($"ts_us") % HourUs)).as("hi"))
      val grid = bounds
        .select(explode(expr(s"sequence(lo, hi, $HourUs)")).as("win_us"))
        .crossJoin(ev(s, d).select($"event_type").distinct())
      val w = Window.partitionBy($"event_type").orderBy($"win_us")
      grid.join(hourly, Seq("win_us", "event_type"), "left")
        .select($"win_us", $"event_type",
          coalesce($"n", lit(0L)).as("n"),
          $"n".isNull.as("filled"),
          last($"avg_milli", ignoreNulls = true).over(w).as("locf_avg_milli"))
        .orderBy($"event_type", $"win_us")
    },

    // robust outlier audit per type: median + MAD instead of ev_anomaly's
    // mean/σ z-score (one fat-finger event shifts a mean; it cannot move
    // a median) — count of events beyond 3 MADs. Exactness: values are
    // quantized to integer micro-units FIRST, so both medians interpolate
    // exact (half-)integers and every comparison is integer math — the
    // outputs carry ×2/×4 scalings (med_micro_x2, mad_micro_x4) to stay
    // integers; |v−med| > 3·MAD replays as 2·dev2 > 3·mad4. Scale shape:
    // two grouped exact percentiles + one counting agg, all shuffling
    // the |types| key space; the per-type medians broadcast back.
    "ev_mad" -> { (s, d) =>
      import s.implicits._
      val e = ev(s, d).select($"event_type",
        expr("CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT)").as("v"))
      val med = e.groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").as("med2"))
      val dev = e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev2", abs($"v" * 2 - $"med2"))
      val mad = dev.groupBy($"event_type")
        .agg(expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy($"event_type")
        .agg(max($"n_events").as("n_events"),
          max($"med2").as("med_micro_x2"),
          max($"mad4").as("mad_micro_x4"),
          sum(when($"dev2" * 2 > $"mad4" * 3, 1L).otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_ppm", expr("(n_outliers * 1000000) div n_events"))
        .orderBy($"event_type")
    },

    // position-based (U-shaped 40/20/40) multi-touch attribution — the
    // complement of ev_attribution's last-touch: each purchase's value is
    // credited across ALL the non-purchase touches of its journey (the
    // stretch since the user's previous purchase): 40 % first touch,
    // 40 % last, the middle 20 % split evenly. Exact integer micro-unit
    // arithmetic with the division remainders pinned to the first touch,
    // so each journey's credits sum to EXACTLY the purchase value (the
    // conservation law StreamAttributionSpec-style specs can hold on to).
    // Scale shape: one user-partitioned window pass numbers journeys,
    // one more ranks touches within (user, journey), the purchase-value
    // join is on (user, journey), and the report is a |channels| partial
    // agg — no self-joins, nothing driver-side.
    "ev_attribution_pos" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val base = ev(s, d)
        .withColumn("v", expr("CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT)"))
        .withColumn("journey", coalesce(
          sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(wPrev),
          lit(0L)))
      val purch = base.filter($"event_type" === "purchase")
        .select($"user_id", $"journey", $"v")
      val wj = Window.partitionBy($"user_id", $"journey").orderBy($"ts_us", $"event_id")
      val wjAll = Window.partitionBy($"user_id", $"journey")
      val ranked = base.filter($"event_type" =!= "purchase")
        .select($"user_id", $"journey", $"event_type", $"ts_us", $"event_id")
        .withColumn("rnk", row_number().over(wj).cast("long"))
        .withColumn("k", count(lit(1)).over(wjAll))
      ranked.join(purch, Seq("user_id", "journey"))
        .withColumn("f", expr("(v * 2) div 5"))
        .withColumn("mid", expr("v - 2 * ((v * 2) div 5)"))
        .withColumn("m", $"k" - 2)
        .withColumn("credit", expr(
          """CASE WHEN k = 1 THEN v
            |     WHEN rnk = 1 AND k = 2 THEN f + mid
            |     WHEN rnk = 1 THEN f + (mid - m * (mid div m))
            |     WHEN rnk = k THEN f
            |     ELSE mid div m END""".stripMargin))
        .groupBy($"event_type".as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum($"credit").as("credited_micro"))
        .orderBy($"channel")
    },

    // Kaplan-Meier survival ("time from first touch to first purchase"):
    // the product-limit estimator over per-user durations, with users who
    // never purchase right-censored at the stream horizon. Convention:
    // deaths at t precede censorings at t (both still count at risk at
    // t). The survival curve is EXACT integer arithmetic — each step is
    // s ← s·(n−d) div n in ppm, replayed in DuckDB by a recursive CTE —
    // so no float product can diverge per engine. Scale shape: ONE
    // user_id partial-agg shuffle over the stream; everything after is a
    // ≤|calendar-days| histogram (30 rows here, bounded by the observed
    // time span, never by |users|), so the unpartitioned window and the
    // one-row array fold are constant-size at any sf.
    "ev_survival" -> { (s, d) =>
      import s.implicits._
      val e = ev(s, d).select($"user_id",
        expr(s"ts_us div $DayUs").as("day"), $"event_type")
      val horizon = e.agg(max($"day").as("h"))
      val perUser = e.groupBy($"user_id").agg(
        min($"day").as("first_day"),
        min(when($"event_type" === "purchase", $"day")).as("purch_day"))
      val durs = perUser.crossJoin(broadcast(horizon)).select(
        when($"purch_day".isNotNull, $"purch_day" - $"first_day")
          .otherwise($"h" - $"first_day").as("dur"),
        $"purch_day".isNotNull.as("observed"))
      val hist = durs.groupBy($"dur").agg(
        count(lit(1)).as("n_total"),
        sum(when($"observed", 1L).otherwise(0L)).as("d_events"))
      // reverse-cumulative risk set over the tiny calendar-bounded hist
      val wDesc = Window.orderBy($"dur".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = hist.withColumn("n_risk", sum($"n_total").over(wDesc))
        .filter($"d_events" > 0)
        .select($"dur", $"n_risk", $"d_events")
      risk.agg(sort_array(collect_list(struct($"dur", $"n_risk", $"d_events"))).as("a"))
        .select($"a", posexplode($"a"))
        .select($"col.dur".as("t_day"),
          $"col.n_risk".as("n_risk"),
          $"col.d_events".as("n_events"),
          // acc ≤ 10⁶ but n_risk is |users|-scale, so the per-step
          // product is DECIMAL(38,0)-guarded (a long acc·(n−d) wraps
          // past ~9·10¹² users); div returns the exact floored long
          expr("""aggregate(slice(a, 1, pos + 1), CAST(1000000 AS BIGINT),
                 (acc, x) -> (CAST(acc AS DECIMAL(38,0)) * (x.n_risk - x.d_events))
                   div CAST(x.n_risk AS DECIMAL(38,0)))""")
            .as("surv_ppm"))
        .orderBy($"t_day")
    },

    // activity-concentration audit (the "how skewed is this corpus by
    // contributor" question a training-data pipeline must answer before
    // per-user caps): exact Gini coefficient and top-decile share of the
    // per-user event-count distribution. The rank-weighted sum Σ i·c_i is
    // computed from the count-of-counts HISTOGRAM (for a run of m users
    // tied at count c after p predecessors the rank sum is
    // m·p + m(m+1)/2), so no window ever runs over |users| rows — the
    // only |users|-scale stage is the user_id partial agg; the histogram
    // is |distinct activity levels|, bounded by max per-user activity.
    // All arithmetic is DECIMAL(38,0) integer with ppm floor division.
    // autocorrelation diagnostic for the hourly event series (does the
    // stream remember itself one hour / one day back? — the seasonality
    // test ev_seasonality's profile implies but never measures): Pearson
    // r² at lags 1 and 24 over observed-hour pairs, q52_regr's rule —
    // all sums and normal-equation terms EXACT integers in
    // DECIMAL(38,0), floats confined to the final single IEEE divisions
    // of identical operands; the sign is reported separately as exact
    // integer so no sqrt is ever taken. Scale shape: one hour-keyed
    // partial agg of the stream, then a self equi-join and 1-row agg of
    // the ≤|hours| series — calendar-bounded, never |events|-wide.
    "ev_autocorr" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val hourly = ev(s, d).select(expr(s"ts_us div $HourUs").as("h"))
        .groupBy($"h").agg(count(lit(1)).as("x"))
      def atLag(lag: Int): DataFrame = {
        val b = hourly.select(($"h" - lag).as("h"), $"x".as("y"))
        hourly.join(b, Seq("h"))
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x".cast(dec) * $"y").as("sxy"),
            sum($"x".cast(dec) * $"x").as("sxx"),
            sum($"y".cast(dec) * $"y").as("syy"))
          // the moment sums sx/sy are plain longs; every cross product
          // is widened to DECIMAL(38,0) BEFORE the arithmetic (a bare
          // sx * sy is a long×long multiply that wraps past ~3·10⁹
          // matched events — the q52_regr overflow class)
          .withColumn("num", expr(
            "n * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
          .withColumn("den1", expr(
            "n * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
          .withColumn("den2", expr(
            "n * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
          .select(lit(lag.toLong).as("lag"), $"n".as("n_pairs"),
            expr("""CAST(CASE WHEN num > 0 THEN 1
                         WHEN num < 0 THEN -1
                         ELSE 0 END AS BIGINT)""").as("r_sign"),
            expr("""CASE WHEN den1 > 0 AND den2 > 0
                    THEN CAST(FLOOR(
                      (CAST(num AS DOUBLE) / CAST(den1 AS DOUBLE))
                      * (CAST(num AS DOUBLE) / CAST(den2 AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT)
                    ELSE 0 END""").as("r2_ppm"))
      }
      // a pair-less lag (stream shorter than the lag) emits NO row on
      // either engine — the oracle's GROUP BY lag drops it, so must we
      atLag(1).unionByName(atLag(24))
        .filter($"n_pairs" > 0)
        .orderBy($"lag")
    },

    // cohort lifetime-value curves (the growth-analytics staple): users
    // cohorted by first-event week; per (cohort, weeks-since) the
    // purchase count, value, and cumulative LTV per cohort user — all in
    // exact integer micro-units (the ev_abtest/ev_fill rule: DECIMAL sum
    // first, one integral division at the end). Scale shape: one user_id
    // partial-agg shuffle for cohorts, one (cohort, offset) partial agg
    // of the purchase stream; the running sum's window is partitioned by
    // cohort over the ≤|calendar-weeks| offsets of the ALREADY-AGGREGATED
    // relation — |cohorts|×|weeks| rows total, never |users|.
    "ev_ltv" -> { (s, d) =>
      import s.implicits._
      val e = ev(s, d).select($"user_id",
        expr(s"ts_us div $WeekUs").as("week"), $"event_type", $"value")
      val cohort = e.groupBy($"user_id").agg(min($"week").as("cohort"))
      val sizes = cohort.groupBy($"cohort").agg(count(lit(1)).as("cohort_users"))
      val p = e.filter($"event_type" === "purchase")
        .join(cohort, Seq("user_id"))
        .withColumn("week_offset", $"week" - $"cohort")
        .groupBy($"cohort", $"week_offset")
        .agg(sum(d6($"value")).as("sv"), count(lit(1)).as("n_purchases"))
      val w = Window.partitionBy($"cohort").orderBy($"week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.withColumn("cum_sv", sum($"sv").over(w))
        .join(sizes, Seq("cohort"))
        .select($"cohort", $"week_offset", $"cohort_users", $"n_purchases",
          expr("CAST(sv * 1000000 AS BIGINT)").as("week_value_micro"),
          expr("CAST(cum_sv * 1000000 AS BIGINT) div cohort_users")
            .as("cum_ltv_micro_per_user"))
        .orderBy($"cohort", $"week_offset")
    },

    "ev_gini" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val counts = ev(s, d).groupBy($"user_id").agg(count(lit(1)).as("c"))
      val hist = counts.groupBy($"c").agg(count(lit(1)).as("m"))
      val n1 = hist.agg(sum($"m").as("n"))
      val wAsc = Window.orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = Window.orderBy($"c".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val h2 = hist
        .withColumn("p", sum($"m").over(wAsc) - $"m")   // users less active
        .withColumn("pd", sum($"m").over(wDesc) - $"m") // users more active
        .crossJoin(broadcast(n1))
        .withColumn("k", expr("n div 10"))
        // of the k most-active users, how many sit at this count level
        // (ties at the decile boundary split exactly)
        .withColumn("take", greatest(lit(0L), least($"m", $"k" - $"pd")))
      // sic2 = 2·Σ i·c_i = Σ c·(2mp + m² + m): multiplies only, the /2 is
      // folded into the Gini numerator so every step stays integer-exact
      val g = h2.agg(
        sum($"c".cast(dec) * (lit(2).cast(dec) * $"m".cast(dec) * $"p".cast(dec) +
          $"m".cast(dec) * $"m".cast(dec) + $"m".cast(dec))).as("sic2"),
        max($"n").as("n"),
        max($"k").as("k"),
        sum($"c".cast(dec) * $"m".cast(dec)).as("tot"),
        sum($"c".cast(dec) * $"take".cast(dec)).as("top"))
      g.select(
        $"n".as("n_users"),
        $"tot".cast("long").as("n_events"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * (sic2 - (n + 1) * tot))
                div (CAST(n AS DECIMAL(38,0)) * tot)""").as("gini_ppm"),
        $"k".as("top_decile_users"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * top) div tot").as("top_decile_ppm"))
    },

    // Lorenz curve of user activity (the full concentration CURVE behind
    // ev_gini's single number): users ordered by event count are sliced
    // into 10 equal-population deciles — boundary ties split exactly, the
    // ev_gini take rule — each reporting its population, event mass and
    // the cumulative share of all events in ppm. Scale shape: one
    // per-user partial agg, then everything (including the rank windows)
    // runs on the count-level HISTOGRAM — |distinct counts| rows, an
    // aggregate of the data — never a per-user global sort.
    "ev_lorenz" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val hist = ev(s, d).groupBy($"user_id").agg(count(lit(1)).as("c"))
        .groupBy($"c").agg(count(lit(1)).as("m"))
      val wAsc = Window.orderBy($"c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val n1 = hist.agg(sum($"m").as("n"),
        sum($"c".cast(dec) * $"m".cast(dec)).as("tot"))
      val wCum = Window.orderBy($"decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("p", sum($"m").over(wAsc) - $"m")
        .crossJoin(broadcast(n1))
        .select($"c", $"m", $"p", $"n", $"tot",
          explode(sequence(lit(1L), lit(10L))).as("decile"))
        // users ranked (p, p+m] at this count level vs the decile's
        // rank interval ((n(k-1)) div 10, (nk) div 10]
        .withColumn("take", greatest(lit(0L),
          least($"p" + $"m", expr("(n * decile) div 10")) -
            greatest($"p", expr("(n * (decile - 1)) div 10"))))
        .filter($"take" > 0)
        .groupBy($"decile")
        .agg(sum($"take").as("n_users"),
          sum($"c".cast(dec) * $"take".cast(dec)).as("ev"),
          max($"tot").as("tot"))
        .withColumn("cum", sum($"ev").over(wCum))
        .select($"decile", $"n_users",
          $"ev".cast("long").as("n_events"),
          $"cum".cast("long").as("cum_events"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * cum) div tot").as("cum_share_ppm"))
        .orderBy($"decile")
    },

    // Benford first-digit audit (the classic fabricated-data smell test,
    // per event type over the value column in exact cents): the observed
    // leading-digit mix vs the log10(1+1/d) reference shares, both in
    // ppm. The reference shares are integer CONSTANTS summing to exactly
    // 10⁶ — no log is evaluated on either engine, so the whole audit is
    // integer arithmetic after one deterministic double→cents floor.
    // Scale shape: a narrow projection + a partial agg onto the
    // (event_type × 9)-digit key space; the total runs per type via a
    // partitioned window over that tiny relation.
    "ev_benford" -> { (s, d) =>
      import s.implicits._
      val digits = ev(s, d)
        .select($"event_type",
          expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
        .filter($"cents" > 0)
        .select($"event_type",
          substring($"cents".cast("string"), 1, 1).cast("long").as("digit"))
      val perType = Window.partitionBy($"event_type")
      digits.groupBy($"event_type", $"digit").agg(count(lit(1)).as("n"))
        .withColumn("t", sum($"n").over(perType))
        .select($"event_type", $"digit", $"n",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n) div t").as("obs_ppm"),
          expr(BenfordCase).as("exp_ppm"))
        .withColumn("dev_ppm", abs($"obs_ppm" - $"exp_ppm"))
        .orderBy($"event_type", $"digit")
    },

    // day-over-day volatility per type (the NOISE magnitude readout
    // beside ev_trend's slope and ev_cusum's drift): total variation,
    // floor-mean absolute change and the worst up/down spike of the
    // daily count series — consecutive-calendar-day steps only, via one
    // equi-join of the daily rollup on day+1 (absent days drop the
    // step, identically on both engines). Scale shape: one (type, day)
    // partial agg over the stream, then everything runs on the
    // |types|×|days| calendar-bounded rollup.
    "ev_volatility" -> { (s, d) =>
      import s.implicits._
      val daily = ev(s, d)
        .groupBy($"event_type", expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
      daily.join(
        daily.select($"event_type", ($"day" + 1L).as("day"), $"x".as("xp")),
        Seq("event_type", "day"))
        .withColumn("dlt", $"x" - $"xp")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_steps"),
          sum(abs($"dlt")).as("total_variation"),
          max($"dlt").as("max_up"),
          min($"dlt").as("max_down"))
        .withColumn("mean_abs_change",
          expr("total_variation div n_steps"))
        .select($"event_type", $"n_steps", $"total_variation",
          $"mean_abs_change", $"max_up", $"max_down")
        .orderBy($"event_type")
    },

    // session-depth histogram (what ev_session's per-user counts hide:
    // are sessions one-shot bounces or long engaged runs?): the same
    // 30-min gap rule, sessions numbered by the running new-session sum,
    // depths bucketed on powers of two — exact integer CASE, no log.
    // Scale shape: user-partitioned windows (never a global funnel), a
    // (user, session) partial agg, then a 5-bucket final agg with a
    // broadcast 1-row session total.
    "ev_session_hist" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val depth = ev(s, d)
        .withColumn("new_session",
          when(($"ts_us" - lag($"ts_us", 1).over(w)) > GapUs ||
            lag($"ts_us", 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum($"new_session")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"sid").agg(count(lit(1)).as("n"))
      val tot = depth.agg(count(lit(1)).as("t"))
      depth.select(expr(DepthBucketCase).as("bucket"), $"n")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_sessions"), sum($"n").as("n_events"))
        .crossJoin(broadcast(tot))
        .select($"bucket", $"n_sessions", $"n_events",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_sessions) div CAST(t AS DECIMAL(38,0))")
            .as("share_ppm"))
        .orderBy($"bucket")
    },

    // exact higher-moment profile per type (the value-distribution
    // health check behind ev_anomaly's mean/σ: a skewed or fat-tailed
    // value stream invalidates the 2σ rule): two-pass centered moments —
    // integer floor-mean first, then EXACT DECIMAL sums of d, d², d³
    // about it (centering is what keeps Σd³ inside 38 digits at any
    // per-type count; the raw Σx³ wraps past ~10⁸ rows) — variance and
    // skewness then single identically-parenthesized IEEE chains of
    // those exact operands, deterministic on every engine. Scale shape:
    // two |types|-keyed partial aggs + a |types|-row broadcast.
    "ev_moments" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val cents = ev(s, d).select($"event_type",
        expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").as("c"))
      val means = cents.groupBy($"event_type")
        .agg(sum($"c".cast(dec)).as("s1"), count(lit(1)).as("n0"))
        .select($"event_type", expr("CAST(s1 div n0 AS BIGINT)").as("mc"))
      cents.join(broadcast(means), Seq("event_type"))
        .withColumn("dv", $"c" - $"mc")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), max($"mc").as("mean_cents"),
          sum($"dv".cast(dec)).as("sd1"),
          // widen BEFORE multiplying (the q52/sd3 rule): dv*dv in LONG
          // wraps silently past |dv| ~ 3.0e9 cents under non-ANSI Spark
          sum($"dv".cast(dec) * $"dv").as("sd2"),
          sum($"dv".cast(dec) * $"dv" * $"dv").as("sd3"))
        .withColumn("a", expr("n * sd2 - sd1 * sd1"))
        .select($"event_type", $"n", $"mean_cents",
          expr("""CAST(FLOOR(CAST(a AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1000.0 + 0.5) AS BIGINT)""")
            .as("var_milli"),
          expr(SkewMilliExpr).as("skew_milli"))
        .orderBy($"event_type")
    },

    // peak sliding 60-min load per type (the capacity number behind
    // ev_hourly's calendar profile: the worst trailing hour, wherever
    // it lands): minute-bucket counts, a value-RANGE window summing the
    // trailing 60 minutes (gaps handled by the value frame, no fill),
    // then the per-type max and the EARLIEST minute achieving it.
    // Scale shape: one (type, minute) partial agg, windows partitioned
    // by type over the calendar-bounded minute series, a |types|-row
    // broadcast of the peaks.
    "ev_peak" -> { (s, d) =>
      import s.implicits._
      val perMin = ev(s, d)
        .groupBy($"event_type", expr("ts_us div 60000000").as("minute"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"event_type").orderBy($"minute")
        .rangeBetween(-59, 0)
      val rolled = perMin.withColumn("roll", sum($"n").over(w))
      val peak = rolled.groupBy($"event_type").agg(max($"roll").as("pk"))
      rolled.join(broadcast(peak), Seq("event_type"))
        .groupBy($"event_type")
        .agg(max($"roll").as("peak_events"),
          min(when($"roll" === $"pk", $"minute")).as("peak_minute"),
          count(lit(1)).as("n_active_minutes"),
          expr("(sum(n) * 1000) div count(1)").as("mean_per_min_milli"))
        .orderBy($"event_type")
    },

    // engagement-depth histogram (distinct active DAYS per user — the
    // dimension ev_wau's weekly series and ev_retention's day-offset
    // grid both integrate away): the EXACT count-of-counts, no bucket
    // scheme — a user's distinct-day count is bounded by the stream's
    // calendar span, so the key space is tiny at any sf and the full
    // distribution shape survives. Scale shape: one user-keyed
    // distinct-day partial agg, a |span-days| final agg, a broadcast
    // 1-row user total; ppm DECIMAL-guarded.
    "ev_active_days" -> { (s, d) =>
      import s.implicits._
      val days = ev(s, d)
        .groupBy($"user_id")
        .agg(countDistinct(expr("ts_us div 86400000000")).as("n_days"))
      val tot = days.agg(count(lit(1)).as("t"))
      days.groupBy($"n_days")
        .agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(tot))
        .select($"n_days", $"n_users",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_users) div CAST(t AS DECIMAL(38,0))")
            .as("share_ppm"))
        .orderBy($"n_days")
    },

    // per-type user-concentration Simpson index (ev_gini scores the
    // GLOBAL activity skew; this asks, per event type, "if two of these
    // events are drawn at random, how likely are they from the same
    // user?" — the bot/whale detector for a single stream): exact
    // integer end to end, Σc(c−1) summed in DECIMAL(38,0) (c² wraps a
    // long past c≈3·10⁹) and one ppm floor division — immune to the
    // per-engine log rounding an entropy score would carry. Scale
    // shape: one (type, user) partial-agg shuffle, then a |types|-row
    // final agg.
    "ev_user_simpson" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      ev(s, d)
        .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("c"))
        .groupBy($"event_type")
        .agg(sum($"c").as("n_events"), count(lit(1)).as("n_users"),
          sum(($"c".cast(dec) * ($"c" - 1))).as("coll"),
          max($"c").as("mx"))
        .select($"event_type", $"n_events", $"n_users",
          expr("""CASE WHEN n_events > 1 THEN
                 |  (coll * 1000000) div (CAST(n_events AS DECIMAL(38,0)) * (n_events - 1))
                 |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("simpson_ppm"),
          expr("(CAST(mx AS DECIMAL(38,0)) * 1000000) div CAST(n_events AS DECIMAL(38,0))")
            .as("top_user_share_ppm"))
        .orderBy($"event_type")
    },

    // per-state next-step predictability (the concentration number
    // behind ev_markov's transition matrix: P[two random next-steps
    // from this state coincide] — a state whose next step is near-
    // deterministic is a funnel edge, one near-uniform is a browse
    // hub): Simpson over each from-state's destination counts, exact
    // DECIMAL(38,0) collision sums + ppm floor division, plus the top
    // destination's exact share. Scale shape: the same user-partitioned
    // lead as ev_markov, one (from, to) partial agg, a |types|-row agg.
    "ev_next_simpson" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(s, d)
        .select($"user_id", $"event_type", $"ts_us", $"event_id")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
        .groupBy($"from_type")
        .agg(sum($"n").as("n_trans"), count(lit(1)).as("n_dest"),
          sum(($"n".cast(dec) * ($"n" - 1))).as("coll"),
          max($"n").as("mx"))
        .select($"from_type", $"n_trans", $"n_dest",
          expr("""CASE WHEN n_trans > 1 THEN
                 |  (coll * 1000000) div (CAST(n_trans AS DECIMAL(38,0)) * (n_trans - 1))
                 |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("simpson_ppm"),
          expr("(CAST(mx AS DECIMAL(38,0)) * 1000000) div CAST(n_trans AS DECIMAL(38,0))")
            .as("top_next_ppm"))
        .orderBy($"from_type")
    },

    // user-lifetime histogram (the calendar SPAN from first to last
    // activity, exact day resolution — the third engagement axis beside
    // ev_active_days' density and ev_session_hist's depth; span long +
    // density low = a lapsed-and-returned user, span short = a one-burst
    // visitor): exact integer day spans from the per-user min/max
    // timestamp — the key space is bounded by the stream's calendar
    // span, so no bucket scheme is needed at any sf. Scale shape: one
    // user-keyed min/max partial agg, a |span-days| final agg, a
    // broadcast 1-row user total.
    "ev_lifecycle" -> { (s, d) =>
      import s.implicits._
      val spans = ev(s, d)
        .groupBy($"user_id")
        .agg(expr("(max(ts_us) - min(ts_us)) div 86400000000").as("span_days"))
      val tot = spans.agg(count(lit(1)).as("t"))
      spans.groupBy($"span_days").agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(tot))
        .select($"span_days", $"n_users",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_users) div CAST(t AS DECIMAL(38,0))")
            .as("share_ppm"))
        .orderBy($"span_days")
    },

    // daily new-vs-returning split — the growth-vs-retention
    // decomposition every DAU chart hides (a flat DAU can be 90 % churn
    // backfilled by acquisition; ev_cohort shows the decay matrix, this
    // shows the daily composition headline): per epoch day, active
    // users, first-ever-seen users, returning = rest, exact new-share
    // ppm. Scale shape: one (user, day) distinct (the corpus-width
    // shuffle), a per-user min-day partial agg, a user-co-keyed join,
    // |days|-row rollup.
    "ev_new_vs_returning" -> { (s, d) =>
      import s.implicits._
      val e = ev(s, d).select($"user_id", expr(s"ts_us div $DayUs").as("day"))
      val first = e.groupBy($"user_id").agg(min($"day").as("first_day"))
      e.distinct().join(first, Seq("user_id"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_users"),
          sum(when($"day" === $"first_day", 1L).otherwise(0L)).as("n_new"))
        .select($"day", $"n_users", $"n_new",
          ($"n_users" - $"n_new").as("n_returning"),
          expr("(n_new * 1000000) div n_users").as("new_ppm"))
        .orderBy($"day")
    },

    // day-of-week × hour-of-day traffic heat grid — the staffing/
    // maintenance-window table (ev_weekday profiles days, ev_hourly
    // hours; capacity planning needs the JOINT cell — a Monday-9am
    // peak and a Sunday-3am trough are invisible in either marginal):
    // 168 calendar-bounded cells, exact ppm share each. One partial agg
    // onto the fixed grid, broadcast 1-row total — no windows.
    "ev_dow_hour_heat" -> { (s, d) =>
      import s.implicits._
      val cells = ev(s, d)
        .groupBy(expr(s"((ts_us div $DayUs) + 3) % 7").as("dow"),
          expr(s"(ts_us div $HourUs) % 24").as("hod"))
        .agg(count(lit(1)).as("n"))
      cells.crossJoin(broadcast(cells.agg(sum($"n").as("t"))))
        .select($"dow", $"hod", $"n",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n) div CAST(t AS DECIMAL(38,0))")
            .cast("long").as("share_ppm"))
        .orderBy($"dow", $"hod")
    },

    // active-day return-gap histogram — retention at the granularity
    // users actually return on (ev_interarrival measures event gaps,
    // which conflate within-session bursts with comebacks; this
    // measures gaps between consecutive ACTIVE DAYS — the habit curve
    // a "day-N retention" target is secretly about): per gap length in
    // days, occurrences + ppm share. Scale shape: one (user, day)
    // distinct, a user-partitioned lag window over per-user day lists,
    // calendar-bounded histogram rollup.
    "ev_day_gaps" -> { (s, d) =>
      import s.implicits._
      val du = ev(s, d)
        .select($"user_id", expr(s"ts_us div $DayUs").as("day")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      val gaps = du.withColumn("prev", lag($"day", 1).over(w))
        .filter($"prev".isNotNull)
        .select(($"day" - $"prev").as("gap_days"))
      gaps.groupBy($"gap_days").agg(count(lit(1)).as("n_gaps"))
        .crossJoin(broadcast(gaps.agg(count(lit(1)).as("t"))))
        .select($"gap_days", $"n_gaps",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_gaps) div CAST(t AS DECIMAL(38,0))")
            .cast("long").as("share_ppm"))
        .orderBy($"gap_days")
    },

    // peak-to-mean hourly capacity factor per type — the one number a
    // capacity plan is sized by (ev_peak/ev_peak_rate FIND the peak;
    // this NORMALIZES it: provisioned-for-peak over provisioned-for-
    // mean, with idle hours counted because capacity is paid for the
    // whole span): exact milli peak factor via cross-multiplication
    // plus the active-hours duty-cycle ppm. One (type, hour) partial
    // agg then a |types|-row rollup.
    "ev_peak_factor" -> { (s, d) =>
      import s.implicits._
      ev(s, d)
        .groupBy($"event_type", expr(s"ts_us div $HourUs").as("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_active_hours"), sum($"n").as("n_events"),
          max($"n").as("peak_hour_n"),
          (max($"h") - min($"h") + 1).as("span_hours"))
        .select($"event_type", $"span_hours", $"n_active_hours", $"n_events",
          $"peak_hour_n",
          // peak_hour_n·10³·span_hours can pass 2⁶³ on a ~1e11-peak corpus
          // over a multi-year span — DECIMAL(38,0) like the sibling
          // cross-multiplied ratios; duty_ppm's n_active_hours ≤ span_hours
          // (calendar hours, ~1e5 for decades) keeps 10⁶× inside BIGINT
          expr("""CAST((CAST(peak_hour_n AS DECIMAL(38,0)) * 1000 * span_hours)
                 |  div CAST(n_events AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
            .as("peak_factor_milli"),
          expr("(n_active_hours * 1000000) div span_hours").as("duty_ppm"))
        .orderBy($"event_type")
    },

    // per-type weekly volume trend — the growth/decay direction of each
    // event type as an exact integer OLS slope (ev_trend fits the
    // global series; mix shifts hide there — a product where "error"
    // grows while "purchase" decays can show a flat total): weekly
    // epoch counts per type, slope = (n·Σwc − Σw·Σc)·10³ div
    // (n·Σw² − (Σw)²) in DECIMAL(38,0) cross-multiplication (q52's
    // closed form, zero float math); a single-week type reports NULL
    // rather than dividing by zero. Scale shape: one (type, week)
    // partial agg, then a |types|-row rollup.
    "ev_type_trend" -> { (s, d) =>
      import s.implicits._
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      ev(s, d)
        .groupBy($"event_type", expr(s"ts_us div $WeekUs").as("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy($"event_type")
        .agg(count(lit(1)).cast(dec).as("n"),
          sum($"w").cast(dec).as("sw"),
          sum($"c").cast(dec).as("sc"),
          sum($"w".cast(dec) * $"c").as("swc"),
          sum($"w".cast(dec) * $"w").as("sww"))
        .select($"event_type",
          $"n".cast("long").as("n_weeks"), $"sc".cast("long").as("n_events"),
          expr("""CASE WHEN n * sww - sw * sw = 0 THEN NULL
                 |  ELSE CAST(((n * swc - sw * sc) * 1000) div (n * sww - sw * sw) AS BIGINT)
                 |END""".stripMargin).as("slope_milli"))
        .orderBy($"event_type")
    }
  )

  /** power-of-two session-depth buckets — identical CASE text on both
    * engines, lexicographically ordered coarse-to-fine
    */
  private val DepthBucketCase: String =
    """CASE WHEN n = 1 THEN 'b0_1'
      |     WHEN n <= 3 THEN 'b1_2_3'
      |     WHEN n <= 7 THEN 'b2_4_7'
      |     WHEN n <= 15 THEN 'b3_8_15'
      |     ELSE 'b4_ge_16' END""".stripMargin

  /** skewness g1 = B/A^1.5 in milli-units from the exact centered sums:
    * B's n²·Σd³ term can exceed 38 digits, so B is evaluated in DOUBLE
    * from the exact DECIMAL operands with this exact parenthesization —
    * both engines run the same IEEE op sequence, so the floor is
    * engine-identical. A ≤ 0 (constant stream) → 0.
    */
  private val SkewMilliExpr: String =
    """CASE WHEN a > 0 THEN
      |  CAST(FLOOR((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(sd3 AS DOUBLE)
      |        - (3.0 * CAST(n AS DOUBLE)) * (CAST(sd1 AS DOUBLE) * CAST(sd2 AS DOUBLE))
      |        + (2.0 * CAST(sd1 AS DOUBLE)) * (CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)))
      |      / (CAST(a AS DOUBLE) * sqrt(CAST(a AS DOUBLE))) * 1000.0 + 0.5) AS BIGINT)
      |ELSE CAST(0 AS BIGINT) END""".stripMargin

  /** floor(log10(1+1/d)·10⁶+0.5) for d = 1..9 — the Benford reference
    * shares as integer ppm constants (they sum to exactly 10⁶), shared
    * verbatim by the Spark side and the DuckDB oracle so no engine ever
    * evaluates a log
    */
  private val BenfordCase: String =
    """CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
      |  WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
      |  WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
      |  ELSE 45757 END AS BIGINT)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ev_srm" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS arm
        |  FROM events),
        |c AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n_a,
        |    CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n_b,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM g GROUP BY 1)
        |SELECT event_type, n_a, n_b, n,
        |  CAST((ABS(n_a * 2 - n) * 1000000) // n AS BIGINT) AS dev_ppm,
        |  CAST(CASE WHEN (ABS(n_a * 2 - n) * 1000000) // n > 20000 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
        |FROM c ORDER BY event_type""".stripMargin,

    "ev_cusum" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_us,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, win_us, x,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours,
        |    CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT)
        |      // COUNT(*) OVER (PARTITION BY event_type) AS mean_x
        |  FROM hourly),
        |st2 AS (
        |  SELECT *, GREATEST(1, mean_x // 10) AS slack FROM st),
        |pp AS (
        |  SELECT *,
        |    SUM(x - mean_x - slack) OVER (PARTITION BY event_type ORDER BY win_us) AS p
        |  FROM st2),
        |ss AS (
        |  SELECT *,
        |    p - MIN(p) OVER (PARTITION BY event_type ORDER BY win_us) AS s
        |  FROM pp),
        |sm AS (
        |  SELECT *, MAX(s) OVER (PARTITION BY event_type) AS smax FROM ss)
        |SELECT event_type, CAST(MAX(n_hours) AS BIGINT) AS n_hours,
        |  CAST(MAX(mean_x) AS BIGINT) AS mean_x,
        |  CAST(MAX(s) AS BIGINT) AS max_cusum,
        |  CAST(MIN(CASE WHEN s = smax THEN win_us END) AS BIGINT) AS peak_win_us,
        |  CAST(COALESCE(SUM(CASE WHEN s >= 8 * slack THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_alert_hours
        |FROM sm GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ev_abtest" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS arm,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS sv_micro
        |  FROM events GROUP BY 1, 2),
        |g2 AS (SELECT event_type, arm, n, sv_micro // n AS mean_micro FROM g)
        |SELECT a.event_type, a.n AS n_a, b.n AS n_b,
        |  CAST(a.mean_micro AS BIGINT) AS mean_a_micro,
        |  CAST(b.mean_micro AS BIGINT) AS mean_b_micro,
        |  CAST(((b.mean_micro - a.mean_micro) * 1000000) // GREATEST(1, ABS(a.mean_micro)) AS BIGINT) AS lift_ppm
        |FROM g2 a JOIN g2 b ON b.event_type = a.event_type AND a.arm = 0 AND b.arm = 1
        |ORDER BY a.event_type""".stripMargin,

    "ev_tumbling" ->
      """SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_us, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    "ev_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value, epoch_us(ts) - (epoch_us(ts) % 1800000000) AS w0
        |  FROM events),
        |x AS (
        |  SELECT event_type, value, w0 AS win_us FROM e
        |  UNION ALL
        |  SELECT event_type, value, w0 - 1800000000 AS win_us FROM e)
        |SELECT win_us, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    "ev_session" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ev_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us GROUP BY e.user_id)
        |SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
        |  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
        |  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase""".stripMargin,

    "ev_retention" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) - (epoch_us(ts) % 86400000000) AS day_us FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(day_us) AS cohort_us FROM activity GROUP BY user_id)
        |SELECT CAST(c.cohort_us / 86400000000 AS BIGINT) AS cohort_day,
        |  CAST((a.day_us - c.cohort_us) / 86400000000 AS BIGINT) AS offset_days,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM activity a JOIN cohort c ON a.user_id = c.user_id
        |WHERE (a.day_us - c.cohort_us) / 86400000000 <= 7
        |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin,

    "ev_cohort" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) - (epoch_us(ts) % 604800000000) AS week_us FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(week_us) AS cohort_us FROM weekly GROUP BY user_id),
        |matrix AS (
        |  SELECT CAST(c.cohort_us / 604800000000 AS BIGINT) AS cohort_week,
        |    CAST((w.week_us - c.cohort_us) / 604800000000 AS BIGINT) AS offset_weeks,
        |    CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
        |  FROM weekly w JOIN cohort c ON w.user_id = c.user_id
        |  GROUP BY 1, 2),
        |sz AS (
        |  SELECT cohort_week, n_users AS cohort_size FROM matrix WHERE offset_weeks = 0)
        |SELECT m.cohort_week, m.offset_weeks, m.n_users, sz.cohort_size,
        |  CAST((m.n_users * 1000000) // sz.cohort_size AS BIGINT) AS retained_ppm
        |FROM matrix m JOIN sz ON sz.cohort_week = m.cohort_week
        |ORDER BY m.cohort_week, m.offset_weeks""".stripMargin,

    "ev_interarrival" ->
      s"""WITH gaps AS (
         |  SELECT user_id,
         |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS delta_us
         |  FROM events)
         |SELECT ${GapBucketCase.replace("\n", "\n|  ")} AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |  MIN(delta_us) AS min_us, MAX(delta_us) AS max_us
         |FROM gaps WHERE delta_us IS NOT NULL
         |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "ev_seasonality" ->
      """WITH b AS (
        |  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
        |    (epoch_us(ts) % 86400000000) // 3600000000 AS hour
        |  FROM events),
        |c AS (SELECT dow, hour, CAST(COUNT(*) AS BIGINT) AS n_events
        |      FROM b GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM c)
        |SELECT c.dow, c.hour, c.n_events,
        |  CAST((CAST(c.n_events AS HUGEINT) * 1000000) // t.total AS BIGINT) AS share_ppm
        |FROM c CROSS JOIN t ORDER BY c.dow, c.hour""".stripMargin,

    "ev_forecast" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    SUM(n) OVER (PARTITION BY event_type, (day + 4) % 7 ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS psum,
        |    COUNT(n) OVER (PARTITION BY event_type, (day + 4) % 7 ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pcnt
        |  FROM daily),
        |sc AS (
        |  SELECT event_type, ABS(n - psum // pcnt) AS err
        |  FROM w WHERE pcnt >= 1)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
        |  CAST(SUM(err) // COUNT(*) AS BIGINT) AS mae,
        |  CAST(MAX(err) AS BIGINT) AS max_err
        |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ev_dedup_latest" ->
      """WITH r AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, ts_us, event_id, value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "ev_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS dd,
        |    CAST(SUM(n) AS BIGINT) AS t, CAST(SUM(n * n) AS BIGINT) AS s2
        |  FROM daily GROUP BY 1)
        |SELECT d.event_type, d.day, d.n
        |FROM daily d JOIN st ON st.event_type = d.event_type
        |WHERE (d.n * st.dd - st.t) * (d.n * st.dd - st.t) > 4 * (st.dd * st.s2 - st.t * st.t)
        |ORDER BY d.event_type, d.day""".stripMargin,

    "ev_rolling" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM daily ORDER BY event_type, day""".stripMargin,

    "ev_paths" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS step2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS step3
        |  FROM events)
        |SELECT event_type AS step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
        |FROM seq WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3
        |LIMIT 10""".stripMargin,

    "ev_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |  FROM events)
        |SELECT COALESCE(last_touch, 'none') AS attrib_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS attributed_value
        |FROM e WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY attrib_type""".stripMargin,

    "ev_hourly" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hour, n,
        |  CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
        |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
        |FROM h ORDER BY event_type, hour""".stripMargin,

    "ev_hourly_entropy" -> {
      val (lnH, lastH) = FixedLnSql.chain("h", "eha", Seq("event_type"), Seq("c"))
      val (lnP, lastP) = FixedLnSql.chain("per", "ehb",
        Seq("event_type", "n_hours", "peak_n", "slc"), Seq("n_events"))
      s"""WITH h AS (
        |  SELECT event_type,
        |    CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |$lnH,
        |per AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours,
        |    CAST(MAX(c) AS BIGINT) AS peak_n,
        |    SUM(CAST(c AS HUGEINT) * ln_c) AS slc
        |  FROM $lastH GROUP BY 1),
        |$lnP
        |SELECT event_type, n_events, n_hours,
        |  CAST(ln_n_events - (slc // n_events) AS BIGINT) AS entropy_micro,
        |  CAST(((ln_n_events - (slc // n_events)) * 1000000) // ${graft.functions.FixedLnOps.lnMicro(24L)} AS BIGINT) AS regularity_ppm,
        |  CAST((peak_n * 1000000) // n_events AS BIGINT) AS peak_ppm
        |FROM $lastP ORDER BY event_type""".stripMargin
    },

    "ev_funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us GROUP BY e.user_id),
        |n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS nv,
        |             (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS nc,
        |             (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS np)
        |SELECT step, step_name, n_users,
        |  CAST(CASE WHEN prev = 0 THEN 0 ELSE (n_users * 1000000) // prev END AS BIGINT) AS conv_prev_ppm
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, nv AS n_users, nv AS prev FROM n
        |  UNION ALL SELECT 2, 'click', nc, nv FROM n
        |  UNION ALL SELECT 3, 'purchase', np, nc FROM n)
        |ORDER BY step""".stripMargin,

    "ev_funnel_time" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us, MIN(v.v_us) AS v0_us
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us, MIN(c.c_us) AS c0_us
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us GROUP BY e.user_id),
        |lat AS (
        |  SELECT 'view>click' AS step, c_us - v0_us AS lat_us FROM c
        |  UNION ALL SELECT 'click>purchase', p_us - c0_us FROM p),
        |stats AS (
        |  SELECT step, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(MIN(lat_us) AS BIGINT) AS min_us, CAST(MAX(lat_us) AS BIGINT) AS max_us,
        |    CAST(SUM(lat_us) // COUNT(*) AS BIGINT) AS mean_us
        |  FROM lat GROUP BY step),
        |hist AS (
        |  SELECT step, lat_s, cnt,
        |    SUM(cnt) OVER (PARTITION BY step ORDER BY lat_s) AS cum,
        |    SUM(cnt) OVER (PARTITION BY step) AS n
        |  FROM (SELECT step, lat_us // 1000000 AS lat_s, COUNT(*) AS cnt
        |        FROM lat GROUP BY 1, 2)),
        |quants AS (
        |  SELECT step,
        |    CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(CEIL(CAST(0.5 AS DOUBLE) * n) AS BIGINT)) THEN lat_s END) AS BIGINT) AS p50_s,
        |    CAST(MIN(CASE WHEN cum >= GREATEST(1, CAST(CEIL(CAST(0.9 AS DOUBLE) * n) AS BIGINT)) THEN lat_s END) AS BIGINT) AS p90_s
        |  FROM hist GROUP BY step)
        |SELECT s.step, s.n_users, s.min_us, s.max_us, s.mean_us, q.p50_s, q.p90_s
        |FROM stats s JOIN quants q ON q.step = s.step
        |ORDER BY s.step""".stripMargin,

    "ev_wau" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM activity GROUP BY day),
        |contrib AS (
        |  SELECT DISTINCT a.user_id, a.day + k AS day
        |  FROM activity a, UNNEST(range(0, 7)) AS t(k)),
        |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM contrib GROUP BY day)
        |SELECT d.day, d.dau, w.wau,
        |  CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
        |FROM dau d JOIN wau w USING (day) ORDER BY d.day""".stripMargin,

    "ev_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(n) AS BIGINT) AS sy,
        |    CAST(SUM(day * n) AS BIGINT) AS sxy, CAST(SUM(day * day) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1),
        |r AS (
        |  SELECT event_type, nd, sy,
        |    (nd * sxy - sx * sy) * 1000 AS num, nd * sxx - sx * sx AS den
        |  FROM st)
        |SELECT event_type, nd, sy AS n_events,
        |  CAST(CASE WHEN den = 0 THEN 0
        |            ELSE (num - ((num % den + den) % den)) // den END AS BIGINT) AS slope_milli
        |FROM r ORDER BY event_type""".stripMargin,

    "ev_markov" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
        |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
        |FROM tr ORDER BY from_type, to_type""".stripMargin,

    "ev_stationary" -> {
      val rounds = (1 to 8).map { k =>
        s"""x$k AS (
           |  SELECT m.to_type AS t, CAST(SUM(x_ppm * p_ppm) // 1000000 AS BIGINT) AS x_ppm
           |  FROM m JOIN x${k - 1} ON x${k - 1}.t = m.from_type GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
        |  SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |m AS (
        |  SELECT from_type, to_type,
        |    CAST((n * 1000000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
        |  FROM tr),
        |st AS (SELECT DISTINCT from_type AS t FROM m),
        |x0 AS (SELECT t, CAST(1000000 // (SELECT COUNT(*) FROM st) AS BIGINT) AS x_ppm FROM st),
        |$rounds
        |SELECT t AS event_type, x_ppm FROM x8 ORDER BY event_type""".stripMargin
    },

    "ev_type_cooccur" ->
      s"""WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // ${86400L * 1000000L} AS day, event_type
        |  FROM events),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM act a JOIN act b
        |    ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |marg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM act GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |        FROM (SELECT DISTINCT user_id, day FROM act))
        |SELECT p.type_a, p.type_b, p.n_ab, ma.n AS n_a, mb.n AS n_b,
        |  CAST((CAST(p.n_ab AS HUGEINT) * tot.t * 1000000)
        |    // (CAST(ma.n AS HUGEINT) * mb.n) AS BIGINT) AS lift_ppm
        |FROM p JOIN marg ma ON ma.event_type = p.type_a
        |       JOIN marg mb ON mb.event_type = p.type_b
        |       CROSS JOIN tot
        |ORDER BY type_a, type_b""".stripMargin,

    "ev_repeaters" ->
      """WITH k AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeaters,
        |  CAST((SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS repeat_ppm
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ev_weekend_lift" ->
      s"""WITH c AS (
        |  SELECT event_type,
        |    ((epoch_us(ts) // ${86400L * 1000000L}) + 3) % 7 AS dow
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN dow >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
        |    CAST(SUM(CASE WHEN dow < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekday
        |  FROM c GROUP BY 1)
        |SELECT event_type, n_weekend, n_weekday,
        |  CASE WHEN n_weekday = 0 THEN NULL
        |       ELSE CAST((n_weekend * 5000000) // (n_weekday * 2) AS BIGINT) END AS lift_ppm
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_stickiness" ->
      s"""WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // ${7L * 86400L * 1000000L} AS week,
        |    epoch_us(ts) // ${86400L * 1000000L} AS day, user_id
        |  FROM events),
        |dau AS (SELECT week, day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1, 2),
        |g AS (
        |  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(dau) AS BIGINT) AS sum_dau,
        |    CAST(MAX(dau) AS BIGINT) AS max_dau
        |  FROM dau GROUP BY 1),
        |wau AS (SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM du GROUP BY 1)
        |SELECT CAST(g.week AS BIGINT) AS week, n_days, wau, max_dau,
        |  CAST((sum_dau * 1000) // n_days AS BIGINT) AS mean_dau_milli,
        |  CAST((sum_dau * 1000000) // (n_days * wau) AS BIGINT) AS stickiness_ppm
        |FROM g JOIN wau ON wau.week = g.week ORDER BY week""".stripMargin,

    "ev_activity_bands" ->
      """WITH k AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM events GROUP BY 1),
        |g AS (
        |  SELECT CAST(length(bin(k)) - 1 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(k) AS BIGINT) AS n_events,
        |    CAST(MIN(k) AS BIGINT) AS min_events, CAST(MAX(k) AS BIGINT) AS max_events
        |  FROM k GROUP BY 1)
        |SELECT band, n_users,
        |  CAST((n_users * 1000000) // SUM(n_users) OVER () AS BIGINT) AS user_share_ppm,
        |  n_events, min_events, max_events
        |FROM g ORDER BY band""".stripMargin,

    "ev_activation_lag" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN rn = 1 THEN ts_us END) AS t1,
        |    MIN(CASE WHEN rn = 5 THEN ts_us END) AS t5
        |  FROM r WHERE rn = 1 OR rn = 5 GROUP BY 1),
        |l AS (SELECT (t5 - t1) // 1000000 AS lag_s FROM p WHERE t5 IS NOT NULL)
        |SELECT CAST(length(bin(lag_s + 1)) - 1 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(MIN(lag_s) AS BIGINT) AS min_lag_s, CAST(MAX(lag_s) AS BIGINT) AS max_lag_s
        |FROM l GROUP BY 1 ORDER BY band""".stripMargin,

    "ev_first_touch" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |f AS (SELECT user_id, event_type AS first_type FROM r WHERE rn = 1),
        |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchasers
        |  FROM f LEFT JOIN b ON b.user_id = f.user_id GROUP BY 1)
        |SELECT first_type, n_users,
        |  CAST((n_users * 1000000) // SUM(n_users) OVER () AS BIGINT) AS share_ppm,
        |  n_purchasers,
        |  CAST((n_purchasers * 1000000) // n_users AS BIGINT) AS purchase_ppm
        |FROM g ORDER BY first_type""".stripMargin,

    "ev_peak_rate" ->
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 60000000 AS minute,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, minute,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY minute
        |      RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS r5
        |  FROM c),
        |p AS (
        |  SELECT event_type, minute, r5,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r5 DESC, minute) AS rn
        |  FROM r)
        |SELECT event_type, CAST(minute AS BIGINT) AS peak_minute, CAST(r5 AS BIGINT) AS peak_5m
        |FROM p WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "ev_error_rate" ->
      s"""SELECT epoch_us(ts) // ${86400L * 1000000L} AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        |  CAST((SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS error_ppm
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "ev_channel_retention" ->
      s"""WITH r AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |f AS (SELECT user_id, event_type AS first_type FROM r WHERE rn = 1),
        |sp AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t_last
        |  FROM events GROUP BY 1)
        |SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN t_last >= t0 + ${7L * 86400L * 1000000L} THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST((SUM(CASE WHEN t_last >= t0 + ${7L * 86400L * 1000000L} THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS retained_ppm
        |FROM f JOIN sp USING (user_id)
        |GROUP BY first_type ORDER BY first_type""".stripMargin,

    "ev_channel_value" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |f AS (SELECT user_id, event_type AS first_type FROM r WHERE rn = 1),
        |pv AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS np,
        |    SUM(CAST(value AS DECIMAL(28,6))) AS sv
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |g AS (
        |  SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(COALESCE(np, 0)) AS BIGINT) AS n_purchases,
        |    SUM(COALESCE(sv, CAST(0 AS DECIMAL(28,6)))) AS tv
        |  FROM f LEFT JOIN pv USING (user_id) GROUP BY 1)
        |SELECT first_type, n_users, n_purchases,
        |  CAST(tv * 1000000 AS BIGINT) AS value_micro,
        |  CAST(tv * 1000000 AS BIGINT) // n_users AS value_micro_per_user
        |FROM g ORDER BY first_type""".stripMargin,

    "ev_peak_slot" ->
      s"""WITH c AS (
        |  SELECT event_type,
        |    ((epoch_us(ts) // ${86400L * 1000000L}) + 3) % 7 AS dow,
        |    (epoch_us(ts) % ${86400L * 1000000L}) // ${3600L * 1000000L} AS hour,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
        |    SUM(n) OVER (PARTITION BY event_type) AS n_type,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, dow, hour) AS rn
        |  FROM c)
        |SELECT event_type, dow, hour, n,
        |  CAST((n * 1000000) // n_type AS BIGINT) AS share_ppm
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "ev_conversion_lag" ->
      """WITH fv AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS view_us
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts) - fv.view_us) // 1000000 AS lag_s
        |  FROM events e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.view_us
        |  GROUP BY 1)
        |SELECT CAST(length(bin(lag_s + 1)) - 1 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  MIN(lag_s) AS min_s, MAX(lag_s) AS max_s
        |FROM conv GROUP BY 1 ORDER BY band""".stripMargin,

    "ev_value_bands" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |g AS (
        |  SELECT event_type, CAST(length(bin(cents)) - 1 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n, MIN(cents) AS min_cents, MAX(cents) AS max_cents
        |  FROM c GROUP BY 1, 2)
        |SELECT event_type, band, n, min_cents, max_cents,
        |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
        |FROM g ORDER BY event_type, band""".stripMargin,

    "ev_weekday" ->
      s"""WITH c AS (
        |  SELECT event_type, ((epoch_us(ts) // ${86400L * 1000000L}) + 3) % 7 AS dow,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(dow AS BIGINT) AS dow, n,
        |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_ppm
        |FROM c ORDER BY event_type, dow""".stripMargin,

    "ev_mix_drift" -> {
      val (lnJ, lastJ) = FixedLnSql.chain("j", "mda", Seq("day"), Seq("c", "qc"))
      val (lnT2, lastT2) = FixedLnSql.chain("tot", "mdb",
        Seq("day", "s_gap"), Seq("n_events", "q_total"))
      s"""WITH tc AS (
        |  SELECT epoch_us(ts) // ${86400L * 1000000L} AS day, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |qq AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS qc FROM tc GROUP BY 1),
        |j AS (SELECT tc.day, tc.c, qq.qc FROM tc JOIN qq USING (event_type)),
        |$lnJ,
        |per AS (
        |  SELECT day, CAST(SUM(c) AS BIGINT) AS n_events,
        |    SUM(CAST(c AS HUGEINT) * (ln_qc - ln_c)) AS s_gap
        |  FROM $lastJ GROUP BY 1),
        |tot AS (SELECT *, CAST(SUM(n_events) OVER () AS BIGINT) AS q_total FROM per),
        |$lnT2
        |SELECT day, n_events,
        |  CAST(ln_q_total - ln_n_events - (s_gap // n_events) AS BIGINT) AS kl_micro
        |FROM $lastT2 ORDER BY day""".stripMargin
    },

    "ev_entropy_rate" -> {
      val (lnT, lastT) = FixedLnSql.chain("tr", "era", Seq("from_type"), Seq("n"))
      val (lnP, lastP) = FixedLnSql.chain("per", "erb",
        Seq("from_type", "n_next_types", "sln"), Seq("n_trans"))
      s"""WITH seq AS (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |$lnT,
        |per AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_trans,
        |    CAST(COUNT(*) AS BIGINT) AS n_next_types,
        |    SUM(CAST(n AS HUGEINT) * ln_n) AS sln
        |  FROM $lastT GROUP BY 1),
        |$lnP
        |SELECT from_type, n_trans, n_next_types,
        |  CAST(ln_n_trans - (sln // n_trans) AS BIGINT) AS h_micro
        |FROM $lastP ORDER BY from_type""".stripMargin
    },

    "ev_user_entropy" -> {
      val (lnC, lastC) = FixedLnSql.chain("ut", "eua", Seq("user_id"), Seq("c"))
      val (lnP, lastP) = FixedLnSql.chain("per", "eub", Seq("user_id", "slc"), Seq("n"))
      s"""WITH ut AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |$lnC,
        |per AS (
        |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
        |    SUM(CAST(c AS HUGEINT) * ln_c) AS slc
        |  FROM $lastC GROUP BY 1),
        |$lnP,
        |h AS (SELECT CAST(ln_n - (slc // n) AS BIGINT) AS h_micro FROM $lastP)
        |SELECT h_micro // 10000 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "ev_churn" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (
        |  SELECT a.user_id, a.week,
        |    CASE WHEN p.user_id IS NULL THEN NULL ELSE 1 END AS had_prev,
        |    CASE WHEN x.user_id IS NULL THEN NULL ELSE 1 END AS has_next
        |  FROM act a
        |  LEFT JOIN act p ON p.user_id = a.user_id AND p.week = a.week - 1
        |  LEFT JOIN act x ON x.user_id = a.user_id AND x.week = a.week + 1)
        |SELECT week, CAST(COUNT(*) AS BIGINT) AS active,
        |  CAST(COUNT(CASE WHEN had_prev IS NULL THEN 1 END) AS BIGINT) AS new_users,
        |  CAST(COUNT(had_prev) AS BIGINT) AS retained,
        |  CAST(COUNT(CASE WHEN has_next IS NULL THEN 1 END) AS BIGINT) AS churn_next
        |FROM f GROUP BY week ORDER BY week""".stripMargin,

    "ev_props" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(k) AS BIGINT) AS n_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k,
        |  CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ev_rfm" ->
      """WITH u AS (
        |  SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(28,6))
        |      ELSE CAST(0 AS DECIMAL(28,6)) END) AS mon
        |  FROM events GROUP BY user_id),
        |r AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
        |sc AS (
        |  SELECT user_id, (r.ref_us - u.last_us) // 3600000000 AS recency_hours,
        |    frequency, mon,
        |    CASE WHEN (r.ref_us - u.last_us) // 3600000000 <= 6 THEN 4
        |         WHEN (r.ref_us - u.last_us) // 3600000000 <= 24 THEN 3
        |         WHEN (r.ref_us - u.last_us) // 3600000000 <= 72 THEN 2
        |         ELSE 1 END AS r_score,
        |    CASE WHEN frequency >= 75 THEN 4 WHEN frequency >= 67 THEN 3
        |         WHEN frequency >= 60 THEN 2 ELSE 1 END AS f_score,
        |    CASE WHEN mon >= 800 THEN 4 WHEN mon >= 590 THEN 3
        |         WHEN mon >= 490 THEN 2 ELSE 1 END AS m_score
        |  FROM u, r)
        |SELECT user_id, recency_hours, frequency,
        |  CAST(mon AS DOUBLE) AS monetary,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code,
        |  CASE WHEN r_score >= 3 AND f_score >= 3 THEN 'champion'
        |       WHEN r_score >= 3 THEN 'promising'
        |       WHEN f_score >= 3 THEN 'at_risk'
        |       ELSE 'hibernating' END AS segment
        |FROM sc ORDER BY user_id""".stripMargin,

    "ev_fill" ->
      """WITH h AS (
        |  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_us, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(value AS DECIMAL(28,6))) AS sv
        |  FROM events GROUP BY 1, 2),
        |hh AS (
        |  SELECT win_us, event_type, n,
        |    CAST(sv * 1000000 AS BIGINT) // (n * 1000) AS avg_milli
        |  FROM h),
        |b AS (SELECT MIN(epoch_us(ts)) - (MIN(epoch_us(ts)) % 3600000000) AS lo,
        |             MAX(epoch_us(ts)) - (MAX(epoch_us(ts)) % 3600000000) AS hi
        |      FROM events),
        |grid AS (
        |  SELECT g.win_us, t.event_type
        |  FROM (SELECT unnest(generate_series(b.lo, b.hi, 3600000000)) AS win_us FROM b) g,
        |       (SELECT DISTINCT event_type FROM events) t)
        |SELECT grid.win_us, grid.event_type,
        |  COALESCE(hh.n, 0) AS n,
        |  hh.n IS NULL AS filled,
        |  last_value(hh.avg_milli IGNORE NULLS)
        |    OVER (PARTITION BY grid.event_type ORDER BY grid.win_us) AS locf_avg_milli
        |FROM grid LEFT JOIN hh
        |  ON hh.win_us = grid.win_us AND hh.event_type = grid.event_type
        |ORDER BY grid.event_type, grid.win_us""".stripMargin,

    "ev_mad" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
        |  FROM e GROUP BY 1),
        |d AS (
        |  SELECT e.event_type, ABS(e.v * 2 - m.med2) AS dev2, m.n_events, m.med2
        |  FROM e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        |  FROM d GROUP BY 1)
        |SELECT d.event_type,
        |  MAX(d.n_events) AS n_events,
        |  MAX(d.med2) AS med_micro_x2,
        |  MAX(md.mad4) AS mad_micro_x4,
        |  CAST(SUM(CASE WHEN d.dev2 * 2 > md.mad4 * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST((SUM(CASE WHEN d.dev2 * 2 > md.mad4 * 3 THEN 1 ELSE 0 END) * 1000000)
        |    // MAX(d.n_events) AS BIGINT) AS outlier_ppm
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "ev_attribution_pos" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |    CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS v,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey
        |  FROM events),
        |purch AS (
        |  SELECT user_id, journey, v FROM base WHERE event_type = 'purchase'),
        |ranked AS (
        |  SELECT user_id, journey, event_type,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id, journey
        |           ORDER BY ts_us, event_id) AS BIGINT) AS rnk,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id, journey) AS BIGINT) AS k
        |  FROM base WHERE event_type <> 'purchase'),
        |credited AS (
        |  SELECT r.event_type AS channel,
        |    CASE WHEN r.k = 1 THEN p.v
        |         WHEN r.rnk = 1 AND r.k = 2
        |           THEN (p.v * 2) // 5 + (p.v - 2 * ((p.v * 2) // 5))
        |         WHEN r.rnk = 1
        |           THEN (p.v * 2) // 5
        |             + ((p.v - 2 * ((p.v * 2) // 5))
        |                - (r.k - 2) * ((p.v - 2 * ((p.v * 2) // 5)) // (r.k - 2)))
        |         WHEN r.rnk = r.k THEN (p.v * 2) // 5
        |         ELSE (p.v - 2 * ((p.v * 2) // 5)) // (r.k - 2) END AS credit
        |  FROM ranked r
        |  JOIN purch p ON p.user_id = r.user_id AND p.journey = r.journey)
        |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(credit) AS BIGINT) AS credited_micro
        |FROM credited GROUP BY channel ORDER BY channel""".stripMargin,

    "ev_autocorr" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |lags AS (SELECT CAST(l AS BIGINT) AS lag FROM UNNEST([1, 24]) AS t(l)),
        |pairs AS (
        |  SELECT lag, a.x, b.x AS y
        |  FROM lags, hourly a, hourly b WHERE b.h = a.h + lag),
        |g AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM pairs GROUP BY lag)
        |SELECT lag, n AS n_pairs,
        |  CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
        |       WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS BIGINT) AS r_sign,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |  THEN CAST(FLOOR(
        |    (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
        |    * (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * syy - sy * sy AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT)
        |  ELSE 0 END AS r2_ppm
        |FROM g ORDER BY lag""".stripMargin,

    "ev_ltv" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week, event_type, value
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort FROM e GROUP BY 1),
        |sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users FROM c GROUP BY 1),
        |p AS (
        |  SELECT c.cohort, e.week - c.cohort AS week_offset,
        |    SUM(CAST(e.value AS DECIMAL(28,6))) AS sv,
        |    CAST(COUNT(*) AS BIGINT) AS n_purchases
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |q AS (
        |  SELECT cohort, week_offset, n_purchases, sv,
        |    SUM(sv) OVER (PARTITION BY cohort ORDER BY week_offset) AS cum_sv
        |  FROM p)
        |SELECT q.cohort, q.week_offset, s.cohort_users, q.n_purchases,
        |  CAST(q.sv * 1000000 AS BIGINT) AS week_value_micro,
        |  CAST(CAST(q.cum_sv * 1000000 AS BIGINT) // s.cohort_users AS BIGINT)
        |    AS cum_ltv_micro_per_user
        |FROM q JOIN sizes s USING (cohort)
        |ORDER BY cohort, week_offset""".stripMargin,

    // the integer product-limit fold replayed as a recursive CTE: at each
    // event time (ascending), s ← s·(n−d) // n starting from 1e6
    "ev_survival" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type FROM events),
        |h AS (SELECT MAX(day) AS h FROM e),
        |pu AS (
        |  SELECT user_id, MIN(day) AS first_day,
        |    MIN(CASE WHEN event_type = 'purchase' THEN day END) AS purch_day
        |  FROM e GROUP BY 1),
        |durs AS (
        |  SELECT CASE WHEN purch_day IS NOT NULL THEN purch_day - first_day
        |              ELSE h - first_day END AS dur,
        |    purch_day IS NOT NULL AS observed
        |  FROM pu, h),
        |hist AS (
        |  SELECT dur, COUNT(*) AS n_total,
        |    SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS d_events
        |  FROM durs GROUP BY 1),
        |risk AS (
        |  SELECT dur, SUM(n_total) OVER (ORDER BY dur DESC) AS n_risk, d_events
        |  FROM hist),
        |ev2 AS (
        |  SELECT dur, CAST(n_risk AS BIGINT) AS n_risk,
        |    CAST(d_events AS BIGINT) AS d_events,
        |    ROW_NUMBER() OVER (ORDER BY dur) AS rn
        |  FROM risk WHERE d_events > 0),
        |rec AS (
        |  SELECT rn, dur, n_risk, d_events,
        |    (CAST(1000000 AS HUGEINT) * (n_risk - d_events)) // n_risk AS s
        |  FROM ev2 WHERE rn = 1
        |  UNION ALL
        |  SELECT e2.rn, e2.dur, e2.n_risk, e2.d_events,
        |    (CAST(r.s AS HUGEINT) * (e2.n_risk - e2.d_events)) // e2.n_risk
        |  FROM ev2 e2 JOIN rec r ON e2.rn = r.rn + 1)
        |SELECT dur AS t_day, n_risk, d_events AS n_events,
        |  CAST(s AS BIGINT) AS surv_ppm
        |FROM rec ORDER BY t_day""".stripMargin,

    // the same count-of-counts histogram algebra: rank sums from runs,
    // decile boundary split with GREATEST/LEAST, HUGEINT-exact // ppm
    "ev_gini" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1),
        |hist AS (SELECT c, COUNT(*) AS m FROM counts GROUP BY 1),
        |n1 AS (SELECT SUM(m) AS n FROM hist),
        |h2 AS (
        |  SELECT c, m,
        |    SUM(m) OVER (ORDER BY c) - m AS p,
        |    SUM(m) OVER (ORDER BY c DESC) - m AS pd,
        |    n, n // 10 AS k
        |  FROM hist, n1),
        |h3 AS (
        |  SELECT c, m, p, n, k,
        |    GREATEST(0, LEAST(m, k - pd)) AS take
        |  FROM h2),
        |g AS (
        |  SELECT SUM(c * (2 * m * p + m * m + m)) AS sic2,
        |    MAX(n) AS n, MAX(k) AS k,
        |    SUM(c * m) AS tot, SUM(c * take) AS top
        |  FROM h3)
        |SELECT CAST(n AS BIGINT) AS n_users, CAST(tot AS BIGINT) AS n_events,
        |  CAST((1000000 * (sic2 - (n + 1) * tot)) // (n * tot) AS BIGINT) AS gini_ppm,
        |  CAST(k AS BIGINT) AS top_decile_users,
        |  CAST((1000000 * top) // tot AS BIGINT) AS top_decile_ppm
        |FROM g""".stripMargin,

    // ev_gini's histogram + tie-splitting rank intervals, unrolled per
    // decile instead of only the top one
    "ev_lorenz" ->
      """WITH counts AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM counts GROUP BY 1),
        |n1 AS (SELECT SUM(m) AS n, SUM(c * m) AS tot FROM hist),
        |lv AS (
        |  SELECT c, m,
        |    COALESCE(SUM(m) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
        |    n, tot
        |  FROM hist, n1),
        |x AS (
        |  SELECT l.c, l.m, l.p, l.n, l.tot, t.decile,
        |    GREATEST(0, LEAST(l.p + l.m, (l.n * t.decile) // 10)
        |      - GREATEST(l.p, (l.n * (t.decile - 1)) // 10)) AS take
        |  FROM lv l, UNNEST(range(1, 11)) AS t(decile)),
        |g AS (
        |  SELECT decile, SUM(take) AS n_users, SUM(c * take) AS ev, MAX(tot) AS tot
        |  FROM x WHERE take > 0 GROUP BY 1),
        |cu AS (
        |  SELECT decile, n_users, ev, tot,
        |    SUM(ev) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM g)
        |SELECT decile, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(ev AS BIGINT) AS n_events, CAST(cum AS BIGINT) AS cum_events,
        |  CAST((1000000 * cum) // tot AS BIGINT) AS cum_share_ppm
        |FROM cu ORDER BY decile""".stripMargin,

    // the same cents floor, leading digit via integer→string (identical
    // text on both engines), constant reference shares
    "ev_benford" ->
      s"""WITH cts AS (
         |  SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
         |  FROM events),
         |dg AS (
         |  SELECT event_type,
         |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM cts WHERE cents > 0),
         |g AS (
         |  SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM dg GROUP BY 1, 2),
         |t AS (SELECT event_type, SUM(n) AS t FROM g GROUP BY 1),
         |j AS (
         |  SELECT g.event_type, g.digit, g.n,
         |    CAST((1000000 * g.n) // t.t AS BIGINT) AS obs_ppm,
         |    ${BenfordCase.replace("\n", " ")} AS exp_ppm
         |  FROM g JOIN t ON t.event_type = g.event_type)
         |SELECT event_type, digit, n, obs_ppm, exp_ppm,
         |  CAST(ABS(obs_ppm - exp_ppm) AS BIGINT) AS dev_ppm
         |FROM j ORDER BY event_type, digit""".stripMargin,

    // the same daily rollup self-joined on day+1 — consecutive steps only
    "ev_volatility" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT a.event_type, a.x - b.x AS dlt
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.day = a.day - 1)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_steps,
        |  CAST(SUM(ABS(dlt)) AS BIGINT) AS total_variation,
        |  CAST(SUM(ABS(dlt)) // COUNT(*) AS BIGINT) AS mean_abs_change,
        |  CAST(MAX(dlt) AS BIGINT) AS max_up,
        |  CAST(MIN(dlt) AS BIGINT) AS max_down
        |FROM st GROUP BY 1 ORDER BY event_type""".stripMargin,

    // the same gap rule, running-sum session ids, identical CASE buckets
    "ev_session_hist" -> {
      val bucketCase = DepthBucketCase.replace("\n", " ")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
         |lg AS (
         |  SELECT user_id, event_id, ts_us,
         |    LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pts
         |  FROM e),
         |ns AS (
         |  SELECT user_id, event_id, ts_us,
         |    CASE WHEN pts IS NULL OR ts_us - pts > 1800000000 THEN 1 ELSE 0 END AS new_session
         |  FROM lg),
         |sd AS (
         |  SELECT user_id,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM ns),
         |dp AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n FROM sd GROUP BY 1, 2),
         |tot AS (SELECT COUNT(*) AS t FROM dp),
         |b AS (SELECT $bucketCase AS bucket, n FROM dp)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |  CAST(SUM(n) AS BIGINT) AS n_events,
         |  CAST((1000000 * COUNT(*)) // MAX(tot.t) AS BIGINT) AS share_ppm
         |FROM b, tot GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    // floor-mean first pass, exact centered DECIMAL/HUGEINT sums, the
    // identically-parenthesized double chain for var/skew
    "ev_moments" -> {
      val skew = SkewMilliExpr.replace("\n", " ")
      s"""WITH c AS (
         |  SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
         |  FROM events),
         |m0 AS (
         |  SELECT event_type, CAST(SUM(c) // COUNT(*) AS BIGINT) AS mc
         |  FROM c GROUP BY 1),
         |d AS (
         |  SELECT c.event_type, c.c - m0.mc AS dv, m0.mc
         |  FROM c JOIN m0 ON m0.event_type = c.event_type),
         |g AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, MAX(mc) AS mean_cents,
         |    SUM(dv) AS sd1, SUM(dv * dv) AS sd2, SUM(dv * dv * dv) AS sd3
         |  FROM d GROUP BY 1),
         |x AS (SELECT event_type, n, mean_cents, sd1, sd2, sd3,
         |        n * sd2 - sd1 * sd1 AS a FROM g)
         |SELECT event_type, n, CAST(mean_cents AS BIGINT) AS mean_cents,
         |  CAST(FLOOR(CAST(a AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1000.0 + 0.5) AS BIGINT) AS var_milli,
         |  $skew AS skew_milli
         |FROM x ORDER BY event_type""".stripMargin
    },

    // the same minute buckets, value-RANGE trailing-hour frame, earliest
    // argmax minute
    "ev_peak" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 60000000 AS minute FROM events),
        |pm AS (
        |  SELECT event_type, minute, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, minute, n,
        |    SUM(n) OVER (PARTITION BY event_type ORDER BY minute
        |      RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS roll
        |  FROM pm),
        |p AS (SELECT event_type, MAX(roll) AS pk FROM r GROUP BY 1)
        |SELECT r.event_type, CAST(MAX(r.roll) AS BIGINT) AS peak_events,
        |  MIN(CASE WHEN r.roll = p.pk THEN r.minute END) AS peak_minute,
        |  CAST(COUNT(*) AS BIGINT) AS n_active_minutes,
        |  CAST((SUM(r.n) * 1000) // COUNT(*) AS BIGINT) AS mean_per_min_milli
        |FROM r JOIN p ON p.event_type = r.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // distinct active days per user, exact count-of-counts
    "ev_active_days" ->
      """WITH ud AS (
        |  SELECT user_id,
        |    CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_days
        |  FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS t FROM ud)
        |SELECT n_days, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST((1000000 * COUNT(*)) // MAX(tot.t) AS BIGINT) AS share_ppm
        |FROM ud, tot GROUP BY n_days ORDER BY n_days""".stripMargin,

    // HUGEINT collision sums, the identical guard and floor divisions
    "ev_user_simpson" ->
      """WITH cu AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_users,
        |    SUM(CAST(c AS HUGEINT) * (c - 1)) AS coll,
        |    MAX(c) AS mx
        |  FROM cu GROUP BY 1)
        |SELECT event_type, n_events, n_users,
        |  CASE WHEN n_events > 1 THEN
        |    CAST((coll * 1000000) // (CAST(n_events AS HUGEINT) * (n_events - 1)) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS simpson_ppm,
        |  CAST((CAST(mx AS HUGEINT) * 1000000) // n_events AS BIGINT) AS top_user_share_ppm
        |FROM g ORDER BY event_type""".stripMargin,

    // the same lead ordering as ev_markov, HUGEINT collision sums
    "ev_next_simpson" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        |  FROM e),
        |c AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |g AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_trans,
        |    CAST(COUNT(*) AS BIGINT) AS n_dest,
        |    SUM(CAST(n AS HUGEINT) * (n - 1)) AS coll, MAX(n) AS mx
        |  FROM c GROUP BY 1)
        |SELECT from_type, n_trans, n_dest,
        |  CASE WHEN n_trans > 1 THEN
        |    CAST((coll * 1000000) // (CAST(n_trans AS HUGEINT) * (n_trans - 1)) AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS simpson_ppm,
        |  CAST((CAST(mx AS HUGEINT) * 1000000) // n_trans AS BIGINT) AS top_next_ppm
        |FROM g ORDER BY from_type""".stripMargin,

    // the same span arithmetic on epoch microseconds, exact day keys
    "ev_lifecycle" ->
      """WITH sp AS (
        |  SELECT user_id,
        |    (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 86400000000 AS span_days
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM sp)
        |SELECT span_days, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST((1000000 * COUNT(*)) // MAX(tot.t) AS BIGINT) AS share_ppm
        |FROM sp, tot GROUP BY span_days ORDER BY span_days""".stripMargin,

    "ev_new_vs_returning" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |fd AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY 1)
        |SELECT du.day AS day, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN du.day = fd.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(COUNT(*) - SUM(CASE WHEN du.day = fd.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
        |  CAST((SUM(CASE WHEN du.day = fd.first_day THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS new_ppm
        |FROM du JOIN fd ON fd.user_id = du.user_id
        |GROUP BY du.day ORDER BY day""".stripMargin,

    "ev_dow_hour_heat" ->
      """WITH c AS (
        |  SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
        |    (epoch_us(ts) // 3600000000) % 24 AS hod,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod, n,
        |  CAST((CAST(1000000 AS HUGEINT) * n) // MAX(tot.t) AS BIGINT) AS share_ppm
        |FROM c, tot GROUP BY dow, hod, n ORDER BY dow, hod""".stripMargin,

    "ev_day_gaps" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |g AS (
        |  SELECT day - LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS gap_days
        |  FROM du),
        |gg AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM gg)
        |SELECT CAST(gap_days AS BIGINT) AS gap_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST((CAST(1000000 AS HUGEINT) * COUNT(*)) // MAX(tot.t) AS BIGINT) AS share_ppm
        |FROM gg, tot GROUP BY gap_days ORDER BY gap_days""".stripMargin,

    "ev_peak_factor" ->
      """WITH ph AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_active_hours,
        |    CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(MAX(n) AS BIGINT) AS peak_hour_n,
        |    CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS span_hours
        |  FROM ph GROUP BY 1)
        |SELECT event_type, span_hours, n_active_hours, n_events, peak_hour_n,
        |  CAST((CAST(peak_hour_n AS HUGEINT) * 1000 * span_hours) // n_events AS BIGINT) AS peak_factor_milli,
        |  CAST((n_active_hours * 1000000) // span_hours AS BIGINT) AS duty_ppm
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_type_trend" ->
      """WITH wc AS (
        |  SELECT event_type, epoch_us(ts) // 604800000000 AS w,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(w) AS HUGEINT) AS sw, CAST(SUM(c) AS HUGEINT) AS sc,
        |    CAST(SUM(CAST(w AS HUGEINT) * c) AS HUGEINT) AS swc,
        |    CAST(SUM(CAST(w AS HUGEINT) * w) AS HUGEINT) AS sww
        |  FROM wc GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_weeks, CAST(sc AS BIGINT) AS n_events,
        |  CASE WHEN n * sww - sw * sw = 0 THEN NULL
        |    ELSE CAST(((n * swc - sw * sc) * 1000) // (n * sww - sw * sw) AS BIGINT)
        |  END AS slope_milli
        |FROM g ORDER BY event_type""".stripMargin
  )
}
