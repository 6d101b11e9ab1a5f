package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries
import graft.rawdata.{EventsAsTopic, Topic}

/** Stream-side cold start: every stateful gate must survive an EMPTY
  * first micro-batch (a monitor attached before the first document/event
  * lands — the deploy-order case) without corrupting anything it later
  * computes. The batch operators earned their empty-corpus sweep in
  * round 13 (which caught four real cold-start bugs); this is the
  * targeted streaming twin of that sweep: a zero-row first file (or an
  * empty topic), drained, then the real data — final results must equal
  * the batch twin (where one exists) or an identical run WITHOUT the
  * empty first batch (the state-initialization-order property itself).
  */
class StreamColdStartSpec extends SparkSpec {
  import spark.implicits._

  /** run `transform` over a file-source stream: optionally a ZERO-ROW
    * first file drained as its own micro-batch, then each phase appended
    * and drained; returns (rows in the sink after the empty drain, final
    * sink rows).
    */
  private def drained(name: String, schemaDf: DataFrame, emptyFirst: Boolean,
      phases: Seq[DataFrame], mode: String)(
      transform: DataFrame => DataFrame): (Long, Seq[Row]) = {
    val dir = Topic.tempDir(s"cold-$name")
    if (emptyFirst) schemaDf.limit(0).coalesce(1).write.mode("append").parquet(dir)
    else phases.head.coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schemaDf.schema).parquet(dir)
    val q = transform(stream).writeStream.format("memory")
      .queryName(s"cold_$name").outputMode(mode).start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table(s"cold_$name").count()
      (if (emptyFirst) phases else phases.tail).foreach { p =>
        p.coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      (afterFirst, spark.table(s"cold_$name").collect().toSeq)
    } finally q.stop()
  }

  test("topic tail: a stream started on an EMPTY topic catches up after the first publish") {
    val dir = Topic.tempDir("cold-topic-tail")
    val q = TopicStream.messages(spark, dir).toDF()
      .writeStream.format("memory").queryName("cold_tail").outputMode("append").start()
    try {
      q.processAllAvailable() // empty topic, empty first micro-batch
      assert(spark.table("cold_tail").count() === 0L)
      val msgs = EventsAsTopic.messagesFromEvents(spark, sf)
      Topic.write(msgs, dir, EventsAsTopic.cfg)
      q.processAllAvailable()
      assert(spark.table("cold_tail").count() === msgs.count(),
        "post-cold-start catch-up lost messages")
    } finally q.stop()
  }

  test("datacard monitor: empty first micro-batch, then the corpus — counts and card intact") {
    val docs = Tables.t(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang", $"source")
    val (afterEmpty, fin) = drained("datacard", docs, emptyFirst = true,
      Seq(docs), "complete")(DatacardStream.mixCounts)
    assert(afterEmpty === 0L, "an empty corpus produced mixture rows")
    val got = fin.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = DedupQueries.datacardMixCounts(docs)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === want, "post-cold-start counts diverged from the batch relation")
    // and the snapshot still composes into the card (the bounded tail)
    val card = DatacardStream.composeCard(
      fin.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toDF("source", "lang", "c", "tok"))
    assert(card.count() > 0)
  }

  test("HLL gate: empty first micro-batch, then the corpus — estimate equals batch") {
    val docs = Tables.t(spark, sf, "documents").select($"lang", $"doc_id")
    val (afterEmpty, fin) = drained("hll", docs, emptyFirst = true,
      Seq(docs), "complete")(s => SketchStream.hllDistinct(s, "lang", "doc_id"))
    assert(afterEmpty === 0L)
    val got = fin.map(r => (r.getString(0), r.getLong(1))).toMap
    val want = SketchStream.hllDistinct(docs, "lang", "doc_id")
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("transition gate: an empty first micro-batch changes nothing downstream") {
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val (lo, hi) = events.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val mid = (lo + hi) / 2
    val phases = Seq(
      events.filter(unix_micros($"ts") < mid),
      events.filter(unix_micros($"ts") >= mid))
    def gate(s: DataFrame) = StationaryStream.transitions(StationaryStream.fromEvents(s)).toDF()
    // the property IS the comparison: the gate's emissions over the same
    // data-bearing triggers must be identical with and without a leading
    // empty micro-batch (state initialized from nothing == no state yet)
    val (afterEmpty, cold) = drained("stat_cold", events, emptyFirst = true, phases, "append")(gate)
    val (_, warm) = drained("stat_warm", events, emptyFirst = false, phases, "append")(gate)
    assert(afterEmpty === 0L, "an empty event batch emitted transition rows")
    assert(cold.map(_.toString).sorted === warm.map(_.toString).sorted,
      "a leading empty micro-batch changed the gate's emissions")
  }

  test("session gate: an empty first micro-batch changes nothing downstream") {
    val events = Tables.events(spark, sf)
      .select($"user_id".as("userId"), $"ts")
    val (lo, hi) = events.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val mid = (lo + hi) / 2
    val phases = Seq(
      events.filter(unix_micros($"ts") < mid),
      events.filter(unix_micros($"ts") >= mid))
    def gate(s: DataFrame) = Sessionize.sessions(
      s.withWatermark("ts", "30 minutes").as[Sessionize.Event], 1800L * 1000).toDF()
    val (afterEmpty, cold) = drained("sess_cold", events, emptyFirst = true, phases, "append")(gate)
    val (_, warm) = drained("sess_warm", events, emptyFirst = false, phases, "append")(gate)
    assert(afterEmpty === 0L, "an empty event batch closed sessions")
    assert(cold.map(_.toString).sorted === warm.map(_.toString).sorted,
      "a leading empty micro-batch changed the closed-session set")
  }

  /** the generic cold-vs-warm property over a stateful gate: emissions
    * across the same data-bearing phases must be identical with and
    * without a leading empty micro-batch
    */
  private def coldEqualsWarm(name: String, input: DataFrame,
      phases: Seq[DataFrame])(gate: DataFrame => DataFrame): Unit = {
    val (afterEmpty, cold) = drained(s"${name}_c", input, emptyFirst = true, phases, "append")(gate)
    val (_, warm) = drained(s"${name}_w", input, emptyFirst = false, phases, "append")(gate)
    assert(afterEmpty === 0L, s"$name: the empty first micro-batch emitted rows")
    assert(cold.map(_.toString).sorted === warm.map(_.toString).sorted,
      s"$name: a leading empty micro-batch changed the gate's emissions")
  }

  test("stateful event gates survive an empty first micro-batch unchanged") {
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val (lo, hi) = events.agg(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val mid = (lo + hi) / 2
    val phases = Seq(
      events.filter(unix_micros($"ts") < mid),
      events.filter(unix_micros($"ts") >= mid))
    coldEqualsWarm("engagement", events, phases)(s =>
      EngagementStream.entropy(EngagementStream.fromEvents(s)).toDF())
    coldEqualsWarm("firsttouch", events, phases)(s =>
      FirstTouchStream.firstTouch(FirstTouchStream.fromEvents(s)).toDF())
    coldEqualsWarm("peak", events, phases)(s =>
      PeakStream.peaks(PeakStream.fromEvents(s)).toDF())
  }

  test("stateful document gates survive an empty first micro-batch unchanged") {
    val docs = Tables.t(spark, sf, "documents")
      .select($"doc_id", $"text", $"source")
    val phases = Seq(docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 =!= 0))
    coldEqualsWarm("heavy", docs, phases)(s =>
      HeavyStream.candidates(HeavyStream.fromDocs(s), 64).toDF())
    coldEqualsWarm("budget", docs, phases)(s =>
      BudgetStream.admitted(BudgetStream.fromDocs(s), budget = 5000L).toDF())
  }

  test("cross-source dup gate: empty first arrivals batch, then arrivals — verdicts equal batch") {
    val corpus = Seq(
      (1L, "the quick fox", "en", "alpha"),
      (2L, "THE QUICK fox", "en", "beta"),
      (3L, "hello world", "en", "alpha"))
      .toDF("doc_id", "text", "lang", "source")
    val arrivals = Seq(
      (101L, "the  QUICK fox", "gamma"),
      (102L, "entirely novel", "alpha"))
      .toDF("doc_id", "text", "source")
    val dir = Topic.tempDir("cold-xcross")
    arrivals.limit(0).coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(arrivals.schema).parquet(dir)
    val (flags, caches) = ExactCrossStream.dupFlagsScoped(stream, corpus)
    val q = flags.writeStream.format("memory").queryName("cold_xc")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // empty arrivals: the gate's corpus-side
      assert(spark.table("cold_xc").count() === 0L) // state builds against zero arrivals
      arrivals.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, source, dup_source, n_existing FROM cold_xc")
        .as[(Long, String, Option[String], Long)].collect().toSet
      val want = ExactCrossStream.dupFlags(arrivals, corpus)
        .as[(Long, String, Option[String], Long)].collect().toSet
      assert(got === want, "post-cold-start verdicts diverged from the batch twin")
    } finally { q.stop(); caches.close() }
  }
}
