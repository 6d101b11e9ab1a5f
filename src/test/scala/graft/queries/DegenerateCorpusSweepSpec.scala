package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** EVERY registered query runs end-to-end over a corpus built of nothing
  * but degenerate corners — under Spark 4 ANSI mode any unguarded x/0,
  * NaN cast or decimal overflow THROWS, so a green sweep proves the
  * guards, table by table:
  *
  *   - customer with no orders, nation/region with no customers,
  *     supplier with no lineitems, part never ordered, an order with
  *     zero lineitems, every order in ONE calendar month;
  *   - events all on WEEKENDS (ev_weekend_lift's zero-weekday branch),
  *     one event_type entirely at a single instant (rd_replay's
  *     zero-span ordering group — event_type is the topic's
  *     orderingGroup), a user with one event;
  *   - documents with an empty text, a whitespace-only text (the hot
  *     normalized-fingerprint shape), a single-doc source, a one-token
  *     repeated doc, two disjoint vocabularies;
  *   - embeddings with an all-zero vector (zero-norm cosine corners),
  *     an exact duplicate pair and a singleton label.
  *
  * The sweep ENUMERATES SparkEntry.queries, so an operator added later
  * cannot skip it silently (the StatEdgeCaseSpec fixtures cover deeper
  * single-family corners; this is the breadth gate). Targeted tests
  * below pin the four named guard-branch VALUES, not just no-throw.
  */
class DegenerateCorpusSweepSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dir: String = {
    val d = graft.rawdata.Topic.tempDir("degenerate-corpus")

    Seq((0, "AMERICA"), (1, "EUROPE"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$d/region.parquet")

    // nation 1 has no customers and no suppliers; region 1 has no nations
    Seq((0, "FRANCE", 0), (1, "GERMANY", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")

    // c2 has NO orders; c3 is a one-timer; acctbal spans negative/zero
    Seq(
      (1L, "cust-1", 0, 120.5, "BUILDING"),
      (2L, "cust-2", 0, -10.0, "MACHINERY"),
      (3L, "cust-3", 0, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")

    // s2 ships nothing
    Seq((1L, "supp-1", 0, 50.0), (2L, "supp-2", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$d/supplier.parquet")

    // p3 is never ordered
    Seq(
      (1L, "azure part", "Brand#1", "SMALL BRUSHED", 5, 100.0),
      (2L, "ivory part", "Brand#1", "LARGE POLISHED", 50, 900.0),
      (3L, "ghost part", "Brand#2", "SMALL PLATED", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")

    // one calendar month only (q78's single-month seasonal grid);
    // o4 has zero lineitems
    Seq(
      (1L, 1L, "O", 1000.0, ts("2024-03-05 00:00:00"), "1-URGENT"),
      (2L, 1L, "F", 250.25, ts("2024-03-12 00:00:00"), "5-LOW"),
      (3L, 3L, "P", 99.99, ts("2024-03-20 00:00:00"), "3-MEDIUM"),
      (4L, 1L, "O", 10.0, ts("2024-03-28 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")

    // quantity tie (5.0/5.0), a zero discount and the 10 % cap
    Seq(
      (1L, 1L, 1L, 1, 5.0, 500.0, 0.0, 0.02, "N", "O", ts("2024-03-07 00:00:00")),
      (1L, 2L, 1L, 2, 5.0, 500.0, 0.10, 0.0, "R", "F", ts("2024-03-08 00:00:00")),
      (2L, 1L, 1L, 1, 1.0, 250.25, 0.05, 0.04, "A", "F", ts("2024-03-14 00:00:00")),
      (3L, 2L, 1L, 1, 2.0, 99.99, 0.0, 0.0, "N", "O", ts("2024-03-22 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")

    // 2024-01-06/07/13/14 are Sat/Sun/Sat/Sun — NO weekday anywhere;
    // every "error" lands at ONE instant (zero-span ordering group);
    // user 30 appears exactly once
    Seq(
      (1L, ts("2024-01-06 08:00:00"), 10L, "signup", 1.0, """{"k": 1}"""),
      (2L, ts("2024-01-06 09:00:00"), 10L, "view", 2.5, """{"k": 2}"""),
      (3L, ts("2024-01-07 10:00:00"), 10L, "click", 0.0, """{"k": 3}"""),
      (4L, ts("2024-01-13 11:00:00"), 10L, "purchase", 42.0, """{"k": 4}"""),
      (5L, ts("2024-01-06 08:30:00"), 20L, "signup", 1.0, """{"k": 5}"""),
      (6L, ts("2024-01-07 09:30:00"), 20L, "view", 1.0, """{"k": 6}"""),
      (7L, ts("2024-01-14 12:00:00"), 20L, "view", 1.0, """{"k": 7}"""),
      (8L, ts("2024-01-06 12:00:00"), 10L, "error", 0.0, """{"k": 8}"""),
      (9L, ts("2024-01-06 12:00:00"), 20L, "error", 0.0, """{"k": 9}"""),
      (10L, ts("2024-01-06 12:00:00"), 30L, "error", 0.0, """{"k": 10}"""),
      // an EMPTY props payload: the topic carries a zero-length byte
      // payload (non-null — the contract holds) so every payload-length
      // consumer (mm_size_drift's byte means, mm_magic_mix's prefix)
      // meets a 0-byte row
      (11L, ts("2024-01-13 13:00:00"), 20L, "view", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // a NULL value (the one nullable metric column; ts/type/props stay
      // non-null — the topic payload contract is non-null bytes, exactly
      // like the reference's Avro map<string,bytes>)
      .withColumn("value",
        when($"event_id" === 7L, lit(null).cast("double")).otherwise($"value"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")

    // empty text, whitespace-only text (the hot normalized fingerprint),
    // a single-doc source, a repeated-token doc, disjoint vocabularies —
    // plus NULLs in every nullable documents column (the driver schema
    // allows them and a web corpus ships them; functions must propagate,
    // never throw)
    Seq(
      (1L, Some(""), Some("en"), Some("web")),
      (2L, Some("   "), Some("en"), Some("web")),
      (3L, Some("same same same same same"), Some("en"), Some("uni")),
      (4L, Some("alpha beta gamma delta epsilon"), Some("en"), Some("dis1")),
      (5L, Some("uno dos tres cuatro cinco"), Some("es"), Some("dis2")),
      (6L, Some("lone wolf document here"), Some("de"), Some("solo")),
      (7L, Some("alpha beta gamma delta epsilon"), Some("en"), Some("dis1")),
      (8L, None, Some("en"), Some("web")),
      (9L, Some("null lang doc text here"), None, Some("web")),
      (10L, Some("null source doc text here"), Some("en"), None))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // v0 all-zero (zero-norm), v1 == v2 exact duplicates, v5 singleton
    // label; 64-dim like the driver fixture (PQ slices 8×8)
    val vecs = Seq(
      (0L, Array.fill(64)(0f), 1),
      (1L, Array.tabulate(64)(i => (i % 7).toFloat / 8f), 1),
      (2L, Array.tabulate(64)(i => (i % 7).toFloat / 8f), 1),
      (3L, Array.tabulate(64)(i => (i % 5).toFloat / 4f - 0.4f), 2),
      (4L, Array.tabulate(64)(i => (i % 5).toFloat / 4f - 0.38f), 2),
      (5L, Array.tabulate(64)(i => ((i * 13) % 11).toFloat / 10f - 0.5f), 3))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives the degenerate corpus") {
      assert(fn(spark, dir).count() >= 0)
    }
  }

  test("ev_weekend_lift: a corpus with zero weekday events reports NULL lift, never throws") {
    val rows = EventQueries.queries("ev_weekend_lift")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_weekday") === 0L))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("lift_ppm"))))
  }

  test("rd_replay: the zero-span ordering group reports rate 0 / eta 0, never throws") {
    val err = graft.rawdata.RawdataQueries.queries("rd_replay")(spark, dir)
      .filter($"ordering_group" === "error").collect()
    assert(err.length === 1)
    assert(err.head.getAs[Long]("span_ms") === 0L)
    assert(err.head.getAs[Long]("rate_per_hour_milli") === 0L)
    assert(err.head.getAs[Long]("eta_milli_hours") === 0L)
  }

  test("mm_shard_fill: single-shard keys take the coalesce branch (min_fill_ppm = 0)") {
    val rows = MultimodalQueries.queries("mm_shard_fill")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows if r.getAs[Long]("n_shards") === 1L)
      assert(r.getAs[Long]("min_fill_ppm") === 0L,
        s"key ${r.getAs[String]("key")}: a lone (final) shard must not count toward min fill")
  }

  test("samp_share_skew: three identical sources floor to the same 333333 ppm and cancel to skew 0") {
    val d3 = graft.rawdata.Topic.tempDir("equal-thirds-docs")
    Seq(
      (1L, "one two three", "en", "a"), (2L, "one two three", "en", "b"),
      (3L, "one two three", "en", "c"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d3/documents.parquet")
    val rows = SamplingQueries.queries("samp_share_skew")(spark, d3).collect()
    assert(rows.length === 3)
    for (r <- rows) {
      assert(r.getAs[Long]("doc_share_ppm") === 333333L)
      assert(r.getAs[Long]("tok_share_ppm") === 333333L)
      assert(r.getAs[Long]("skew_ppm") === 0L)
    }
  }
}
