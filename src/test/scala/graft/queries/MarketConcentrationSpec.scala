package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the concentration-index batch (q62_hhi / ev_next_simpson /
  * rd_key_skew): every reported index re-derived in exact BigInt math
  * from independent aggregations, HHI bounds ([10⁶/n, 10⁶]) checked on
  * the real corpus, and constructed extremes where the exact value is
  * forced (equal-share suppliers → exactly 10⁶ div n, a deterministic
  * event chain → next-step Simpson exactly 10⁶).
  */
class MarketConcentrationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- q62_hhi ----------------------------------------------------------

  test("q62_hhi: the exact BigInt identity holds and HHI sits in [10^6/n, 10^6]") {
    val rows = Relational3.queries("q62_hhi")(spark, sf).collect()
    assert(rows.nonEmpty)
    val direct = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "part").select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"l_suppkey")
      .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)")).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => BigInt(x._2))).toMap
    assert(rows.map(_.getAs[String]("p_brand")).toSet === direct.keySet)
    for (row <- rows) {
      val rs = direct(row.getAs[String]("p_brand"))
      val rev = rs.sum
      assert(row.getAs[Long]("n_suppliers") === rs.size.toLong)
      assert(row.getAs[Long]("rev_cents") === rev.toLong)
      val hhi = (rs.map(r => r * r).sum * 1000000 / (rev * rev)).toLong
      assert(row.getAs[Long]("hhi_ppm") === hhi)
      assert(row.getAs[Long]("top_supp_ppm") === (rs.max * 1000000 / rev).toLong)
      assert(hhi >= 1000000L / rs.size && hhi <= 1000000L)
      // s_max <= n * Sigma s^2 (since R <= n*r_max); +1 absorbs the floor
      assert(row.getAs[Long]("top_supp_ppm") <=
        (row.getAs[Long]("hhi_ppm") + 1) * rs.size)
    }
  }

  test("q62_hhi: equal-share suppliers score exactly 10^6 div n; a monopoly exactly 10^6") {
    val dir = graft.rawdata.Topic.tempDir("hhi-constructed")
    Seq((1L, "BA"), (2L, "BB")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // brand BA: 4 suppliers, identical revenue; brand BB: one supplier
    (Seq.tabulate(4)(i => (1L, (i + 1).toLong, 25.00)) :+ (2L, 9L, 123.45))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Relational3.queries("q62_hhi")(spark, dir).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    assert(rows("BA").getAs[Long]("hhi_ppm") === 250000L)
    assert(rows("BA").getAs[Long]("top_supp_ppm") === 250000L)
    assert(rows("BB").getAs[Long]("hhi_ppm") === 1000000L)
    assert(rows("BB").getAs[Long]("top_supp_ppm") === 1000000L)
  }

  // ---- ev_next_simpson ----------------------------------------------------

  test("ev_next_simpson: consistent with ev_markov's transition matrix, exact identity") {
    val rows = EventQueries.queries("ev_next_simpson")(spark, sf).collect()
    val trans = EventQueries.queries("ev_markov")(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[Long]("n")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_.getAs[String]("from_type")).toSet === trans.keySet)
    for (row <- rows) {
      val ns = trans(row.getAs[String]("from_type"))
      val n = ns.sum
      assert(row.getAs[Long]("n_trans") === n)
      assert(row.getAs[Long]("n_dest") === ns.length.toLong)
      val coll = ns.map(c => BigInt(c) * (c - 1)).sum
      val simpson =
        if (n > 1) (coll * 1000000 / (BigInt(n) * (n - 1))).toLong else 0L
      assert(row.getAs[Long]("simpson_ppm") === simpson)
      assert(row.getAs[Long]("top_next_ppm") === (BigInt(ns.max) * 1000000 / n).toLong)
    }
  }

  test("ev_next_simpson: a deterministic chain scores exactly 10^6 per state") {
    val dir = graft.rawdata.Topic.tempDir("nextsimpson-chain")
    // user walks a->b->a->b->a: every 'a' is followed by 'b' and vice
    // versa — both states fully predictable
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 00:02:00"), 1L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 00:03:00"), 1L, "b", 1.0, "{}"),
      (5L, ts("2024-01-01 00:04:00"), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.queries("ev_next_simpson")(spark, dir).collect()
      .map(r => r.getAs[String]("from_type") -> r).toMap
    assert(rows("a").getAs[Long]("simpson_ppm") === 1000000L)
    assert(rows("a").getAs[Long]("n_dest") === 1L)
    assert(rows("b").getAs[Long]("simpson_ppm") === 1000000L)
    assert(rows("b").getAs[Long]("top_next_ppm") === 1000000L)
  }

  // ---- rd_key_skew ----------------------------------------------------------

  test("rd_key_skew: conserves the topic, matches the exact BigInt identity and its bounds") {
    val r = graft.rawdata.RawdataQueries.queries("rd_key_skew")(spark, sf)
      .collect()
    assert(r.length === 1)
    val row = r.head
    val counts = graft.Tables.events(spark, sf)
      .groupBy($"event_type").count().collect().map(x => BigInt(x.getLong(1)))
    val n = counts.sum
    assert(row.getAs[Long]("n_groups") === counts.length.toLong)
    assert(row.getAs[Long]("n_messages") === n.toLong)
    assert(row.getAs[Long]("min_group") === counts.min.toLong)
    assert(row.getAs[Long]("max_group") === counts.max.toLong)
    val hhi = (counts.map(c => c * c).sum * 1000000 / (n * n)).toLong
    assert(row.getAs[Long]("hhi_ppm") === hhi)
    assert(row.getAs[Long]("top_group_ppm") === (counts.max * 1000000 / n).toLong)
    assert(hhi >= 1000000L / counts.length && hhi <= 1000000L)
  }
}
