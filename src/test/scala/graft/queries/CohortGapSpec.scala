package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Conservation and bound laws for ev_cohort, ev_interarrival and
  * samp_cluster — properties the value-compare can't state (mass
  * conservation against the raw table, bucket boundary containment,
  * budget exactness).
  */
class CohortGapSpec extends SparkSpec {

  test("ev_cohort: offset 0 is the full cohort; retention never exceeds it") {
    val spark2 = spark
    import spark2.implicits._
    val rows = SparkEntry.queries("ev_cohort")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    for ((_, off, n, size, ppm) <- rows) {
      assert(n <= size, "no offset can retain more users than the cohort has")
      assert(ppm <= 1000000L)
      if (off == 0L) assert(n == size && ppm == 1000000L)
    }
    // every cohort has its offset-0 row
    val byCohort = rows.groupBy(_._1)
    for ((c, rs) <- byCohort)
      assert(rs.exists(_._2 == 0L), s"cohort $c lacks its size row")

    // total cohort mass = distinct users in the raw table
    val users = graft.Tables.events(spark, sf)
      .select(countDistinct($"user_id")).as[Long].head()
    assert(byCohort.values.map(_.find(_._2 == 0L).get._3).sum == users)
  }

  test("ev_interarrival: gap mass conserves (N - U) and stays inside bucket bounds") {
    val spark2 = spark
    import spark2.implicits._
    val rows = SparkEntry.queries("ev_interarrival")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val (n, u) = graft.Tables.events(spark, sf)
      .select(count(lit(1)), countDistinct($"user_id")).as[(Long, Long)].head()
    assert(rows.map(_._2).sum == n - u, "each user with k events contributes k-1 gaps")

    val bounds = Map(
      "b0_lt_1s" -> (0L, 1000000L), "b1_1s_10s" -> (1000000L, 10000000L),
      "b2_10s_1m" -> (10000000L, 60000000L), "b3_1m_10m" -> (60000000L, 600000000L),
      "b4_10m_1h" -> (600000000L, 3600000000L), "b5_1h_1d" -> (3600000000L, 86400000000L),
      "b6_ge_1d" -> (86400000000L, Long.MaxValue))
    for ((b, nGaps, nUsers, lo, hi) <- rows) {
      val (bLo, bHi) = bounds(b)
      assert(lo >= bLo && hi < bHi, s"bucket $b holds a gap outside [$bLo, $bHi)")
      assert(nUsers <= nGaps)
    }
  }

  test("ev_seasonality: event mass conserves, cells stay on the 7x24 grid, shares floor-sum to 1e6") {
    val spark2 = spark
    import spark2.implicits._
    val rows = SparkEntry.queries("ev_seasonality")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    val n = graft.Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == n, "every event lands in exactly one cell")
    for ((dow, hour, _, ppm) <- rows) {
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23)
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    // floored shares: sum is at most 1e6 and misses by < #cells
    val s = rows.map(_._4).sum
    assert(s <= 1000000L && s > 1000000L - rows.length)
  }

  test("samp_cluster: exact per-cluster budget, full membership, deterministic") {
    val spark2 = spark
    import spark2.implicits._
    val r1 = SparkEntry.queries("samp_cluster")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val r2 = SparkEntry.queries("samp_cluster")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r1 == r2, "hash-ranked selection must be run-to-run deterministic")

    val total = r1.map(_._2).sum
    val nVecs = graft.Tables.t(spark, sf, "embeddings").count()
    assert(total == nVecs, "every vector is assigned to exactly one cluster")

    val cap = math.max(1L, total / 16L) // 2 * KmeansK = 16
    for ((cid, members, kept, minK, maxK) <- r1) {
      assert(kept == math.min(cap, members), s"cluster $cid budget broken")
      assert(minK <= maxK)
    }
  }
}
