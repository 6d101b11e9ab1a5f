package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.{t, events}

/** SURVEY §2.B continued: q4/q5/q7/q8 and q13–q30.
  *
  * Same oracle-parity rules as [[Relational]] (exact DECIMAL money,
  * identical aliases, unique-key tie-breaks, BIGINT casts on DuckDB
  * integer aggregates whose native result is HUGEINT). Plans are written
  * for the 100 TB case: dimension tables are broadcast explicitly, fact
  * filters go before joins so the parquet scan prunes, and every window
  * is partitioned (never a global single-partition sort).
  */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def d6(c: Column): Column = c.cast(DecimalType(28, 6))
  /** revenue term used by most TPC-H shapes, as exact decimal */
  private def rev(p: Column, disc: Column): Column = d6(d2(p) * (lit(1) - d2(disc)))

  val queries: Map[String, Q] = Map(
    // EXISTS → left-semi join; the semi side is reduced to its join key
    // before the shuffle so only (orderkey) columns move.
    "q4_semijoin" -> { (s, d) =>
      import s.implicits._
      val ord = t(s, d, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"o_orderdate" < to_timestamp(lit("1996-07-01 00:00:00")))
      val big = t(s, d, "lineitem").filter($"l_quantity" > 45).select($"l_orderkey")
      ord.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },

    // 6-way star join: facts shuffle on their keys once. Only the
    // fixed-cardinality dims (region 5 rows, nation 25 rows) carry
    // broadcast hints; customer/supplier grow with sf, so forcing their
    // broadcast would OOM executors at 100× — AQE picks broadcast for
    // them while they're small and demotes to shuffle join when not.
    "q5_multijoin" -> { (s, d) =>
      import s.implicits._
      val asia = t(s, d, "region").filter($"r_name" === "ASIA")
      val nat = t(s, d, "nation")
      val sup = t(s, d, "supplier")
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"o_orderdate" < to_timestamp(lit("1997-01-01 00:00:00")))
      t(s, d, "lineitem")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(rev($"l_extendedprice", $"l_discount")).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // NOT EXISTS → left-anti join
    "q7_antijoin" -> { (s, d) =>
      import s.implicits._
      val cust = t(s, d, "customer")
      val ordKeys = t(s, d, "orders").select($"o_custkey")
      cust.join(ordKeys, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },

    // left outer + null-aware aggregates over the unmatched side
    "q8_outer_join" -> { (s, d) =>
      import s.implicits._
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_mktsegment")
        .agg(
          countDistinct($"c_custkey").as("n_customers"),
          count($"o_orderkey").as("n_orders"),
          sum(d2(coalesce($"o_totalprice", lit(0)))).cast("double").as("total_spend"))
        .orderBy($"c_mktsegment")
    },

    // Q13 shape: outer join with an ON-clause filter, then the count
    // distribution of the per-customer counts (two narrow shuffles).
    "q13_groupjoin" -> { (s, d) =>
      import s.implicits._
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders").filter($"o_orderpriority" =!= "5-LOW")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    },

    // conditional-sum ratio (Q14 promo revenue); part is unfiltered and
    // sf-scaling, so no broadcast hint — AQE broadcasts it while small
    "q14_expr" -> { (s, d) =>
      import s.implicits._
      val part = t(s, d, "part").select($"p_partkey", $"p_type")
      val li = t(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"l_shipdate" < to_timestamp(lit("1996-02-01 00:00:00")))
      li.join(part, $"l_partkey" === $"p_partkey")
        .agg(
          (lit(100.0) * sum(when($"p_type" === "PROMO", rev($"l_extendedprice", $"l_discount")).otherwise(lit(0))).cast("double")
            / sum(rev($"l_extendedprice", $"l_discount")).cast("double")).as("promo_revenue"))
    },

    // aggregate-as-view + exact-decimal max-equality self reference (Q15)
    "q15_view_topk" -> { (s, d) =>
      import s.implicits._
      val revenue = t(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"l_shipdate" < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy($"l_suppkey")
        .agg(sum(rev($"l_extendedprice", $"l_discount")).as("total_rev"))
      val top = revenue.agg(max($"total_rev").as("max_rev"))
      t(s, d, "supplier")
        .join(revenue, $"s_suppkey" === $"l_suppkey")
        .join(broadcast(top), $"total_rev" === $"max_rev")
        .select($"s_suppkey", $"s_name", $"total_rev".cast("double").as("total_revenue"))
        .orderBy($"s_suppkey")
    },

    // count-distinct per group with an anti-join supplier exclusion (Q16).
    // The filtered part slice keeps ~15% of an sf-scaling table — no
    // forced broadcast (at TPC-H sf100 it is millions of rows; AQE
    // promotes to broadcast at scales where that is actually safe).
    "q16_countd" -> { (s, d) =>
      import s.implicits._
      val part = t(s, d, "part")
        .filter($"p_brand" =!= "Brand#23" && $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35))
      val badSupp = t(s, d, "supplier").filter($"s_acctbal" < 0).select($"s_suppkey")
      t(s, d, "lineitem")
        .join(badSupp, $"l_suppkey" === $"s_suppkey", "left_anti")
        .join(part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    },

    // correlated scalar subquery (per-part avg), decorrelated into a
    // self-agg + join. Lineitem is pre-pruned to the brand's partkeys via a
    // semi join — valid because every line of a partkey belongs to the
    // same part, and it turns two full-fact shuffles into shuffles of a
    // small slice. The slice still scales with sf (~4% of part), so the
    // join strategy is AQE's call, not a forced broadcast.
    "q17_corr_subq" -> { (s, d) =>
      import s.implicits._
      val bparts = t(s, d, "part").filter($"p_brand" === "Brand#23").select($"p_partkey")
      val li = t(s, d, "lineitem")
        .join(bparts, $"l_partkey" === $"p_partkey", "left_semi")
      val avgQty = li.groupBy($"l_partkey".as("a_partkey"))
        .agg((sum($"l_quantity") / count(lit(1))).as("avg_qty"))
      li.join(avgQty, $"l_partkey" === $"a_partkey")
        .filter($"l_quantity" < lit(0.5) * $"avg_qty")
        .agg((sum(d2($"l_extendedprice")).cast("double") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    // IN (grouped HAVING subquery) (Q18): big-quantity orders
    "q18_in_subq" -> { (s, d) =>
      import s.implicits._
      val bigOrders = t(s, d, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 300)
      val cust = t(s, d, "customer").select($"c_custkey", $"c_name")
      // customer is sf-scaling: no broadcast hint (AQE decides)
      t(s, d, "orders")
        .join(bigOrders, $"o_orderkey" === $"l_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey",
          $"o_orderdate".cast("date").cast("string").as("o_orderdate"),
          round($"o_totalprice", 2).as("o_totalprice"),
          $"total_qty".cast("double").as("total_qty"))
        .orderBy($"total_qty".desc, $"o_orderkey")
        .limit(100)
    },

    // disjunctive multi-range predicate join (Q19) — the OR of three
    // (brand, size, quantity) envelopes stays a single scan + join; part is
    // unfiltered and sf-scaling so the join strategy is left to AQE
    "q19_or_pred" -> { (s, d) =>
      import s.implicits._
      val part = t(s, d, "part").select($"p_partkey", $"p_brand", $"p_size")
      t(s, d, "lineitem")
        .join(part, $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30)))
        .agg(sum(rev($"l_extendedprice", $"l_discount")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // nested semi-join chain (Q20): suppliers of red parts with a large
    // shipped-quantity total. redParts is a ~4% slice of an sf-scaling
    // table — AQE decides the semi-join strategy.
    "q20_nested" -> { (s, d) =>
      import s.implicits._
      val redParts = t(s, d, "part").filter($"p_name".like("red %")).select($"p_partkey")
      val bigSupp = t(s, d, "lineitem")
        .join(redParts, $"l_partkey" === $"p_partkey", "left_semi")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")))
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity").as("sum_qty"))
        .filter($"sum_qty" > 50)
        .select($"l_suppkey")
      t(s, d, "supplier")
        .join(bigSupp, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
        .orderBy($"s_suppkey")
    },

    // UNION ALL branches + one aggregation over the union
    "q21_union" -> { (s, d) =>
      import s.implicits._
      val ord = t(s, d, "orders")
      val urgent = ord.filter($"o_orderpriority" === "1-URGENT")
        .select(lit("urgent").as("src"), $"o_totalprice")
      val big = ord.filter($"o_totalprice" > 400000.0)
        .select(lit("big").as("src"), $"o_totalprice")
      urgent.unionByName(big)
        .groupBy($"src")
        .agg(count(lit(1)).as("n"), sum(d2($"o_totalprice")).cast("double").as("total"))
        .orderBy($"src")
    },

    // ROLLUP hierarchy totals; grouping id disambiguates the NULL-free
    // coalesced group labels
    "q22_rollup" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(
          sum(d2($"l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          (grouping($"l_returnflag") * 2 + grouping($"l_linestatus")).cast("long").as("gid"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"),
          $"gid", $"sum_qty", $"n")
        .orderBy($"gid", $"rf", $"ls")
    },

    // CUBE over two order dimensions
    "q23_cube" -> { (s, d) =>
      import s.implicits._
      t(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(
          sum(d2($"o_totalprice")).cast("double").as("total"),
          count(lit(1)).as("n"),
          (grouping($"o_orderstatus") * 2 + grouping($"o_orderpriority")).cast("long").as("gid"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"gid", $"total", $"n")
        .orderBy($"gid", $"status", $"priority")
    },

    // rank / dense_rank per partition — window partitioned by brand, so it
    // scales with the number of brands, never a global sort
    "q24_window_rank" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
      t(s, d, "part")
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"p_brand", $"p_partkey", round($"p_retailprice", 2).as("p_retailprice"), $"rnk", $"drnk")
        .orderBy($"p_brand", $"rnk", $"p_partkey")
    },

    // running sum + lag delta per customer ordered by time (partitioned
    // window; exact decimal accumulation)
    "q25_window_running" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, d, "orders")
        .withColumn("running_spend",
          sum(d2($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .withColumn("delta",
          (d2($"o_totalprice") - coalesce(lag(d2($"o_totalprice"), 1).over(w), lit(0))).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"running_spend", $"delta")
    },

    // exact interpolated percentiles per group
    "q26_ntile_median" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          percentile($"l_extendedprice", lit(0.5)).as("median_price"),
          percentile($"l_extendedprice", lit(0.25)).as("p25_price"),
          percentile($"l_extendedprice", lit(0.75)).as("p75_price"),
          percentile($"l_quantity", lit(0.5)).as("median_qty"))
        .orderBy($"l_returnflag")
    },

    // pivot: wide conditional aggregation by category
    "q27_pivot" -> { (s, d) =>
      import s.implicits._
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val pivoted = t(s, d, "orders")
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(sum(d2($"o_totalprice")).cast("double"))
      prios.zipWithIndex.foldLeft(pivoted) { case (df, (p, i)) =>
        df.withColumnRenamed(p, s"p$i")
      }
        .na.fill(0.0, (0 to 4).map(i => s"p$i"))
        .orderBy($"o_orderstatus")
    },

    // as-of join: each purchase matched to the most recent click at/before
    // it, per user. One shuffle on user_id; within a user the match is a
    // running last-non-null over the time-ordered union — never a per-row
    // range probe, so it scales with events/user, not events².
    "q28_asof_join" -> { (s, d) =>
      import s.implicits._
      val ev = events(s, d)
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
        .withColumn("is_p", when($"event_type" === "purchase", 1).otherwise(0))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts_us", $"is_p", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("click_ts", when($"is_p" === 0, $"ts_us"))
        .withColumn("prev_click_us", last($"click_ts", ignoreNulls = true).over(w))
        .filter($"is_p" === 1)
        .select($"event_id", $"user_id", $"ts_us",
          coalesce($"prev_click_us", lit(-1L)).as("prev_click_us"),
          coalesce($"ts_us" - $"prev_click_us", lit(-1L)).as("gap_us"))
    },

    // interval/range join: purchase within 1h after a view, same user.
    // Equi-join on user_id carries the range as a residual predicate — the
    // shuffle key is the user, so no time-bucket cross product is built.
    "q29_range_join" -> { (s, d) =>
      import s.implicits._
      val ev = events(s, d)
      val v = ev.filter($"event_type" === "view")
        .select($"user_id".as("v_user"), unix_micros($"ts").as("v_us"))
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), unix_micros($"ts").as("p_us"))
      v.join(p, $"v_user" === $"p_user" && $"p_us" > $"v_us" && $"p_us" <= $"v_us" + lit(3600000000L))
        .agg(count(lit(1)).as("n_pairs"), countDistinct($"v_user").as("n_users"),
          (sum($"p_us" - $"v_us") / count(lit(1)) / 1e6).as("avg_gap_sec"))
    },

    // HLL approximate distinct vs exact — rows-only (approx result has no
    // SQL-exact oracle); the spec asserts the error bound instead
    "q30_approx_distinct" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .agg(
          approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"),
          approx_count_distinct($"l_suppkey").as("approx_supps"),
          countDistinct($"l_suppkey").as("exact_supps"))
    },

    // set operators (INTERSECT / EXCEPT — the one relational family the
    // other 30 shapes don't touch): customers active in both 1995 and
    // 1996 vs only-1995. Both set ops compile to distinct-aggregated
    // semi/anti hash joins on the customer key — one shuffle each over
    // the already-distinct per-year key sets, never over raw orders.
    "q31_setops" -> { (s, d) =>
      import s.implicits._
      val o = t(s, d, "orders")
      def yr(y: Int) = o.filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
      val both = yr(1995).intersect(yr(1996))
        .agg(count(lit(1)).as("n_both"),
          coalesce(sum($"o_custkey"), lit(0L)).as("sum_both"))
        .withColumn("one", lit(1))
      val only = yr(1995).except(yr(1996))
        .agg(count(lit(1)).as("n_only_1995"),
          coalesce(sum($"o_custkey"), lit(0L)).as("sum_only_1995"))
        .withColumn("one", lit(1))
      both.join(only, Seq("one")).drop("one")
    },

    // GROUPING SETS over (flag, status) / (flag) / (): the multi-level
    // rollup report in ONE pass — Catalyst expands the grouping sets
    // before the aggregation, so the scan runs once and the aggregate is
    // still partial (map-side combine per grouping-set key). NULL group
    // values are coalesced to a sentinel and the grouping_id is emitted
    // explicitly so the output is total-order comparable.
    "q32_grouping_sets" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq()),
          $"l_returnflag", $"l_linestatus")
        .agg(
          (grouping($"l_returnflag") * 2 + grouping($"l_linestatus")).cast("long").as("gid"),
          count(lit(1)).as("n"),
          sum(d6($"l_quantity")).cast("double").as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rflag"),
          coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
          $"gid", $"n", $"sum_qty")
        .orderBy($"gid", $"rflag", $"lstatus")
    },

    // approximate quantiles (the KLL-style sketch companion to q30's
    // HLL): approx_percentile's mergeable sketch vs the exact
    // percentiles, side by side. Rows-only (the sketch is
    // implementation-defined); AnalyticsOpsSpec asserts the documented
    // rank-error bound against the sorted data. Scale shape: the sketch
    // aggregates with map-side partial merge — one scan, no sort — which
    // is the only quantile shape that survives 100 TB (exact percentile
    // is a per-group sort and is kept here purely as the yardstick).
    "q33_approx_quantile" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(CAST(l_extendedprice AS DOUBLE), array(0.5D, 0.95D), 10000)").as("ap"),
          expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.5D, 0.95D))").as("ep"))
        .select($"n",
          $"ap".getItem(0).as("approx_p50"), $"ap".getItem(1).as("approx_p95"),
          $"ep".getItem(0).as("exact_p50"), $"ep".getItem(1).as("exact_p95"))
    },

    // HAND-BUILT deterministic HLL (q30's value-checkable twin): md5-
    // derived 32-bit hashes, 64 registers, rho from an integer
    // comparison chain — every piece replays bit-for-bit in the oracle,
    // unlike the engine-internal HLL++ sketch behind
    // approx_count_distinct. The register table is the mergeable state:
    // per (group, bucket) MAX(rho) is a partial agg that merges across
    // any partitioning — at 100 TB the shuffle carries ≤ 64 rows per
    // group. The estimate is the raw HLL formula; the 2^-rho summands
    // are exact dyadic rationals (≤ 33 fraction bits, ≤ 64 terms), so
    // the double sum is EXACT regardless of summation order — which is
    // what makes a floating-point estimator hash-comparable at all.
    // (Small-range linear counting is deliberately omitted: it needs a
    // transcendental ln whose last ulp differs across libms; the raw
    // branch is the 100 TB regime anyway.)
    "q34_hll_sketch" -> { (s, d) =>
      import s.implicits._
      val m = 64
      val bucket = expr("CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 64")
      val w = "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 9, 8), 16, 10) AS BIGINT)"
      val rho = expr(HllRhoCase(w))
      val regs = t(s, d, "lineitem")
        .select($"l_returnflag", bucket.as("bucket"), rho.as("rho"),
          $"l_orderkey")
        .groupBy($"l_returnflag", $"bucket")
        .agg(max($"rho").as("mr"))
      val est = regs.groupBy($"l_returnflag")
        .agg(sum(expr("power(2.0, -mr)")).as("present_sum"),
          count(lit(1)).as("present"))
        .withColumn("denom", $"present_sum" + (lit(m) - $"present") * lit(1.0))
        .withColumn("hll_est",
          floor(lit(0.709) * lit(m) * lit(m) / $"denom" + lit(0.5)).cast("long"))
      val exact = t(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("exact_distinct"))
      est.join(exact, Seq("l_returnflag"))
        .select($"l_returnflag", $"hll_est", $"exact_distinct",
          expr("(abs(hll_est - exact_distinct) * 1000000) div exact_distinct").as("err_ppm"))
        .orderBy($"l_returnflag")
    },

    // Bottom-k sample quantiles (q33's value-checkable twin): the k rows
    // with the smallest md5 row-hashes are a uniform deterministic
    // sample. Quantile = the positional element of the sample under a
    // total (value, hash) order, next to the SAME positional definition
    // on the full group — both replay exactly in SQL, no engine-defined
    // interpolation. Scale shape (the oracle keeps the row-level
    // positional form; both sides below are value-identical to it):
    //  - exact side: positional value at rank r == min v whose
    //    cumulative count reaches r (the hash tie-break orders rows
    //    WITHIN equal values, so it can never change the value at a
    //    position) — one (group, v) partial agg, then a cumulative
    //    window over the histogram, which is |distinct values| rows per
    //    group, never the data.
    //  - sample side: bottom-k is salt-decomposable (any row in the
    //    global bottom-k has < k smaller hashes in the whole group, so
    //    at most k-1 in its salt class) — 32 salt classes each keep a
    //    local bottom-k, and the per-group sort only ever sees 32·k
    //    candidates. Avoids the 3-task global sort a
    //    partitionBy(l_returnflag) window would pin on a 100 TB fact.
    "q35_bottomk_quantile" -> { (s, d) =>
      import s.implicits._
      val k = 128
      val rowHash = md5(concat($"l_orderkey".cast("string"), lit("_"),
        $"l_linenumber".cast("string")))
      val li = t(s, d, "lineitem")
        .select($"l_returnflag", $"l_quantity".cast("long").as("v"), rowHash.as("h"))
        // histogram side + sample side + the two scalar guards all read
        // this once-materialized relation; localCheckpoint (not persist)
        // so the blocks are context-cleaned when the result is dropped —
        // no cache-manager residue for a composing caller (CacheScopeSpec)
        .localCheckpoint(true)
      val wGrp = Window.partitionBy($"l_returnflag")
      // exact percentiles from the value-count histogram
      val wCum = Window.partitionBy($"l_returnflag").orderBy($"v")
      val hist = li.groupBy($"l_returnflag", $"v").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(wGrp))
      def exactAt(q: Double) =
        min(when($"cum" >= greatest(lit(1L), ceil(lit(q) * $"n").cast("long")), $"v"))
      val exact = hist.groupBy($"l_returnflag")
        .agg(max($"n").as("n_rows"),
          exactAt(0.5).as("exact_p50"), exactAt(0.9).as("exact_p90"))
      // bottom-k sample via salted two-phase selection, behind a
      // threshold pre-filter: md5 hex orders uniformly, so the kth
      // smallest hash sits near position k/n of the hash space — rows
      // whose first 16 bits clear 8× that position can never be in the
      // bottom k (Chernoff margin e^-4k ≈ e^-512 against undershoot).
      // The wide selection stages then carry O(k) rows per group instead
      // of the whole relation — at 100 TB the shuffle drops from the
      // corpus to megabytes. Exactness is by construction, not by
      // probability: two 3-row scalar aggregates (group counts, survivor
      // counts) gate the filter, and any undershooting group falls back
      // to the unfiltered path.
      val nByFlag = li.groupBy($"l_returnflag").agg(count(lit(1)).as("nf"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val hSpace16 = 65536L
      val thr = nByFlag.map { case (f, n) =>
        f -> math.min(hSpace16, (8L * k * hSpace16) / math.max(1L, n) + 1L) }.toMap
      val thrCol = nByFlag.foldLeft(lit(hSpace16)) { case (acc, (f, _)) =>
        when($"l_returnflag" === f, lit(thr(f))).otherwise(acc) }
      val pre = li.filter(
        expr("CAST(conv(substring(h, 1, 4), 16, 10) AS BIGINT)") < thrCol)
      val preOk = pre.groupBy($"l_returnflag").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val enough = nByFlag.forall { case (f, n) =>
        preOk.getOrElse(f, 0L) >= math.min(k.toLong, n) }
      val bkBase = if (enough) pre else li
      val wSalt = Window.partitionBy($"l_returnflag", $"salt").orderBy($"h")
      val wSamp = Window.partitionBy($"l_returnflag").orderBy($"h")
      val wVal = Window.partitionBy($"l_returnflag").orderBy($"v", $"h")
      val cand = bkBase
        .withColumn("salt", expr("pmod(CAST(conv(substring(h, 29, 4), 16, 10) AS BIGINT), 32)"))
        .withColumn("prn", row_number().over(wSalt))
        .filter($"prn" <= k)
        .drop("salt", "prn")
      val samp = cand.withColumn("srn", row_number().over(wSamp))
        .filter($"srn" <= k)
        .withColumn("svrn", row_number().over(wVal))
        .withColumn("sn", count(lit(1)).over(wGrp))
      def sampAt(q: Double) =
        max(when($"svrn" === greatest(lit(1L), ceil(lit(q) * $"sn").cast("long")), $"v"))
      val estd = samp.groupBy($"l_returnflag")
        .agg(max($"sn").as("k_used"),
          sampAt(0.5).as("est_p50"), sampAt(0.9).as("est_p90"))
      exact.join(estd, Seq("l_returnflag"))
        .select($"l_returnflag", $"n_rows", $"k_used",
          $"est_p50", $"exact_p50", $"est_p90", $"exact_p90")
        .orderBy($"l_returnflag")
    },

    // RANGE-frame trailing window: each order carries its customer's
    // rolling 90-day order count and spend — the frame is VALUE-based
    // (all orders within 89 prior days), not row-based, so same-day
    // orders share one frame and the answer is insensitive to intra-day
    // ordering. Scale shape: the window partitions by customer — frame
    // evaluation is a per-customer sorted pass, parallelism = |customers|
    // — and the DECIMAL sum keeps float addition order out of the
    // answer. The canonical "trailing spend" feature every feature store
    // materializes.
    "q36_range_window" -> { (s, d) =>
      import s.implicits._
      val o = t(s, d, "orders").select($"o_orderkey", $"o_custkey",
        expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
          .cast("long").as("day"),
        d6($"o_totalprice").as("price"))
      val w = Window.partitionBy($"o_custkey").orderBy($"day")
        .rangeBetween(-89, Window.currentRow)
      o.select($"o_orderkey", $"o_custkey", $"day",
          count(lit(1)).over(w).as("n_90d"),
          sum($"price").over(w).cast("double").as("spend_90d"))
        .orderBy($"o_orderkey")
    },

    // blocked fuzzy (edit-distance) self-join — the entity-resolution
    // primitive: find near-duplicate part NAMES without the all-pairs
    // cross product. Blocking key = (brand, first name token), the
    // classic cheap canopy: candidate pairs exist only inside a block, so
    // the join is an equi-join Catalyst shuffles on the block key and the
    // quadratic cost is bounded by max block occupancy, not |part|².
    // levenshtein() is the codegen'd built-in (no UDF); the ≤3 threshold
    // keeps only plausible typo/variant matches, and the per-brand rollup
    // keeps the OUTPUT size |brands|-bounded while the pair relation
    // stays a scalable intermediate. Same shape the dedup family uses for
    // LSH buckets, here on a relational dimension.
    "q37_fuzzy_join" -> { (s, d) =>
      import s.implicits._
      val p = t(s, d, "part")
        .select($"p_partkey", $"p_name", $"p_brand",
          split($"p_name", " ").getItem(0).as("tok1"))
      val a = p.toDF("a_key", "a_name", "p_brand", "tok1")
      val b = p.toDF("b_key", "b_name", "p_brand", "tok1")
      a.join(b, Seq("p_brand", "tok1"))
        .filter($"a_key" < $"b_key")
        .withColumn("dist", levenshtein($"a_name", $"b_name"))
        .filter($"dist" <= 3)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when($"dist" === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(when($"dist" > 0, 1L).otherwise(0L)).as("n_near"))
        .orderBy($"p_brand")
    },

    // unpivot/melt — the wide→long reshape (inverse of q27's pivot):
    // per-flag exact DECIMAL sums of three measures, then the typed
    // Dataset.unpivot API turns the 3 measure columns into (measure,
    // value) rows. The unpivot itself is a narrow per-row EXPAND (no
    // shuffle, no UDF); only the preceding agg shuffles, on l_returnflag.
    "q38_unpivot" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_returnflag")
        .agg(sum(d6($"l_quantity")).cast("double").as("sum_qty"),
          sum(d6($"l_extendedprice")).cast("double").as("sum_price"),
          sum(d6($"l_discount")).cast("double").as("sum_disc"))
        .unpivot(Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"sum_disc"), "measure", "value")
        .orderBy($"l_returnflag", $"measure")
    },

    // degree-ordered triangle counting over the part co-purchase graph
    // (parts are adjacent when one order contains both) — the canonical
    // distributed-graph pattern. Two load-bearing tricks:
    //  1. ORIENTATION: each undirected edge points from its
    //     lower-(degree,id) endpoint to the higher one, so out-degree is
    //     O(√m) — no hot task ever holds a celebrity node's full
    //     adjacency at 100 TB, and each triangle is counted exactly once
    //     (the (degree, id) total order is acyclic).
    //  2. EDGE-ITERATOR: instead of materializing the wedge join
    //     (edges ⋈ edges — ~100M shuffled rows at sf0.1), build the
    //     per-node oriented adjacency array once and count
    //     |N⁺(s) ∩ N⁺(t)| per edge with the codegen'd array_intersect —
    //     two hash joins of the edge list against the √m-bounded
    //     adjacency relation, intersection work identical, shuffle
    //     volume |E|, not |wedges|. Locally the win is modest (the 1.2M-
    //     edge build dominates at sf0.1); at cluster scale the |wedges|
    //     vs |E| shuffle-volume gap is the whole game.
    // Output is the 1-row graph profile: nodes/edges/max-degree/wedges/
    // triangles + integer global closure (transitivity) ppm; the 1-row
    // aggregates compose on a literal key, never a cartesian.
    "q39_triangles" -> { (s, d) =>
      import s.implicits._
      // edge + degree relations come from the materialized co-purchase
      // graph index (built once per dataset, shared with q40/q41)
      val e = CoPurchaseGraph.edges(s, d).select($"u", $"v")
      val deg = CoPurchaseGraph.degrees(s, d)
      val oe = e
        .join(deg.toDF("u", "du"), Seq("u"))
        .join(deg.toDF("v", "dv"), Seq("v"))
        .select(when($"du" <= $"dv", $"u").otherwise($"v").as("s"),
          when($"du" <= $"dv", $"v").otherwise($"u").as("t"))
      val adj = oe.groupBy($"s".as("x")).agg(collect_set($"t").as("nbr"))
      val tri = oe
        .join(adj.toDF("s", "nbr_s"), Seq("s"))
        .join(adj.toDF("t", "nbr_t"), Seq("t"))
        .select(size(array_intersect($"nbr_s", $"nbr_t")).cast("long").as("c"))
        .agg(coalesce(sum($"c"), lit(0L)).as("n_triangles"))
      def one(df: DataFrame) = df.withColumn("one", lit(1))
      one(deg.agg(count(lit(1)).as("n_nodes"), max($"dg").as("max_degree"),
          sum(expr("(dg * (dg - 1)) div 2")).as("n_wedges")))
        .join(one(e.agg(count(lit(1)).as("n_edges"))), Seq("one"))
        .join(one(tri), Seq("one"))
        .select($"n_nodes", $"n_edges", $"max_degree", $"n_wedges",
          $"n_triangles",
          when($"n_wedges" === 0L, lit(0L))
            .otherwise(expr("(n_triangles * 3000000) div n_wedges"))
            .as("closure_ppm"))
    },

    // power-iteration PageRank over the same co-purchase graph — the
    // iterative-graph companion to q39 (components → dd_cluster,
    // triangles → q39, centrality → here). Two damped iterations in
    // EXACT integer arithmetic: total mass 10¹² pico-units, per-node
    // share (r·85) div (100·deg) floored identically on both engines, so
    // the DuckDB twin (the same two rounds unrolled as CTEs, like
    // emb_kmeans's Lloyd replay) value-matches every rank. Each round is
    // the classic scatter-gather: a share projection co-keyed with the
    // rank relation, one shuffle on the destination vertex, a LEFT join
    // back to the node set (isolated-in-degree nodes keep the teleport
    // base). The driver builds the whole 2-round PLAN — no action, no
    // collect;
    // the global top-20 is a TakeOrderedAndProject, never a full sort.
    "q40_pagerank" -> { (s, d) =>
      import s.implicits._
      // symmetrized adjacency comes pre-materialized from the index (no
      // runtime union/persist); the node relation carries (x, dg, base)
      // through every round so the loop never re-joins degrees — each
      // round is exactly one broadcast scatter join + one partially-
      // aggregated shuffle on the destination vertex.
      val sym = CoPurchaseGraph.symEdges(s, d)
      val degN = CoPurchaseGraph.degrees(s, d)
        .withColumn("one", lit(1))
        .join(CoPurchaseGraph.degrees(s, d).agg(count(lit(1)).as("n"))
          .withColumn("one", lit(1)), Seq("one"))
        .select($"x", $"dg",
          expr("15000000000000 div (100 * n)").as("base"),
          expr("1000000000000 div n").as("r0"))
        // node-sized; localCheckpoint so each round and the final top-k
        // read one materialization and the blocks are context-cleaned
        // when the result is dropped (CacheScopeSpec)
        .localCheckpoint(true)
      var r = degN.select($"x", $"dg", $"base", $"r0".as("r"))
      for (_ <- 1 to 2) {
        val share = r.select($"x".as("u"), expr("(r * 85) div (100 * dg)").as("sh"))
        val inc = sym.join(share, Seq("u"))
          .groupBy($"v".as("x")).agg(sum($"sh").as("inc"))
        r = degN.join(inc, Seq("x"), "left")
          .select($"x", $"dg", $"base",
            ($"base" + coalesce($"inc", lit(0L))).as("r"))
      }
      r.orderBy($"r".desc, $"x").limit(20)
        .select($"x".as("part_id"), $"r".as("rank_pico"))
    },

    // market-basket association rules — top pairs by LIFT with a
    // minimum-support floor, the retail-analytics classic. All three
    // signals come straight off the materialized co-purchase index:
    // pair support is the edge `supp` count, item support the `item`
    // order counts, so the query itself touches no fact table — two
    // broadcast-sized joins keyed on the edge endpoints plus the 1-row
    // total-order count composed on a literal key. Lift runs in exact
    // DECIMAL(38,0) with a single floored div (txt_pmi's overflow-proof
    // pattern: supp·N·10⁶ overflows int64 once N·support pass ~3e6 at
    // cluster scale), confidence in integer ppm both directions; the
    // support floor keeps the output from chasing noise pairs and the
    // top-20 is a TakeOrderedAndProject.
    "q41_assoc_rules" -> { (s, d) =>
      import s.implicits._
      val nOrd = t(s, d, "lineitem").select($"l_orderkey").distinct()
        .agg(count(lit(1)).as("nn")).withColumn("one", lit(1))
      CoPurchaseGraph.edges(s, d)
        .filter($"supp" >= 5L)
        .join(CoPurchaseGraph.items(s, d).toDF("u", "supp_u"), Seq("u"))
        .join(CoPurchaseGraph.items(s, d).toDF("v", "supp_v"), Seq("v"))
        .withColumn("one", lit(1)).join(nOrd, Seq("one"))
        .select($"u".as("part_a"), $"v".as("part_b"), $"supp".as("n_both"),
          $"supp_u".as("n_a"), $"supp_v".as("n_b"),
          expr("CAST((CAST(supp AS DECIMAL(38,0)) * nn * 1000000) div " +
            "(CAST(supp_u AS DECIMAL(38,0)) * supp_v) AS BIGINT)")
            .as("lift_ppm"),
          expr("(supp * 1000000) div supp_u").as("conf_ab_ppm"),
          expr("(supp * 1000000) div supp_v").as("conf_ba_ppm"))
        .orderBy($"lift_ppm".desc, $"part_a", $"part_b").limit(20)
    },

    // bounded-hop BFS reachability profile from a deterministic seed
    // (the minimum part id) over the co-purchase graph — the traversal
    // member of the graph family (components → dd_cluster, triangles →
    // q39, centrality → q40, reach → here). Three unrolled scatter
    // rounds, each one equi-join of the symmetrized edge relation
    // against the previous frontier plus a min-dist consolidation
    // shuffle — the exact iterate-until-k shape of a distributed BFS,
    // with each round persisted so round i's plan doesn't re-execute
    // round i-1 twice (frontier + union both read it). The final
    // node-sized relation is checkpointed once and the round persists
    // released before returning (CacheScope.scoped), so a composing
    // caller inherits no pinned blocks (CacheScopeSpec). The DuckDB
    // twin unrolls the same three rounds as CTEs, so every level count
    // value-matches.
    "q42_reach" -> { (s, d) =>
      import s.implicits._
      val sym = CoPurchaseGraph.symEdges(s, d)
      val nodes = CoPurchaseGraph.degrees(s, d).select($"x")
      var reach = nodes.agg(min($"x").as("x")).select($"x", lit(0L).as("dist"))
      val rounds = Seq.newBuilder[DataFrame]
      for (i <- 1 to 3) {
        val frontier = reach.filter($"dist" === (i - 1).toLong).select($"x".as("u"))
        val nxt = sym.join(frontier, Seq("u"))
          .select($"v".as("x"), lit(i.toLong).as("dist"))
        reach = reach.unionByName(nxt)
          .groupBy($"x").agg(min($"dist").as("dist")).persist()
        rounds += reach
      }
      reach = CacheScope.scoped(rounds.result())(reach)
      val profile = reach.groupBy($"dist")
        .agg(count(lit(1)).as("n_nodes"),
          min($"x").as("min_part"), max($"x").as("max_part"))
      val unreached = nodes.join(reach.select($"x"), Seq("x"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"),
          min($"x").as("min_part"), max($"x").as("max_part"))
        .select(lit(-1L).as("dist"), $"n_nodes", $"min_part", $"max_part")
        .filter($"n_nodes" > 0)
      profile.select($"dist", $"n_nodes", $"min_part", $"max_part")
        .unionByName(unreached)
        .orderBy($"dist")
    },

    // degeneracy peeling (k-core) on the co-purchase graph — the graph-
    // sparsification step community detection and influence analysis run
    // first: iteratively remove nodes whose CURRENT degree is below k,
    // where k = 70 % of the mean degree (data-derived via one 1-row
    // aggregate, so the threshold tracks graph density at any sf instead
    // of hard-coding a constant that goes trivial at scale). Three
    // synchronous peel rounds (the distributed formulation: a round
    // removes ALL current sub-k nodes at once, then neighbors' degrees
    // drop by their removed-neighbor counts — survivors are the
    // complement filter of the removal predicate (no join needed), so a
    // round costs one semi join + one partial-agg shuffle, the q42 BFS
    // cost shape), profile =
    // per-round removals + the surviving core. Exact integers
    // throughout, so the full peel trajectory replays in the oracle's
    // unrolled CTEs.
    "q46_kcore" -> { (s, d) =>
      import s.implicits._
      val sym = CoPurchaseGraph.symEdges(s, d)
      val deg0 = CoPurchaseGraph.degrees(s, d)
      val kk = deg0.agg(sum($"dg").as("sd"), count(lit(1)).as("n"))
        .select(expr("(sd * 7) div (n * 10)").as("k"))
        .withColumn("one", lit(1))
      var cur = deg0.withColumn("one", lit(1)).join(kk, Seq("one"))
        .select($"x", $"dg", $"k")
        .localCheckpoint(true)
      // empty 0-row seed with the profile schema; rounds union onto it
      var profile = s.range(0).select(lit(0L).as("rnd"), lit(0L).as("n_nodes"),
        lit(0L).as("min_part"), lit(0L).as("max_part"))
      for (r <- 1 to 3) {
        val rem = cur.filter($"dg" < $"k")
        profile = profile.unionByName(
          rem.agg(count(lit(1)).as("n_nodes"),
            min($"x").as("min_part"), max($"x").as("max_part"))
            .select(lit(r.toLong).as("rnd"), $"n_nodes", $"min_part", $"max_part")
            .filter($"n_nodes" > 0))
        val dec = sym.join(rem.select($"x".as("u")), Seq("u"))
          .groupBy($"v".as("x")).agg(count(lit(1)).as("c"))
        // rem is cur.filter(dg < k) and x is unique per row, so the
        // survivor set is just the complement filter — the former
        // left_anti against rem re-joined cur against a filter of
        // itself (one Exchange+Sort pair per round for nothing).
        cur = cur.filter($"dg" >= $"k")
          .join(dec, Seq("x"), "left")
          .select($"x", ($"dg" - coalesce($"c", lit(0L))).as("dg"), $"k")
          .localCheckpoint(true)
      }
      profile.unionByName(
        cur.agg(count(lit(1)).as("n_nodes"),
          min($"x").as("min_part"), max($"x").as("max_part"))
          .select(lit(99L).as("rnd"), $"n_nodes", $"min_part", $"max_part"))
        .orderBy($"rnd")
    },

    // synchronous label propagation (community detection) on the
    // co-purchase graph: every node starts labeled by itself; each round
    // adopts the most frequent label among its neighbors (tie → smallest
    // label), all nodes updating simultaneously. Two rounds, then the
    // community size profile. The argmax is a partial-agg
    // min(struct(-count, label)) — per-node neighbor-label counts never
    // pass through a window or a global sort. Scale shape per round: one
    // equi-join of the (bucketed) symmetric edge list against the label
    // relation + two partial-agg shuffles — the q42/q46 BFS cost shape,
    // with localCheckpoint truncating the growing lineage. Top-20 via
    // TakeOrderedAndProject.
    "q47_labelprop" -> { (s, d) =>
      import s.implicits._
      lpaLabels(s, d).groupBy($"lbl".as("community"))
        .agg(count(lit(1)).as("n_members"),
          min($"x").as("min_member"), max($"x").as("max_member"))
        .orderBy($"n_members".desc, $"community")
        .limit(20)
    },

    // modularity scoring of the q47 partition — the "was that clustering
    // any good" number (Newman's Q, per community): contribution =
    // intra_edges/m − (degree_sum/2m)², both terms floored to ppm so the
    // full score table hash-matches. The degree term squares a quantity
    // that reaches ~1e12 at cluster scale — computed in DECIMAL(38,0)
    // (HUGEINT on the oracle side), never BIGINT. Scale shape: the label
    // relation joins the edge list twice on its endpoints (bucketed
    // sides), degree mass is one partial agg, and m is a 1-row broadcast
    // — no window, no global sort, top-20 via TakeOrdered.
    "q48_modularity" -> { (s, d) =>
      import s.implicits._
      val lbl = lpaLabels(s, d)
      val edges = CoPurchaseGraph.edges(s, d).select($"u", $"v")
      val mRel = edges.agg(count(lit(1)).as("m")).withColumn("one", lit(1))
      val intra = edges
        .join(lbl.select($"x".as("u"), $"lbl".as("cu")), Seq("u"))
        .join(lbl.select($"x".as("v"), $"lbl".as("cv")), Seq("v"))
        .filter($"cu" === $"cv")
        .groupBy($"cu".as("community")).agg(count(lit(1)).as("intra_edges"))
      CoPurchaseGraph.degrees(s, d).join(lbl, Seq("x"))
        .groupBy($"lbl".as("community"))
        .agg(sum($"dg").as("degree_sum"), count(lit(1)).as("n_members"))
        .join(intra, Seq("community"), "left")
        .withColumn("intra_edges", coalesce($"intra_edges", lit(0L)))
        .withColumn("one", lit(1)).join(broadcast(mRel), Seq("one")).drop("one")
        .withColumn("intra_ppm", expr("(intra_edges * 1000000) div m"))
        .withColumn("deg_ppm", expr(
          "CAST((CAST(degree_sum AS DECIMAL(38,0)) * degree_sum * 1000000) div " +
            "(CAST(m AS DECIMAL(38,0)) * m * 4) AS BIGINT)"))
        .withColumn("contribution_ppm", $"intra_ppm" - $"deg_ppm")
        .select($"community", $"n_members", $"intra_edges", $"degree_sum",
          $"intra_ppm", $"deg_ppm", $"contribution_ppm")
        .orderBy($"n_members".desc, $"community")
        .limit(20)
    },

    // distribution-position window functions — percent_rank / cume_dist
    // / first_value in one per-segment pass (the remaining standard
    // window family q24/q25/q26 don't cover). The ORDER BY carries the
    // unique custkey tie-break so there are no rank peers: cume_dist is
    // exactly rn/n, percent_rank exactly (rn-1)/(n-1), and both engines
    // round the same IEEE double to ppm. Window partitioned by segment —
    // never a global funnel.
    "q43_pct_dist" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".asc, $"c_custkey".asc)
      t(s, d, "customer")
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
          floor(percent_rank().over(w) * lit(1000000.0) + lit(0.5))
            .cast("long").as("pct_rank_ppm"),
          floor(cume_dist().over(w) * lit(1000000.0) + lit(0.5))
            .cast("long").as("cume_ppm"),
          first($"c_custkey").over(w).as("poorest_cust"))
        .orderBy($"c_mktsegment", $"c_custkey")
    },

    // exact weighted quantiles (weighted median + quartiles of price
    // weighted by quantity — the "median price per shipped unit" stat
    // plain quantiles get wrong whenever weights vary): the q35 exact
    // trick generalized to weights — quantile = min value whose
    // CUMULATIVE WEIGHT reaches the fraction of total weight, computed
    // on the (group, value) weight histogram. Integer-exact: prices in
    // cents, the fraction test cross-multiplied (cum·4 ≥ total·k), no
    // interpolation. Scale shape: one (group, value) partial agg over
    // the fact table, then a cumulative window over the histogram —
    // |distinct values| rows per group, never the data (q35's
    // documented histogram shape).
    "q49_weighted_median" -> { (s, d) =>
      import s.implicits._
      val li = t(s, d, "lineitem")
        .select($"l_returnflag",
          expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").as("pc"),
          $"l_quantity".cast("long").as("wt"))
      val hist = li.groupBy($"l_returnflag", $"pc").agg(sum($"wt").as("cw"))
      val wCum = Window.partitionBy($"l_returnflag").orderBy($"pc")
      val wAll = Window.partitionBy($"l_returnflag")
      def at(k: Int) = min(when($"cum" * 4 >= $"tw" * k, $"pc"))
      hist
        .withColumn("cum", sum($"cw").over(wCum))
        .withColumn("tw", sum($"cw").over(wAll))
        .groupBy($"l_returnflag")
        .agg(max($"tw").as("total_weight"),
          at(1).as("wp25_cents"), at(2).as("wp50_cents"), at(3).as("wp75_cents"))
        .orderBy($"l_returnflag")
    },

    // join-cardinality estimation calibration (the other half of the
    // CBO loop q50 starts: the textbook uniform-NDV formula
    // |A⋈B| ≈ |A|·|B| div max(ndv_A, ndv_B) scored against the ACTUAL
    // join size for the schema's three FK joins). The query every
    // optimizer-trusting deployment should run once on its own data —
    // FK joins are the formula's best case (error ≈ unmatched-key
    // mass), and a large err_ppm here means the stats are stale or the
    // distribution violates uniformity. Scale shape: stats are one
    // partial agg + one exact-distinct per side; actuals are the plain
    // equi joins counted; everything meets in 1-row relations.
    "q51_join_card_est" -> { (s, d) =>
      import s.implicits._
      def one(name: String, a: DataFrame, ka: String, b: DataFrame, kb: String): DataFrame = {
        val sa = a.agg(count(lit(1)).as("n_a"), countDistinct(col(ka)).as("ndv_a"))
        val sb = b.agg(count(lit(1)).as("n_b"), countDistinct(col(kb)).as("ndv_b"))
        val actual = a.join(b, col(ka) === col(kb)).agg(count(lit(1)).as("actual_rows"))
        sa.crossJoin(sb).crossJoin(actual)
          .withColumn("est_rows", expr("(n_a * n_b) div greatest(ndv_a, ndv_b)"))
          .select(lit(name).as("join_name"), $"n_a", $"n_b", $"ndv_a", $"ndv_b",
            $"est_rows", $"actual_rows",
            expr("((est_rows - actual_rows) * 1000000) div greatest(1L, actual_rows)").as("err_ppm"))
      }
      one("lineitem_orders", t(s, d, "lineitem").select($"l_orderkey"), "l_orderkey",
          t(s, d, "orders").select($"o_orderkey"), "o_orderkey")
        .unionByName(one("lineitem_part", t(s, d, "lineitem").select($"l_partkey"), "l_partkey",
          t(s, d, "part").select($"p_partkey"), "p_partkey"))
        .unionByName(one("orders_customer", t(s, d, "orders").select($"o_custkey"), "o_custkey",
          t(s, d, "customer").select($"c_custkey"), "c_custkey"))
        .orderBy($"join_name")
    },

    // ANALYZE-style column statistics as a query (the equi-depth
    // histogram + NDV a cost-based optimizer keeps per column): 10
    // decile upper bounds over l_quantity, each = the exact value at
    // rank ⌈k·n/10⌉ via the cumulative value histogram, beside the
    // cumulative row count at each bound and the exact distinct count.
    // Scale shape: one (value) partial agg over the fact table, then
    // every window and the 10-way decile sweep run on the |distinct
    // values|-row histogram — the relation ANALYZE itself materializes;
    // the 10-row decile relation joins it as a broadcast.
    "q50_stats_hist" -> { (s, d) =>
      import s.implicits._
      val hist = t(s, d, "lineitem")
        .select($"l_quantity".cast("long").as("v"))
        .groupBy($"v").agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy($"v")
      val wAll = Window.partitionBy(lit(1))
      val c = hist
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(wAll))
        .withColumn("ndv", count(lit(1)).over(wAll))
      val ks = s.range(1, 11).select($"id".as("bucket"))
      c.join(broadcast(ks), lit(true))
        .groupBy($"bucket")
        .agg(min(when($"cum" * 10 >= $"n" * $"bucket", $"v")).as("ub"),
          max($"n").as("n_rows"), max($"ndv").as("ndv"))
        .join(c.select($"v".as("ub"), $"cum".as("cum_rows")), Seq("ub"))
        .select($"bucket", $"ub", $"cum_rows", $"n_rows", $"ndv")
        .orderBy($"bucket")
    },

    // per-group OLS regression (price-vs-quantity slope/intercept/R² per
    // return flag) — the GROUPED closed-form normal equations with no
    // float ACCUMULATION anywhere: x is the integral quantity, y the
    // exact price in cents, the five sums and the cross terms live in
    // DECIMAL(38,0) (HUGEINT on the oracle side); floats appear only in
    // the final per-group statistics, each a single IEEE division of
    // correctly-rounded casts — bit-identical across engines at any
    // scale, where a double regr_slope drifts with accumulation order.
    // Scale shape: one partial-agg shuffle on the 3-value flag key;
    // everything after is |flags| rows.
    "q52_regr" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_returnflag",
          $"l_quantity".cast("long").as("x"),
          // the price is a raw DOUBLE: quantize through DECIMAL(18,2)
          // (identical half-up rounding on both engines) BEFORE the
          // cents scaling — double*100 is inexact and cast-to-long
          // truncates here but rounds there
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("y"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          // every sum accumulates in DECIMAL(38,0): a LongType sum wraps
          // silently under non-ANSI semantics (sxy crosses 2^63 around
          // sf~3000 with y in cents) while the oracle sums to HUGEINT
          sum($"x".cast("decimal(38,0)")).as("sx"),
          sum($"y".cast("decimal(38,0)")).as("sy"),
          sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
          sum($"x".cast("decimal(38,0)") * $"x").as("sxx"),
          sum($"y".cast("decimal(38,0)") * $"y").as("syy"))
        .withColumn("num", expr(
          "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
        .withColumn("den", expr(
          "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("deny", expr(
          "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
        // the cross terms are EXACT (decimal/hugeint); the final three
        // statistics are single IEEE divisions of correctly-rounded
        // casts (BigDecimal.doubleValue here, hugeint→double there —
        // both round-to-nearest, verified identical), so the ppm
        // outputs replay bit-for-bit. Spark's decimal `div`/`pmod` path
        // is NOT usable here: decimal division rounds to a derived
        // scale and loses low digits on 38-digit operands.
        .withColumn("slope", expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"))
        .select($"l_returnflag", $"n",
          floor($"slope" * lit(1000000.0) + lit(0.5)).cast("long").as("slope_ppm"),
          floor((($"sy".cast("double") - $"slope" * $"sx".cast("double"))
            / $"n".cast("double")) + lit(0.5)).cast("long").as("intercept_cents"),
          floor(($"num".cast("double") * $"num".cast("double"))
            / ($"den".cast("double") * $"deny".cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("r2_ppm"))
        .orderBy($"l_returnflag")
    }
  )

  /** Two-round synchronous label propagation over the co-purchase graph
    * (q47's labeling, shared with q48's modularity scoring): every node
    * starts labeled by itself; each round adopts the most frequent
    * neighbor label (tie → smallest), all nodes simultaneously. The
    * argmax is a partial-agg min(struct(-count, label)) — never a
    * window; each round is one edge-list equi-join + the label-count
    * aggregation, with localCheckpoint truncating the growing lineage.
    * Returns (x, lbl).
    *
    * Round shape (r14 optimization, results bit-identical): the round's
    * label relation IS the argmax output — `deg`'s node set equals the
    * distinct endpoints of `sym` by index construction (both derive
    * from the same edge relation), so every node has >= 1 neighbor and
    * the old per-round `lbl LEFT JOIN pick` was an identity
    * (coalesce(new_lbl, lbl) == new_lbl for every row). Dropping it
    * removes one exchange + two sorts + a sort-merge join per round,
    * and the seed labels read the degrees table directly (projecting
    * x twice) instead of paying an up-front checkpoint of a projection
    * the first round only broadcasts anyway. The (u,lbl) count then
    * the per-u argmax both cluster on `sym`'s bucket key u, so a round
    * runs exchange-free: broadcast-join + two bucket-local aggregations
    * (LshIndexSpec-style bucketing payoff; see plans/r14).
    */
  private def lpaLabels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sym = CoPurchaseGraph.symEdges(s, d)
    var lbl = CoPurchaseGraph.degrees(s, d).select($"x", $"x".as("lbl"))
    for (_ <- 1 to 2) {
      lbl = sym.join(lbl.select($"x".as("v"), $"lbl"), Seq("v"))
        .groupBy($"u", $"lbl").agg(count(lit(1)).as("c"))
        .groupBy($"u".as("x"))
        .agg(min(struct((-$"c").as("nc"), $"lbl".as("l"))).as("m"))
        .select($"x", $"m.l".as("lbl"))
        .localCheckpoint(true)
    }
    lbl
  }

  /** `1 + leading-zero-count` of a 32-bit value as a pure integer
    * comparison chain — identical text runs on Spark and DuckDB, no
    * floating log anywhere (q34's HLL rho)
    */
  private def HllRhoCase(w: String): String =
    (1 to 32).map(r => s"WHEN $w >= ${1L << (32 - r)} THEN $r")
      .mkString("CASE ", " ", " ELSE 33 END")

  val oracles: Map[String, String] = Map(
    "q4_semijoin" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q7_antijoin" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q8_outer_join" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q13_groupjoin" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_expr" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))
        |    ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""".stripMargin,

    "q15_view_topk" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = l_suppkey
        |  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_countd" ->
      """SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND p_brand <> 'Brand#23'
        |  AND p_size IN (1,5,10,15,20,25,30,35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_corr_subq" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l, part
        |WHERE p_partkey = l.l_partkey AND p_brand = 'Brand#23'
        |  AND l.l_quantity < 0.5 * (
        |    SELECT SUM(l2.l_quantity) / COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,

    "q18_in_subq" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |  ROUND(o_totalprice, 2) AS o_totalprice,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM customer, orders, big
        |WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_or_pred" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin,

    "q20_nested" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY l_suppkey HAVING SUM(l_quantity) > 50)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_union" ->
      """SELECT src, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'urgent' AS src, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'big' AS src, o_totalprice FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY src ORDER BY src""".stripMargin,

    "q22_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,

    "q23_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "q24_window_rank" ->
      """WITH r AS (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk,
        |    DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS drnk
        |  FROM part)
        |SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice,
        |  CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk
        |FROM r WHERE rnk <= 3
        |ORDER BY p_brand, rnk, p_partkey""".stripMargin,

    "q25_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    - COALESCE(LAG(CAST(o_totalprice AS DECIMAL(18,2)))
        |        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0) AS DOUBLE) AS delta
        |FROM orders""".stripMargin,

    "q26_ntile_median" ->
      """SELECT l_returnflag,
        |  CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS median_price,
        |  CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS p25_price,
        |  CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS p75_price,
        |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q27_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS p0,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS p1,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS p2,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS p3,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS p4
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q28_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts_us,
        |  COALESCE(MAX(c.ts_us), -1) AS prev_click_us,
        |  COALESCE(p.ts_us - MAX(c.ts_us), -1) AS gap_us
        |FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts_us <= p.ts_us
        |GROUP BY p.event_id, p.user_id, p.ts_us""".stripMargin,

    "q29_range_join" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS v_us FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase')
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(p_us - v_us) AS DOUBLE) / COUNT(*) / 1e6 AS avg_gap_sec
        |FROM v JOIN p ON v.user_id = p.user_id AND p_us > v_us AND p_us <= v_us + 3600000000
        |""".stripMargin,
    // q30_approx_distinct: rows-only (approximate)

    "q31_setops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |b AS (SELECT * FROM y95 INTERSECT SELECT * FROM y96),
        |o95 AS (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_both,
        |  (SELECT CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) FROM b) AS sum_both,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM o95) AS n_only_1995,
        |  (SELECT CAST(COALESCE(SUM(o_custkey), 0) AS BIGINT) FROM o95) AS sum_only_1995""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        |  COALESCE(l_linestatus, 'ALL') AS lstatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rflag, lstatus""".stripMargin,

    "q34_hll_sketch" -> {
      val w = "CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 9, 8) AS BIGINT)"
      s"""WITH r AS (
         |  SELECT l_returnflag,
         |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bucket,
         |    ${HllRhoCase(w)} AS rho
         |  FROM lineitem),
         |regs AS (SELECT l_returnflag, bucket, MAX(rho) AS mr FROM r GROUP BY 1, 2),
         |est AS (
         |  SELECT l_returnflag, SUM(power(2.0, -mr)) AS present_sum,
         |    CAST(COUNT(*) AS BIGINT) AS present
         |  FROM regs GROUP BY 1),
         |ex AS (
         |  SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
         |  FROM lineitem GROUP BY 1),
         |j AS (
         |  SELECT e.l_returnflag,
         |    CAST(FLOOR(CAST(0.709 AS DOUBLE) * 64 * 64 /
         |      (present_sum + (64 - present) * CAST(1.0 AS DOUBLE)) + 0.5) AS BIGINT) AS hll_est,
         |    x.exact_distinct
         |  FROM est e JOIN ex x ON x.l_returnflag = e.l_returnflag)
         |SELECT l_returnflag, hll_est, exact_distinct,
         |  CAST((abs(hll_est - exact_distinct) * 1000000) // exact_distinct AS BIGINT) AS err_ppm
         |FROM j ORDER BY l_returnflag""".stripMargin
    },

    "q35_bottomk_quantile" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
        |    md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)) AS h
        |  FROM lineitem),
        |full_r AS (
        |  SELECT l_returnflag, v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v, h) AS vrn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM li),
        |ex AS (
        |  SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
        |    MAX(CASE WHEN vrn = GREATEST(1, CAST(CEIL(CAST(0.5 AS DOUBLE) * n) AS BIGINT)) THEN v END) AS exact_p50,
        |    MAX(CASE WHEN vrn = GREATEST(1, CAST(CEIL(CAST(0.9 AS DOUBLE) * n) AS BIGINT)) THEN v END) AS exact_p90
        |  FROM full_r GROUP BY 1),
        |samp0 AS (
        |  SELECT l_returnflag, v, h,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS srn
        |  FROM li),
        |samp AS (
        |  SELECT l_returnflag, v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v, h) AS svrn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS sn
        |  FROM samp0 WHERE srn <= 128),
        |es AS (
        |  SELECT l_returnflag, CAST(MAX(sn) AS BIGINT) AS k_used,
        |    MAX(CASE WHEN svrn = GREATEST(1, CAST(CEIL(CAST(0.5 AS DOUBLE) * sn) AS BIGINT)) THEN v END) AS est_p50,
        |    MAX(CASE WHEN svrn = GREATEST(1, CAST(CEIL(CAST(0.9 AS DOUBLE) * sn) AS BIGINT)) THEN v END) AS est_p90
        |  FROM samp GROUP BY 1)
        |SELECT ex.l_returnflag, ex.n_rows, es.k_used,
        |  es.est_p50, ex.exact_p50, es.est_p90, ex.exact_p90
        |FROM ex JOIN es ON es.l_returnflag = ex.l_returnflag
        |ORDER BY ex.l_returnflag""".stripMargin,

    "q36_range_window" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |    CAST(o_totalprice AS DECIMAL(28,6)) AS price
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_90d,
        |  CAST(SUM(price) OVER w AS DOUBLE) AS spend_90d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q37_fuzzy_join" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, p_brand,
        |    string_split(p_name, ' ')[1] AS tok1
        |  FROM part),
        |pr AS (
        |  SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS dist
        |  FROM p a JOIN p b
        |    ON a.p_brand = b.p_brand AND a.tok1 = b.tok1
        |    AND a.p_partkey < b.p_partkey
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_near
        |FROM pr GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q38_unpivot" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM a
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q39_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |deg AS (
        |  SELECT x, CAST(COUNT(*) AS BIGINT) AS dg
        |  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        |  GROUP BY x),
        |oe AS (
        |  SELECT CASE WHEN du.dg <= dv.dg THEN e.u ELSE e.v END AS s,
        |         CASE WHEN du.dg <= dv.dg THEN e.v ELSE e.u END AS t
        |  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v),
        |tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM oe e1 JOIN oe e2 ON e2.s = e1.t
        |  JOIN oe e3 ON e3.s = e1.s AND e3.t = e2.t),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, MAX(dg) AS max_degree,
        |    CAST(SUM((dg * (dg - 1)) // 2) AS BIGINT) AS n_wedges
        |  FROM deg)
        |SELECT st.n_nodes, (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |  st.max_degree, st.n_wedges, tri.n_triangles,
        |  CAST(CASE WHEN st.n_wedges = 0 THEN 0
        |    ELSE (tri.n_triangles * 3000000) // st.n_wedges END AS BIGINT)
        |    AS closure_ppm
        |FROM st, tri""".stripMargin,

    "q40_pagerank" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u AS x, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
        |r0 AS (
        |  SELECT x, CAST(1000000000000 // (SELECT n FROM n) AS BIGINT) AS r
        |  FROM deg),
        |s0 AS (
        |  SELECT r0.x AS u, CAST((r0.r * 85) // (100 * deg.dg) AS BIGINT) AS sh
        |  FROM r0 JOIN deg ON deg.x = r0.x),
        |i0 AS (
        |  SELECT sym.v AS x, CAST(SUM(s0.sh) AS BIGINT) AS inc
        |  FROM sym JOIN s0 ON s0.u = sym.u GROUP BY sym.v),
        |r1 AS (
        |  SELECT d.x,
        |    CAST(15000000000000 // (100 * (SELECT n FROM n))
        |      + COALESCE(i0.inc, 0) AS BIGINT) AS r
        |  FROM deg d LEFT JOIN i0 ON i0.x = d.x),
        |s1 AS (
        |  SELECT r1.x AS u, CAST((r1.r * 85) // (100 * deg.dg) AS BIGINT) AS sh
        |  FROM r1 JOIN deg ON deg.x = r1.x),
        |i1 AS (
        |  SELECT sym.v AS x, CAST(SUM(s1.sh) AS BIGINT) AS inc
        |  FROM sym JOIN s1 ON s1.u = sym.u GROUP BY sym.v),
        |r2 AS (
        |  SELECT d.x,
        |    CAST(15000000000000 // (100 * (SELECT n FROM n))
        |      + COALESCE(i1.inc, 0) AS BIGINT) AS r
        |  FROM deg d LEFT JOIN i1 ON i1.x = d.x)
        |SELECT x AS part_id, r AS rank_pico FROM r2
        |ORDER BY rank_pico DESC, part_id LIMIT 20""".stripMargin,

    "q41_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS supp
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p),
        |item AS (SELECT p AS x, CAST(COUNT(*) AS BIGINT) AS n_ord FROM li GROUP BY p),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS nn FROM li)
        |SELECT pr.u AS part_a, pr.v AS part_b, pr.supp AS n_both,
        |  iu.n_ord AS n_a, iv.n_ord AS n_b,
        |  CAST((CAST(pr.supp AS HUGEINT) * n.nn * 1000000)
        |    // (CAST(iu.n_ord AS HUGEINT) * iv.n_ord) AS BIGINT) AS lift_ppm,
        |  CAST((pr.supp * 1000000) // iu.n_ord AS BIGINT) AS conf_ab_ppm,
        |  CAST((pr.supp * 1000000) // iv.n_ord AS BIGINT) AS conf_ba_ppm
        |FROM pairs pr
        |JOIN item iu ON iu.x = pr.u JOIN item iv ON iv.x = pr.v, n
        |WHERE pr.supp >= 5
        |ORDER BY lift_ppm DESC, part_a, part_b LIMIT 20""".stripMargin,

    "q42_reach" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |nodes AS (SELECT DISTINCT u AS x FROM sym),
        |m0 AS (SELECT MIN(x) AS x, CAST(0 AS BIGINT) AS dist FROM nodes),
        |r1 AS (SELECT DISTINCT s.v AS x, CAST(1 AS BIGINT) AS dist
        |       FROM sym s JOIN m0 ON s.u = m0.x),
        |m1 AS (SELECT x, MIN(dist) AS dist FROM
        |       (SELECT * FROM m0 UNION ALL SELECT * FROM r1) GROUP BY x),
        |r2 AS (SELECT DISTINCT s.v AS x, CAST(2 AS BIGINT) AS dist
        |       FROM sym s JOIN (SELECT x FROM m1 WHERE dist = 1) f ON s.u = f.x),
        |m2 AS (SELECT x, MIN(dist) AS dist FROM
        |       (SELECT * FROM m1 UNION ALL SELECT * FROM r2) GROUP BY x),
        |r3 AS (SELECT DISTINCT s.v AS x, CAST(3 AS BIGINT) AS dist
        |       FROM sym s JOIN (SELECT x FROM m2 WHERE dist = 2) f ON s.u = f.x),
        |m3 AS (SELECT x, MIN(dist) AS dist FROM
        |       (SELECT * FROM m2 UNION ALL SELECT * FROM r3) GROUP BY x),
        |prof AS (
        |  SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    MIN(x) AS min_part, MAX(x) AS max_part
        |  FROM m3 GROUP BY dist),
        |unr AS (
        |  SELECT CAST(-1 AS BIGINT) AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    MIN(n.x) AS min_part, MAX(n.x) AS max_part
        |  FROM nodes n LEFT JOIN m3 ON m3.x = n.x WHERE m3.x IS NULL
        |  HAVING COUNT(*) > 0)
        |SELECT * FROM prof UNION ALL SELECT * FROM unr ORDER BY dist""".stripMargin,

    "q43_pct_dist" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(FLOOR(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_ppm,
        |  CAST(FLOOR(cume_dist() OVER w * 1000000.0 + 0.5) AS BIGINT) AS cume_ppm,
        |  first_value(c_custkey) OVER w AS poorest_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q49_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag, CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
        |    CAST(l_quantity AS BIGINT) AS wt
        |  FROM lineitem),
        |hist AS (
        |  SELECT l_returnflag, pc, CAST(SUM(wt) AS BIGINT) AS cw
        |  FROM li GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, pc,
        |    CAST(SUM(cw) OVER (PARTITION BY l_returnflag ORDER BY pc) AS BIGINT) AS cum,
        |    CAST(SUM(cw) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        |  FROM hist)
        |SELECT l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_weight,
        |  CAST(MIN(CASE WHEN cum * 4 >= tw * 1 THEN pc END) AS BIGINT) AS wp25_cents,
        |  CAST(MIN(CASE WHEN cum * 4 >= tw * 2 THEN pc END) AS BIGINT) AS wp50_cents,
        |  CAST(MIN(CASE WHEN cum * 4 >= tw * 3 THEN pc END) AS BIGINT) AS wp75_cents
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q51_join_card_est" ->
      """WITH j AS (
        |  SELECT 'lineitem_orders' AS join_name,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_a,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_b,
        |    (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS ndv_a,
        |    (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS ndv_b,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey) AS actual_rows
        |  UNION ALL
        |  SELECT 'lineitem_part',
        |    (SELECT COUNT(*) FROM lineitem), (SELECT COUNT(*) FROM part),
        |    (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
        |    (SELECT COUNT(DISTINCT p_partkey) FROM part),
        |    (SELECT COUNT(*) FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
        |  UNION ALL
        |  SELECT 'orders_customer',
        |    (SELECT COUNT(*) FROM orders), (SELECT COUNT(*) FROM customer),
        |    (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        |    (SELECT COUNT(DISTINCT c_custkey) FROM customer),
        |    (SELECT COUNT(*) FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey))
        |SELECT join_name, n_a, n_b, ndv_a, ndv_b,
        |  CAST((n_a * n_b) // GREATEST(ndv_a, ndv_b) AS BIGINT) AS est_rows,
        |  actual_rows,
        |  CAST(((n_a * n_b) // GREATEST(ndv_a, ndv_b) - actual_rows) * 1000000
        |    // GREATEST(1, actual_rows) AS BIGINT) AS err_ppm
        |FROM j ORDER BY join_name""".stripMargin,

    "q50_stats_hist" ->
      """WITH hist AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |cm AS (
        |  SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER () AS BIGINT) AS n,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS ndv
        |  FROM hist),
        |dec AS (
        |  SELECT t.k AS bucket,
        |    MIN(CASE WHEN cum * 10 >= n * t.k THEN v END) AS ub,
        |    MAX(n) AS n_rows, MAX(ndv) AS ndv
        |  FROM cm, UNNEST(range(1, 11)) AS t(k) GROUP BY 1)
        |SELECT CAST(d.bucket AS BIGINT) AS bucket, CAST(d.ub AS BIGINT) AS ub,
        |  CAST(cm.cum AS BIGINT) AS cum_rows, CAST(d.n_rows AS BIGINT) AS n_rows,
        |  CAST(d.ndv AS BIGINT) AS ndv
        |FROM dec d JOIN cm ON cm.v = d.ub
        |ORDER BY bucket""".stripMargin,

    // HUGEINT where the Spark side uses DECIMAL(38,0) (the samp_ess
    // rule); floats only in the final single divisions of
    // correctly-rounded casts
    "q52_regr" ->
      """WITH b AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(x * y) AS HUGEINT) AS sxy, CAST(SUM(x * x) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT l_returnflag, n, sx, sy,
        |    n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den,
        |    n * syy - sy * sy AS deny
        |  FROM g),
        |h AS (
        |  SELECT l_returnflag, n, sx, sy, num, den, deny,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope
        |  FROM f)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(slope * 1000000 + 0.5) AS BIGINT) AS slope_ppm,
        |  CAST(FLOOR((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS intercept_cents,
        |  CAST(FLOOR(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |    / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS r2_ppm
        |FROM h ORDER BY l_returnflag""".stripMargin,

    // the three peel rounds unrolled: r{i} = the sub-k removals of round
    // i from the current degree relation d{i-1}, dec{i} their neighbor
    // decrements, d{i} the surviving degrees feeding round i+1
    "q46_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |d0 AS (SELECT u AS x, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
        |kk AS (SELECT CAST((SUM(dg) * 7) // (COUNT(*) * 10) AS BIGINT) AS k FROM d0),
        |r1 AS (SELECT x FROM d0, kk WHERE d0.dg < kk.k),
        |dec1 AS (SELECT s.v AS x, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM sym s JOIN r1 ON s.u = r1.x GROUP BY 1),
        |d1 AS (SELECT d0.x, d0.dg - COALESCE(dec1.c, 0) AS dg
        |       FROM d0 LEFT JOIN dec1 ON dec1.x = d0.x
        |       WHERE d0.x NOT IN (SELECT x FROM r1)),
        |r2 AS (SELECT x FROM d1, kk WHERE d1.dg < kk.k),
        |dec2 AS (SELECT s.v AS x, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM sym s JOIN r2 ON s.u = r2.x GROUP BY 1),
        |d2 AS (SELECT d1.x, d1.dg - COALESCE(dec2.c, 0) AS dg
        |       FROM d1 LEFT JOIN dec2 ON dec2.x = d1.x
        |       WHERE d1.x NOT IN (SELECT x FROM r2)),
        |r3 AS (SELECT x FROM d2, kk WHERE d2.dg < kk.k),
        |dec3 AS (SELECT s.v AS x, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM sym s JOIN r3 ON s.u = r3.x GROUP BY 1),
        |d3 AS (SELECT d2.x, d2.dg - COALESCE(dec3.c, 0) AS dg
        |       FROM d2 LEFT JOIN dec3 ON dec3.x = d2.x
        |       WHERE d2.x NOT IN (SELECT x FROM r3))
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS rnd, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    MIN(x) AS min_part, MAX(x) AS max_part FROM r1 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT), MIN(x), MAX(x)
        |  FROM r2 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT), MIN(x), MAX(x)
        |  FROM r3 HAVING COUNT(*) > 0
        |  UNION ALL
        |  SELECT CAST(99 AS BIGINT), CAST(COUNT(*) AS BIGINT), MIN(x), MAX(x)
        |  FROM d3)
        |ORDER BY rnd""".stripMargin,

    // both synchronous rounds unrolled: c{i} = per-node neighbor-label
    // counts against l{i-1}, p{i} the argmax pick (count desc, label
    // asc), l{i} the updated labeling
    "q47_labelprop" ->
      (s"WITH $LpaCtes\n" +
        """SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
          |  MIN(x) AS min_member, MAX(x) AS max_member
          |FROM l2 GROUP BY lbl
          |ORDER BY n_members DESC, community LIMIT 20""".stripMargin),

    // the LPA labeling CTEs + Newman's Q per community; the squared
    // degree mass runs in HUGEINT (the Spark side's DECIMAL(38,0))
    "q48_modularity" ->
      (s"WITH $LpaCtes,\n" +
        """m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
          |d0 AS (SELECT u AS x, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
          |ds AS (
          |  SELECT l2.lbl AS community, CAST(SUM(d0.dg) AS BIGINT) AS degree_sum,
          |    CAST(COUNT(*) AS BIGINT) AS n_members
          |  FROM d0 JOIN l2 ON l2.x = d0.x GROUP BY 1),
          |ie AS (
          |  SELECT la.lbl AS community, CAST(COUNT(*) AS BIGINT) AS intra_edges
          |  FROM e JOIN l2 la ON la.x = e.u
          |  JOIN l2 lb ON lb.x = e.v AND lb.lbl = la.lbl
          |  GROUP BY 1)
          |SELECT ds.community, ds.n_members,
          |  COALESCE(ie.intra_edges, 0) AS intra_edges, ds.degree_sum,
          |  CAST((COALESCE(ie.intra_edges, 0) * 1000000) // m.m AS BIGINT) AS intra_ppm,
          |  CAST((CAST(ds.degree_sum AS HUGEINT) * ds.degree_sum * 1000000) //
          |    (CAST(m.m AS HUGEINT) * m.m * 4) AS BIGINT) AS deg_ppm,
          |  CAST((COALESCE(ie.intra_edges, 0) * 1000000) // m.m
          |    - CAST((CAST(ds.degree_sum AS HUGEINT) * ds.degree_sum * 1000000) //
          |        (CAST(m.m AS HUGEINT) * m.m * 4) AS BIGINT) AS BIGINT) AS contribution_ppm
          |FROM ds LEFT JOIN ie ON ie.community = ds.community CROSS JOIN m
          |ORDER BY ds.n_members DESC, ds.community LIMIT 20""".stripMargin)
  )

  /** the q47/q48 shared 2-round LPA unroll (no WITH prefix): li/e/sym
    * rebuild the co-purchase graph from the fact table, l0 the identity
    * labeling, c{i}/p{i}/l{i} each synchronous round
    */
  // a def (like HllRhoCase): the oracles val above initializes first
  private def LpaCtes: String =
    """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
      |l0 AS (SELECT DISTINCT u AS x, u AS lbl FROM sym),
      |c1 AS (SELECT s.u AS x, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
      |       FROM sym s JOIN l0 l ON l.x = s.v GROUP BY 1, 2),
      |p1 AS (SELECT x, lbl FROM (
      |         SELECT x, lbl, ROW_NUMBER() OVER (PARTITION BY x
      |           ORDER BY c DESC, lbl) AS rn FROM c1) WHERE rn = 1),
      |l1 AS (SELECT l0.x, COALESCE(p1.lbl, l0.x) AS lbl
      |       FROM l0 LEFT JOIN p1 ON p1.x = l0.x),
      |c2 AS (SELECT s.u AS x, l.lbl, CAST(COUNT(*) AS BIGINT) AS c
      |       FROM sym s JOIN l1 l ON l.x = s.v GROUP BY 1, 2),
      |p2 AS (SELECT x, lbl FROM (
      |         SELECT x, lbl, ROW_NUMBER() OVER (PARTITION BY x
      |           ORDER BY c DESC, lbl) AS rn FROM c2) WHERE rn = 1),
      |l2 AS (SELECT l1.x, COALESCE(p2.lbl, l1.x) AS lbl
      |       FROM l1 LEFT JOIN p2 ON p2.x = l1.x)""".stripMargin
}
