package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** SURVEY §2.B continued: the canonical hard relational shapes missing
  * from [[Relational]]/[[Relational2]] — TPC-H Q2's correlated min-cost
  * scalar subquery (q53_mincost), Q21's double EXISTS / NOT-EXISTS on the
  * same fact table (q54_waiting), Q22's scalar-average + dormancy
  * composition (q55_dormant), Q8's market-share ratio-of-conditional-sums
  * (q56_share), Q9's multi-dim profit rollup (q57_profit) and Q18's
  * group-HAVING-join-back large-order report (q58_big_orders) — adapted
  * to this schema (no partsupp table, no commit/receipt dates): supply
  * cost derives from lineitem as the minimum exact DECIMAL(18,2) extended
  * price a supplier ever quoted for a part, unit cost from p_retailprice,
  * and "late" is l_shipdate > o_orderdate + 60 days.
  *
  * Same oracle-parity rules as [[Relational]]: exact DECIMAL money,
  * identical aliases, unique-key total orderings (no LIMIT ties).
  */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def d6(c: Column): Column = c.cast(DecimalType(28, 6))

  val queries: Map[String, Q] = Map(
    // TPC-H Q2 shape: for each STANDARD part of size <= 15, the EUROPE
    // supplier(s) quoting the minimum cost for it. The correlated scalar
    // subquery (cost = MIN(cost) over the part's EUROPE suppliers) is
    // expressed as a window-min over the aggregated (part, supplier)
    // relation — the decorrelation Catalyst would have to discover is
    // written directly, and the window runs on the ALREADY-AGGREGATED
    // ps relation (|parts|x|eu-suppliers| upper bound), never the fact
    // table. Scale shape: one partial-agg shuffle on (partkey, suppkey)
    // over lineitem, one |ps|-sized shuffle on partkey for the window;
    // region/nation are broadcast (fixed cardinality), supplier/part are
    // sf-scaling dims left to AQE (the q3/q5 rule — a forced broadcast
    // OOMs at 100x).
    "q53_mincost" -> { (s, d) =>
      import s.implicits._
      val ps = t(s, d, "lineitem")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(d2($"l_extendedprice")).as("cost"))
      val eu = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region").filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val wp = Window.partitionBy($"l_partkey")
      val psEu = ps.join(eu, $"l_suppkey" === $"s_suppkey")
        .withColumn("min_cost", min($"cost").over(wp))
        .filter($"cost" === $"min_cost")
      psEu
        .join(t(s, d, "part").filter($"p_size" <= 15 && $"p_type" === "STANDARD"),
          $"l_partkey" === $"p_partkey")
        .select(round($"s_acctbal", 2).as("s_acctbal"), $"s_name", $"n_name",
          $"p_partkey", $"p_brand", $"cost".cast("double").as("cost"))
        .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
    },

    // TPC-H Q22 shape ("global sales opportunity"): customers from a
    // nation subset whose balance exceeds the subset's positive-balance
    // average AND who have gone dormant (no order in the stream's last
    // four months) — the scalar-aggregate subquery + correlated
    // NOT-EXISTS + group-report composition, adapted to this schema
    // (nationkey plays Q22's phone country code; the no-orders-at-all
    // predicate becomes a recency window because every synthetic
    // customer has orders). The average test is EXACT: bal·cnt >
    // sum_bal in DECIMAL, no float average to diverge per engine. Scale
    // shape: the 1-row stats relation broadcasts into the customer
    // scan, the dormancy NOT EXISTS is a left-anti join on custkey with
    // the date filter pushed below it, one |nations|-key partial agg.
    "q55_dormant" -> { (s, d) =>
      import s.implicits._
      val c = t(s, d, "customer")
        .filter($"c_nationkey".isin(1L, 3L, 5L, 7L, 9L))
        .select($"c_custkey", $"c_nationkey", d2($"c_acctbal").as("bal"))
      val stats = c.agg(
        sum(when($"bal" > 0, $"bal")).as("sum_bal"),
        count(when($"bal" > 0, lit(1))).as("cnt"))
      val recent = t(s, d, "orders")
        .filter($"o_orderdate" >= to_timestamp(lit("2001-04-01 00:00:00")))
        .select($"o_custkey")
      c.crossJoin(broadcast(stats))
        .filter($"bal" * $"cnt" > $"sum_bal")
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum($"bal").cast("double").as("totacctbal"))
        .orderBy($"c_nationkey")
    },

    // TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    // finished multi-supplier order. The EXISTS becomes a left-semi join
    // (same order, different supplier) and the NOT EXISTS a left-anti
    // join against the late set itself — both with an equi key
    // (orderkey) plus the non-equi suppkey<>suppkey residual, so they
    // shuffle once on orderkey and AQE picks broadcast when a side is
    // small. The late set is computed ONCE (lineitem join orders with
    // the status + lateness filters pushed below the join) and reused as
    // both the probe side and the anti-join build side. Scale shape: two
    // orderkey-key shuffles over the filtered fact table + one s_name
    // partial agg; no window, no cartesian.
    "q54_waiting" -> { (s, d) =>
      import s.implicits._
      val lateF = t(s, d, "lineitem")
        .join(t(s, d, "orders").filter($"o_orderstatus" === "F"),
          $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .select($"l_orderkey", $"l_suppkey")
      val anyOther = t(s, d, "lineitem")
        .select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
      val lateOther = lateF.select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"))
      val only = lateF
        .join(anyOther, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2", "left_semi")
        .join(lateOther, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3", "left_anti")
      only
        .join(t(s, d, "supplier"), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
    },

    // TPC-H Q8 shape ("national market share"): of the PROMO-part revenue
    // sold to AMERICA-region customers, what fraction was supplied by
    // ASIA-region suppliers, by order year. The ratio-of-conditional-sums
    // is computed over EXACT DECIMAL(28,6) volumes (sum first, divide the
    // two exact sums as doubles at the very end — the q1_agg rule), so the
    // only float op is one final division of identical operands on both
    // engines. Scale shape: the fact table shuffles once per equi-join key
    // (partkey, orderkey, suppkey); region/nation are broadcast (fixed
    // 5/25 rows); part/customer/supplier are sf-scaling dims left to AQE;
    // the customer membership test is a left-semi join (never widens the
    // fact rows); final agg is |years| rows.
    "q56_share" -> { (s, d) =>
      import s.implicits._
      val vol = d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount")))
      val amerCust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region").filter($"r_name" === "AMERICA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey")
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", ($"r_name" === "ASIA").as("is_asia"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter($"p_type" === "PROMO").select($"p_partkey"),
          $"l_partkey" === $"p_partkey")
        .join(t(s, d, "orders").select($"o_orderkey", $"o_custkey",
          year($"o_orderdate").cast("long").as("o_year")),
          $"l_orderkey" === $"o_orderkey")
        .join(amerCust, $"o_custkey" === $"c_custkey", "left_semi")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .groupBy($"o_year")
        .agg(sum(when($"is_asia", vol)).as("asia_d"), sum(vol).as("all_d"))
        .select($"o_year",
          coalesce($"asia_d", lit(0).cast(DecimalType(28, 6))).cast("double").as("asia_volume"),
          $"all_d".cast("double").as("total_volume"),
          (coalesce($"asia_d", lit(0).cast(DecimalType(28, 6))).cast("double") /
            $"all_d".cast("double")).as("mkt_share"))
        .orderBy($"o_year")
    },

    // TPC-H Q9 shape ("product type profit"): per supplier nation per
    // order year, the exact-DECIMAL profit on widget parts — revenue
    // minus unit-cost×quantity with p_retailprice standing in for the
    // missing ps_supplycost. Every term is summed in DECIMAL(28,6)
    // (never a float accumulation), cast to double only at output.
    // Scale shape: lineitem shuffles on partkey/suppkey/orderkey;
    // nation broadcast; part/supplier/orders AQE-sized; final agg is
    // |nations|×|years| rows.
    "q57_profit" -> { (s, d) =>
      import s.implicits._
      val amount =
        d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount"))) -
          d6(d2($"p_retailprice") * d2($"l_quantity"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter($"p_name".contains("widget"))
          .select($"p_partkey", $"p_retailprice"), $"l_partkey" === $"p_partkey")
        .join(t(s, d, "supplier").select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(t(s, d, "orders").select($"o_orderkey",
          year($"o_orderdate").cast("long").as("o_year")),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name", $"o_year")
        .agg(sum(amount).cast("double").as("profit"))
        .orderBy($"n_name", $"o_year".desc)
    },

    // TPC-H Q18 shape ("large volume customers"): orders whose total
    // quantity clears a HAVING threshold, joined back to orders and
    // customer for the report. The aggregate runs on the fact table
    // FIRST (one orderkey partial-agg shuffle, map-side combined), so
    // the join-back only carries the ~1% of orders that survive; the
    // threshold sum is exact DECIMAL(18,2). Unique-key total ordering
    // (orderkey breaks totalprice ties) instead of Q18's LIMIT 100 —
    // the no-LIMIT-ties house rule.
    "q58_big_orders" -> { (s, d) =>
      import s.implicits._
      val big = t(s, d, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum(d2($"l_quantity")).as("sum_qty"))
        .filter($"sum_qty" > 250)
      big
        .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey",
          $"o_orderdate".cast("date").cast("string").as("o_orderdate"),
          round($"o_totalprice", 2).as("o_totalprice"),
          $"sum_qty".cast("double").as("sum_qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
    },

    // TPC-H Q7 shape ("volume shipping"): bilateral trade between two
    // trading blocs — revenue where the SUPPLIER sits in one bloc and
    // the CUSTOMER in the other (both directions kept, the classic
    // two-tuple membership + direction predicate; blocs = odd/even
    // nationkey < 10 so the fixture has flows in both directions at
    // every sf). Exact DECIMAL(28,6) volume sums. Scale shape: the
    // bloc filter semi-reduces supplier and customer BEFORE the fact
    // joins (two tiny broadcast nation joins); lineitem shuffles once
    // per equi key; final agg is 2×|years| rows.
    "q59_shipping" -> { (s, d) =>
      import s.implicits._
      val vol = d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount")))
      def bloc(col: Column): Column =
        when(col % 2 === 1, "BLOC_ODD").otherwise("BLOC_EVEN")
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter($"n_nationkey" < 10)),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", bloc($"n_nationkey").as("supp_bloc"))
      val cust = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation").filter($"n_nationkey" < 10)
          .select($"n_nationkey".as("cn_key"))),
          $"c_nationkey" === $"cn_key")
        .select($"c_custkey", bloc($"cn_key").as("cust_bloc"))
      t(s, d, "lineitem")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .join(t(s, d, "orders").select($"o_orderkey", $"o_custkey",
          year($"o_orderdate").cast("long").as("l_year")),
          $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .filter($"supp_bloc" =!= $"cust_bloc")
        .groupBy($"supp_bloc", $"cust_bloc", $"l_year")
        .agg(sum(vol).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"supp_bloc", $"cust_bloc", $"l_year")
    },

    // TPC-H Q11 shape ("important stock"): parts whose total lineitem
    // value clears a GLOBAL scalar threshold — the HAVING-against-a-
    // scalar-subquery shape. The fraction test is scale-INVARIANT
    // (value·n_parts > 3/2·total ⇔ value > 1.5× the mean per-part
    // value) and EXACT: both sides are DECIMAL(38,6)·integer products,
    // no float fraction. Scale shape: one partkey partial-agg shuffle
    // over the fact table; the 1-row global total (computed from the
    // per-part aggregate, not a second fact scan) broadcasts into the
    // HAVING filter; output ordered by the surviving value.
    "q60_top_stock" -> { (s, d) =>
      import s.implicits._
      val perPart = t(s, d, "lineitem")
        .groupBy($"l_partkey")
        .agg(sum(d2($"l_extendedprice")).as("value"))
      val tot = perPart.agg(
        sum($"value").cast(DecimalType(38, 2)).as("total"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(tot))
        // the fraction test in exact integer CENTS on both engines: a
        // DECIMAL(38,2)×BIGINT product would exceed DuckDB's 38-digit
        // width and silently fall back to DOUBLE there, so both sides
        // compare (value·100)·n·2 > (total·100)·3 as DECIMAL(38,0)/
        // HUGEINT integers instead
        .filter(($"value" * 100).cast(DecimalType(38, 0)) * $"n_parts" * 2 >
          ($"total" * 100).cast(DecimalType(38, 0)) * 3)
        .select($"l_partkey", $"value".cast("double").as("value"))
        .orderBy($"value".desc, $"l_partkey")
    },

    // 2-D skyline (Pareto frontier) per brand: parts no other same-brand
    // part beats on BOTH axes (cheaper-or-equal price AND
    // larger-or-equal size, strict on at least one). The classic
    // operator needs "max size over every cheaper part" — a GLOBAL
    // order — so the scalable shape splits it two-level: $100 price
    // buckets give a |brands|x|buckets| aggregate whose running max
    // (prior buckets only) is a tiny window, and within each bucket a
    // (brand, bucket)-PARTITIONED value-range window supplies the
    // strictly-cheaper / cheaper-or-equal in-bucket maxima — no
    // single-partition window, no self-join, dominance is two integer
    // comparisons per row. Price is exact cents (the double→cents
    // floor), so both engines compare identical integers.
    "q61_skyline" -> { (s, d) =>
      import s.implicits._
      val p = t(s, d, "part").select($"p_brand", $"p_partkey",
        expr("CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)").as("price_cents"),
        $"p_size".cast("long").as("p_size"))
        .withColumn("bucket", expr("price_cents div 10000"))
      val wb = Window.partitionBy($"p_brand").orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pref = p.groupBy($"p_brand", $"bucket")
        .agg(max($"p_size").as("bmax"))
        .withColumn("pref_max", max($"bmax").over(wb))
        .select($"p_brand", $"bucket", $"pref_max")
      val wIn = Window.partitionBy($"p_brand", $"bucket").orderBy($"price_cents")
      val lo = lit(Long.MinValue)
      p.join(pref, Seq("p_brand", "bucket"))
        .withColumn("m_lt", greatest(
          coalesce(max($"p_size").over(wIn.rangeBetween(Window.unboundedPreceding, -1)), lo),
          coalesce($"pref_max", lo)))
        .withColumn("m_le", greatest(
          max($"p_size").over(wIn.rangeBetween(Window.unboundedPreceding, 0)),
          coalesce($"pref_max", lo)))
        .filter($"m_lt" < $"p_size" && !($"m_le" > $"p_size"))
        .select($"p_brand", $"p_partkey", $"price_cents", $"p_size")
        .orderBy($"p_brand", $"price_cents", $"p_partkey")
    },

    // supply-chain concentration: per brand, the Herfindahl-Hirschman
    // index of supplier revenue shares (the market-concentration number
    // an antitrust or supply-risk review starts from) plus the top
    // supplier's share — EXACT integer end to end: revenue in cents,
    // Σr² and R² in DECIMAL(38,0)/HUGEINT (r² wraps a long past ~$10⁸
    // per supplier-brand cell), one ppm floor division. Scale shape:
    // one (brand, supplier) partial-agg shuffle over the fact table
    // (part is an AQE-sized dim join), then a |brands|-row agg.
    "q62_hhi" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val r = t(s, d, "lineitem")
        .join(t(s, d, "part").select($"p_partkey", $"p_brand"),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"l_suppkey")
        .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
          .cast(dec)).as("r"))
      r.groupBy($"p_brand")
        .agg(count(lit(1)).as("n_suppliers"), sum($"r").as("rev"),
          sum($"r" * $"r").as("sumsq"), max($"r").as("mx"))
        .select($"p_brand", $"n_suppliers",
          $"rev".cast("long").as("rev_cents"),
          expr("(sumsq * 1000000) div (rev * rev)").as("hhi_ppm"),
          expr("(mx * 1000000) div rev").as("top_supp_ppm"))
        .orderBy($"p_brand")
    },

    // market share over time: per (month, brand), the brand's CUMULATIVE
    // revenue share of everything sold so far — the trend line behind
    // q62_hhi's point-in-time concentration. Exact integer: cents,
    // DECIMAL(38,0)/HUGEINT cumulative sums (cum·10⁶ passes 2⁶³), ppm
    // floor. Scale shape: one (brand, month) partial-agg shuffle over
    // the fact table collapses everything to a \|brands\|×\|months\|
    // rollup; the brand running sums are brand-PARTITIONED windows, and
    // the only unpartitioned window is the month-total prefix sum over
    // the \|months\|-row calendar relation (the coverage-curve rule:
    // single-partition is fine when the relation is calendar-bounded).
    "q63_running_share" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val g = t(s, d, "lineitem")
        .join(t(s, d, "part").select($"p_partkey", $"p_brand"),
          $"l_partkey" === $"p_partkey")
        .join(t(s, d, "orders").select($"o_orderkey",
          (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long").as("mon")),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"p_brand", $"mon")
        .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
          .cast(dec)).as("rev"))
      val wb = Window.partitionBy($"p_brand").orderBy($"mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wm = Window.orderBy($"mon")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val monthTot = g.groupBy($"mon").agg(sum($"rev").as("mrev"))
        .withColumn("cum_all", sum($"mrev").over(wm))
        .select($"mon", $"cum_all")
      g.withColumn("cum_rev", sum($"rev").over(wb))
        .join(broadcast(monthTot), Seq("mon"))
        .select($"mon", $"p_brand",
          $"rev".cast("long").as("rev_cents"),
          $"cum_rev".cast("long").as("cum_rev_cents"),
          expr("(cum_rev * 1000000) div cum_all").as("cum_share_ppm"))
        .orderBy($"mon", $"p_brand")
    },

    // repeat-purchase latency: week-bucketed histogram of the gaps
    // between a customer's consecutive orders (the reorder-cycle shape
    // retention pricing starts from). The lag runs customer-PARTITIONED
    // with a unique (date, orderkey) tie-break; everything after is a
    // \|buckets\|-row aggregate with a broadcast 1-row total; ppm
    // DECIMAL-guarded. Same-day double orders land in bucket 0 exactly.
    "q64_reorder_gap" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val gaps = t(s, d, "orders")
        .select($"o_custkey", $"o_orderdate", $"o_orderkey")
        .withColumn("prev", lag($"o_orderdate", 1).over(w))
        .filter($"prev".isNotNull)
        .select(datediff($"o_orderdate", $"prev").cast("long").as("gap_days"))
        .select(expr("gap_days div 7").as("gap_weeks"))
      val tot = gaps.agg(count(lit(1)).as("t"))
      gaps.groupBy($"gap_weeks").agg(count(lit(1)).as("n_gaps"))
        .crossJoin(broadcast(tot))
        .select($"gap_weeks", $"n_gaps",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_gaps) div CAST(t AS DECIMAL(38,0))")
            .as("share_ppm"))
        .orderBy($"gap_weeks")
    },

    // gaps-and-islands: longest consecutive-MONTH ordering streak per
    // customer (the classic islands shape — month_index − row_number is
    // constant within an island), rolled into a count-of-customers
    // histogram. Retention teams read the right tail; the q64 gap
    // histogram reads the spaces between. Scale shape: one distinct on
    // (cust, month) — a partial-agg shuffle — then customer-partitioned
    // windows only; the rollup output is bounded by the calendar (max
    // streak ≤ months in the data), never by |customers|.
    "q65_streaks" -> { (s, d) =>
      import s.implicits._
      val months = t(s, d, "orders")
        .select($"o_custkey",
          expr("year(o_orderdate) * 12 + month(o_orderdate)").cast("long").as("mon"))
        .distinct()
      val w = Window.partitionBy($"o_custkey").orderBy($"mon")
      months.withColumn("grp", $"mon" - row_number().over(w))
        .groupBy($"o_custkey", $"grp").agg(count(lit(1)).as("len"))
        .groupBy($"o_custkey").agg(max($"len").as("max_streak"))
        .groupBy($"max_streak").agg(count(lit(1)).as("n_customers"))
        .orderBy($"max_streak")
    },

    // month-over-month revenue growth per nation — the trend table a
    // revenue dashboard draws: exact cents revenue per (nation, month),
    // growth vs the previous OBSERVED month as integer ppm. The ppm
    // division runs on positive revenues only ((rev·10⁶) div prev, then
    // the −10⁶ offset applied after), so the truncate-vs-floor
    // negative-division divergence can't arise by construction. Scale
    // shape: fact-side shuffle on custkey into the customer relation,
    // broadcast nation, one (nation, month) partial agg (calendar ×
    // |nations| bounded), then nation-partitioned lag windows over that
    // bounded relation.
    "q66_growth" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(18, 2)
      val rev = t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name",
          expr("year(o_orderdate) * 12 + month(o_orderdate)").cast("long").as("mon"))
        .agg((sum($"o_totalprice".cast(dec)) * 100).cast("long").as("rev_cents"))
      val w = Window.partitionBy($"n_name").orderBy($"mon")
      rev.withColumn("prev_cents", lag($"rev_cents", 1).over(w))
        .filter($"prev_cents".isNotNull)
        .select($"n_name", $"mon", $"rev_cents",
          (expr("(CAST(rev_cents AS DECIMAL(38,0)) * 1000000) div CAST(prev_cents AS DECIMAL(38,0))")
            - 1000000L).as("growth_ppm"))
        .orderBy($"n_name", $"mon")
    },

    // year-over-year spend-band migration matrix — the cohort-value
    // transition table (who climbs, who churns down) aggregated over
    // every consecutive-year pair. Bands are EXACT log₂ of annual cents
    // via the binary-string length (length(bin(x)) − 1 — no libm, so no
    // 1-ulp boundary divergence at exact powers of two, the same trap
    // class the integer-doubling scale rules avoid). Scale shape: one
    // (cust, year) partial agg, a self-join co-partitioned on the same
    // keys (shifted by one year), and a ≤bands²-row rollup — the matrix
    // is ~64² whatever the corpus size.
    "q67_migration" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(18, 2)
      val yearly = t(s, d, "orders")
        .groupBy($"o_custkey", expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"))
        .agg((sum($"o_totalprice".cast(dec)) * 100).cast("long").as("cents"))
        .withColumn("band", expr("CAST(length(bin(cents)) - 1 AS BIGINT)"))
      val from = yearly.select($"o_custkey", $"yr", $"band".as("band_from"))
      val to = yearly.select($"o_custkey", ($"yr" - 1).as("yr"), $"band".as("band_to"))
      from.join(to, Seq("o_custkey", "yr"))
        .groupBy($"band_from", $"band_to").agg(count(lit(1)).as("n_customers"))
        .orderBy($"band_from", $"band_to")
    },

    // per-nation customer revenue concentration (the whale audit behind
    // account planning — samp_pareto's shape on the sales ledger): the
    // top revenue DECILE of each nation's customers and its exact ppm
    // share of the nation's revenue, integer cents end to end. Scale
    // shape: one custkey partial agg over orders, the customer→nation
    // join co-partitioned on custkey with broadcast nation, and the
    // decile window PARTITIONED BY NATION (per-stratum ranking — no
    // global sort, parallelism = |nations|), then a |nations|-row agg.
    "q68_nation_pareto" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(18, 2)
      val rev = t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg((sum($"o_totalprice".cast(dec)) * 100).cast("long").as("rev_cents"))
      val cn = t(s, d, "customer").select($"c_custkey", $"c_nationkey")
        .join(broadcast(t(s, d, "nation").select($"n_nationkey".as("c_nationkey"), $"n_name")),
          Seq("c_nationkey"))
      val w = Window.partitionBy($"n_name").orderBy($"rev_cents".desc, $"o_custkey")
      rev.join(cn, rev("o_custkey") === cn("c_custkey"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_cust"),
          sum($"rev_cents").as("rev_cents"),
          sum(when($"decile" === 1L, $"rev_cents").otherwise(0L)).as("top_decile_cents"))
        .withColumn("share_ppm", expr("(top_decile_cents * 1000000) div rev_cents"))
        .select($"n_name", $"n_cust", $"rev_cents", $"top_decile_cents", $"share_ppm")
        .orderBy($"n_name")
    },

    // order-size distribution (the basket-shape audit behind batch-size
    // and join-strategy planning): exact count-of-counts of lineitems
    // per order + ppm share — two chained partial aggs (order-keyed,
    // then the ≤7-value TPC-H size space); the share window runs over
    // that bounded histogram, never the fact table.
    "q69_order_sizes" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n_lines"))
        .groupBy($"n_lines").agg(count(lit(1)).as("n_orders"))
        .withColumn("t", sum($"n_orders").over(Window.partitionBy(lit(1))))
        .select($"n_lines", $"n_orders",
          expr("(n_orders * 1000000) div t").as("share_ppm"))
        .orderBy($"n_lines")
    },

    // customer lifespan distribution (the engagement-duration ledger
    // behind churn-model features): calendar months between first and
    // last order per customer, rolled to an exact count-of-counts
    // histogram with ppm share. Calendar-bounded span space (a one-year
    // ledger has ≤ 12 values at any corpus size), so the share window
    // never touches the fact table — one custkey partial agg, one
    // span-keyed rollup.
    "q70_cust_lifespan" -> { (s, d) =>
      import s.implicits._
      t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg((max(expr("year(o_orderdate) * 12 + month(o_orderdate)"))
          - min(expr("year(o_orderdate) * 12 + month(o_orderdate)"))).cast("long").as("span_months"))
        .groupBy($"span_months").agg(count(lit(1)).as("n_customers"))
        .withColumn("t", sum($"n_customers").over(Window.partitionBy(lit(1))))
        .select($"span_months", $"n_customers",
          expr("(n_customers * 1000000) div t").as("share_ppm"))
        .orderBy($"span_months")
    },

    // discount-tier effect report (the pricing-lever audit): per
    // discount percent, line count, gross revenue and the discount
    // given — all EXACT integers (gross in cents, discount in
    // cent-percent units: p_cents·pct, no decimal-product rounding to
    // reconcile across engines), DECIMAL(38,0) sums so the cent totals
    // survive any corpus size. One partial agg onto the ≤11-tier space;
    // the share window runs over that bounded relation.
    "q71_discount_effect" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      t(s, d, "lineitem")
        .withColumn("pct", expr("CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)"))
        .withColumn("p_cents", (d2($"l_extendedprice") * 100).cast("long"))
        .groupBy($"pct")
        .agg(count(lit(1)).as("n_lines"),
          sum($"p_cents".cast(dec38)).as("gross_d"),
          sum(($"p_cents" * $"pct").cast(dec38)).as("disc_d"))
        .withColumn("t", sum($"gross_d").over(Window.partitionBy(lit(1))))
        .select($"pct", $"n_lines",
          $"gross_d".cast("long").as("gross_cents"),
          $"disc_d".cast("long").as("disc_cp"),
          expr("CAST((gross_d * 1000000) div t AS BIGINT)").as("gross_share_ppm"))
        .orderBy($"pct")
    },

    // monthly active/new/returning customer ledger — the growth
    // accounting every subscription business keeps (ev_churn's weekly
    // user form, on the orders ledger at calendar-month grain): per
    // month, active customers, first-ever-month customers, returning.
    // Scale shape: one distinct on (cust, month), a custkey-keyed min
    // agg, a co-keyed join, then a calendar-bounded rollup.
    "q72_monthly_active" -> { (s, d) =>
      import s.implicits._
      val act = t(s, d, "orders")
        .select($"o_custkey",
          expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)").as("mon"))
        .distinct()
      val first = act.groupBy($"o_custkey").agg(min($"mon").as("fmon"))
      act.join(first, Seq("o_custkey"))
        .groupBy($"mon")
        .agg(count(lit(1)).as("n_active"),
          sum(when($"mon" === $"fmon", 1L).otherwise(0L)).as("n_new"))
        .withColumn("n_returning", $"n_active" - $"n_new")
        .orderBy($"mon")
    },

    // order-priority mix by month — the SLA-load composition curve (a
    // rising URGENT share changes fulfillment staffing before volume
    // does): per (month, priority), orders + exact ppm share of the
    // month. One partial agg onto the calendar×5-priority grid; the
    // share window runs over that bounded relation.
    "q73_priority_mix" -> { (s, d) =>
      import s.implicits._
      t(s, d, "orders")
        .groupBy(expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)").as("mon"),
          $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .withColumn("mon_n", sum($"n").over(Window.partitionBy($"mon")))
        .select($"mon", $"o_orderpriority", $"n",
          expr("(n * 1000000) div mon_n").as("share_ppm"))
        .orderBy($"mon", $"o_orderpriority")
    },

    // returns rate by ship month — the product-quality/SLA trend curve
    // (a rising R-flag share is the earliest signal a supplier batch went
    // bad; q1_agg's global flag rollup hides WHEN): per calendar month,
    // lines, returned lines, exact ppm rate and the returned value in
    // exact cents (DECIMAL(38,0) sum — a long overflows at cluster
    // scale). One partial agg onto the calendar-bounded month grid.
    "q74_returns_by_month" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .select(expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)").as("mon"),
          $"l_returnflag", (d2($"l_extendedprice") * 100).cast("long").as("p_cents"))
        .groupBy($"mon")
        .agg(count(lit(1)).as("n_lines"),
          sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("n_returned"),
          sum(when($"l_returnflag" === "R", $"p_cents").otherwise(0L)
            .cast(DecimalType(38, 0))).as("ret_d"))
        .select($"mon", $"n_lines", $"n_returned",
          expr("(n_returned * 1000000) div n_lines").as("ret_ppm"),
          $"ret_d".cast("long").as("ret_cents"))
        .orderBy($"mon")
    },

    // revenue share by part brand — the assortment-concentration report
    // (which brands carry the book; pairs with q68's nation pareto): per
    // brand, lines and discounted revenue in exact cent-percent integer
    // units (price_cents × (100 − discount_pct), the q71 rule — no
    // decimal-product rounding to reconcile cross-engine), share in ppm.
    // Scale shape: one fact-side narrow projection joined to part on
    // partkey (sf-scaling dim, left to AQE per the q3/q5 rule), partial
    // agg onto the ~25-brand space, share window over that bounded
    // relation only.
    "q75_brand_share" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      val li = t(s, d, "lineitem")
        .select($"l_partkey", (d2($"l_extendedprice") * 100).cast("long").as("p_cents"),
          expr("CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)").as("pct"))
      li.join(t(s, d, "part").select($"p_partkey", $"p_brand"),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_lines"),
          sum(($"p_cents" * (lit(100L) - $"pct")).cast(dec38)).as("rev_d"))
        .withColumn("t", sum($"rev_d").over(Window.partitionBy(lit(1))))
        .select($"p_brand", $"n_lines", $"rev_d".cast("long").as("rev_cp"),
          expr("CAST((rev_d * 1000000) div t AS BIGINT)").as("share_ppm"))
        .orderBy($"p_brand")
    },

    // late-shipment rate by order month — the fulfillment-SLA trend
    // behind q54's supplier blame report (q54 answers WHO is late; this
    // answers WHEN lateness drifted): per order month, lines, lines
    // shipped past the 60-day promise (the file-header late rule), exact
    // ppm. Scale shape: the canonical co-keyed fact-fact join — lineitem
    // and orders both shuffle once on orderkey (or read co-bucketed on a
    // warehouse) with only (key, date) columns in flight, then one
    // partial agg onto the calendar grid.
    "q76_late_ratio" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem").select($"l_orderkey", $"l_shipdate")
        .join(t(s, d, "orders").select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy(expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)").as("mon"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L)).as("n_late"))
        .withColumn("late_ppm", expr("(n_late * 1000000) div n_lines"))
        .orderBy($"mon")
    },

    // one-time-customer share per market segment — the acquisition-
    // quality ledger (a segment acquiring buyers who never return is
    // paying for churn; q72 tracks WHEN cohorts land, this scores how
    // STICKY each segment's buyers are, never-ordered customers
    // included). Scale shape: one per-custkey partial agg over orders,
    // a co-keyed left join onto the narrow customer projection, rollup
    // onto the 5-segment space.
    "q77_one_timers" -> { (s, d) =>
      import s.implicits._
      val oc = t(s, d, "orders").groupBy($"o_custkey").agg(count(lit(1)).as("k"))
      t(s, d, "customer").select($"c_custkey", $"c_mktsegment")
        .join(oc, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          sum(when($"k" === 1L, 1L).otherwise(0L)).as("n_one_time"),
          sum(when($"k".isNull, 1L).otherwise(0L)).as("n_never"))
        .withColumn("one_time_ppm", expr("(n_one_time * 1000000) div n_customers"))
        .orderBy($"c_mktsegment")
    },

    // month-of-year seasonal revenue index — the demand-planning
    // normalizer (is December actually bigger, or did one year skew
    // it?): per calendar month-of-year, order revenue summed over every
    // year, the per-year mean, and the exact ppm index vs the global
    // monthly mean via cross-multiplication (s·M·10⁶) div (n·G) — no
    // float division, DECIMAL(38,0) throughout (a cent total at cluster
    // scale overflows int64 mid-product). Headroom: the widest
    // intermediate is s·M·10⁶ ≤ rev_cents · |months| · 10⁶; hitting the
    // 10³⁸ cap with |months| ≤ 1200 (a century) needs ≥ 10²⁹ cents of
    // revenue — fifteen orders of magnitude beyond world GDP — and
    // under this session's ANSI mode an overflow THROWS, it can never
    // silently diverge from the oracle's HUGEINT (Round12LawsSpec pins
    // the bound on the fixture). Scale shape: one partial agg onto the
    // (year × 12) grid, a 12-row rollup, windows only over that bounded
    // relation.
    "q78_seasonal_index" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      t(s, d, "orders")
        .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
          expr("CAST(month(o_orderdate) AS BIGINT)").as("moy"))
        .agg(sum((d2($"o_totalprice") * 100).cast("long").cast(dec38)).as("rev_d"))
        .groupBy($"moy")
        .agg(count(lit(1)).as("n_months"), sum($"rev_d").as("s_d"))
        .withColumn("g", sum($"s_d").over(Window.partitionBy(lit(1))))
        .withColumn("m", sum($"n_months").over(Window.partitionBy(lit(1))))
        .select($"moy", $"n_months",
          $"s_d".cast("long").as("rev_cents"),
          expr("CAST(s_d div n_months AS BIGINT)").as("mean_rev_cents"),
          expr("CAST((s_d * m * 1000000) div (n_months * g) AS BIGINT)").as("index_ppm"))
        .orderBy($"moy")
    },

    // cross-nation trade-flow matrix — TPC-H Q7's shape generalized to
    // the full matrix (revenue flowing from each supplier nation to
    // each customer nation; the diagonal is q5's local-supplier view,
    // the off-diagonal is the import dependency a tariff scenario
    // reprices): discounted revenue in exact cent-percent units (q71
    // rule) + ppm share of world trade. Scale shape: lineitem shuffles
    // once on orderkey against orders (co-keyed fact-fact), once on
    // partkey-free supplier/customer keys; nation is broadcast (fixed
    // 25 rows); the matrix agg lands on the ≤625-cell space and the
    // share window runs over that bounded relation only.
    "q79_trade_matrix" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      val li = t(s, d, "lineitem")
        .select($"l_orderkey", $"l_suppkey",
          (d2($"l_extendedprice") * 100).cast("long").as("p_cents"),
          expr("CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)").as("pct"))
      val co = t(s, d, "orders").select($"o_orderkey", $"o_custkey")
        .join(t(s, d, "customer").select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
          $"c_nationkey" === $"n_nationkey")
        .select($"o_orderkey", $"n_name".as("cust_nation"))
      val sup = t(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
        .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name".as("supp_nation"))
      li.join(co, $"l_orderkey" === $"o_orderkey")
        .join(sup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"supp_nation", $"cust_nation")
        .agg(count(lit(1)).as("n_lines"),
          sum(($"p_cents" * (lit(100L) - $"pct")).cast(dec38)).as("rev_d"))
        .withColumn("t", sum($"rev_d").over(Window.partitionBy(lit(1))))
        .select($"supp_nation", $"cust_nation", $"n_lines",
          $"rev_d".cast("long").as("rev_cp"),
          expr("CAST((rev_d * 1000000) div t AS BIGINT)").as("share_ppm"))
        .orderBy($"supp_nation", $"cust_nation")
    },

    // customer lifetime-spend distribution in power-of-2 bands — the
    // CLV histogram behind q70's duration view and ev_ltv's event-side
    // totals (a marketing budget is allocated off this curve, and the
    // band shape is what says whether "average customer value" is a
    // lie): band = exact ⌊log₂ cents⌋, customers + spend mass + ppm
    // share per band. Scale shape: one per-custkey partial agg,
    // ≤64-band rollup, share window over the bounded band relation.
    "q80_spend_bands" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum((d2($"o_totalprice") * 100).cast("long").cast(dec38)).as("sp"))
        .select($"sp".cast("long").as("spend_cents"))
        .withColumn("band", expr("CAST(length(bin(spend_cents)) - 1 AS BIGINT)"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_customers"),
          sum($"spend_cents".cast(dec38)).as("sd"),
          min($"spend_cents").as("min_cents"), max($"spend_cents").as("max_cents"))
        .withColumn("t", sum($"n_customers").over(Window.partitionBy(lit(1))))
        .select($"band", $"n_customers",
          expr("(n_customers * 1000000) div t").as("cust_share_ppm"),
          $"sd".cast("long").as("total_cents"), $"min_cents", $"max_cents")
        .orderBy($"band")
    },

    // does a deeper discount actually move volume? — integer-OLS slope
    // of line quantity on discount percent in exact milli units (the
    // rd_traffic_trend normal-equation form: cross-multiplied sums, a
    // subtract-pmod floor, zero float division), with the per-tier
    // detail left to q71. Moments accumulate in DECIMAL(38,0) — the
    // n·Σxy cross-product overflows int64 at cluster row counts. One
    // 1-row aggregate over a narrow two-column projection.
    "q81_qty_discount" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      t(s, d, "lineitem")
        .select(expr("CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)").as("x"),
          expr("CAST(l_quantity AS BIGINT)").as("y"))
        .agg(count(lit(1)).cast(dec38).as("n"),
          sum($"x".cast(dec38)).as("sx"), sum($"y".cast(dec38)).as("sy"),
          sum(($"x" * $"y").cast(dec38)).as("sxy"),
          sum(($"x" * $"x").cast(dec38)).as("sxx"))
        .withColumn("num", ($"n" * $"sxy" - $"sx" * $"sy") * lit(1000L))
        .withColumn("den", $"n" * $"sxx" - $"sx" * $"sx")
        .select($"n".cast("long").as("n_lines"),
          when($"den" === 0, 0L)
            .otherwise(expr("CAST((num - pmod(num, den)) div den AS BIGINT)"))
            .as("slope_milli"))
    },

    // nation-level ARPU ledger — revenue per registered customer by
    // nation (the market-prioritization table: q79 shows where revenue
    // FLOWS, this normalizes it by the customer base, never-ordered
    // customers included so a market's penetration gap shows): per
    // nation, customers, buyers, exact cents and floored ARPU cents.
    // Scale shape: per-custkey revenue partial agg, co-keyed left join
    // onto the narrow customer projection, broadcast nation, 25-row
    // rollup.
    // per-nation top-2 customers by balance, DECLARED as a correlated
    // LATERAL subquery (the "top-k per group" ask in the shape a SQL
    // user writes it, q82 — q24_window_rank is the same semantics
    // declared as a window; keeping both pins that Catalyst's
    // decorrelation meets the hand-written plan): Spark rewrites the
    // lateral LIMIT into WindowGroupLimit — a map-side partial top-2
    // per nation BEFORE the exchange, then the rank filter — and
    // broadcasts the 25-row nation side; at 100 TB the shuffle carries
    // at most 2·|nations| candidate rows per task, never the customer
    // table. DuckDB runs the identical LATERAL text.
    "q82_lateral_topk" -> { (s, d) =>
      s.sql(
        s"""SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
           |FROM parquet.`$d/nation.parquet` n,
           |LATERAL (
           |  SELECT c_custkey, c_name, c_acctbal
           |  FROM parquet.`$d/customer.parquet` c
           |  WHERE c.c_nationkey = n.n_nationkey
           |  ORDER BY c_acctbal DESC, c_custkey
           |  LIMIT 2) t
           |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
    },

    "q83_nation_arpu" -> { (s, d) =>
      import s.implicits._
      val dec38 = DecimalType(38, 0)
      val rev = t(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum((d2($"o_totalprice") * 100).cast("long").cast(dec38)).as("rd"))
      t(s, d, "customer").select($"c_custkey", $"c_nationkey")
        .join(rev, $"c_custkey" === $"o_custkey", "left")
        .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_name")),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(when($"rd".isNotNull, 1L).otherwise(0L)).as("n_buyers"),
          sum(coalesce($"rd", lit(0L).cast(dec38))).as("srd"))
        .select($"n_name", $"n_customers", $"n_buyers",
          $"srd".cast("long").as("rev_cents"),
          expr("CAST(srd div n_customers AS BIGINT)").as("arpu_cents"))
        .orderBy($"n_name")
    }
  )

  val oracles: Map[String, String] = Map(
    "q53_mincost" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
        |       p_partkey, p_brand, CAST(cost AS DOUBLE) AS cost
        |FROM ps
        |JOIN eu ON ps.l_suppkey = eu.s_suppkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_size <= 15 AND p_type = 'STANDARD'
        |  AND cost = (SELECT MIN(ps2.cost)
        |              FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
        |              WHERE ps2.l_partkey = ps.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin,

    "q55_dormant" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)),
        |s AS (
        |  SELECT SUM(CASE WHEN bal > 0 THEN bal END) AS sum_bal,
        |         COUNT(CASE WHEN bal > 0 THEN 1 END) AS cnt FROM c)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(bal) AS DOUBLE) AS totacctbal
        |FROM c, s
        |WHERE bal * cnt > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-04-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q54_waiting" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1
        |                  FROM lineitem l3
        |                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    "q56_share" ->
      """WITH amer AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'),
        |supp AS (
        |  SELECT s_suppkey, r_name = 'ASIA' AS is_asia FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |v AS (
        |  SELECT year(o_orderdate) AS o_year, is_asia,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)) AS vol
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supp ON l_suppkey = s_suppkey
        |  WHERE o_custkey IN (SELECT c_custkey FROM amer))
        |SELECT o_year,
        |  CAST(COALESCE(SUM(CASE WHEN is_asia THEN vol END), 0) AS DOUBLE) AS asia_volume,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume,
        |  CAST(COALESCE(SUM(CASE WHEN is_asia THEN vol END), 0) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q57_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(SUM(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))
        |    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,6))
        |  ) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,

    "q58_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |  ROUND(o_totalprice, 2) AS o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

    "q59_shipping" ->
      """WITH supp AS (
        |  SELECT s_suppkey,
        |    CASE WHEN n_nationkey % 2 = 1 THEN 'BLOC_ODD' ELSE 'BLOC_EVEN' END AS supp_bloc
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_nationkey < 10),
        |cust AS (
        |  SELECT c_custkey,
        |    CASE WHEN n_nationkey % 2 = 1 THEN 'BLOC_ODD' ELSE 'BLOC_EVEN' END AS cust_bloc
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_nationkey < 10)
        |SELECT supp_bloc, cust_bloc, year(o_orderdate) AS l_year,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN supp ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN cust ON o_custkey = c_custkey
        |WHERE supp_bloc <> cust_bloc
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q60_top_stock" ->
      """WITH pp AS (
        |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(value) AS total, COUNT(*) AS n_parts FROM pp)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM pp, tot
        |WHERE CAST(value * 100 AS HUGEINT) * n_parts * 2
        |    > CAST(total * 100 AS HUGEINT) * 3
        |ORDER BY value DESC, l_partkey""".stripMargin,

    "q61_skyline" ->
      """WITH p AS (
        |  SELECT p_brand, p_partkey,
        |    CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS p_size
        |  FROM part)
        |SELECT o.p_brand, o.p_partkey, o.price_cents, o.p_size
        |FROM p o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p q
        |  WHERE q.p_brand = o.p_brand
        |    AND q.price_cents <= o.price_cents AND q.p_size >= o.p_size
        |    AND (q.price_cents < o.price_cents OR q.p_size > o.p_size))
        |ORDER BY o.p_brand, o.price_cents, o.p_partkey""".stripMargin,

    "q62_hhi" ->
      """WITH r AS (
        |  SELECT p_brand, l_suppkey,
        |    SUM(CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |    SUM(r) AS rev, SUM(r * r) AS sumsq, MAX(r) AS mx
        |  FROM r GROUP BY 1)
        |SELECT p_brand, n_suppliers, CAST(rev AS BIGINT) AS rev_cents,
        |  CAST((sumsq * 1000000) // (rev * rev) AS BIGINT) AS hhi_ppm,
        |  CAST((mx * 1000000) // rev AS BIGINT) AS top_supp_ppm
        |FROM g ORDER BY p_brand""".stripMargin,

    "q63_running_share" ->
      """WITH g AS (
        |  SELECT p_brand,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS mon,
        |    SUM(CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |mt AS (
        |  SELECT mon, SUM(mrev) OVER (ORDER BY mon
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
        |  FROM (SELECT mon, SUM(rev) AS mrev FROM g GROUP BY 1)),
        |cb AS (
        |  SELECT p_brand, mon, rev,
        |    SUM(rev) OVER (PARTITION BY p_brand ORDER BY mon
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM g)
        |SELECT cb.mon, cb.p_brand, CAST(cb.rev AS BIGINT) AS rev_cents,
        |  CAST(cb.cum_rev AS BIGINT) AS cum_rev_cents,
        |  CAST((cb.cum_rev * 1000000) // mt.cum_all AS BIGINT) AS cum_share_ppm
        |FROM cb JOIN mt ON mt.mon = cb.mon
        |ORDER BY cb.mon, cb.p_brand""".stripMargin,

    "q64_reorder_gap" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    LAG(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |g AS (
        |  SELECT CAST(datediff('day', prev, o_orderdate) AS BIGINT) // 7 AS gap_weeks
        |  FROM o WHERE prev IS NOT NULL),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM g)
        |SELECT gap_weeks, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST((1000000 * COUNT(*)) // MAX(tot.t) AS BIGINT) AS share_ppm
        |FROM g, tot GROUP BY gap_weeks ORDER BY gap_weeks""".stripMargin,

    "q65_streaks" ->
      """WITH mm AS (
        |  SELECT DISTINCT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mon
        |  FROM orders),
        |i AS (
        |  SELECT o_custkey,
        |    mon - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mon) AS grp
        |  FROM mm),
        |l AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS len FROM i GROUP BY o_custkey, grp),
        |mx AS (SELECT o_custkey, MAX(len) AS max_streak FROM l GROUP BY 1)
        |SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM mx GROUP BY 1 ORDER BY max_streak""".stripMargin,

    "q66_growth" ->
      """WITH rev AS (
        |  SELECT n_name,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mon,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |lg AS (
        |  SELECT n_name, mon, rev_cents,
        |    LAG(rev_cents) OVER (PARTITION BY n_name ORDER BY mon) AS prev_cents
        |  FROM rev)
        |SELECT n_name, mon, rev_cents,
        |  CAST((CAST(rev_cents AS HUGEINT) * 1000000) // prev_cents - 1000000 AS BIGINT) AS growth_ppm
        |FROM lg WHERE prev_cents IS NOT NULL
        |ORDER BY n_name, mon""".stripMargin,

    "q67_migration" ->
      """WITH y AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |b AS (SELECT o_custkey, yr, CAST(length(bin(cents)) - 1 AS BIGINT) AS band FROM y)
        |SELECT f.band AS band_from, t.band AS band_to,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM b f JOIN b t ON t.o_custkey = f.o_custkey AND t.yr = f.yr + 1
        |GROUP BY 1, 2 ORDER BY band_from, band_to""".stripMargin,

    "q68_nation_pareto" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT n_name, rev.o_custkey, rev_cents,
        |    NTILE(10) OVER (PARTITION BY n_name ORDER BY rev_cents DESC, rev.o_custkey) AS decile
        |  FROM rev
        |  JOIN customer ON c_custkey = rev.o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
        |  CAST(SUM(CASE WHEN decile = 1 THEN rev_cents ELSE 0 END) AS BIGINT) AS top_decile_cents,
        |  CAST((SUM(CASE WHEN decile = 1 THEN rev_cents ELSE 0 END) * 1000000)
        |    // SUM(rev_cents) AS BIGINT) AS share_ppm
        |FROM j GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q69_order_sizes" ->
      """WITH per AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders FROM per GROUP BY 1)
        |SELECT n_lines, n_orders,
        |  CAST((n_orders * 1000000) // SUM(n_orders) OVER () AS BIGINT) AS share_ppm
        |FROM h ORDER BY n_lines""".stripMargin,

    "q70_cust_lifespan" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(MAX(year(o_orderdate) * 12 + month(o_orderdate))
        |      - MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT) AS span_months
        |  FROM orders GROUP BY 1),
        |h AS (SELECT span_months, CAST(COUNT(*) AS BIGINT) AS n_customers FROM per GROUP BY 1)
        |SELECT span_months, n_customers,
        |  CAST((n_customers * 1000000) // SUM(n_customers) OVER () AS BIGINT) AS share_ppm
        |FROM h ORDER BY span_months""".stripMargin,

    "q71_discount_effect" ->
      """WITH l AS (
        |  SELECT CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS pct,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_cents
        |  FROM lineitem),
        |g AS (
        |  SELECT pct, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    SUM(CAST(p_cents AS HUGEINT)) AS gross_d,
        |    SUM(CAST(p_cents AS HUGEINT) * pct) AS disc_d
        |  FROM l GROUP BY 1)
        |SELECT pct, n_lines,
        |  CAST(gross_d AS BIGINT) AS gross_cents,
        |  CAST(disc_d AS BIGINT) AS disc_cp,
        |  CAST((gross_d * 1000000) // SUM(gross_d) OVER () AS BIGINT) AS gross_share_ppm
        |FROM g ORDER BY pct""".stripMargin,

    "q72_monthly_active" ->
      """WITH act AS (
        |  SELECT DISTINCT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mon
        |  FROM orders),
        |f AS (SELECT o_custkey, MIN(mon) AS fmon FROM act GROUP BY 1)
        |SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN mon = fmon THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(COUNT(*) - SUM(CASE WHEN mon = fmon THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
        |FROM act JOIN f USING (o_custkey)
        |GROUP BY mon ORDER BY mon""".stripMargin,

    "q73_priority_mix" ->
      """WITH c AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mon,
        |    o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT mon, o_orderpriority, n,
        |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY mon) AS BIGINT) AS share_ppm
        |FROM c ORDER BY mon, o_orderpriority""".stripMargin,

    "q74_returns_by_month" ->
      """WITH l AS (
        |  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS mon,
        |    l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_cents
        |  FROM lineitem)
        |SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |  CAST((SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS ret_ppm,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(p_cents AS HUGEINT) ELSE 0 END) AS BIGINT) AS ret_cents
        |FROM l GROUP BY mon ORDER BY mon""".stripMargin,

    "q75_brand_share" ->
      """WITH l AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_cents,
        |    CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS pct
        |  FROM lineitem),
        |g AS (
        |  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    SUM(CAST(p_cents AS HUGEINT) * (100 - pct)) AS rev_d
        |  FROM l JOIN part ON l_partkey = p_partkey GROUP BY 1)
        |SELECT p_brand, n_lines, CAST(rev_d AS BIGINT) AS rev_cp,
        |  CAST((rev_d * 1000000) // SUM(rev_d) OVER () AS BIGINT) AS share_ppm
        |FROM g ORDER BY p_brand""".stripMargin,

    "q76_late_ratio" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mon,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
        |SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(late) AS BIGINT) AS n_late,
        |  CAST((SUM(late) * 1000000) // COUNT(*) AS BIGINT) AS late_ppm
        |FROM j GROUP BY mon ORDER BY mon""".stripMargin,

    "q77_one_timers" ->
      """WITH oc AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k FROM orders GROUP BY 1)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_one_time,
        |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_never,
        |  CAST((SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS one_time_ppm
        |FROM customer LEFT JOIN oc ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q78_seasonal_index" ->
      """WITH ym AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(month(o_orderdate) AS BIGINT) AS moy,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS rev_d
        |  FROM orders GROUP BY 1, 2),
        |g AS (
        |  SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_months, SUM(rev_d) AS s_d
        |  FROM ym GROUP BY 1)
        |SELECT moy, n_months, CAST(s_d AS BIGINT) AS rev_cents,
        |  CAST(s_d // n_months AS BIGINT) AS mean_rev_cents,
        |  CAST((s_d * SUM(n_months) OVER () * 1000000)
        |    // (n_months * SUM(s_d) OVER ()) AS BIGINT) AS index_ppm
        |FROM g ORDER BY moy""".stripMargin,

    "q79_trade_matrix" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p_cents,
        |    CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS pct
        |  FROM lineitem),
        |g AS (
        |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |    CAST(COUNT(*) AS BIGINT) AS n_lines,
        |    SUM(CAST(p_cents AS HUGEINT) * (100 - pct)) AS rev_d
        |  FROM l
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation cn ON cn.n_nationkey = c_nationkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation sn ON sn.n_nationkey = s_nationkey
        |  GROUP BY 1, 2)
        |SELECT supp_nation, cust_nation, n_lines, CAST(rev_d AS BIGINT) AS rev_cp,
        |  CAST((rev_d * 1000000) // SUM(rev_d) OVER () AS BIGINT) AS share_ppm
        |FROM g ORDER BY supp_nation, cust_nation""".stripMargin,

    "q80_spend_bands" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS BIGINT) AS spend_cents
        |  FROM orders GROUP BY 1),
        |g AS (
        |  SELECT CAST(length(bin(spend_cents)) - 1 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(CAST(spend_cents AS HUGEINT)) AS BIGINT) AS total_cents,
        |    CAST(MIN(spend_cents) AS BIGINT) AS min_cents,
        |    CAST(MAX(spend_cents) AS BIGINT) AS max_cents
        |  FROM per GROUP BY 1)
        |SELECT band, n_customers,
        |  CAST((n_customers * 1000000) // SUM(n_customers) OVER () AS BIGINT) AS cust_share_ppm,
        |  total_cents, min_cents, max_cents
        |FROM g ORDER BY band""".stripMargin,

    "q81_qty_discount" ->
      """WITH l AS (
        |  SELECT CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS HUGEINT) AS x,
        |    CAST(l_quantity AS HUGEINT) AS y
        |  FROM lineitem),
        |g AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM l),
        |e AS (
        |  SELECT n, (n * sxy - sx * sy) * 1000 AS num, n * sxx - sx * sx AS den FROM g)
        |SELECT CAST(n AS BIGINT) AS n_lines,
        |  CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST((num - ((num % den + den) % den)) // den AS BIGINT) END AS slope_milli
        |FROM e""".stripMargin,

    "q82_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_name, c_acctbal
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin,

    "q83_nation_arpu" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS rd
        |  FROM orders GROUP BY 1)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(CASE WHEN rd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_buyers,
        |  CAST(SUM(COALESCE(rd, 0)) AS BIGINT) AS rev_cents,
        |  CAST(SUM(COALESCE(rd, 0)) // COUNT(*) AS BIGINT) AS arpu_cents
        |FROM customer
        |LEFT JOIN rev ON o_custkey = c_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
