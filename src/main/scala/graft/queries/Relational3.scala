package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** SURVEY §2.B continued: the last two canonical hard relational shapes —
  * TPC-H Q2's correlated min-cost scalar subquery (q53_mincost) and
  * TPC-H Q21's double EXISTS / NOT-EXISTS on the same fact table
  * (q54_waiting) — adapted to this schema (no partsupp table, no
  * commit/receipt dates): the supply cost is derived from lineitem as the
  * minimum exact DECIMAL(18,2) extended price a supplier has ever quoted
  * for a part, and "late" is l_shipdate > o_orderdate + 60 days.
  *
  * Same oracle-parity rules as [[Relational]]: exact DECIMAL money,
  * identical aliases, unique-key total orderings (no LIMIT ties).
  */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

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
        |ORDER BY numwait DESC, s_name""".stripMargin
  )
}
