package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** Relational / analytic core over the TPC-H-ish testdata (SURVEY §2.B).
  *
  * Oracle-parity rules (see SURVEY §5): money arithmetic is done in
  * DECIMAL (exact, order-independent across any partitioning, so results
  * are identical on 32 local threads or 1000 executors) and only the
  * final aggregate is cast to double; every computed column carries the
  * same alias in the DataFrame code and the DuckDB SQL; top-k queries
  * are tie-broken by a unique key.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** exact money representation: decimal(18,2) */
  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** exact product accumulator */
  private def d6(c: Column): Column = c.cast(DecimalType(28, 6))
  private def d8(c: Column): Column = c.cast(DecimalType(30, 8))

  val queries: Map[String, Q] = Map(
    "q1_agg" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(d2($"l_quantity")).cast("double").as("sum_qty"),
          sum(d2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount")))).cast("double").as("sum_disc_price"),
          sum(d8(d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount"))) * (lit(1) + d2($"l_tax")))).cast("double").as("sum_charge"),
          (sum(d2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(d2($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
          (sum(d2($"l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    "q2_filter_project" -> { (s, d) =>
      import s.implicits._
      t(s, d, "part")
        .filter($"p_size".between(10, 20) && $"p_brand" === "Brand#12")
        .select($"p_partkey", $"p_name", $"p_size", $"p_retailprice")
        .orderBy($"p_partkey")
    },

    "q3_join_agg" -> { (s, d) =>
      import s.implicits._
      val cust = t(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = t(s, d, "orders").filter($"o_orderdate" < to_timestamp(lit("1998-03-15 00:00:00")))
      val li = t(s, d, "lineitem").filter($"l_shipdate" > to_timestamp(lit("1998-03-15 00:00:00")))
      // no broadcast hint on customer: it scales with sf, so a forced
      // broadcast OOMs executors at 100×; AQE demotes/promotes correctly
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum(d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount")))).cast("double").as("revenue"))
        .select($"l_orderkey", $"revenue", $"o_orderdate".cast("date").cast("string").as("o_orderdate"), $"o_orderpriority")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    "q6_scan_agg" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")) &&
          $"l_discount".between(0.03, 0.07) && $"l_quantity" < 25)
        .agg(sum(d6(d2($"l_extendedprice") * d2($"l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    "q9_distinct" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_returnflag", $"l_linestatus", $"l_suppkey")
        .distinct()
        .orderBy($"l_returnflag", $"l_linestatus", $"l_suppkey")
    },

    "q10_topk" -> { (s, d) =>
      import s.implicits._
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem").filter($"l_returnflag" === "R")
      // customer scales with sf — leave join selection to AQE (see q3)
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal")
        .agg(sum(d6(d2($"l_extendedprice") * (lit(1) - d2($"l_discount")))).cast("double").as("revenue"))
        .select($"c_custkey", $"c_name", round($"c_acctbal", 2).as("c_acctbal"), $"revenue")
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    },

    "q11_having" -> { (s, d) =>
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_partkey")
        .agg(sum(d2($"l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .filter($"sum_qty" > 800.0)
        .orderBy($"l_partkey")
    },

    "q12_case_agg" -> { (s, d) =>
      import s.implicits._
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"l_shipdate" < to_timestamp(lit("1998-01-01 00:00:00")))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
        .orderBy($"l_returnflag")
    }
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(30,8))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT p_partkey, p_name, p_size, p_retailprice
        |FROM part
        |WHERE p_size BETWEEN 10 AND 20 AND p_brand = 'Brand#12'
        |ORDER BY p_partkey""".stripMargin,

    "q3_join_agg" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q6_scan_agg" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 25""".stripMargin,

    "q9_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus, l_suppkey""".stripMargin,

    "q10_topk" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q11_having" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 800.0
        |ORDER BY l_partkey""".stripMargin,

    "q12_case_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
