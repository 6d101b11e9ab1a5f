package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** SURVEY §2.B — recommendation family over the materialized co-purchase
  * graph (the collaborative-filtering classic: item-item similarity +
  * item-based top-N recommendations). Both queries read the
  * [[CoPurchaseGraph]] index, never a fact table at similarity time —
  * the same pay-once contract as q39/q40/q41/q42.
  *
  * All similarity math is integer-exact (ppm with floored div, DECIMAL
  * where int64 could overflow at cluster scale), so the DuckDB oracles
  * replay every score and tie-break bit-for-bit.
  */
object RecQueries {
  type Q = (SparkSession, String) => DataFrame

  /** minimum co-occurrence support for a similarity edge — below this the
    * jaccard is noise (two orders sharing a popular pair by chance)
    */
  private val MinSupp = 3L

  /** neighbors kept per item (the bounded model an item-based recommender
    * serves from)
    */
  private val NbrK = 3

  /** recommendations emitted per customer */
  private val RecK = 5

  /** Per-item top-[[NbrK]] similar items by basket jaccard.
    *
    * Scale shape: the edge relation is index-read (u-bucketed); both
    * support joins key on single items (item-sized sides, AQE decides
    * broadcast); the symmetrization is a narrow union; the top-k is a
    * per-item window over that item's qualifying neighbors (bounded by
    * the item's co-purchase degree, never corpus-sized). No fact-table
    * access at all.
    *
    * cos²-ppm = supp²·10⁶ div (n_a·n_b) — squared cosine keeps the score
    * integer-exact (no sqrt); DECIMAL(38,0) intermediates because
    * supp²·10⁶ passes int64 once supports reach ~3e6 at cluster scale
    * (the q41 lift overflow argument).
    */
  private[graft] def itemNeighbors(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = CoPurchaseGraph.edges(s, d).filter($"supp" >= MinSupp)
    val bi = e.select($"u".as("a"), $"v".as("b"), $"supp")
      .unionByName(e.select($"v".as("a"), $"u".as("b"), $"supp"))
    val w = Window.partitionBy($"a").orderBy($"jaccard_ppm".desc, $"b")
    bi
      .join(CoPurchaseGraph.items(s, d).toDF("a", "n_a"), Seq("a"))
      .join(CoPurchaseGraph.items(s, d).toDF("b", "n_b"), Seq("b"))
      .withColumn("jaccard_ppm",
        expr("(supp * 1000000) div (n_a + n_b - supp)"))
      .withColumn("cos2_ppm",
        expr("CAST((CAST(supp AS DECIMAL(38,0)) * supp * 1000000) div " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= NbrK)
  }

  val queries: Map[String, Q] = Map(
    // item-item similarity model: per item, the top-3 co-purchase
    // neighbors by integer-exact basket jaccard (+ squared-cosine ppm) —
    // the model table an item-based recommender serves from. Support
    // floor keeps chance pairs out; ties break on the neighbor id.
    "q44_item_sim" -> { (s, d) =>
      import s.implicits._
      itemNeighbors(s, d)
        .select($"a".as("item"), $"rnk", $"b".as("neighbor"),
          $"supp".as("n_both"), $"jaccard_ppm", $"cos2_ppm")
        .orderBy($"item", $"rnk")
    },

    // item-based top-5 recommendations for EVERY customer in one batch —
    // the serving query: score(cust, cand) = Σ jaccard over the
    // customer's owned items whose neighbor model includes cand,
    // excluding items already owned. Scale shape: ownership is ONE
    // distinct-projection shuffle of the fact join (cust, part); the
    // neighbor model is the bounded ≤3·|items| relation (hash join on
    // the item key); scoring is a partial-agg shuffle on (cust, cand);
    // the owned-exclusion is a left-anti join co-keyed with ownership;
    // the final top-5 is a per-customer window over ≤3·|owned|
    // candidates. Nothing corpus-quadratic, nothing global.
    "q45_recs" -> { (s, d) =>
      import s.implicits._
      val owned = t(s, d, "orders").select($"o_orderkey", $"o_custkey")
        .join(t(s, d, "lineitem").select($"l_orderkey", $"l_partkey"),
          $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("cust"), $"l_partkey".as("a")).distinct()
      val nbr = itemNeighbors(s, d).select($"a", $"b", $"jaccard_ppm")
      val scored = owned.join(nbr, Seq("a"))
        .groupBy($"cust", $"b")
        .agg(sum($"jaccard_ppm").as("score"), count(lit(1)).as("n_via"))
        .join(owned.toDF("cust", "b"), Seq("cust", "b"), "left_anti")
      val w = Window.partitionBy($"cust")
        .orderBy($"score".desc, $"n_via".desc, $"b")
      scored
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= RecK)
        .select($"cust", $"rnk", $"b".as("part_id"), $"score", $"n_via")
        .orderBy($"cust", $"rnk")
    }
  )

  /** the q44 model replayed as SQL (shared CTE prefix of both oracles) */
  private val NbrCte =
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |pairs AS (
       |  SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS supp
       |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
       |  GROUP BY 1, 2),
       |item AS (SELECT p AS x, CAST(COUNT(*) AS BIGINT) AS n_ord FROM li GROUP BY 1),
       |bi AS (
       |  SELECT u AS a, v AS b, supp FROM pairs WHERE supp >= $MinSupp
       |  UNION ALL
       |  SELECT v AS a, u AS b, supp FROM pairs WHERE supp >= $MinSupp),
       |sc AS (
       |  SELECT bi.a, bi.b, bi.supp, ia.n_ord AS n_a, ib.n_ord AS n_b,
       |    CAST((bi.supp * 1000000) // (ia.n_ord + ib.n_ord - bi.supp) AS BIGINT) AS jaccard_ppm,
       |    CAST((CAST(bi.supp AS HUGEINT) * bi.supp * 1000000)
       |      // (CAST(ia.n_ord AS HUGEINT) * ib.n_ord) AS BIGINT) AS cos2_ppm
       |  FROM bi JOIN item ia ON ia.x = bi.a JOIN item ib ON ib.x = bi.b),
       |nbr AS (
       |  SELECT *, CAST(row_number() OVER
       |    (PARTITION BY a ORDER BY jaccard_ppm DESC, b) AS BIGINT) AS rnk
       |  FROM sc)
       |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q44_item_sim" ->
      (NbrCte +
        s"""SELECT a AS item, rnk, b AS neighbor, supp AS n_both,
           |  jaccard_ppm, cos2_ppm
           |FROM nbr WHERE rnk <= $NbrK ORDER BY item, rnk""".stripMargin),

    "q45_recs" ->
      (NbrCte +
        s""", owned AS (
           |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS a
           |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
           |cand AS (
           |  SELECT ow.cust, nbr.b,
           |    CAST(SUM(nbr.jaccard_ppm) AS BIGINT) AS score,
           |    CAST(COUNT(*) AS BIGINT) AS n_via
           |  FROM owned ow JOIN nbr ON nbr.a = ow.a AND nbr.rnk <= $NbrK
           |  GROUP BY 1, 2),
           |fresh AS (
           |  SELECT c.* FROM cand c
           |  LEFT JOIN owned ow ON ow.cust = c.cust AND ow.a = c.b
           |  WHERE ow.cust IS NULL),
           |r AS (
           |  SELECT *, CAST(row_number() OVER
           |    (PARTITION BY cust ORDER BY score DESC, n_via DESC, b) AS BIGINT) AS rnk
           |  FROM fresh)
           |SELECT cust, rnk, b AS part_id, score, n_via
           |FROM r WHERE rnk <= $RecK ORDER BY cust, rnk""".stripMargin)
  )
}
