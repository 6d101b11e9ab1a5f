package graft.queries

import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** emb_fps incremental-recurrence laws.
  *
  * The greedy k-center selector must (a) join each round against ONLY the
  * newest center — the O(k·n) recurrence, not the O(k²·n) rescan of the
  * whole selected set; (b) still produce the DEFINITIONAL gap: the min
  * squared distance from each pick to every earlier-selected center;
  * (c) yield the non-increasing coverage-radius ladder the k-center
  * 2-approximation guarantee is stated on; (d) scale to k ≫ the default
  * via the graft.fps.k conf without changing per-round shape.
  */
class FpsSpec extends SparkSpec {
  import spark.implicits._

  private def runFps(k: Option[Int]): Array[(Long, Long, Long)] = {
    k.foreach(v => spark.conf.set("graft.fps.k", v.toString))
    try
      AnnQueries.queries("emb_fps")(spark, sf)
        .select($"rnk", $"vec_id", $"gap").as[(Long, Long, Long)].collect()
    finally spark.conf.unset("graft.fps.k")
  }

  test("fpsUpdate joins against exactly one center per round") {
    val e = graft.operators.VectorOps.quantized(spark, sf)
      .select($"vec_id", $"q")
    val cand = e.filter($"vec_id" =!= 0)
      .withColumn("gap", lit(Long.MaxValue))
    val pick = cand.orderBy($"gap".desc, $"vec_id").limit(1)
      .select(lit(2L).as("rnk"), $"vec_id", $"gap", $"q")
      .localCheckpoint(true)
    assert(pick.count() === 1L, "the newest-center relation is one row")
    val plan = AnnQueries.fpsUpdate(cand, pick).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val joins = plan.collect { case j: BaseJoinExec => j }
    assert(joins.size === 1,
      s"one round must join exactly once (against the newest center), got ${joins.size}")
  }

  test("incremental gap equals the definitional min over earlier centers") {
    val sel = runFps(None).sortBy(_._1)
    assert(sel.map(_._1).toSeq === (1L to sel.length.toLong))
    // recompute every pairwise distance among the ≤ k selected vectors
    val ids = sel.map(_._2)
    val e = graft.operators.VectorOps.quantized(spark, sf)
      .filter($"vec_id".isin(ids: _*)).select($"vec_id", $"q")
    val d2 = e.select($"vec_id".as("a"), $"q".as("qa"))
      .join(e.select($"vec_id".as("b"), $"q".as("qb")), $"a" =!= $"b")
      .select($"a", $"b",
        graft.operators.VectorOps.l2Col($"qa", $"qb").as("dd"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, dd) => (a, b) -> dd }.toMap
    for (r <- 2 to sel.length) {
      val (_, v, gap) = sel(r - 1)
      val expected = (1 until r).map(p => d2((v, sel(p - 1)._2))).min
      assert(gap === expected,
        s"round $r gap must be the min distance to the $r-1 earlier centers")
    }
  }

  test("coverage-radius ladder is non-increasing and k is conf-scalable") {
    val k = 64
    val sel = runFps(Some(k)).sortBy(_._1)
    assert(sel.length === k, s"graft.fps.k=$k must yield $k picks")
    assert(sel.map(_._2).distinct.length === k, "picks are distinct vectors")
    val ladder = sel.drop(1).map(_._3)
    assert(ladder.zip(ladder.tail).forall { case (a, b) => a >= b },
      "the selection-time gap (coverage radius) must never increase")
  }
}
