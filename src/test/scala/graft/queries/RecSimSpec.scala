package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Laws for the round-7 additions: the recommendation family
  * (q44_item_sim / q45_recs), radius search (ann_range), diversified
  * retrieval (emb_mmr), quality-weighted sampling (samp_quality) and the
  * vocabulary coverage curve (txt_coverage). Each law re-derives the
  * operator's defining property from raw inputs independently of the
  * query's own plan — the oracle hash-match proves engine agreement,
  * these prove the SEMANTICS.
  */
class RecSimSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q44_item_sim: every emitted edge matches a definitional recount from the raw fact table") {
    import spark.implicits._
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    // join-form pair supports + item supports, independent of the index
    val supp = li.toDF("o", "a").join(li.toDF("o", "b"), "o")
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("supp_chk"))
    val item = li.groupBy($"p").agg(count(lit(1)).as("n_ord"))
    val out = q("q44_item_sim")
    val joined = out
      .withColumn("lo", least($"item", $"neighbor"))
      .withColumn("hi", greatest($"item", $"neighbor"))
      .join(supp.toDF("lo", "hi", "supp_chk"), Seq("lo", "hi"))
      .join(item.toDF("item", "n_a"), Seq("item"))
      .join(item.toDF("neighbor", "n_b"), Seq("neighbor"))
    assert(joined.count() === out.count(), "an emitted pair has no fact-table support")
    val bad = joined.filter(
      $"n_both" =!= $"supp_chk" ||
        $"jaccard_ppm" =!= expr("(supp_chk * 1000000) div (n_a + n_b - supp_chk)") ||
        $"n_both" < 3L || $"jaccard_ppm" <= 0L || $"jaccard_ppm" > 1000000L)
    assert(bad.isEmpty, s"definitional mismatch:\n${bad.head(3).mkString("\n")}")
  }

  test("q44_item_sim: per-item ranks are dense from 1 and ordered by (jaccard desc, neighbor)") {
    import spark.implicits._
    val out = q("q44_item_sim").cache()
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"item").orderBy($"jaccard_ppm".desc, $"neighbor")
      val re = out.withColumn("rechk", row_number().over(w).cast("long"))
      assert(re.filter($"rnk" =!= $"rechk").isEmpty)
      assert(out.groupBy($"item").agg(min($"rnk").as("mn"), max($"rnk").as("mx"),
        count(lit(1)).as("c"))
        .filter($"mn" =!= 1L || $"mx" =!= $"c" || $"mx" > 3L).isEmpty)
    } finally out.unpersist()
  }

  test("q45_recs: never recommends an owned part, ranks dense, score re-derives from the neighbor model") {
    import spark.implicits._
    val owned = graft.Tables.t(spark, sf, "orders").select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.t(spark, sf, "lineitem").select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("cust"), $"l_partkey".as("a")).distinct().cache()
    val out = q("q45_recs").cache()
    try {
      assert(out.join(owned.toDF("cust", "part_id"), Seq("cust", "part_id")).isEmpty,
        "a recommendation is already owned")
      assert(out.groupBy($"cust").agg(min($"rnk").as("mn"), max($"rnk").as("mx"),
        count(lit(1)).as("c")).filter($"mn" =!= 1L || $"mx" =!= $"c" || $"mx" > 5L).isEmpty)
      // score = Σ jaccard over the customer's owned items whose top-3
      // neighbor list contains the recommended part
      val nbr = RecQueries.itemNeighbors(spark, sf).select($"a", $"b", $"jaccard_ppm")
      val regen = owned.join(nbr, Seq("a"))
        .groupBy($"cust", $"b".as("part_id"))
        .agg(sum($"jaccard_ppm").as("score_chk"), count(lit(1)).as("n_via_chk"))
      val j = out.join(regen, Seq("cust", "part_id"))
      assert(j.count() === out.count())
      assert(j.filter($"score" =!= $"score_chk" || $"n_via" =!= $"n_via_chk").isEmpty)
    } finally { out.unpersist(); owned.unpersist() }
  }

  test("ann_range: exactly the brute-force pairs at-or-above the radius, none below, none missing") {
    import spark.implicits._
    val e = graft.operators.VectorOps.quantized(spark, sf)
    val qs = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"q".as("qa"), $"nn".as("na"))
    val truth = e.select($"vec_id".as("cid"), $"q".as("qb"), $"nn".as("nb"))
      .crossJoin(qs).filter($"cid" =!= $"qid")
      .withColumn("dot", graft.operators.VectorOps.dotCol(col("qa"), col("qb")))
      .withColumn("cos_chk",
        floor($"dot" / (sqrt($"na") * sqrt($"nb")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .filter($"cos_chk" >= 250000L)
      .select($"qid", $"cid", $"cos_chk")
    val out = q("ann_range")
    val diff = out.join(truth, Seq("qid", "cid"), "full_outer")
      .filter($"cos_ppm".isNull || $"cos_chk".isNull || $"cos_ppm" =!= $"cos_chk")
    assert(diff.isEmpty, s"radius-set mismatch:\n${diff.head(3).mkString("\n")}")
  }

  test("emb_mmr: seed is the relevance argmax, picks distinct, msim re-derives from the earlier picks") {
    import spark.implicits._
    val out = q("emb_mmr").cache()
    try {
      // seed = brute top-1
      val top1 = SparkEntry.queries("ann_brute_topk")(spark, sf)
        .filter($"rnk" === 1L).select($"qid", $"cid".as("cid1"))
      assert(out.filter($"rnk" === 1L).join(top1, Seq("qid"))
        .filter($"cid" =!= $"cid1").isEmpty, "MMR seed is not the relevance top-1")
      // per query: 5 distinct picks
      assert(out.groupBy($"qid").agg(countDistinct($"cid").as("k"))
        .filter($"k" =!= 5L).isEmpty)
      // msim of pick r = max cosine against picks 1..r-1 (definitional)
      val e = graft.operators.VectorOps.quantized(spark, sf)
      val withVec = out.join(e.select($"vec_id".as("cid"), $"q", $"nn"), Seq("cid"))
      val pairs = withVec.toDF("cid", "qid", "rnk", "rel_ppm", "msim_ppm", "q", "nn")
        .join(withVec.select($"qid", $"rnk".as("rj"), $"q".as("qj"), $"nn".as("nj")), Seq("qid"))
        .filter($"rj" < $"rnk")
        .withColumn("sim", floor(
          graft.operators.VectorOps.dotCol($"q", $"qj") / (sqrt($"nn") * sqrt($"nj"))
            * lit(1000000.0) + lit(0.5)).cast("long"))
        .groupBy($"qid", $"rnk", $"msim_ppm").agg(max($"sim").as("msim_chk"))
      assert(pairs.filter($"msim_ppm" =!= $"msim_chk").isEmpty,
        "selection-time max-sim does not re-derive from the picked set")
    } finally out.unpersist()
  }

  test("samp_quality: per-doc keep verdicts re-derive from (hash, quality) and the report aggregates them") {
    import spark.implicits._
    val out = q("samp_quality")
    // definitional per-doc recount: same acceptance rule, independent
    // expression path (SQL conv/md5 inline, score via the shared scorer)
    val docs = TextQueries.qualityScored(graft.Tables.t(spark, sf, "documents"))
      .select($"doc_id", $"source",
        floor($"score" * lit(1000000.0) + lit(0.5)).cast("long").as("qp"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("keep", $"h" * lit(2000000L) < $"qp" * lit(4294967296L))
    val chk = docs.groupBy($"source")
      .agg(count(lit(1)).as("nd"), sum(when($"keep", 1L).otherwise(0L)).as("nk"),
        sum($"qp").as("sa"), sum(when($"keep", $"qp").otherwise(0L)).as("sk"))
    val j = out.join(chk, Seq("source"))
    assert(j.count() === out.count())
    val bad = j.filter($"n_docs" =!= $"nd" || $"n_kept" =!= $"nk" ||
      $"mean_q_all_ppm" =!= expr("sa div nd") ||
      $"mean_q_kept_ppm" =!= expr("sk div greatest(1L, nk)") ||
      $"kept_share_ppm" =!= expr("(nk * 1000000) div nd") ||
      $"n_kept" > $"n_docs")
    assert(bad.isEmpty, s"recount mismatch:\n${bad.head(3).mkString("\n")}")
    // determinism: a rerun selects the exact same counts (hash, not RNG)
    assert(q("samp_quality").exceptAll(out).isEmpty)
    // the lift law (kept mean ≥ all mean) holds in EXPECTATION, not per
    // 25-doc stratum — asserted corpus-wide where the noise averages out:
    // acceptance ∝ quality makes the kept mass quality-weighted
    val g = docs.agg(
      (sum(when($"keep", $"qp").otherwise(0L)) * count(lit(1))).as("l"),
      (sum($"qp") * sum(when($"keep", 1L).otherwise(0L))).as("r")).head()
    assert(g.getAs[Long]("l") >= g.getAs[Long]("r"),
      "corpus-wide kept mean is below the full-corpus mean — the sampler is not quality-weighting")
  }

  test("q46_kcore: the peel trajectory matches a driver-side exact simulation") {
    import spark.implicits._
    CoPurchaseGraph.ensure(spark, sf)
    val edges = CoPurchaseGraph.symEdges(spark, sf)
      .select($"u", $"v").as[(Long, Long)].collect()
    val adj = edges.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    var deg = adj.map { case (u, vs) => u -> vs.length.toLong }
    val k = (deg.values.sum * 7) / (deg.size * 10)
    val sim = Seq.newBuilder[(Long, Long, Long, Long)]
    for (r <- 1 to 3) {
      val rem = deg.filter(_._2 < k).keys.toSet
      if (rem.nonEmpty)
        sim += ((r.toLong, rem.size.toLong, rem.min, rem.max))
      deg = (deg -- rem).map { case (x, dg) =>
        x -> (dg - adj(x).count(rem.contains))
      }
    }
    sim += ((99L, deg.size.toLong, deg.keys.min, deg.keys.max))
    val got = q("q46_kcore")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === sim.result(),
      s"peel trajectory diverges from the exact simulation (k=$k)")
  }

  test("txt_coverage: thresholds are monotone, within the vocabulary, and definitionally minimal") {
    import spark.implicits._
    val row = q("txt_coverage").head()
    val total = row.getAs[Long]("total_tokens")
    val nTypes = row.getAs[Long]("n_types")
    val t50 = row.getAs[Long]("types_50pct")
    val t90 = row.getAs[Long]("types_90pct")
    val t99 = row.getAs[Long]("types_99pct")
    assert(t50 >= 1L && t50 <= t90 && t90 <= t99 && t99 <= nTypes)
    // independent recount on the driver (sf0.001 vocabulary is tiny)
    val freqs = graft.Tables.t(spark, sf, "documents")
      .select(explode(split($"text", " +")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok")
      .collect().map(_.getAs[Long]("n"))
    assert(freqs.sum === total && freqs.length.toLong === nTypes)
    def minTypes(pct: Long): Long = {
      var cum = 0L
      var i = 0
      while (i < freqs.length) {
        cum += freqs(i); i += 1
        if (cum * 100 >= total * pct) return i.toLong
      }
      freqs.length.toLong
    }
    assert(t50 === minTypes(50) && t90 === minTypes(90) && t99 === minTypes(99))
  }
}
