package graft.queries

import graft.SparkSpec

/** The keep-one-per-cluster laws of the semantic-dedup capstone:
  * exactly one survivor per duplicate cluster (its min id), no near-dup
  * pair survives intact, and non-duplicated vectors all survive.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("emb_semdedup keeps exactly the min vector of every cluster") {
    val out = AnnQueries.queries("emb_semdedup")(spark, sf)
      .as[(Long, Long, Long)].collect()
    spark.catalog.clearCache()
    val total = graft.Tables.t(spark, sf, "embeddings").count()
    assert(out.length.toLong === total, "one verdict row per corpus vector")

    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val kept = members.filter(_._3 == 1L)
      assert(kept.length === 1, s"cluster $cid must keep exactly one vector")
      assert(kept.head._1 === members.map(_._1).min,
        s"cluster $cid must keep its min id")
      assert(cid === members.map(_._1).min, "cluster id is the min member")
    }

    // no verified near-dup pair survives with both sides kept
    val keptSet = out.filter(_._3 == 1L).map(_._1).toSet
    val pairs = DedupQueries.embedLshPairs(spark, sf)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(!(keptSet(a) && keptSet(b)), s"near-dup pair ($a, $b) fully survived")
    }

    // vectors in no pair are their own cluster and survive
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.filter(r => !paired(r._1)).foreach { case (v, cid, kept) =>
      assert(cid === v && kept === 1L, s"unpaired vector $v must survive as its own cluster")
    }
  }
}
