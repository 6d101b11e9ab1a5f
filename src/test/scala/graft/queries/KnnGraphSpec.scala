package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** emb_knn structural laws + recall against the exact all-pairs truth.
  * LSH buckets are tuned for the high-cosine regime (the near-dup /
  * semantic-dup use), so recall is measured over true neighbors at
  * cos ≥ 0.35 — below that the graph makes no promise.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  test("emb_knn emits ranked distinct neighbors and finds the high-cos truth") {
    val out = SparkEntry.queries("emb_knn")(spark, sf)
      .select($"vec_id", $"rnk", $"neighbor", $"cos_ppm")
      .as[(Long, Long, Long, Long)].collect()

    // structural: ranks are 1..k dense per vector, neighbors distinct,
    // cos non-increasing with rank
    for ((v, rows0) <- out.groupBy(_._1)) {
      val rows = rows0.sortBy(_._2)
      assert(rows.map(_._2).toSeq === (1L to rows.length).toSeq, s"dense ranks for $v")
      assert(rows.map(_._3).distinct.length === rows.length, s"distinct neighbors for $v")
      assert(rows.map(_._4).toSeq.reverse.sorted.reverse === rows.map(_._4).toSeq.sorted.reverse,
        s"cos non-increasing for $v")
      assert(!rows.exists(_._3 == v), s"no self edge for $v")
    }

    // exact truth: quantized cosine over all pairs (500 vectors locally)
    val vecs = graft.Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray }
    val norms = vecs.map { case (id, q) => id -> q.map(x => x * x).sum }.toMap
    def cosPpm(a: Array[Long], b: Array[Long], na: Long, nb: Long): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      math.floor(dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1000000.0 + 0.5).toLong
    }
    val live = vecs.filter(v => norms(v._1) > 0)
    val graphEdges = out.map(r => (r._1, r._3)).toSet
    var truthN = 0
    var foundN = 0
    for ((id, q) <- live) {
      val na = norms(id)
      val truth = live.iterator.filter(_._1 != id)
        .map { case (jd, qj) => jd -> cosPpm(q, qj, na, norms(jd)) }
        .filter(_._2 >= 350000L)
        .toSeq.sortBy(t => (-t._2, t._1)).take(5)
      truthN += truth.length
      foundN += truth.count(t => graphEdges.contains((id, t._1)))
    }
    assert(truthN > 0, "the corpus has high-cos neighbors to find")
    val recall = foundN.toDouble / truthN
    info(f"emb_knn recall@5 (cos >= 0.35 truth) = $recall%.2f ($foundN/$truthN)")
    assert(recall >= 0.6, s"recall $recall below 0.6")
  }

  test("emb_hard_negatives: one cross-label rank-1 row per vector, never beating the knn rank-1") {
    val hn = SparkEntry.queries("emb_hard_negatives")(spark, sf)
      .select($"vec_id", $"label", $"neg_id", $"neg_label", $"cos_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(hn.nonEmpty, "expected at least one cross-label candidate pair")
    // one row per vector, labels genuinely differ, no self edges
    assert(hn.map(_._1).distinct.length === hn.length, "at most one negative per vector")
    assert(hn.forall(r => r._2 != r._4), "negative must carry a different label")
    assert(hn.forall(r => r._1 != r._3), "no self edges")
    // labels match the embeddings table on both endpoints
    val labels = graft.Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    assert(hn.forall(r => labels(r._1) == r._2 && labels(r._3) == r._4))
    // the hard negative is drawn from the SAME candidate pool as emb_knn,
    // so it can never be more similar than that vector's overall rank-1
    val knn1 = SparkEntry.queries("emb_knn")(spark, sf)
      .filter($"rnk" === 1L)
      .select($"vec_id", $"cos_ppm").as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    assert(hn.forall(r => knn1.get(r._1).forall(r._5 <= _)),
      "hard negative more similar than the unrestricted nearest neighbor")
  }
}
