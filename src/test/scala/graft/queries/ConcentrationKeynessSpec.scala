package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the concentration / keyness / mutual-kNN-components batch:
  * Simpson identities recomputed in exact BigInt math from independent
  * counts, keyness values re-derived from raw token counts, and the
  * component output checked for internal consistency (labels are
  * members, sizes conserve, only genuinely mutual vectors appear) plus
  * forced extremes (one user owns a type → Simpson exactly 10⁶).
  */
class ConcentrationKeynessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- ev_user_simpson --------------------------------------------------

  test("ev_user_simpson: the exact BigInt identity holds against independent per-user counts") {
    val rows = EventQueries.queries("ev_user_simpson")(spark, sf).collect()
    val cu = graft.Tables.events(spark, sf)
      .groupBy($"event_type", $"user_id").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet === cu.keySet)
    for (r <- rows) {
      val cs = cu(r.getAs[String]("event_type"))
      val n = cs.sum
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("n_users") === cs.length.toLong)
      val coll = cs.map(c => BigInt(c) * (c - 1)).sum
      val simpson =
        if (n > 1) (coll * 1000000 / (BigInt(n) * (n - 1))).toLong else 0L
      assert(r.getAs[Long]("simpson_ppm") === simpson)
      assert(r.getAs[Long]("top_user_share_ppm") ===
        (BigInt(cs.max) * 1000000 / n).toLong)
      assert(simpson >= 0L && simpson <= 1000000L)
    }
  }

  test("ev_user_simpson: one user owning a type scores exactly 10^6; all-singleton users exactly 0") {
    val dir = graft.rawdata.Topic.tempDir("simpson-ev-extremes")
    Seq(
      // "mono": 3 events, all user 7 -> P(same user) = 1
      (1L, ts("2024-01-01 00:00:00"), 7L, "mono", 1.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 7L, "mono", 1.0, "{}"),
      (3L, ts("2024-01-01 02:00:00"), 7L, "mono", 1.0, "{}"),
      // "spread": 3 events, 3 distinct users -> P = 0
      (4L, ts("2024-01-01 00:00:00"), 1L, "spread", 1.0, "{}"),
      (5L, ts("2024-01-01 01:00:00"), 2L, "spread", 1.0, "{}"),
      (6L, ts("2024-01-01 02:00:00"), 3L, "spread", 1.0, "{}"),
      // "single": one event -> the n<=1 guard path, 0 not a throw
      (7L, ts("2024-01-01 00:00:00"), 9L, "single", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.queries("ev_user_simpson")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("mono").getAs[Long]("simpson_ppm") === 1000000L)
    assert(rows("mono").getAs[Long]("top_user_share_ppm") === 1000000L)
    assert(rows("spread").getAs[Long]("simpson_ppm") === 0L)
    assert(rows("single").getAs[Long]("simpson_ppm") === 0L)
  }

  // ---- txt_keyness --------------------------------------------------------

  test("txt_keyness: values re-derive from raw counts, ranks are dense and ordered, support holds") {
    val rows = TextQueries.queries("txt_keyness")(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = graft.Tables.t(spark, sf, "documents")
      .select($"source", explode(split($"text", " +")).as("tok"))
      .filter(length($"tok") > 0)
    val st = toks.groupBy($"source", $"tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tt = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ss = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val tc = st.values.sum
    for ((src, rs0) <- rows.groupBy(_.getAs[String]("source"))) {
      val rs = rs0.sortBy(_.getAs[Long]("rnk"))
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Long]("rnk")).toSeq === (1L to rs.length).toSeq)
      val keys = rs.map(_.getAs[Long]("keyness_ppm"))
      assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
      for (r <- rs) {
        val tok = r.getAs[String]("tok")
        val o = st((src, tok))
        assert(o >= 5L)
        assert(r.getAs[Long]("o") === o)
        assert(r.getAs[Long]("keyness_ppm") ===
          (BigInt(o) * tc * 1000000 / (BigInt(tt(tok)) * ss(src))).toLong)
      }
    }
  }

  test("txt_keyness: a token exclusive to a source scores exactly tc*10^6 div sc") {
    val dir = graft.rawdata.Topic.tempDir("keyness-docs")
    // 'zebra' appears only in sA (5 times, min support); 'the' is evenly
    // spread so its ratio is ~1
    Seq(
      (1L, "zebra zebra zebra zebra zebra the the the the the", "en", "sA"),
      (2L, "the the the the the the the the the the", "en", "sB"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.queries("txt_keyness")(spark, dir).collect()
    val za = rows.find(r => r.getAs[String]("source") == "sA" &&
      r.getAs[String]("tok") == "zebra").get
    // o=5, t=5, sc=10, tc=20: 5*20*1e6/(5*10) = 2_000_000 ppm (2x)
    assert(za.getAs[Long]("keyness_ppm") === 2000000L)
    assert(za.getAs[Long]("rnk") === 1L)
  }

  // ---- emb_knn_cc ----------------------------------------------------------

  test("emb_knn_cc: labels are min members, sizes conserve, and exactly the mutual vectors appear") {
    val rows = AnnQueries.queries("emb_knn_cc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    for ((cid, members) <- byCluster) {
      val ids = members.map(_.getAs[Long]("vec_id"))
      assert(ids.min === cid, s"cluster $cid label is not its min member")
      assert(members.forall(_.getAs[Long]("n_members") === ids.length.toLong))
      assert(ids.length >= 2, s"cluster $cid is a singleton")
    }
    // the clustered vertex set is exactly the endpoints of the top-K
    // strongest mutual edges (K = |V| div 2, the backbone budget),
    // recomputed from the registered emb_knn relation
    val knnRows = AnnQueries.queries("emb_knn")(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor"),
        r.getAs[Long]("cos_ppm")))
    val knnSet = knnRows.map(r => (r._1, r._2)).toSet
    val mutual = knnRows
      .filter(r => r._1 < r._2 && knnSet.contains((r._2, r._1)))
      .map(r => (r._1, r._2, r._3)).distinct
    val budget = (graft.Tables.t(spark, sf, "embeddings").count() / 2).toInt
    val top = mutual.sortBy(e => (-e._3, e._1, e._2)).take(budget)
    val mutualVecs = top.flatMap(e => Seq(e._1, e._2)).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === mutualVecs)
  }
}
