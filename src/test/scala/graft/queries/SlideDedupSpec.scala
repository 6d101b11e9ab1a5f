package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** dd_slide's reason to exist: an exact duplicated block whose copies sit
  * at DIFFERENT token offsets (not congruent mod SegLen) misaligns every
  * one of dd_segment's fixed 16-token grid segments — the grid provably
  * reports nothing — while the stride-1 sliding window catches the block
  * exactly, with the right span length.
  */
class SlideDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = graft.rawdata.Topic.tempDir("slide-dedup")
    val block = (0 until 40).map(i => s"blk$i")
    // copies at offsets 5 and 7: 5 ≢ 7 (mod 16), so no 16-aligned grid
    // segment lands at the same block-relative position in both docs
    val docA = ((0 until 5).map(i => s"pa$i") ++ block ++ (0 until 10).map(i => s"sa$i")).mkString(" ")
    val docB = ((0 until 7).map(i => s"pb$i") ++ block ++ (0 until 10).map(i => s"sb$i")).mkString(" ")
    val docC = (0 until 60).map(i => s"other$i").mkString(" ")
    Seq((1L, docA, "en", "web"), (2L, docB, "en", "web"), (3L, docC, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dd_segment's fixed grid misses the offset-shifted 40-token block") {
    val seg = CurationQueries.queries("dd_segment")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(seg.forall(_.getAs[Long]("n_dup_segs") == 0L),
      "the grid should NOT see the shifted block — if it does, this corpus no longer proves the gap")
  }

  test("dd_slide catches the block at both offsets with the exact span") {
    val out = CurationQueries.queries("dd_slide")(spark, dir).collect()
    spark.catalog.clearCache()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc.keySet === Set(1L, 2L), s"exactly the two block carriers flagged, got ${byDoc.keySet}")
    for (id <- Seq(1L, 2L)) {
      val r = byDoc(id)
      // a 40-token block has 40-32+1 = 9 stride-1 windows in one run
      assert(r.getAs[Long]("n_runs") === 1L)
      assert(r.getAs[Long]("n_dup_wins") === 9L)
      assert(r.getAs[Long]("max_span_tok") === 40L,
        s"doc $id: recovered span ${r.getAs[Long]("max_span_tok")}, want the true 40")
    }
  }
}
