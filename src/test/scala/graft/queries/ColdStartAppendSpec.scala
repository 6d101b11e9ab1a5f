package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The new-tenant-then-first-crawl lifecycle for the materialized
  * indexes: every index is built over an EMPTY corpus (the cold-start
  * shape EmptyCorpusSweepSpec proves for queries), then the FIRST real
  * batch arrives through the append path. The append-only indexes must
  * land relation-identical to a fresh build over just that batch —
  * an empty base is base case zero of append == rebuild, and it held
  * two real bugs: the graph watermark NULL-unboxed (max over zero
  * orders) and a frozen-codebook IVF append would have ASSIGNED AGAINST
  * ZERO CENTROIDS, silently dropping the batch (that one must refuse
  * loudly instead — there is nothing to freeze against).
  */
class ColdStartAppendSpec extends SparkSpec {
  import spark.implicits._

  private def emptyCorpus(): String = {
    val d = graft.rawdata.Topic.tempDir("coldstart-empty")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq.empty[(Long, Long, Long, Int, Double, Double, Double, Double, String, String, java.sql.Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def batchDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "a"),
    (2L, "THE QUICK brown fox jumps over the lazy dog again and again", "en", "b"),
    (3L, "utterly unrelated text about corpus maintenance and indexes", "en", "a"),
    (4L, "the quick brown fox jumps over the lazy dog again and AGAIN", "en", "c"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length($"text").cast("long"))

  private def batchLineitems = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 1L), (11L, 2L),
    (12L, 2L), (12L, 4L))
    .toDF("l_orderkey", "l_partkey")

  private def batchVecs = Seq(
    (1L, Array.tabulate(64)(i => ((i % 7) + 1).toFloat / 8f)),
    (2L, Array.tabulate(64)(i => ((i % 7) + 1).toFloat / 8f)),
    (3L, Array.tabulate(64)(i => ((i * 13 % 11) - 5).toFloat / 6f)))
    .toDF("vec_id", "embedding")

  test("text LSH: empty-base build + first append == fresh build over the batch") {
    val base = emptyCorpus()
    val fresh = graft.rawdata.Topic.tempDir("coldstart-fresh-docs")
    batchDocs.write.mode("overwrite").parquet(s"$fresh/documents.parquet")
    try {
      CorpusLshIndex.ensure(spark, base)
      CorpusLshIndex.append(spark, base, batchDocs)
      def jac(d: String) = CorpusLshIndex.jaccard(spark, d)
        .as[(Long, Long, Long)].collect().toSet
      def sh(d: String) = CorpusLshIndex.shingles(spark, d)
        .select($"doc_id").as[Long].collect().toSet
      assert(sh(base) === Set(1L, 2L, 3L, 4L))
      assert(jac(base) === jac(fresh),
        "first-append candidate pairs diverged from the fresh batch-only build")
      assert(jac(base).nonEmpty, "fixture must actually produce dup candidates")
    } finally {
      CorpusLshIndex.dropFor(spark, base)
      CorpusLshIndex.dropFor(spark, fresh)
    }
  }

  test("co-purchase graph: empty-base build + first append == fresh build over the batch") {
    val base = emptyCorpus()
    val fresh = graft.rawdata.Topic.tempDir("coldstart-fresh-li")
    batchLineitems.write.mode("overwrite").parquet(s"$fresh/lineitem.parquet")
    try {
      CoPurchaseGraph.ensure(spark, base)
      // the empty batch is a no-op, never a NULL-min throw
      CoPurchaseGraph.append(spark, base, batchLineitems.limit(0))
      CoPurchaseGraph.append(spark, base, batchLineitems)
      def edges(d: String) = CoPurchaseGraph.edges(spark, d)
        .as[(Long, Long, Long)].collect().toSet
      def degs(d: String) = CoPurchaseGraph.degrees(spark, d)
        .as[(Long, Long)].collect().toSet
      assert(edges(base) === edges(fresh))
      assert(degs(base) === degs(fresh))
      assert(edges(base) === Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L), (2L, 4L, 1L)))
    } finally {
      CoPurchaseGraph.dropFor(spark, base)
      CoPurchaseGraph.dropFor(spark, fresh)
    }
  }

  test("embed LSH pairs: empty-base build + first append == fresh build over the batch") {
    val base = emptyCorpus()
    val fresh = graft.rawdata.Topic.tempDir("coldstart-fresh-emb")
    batchVecs.withColumn("label", lit(1))
      .write.mode("overwrite").parquet(s"$fresh/embeddings.parquet")
    try {
      assert(CorpusLshIndex.embedPairs(spark, base).isEmpty)
      CorpusLshIndex.appendEmbeddings(spark, base, batchVecs)
      val appended = CorpusLshIndex.embedPairs(spark, base)
        .as[(Long, Long, Long)].collect().toSet
      val rebuilt = DedupQueries.embedLshPairsRaw(spark, fresh)
        .as[(Long, Long, Long)].collect().toSet
      assert(appended === rebuilt)
      assert(appended.exists { case (a, b, cos) => a == 1L && b == 2L && cos == 1000000L },
        "the identical pair must verify at exact cosine 1.0")
    } finally {
      CorpusLshIndex.dropFor(spark, base)
      CorpusLshIndex.dropFor(spark, fresh)
    }
  }

  test("IVF: appending to a zero-centroid (empty-base) index refuses loudly, never drops the batch") {
    val base = emptyCorpus()
    try {
      EmbIvfIndex.ensure(spark, base)
      val q = graft.operators.VectorOps.quantize(batchVecs)
        .select($"vec_id", $"q", $"nn")
      val err = intercept[IllegalArgumentException] {
        EmbIvfIndex.append(spark, base, q)
      }
      assert(err.getMessage.contains("EMPTY corpus"),
        s"expected the zero-centroid contract error, got: ${err.getMessage}")
    } finally EmbIvfIndex.dropFor(spark, base)
  }
}
