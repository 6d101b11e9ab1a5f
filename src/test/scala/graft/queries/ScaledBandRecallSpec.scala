package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The recall half of the corpus-scaled band-width rule: widening bands
  * (12 bits at 20k vectors instead of the 8-bit floor) lowers per-table
  * collision probability for a true near-dup pair — this spec proves the
  * configured compensation (10 tables × hamming-1 multi-probe) still
  * catches essentially every planted near-duplicate at a
  * 10×-above-floor corpus size. For a ~0.97-cosine pair, per-table
  * catch ≈ p^12 + 12·p^11(1−p) with p = 1 − θ/π ≈ 0.94, so the
  * 10-table miss probability is ~1e-6 — deterministic hashes make the
  * outcome reproducible, and the assertion leaves slack for a handful
  * of boundary pairs.
  */
class ScaledBandRecallSpec extends SparkSpec {
  import spark.implicits._

  private val N = 20000
  private val Dims = 16
  private val Planted = 100

  private lazy val dir: String = {
    val d = graft.rawdata.Topic.tempDir("scaled-band-recall")
    // deterministic pseudo-random base corpus: component j of vector i
    // is hash-derived uniform in [-1, 1]
    val base = spark.range(0, N).toDF("vec_id")
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${Dims - 1}), j -> " +
          "CAST((pmod(hash(vec_id, j), 2000) - 1000) / 1000.0 AS FLOAT))"))
    // planted near-dups: vec N+i copies vec i*37 with one component
    // nudged — cosine ≈ 0.97+
    val planted = spark.range(0, Planted).toDF("k")
      .withColumn("vec_id", $"k" + N)
      .withColumn("src", $"k" * 37)
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${Dims - 1}), j -> " +
          "CAST((pmod(hash(src, j), 2000) - 1000) / 1000.0 + IF(j = 0, 0.05, 0.0) AS FLOAT))"))
      .select($"vec_id", $"embedding")
    base.unionByName(planted)
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("above the floor the rule widens the bands and occupancy stays bounded") {
    assert(DedupQueries.embedLshBitsFor(N + Planted) === 12)
    val stats = AnnQueries.queries("ann_band_stats")(spark, dir).collect()
    spark.catalog.clearCache()
    assert(stats.length === 10)
    stats.foreach { r =>
      // no band-bucket collapse: the worst bucket holds a vanishing
      // fraction of the corpus (the fixed-8-bit regime held ~n/256)
      assert(r.getAs[Long]("max_bucket") < (N + Planted) / 20,
        s"table ${r.getAs[Long]("tbl")} worst bucket ${r.getAs[Long]("max_bucket")}")
    }
  }

  test("multi-probe banding at 12 bits still catches ~every planted near-dup") {
    val pairs = CorpusLshIndex.embedPairs(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    val caught = (0 until Planted).count { k =>
      val (a, b) = (k.toLong * 37, k.toLong + N)
      pairs.contains((math.min(a, b), math.max(a, b)))
    }
    assert(caught >= Planted - 5,
      s"only $caught of $Planted planted near-dups survived the widened bands")
  }
}
