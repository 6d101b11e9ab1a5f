package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** dd_lsh_curve laws: the r=3 sweep point IS the production banding
  * (so it must agree with the materialized index exactly), wider bands
  * nominate subsets of the aligned 2-row configuration, and precision
  * is the exact integer ratio of its own columns.
  */
class LshCurveSpec extends SparkSpec {

  test("dd_lsh_curve: r=3 equals the production index; nesting + ratio laws hold") {
    val spark2 = spark
    import spark2.implicits._
    val rows = SparkEntry.queries("dd_lsh_curve")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(2L, 3L, 4L))

    // r=3 is exactly the production 4x3 banding: candidate count and
    // verified-true count must equal the materialized index's relations
    val prodCand = CorpusLshIndex.candidates(spark, sf).count()
    val prodTrue = CorpusLshIndex.jaccard(spark, sf)
      .filter($"jaccard_ppm" >= 400000).count()
    spark.catalog.clearCache()
    assert(rows(3L)._3 == prodCand, "r=3 candidate volume diverges from the index")
    assert(rows(3L)._4 == prodTrue, "r=3 true count diverges from the index")

    // every 3-row and 4-row band contains an aligned 2-row band, so
    // their candidate (and true) sets nest inside the r=2 config's
    assert(rows(2L)._3 >= rows(3L)._3 && rows(2L)._3 >= rows(4L)._3)
    assert(rows(2L)._4 >= rows(3L)._4 && rows(2L)._4 >= rows(4L)._4)

    for ((_, (r, nb, cand, tru, ppm)) <- rows) {
      assert(nb == 12L / r)
      assert(tru <= cand)
      assert(ppm == (if (cand == 0) 0L else tru * 1000000L / cand))
    }
    assert(rows(2L)._3 > 0, "the sf0.001 corpus nominates known candidates")
  }
}
