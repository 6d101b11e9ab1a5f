package graft.queries

import graft.SparkSpec

/** Information-theoretic invariants of the ln_micro entropy family —
  * bounds that hold for ANY distribution, so a formula slip (wrong sum,
  * swapped ln arguments, missed normalization) breaks them regardless
  * of fixture luck. Values are exact integers, so the bounds carry only
  * the documented ≤3-micro-unit-per-ln quantization slack, scaled by
  * the summed mass.
  */
class EntropyLawsSpec extends SparkSpec {

  // per-ln quantization slack (FixedLnSpec's bound), generously scaled:
  // H sums N-weighted ln terms then divides by N, so ~2 lns of slack
  private val Slack = 10L

  test("txt_entropy: 0 <= H <= ln(n_types), norm_ppm in [0, 1e6]") {
    val rows = CurationTestAccess.run(spark, "txt_entropy", sf)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("entropy_micro")
      val types = r.getAs[Long]("n_types")
      assert(h >= -Slack, s"negative entropy for ${r.getAs[String]("source")}")
      assert(h <= graft.functions.FixedLnOps.lnMicro(types) + Slack,
        s"entropy above ln(n_types) for ${r.getAs[String]("source")}")
      val norm = r.getAs[Long]("norm_ppm")
      assert(norm >= 0 && norm <= 1000000 + Slack)
    }
  }

  test("txt_cond_entropy: 0 <= H(next|tok) <= txt_entropy's H (conditioning reduces entropy)") {
    val cond = CurationTestAccess.run(spark, "txt_cond_entropy", sf)
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("cond_entropy_micro")).toMap
    val uni = CurationTestAccess.run(spark, "txt_entropy", sf)
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("entropy_micro")).toMap
    assert(cond.nonEmpty)
    cond.foreach { case (src, h) =>
      assert(h >= -Slack, s"negative conditional entropy for $src")
      // H(B|A) <= H(B); the unigram H here is over a set differing by
      // one trailing token per doc — allow a small mass-edge slack
      assert(h <= uni(src) + 50000L,
        s"conditional entropy above unigram entropy for $src: $h vs ${uni(src)}")
    }
  }

  test("txt_kl: KL >= 0, and 0 exactly when a source IS the corpus") {
    val rows = CurationTestAccess.run(spark, "txt_kl", sf)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("kl_micro") >= -Slack,
        s"negative KL for ${r.getAs[String]("source")}")
    }
    // single-source corpus: the source distribution equals the corpus
    // distribution, so every gap term is 0 and KL is exactly lnQ - lnN = 0
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = graft.rawdata.Topic.tempDir("kl-single")
    graft.Tables.t(spark, sf, "documents")
      .withColumn("source", lit("only"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = CurationTestAccess.run(spark, "txt_kl", dir)
    spark.catalog.clearCache()
    assert(one.length == 1 && one.head.getAs[Long]("kl_micro") == 0L,
      s"single-source corpus must have exactly zero KL, got ${one.toSeq}")
  }

  test("ev_entropy_rate: 0 <= H(next|cur) <= ln(n_next_types) per state") {
    val rows = CurationTestAccess.run(spark, "ev_entropy_rate", sf)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("h_micro")
      assert(h >= -Slack)
      assert(h <= graft.functions.FixedLnOps.lnMicro(r.getAs[Long]("n_next_types")) + Slack,
        s"state ${r.getAs[String]("from_type")} exceeds its support bound")
    }
  }

  test("ev_user_entropy: buckets within [0, ln(n_event_types)/1e4], users conserved") {
    import org.apache.spark.sql.functions._
    val rows = CurationTestAccess.run(spark, "ev_user_entropy", sf)
    val nTypes = graft.Tables.events(spark, sf)
      .select(countDistinct(col("event_type"))).collect().head.getLong(0)
    val nUsers = graft.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers, "histogram must conserve users")
    val maxBucket = (graft.functions.FixedLnOps.lnMicro(nTypes) + Slack) / 10000
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= maxBucket, s"bucket $b outside [0, $maxBucket]")
    }
  }

  test("samp_src_entropy + ann_cell_entropy + mm_byte_entropy: bounds hold") {
    val se = CurationTestAccess.run(spark, "samp_src_entropy", sf).head
    assert(se.getAs[Long]("entropy_micro") >= -Slack)
    assert(se.getAs[Long]("entropy_micro") <=
      graft.functions.FixedLnOps.lnMicro(se.getAs[Long]("n_sources")) + Slack)
    val ce = CurationTestAccess.run(spark, "ann_cell_entropy", sf).head
    assert(ce.getAs[Long]("entropy_micro") >= -Slack)
    assert(ce.getAs[Long]("entropy_micro") <=
      graft.functions.FixedLnOps.lnMicro(ce.getAs[Long]("n_cells")) + Slack)
    assert(ce.getAs[Long]("balance_ppm") >= 0 && ce.getAs[Long]("balance_ppm") <= 1000000 + Slack)
    val be = CurationTestAccess.run(spark, "mm_byte_entropy", sf)
    assert(be.nonEmpty)
    be.foreach { r =>
      val h = r.getAs[Long]("entropy_micro")
      assert(h >= -Slack)
      assert(h <= graft.functions.FixedLnOps.lnMicro(256L) + Slack,
        "byte entropy above the 8-bit ceiling")
      assert(r.getAs[Long]("fill_ppm") <= 1000000 + Slack)
    }
    spark.catalog.clearCache()
  }
}

/** run a registered query by key (the spec-side view of SparkEntry) */
private[queries] object CurationTestAccess {
  def run(s: org.apache.spark.sql.SparkSession, key: String, d: String): Array[org.apache.spark.sql.Row] =
    graft.SparkEntry.queries(key)(s, d).collect()
}
