package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The two remaining SURVEY §4 scale techniques, demonstrated for real:
  * bucketing co-locates a fact-fact join (no shuffle before the join),
  * and salting spreads a hot join key across tasks without changing the
  * result.
  */
class ScaleTechniquesSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a pre-join shuffle, same result") {
    val li = Tables.t(spark, sf, "lineitem").select($"l_orderkey", $"l_quantity")
    val ord = Tables.t(spark, sf, "orders").select($"o_orderkey", $"o_custkey")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey").agg(sum($"l_quantity").as("qty"))
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // both sides arrive pre-partitioned by the bucket hash: the ONLY
      // exchange left is the final aggregation's (an unbucketed join
      // plan carries two more, one per side)
      assert(exchanges.size <= 1,
        s"expected at most the aggregation exchange, got ${exchanges.size}")
      val direct = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey").agg(sum($"l_quantity").as("qty"))
      assert(j.collect().toSet === direct.collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("salted join: identical rows to the plain join on a hot-key distribution") {
    // a deliberately skewed fact: ~90% of events collapse onto key 0
    val fact = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type")
      .withColumn("k", when($"user_id" % 10 =!= 0, lit(0L)).otherwise($"user_id" % 50))
    val dim = fact.select($"k").distinct()
      .withColumn("k_label", concat(lit("key-"), $"k"))
    val salted = SkewOps.saltedJoin(fact, dim, "k", "event_id", 16)
    val plain = fact.join(dim, Seq("k"))
    // same rows (compare a total aggregate per key — row-identical join)
    def summarize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k", $"k_label")
        .agg(count(lit(1)).as("n"), sum($"event_id").as("id_sum"))
        .collect().toSet
    assert(summarize(salted) === summarize(plain))
    // the salt genuinely splits the hot key across sub-keys
    val saltSpread = fact.withColumn("__salt", pmod(hash($"event_id"), lit(16)))
      .filter($"k" === 0).select($"__salt").distinct().count()
    assert(saltSpread === 16L, "hot key must be spread across all 16 salts")
  }

  test("embed LSH band width scales log2 with the corpus, floored at the oracle width") {
    import graft.queries.DedupQueries.embedLshBitsFor
    // every driver testdata sf lands on the 8-bit floor — the static
    // SQL oracles stay valid
    for (n <- Seq(1L, 500L, 2000L)) assert(embedLshBitsFor(n) === 8, s"n=$n")
    // past the floor, expected bucket occupancy n/2^bits stays in [4, 8]
    // — constant occupancy is what keeps band-join mass ~linear where a
    // fixed width would degrade quadratically (the amp=100 probe's
    // 67 GB failure mode)
    for (n <- Seq(20000L, 200000L, 2000000L, 200000000L)) {
      val bits = embedLshBitsFor(n)
      val occ = n.toDouble / (1L << bits)
      assert(occ <= 8.0 + 1e-9, s"n=$n bits=$bits occupancy $occ")
      assert(occ >= 4.0, s"n=$n bits=$bits occupancy $occ undershoots (recall paid for nothing)")
    }
  }

  test("simhash band width scales log2 with the corpus, floored at the oracle width") {
    import graft.queries.DedupQueries.simhashBandBits
    // oracle-checked sfs (500 docs) land on the 8-bit floor → 32-bit
    // fingerprints, bit-identical to the original build
    for (n <- Seq(1L, 500L, 2000L)) assert(simhashBandBits(n) === 8, s"n=$n")
    assert(simhashBandBits(5000L) === 10)   // bench sf0.1
    assert(simhashBandBits(500000L) === 16) // amp=100; capped at 64-bit total
    assert(simhashBandBits(100000000L) === 16, "width caps at the 64-bit fingerprint")
  }

  test("IVF seed step scales sqrt with the corpus, floored at the oracle step") {
    import graft.queries.AnnQueries.centroidStepFor
    // every driver testdata sf lands on the 100 floor — `% 100` oracles
    // stay valid
    for (n <- Seq(1L, 500L, 2000L)) assert(centroidStepFor(n) === 100L, s"n=$n")
    // past the floor, nlist = n/step tracks ~0.45*sqrt(n): assignment
    // work n*nlist stays ~n^1.5 where a fixed step makes it n²/100
    for (n <- Seq(20000L, 200000L, 2000000L, 2000000000L)) {
      val step = centroidStepFor(n)
      val nlist = n.toDouble / step
      val ratio = nlist / math.sqrt(n.toDouble)
      assert(ratio > 0.4 && ratio < 0.5, s"n=$n step=$step nlist/sqrt(n)=$ratio")
    }
  }

  test("centroidStepFor is the literal twin of its SQL scalar-subquery form") {
    import graft.queries.AnnQueries.centroidStepFor
    // the IVF oracles now derive the step in SQL as
    // GREATEST(100, CAST(FLOOR(sqrt(5.0*n)+0.5) AS BIGINT)); prove the
    // Scala rule evaluates identically across the floor boundary and
    // well past it (sqrt/floor are IEEE-deterministic on both engines —
    // a mismatch here means one side drifted from the shared formula)
    val ns = (Seq(1L, 499L, 500L, 1999L, 2000L, 2001L, 2010L, 2048L, 5000L) ++
      Seq(20000L, 200000L, 2000000L, 2000000000L)).map(_.toString + "L").mkString(",")
    val rows = spark.sql(
      s"""SELECT n, GREATEST(100L, CAST(FLOOR(sqrt(5.0 * n) + 0.5) AS BIGINT)) AS st
         |FROM (SELECT explode(array($ns)) AS n)""".stripMargin).collect()
    rows.foreach { r =>
      val n = r.getLong(0)
      assert(r.getLong(1) === centroidStepFor(n), s"n=$n")
    }
  }

  test("driver fixtures stay on the static-oracle floors (band width + IVF step)") {
    import graft.queries.AnnQueries.centroidStepFor
    import graft.queries.DedupQueries.embedLshBitsFor
    // EmbedPairCtes (the emb_knn / dd_embed_lsh / ann_band_stats oracle
    // chain) unrolls 8-bit hyperplane constants; the IVF oracles now
    // track COUNT(*), but the embed-band oracle is static. This guard
    // fails LOUDLY if any driver fixture grows past the floor — the
    // signal to widen the oracle CASE, instead of a silent divergence.
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val p = new java.io.File(s"/root/testdata/$d/embeddings.parquet")
      if (p.exists()) {
        val n = spark.read.parquet(p.toString).count()
        assert(embedLshBitsFor(n) === 8,
          s"$d: $n embeddings crossed the 8-bit band floor — the static " +
            "EmbedPairCtes oracle constants no longer replay; add a width CASE")
        assert(centroidStepFor(n) >= 100L)
      }
    }
  }
}
