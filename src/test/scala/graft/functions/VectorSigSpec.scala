package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VectorOps

/** The native HyperplaneBands expression must be bit-equal with both the
  * interpreted higher-order-function formulation it replaced and a plain
  * Scala re-computation of the same md5-derived planes.
  */
class VectorSigSpec extends SparkSpec {
  import spark.implicits._

  private val Tables = 10
  private val Bits = 8

  test("native bands equal the HOF formulation and a local recomputation") {
    val e = VectorOps.quantized(spark, sf)
    val planeLit = array(VectorOps.hyperplanes(Tables * Bits, 64).map(p => array(p.map(lit(_)): _*)): _*)
    val hof = e.withColumn("planes", planeLit)
      .withColumn("bands_hof", expr(
        s"""transform(sequence(0, ${Tables - 1}), t ->
           |  aggregate(sequence(0, ${Bits - 1}), 0L, (acc, k) ->
           |    acc + CASE WHEN aggregate(zip_with(q, planes[t * $Bits + k], (x, p) -> x * p), 0L, (a, v) -> a + v) > 0
           |               THEN shiftleft(1L, k) ELSE 0L END))""".stripMargin))
      .drop("planes")
    val both = VectorOps.withHyperplaneBands(hof, Tables, Bits)
      .select($"vec_id", $"q", $"bands", $"bands_hof")
    assert(both.filter(expr("bands <> bands_hof")).count() === 0)

    // spot-check against a local recomputation (independent of Spark)
    val planes = VectorOps.hyperplanes(Tables * Bits, 64)
    both.limit(20).collect().foreach { r =>
      val q = r.getAs[scala.collection.Seq[Long]]("q").toArray
      val got = r.getAs[scala.collection.Seq[Long]]("bands").toSeq
      val want = (0 until Tables).map { t =>
        (0 until Bits).foldLeft(0L) { (band, k) =>
          val dot = q.zip(planes(t * Bits + k)).map { case (x, p) => x * p }.sum
          if (dot > 0) band | (1L << k) else band
        }
      }
      assert(got === want, s"bands mismatch for vec ${r.getAs[Long]("vec_id")}")
    }
  }

  test("hyperplane_bands is callable from SQL via the extensions") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("qv")
    val viaSql = spark.sql(s"SELECT vec_id, hyperplane_bands(q, $Tables, $Bits) AS bands FROM qv")
    val viaApi = VectorOps.withHyperplaneBands(VectorOps.quantized(spark, sf), Tables, Bits)
      .select($"vec_id", $"bands")
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("native long_dot equals the HOF dot product and a local recomputation") {
    val e = VectorOps.quantized(spark, sf)
    // self-pair with the reversed vector: exercises negative terms too
    val pairs = e.select($"vec_id", $"q".as("qa"), reverse($"q").as("qb"))
      .withColumn("dot_native", VectorOps.dotCol($"qa", $"qb"))
      .withColumn("dot_hof", expr(VectorOps.dotExpr))
    assert(pairs.filter($"dot_native" =!= $"dot_hof").count() === 0)
    pairs.limit(20).collect().foreach { r =>
      val a = r.getAs[scala.collection.Seq[Long]]("qa")
      val b = r.getAs[scala.collection.Seq[Long]]("qb")
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      assert(r.getAs[Long]("dot_native") === want)
    }
    // and the squared norm via long_dot(q, q) agrees with the nn column
    assert(e.filter(VectorOps.dotCol($"q", $"q") =!= $"nn").count() === 0)
  }

  test("native quantize_vec equals the HOF quantization on the whole corpus") {
    val raw = graft.Tables.t(spark, sf, "embeddings")
    val both = VectorOps.quantize(raw)
      .withColumn("q_hof", expr(
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"))
      .withColumn("nn_hof", expr("aggregate(q_hof, 0L, (acc, x) -> acc + x * x)"))
    assert(both.filter(expr("q <> q_hof OR nn <> nn_hof")).count() === 0)
    // callable from SQL too
    raw.createOrReplaceTempView("emb_raw")
    val viaSql = spark.sql("SELECT vec_id, quantize_vec(embedding) AS q FROM emb_raw")
    val viaApi = VectorOps.quantize(raw).select($"vec_id", $"q")
    assert(viaSql.exceptAll(viaApi).count() === 0)
  }

  test("long_dot is callable from SQL via the extensions") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("qv_dot")
    val bad = spark.sql("SELECT vec_id FROM qv_dot WHERE long_dot(q, q) <> nn")
    assert(bad.count() === 0)
  }

  // null-element contract: the kernels must fail LOUDLY (the silent
  // alternative quantizes the null slot's raw garbage), and long_dot on
  // types that PROVE containsNull=false keeps the no-check fast kernel
  test("a null vector element fails loudly, never quantizes garbage") {
    val nullable = spark.sql(
      "SELECT array(CAST(1.5 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding")
    val err = intercept[Exception] {
      nullable.selectExpr("quantize_vec(embedding) AS q").collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(err).exists(_.contains("null element")))
    val dotErr = intercept[Exception] {
      spark.sql("SELECT long_dot(array(1L, NULL), array(2L, 3L)) AS d").collect()
    }
    assert(rootMessages(dotErr).exists(_.contains("null element")))
    // a whole-NULL array still propagates null (expression-level
    // null handling, untouched by the element contract)
    val r = spark.sql("SELECT quantize_vec(CAST(NULL AS ARRAY<FLOAT>)) AS q").collect()
    assert(r.head.isNullAt(0))
  }

  test("sig (single-table packed form) matches the first band") {
    val e = VectorOps.quantized(spark, sf)
    val sig = VectorOps.withHyperplaneSig(e, 8)
    val bands = VectorOps.withHyperplaneBands(e, 1, 8)
      .select($"vec_id", element_at($"bands", 1).as("b0"))
    val joined = sig.select($"vec_id", $"sig").join(bands, Seq("vec_id"))
    assert(joined.filter($"sig" =!= $"b0").count() === 0)
  }
}
