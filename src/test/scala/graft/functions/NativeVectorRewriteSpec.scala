package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.VectorOps

/** The injected optimizer rule must rewrite the portable HOF idioms into
  * LongDot without changing ANY result — including the null-on-length-
  * mismatch edge the size guard exists for.
  */
class NativeVectorRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val Excl = "spark.sql.optimizer.excludedRules"

  private def withRuleDisabled[A](body: => A): A = {
    val before = spark.conf.getOption(Excl)
    spark.conf.set(Excl, "graft.functions.NativeVectorRewrite")
    try body
    finally before match {
      case Some(v) => spark.conf.set(Excl, v)
      case None => spark.conf.unset(Excl)
    }
  }

  private def usesLongDot(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: LongDot => found = true
      case _ => ()
    }))
    found
  }

  test("the HOF dot product is rewritten to LongDot and stays bit-equal") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("nvr_qv")
    val hofSql =
      """SELECT vec_id,
        |  aggregate(zip_with(q, reverse(q), (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS dot
        |FROM nvr_qv""".stripMargin
    val rewritten = spark.sql(hofSql)
    assert(usesLongDot(rewritten), "optimizer rule fired on the zip_with form")
    val expected = withRuleDisabled {
      val df = spark.sql(hofSql)
      assert(!usesLongDot(df), "exclusion leaves the HOF form interpreted")
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val got = rewritten.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("the HOF squared norm is rewritten and equals the nn column") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("nvr_qv2")
    val df = spark.sql(
      "SELECT vec_id, nn, aggregate(q, 0L, (acc, x) -> acc + x * x) AS nn2 FROM nvr_qv2")
    assert(usesLongDot(df), "optimizer rule fired on the norm form")
    assert(df.filter($"nn" =!= $"nn2").count() === 0)
  }

  test("length mismatch still yields null after the rewrite") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("nvr_qv3")
    val sql =
      """SELECT aggregate(zip_with(q, slice(q, 1, 32), (x, y) -> x * y),
        |                 0L, (acc, v) -> acc + v) AS dot
        |FROM nvr_qv3""".stripMargin
    val rewritten = spark.sql(sql).collect().map(r => r.isNullAt(0))
    val reference = withRuleDisabled(spark.sql(sql).collect().map(r => r.isNullAt(0)))
    assert(rewritten.forall(identity), "padded zip_with must stay null")
    assert(rewritten.toSeq === reference.toSeq)
  }

  test("the HOF squared distance is rewritten to LongL2 and stays bit-equal") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("nvr_qv5")
    val hofSql =
      """SELECT vec_id,
        |  aggregate(zip_with(q, reverse(q), (x, y) -> (x - y) * (x - y)),
        |            0L, (acc, v) -> acc + v) AS d2
        |FROM nvr_qv5""".stripMargin
    def usesL2(df: DataFrame): Boolean = {
      var found = false
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case _: LongL2 => found = true
        case _ => ()
      }))
      found
    }
    val rewritten = spark.sql(hofSql)
    assert(usesL2(rewritten), "optimizer rule fired on the (x-y)*(x-y) form")
    val expected = withRuleDisabled {
      val df = spark.sql(hofSql)
      assert(!usesL2(df))
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(rewritten.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
    // and the SQL function agrees with the rewritten HOF
    val viaFn = spark.sql(
      "SELECT vec_id, long_l2(q, reverse(q)) AS d2 FROM nvr_qv5")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFn === expected)
  }

  // the rewrite duplicates its children (size guard + kernel, q into
  // both LongDot slots) — sound only for deterministic expressions, so a
  // non-deterministic array must be left on the interpreted path
  test("non-deterministic inputs are not rewritten") {
    VectorOps.quantized(spark, sf).createOrReplaceTempView("nvr_qv4")
    val nondet = spark.sql(
      """SELECT aggregate(zip_with(shuffle(q), shuffle(q), (x, y) -> x * y),
        |                 0L, (acc, v) -> acc + v) AS dot
        |FROM nvr_qv4""".stripMargin)
    assert(!usesLongDot(nondet), "non-deterministic dot must stay interpreted")
    val nondetNorm = spark.sql(
      "SELECT aggregate(shuffle(q), 0L, (acc, x) -> acc + x * x) AS nn2 FROM nvr_qv4")
    assert(!usesLongDot(nondetNorm), "non-deterministic norm must stay interpreted")
    // while the deterministic forms (previous tests) keep rewriting
    val det = spark.sql(
      "SELECT aggregate(q, 0L, (acc, x) -> acc + x * x) AS nn2 FROM nvr_qv4")
    assert(usesLongDot(det))
  }
}
