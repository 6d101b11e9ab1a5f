package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The deterministic fixed-point ln (txt_zipf's scoring kernel and the
  * entropy family's workhorse): exactness of the integer algorithm,
  * accuracy against libm, and native-expression == plain-Scala parity.
  */
class FixedLnSpec extends SparkSpec {
  import spark.implicits._

  test("lnMicro matches math.log within 3 micro-units across the domain") {
    val vs = (1L to 2000L) ++
      Seq(4095L, 4096L, 4097L, 1L << 20, (1L << 31) - 1, 1L << 31, (1L << 31) + 1,
        1L << 40, (1L << 45) + 12345L, 1L << 62, Long.MaxValue)
    for (v <- vs) {
      val got = FixedLnOps.lnMicro(v)
      val want = math.log(v.toDouble) * 1e6
      assert(math.abs(got - want) <= 3.0,
        s"ln_micro($v) = $got, libm says $want (diff ${got - want})")
    }
  }

  test("exact at powers of two: ln_micro(2^k) is the k-scaled ln2 constant") {
    // the algorithm yields f = 0 at exact powers, so the result is the
    // single constant multiply — no 1-ulp-early widening is possible
    // (the failure mode the integer-doubling rules exist to avoid)
    for (k <- 0 to 62) {
      val got = FixedLnOps.lnMicro(1L << k)
      val want = (k.toLong << 20) * FixedLnOps.Ln2MicroC >> 26
      assert(got === want, s"ln_micro(2^$k)")
    }
    assert(FixedLnOps.lnMicro(1L) === 0L)
  }

  test("lnMicro is monotone non-decreasing") {
    val vs = (1L to 5000L) ++ (0 to 61).map(k => (1L << k) + 1)
    vs.sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(FixedLnOps.lnMicro(a) <= FixedLnOps.lnMicro(b), s"monotone at $a -> $b")
    }
  }

  test("native ln_micro expression equals the plain-Scala kernel and stays codegen'd") {
    val df = spark.range(1, 4096).select($"id".as("v"))
      .unionByName(Seq((1L << 31) - 3, 1L << 33, (1L << 52) + 7).toDF("v"))
    val got = df.selectExpr("v", "ln_micro(v) AS lm").collect()
    got.foreach { r =>
      assert(r.getLong(1) === FixedLnOps.lnMicro(r.getLong(0)), s"v=${r.getLong(0)}")
    }
    // codegen check on the union-free branch (a Union prints its codegen'd
    // children with the `*` prefix, not a WholeStageCodegen header line)
    val plan = spark.range(1, 100).selectExpr("ln_micro(id)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"ln_micro must not break codegen:\n$plan")
  }

  test("ln_micro fails loudly below 1") {
    val e = intercept[Exception] {
      spark.range(0, 1).selectExpr("ln_micro(id)").collect()
    }
    assert(e.getMessage != null)
  }
}
