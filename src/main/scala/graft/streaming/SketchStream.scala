package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming mergeable-sketch gates.
  *
  * The HLL register table is the canonical streaming-native state: each
  * register is a MAX over a hash stream — monotone, commutative,
  * idempotent — so a distinct-count estimate over an unbounded topic
  * tail needs ONE streaming aggregation with 64 conditional MAX
  * registers (the simhash 32-conditional-sums trick applied to
  * sketches), never a distinct shuffle or unbounded key state. Spark
  * disallows chained streaming aggregations, which is exactly why the
  * registers live in one row per group (64 columns) instead of 64 rows:
  * the estimate is then a STATELESS projection after the agg.
  *
  * The hash recipe (md5-derived bucket + integer-chain rho) is shared
  * with the batch q34_hll_sketch operator, so the streaming estimate on
  * a drained topic equals the batch estimate on the same rows exactly —
  * StreamSketchSpec asserts that equality, plus the monotone-merge law
  * (estimate of a union ≥ estimate of each part, register-wise max).
  */
object SketchStream {

  private val M = 64

  /** `1 + leading-zero-count` of the 32-bit md5-derived probe — the same
    * integer comparison chain as the batch q34 (no floating log)
    */
  private def rhoExpr(value: Column): Column = {
    val w = s"CAST(conv(substring(md5(CAST(__hll_v AS STRING)), 9, 8), 16, 10) AS BIGINT)"
    val cases = (1 to 32).map(r => s"WHEN $w >= ${1L << (32 - r)} THEN $r")
      .mkString("CASE ", " ", " ELSE 33 END")
    expr(cases)
  }

  /** Streaming HLL distinct estimate per group: input can be a streaming
    * OR batch relation with `groupCol` and `valueCol`; output one row
    * per group (group, hll_est) — on a stream use outputMode
    * update/complete (the registers only ever grow).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val staged = df.select(
      col(groupCol).as("g"),
      col(valueCol).as("__hll_v"))
      .withColumn("bucket",
        expr("CAST(conv(substring(md5(CAST(__hll_v AS STRING)), 1, 8), 16, 10) AS BIGINT) % 64"))
      .withColumn("rho", rhoExpr(col("__hll_v")))
    val regs = (0 until M).map(b =>
      max(when(col("bucket") === b, col("rho"))).as(s"r$b"))
    val denom = (0 until M).map(b =>
      coalesce(expr(s"power(2.0, -r$b)"), lit(1.0))).reduce(_ + _)
    staged.groupBy(col("g"))
      .agg(regs.head, regs.tail: _*)
      .select(col("g"),
        floor(lit(0.709) * lit(M) * lit(M) / denom + lit(0.5)).cast("long").as("hll_est"))
  }

  /** the raw register row per group (r0..r63) — exposed so the merge law
    * (register-wise max) is testable and so callers can persist the
    * sketch state itself
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val staged = df.select(
      col(groupCol).as("g"),
      col(valueCol).as("__hll_v"))
      .withColumn("bucket",
        expr("CAST(conv(substring(md5(CAST(__hll_v AS STRING)), 1, 8), 16, 10) AS BIGINT) % 64"))
      .withColumn("rho", rhoExpr(col("__hll_v")))
    val regs = (0 until M).map(b =>
      max(when(col("bucket") === b, col("rho"))).as(s"r$b"))
    staged.groupBy(col("g")).agg(regs.head, regs.tail: _*)
  }
}
