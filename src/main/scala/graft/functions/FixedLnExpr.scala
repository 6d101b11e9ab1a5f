package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic fixed-point natural log in integer micro-units —
  * ln(v)·10⁶ for BIGINT v ≥ 1 computed with 64-bit integer arithmetic
  * only (zero libm calls), so Spark and the DuckDB oracle produce
  * BIT-IDENTICAL values by construction instead of relying on two libm
  * implementations agreeing to the last ulp (the txt_zipf caveat this
  * closes; FixedLnSql generates the oracle-side twin of the same
  * algorithm).
  *
  * Algorithm (all steps exact integer ops):
  *   1. e = ⌊log₂ v⌋ by a binary-search shift walk;
  *   2. m = v normalized into [2³⁰, 2³¹) — left-shift exact for
  *      e ≤ 30, right-shift truncation (< 2⁻³⁰ relative) above;
  *   3. 20 squaring steps extract 20 fractional bits of log₂:
  *      m ← m²/2³⁰, emitting a bit per step (m stays in [2³⁰, 2³¹),
  *      so m² < 2⁶² never overflows);
  *   4. ln_micro = (log₂_fixed · C) / 2²⁶ with C = round(ln2·10⁶·2⁶)
  *      = 44361420 — the widest constant whose product with the max
  *      log₂_fixed (63·2²⁰) stays far under 2⁶³.
  *
  * Accuracy: ≤ ~2 micro-units absolute vs true ln (quantization of the
  * 20 fractional bits dominates); determinism is exact — any engine
  * running these integer steps yields the same 64-bit value.
  */
object FixedLnOps {

  /** fractional log₂ bits extracted per value */
  val FracBits = 20

  /** round(ln2 · 10⁶ · 2⁶) — converts 2²⁰-scaled log₂ to micro-nats */
  val Ln2MicroC = 44361420L

  def lnMicro(v: Long): Long = {
    if (v < 1)
      throw new IllegalArgumentException(s"ln_micro requires v >= 1, got $v")
    var e = 0
    var w = v
    while (w >= 2L) { w >>= 1; e += 1 }
    var m = if (e <= 30) v << (30 - e) else v >> (e - 30)
    var f = 0L
    var k = 0
    while (k < FracBits) {
      val t = (m * m) >> 30
      if (t >= (1L << 31)) { f = f * 2 + 1; m = t >> 1 }
      else { f = f * 2; m = t }
      k += 1
    }
    ((e.toLong << FracBits) + f) * Ln2MicroC >> 26
  }
}

/** Native Catalyst expression: BIGINT ≥ 1 → ln(v)·10⁶ as BIGINT, exact
  * integer algorithm (see [[FixedLnOps]]). Inlines into whole-stage
  * codegen via a static call; v < 1 fails LOUDLY (the engine's
  * no-garbage rule for native kernels).
  */
case class LnMicro(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ln_micro requires BIGINT input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "ln_micro"

  override protected def nullSafeEval(input: Any): Any =
    FixedLnOps.lnMicro(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedLnOps.lnMicro($c)")

  override protected def withNewChildInternal(newChild: Expression): LnMicro =
    copy(child = newChild)
}
