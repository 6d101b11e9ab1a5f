package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static helpers referenced from generated code (top-level object →
  * Java-visible static forwarders).
  */
object UlidOps {
  /** Big-endian 48-bit millisecond timestamp from a 16-byte ULID
    * (reference ULID layout — AvroRawdataProducer.java:44-50).
    */
  def timestampMs(id: Array[Byte]): Long = {
    var ts = 0L
    var i = 0
    while (i < 6 && i < id.length) { ts = (ts << 8) | (id(i) & 0xffL); i += 1 }
    ts
  }
}

/** Native Catalyst expression: ULID binary → epoch-ms long.
  *
  * The composed-builtins route (conv(substring(hex(id),1,12),16,10)) walks
  * the bytes through two string materializations per row; this expression
  * reads the 6 bytes directly and inlines into whole-stage codegen via a
  * static call — the (b)-tier extension point from SURVEY's design rules
  * (custom Expression before custom plan, builtins before both).
  */
case class UlidTimestampMs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ulid_ts_ms requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "ulid_ts_ms"

  override protected def nullSafeEval(input: Any): Any =
    UlidOps.timestampMs(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UlidOps.timestampMs($c)")

  override protected def withNewChildInternal(newChild: Expression): UlidTimestampMs =
    copy(child = newChild)
}

/** SparkSessionExtensions hook registering the engine's native functions
  * (enabled via spark.sql.extensions=graft.functions.GraftExtensions —
  * set by GraftSession.tune).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("ulid_ts_ms"),
      new ExpressionInfo(classOf[UlidTimestampMs].getName, "ulid_ts_ms"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"ulid_ts_ms expects 1 argument, got ${exprs.size}")
        UlidTimestampMs(exprs.head)
      }))
    // ln_micro(v) — deterministic integer ln(v)·10⁶ (see FixedLnOps)
    ext.injectFunction((
      FunctionIdentifier("ln_micro"),
      new ExpressionInfo(classOf[LnMicro].getName, "ln_micro"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"ln_micro expects 1 argument, got ${exprs.size}")
        LnMicro(exprs.head)
      }))
    // hyperplane_bands(q, tables, bits[, dims]) — SQL access to the native
    // LSH banding expression (tables/bits/dims must be literal ints)
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
      (exprs: Seq[Expression]) => {
        def intArg(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_bands: $what must be an integer literal, got $other")
        }
        exprs match {
          case Seq(q, t, b) => HyperplaneBands(q, intArg(t, "tables"), intArg(b, "bits"), 64)
          case Seq(q, t, b, d) => HyperplaneBands(q, intArg(t, "tables"), intArg(b, "bits"), intArg(d, "dims"))
          case _ => throw new IllegalArgumentException(
            s"hyperplane_bands expects (q, tables, bits[, dims]), got ${exprs.size} arguments")
        }
      }))
    // long_dot(a, b) — SQL access to the native exact int64 dot product
    ext.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(classOf[LongDot].getName, "long_dot"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 2)
          throw new IllegalArgumentException(s"long_dot expects 2 arguments, got ${exprs.size}")
        LongDot(exprs(0), exprs(1))
      }))
    // long_l2(a, b) — SQL access to the native exact squared distance
    ext.injectFunction((
      FunctionIdentifier("long_l2"),
      new ExpressionInfo(classOf[LongL2].getName, "long_l2"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 2)
          throw new IllegalArgumentException(s"long_l2 expects 2 arguments, got ${exprs.size}")
        LongL2(exprs(0), exprs(1))
      }))
    // quantize_vec(embedding) — SQL access to the native micro-unit
    // quantizer (array<float|double> → array<bigint>)
    ext.injectFunction((
      FunctionIdentifier("quantize_vec"),
      new ExpressionInfo(classOf[QuantizeVec].getName, "quantize_vec"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"quantize_vec expects 1 argument, got ${exprs.size}")
        QuantizeVec(exprs.head)
      }))
    // char_ngrams(text, n) — SQL access to the native linear-time
    // character n-gram extractor
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s, org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) =>
          CharNgrams(s, v)
        case _ => throw new IllegalArgumentException(
          s"char_ngrams expects (text, <int literal n>), got $exprs")
      }))
    // winnow_fps(text) — SQL access to the native winnowing fingerprint
    // kernel (rolling Karp-Rabin, min-per-window selection)
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"winnow_fps expects 1 argument, got ${exprs.size}")
        WinnowFps(exprs.head)
      }))
    // norm_fp(text) — SQL access to the native single-pass normalized
    // content fingerprint (lower + \s-collapse + trim + md5 in one scan)
    ext.injectFunction((
      FunctionIdentifier("norm_fp"),
      new ExpressionInfo(classOf[NormFp].getName, "norm_fp"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"norm_fp expects 1 argument, got ${exprs.size}")
        NormFp(exprs.head)
      }))
    // cdc_chunks(text) — SQL access to the native content-defined
    // chunking kernel (rolling Karp-Rabin, h % 64 == 0 boundary rule)
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"cdc_chunks expects 1 argument, got ${exprs.size}")
        CdcChunks(exprs.head)
      }))
    // phash32(text) — SQL access to the native single-pass perceptual
    // hash kernel (SimHash over 4-gram md5 values)
    ext.injectFunction((
      FunctionIdentifier("phash32"),
      new ExpressionInfo(classOf[Phash32].getName, "phash32"),
      (exprs: Seq[Expression]) => {
        if (exprs.size != 1)
          throw new IllegalArgumentException(s"phash32 expects 1 argument, got ${exprs.size}")
        Phash32(exprs.head)
      }))
    // optimizer rewrite: HOF dot-product/norm idioms → native LongDot
    ext.injectOptimizerRule(_ => NativeVectorRewrite)
  }
}
