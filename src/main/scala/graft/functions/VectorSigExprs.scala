package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Static kernel referenced from generated code (top-level object →
  * Java-visible static forwarders).
  */
object VectorSigOps {

  /** Per-table hyperplane sign bands of a quantized vector: band t packs
    * `bits` sign bits (bit k = 1 iff q · planes[t·bits+k] > 0).
    */
  def bands(q: ArrayData, planes: Array[Array[Int]], tables: Int, bits: Int): ArrayData = {
    val out = new Array[Long](tables)
    val nq = q.numElements()
    var t = 0
    while (t < tables) {
      var band = 0L
      var k = 0
      while (k < bits) {
        val p = planes(t * bits + k)
        val n = if (nq < p.length) nq else p.length
        var dot = 0L
        var i = 0
        while (i < n) { dot += q.getLong(i) * p(i); i += 1 }
        if (dot > 0) band |= (1L << k)
        k += 1
      }
      out(t) = band
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  private def nullElement(fn: String, i: Int): Nothing =
    throw new NullPointerException(
      s"$fn: null element at index $i — vector columns must have non-null " +
        "elements (the embeddings contract); filter or impute nulls first")

  /** float-array → micro-unit quantization, floor(x·1e6 + 0.5) per
    * element — same IEEE double arithmetic as the SQL
    * `CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)`.
    * A null element fails LOUDLY (the earlier kernel quantized the null
    * slot's raw garbage — silent divergence from the SQL twin); the
    * check is one predictable bit test per element.
    */
  def quantizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElement("quantize_vec", i)
      out(i) = math.floor(a.getFloat(i).toDouble * 1000000.0 + 0.5).toLong
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** double-array variant of [[quantizeF]] */
  def quantizeD(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) nullElement("quantize_vec", i)
      out(i) = math.floor(a.getDouble(i) * 1000000.0 + 0.5).toLong
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Exact int64 dot product of two quantized vectors (equal-length by
    * construction; defensively bounded by the shorter one). No per-slot
    * null checks — LongDot routes here only when BOTH input types prove
    * containsNull=false (QuantizeVec output always does).
    */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Exact int64 squared euclidean distance of two quantized vectors —
    * the distance twin of [[dot]] (same no-check contract: only reached
    * when both input types prove containsNull=false).
    */
  def l2(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** null-checking twin of [[l2]] */
  def l2Checked(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement("long_l2", i)
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** null-checking twin of [[dot]] for inputs whose TYPE admits null
    * elements (user-supplied `long_dot` calls) — loud failure instead of
    * reading a null slot's garbage
    */
  def dotChecked(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement("long_dot", i)
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}

/** Native Catalyst expression: quantized vector (array<long>) → the
  * `tables` hyperplane-LSH band values used by dd_embed_lsh /
  * ann_lsh_topk.
  *
  * The higher-order-function formulation (aggregate over zip_with inside
  * transform) evaluates ~tables·bits·dims interpreted lambda calls per
  * row; this expression runs the same arithmetic as one tight generated
  * loop with the deterministic plane matrix attached as a codegen
  * reference object — the (b)-tier extension point from SURVEY's design
  * rules. Plane recipe identical to VectorOps.hyperplanes (md5-derived),
  * so results are bit-equal with the HOF form (asserted in
  * VectorSigSpec).
  */
case class HyperplaneBands(child: Expression, tables: Int, bits: Int, dims: Int)
    extends UnaryExpression {

  require(bits <= 63, s"a band packs at most 63 bits, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires ARRAY<BIGINT> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  @transient private lazy val planes: Array[Array[Int]] =
    graft.operators.VectorOps.hyperplanes(tables * bits, dims)

  override protected def nullSafeEval(input: Any): Any =
    VectorSigOps.bands(input.asInstanceOf[ArrayData], planes, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorSigOps.bands($c, $planesRef, $tables, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** Native Catalyst expression: exact int64 dot product of two quantized
  * vectors (array<long> · array<long> → long) — the inner loop of every
  * exact-similarity verify and brute-force ANN scan.
  *
  * The HOF form (`aggregate(zip_with(a, b, (x, y) -> x*y), 0L, ...)`)
  * allocates the zipped intermediate array and pays 2·dims interpreted
  * lambda calls per row (both HOFs are CodegenFallback); this runs one
  * tight generated loop with no allocation. Bit-equal with the HOF form
  * for equal-length inputs (asserted in VectorSigSpec).
  */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"long_dot requires two ARRAY<BIGINT> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  /** kernel choice is a TYPE-level decision: the tight no-check loop only
    * when both inputs prove containsNull=false (QuantizeVec output), the
    * null-checking twin otherwise — a null slot fails loudly either way,
    * never reads garbage
    */
  private def kernel: String = (left.dataType, right.dataType) match {
    case (ArrayType(_, false), ArrayType(_, false)) => "dot"
    case _ => "dotChecked"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (kernel == "dot") VectorSigOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorSigOps.dotChecked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorSigOps.$kernel($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: exact int64 squared euclidean distance of
  * two quantized vectors — [[LongDot]]'s distance twin (the k-means /
  * PQ assignment kernel), same kernel-choice-by-type contract.
  */
case class LongL2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"long_l2 requires two ARRAY<BIGINT> inputs, got ${l.catalogString}, ${r.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_l2"

  private def kernel: String = (left.dataType, right.dataType) match {
    case (ArrayType(_, false), ArrayType(_, false)) => "l2"
    case _ => "l2Checked"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (kernel == "l2") VectorSigOps.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorSigOps.l2Checked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorSigOps.$kernel($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongL2 =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: embedding (array<float> or array<double>)
  * → micro-unit quantized vector (array<long>), floor(x·1e6 + 0.5) per
  * element. Replaces the interpreted `transform(...)` HOF at the base of
  * every embedding scan; bit-equal with the SQL form on the non-null
  * domain (VectorSigSpec). A null ELEMENT violates the embeddings
  * contract and fails loudly in the kernel (never a silent garbage
  * quantization), so the declared containsNull=false output is honest.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec requires ARRAY<FLOAT|DOUBLE> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_vec"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    if (isFloat) VectorSigOps.quantizeF(input.asInstanceOf[ArrayData])
    else VectorSigOps.quantizeD(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (isFloat) "quantizeF" else "quantizeD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorSigOps.$kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}
