package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels referenced from generated code. */
object TextOps {

  /** All overlapping character n-grams of `s`, in order — the exact
    * value set of the SQL idiom
    * `transform(sequence(1, char_length(s) - (n-1)), i -> substring(s, i, n))`
    * (empty when char_length < n), but ONE linear pass over the UTF-8
    * bytes with a ring buffer of char-start offsets instead of an
    * interpreted lambda with an O(chars) substring scan per position.
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val numBytes = bytes.length
    val starts = new Array[Int](n + 1)
    val out = new java.util.ArrayList[Any]
    var count = 0
    var i = 0
    while (i < numBytes) {
      starts(count % (n + 1)) = i
      count += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
      if (count >= n) {
        val st = starts((count - n) % (n + 1))
        out.add(UTF8String.fromBytes(bytes, st, i - st))
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native Catalyst expression: string → array of its overlapping
  * character n-grams. Replaces the interpreted
  * `transform(sequence(...), i -> substring(text, i, n))` HOF at the
  * base of the character-profile queries (Spark higher-order functions
  * are CodegenFallback — per-element interpreted lambda calls, and the
  * inner substring re-scans from the string start each position, making
  * the idiom O(chars²)); this is one generated call into a linear
  * kernel. Bit-equal with the HOF form on the full corpus (TextExprSpec).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"char_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.charNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}
