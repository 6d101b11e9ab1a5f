package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels referenced from generated code. */
object TextOps {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789abcdef".getBytes

  /** Normalized-exact content fingerprint — value-equal with the SQL
    * idiom `md5(trim(regexp_replace(lower(s), '\\s+', ' ')))` (the
    * dd_exact_norm / dd_exact_cross grouping key), but ONE pass over
    * the UTF-8 bytes instead of four full-string passes with a regex
    * engine in the middle. Java's `\\s` is the six ASCII whitespace
    * chars (never multi-byte, never a UTF-8 continuation byte), so the
    * collapse-and-trim runs safely at the byte level after the same
    * Unicode lowercasing Spark's `lower` performs; the digest streams
    * through a thread-local MD5 with no intermediate string.
    */
  def normFp(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val out = new Array[Byte](bytes.length)
    var o = 0
    var pendingSep = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == 32 || b == 9 || b == 10 || b == 11 || b == 12 || b == 13
      if (isWs) {
        if (o > 0) pendingSep = true // leading runs vanish (trim), inner runs pend
      } else {
        if (pendingSep) { out(o) = 32; o += 1; pendingSep = false }
        out(o) = b
        o += 1
      }
      i += 1
    } // a trailing run is never flushed — trim's other half
    val md = md5Local.get()
    md.reset()
    md.update(out, 0, o)
    val dig = md.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((dig(j) >> 4) & 0xF)
      hex(2 * j + 1) = HexDigits(dig(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

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

  /** Distinct winnowing fingerprints (k=8-gram Karp-Rabin hashes, min
    * per w=4 window, tie → rightmost) of an already-normalized string,
    * in one linear pass. The hash is the polynomial
    * Σ c_j·257^(k-1-j) mod (2⁴⁰−87) over CODE POINTS — pure integer
    * arithmetic, so the DuckDB oracle replays it with ord()+Horner and
    * the values match bit-for-bit (md5-per-gram computed the same
    * selection 5× slower; the rolling update makes each position O(1)).
    * Tie-break rides the same packed key as before: h·2²² + (2²²−1−pos)
    * compares (min hash, max pos) in one BIGINT; Math.floorDiv unpacks
    * it with the oracle's floor-division semantics. Strings shorter
    * than k+w−1 = 11 code points have no full window → empty result.
    */
  def winnowFps(s: UTF8String): ArrayData = {
    val K = 8; val W = 4; val B = 257L; val M = 1099511627689L; val Shift = 1L << 22
    val cp = s.toString.codePoints.toArray
    val n = cp.length
    if (n < K + W - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - K + 1
    var bTop = 1L // 257^(K-1) mod M
    var j = 1
    while (j < K) { bTop = bTop * B % M; j += 1 }
    val keys = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + cp(i)) % M; i += 1 }
    keys(0) = h * Shift + (Shift - 1 - 1)
    var p = 1
    while (p < nGrams) {
      h = ((h - cp(p - 1) * bTop % M) % M + M) % M
      h = (h * B + cp(p + K - 1)) % M
      keys(p) = h * Shift + (Shift - 1 - (p + 1))
      p += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]
    var w0 = 0
    while (w0 + W <= nGrams) {
      var mn = keys(w0)
      var t = 1
      while (t < W) { if (keys(w0 + t) < mn) mn = keys(w0 + t); t += 1 }
      sel.add(Math.floorDiv(mn, Shift))
      w0 += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  /** Content-defined chunks of an already-normalized string (the
    * LBFS/rsync/restic boundary rule): cut after code point p wherever
    * the k=8-gram Karp-Rabin hash STARTING at 1-based position p
    * satisfies h ≡ 0 (mod 64) — the same polynomial as [[winnowFps]]
    * (Σ c_j·257^(k-1-j) mod 2⁴⁰−87 over code points), so the DuckDB
    * oracle replays the boundary set with ord()+Horner bit-for-bit.
    * Expected chunk length ≈ 64 code points; a string with no boundary
    * is one chunk; strings shorter than k have no gram and are the
    * CALLER's job to filter (mirroring the length-≥-8 predicate both
    * engines apply). One linear pass, no per-gram strings.
    */
  def cdcChunks(s: UTF8String): ArrayData = {
    val K = 8; val B = 257L; val M = 1099511627689L; val Mask = 64L
    val cp = s.toString.codePoints.toArray
    val n = cp.length
    if (n < K) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - K + 1
    var bTop = 1L
    var j = 1
    while (j < K) { bTop = bTop * B % M; j += 1 }
    val out = new java.util.ArrayList[Any]
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + cp(i)) % M; i += 1 }
    var prev = 0
    var p = 0 // 0-based gram start; boundary cuts after code point p+1 (1-based pos)
    if (h % Mask == 0L) { out.add(UTF8String.fromString(new String(cp, prev, 1 - prev))); prev = 1 }
    p = 1
    while (p < nGrams) {
      h = ((h - cp(p - 1) * bTop % M) % M + M) % M
      h = (h * B + cp(p + K - 1)) % M
      if (h % Mask == 0L) {
        out.add(UTF8String.fromString(new String(cp, prev, p + 1 - prev)))
        prev = p + 1
      }
      p += 1
    }
    out.add(UTF8String.fromString(new String(cp, prev, n - prev)))
    new GenericArrayData(out.toArray)
  }

  /** 32-bit perceptual hash of a string (the SimHash-over-4-grams recipe
    * the mm_phash family and the streaming phash gate share): per
    * overlapping 4-char-gram, v = the first 4 md5 bytes as an unsigned
    * int (definitionally `conv(substring(md5(g), 1, 8), 16, 10)`); bit b
    * of the hash is set iff more than half the grams have bit b set
    * (sum(±1) > 0 — order-independent, so this single pass is
    * bit-identical to the grouped-aggregation SQL form, PhashKernelSpec).
    * Strings shorter than 4 chars return 0 — callers filter them, as the
    * SQL form's empty gram array does implicitly. One MessageDigest
    * reused across grams; the 32 counters live in one int array instead
    * of 32 interpreted HOF passes over a per-row gram array. Grams are
    * CODE-POINT 4-grams (Spark's substring/length and the DuckDB oracle's
    * substr are code-point based) — iterating UTF-16 chars would shift
    * gram boundaries and split surrogate pairs on any non-BMP input.
    */
  def phash32(s: UTF8String): Long = {
    val cp = s.toString.codePoints.toArray
    val n = cp.length
    if (n < 4) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](32)
    var i = 0
    while (i + 4 <= n) {
      val g = new String(cp, i, 4)
      md.reset()
      val dig = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((v >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) h |= 1L << b
      b += 1
    }
    h
  }
}

/** Native Catalyst expression: string → 32-bit perceptual hash
  * (TextOps.phash32 — one generated call into the single-pass kernel).
  * Replaces the explode + grouped ±1 bit-sum aggregation (batch) and the
  * 32 interpreted filter passes (stream) with row-local math — the
  * signature never needs a shuffle, which is also what makes the
  * streaming gate stateless.
  */
case class Phash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phash32 requires a STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "phash32"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.phash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.phash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Phash32 =
    copy(child = newChild)
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

/** Native Catalyst expression: normalized string → array<bigint> of its
  * distinct winnowing fingerprints (TextOps.winnowFps — one generated
  * call into the linear rolling-hash kernel). The whole selection stays
  * inside the row that carries the text: no per-gram strings, no md5,
  * no window operator (the shape dd_winnow and the streaming winnow
  * gate share).
  */
case class WinnowFps(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.winnowFps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.winnowFps($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** Native Catalyst expression: normalized string → array<string> of its
  * content-defined chunks (TextOps.cdcChunks — one generated call into
  * the linear rolling-hash kernel). Boundary selection is a pure
  * function of content, so insert/delete edits only re-chunk the
  * neighborhood of the edit — the property the storage-dedup estimator
  * dd_cdc measures.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires a STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.cdcChunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.cdcChunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** Native Catalyst expression: string → 32-hex normalized-exact content
  * fingerprint (TextOps.normFp — one generated call into the
  * single-pass kernel). Replaces the lower → regexp_replace → trim →
  * md5 chain (four full-string passes, one through a regex engine) at
  * the base of every exact-dedup relation; value-equal with the chain
  * on the full corpus and the whitespace/Unicode edges (TextExprSpec).
  */
case class NormFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_fp requires a STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "norm_fp"

  override protected def nullSafeEval(input: Any): Any =
    TextOps.normFp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.normFp($c)")

  override protected def withNewChildInternal(newChild: Expression): NormFp =
    copy(child = newChild)
}
