package graft.rawdata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ULID column helpers.
  *
  * A ULID is 16 bytes: 48-bit big-endian millisecond timestamp followed by
  * 80 bits of entropy (reference: AvroRawdataProducer.java:44-50 stores it
  * as an Avro fixed(16) named "ulid"). All helpers below are composed from
  * codegen'd built-in expressions — no UDFs — so they inline into
  * whole-stage codegen and never break predicate pushdown on surrounding
  * operators.
  */
object Ulid {

  /** Lowercase 32-char hex form. Lexicographic order on this string equals
    * unsigned byte order on the ULID (fixed width), which is the stream
    * order of the reference.
    */
  def hexOf(id: Column): Column = lower(hex(id))

  /** Milliseconds since epoch from the first 6 bytes — the native
    * codegen'd expression (graft.functions.UlidTimestampMs). The
    * expression is constructed directly into the Column (not resolved
    * by name through the function registry), so it works in ANY session —
    * including pre-existing sessions that never saw
    * spark.sql.extensions=GraftExtensions. SQL-text users still get the
    * registered `ulid_ts_ms` when the extensions are installed.
    */
  def timestampMs(id: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.UlidTimestampMs(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(id)))

  /** builtin-composed equivalent (kept for sessions without the graft
    * extensions; UlidExprSpec asserts equality with the native form)
    */
  def timestampMsComposed(id: Column): Column =
    conv(substring(hexOf(id), 1, 12), 16, 10).cast("long")

  /** 10-byte entropy tail as hex. */
  def entropyHex(id: Column): Column = substring(hexOf(id), 13, 20)

  /** Deterministic ULID from a timestamp and a seed column: entropy is the
    * first 10 bytes of md5(seed). Used to give replayed/batch data stable,
    * reproducible ids (a distributed producer cannot hand out the
    * reference's per-producer monotonic entropy without coordination; a
    * content-derived ULID is the scale-safe equivalent — ids are unique per
    * seed and ordering within a millisecond is stable).
    */
  def deterministic(tsMs: Column, seed: Column): Column =
    unhex(concat(lpad(hex(tsMs), 12, "0"), substring(md5(seed.cast("string")), 1, 20)))
}
