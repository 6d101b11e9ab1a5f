package graft.queries

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.TextOps

/** Laws of the content-defined chunking kernel (TextOps.cdcChunks) that
  * dd_cdc's storage-dedup claim rests on.
  */
class CdcSpec extends SparkSpec {

  private def chunks(s: String): Seq[String] = {
    val arr = TextOps.cdcChunks(UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  // deterministic LCG text: high gram diversity so the 1/64 boundary
  // rate actually materializes (a repetitive string has few distinct
  // grams and can legally produce zero boundaries)
  private val base: String = {
    var x = 12345L
    val sb = new StringBuilder
    (1 to 4000).foreach { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      val v = ((x >>> 33) % 27).toInt
      sb.append(if (v == 26) ' ' else ('a' + v).toChar)
    }
    sb.toString
  }

  test("chunks concatenate back to the input (lossless partition)") {
    assert(chunks(base).mkString === base)
    assert(chunks("exactly8").mkString === "exactly8")
  }

  test("string shorter than the gram size has no chunks (caller filters)") {
    assert(chunks("short").isEmpty)
  }

  test("boundary locality: an edit only re-chunks its neighborhood") {
    // prepend a prefix — every chunk whose content lies beyond the
    // first boundary after the edit must survive identically (the
    // content-defined property; a fixed-width chunker would shift every
    // boundary and share nothing)
    val edited = "INSERTED-PREFIX " + base
    val a = chunks(base).toSet
    val b = chunks(edited).toSet
    val shared = a.intersect(b)
    assert(shared.nonEmpty, "no chunk survived a prefix edit")
    // everything after the first re-synchronized boundary is shared:
    // at most 2 chunks of the original may differ (the head up to the
    // first boundary, plus the boundary-straddling neighbor)
    assert((a -- b).size <= 2, s"prefix edit disturbed ${(a -- b).size} chunks")
  }

  test("suffix edits disturb at most the final chunk region") {
    // append at the END: every chunk before the last original boundary
    // must survive identically (the mirror of the prefix-locality law)
    val edited = base + " APPENDED-SUFFIX"
    val a = chunks(base)
    val b = chunks(edited)
    assert(a.dropRight(1) === b.take(a.size - 1),
      "a suffix edit must leave every fully-closed chunk untouched")
  }

  test("expected chunk length tracks the 1/64 boundary rate") {
    val cs = chunks(base)
    val mean = cs.map(_.length).sum.toDouble / cs.size
    assert(mean > 16 && mean < 256, s"mean chunk length $mean out of range")
  }

  test("dd_cdc query: per-source conservation and savings bounds") {
    val rows = graft.SparkEntry.queries("dd_cdc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nChunks, nDistinct) = (r.getLong(1), r.getLong(2))
      val (total, distinct, saved) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nDistinct <= nChunks)
      assert(distinct <= total)
      assert(saved >= 0 && saved < 1000000)
    }
  }
}
