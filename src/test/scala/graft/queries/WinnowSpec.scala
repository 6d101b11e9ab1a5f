package graft.queries

import java.security.MessageDigest

import graft.{SparkSpec, SparkEntry}

/** dd_winnow checked against a from-scratch in-memory winnowing pass
  * over the collected sf0.001 corpus (MessageDigest + sliding-window
  * scan, no Spark and no SQL), plus the scheme's structural laws.
  */
class WinnowSpec extends SparkSpec {

  private val K = 8 // gram chars
  private val W = 4 // winnow window (grams)
  private val Shift = 1L << 22

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** the selected fingerprint set of one normalized doc */
  private def winnow(nt: String): Set[Long] = {
    if (nt.length < K) return Set.empty
    val hashes = (1 to nt.length - K + 1).map { pos =>
      val h = java.lang.Long.parseLong(md5hex(nt.substring(pos - 1, pos - 1 + K)).take(10), 16)
      h * Shift + (Shift - 1 - pos)
    }
    hashes.sliding(W).filter(_.size == W).map(w => w.min / Shift).toSet
  }

  test("dd_winnow matches a from-scratch in-memory winnowing recompute") {
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sigs = docs.map { case (id, text) =>
      id -> winnow(text.toLowerCase.replaceAll("\\s+", " ").trim)
    }.toMap

    val postings = sigs.toSeq.flatMap { case (id, fps) => fps.map(_ -> id) }
      .groupBy(_._1).map { case (fp, ds) => fp -> ds.map(_._2).sorted }
    val capped = postings.filter { case (_, ds) => ds.size >= 2 && ds.size <= 16 }
    val expected = capped.toSeq
      .flatMap { case (_, ds) => for (a <- ds; b <- ds if a < b) yield (a, b) }
      .groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.size.toLong) }.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }
      .take(30)

    val got = SparkEntry.queries("dd_winnow")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(got == expected, "pair profile diverges from the naive winnowing recompute")
    assert(got.nonEmpty, "the sf0.001 corpus has known near-duplicates")
  }

  test("winnowing guarantee: docs sharing a >= k+w-1 char substring share a fingerprint") {
    // the scheme's defining property, on synthetic strings through the
    // same in-memory reference: any common substring of length k+w-1
    // forces at least one common selected fingerprint
    val common = "the quick brown fox jumped over the lazy dog once more"
    val a = winnow("prefix one " + common + " suffix alpha")
    val b = winnow("another beginning " + common + " other ending")
    assert((a & b).nonEmpty, "shared substring must yield a shared fingerprint")

    // and two unrelated strings share nothing
    val c = winnow("completely unrelated content with different words entirely here")
    val d = winnow("zebra quartz vortex mingle jackdaws phlegm crwth syzygy qoph")
    assert((c & d).isEmpty)
  }
}
