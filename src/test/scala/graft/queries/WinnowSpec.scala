package graft.queries



import graft.{SparkSpec, SparkEntry}

/** dd_winnow checked against a from-scratch in-memory winnowing pass
  * over the collected sf0.001 corpus (plain-Scala Horner hashing +
  * sliding-window scan, no Spark and no SQL), plus the scheme's
  * structural laws.
  */
class WinnowSpec extends SparkSpec {

  private val K = 8 // gram code points
  private val W = 4 // winnow window (grams)
  private val Shift = 1L << 22
  private val B = 257L
  private val M = 1099511627689L // 2^40 - 87, prime

  /** the selected fingerprint set of one normalized doc — direct Horner
    * per position (the kernel rolls; polynomial value mod M is the same)
    */
  private def winnow(nt: String): Set[Long] = {
    val cp = nt.codePoints.toArray
    if (cp.length < K) return Set.empty
    val hashes = (1 to cp.length - K + 1).map { pos =>
      var h = 0L
      for (j <- 0 until K) h = (h * B + cp(pos - 1 + j)) % M
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
