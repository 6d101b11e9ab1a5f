package graft.queries

/** Plain-Scala reference of the batched+layered BPE trainer — the
  * executable spec both CurationOpsSpec (31-word corpus) and
  * BpeVocabScaleSpec (~1500-word corpus) compare the registered
  * operator against. Mirrors CurationQueries: per round, weighted pair
  * counts over the distinct-word multiset, then up to BpeLayers peeling
  * passes of the mutual-best (locally-maximal symbol-disjoint) rule —
  * each pass over the pairs whose symbols no earlier pass touched —
  * top-BpeBatch of the union by (count desc, lex), applied greedily
  * left-to-right in rank order.
  */
object BpeReference {

  /** (a, b, pair_n) per learned merge, in global rank order. `minPair`
    * defaults to the operator's min-support floor; BpeVocabScaleSpec
    * passes 1 to prove the floor changes nothing on the fixtures.
    */
  def merges(toks: Seq[String],
             minPair: Long = CurationQueries.BpeMinPair): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      toks.groupBy(identity).map { case (t, g) => t.map(_.toString).toVector -> g.length.toLong }
    def rank(p: ((String, String), Long)): (Long, String, String) = (-p._2, p._1._1, p._1._2)
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 1
    var dry = false
    while (round <= CurationQueries.BpeRounds && !dry) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, n) <- words; i <- 0 until w.length - 1) pc((w(i), w(i + 1))) += n
      var rem = pc.toMap.filter(_._2 >= minPair)
      val sel = Seq.newBuilder[((String, String), Long)]
      for (_ <- 1 to CurationQueries.BpeLayers) {
        val bySym = scala.collection.mutable.Map.empty[String, ((String, String), Long)]
        for (p <- rem; s <- Set(p._1._1, p._1._2))
          if (!bySym.contains(s) ||
              Ordering[(Long, String, String)].lt(rank(p), rank(bySym(s)))) bySym(s) = p
        val layer = rem.toSeq
          .filter { case p@((a, b), _) => Set(a, b).forall(s => bySym(s) == p) }
        sel ++= layer
        val used = layer.flatMap { case ((a, b), _) => Seq(a, b) }.toSet
        rem = rem.filter { case ((a, b), _) => !used(a) && !used(b) }
      }
      val top = sel.result().sortBy(rank).take(CurationQueries.BpeBatch)
      dry = top.isEmpty
      for (((a, b), _) <- top) {
        words = words.toSeq.map { case (w, wn) =>
          val nw = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == a && w(i + 1) == b) { nw += a + b; i += 2 }
            else { nw += w(i); i += 1 }
          }
          (nw.result(), wn)
        }.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
      }
      out ++= top.map { case ((a, b), n) => (a, b, n) }
      round += 1
    }
    out.result()
  }
}
