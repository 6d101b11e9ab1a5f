package graft.queries

import graft.{SparkSpec, SparkEntry}

/** q47_labelprop checked against an independent in-memory recompute of
  * the same 2-round synchronous LPA on the collected sf0.001 edge list —
  * a from-scratch reimplementation (mutable maps, no Spark), so a shared
  * bug in the DataFrame formulation and its SQL oracle can't hide.
  */
class LabelPropSpec extends SparkSpec {

  test("q47_labelprop matches a from-scratch in-memory LPA and partitions the node set") {
    val spark2 = spark
    import spark2.implicits._

    val sym = CoPurchaseGraph.symEdges(spark, sf)
      .select("u", "v").as[(Long, Long)].collect()
    val nodes = sym.map(_._1).distinct.sorted

    // naive synchronous LPA: argmax neighbor label, tie -> smallest label
    var lbl: Map[Long, Long] = nodes.map(x => x -> x).toMap
    val nbrs = sym.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    for (_ <- 1 to 2) {
      lbl = nodes.map { x =>
        val counts = nbrs(x).groupBy(lbl).map { case (l, os) => l -> os.size }
        val (bestLbl, _) = counts.toSeq.minBy { case (l, c) => (-c, l) }
        x -> bestLbl
      }.toMap
    }
    val expected = lbl.values.groupBy(identity)
      .map { case (c, ms) => c -> ms.size.toLong }.toSeq
      .sortBy { case (c, n) => (-n, c) }
      .take(20)

    val got = SparkEntry.queries("q47_labelprop")(spark, sf)
      .select("community", "n_members").as[(Long, Long)].collect().toSeq
    assert(got == expected, "community size profile diverges from the naive recompute")

    // top-20 of a partition: sizes can't exceed the node count in total
    assert(got.map(_._2).sum <= nodes.length.toLong)
    assert(got.nonEmpty)
  }

  test("q47_labelprop is run-to-run deterministic") {
    val r1 = SparkEntry.queries("q47_labelprop")(spark, sf).collect().toSeq
    val r2 = SparkEntry.queries("q47_labelprop")(spark, sf).collect().toSeq
    assert(r1 == r2)
  }

  test("q48_modularity matches an in-memory Newman-Q recompute of the LPA partition") {
    val spark2 = spark
    import spark2.implicits._

    val edges = CoPurchaseGraph.edges(spark, sf)
      .select("u", "v").as[(Long, Long)].collect()
    val sym = edges ++ edges.map(_.swap)
    val nodes = sym.map(_._1).distinct.sorted
    var lbl: Map[Long, Long] = nodes.map(x => x -> x).toMap
    val nbrs = sym.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    for (_ <- 1 to 2) {
      lbl = nodes.map { x =>
        val counts = nbrs(x).groupBy(lbl).map { case (l, os) => l -> os.size }
        x -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val m = edges.length.toLong
    val deg = sym.groupBy(_._1).map { case (x, es) => x -> es.length.toLong }
    val expected = lbl.groupBy(_._2).map { case (c, ms) =>
      val members = ms.keys.toSet
      val intra = edges.count { case (u, v) => lbl(u) == c && lbl(v) == c }.toLong
      val ds = members.toSeq.map(deg).sum
      val intraPpm = intra * 1000000L / m
      val degPpm = (BigInt(ds) * ds * 1000000 / (BigInt(m) * m * 4)).toLong
      (c, members.size.toLong, intra, ds, intraPpm, degPpm, intraPpm - degPpm)
    }.toSeq.sortBy { case (c, n, _, _, _, _, _) => (-n, c) }.take(20)

    val got = SparkEntry.queries("q48_modularity")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, "modularity table diverges from the naive recompute")

    // sanity: total Q of a sane 2-round LPA partition on this graph is
    // a finite ppm value strictly between -1e6 and 1e6
    val q = got.map(_._7).sum
    assert(q > -1000000L && q < 1000000L)
  }
}
