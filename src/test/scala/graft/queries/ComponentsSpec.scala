package graft.queries

import graft.SparkSpec

/** The connected-components primitive under dd_cluster: pointer jumping
  * must converge within the round cap on topologies where plain
  * neighbor propagation cannot (a path needs diameter rounds; the jump
  * needs log).
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("a 200-node path converges within the round cap (pointer jumping)") {
    // call the distributed loop DIRECTLY: the dispatcher would route a
    // graph this small to the driver union-find fast path
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = DedupQueries.componentsByPropagation(edges)
      .as[(Long, Long, Long)].collect()
    assert(comp.length == 200)
    assert(comp.forall { case (_, cid, n) => cid == 0L && n == 200L },
      "every node of the path must reach the min label 0")
  }

  test("the driver fast path and the distributed loop agree (dispatcher threshold)") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L)).toDF("a", "b")
    val fast = DedupQueries.connectedComponents(edges)
      .as[(Long, Long, Long)].collect().toSet
    val loop = DedupQueries.componentsByPropagation(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(fast === loop)
    assert(fast.nonEmpty)
  }

  test("random graphs match a driver-side union-find (12 seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 30 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x
          else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.values.flatMap { members =>
          val label = members.min
          members.map(v => (v, label, members.size.toLong))
        }.toSet
        val got = DedupQueries.connectedComponents(edges.toDF("a", "b"))
          .as[(Long, Long, Long)].collect().toSet
        assert(got == expected, s"trial $trial (n=$n, m=${edges.size}) diverged from union-find")
        // every third trial also pins the DISTRIBUTED loop to the same
        // answer, so the dispatcher's fast path can't mask a loop bug
        if (trial % 3 == 0) {
          val viaLoop = DedupQueries.componentsByPropagation(edges.toDF("a", "b"))
            .as[(Long, Long, Long)].collect().toSet
          assert(viaLoop == expected, s"trial $trial: propagation loop diverged")
        }
      }
    }
  }

  test("disjoint components are labeled by their own minima") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (31L, 30L))
      .toDF("a", "b")
    val comp = DedupQueries.connectedComponents(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(comp == Set(
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L),
      (30L, 30L, 2L), (31L, 30L, 2L)))
  }
}
