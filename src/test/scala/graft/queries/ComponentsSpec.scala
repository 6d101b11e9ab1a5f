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
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = DedupQueries.connectedComponents(edges)
      .as[(Long, Long, Long)].collect()
    assert(comp.length == 200)
    assert(comp.forall { case (_, cid, n) => cid == 0L && n == 200L },
      "every node of the path must reach the min label 0")
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
