package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: phase timings for the dd_cluster pipeline at a given sf
  * dir — separates edge-build cost (the jaccard chain) from the
  * components fixpoint loop.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession()
    import s.implicits._
    def tick[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.t(s, d, "documents")
    val fp = docs.select($"doc_id",
      graft.queries.DedupQueries.normFpCol($"text").as("fp"))
    val keep = fp.groupBy($"fp").agg(min($"doc_id").as("keep"))
    val exactE = fp.join(keep, Seq("fp")).filter($"doc_id" =!= $"keep")
      .select($"keep".as("a"), $"doc_id".as("b"))
    val nearE = graft.SparkEntry.queries("dd_jaccard")(s, d)
      .filter($"jaccard_ppm" >= 400000)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    val edges = tick("edge build")(
      exactE.unionByName(nearE).localCheckpoint(true))
    val comp = tick("components fixpoint")(
      graft.queries.DedupQueries.connectedComponents(edges))
    tick("final count")(println(s"  rows: ${comp.count()}"))
    s.stop()
  }
}
