package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: phase timings for the dd_cluster fixpoint loop at a given
  * sf dir — locates where wall-clock goes (edge build vs per-round).
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
      md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp"))
    val keep = fp.groupBy($"fp").agg(min($"doc_id").as("keep"))
    val exactE = fp.join(keep, Seq("fp")).filter($"doc_id" =!= $"keep")
      .select($"keep".as("a"), $"doc_id".as("b"))
    val nearE = graft.SparkEntry.queries("dd_jaccard")(s, d)
      .filter($"jaccard_ppm" >= 400000)
      .select($"doc_a".as("a"), $"doc_b".as("b"))
    val edges = exactE.unionByName(nearE).localCheckpoint(true)
    val sym = edges.unionByName(edges.select($"b".as("a"), $"a".as("b")))
      .distinct().repartition(col("a")).persist()
    tick("edge build")(sym.count())
    var labels = sym.select($"a".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("cluster")).localCheckpoint(true)
    var checksum = tick("labels init")(
      labels.agg(coalesce(sum($"cluster"), lit(0L))).head().getLong(0))
    var converged = false
    var rounds = 0
    while (!converged && rounds < 25) {
      val next = labels.join(sym, $"doc_id" === $"a")
        .select($"b".as("doc_id"), $"cluster")
        .unionByName(labels)
        .groupBy($"doc_id").agg(min($"cluster").as("cluster"))
        .localCheckpoint(true)
      val c2 = tick(s"round $rounds")(
        next.agg(coalesce(sum($"cluster"), lit(0L))).head().getLong(0))
      labels = next
      converged = c2 == checksum
      checksum = c2
      rounds += 1
    }
    println(s"  rounds: $rounds")
    tick("sym recount 1")(sym.count())
    tick("sym recount 2")(sym.count())
    tick("labels recount 1")(labels.count())
    tick("labels recount 2")(labels.count())
    val sizes = labels.groupBy($"cluster").agg(count(lit(1)).as("n_members"))
    tick("final join")(labels.join(sizes, Seq("cluster"))
      .select($"doc_id", $"cluster".as("cluster_id"), $"n_members")
      .orderBy($"doc_id").count())
    s.stop()
  }
}
