package graft.tools

/** Dev tool: `runMain graft.tools.Probe [explain|time <sfDir>] <query>...`
  * — show results (default), the formatted physical plan, or isolated
  * cold/warm timings (cache cleared before each run) for SparkEntry
  * queries. show/explain run at sf0.01; time runs at the given dir on
  * local[32] to match Bench.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val (mode, dir, names) = args.toSeq match {
      case "explain" +: rest => ("explain", "/root/testdata/sf0.01", rest)
      case "time" +: d +: rest => ("time", d, rest)
      case rest if rest.nonEmpty => ("show", "/root/testdata/sf0.01", rest)
      case _ => ("show", "/root/testdata/sf0.01", Seq("q1_agg"))
    }
    val spark = if (mode == "time") graft.GraftSession() else graft.GraftSession("local[8]", 8)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"== $n")
      mode match {
        case "explain" => df.explain("formatted")
        case "show" => df.show(50, false)
        case "time" =>
          for (i <- 1 to 2) {
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            val cnt = graft.SparkEntry.queries(n)(spark, dir).count()
            println(f"  run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
          }
      }
    }
    spark.stop()
  }
}
