package graft.tools

/** Dev tool: `runMain graft.tools.Probe [explain] <query>...` — show
  * results (default) or the formatted physical plan for SparkEntry queries
  * at sf0.01.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("local[8]", 8)
    val (mode, names) = args.toSeq match {
      case "explain" +: rest => ("explain", rest)
      case rest if rest.nonEmpty => ("show", rest)
      case _ => ("show", Seq("q1_agg"))
    }
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      println(s"== $n")
      if (mode == "explain") df.explain("formatted") else df.show(50, false)
    }
    spark.stop()
  }
}
