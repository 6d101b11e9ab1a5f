package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time a comma-separated list of registered
  * queries (cache cleared between runs, two passes each, min reported) at
  * an arbitrary sf dir. Usage:
  *
  *   sbt "runMain graft.Prof dd_winnow,txt_bpe /root/testdata/sf0.1"
  *
  * Pass `--explain` as the third arg to also print the formatted plan.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () } // warmup
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"[prof] $n%-24s ${times.map(_._1).min}%.2f s  (passes ${times.map(t => f"${t._1}%.2f").mkString("/")}, rows ${times.head._2})")
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
