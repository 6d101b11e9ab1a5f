package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("local[8]", 8)
    val names = if (args.nonEmpty) args.toSeq else Seq("q12_case_agg")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      println(s"== $n")
      df.show(50, false)
    }
    spark.stop()
  }
}
