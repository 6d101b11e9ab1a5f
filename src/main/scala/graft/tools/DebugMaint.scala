package graft.tools
import org.apache.spark.sql.functions._
object DebugMaint {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("local[8]", 8)
    import spark.implicits._
    val words = Vector("alpha","beta","gamma","delta","epsilon","zeta","eta","theta","iota","kappa","lambda","mu","nu","xi","omicron","pi","rho","sigma","tau","upsilon")
    val docX = words.mkString(" ")
    val docY = words.updated(10, "CHANGED").mkString(" ")
    val corpusDir = graft.rawdata.Topic.tempDir("dbg2-corpus")
    Seq((1L,"one two three four five six seven eight nine ten"),
        (2L,"red orange yellow green blue indigo violet black white gray"),
        (3L,"cat dog bird fish horse cow sheep goat pig hen"))
      .toDF("doc_id","text").write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    graft.queries.CorpusLshIndex.ensure(spark, corpusDir)
    val streamDir = graft.rawdata.Topic.tempDir("dbg2-stream")
    val schema = Seq((0L,"")).toDF("doc_id","text").schema
    Seq((100L,docX)).toDF("doc_id","text").coalesce(1).write.mode("append").parquet(streamDir)
    val q = graft.streaming.CleanStream.indexMaintainingNearDup(
      spark.readStream.schema(schema).parquet(streamDir), corpusDir) { f =>
      println("batch flags: " + f.collect().mkString(","))
    }
    q.processAllAvailable()
    println("after b1: jac=" + graft.queries.CorpusLshIndex.jaccard(spark, corpusDir).count()
      + " sh=" + graft.queries.CorpusLshIndex.shingles(spark, corpusDir).count())
    Seq((200L,docY)).toDF("doc_id","text").coalesce(1).write.mode("append").parquet(streamDir)
    q.processAllAvailable()
    q.stop()
    graft.queries.CorpusLshIndex.refresh(spark, corpusDir)
    println("after b2: jac=" + graft.queries.CorpusLshIndex.jaccard(spark, corpusDir).count()
      + " sh=" + graft.queries.CorpusLshIndex.shingles(spark, corpusDir).count())
    graft.queries.CorpusLshIndex.jaccard(spark, corpusDir).show(5, false)
    spark.stop()
  }
}
