package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

/** The materialized corpus token index (CorpusTokenIndex) must be
  * indistinguishable from the inline split+explode it replaced — same
  * rows including empty-token rows of empty documents — and its
  * bucketing + file sort must actually remove the exchange AND the sort
  * under a per-doc window.
  */
class TokenIndexSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("index tokens == inline posexplode(split) (multiset, all columns)") {
    val inline = t(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        posexplode(split(col("text"), " +")))
      .toDF("doc_id", "source", "lang", "pos", "tok")
    assert(rows(CorpusTokenIndex.tokens(spark, sf)) == rows(inline))
    assert(CorpusTokenIndex.tokens(spark, sf).count() > 0)
  }

  /** a per-doc window over the index must need neither exchange nor sort
    * (bucket distribution + one sorted file per bucket)
    */
  private def assertNoExchangeNoSort(toks: DataFrame): Unit = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val led = toks.select(col("doc_id"), col("pos"), col("tok"))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
    led.count() // finalize AQE
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case other => other +: other.children.flatMap(leaves)
    }
    val all = leaves(led.queryExecution.executedPlan)
    val windows = all.collect { case wx: WindowExec => wx }
    assert(windows.nonEmpty, s"expected a window exec:\n${led.queryExecution.executedPlan}")
    val shuffles = all.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"doc_id bucketing should satisfy the window distribution, found: $shuffles")
    val sorts = windows.flatMap(wx => leaves(wx).collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    })
    assert(sorts.isEmpty,
      s"one-file-per-bucket (doc_id, pos) sort order should satisfy the window sort, found: $sorts")
  }

  test("per-doc window over the index plans with no exchange and no sort") {
    assertNoExchangeNoSort(CorpusTokenIndex.tokens(spark, sf))
  }

  test("append extends the token index to exactly the union tokenization") {
    import spark.implicits._
    val all = t(spark, sf, "documents")
      .select($"doc_id", $"source", $"lang", $"text")
    val dir = graft.rawdata.Topic.tempDir("tok-append")
    all.filter($"doc_id" % 2 === 0).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    CorpusTokenIndex.ensure(spark, dir)
    CorpusTokenIndex.append(spark, dir, all.filter($"doc_id" % 2 === 1))
    val inline = all
      .select(col("doc_id"), col("source"), col("lang"),
        posexplode(split(col("text"), " +")))
      .toDF("doc_id", "source", "lang", "pos", "tok")
    assert(rows(CorpusTokenIndex.tokens(spark, dir)) == rows(inline),
      "appended token index diverged from the inline union tokenization")
    // compaction restores the one-sorted-file-per-bucket layout: rows
    // unchanged, per-doc windows sort-free again
    CorpusTokenIndex.compact(spark, dir)
    assert(rows(CorpusTokenIndex.tokens(spark, dir)) == rows(inline),
      "compaction changed the token rows")
    assertNoExchangeNoSort(CorpusTokenIndex.tokens(spark, dir))
    spark.catalog.clearCache()
  }

  test("grouped consumers over the index match their inline forms") {
    // txt_vocab and txt_hapax re-derived from raw text must equal the
    // index-backed query results (the oracle contract in miniature)
    val vocabInline = t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " +")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("tok"))
      .limit(50)
    assert(rows(TextQueries.queries("txt_vocab")(spark, sf)) == rows(vocabInline))
  }
}
