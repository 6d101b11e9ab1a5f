package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Amplified-scale probe: build a deterministic ~sf1 corpus from sf0.1 and
  * measure how the headline queries and the three materialized index
  * builds scale — the cheapest way to catch super-linear curvature
  * (quadratic candidate generation, index-build blowup, per-round loop
  * cost) one decade before a real cluster does.
  *
  * Amplification = `amp` key-offset copies of every fact table, with
  * CONTENT perturbed so cross-copy similarity structure stays realistic:
  *
  *  - every key (order/part/supp/cust/doc/vec/event/user) shifts by
  *    i·2^32 per copy — joins stay key-consistent within a copy and the
  *    copies never collide;
  *  - document copy i > 0 prefixes every token with `z{i}`, so its
  *    shingles/minhash/bands share NOTHING with other copies — the LSH
  *    candidate-pair mass scales ×amp (linear), never ×amp² (which
  *    identical copies would produce and no real corpus does);
  *  - embedding copy i > 0 adds a deterministic per-copy offset vector
  *    (hash(i, dim)-derived, magnitude ≫ unit vectors), decorrelating
  *    hyperplane signatures across copies for the same reason;
  *  - region/nation stay fixed (dimensions don't grow with corpus size).
  *
  * Every transform is a narrow map (no Date.now / Random — the output is
  * a pure function of the source tables), so the amplified corpus itself
  * is reproducible across runs and machines.
  */
object ScaleProbe {

  val KeyOffset: Long = 1L << 32

  private def off(i: Int) = lit(i.toLong * KeyOffset)

  /** write `amp` perturbed copies of every table under `dest` (same
    * layout as the driver testdata dirs, so every query runs unchanged)
    */
  def amplify(spark: SparkSession, src: String, dest: String, amp: Int): Unit = {
    def write(df: DataFrame, table: String): Unit =
      df.write.mode("overwrite").parquet(s"$dest/$table.parquet")
    def amplified(table: String)(perturb: (DataFrame, Int) => DataFrame): Unit = {
      val base =
        if (table == "events") Tables.events(spark, src)
        else Tables.t(spark, src, table)
      write((0 until amp).map(i => perturb(base, i)).reduce(_ unionByName _), table)
    }
    write(Tables.t(spark, src, "region"), "region")
    write(Tables.t(spark, src, "nation"), "nation")
    amplified("customer") { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + off(i))
    }
    amplified("supplier") { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + off(i))
    }
    amplified("part") { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + off(i))
    }
    amplified("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + off(i))
        .withColumn("o_custkey", col("o_custkey") + off(i))
    }
    amplified("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + off(i))
        .withColumn("l_partkey", col("l_partkey") + off(i))
        .withColumn("l_suppkey", col("l_suppkey") + off(i))
    }
    amplified("events") { (df, i) =>
      df.withColumn("event_id", col("event_id") + off(i))
        .withColumn("user_id", col("user_id") + off(i))
    }
    amplified("documents") { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("doc_id", col("doc_id") + off(i))
        .withColumn("text",
          array_join(transform(split(col("text"), " +"),
            x => concat(lit(s"z$i"), x)), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    amplified("embeddings") { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("vec_id", col("vec_id") + off(i))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> " +
            s"CAST(x + ((pmod(hash($i, j), 1000) - 500) / 500.0) * 1.5 AS FLOAT))"))
    }
  }

  /** Probe result: stage timings, per-query seconds, linearity ratios
    * (t_amp / (amp · t_base)) and the flagged super-linear query names.
    */
  final case class Result(
      amp: Int,
      amplifySec: Double,
      topicIngestSec: Double,
      indexSec: Seq[(String, Double)],
      queries: Seq[(String, Double)],
      ratios: Seq[(String, Double)],
      flagged: Seq[String],
      truncated: Boolean)

  /** Run the probe: amplify into `dest`, rebuild the topic + the three
    * corpus indexes against the amplified corpus (timed per index), then
    * a single timed pass of the headline queries. `budgetSec` caps total
    * probe wall time — if a stage overruns it, later stages are skipped
    * and the result is marked truncated (a truncated probe still reports
    * every timing it took, which is exactly the curvature evidence).
    */
  def run(
      spark: SparkSession,
      src: String,
      dest: String,
      amp: Int,
      headline: Seq[String],
      baseline: Map[String, Double],
      budgetSec: Double = 900.0): Result = {
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    def timed(body: => Unit): Double = {
      val s = System.nanoTime()
      body
      (System.nanoTime() - s) / 1e9
    }
    // self-contained run: a stale dest from an earlier probe would let
    // the topic-ingest stage (and any index table left by another JVM)
    // report near-zero — delete first so every stage pays its real cost
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(dest))
    graft.rawdata.EventsAsTopic.invalidate(dest)
    val amplifySec = timed(amplify(spark, src, dest, amp))
    val topicSec = timed(graft.rawdata.EventsAsTopic.topicDir(spark, dest): Unit)
    val indexStages: Seq[(String, () => Unit)] = Seq(
      "lsh" -> (() => graft.queries.CorpusLshIndex.ensure(spark, dest)),
      "embed" -> (() => graft.queries.CorpusLshIndex.embedPairs(spark, dest).count(): Unit),
      "token" -> (() => graft.queries.CorpusTokenIndex.ensure(spark, dest)),
      "graph" -> (() => graft.queries.CoPurchaseGraph.ensure(spark, dest)),
      "ivf" -> (() => graft.queries.EmbIvfIndex.ensure(spark, dest)))
    var truncated = false
    val indexSec = indexStages.flatMap { case (name, body) =>
      if (elapsed > budgetSec) { truncated = true; None }
      else Some(name -> timed(body()))
    }
    val queries = headline.flatMap { name =>
      if (elapsed > budgetSec) { truncated = true; None }
      else SparkEntry.queries.get(name).map { fn =>
        spark.catalog.clearCache()
        name -> timed(fn(spark, dest).count(): Unit)
      }
    }
    val ratios = queries.flatMap { case (name, sec) =>
      baseline.get(name).filter(_ > 0.05).map { base =>
        name -> sec / (amp * base)
      }
    }
    // super-linear flag: meaningfully slower than amp × its sf0.1 time
    // AND big enough that fixed per-query overhead isn't the explanation
    val flagged = ratios.collect {
      case (name, r) if r > 1.5 && queries.toMap.apply(name) > 2.0 => name
    }
    Result(amp, amplifySec, topicSec, indexSec, queries, ratios, flagged, truncated)
  }
}
