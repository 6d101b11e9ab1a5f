package graft.queries

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}

/** EVERY registered query runs end-to-end over a corpus whose tables all
  * exist but hold ZERO rows — the first-run / new-tenant cold-start
  * shape (a fresh deployment points the engine at just-created empty
  * tables and dashboards fire every query before the first ingest).
  * DegenerateCorpusSweepSpec plants degenerate ROWS; this is the
  * degenerate TABLE: under Spark 4 ANSI mode an unguarded head() on an
  * empty aggregate, a require(nonEmpty) fixture guard, or an empty-topic
  * read would THROW — a green sweep proves every operator returns a
  * well-formed empty (or sentinel) answer instead.
  *
  * The sweep ENUMERATES SparkEntry.queries, so an operator added later
  * cannot skip it silently (the same breadth-gate contract as the
  * degenerate-rows sweep).
  */
class EmptyCorpusSweepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = graft.rawdata.Topic.tempDir("empty-corpus")
    def w(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$d/$t.parquet")

    // same column shapes as the driver testdata / the degenerate sweep,
    // zero rows everywhere
    w(Seq.empty[(Int, String)].toDF("r_regionkey", "r_name"), "region")
    w(Seq.empty[(Int, String, Int)]
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")
    w(Seq.empty[(Long, String, Int, Double, String)]
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"), "customer")
    w(Seq.empty[(Long, String, Int, Double)]
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")
    w(Seq.empty[(Long, String, String, String, Int, Double)]
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"), "part")
    w(Seq.empty[(Long, Long, String, Double, Timestamp, String)]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"), "orders")
    w(Seq.empty[(Long, Long, Long, Int, Double, Double, Double, Double, String, String, Timestamp)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate"), "lineitem")
    w(Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), "events")
    w(Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")
    w(Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label"), "embeddings")
    d
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives the all-tables-empty corpus") {
      assert(fn(spark, dir).count() >= 0)
    }
  }
}
