package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** SURVEY §2.D/E — deterministic sampling for training-data mixture
  * control: after cleaning/dedup, a pipeline decides HOW MUCH of each
  * stratum (language, source/domain) enters the training mix. Both
  * operators here are hash-deterministic (md5-derived), so the selection
  * is reproducible on any engine / partitioning — and oracle-checkable.
  *
  * Scale shapes:
  *  - samp_stratified: per-stratum counts are a tiny partial-agg
  *    (|strata| rows — broadcastable no matter the corpus size), then the
  *    sample itself is a NARROW filter: no per-stratum sort, no window,
  *    no shuffle of the corpus. This is the 100 TB shape — the exact-cap
  *    alternative (rank-per-stratum, keep rn ≤ cap) needs a full sort of
  *    every stratum and is deliberately not the default.
  *  - samp_token_budget: running token sum per source stream — the same
  *    per-stream window as txt_pack_bins; parallelism = #streams (salt
  *    the stream key to widen, as documented there).
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** expected docs kept per stratum (the "mixture target") */
  private val StratumTarget = 40L
  /** hash space: the top-8 md5 hex chars decode into [0, 2^32) */
  private val HashSpace = 4294967296L
  /** per-source token budget for samp_token_budget */
  private val TokenBudget = 4000L

  /** expected total docs kept by samp_temperature */
  private val TempTarget = 150L

  /** uniform-in-[0, 2^32) deterministic hash of the doc id */
  private def docHash = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")

  val queries: Map[String, Q] = Map(
    // stratified (per-language) rate sample toward ~StratumTarget docs
    // per stratum: keep doc iff hash < (target·2^32) div n_stratum.
    // Integer threshold (div, not floating /) so Spark and the oracle
    // agree exactly at every boundary. Strata at-or-under the target get
    // threshold ≥ 2^32 and keep everything.
    "samp_stratified" -> { (s, d) =>
      import s.implicits._
      val docs = t(s, d, "documents")
      // |strata| rows regardless of corpus size — always broadcastable
      val n = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      docs.select($"lang", $"doc_id", docHash.as("h"))
        .join(broadcast(n), Seq("lang"))
        .filter($"h" < expr(s"${StratumTarget * HashSpace} div n"))
        .select($"lang", $"doc_id")
        .orderBy($"lang", $"doc_id")
    },

    // temperature-based mixture reweighting (tau = 0.5): each source's
    // keep-rate is proportional to n^(tau-1), so small sources are
    // up-weighted relative to their share and large sources down-weighted
    // — the multilingual/multi-domain rebalancing rule (e.g. mT5's
    // alpha-scaled sampling). Expected total ≈ TempTarget docs. All
    // arithmetic is integer once each source's weight w = floor(sqrt(n)
    // * 1000) is taken: sqrt is IEEE-correctly-rounded on both engines
    // and the weight SUM is then exact/associative, so the per-source
    // hash threshold (T * 2^32 * w) div (sum_w * n) is bit-identical
    // everywhere. Scale shape: per-source counts are a tiny partial agg
    // (broadcastable at any corpus size), the selection itself a NARROW
    // hash filter — no sort, no corpus shuffle.
    "samp_temperature" -> { (s, d) =>
      import s.implicits._
      val docs = t(s, d, "documents")
      val n = docs.groupBy($"source").agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt($"n".cast("double")) * lit(1000.0)).cast("long"))
      val tot = n.agg(sum($"w").as("sw")) // single row
      docs.select($"source", $"doc_id", docHash.as("h"))
        .join(broadcast(n), Seq("source"))
        .join(broadcast(tot), lit(true))
        .filter($"h" < expr(s"($TempTarget * $HashSpace * w) div (sw * n)"))
        .select($"source", $"doc_id")
        .orderBy($"source", $"doc_id")
    },

    // per-source token-budget selection (domain mixing): docs enter the
    // mix in deterministic hash order until the source's token budget is
    // spent; the first doc of a stream is always taken so no stream
    // starves. Emits the selected docs themselves.
    "samp_token_budget" -> { (s, d) =>
      import s.implicits._
      val tk = t(s, d, "documents").select($"source", $"doc_id",
        size(split($"text", " +")).cast("long").as("n_tok"), docHash.as("h"))
      val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      tk.withColumn("cum_before", sum($"n_tok").over(w) - $"n_tok")
        .filter($"cum_before" < TokenBudget)
        .select($"source", $"doc_id", $"n_tok")
        .orderBy($"source", $"doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "samp_stratified" ->
      s"""WITH n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |h AS (
         |  SELECT lang, doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents)
         |SELECT h.lang, h.doc_id FROM h JOIN n ON n.lang = h.lang
         |WHERE h.h < ${StratumTarget * HashSpace} // n.n
         |ORDER BY h.lang, h.doc_id""".stripMargin,

    "samp_temperature" ->
      s"""WITH n AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000.0) AS BIGINT) AS w
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS sw FROM n),
         |h AS (
         |  SELECT source, doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents)
         |SELECT h.source, h.doc_id
         |FROM h JOIN n ON n.source = h.source, tot
         |WHERE h.h < ($TempTarget * $HashSpace * n.w) // (tot.sw * n.n)
         |ORDER BY h.source, h.doc_id""".stripMargin,

    "samp_token_budget" ->
      s"""WITH tk AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id) - n_tok AS cum_before
         |  FROM tk)
         |SELECT source, doc_id, n_tok FROM c WHERE cum_before < $TokenBudget
         |ORDER BY source, doc_id""".stripMargin
  )
}
