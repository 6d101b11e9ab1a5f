package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Partitioning-invariance gate: a plan that is correct at 100 TB must
  * produce the SAME result no matter how the data is split across tasks.
  * Every operator here is engineered for that (integer-exact math,
  * deterministic hashes, total tie-breaks), so re-running a
  * representative query from each shuffle-bearing family under a
  * different shuffle partitioning must give byte-identical rows. A
  * failure means some expression depends on partition layout (float
  * summation order, first()/head without ordering, RNG) — exactly the
  * class of bug that passes a single-config oracle check and corrupts a
  * cluster run.
  */
class DeterminismSpec extends SparkSpec {

  // one per family: agg, join, window/session, explode-agg, LSH chain,
  // iterative fixpoint, sampling threshold, Lloyd rounds, argmin top-k,
  // PQ encode+ADC — plus the round-5 shapes: candidate-verify
  // (containment), estimator agreement, JL projection, window-lead
  // phrase build, bigram-LM scoring join, shard permutation
  private val names = Seq(
    "q1_agg", "q3_join_agg", "ev_session", "txt_vocab", "dd_minhash",
    "dd_cluster", "samp_temperature", "emb_kmeans", "emb_outliers",
    "ann_pq_topk",
    "dd_containment", "dd_minhash_est", "emb_rp", "txt_phrases",
    "txt_bigram_lm", "samp_shuffle",
    "dd_segment", "emb_quantize", "txt_bpe", "txt_bpe_encode",
    "samp_mixture", "emb_sim_hist",
    "q32_grouping_sets", "ev_attribution", "ev_markov", "emb_gram",
    "samp_curriculum", "txt_hapax", "emb_pca1", "dd_prefix", "mm_phash_pairs",
    "dd_canonical", "dd_jaccard_hist", "emb_centroid_cos",
    "txt_skipgrams", "ev_trend", "emb_dim_stats", "txt_pmi", "dd_leakage",
    "pipe_report", "txt_cms", "samp_pareto", "ev_funnel_steps",
    "dd_dup_rate", "ev_hourly",
    // round-6 late additions: RFM fixed-threshold scoring, bloom
    // position screening, md5 fold assignment, BFS min-dist rounds,
    // recall join of the two top-k pipelines
    "ev_rfm", "dd_bloom", "samp_hash_split", "q42_reach", "ann_recall_eval",
    "ev_fill", "q43_pct_dist",
    // round-7 additions: jaccard neighbor model + anti-join scoring,
    // greedy MMR pick trajectory, hash-threshold quality sampler,
    // two-level prefix-sum coverage curve
    "q44_item_sim", "q45_recs", "emb_mmr", "samp_quality", "txt_coverage",
    "q46_kcore")

  for (name <- names) {
    test(s"$name result invariant under repartitioning") {
      val fn = SparkEntry.queries(name)
      def run(): Seq[String] = fn(spark, sf).collect().map(_.toString).toSeq.sorted
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      val base = run()
      spark.catalog.clearCache()
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val alt = run()
        assert(alt == base, s"$name result changed under shuffle.partitions=3")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.catalog.clearCache()
      }
    }
  }
}
