package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** output shards for samp_shuffle */
  private val NShards = 8L
  /** docs-worth of data each source contributes after samp_upsample */
  private val UpsampleTarget = 120L

  /** docs kept per source by samp_curriculum */
  private val CurriculumK = 20L

  /** samp_systematic: target picks, and the FIXED shard count that
    * bounds the offset relation no matter the corpus size */
  private val SysK = 100L
  private val SysShards = 1024L

  /** samp_priority: sample size k (τ comes from the (k+1)-th priority) */
  private val PriorityK = 48

  /** uniform-in-[0, 2^32) deterministic hash of the doc id — shared with
    * the streaming mixture gate (CleanStream.mixtureGate) so stream and
    * batch select the same documents
    */
  private[graft] def docHash = hashOf(col("doc_id"))

  /** the same hash over an arbitrary id column (the leakage audit applies
    * it to both endpoints of materialized candidate pairs)
    */
  private[graft] def hashOf(id: Column) =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** the hash space size, for external threshold arithmetic */
  private[graft] def hashSpace: Long = HashSpace

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

    // temperature-sweep mixture design table — samp_temperature samples
    // at ONE τ; this lays out the (τ, source) weight matrix for
    // τ ∈ {½, ¾, 1} so the flattening-vs-fidelity trade is read off a
    // table before committing a mixture. τ is restricted to dyadic
    // exponents computable from IEEE sqrt alone (n^¾ = √(n·√n) — sqrt
    // and multiply are correctly rounded on both engines, pow(x, 0.7)
    // is not), so the floor milli weights replay exactly. Scale shape:
    // one |sources| profile agg, a 3-way explode, share windows over
    // the 3·|sources| relation.
    "samp_temp_sweep" -> { (s, d) =>
      import s.implicits._
      val n = t(s, d, "documents").groupBy($"source").agg(count(lit(1)).as("n"))
      n.select($"source", $"n", explode(expr(
          """array(
            |  named_struct('tau_milli', 500L,
            |    'w', CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000.0) AS BIGINT)),
            |  named_struct('tau_milli', 750L,
            |    'w', CAST(floor(sqrt(CAST(n AS DOUBLE) * sqrt(CAST(n AS DOUBLE))) * 1000.0) AS BIGINT)),
            |  named_struct('tau_milli', 1000L, 'w', n * 1000))""".stripMargin)).as("x"))
        .select($"x.tau_milli".as("tau_milli"), $"source",
          $"n".as("n_docs"), $"x.w".as("w"))
        .withColumn("t", sum($"w").over(Window.partitionBy($"tau_milli")))
        .select($"tau_milli", $"source", $"n_docs", $"w",
          expr("(w * 1000000) div t").as("share_ppm"))
        .orderBy($"tau_milli", $"source")
    },

    // doc-share vs token-share skew per source — the unit-mismatch
    // audit behind every doc-sampled mixture (a source with many SHORT
    // docs is over-represented by doc-level sampling and under-
    // represented in tokens; the signed gap says which way each source
    // distorts and by how much): exact ppm shares on both axes + the
    // signed difference. Scale shape: one narrow token-count partial
    // agg, |sources|-row profile, bounded share windows.
    "samp_share_skew" -> { (s, d) =>
      import s.implicits._
      val wAll = Window.partitionBy(lit(1))
      t(s, d, "documents")
        .select($"source", size(split($"text", " +")).cast("long").as("n_tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
        .withColumn("td", sum($"n_docs").over(wAll))
        .withColumn("tt", sum($"n_tokens").over(wAll))
        .select($"source", $"n_docs", $"n_tokens",
          expr("(n_docs * 1000000) div td").as("doc_share_ppm"),
          expr("(n_tokens * 1000000) div tt").as("tok_share_ppm"))
        .withColumn("skew_ppm", $"tok_share_ppm" - $"doc_share_ppm")
        .orderBy($"source")
    },

    // uniform-rebalance plan (the ACTION samp_mixture's data card asks
    // for): per source, the exact milli up/down-sampling factor that
    // would bring every source to the uniform token allocation
    // total div |sources| — factor > 1000 means upsample (repeat
    // epochs), < 1000 means downsample; the floor keeps Σ alloc ≤
    // total so the plan never overcommits the budget. |sources|-row
    // relation after one narrow token-count partial agg; both windows
    // run over that tiny profile.
    "samp_rebalance" -> { (s, d) =>
      import s.implicits._
      val prof = t(s, d, "documents")
        .select($"source", size(split($"text", " +")).cast("long").as("n_tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      val wAll = Window.partitionBy(lit(1))
      prof
        .withColumn("alloc_tokens", expr(
          "sum(n_tokens) over (partition by 1) div count(1) over (partition by 1)"))
        .withColumn("factor_milli", expr("(alloc_tokens * 1000) div n_tokens"))
        .select($"source", $"n_docs", $"n_tokens", $"alloc_tokens", $"factor_milli")
        .orderBy($"source")
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
    },

    // deterministic global shuffle into training shards: the dataloader
    // order for an epoch. Shard = hash mod NShards, position within the
    // shard = rank by (hash, doc_id) — so the order is reproducible on
    // any engine/partitioning and uncorrelated with ingest order. Scale
    // shape: shard assignment is a NARROW hash; the within-shard
    // ordering is a per-shard sort whose parallelism = #shards — at
    // 100 TB you run thousands of shards, each a few GB, and each shard
    // sorts independently (no global sort, no single-reducer stage).
    "samp_shuffle" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
      t(s, d, "documents")
        .select($"doc_id", docHash.as("h"))
        .withColumn("shard", ($"h" % NShards).cast("long"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select($"shard", $"pos", $"doc_id")
        .orderBy($"shard", $"pos")
    },

    // fractional-epoch mixture upsampling: every source contributes
    // ~UpsampleTarget docs-worth of data per epoch, so a source with
    // n docs repeats each doc UpsampleTarget/n times. The factor is
    // held as integer MILLI-epochs: every doc gets (milli div 1000)
    // base copies, and the fractional remainder selects a deterministic
    // hash-slice of docs for one extra copy — e.g. 1.2 epochs = 1 copy
    // for everyone + a 20% slice doubled. Factors below 1.0 degrade to
    // pure downsampling (0 base copies, fractional slice kept). One row
    // per COPY (explode) with the copy index — the dataloader's actual
    // input. Scale shape: per-source counts are a tiny broadcastable
    // agg; copy assignment is a narrow filter + bounded explode (output
    // size = Σ milli/1000 · n = #sources · UpsampleTarget, independent
    // of skew).
    "samp_upsample" -> { (s, d) =>
      import s.implicits._
      val docs = t(s, d, "documents")
      val n = docs.groupBy($"source").agg(count(lit(1)).as("n"))
        .withColumn("milli", expr(s"(${UpsampleTarget} * 1000) div n"))
      docs.select($"source", $"doc_id", docHash.as("h"))
        .join(broadcast(n), Seq("source"))
        .withColumn("copies",
          (expr("milli div 1000") +
            when($"h" < expr(s"(milli % 1000) * $HashSpace div 1000"), 1L)
              .otherwise(0L)).cast("long"))
        .filter($"copies" > 0)
        .select($"source", $"doc_id", $"copies",
          explode(expr("sequence(1L, copies)")).as("copy"))
        .orderBy($"source", $"doc_id", $"copy")
    },

    // heavy-tail concentration audit (the data-governance "pareto"
    // check): what share of each source's token mass sits in its top
    // decile of docs by length — a 90%+ share means a handful of mega
    // docs dominate the mixture and per-doc sampling rates are
    // misleading. NTILE ties are pinned by (n_tok DESC, doc_id), so the
    // decile assignment is deterministic on both engines. Scale shape:
    // per-source window (parallelism = sources) over (doc, n_tok) pairs
    // — text never enters the shuffle.
    "samp_pareto" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"n_tok".desc, $"doc_id")
      t(s, d, "documents")
        .select($"source", $"doc_id", size(split($"text", " +")).cast("long").as("n_tok"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tokens"),
          sum(when($"decile" === 1L, $"n_tok").otherwise(0L)).as("top_decile_tokens"))
        .withColumn("share_ppm", expr("(top_decile_tokens * 1000000) div n_tokens"))
        .orderBy($"source")
    },

    // curriculum / quality selection: the K highest-quality docs per
    // source under the SHARED quality score (TextQueries.qualityScored —
    // stream, batch and curriculum all grade identically), deterministic
    // doc_id tie-break. Scale shape: the window partitions by source, so
    // this is a per-stratum top-K — parallelism = #sources and no global
    // sort; for a skewed mega-source, pre-filter on a score threshold
    // from samp_mixture's profile before ranking.
    "samp_curriculum" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"quality_ppm".desc, $"doc_id")
      TextQueries.qualityScored(t(s, d, "documents"))
        .select($"doc_id", $"source",
          floor($"score" * lit(1000000.0) + lit(0.5)).cast("long").as("quality_ppm"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= CurriculumK)
        .orderBy($"source", $"rnk")
    },

    // weighted SYSTEMATIC sampling (the classic PPS design): lay every
    // doc's weight (n_chars) end to end in doc_id order and take one
    // pick at every multiple of step = total/K — a doc straddling m
    // multiples enters the sample m times (probability-proportional-to-
    // size, no RNG, engine-exact). The interesting part at scale is the
    // GLOBAL cumulative sum with no global window over the corpus: a
    // two-phase prefix sum — shard by a monotone doc_id range split
    // (≤ NumShards shards by construction, whatever the corpus size),
    // per-shard partial sums roll into shard offsets via a window over
    // the ≤ NumShards-row sums relation, and a per-shard window adds the
    // local prefix. Selection is then a narrow filter. This is how a
    // 100 TB engine materializes epoch sampling plans.
    "samp_systematic" -> { (s, d) =>
      import s.implicits._
      val docs = t(s, d, "documents")
        .select($"doc_id", $"n_chars".cast("long").as("w"))
      // single-row bounds+total: the only all-reduce, broadcast to all
      val bounds = docs.agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"),
        sum($"w").as("tw"))
      val sharded = docs.join(broadcast(bounds), lit(true))
        .withColumn("span", expr(s"(hi - lo + $SysShards) div $SysShards"))
        .withColumn("shard", expr("(doc_id - lo) div span"))
      val wOff = Window.orderBy($"shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = sharded.groupBy($"shard").agg(sum($"w").as("sw"))
        .withColumn("off", coalesce(sum($"sw").over(wOff), lit(0L)))
        .select($"shard", $"off")
      val wLoc = Window.partitionBy($"shard").orderBy($"doc_id")
      sharded
        .withColumn("loc", sum($"w").over(wLoc) - $"w")
        .join(broadcast(offs), Seq("shard"))
        .withColumn("cum", $"off" + $"loc")
        .withColumn("step", greatest(lit(1L), expr(s"tw div $SysK")))
        .withColumn("n_picks", expr("(cum + w) div step - cum div step"))
        .filter($"n_picks" > 0)
        .select($"doc_id", $"w", $"n_picks")
        .orderBy($"doc_id")
    },

    // effective sample size of the temperature-weighted mixture — the
    // diversity cost of re-weighting sources. Each doc's mix weight is
    // u_s = w_s/(sw·n_s) (w = samp_temperature's source weight), so
    // ESS = (Σu)²/Σu², the classic importance-sampling diagnostic: N
    // when the mix is uniform, collapsing toward the dominant source's
    // size as weights skew. All-integer: u in nano units via floor div,
    // the final square in DECIMAL(38,0) (txt_pmi's exact-arithmetic
    // pattern — int64 would overflow at Σu ≈ 1e9 squared). Scale shape:
    // ONE tiny per-source agg touches the corpus; everything after is
    // |sources| rows.
    "samp_ess" -> { (s, d) =>
      import s.implicits._
      val n = t(s, d, "documents").groupBy($"source")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt($"n_docs".cast("double")) * lit(1000.0)).cast("long"))
      val tot = n.agg(sum($"w").as("sw"), sum($"n_docs").as("n_total"))
      val per = n.crossJoin(broadcast(tot))
        .withColumn("mix_share_ppm", expr("(w * 1000000) div sw"))
        .withColumn("doc_weight_nano", expr("(w * 1000000000) div (sw * n_docs)"))
      val g = per.agg(
          sum($"n_docs" * $"doc_weight_nano").as("s1"),
          sum($"n_docs" * $"doc_weight_nano" * $"doc_weight_nano").as("s2"))
        .withColumn("ess_milli",
          expr("CAST((CAST(s1 AS DECIMAL(38,0)) * s1 * 1000) div s2 AS BIGINT)"))
      per.crossJoin(broadcast(g.select($"ess_milli")))
        .withColumn("ess_ratio_ppm", expr("(ess_milli * 1000) div n_total"))
        .select($"source", $"n_docs", $"mix_share_ppm", $"doc_weight_nano",
          $"ess_milli", $"ess_ratio_ppm")
        .orderBy($"source")
    },

    // deterministic train/val/test hash split + leakage-proof audit —
    // the assignment every training pipeline needs to be REPRODUCIBLE:
    // split = md5-bucket of the doc id (900/50/50 per mille), so any
    // engine / any rerun / any shard count lands every doc in the same
    // fold (no rand(), no row_number order dependence). The audit is
    // one narrow per-row bucket computation + a (source, split) partial
    // agg; per-source share ppm comes from a broadcast-sized per-source
    // total join. Fold-balance law (each source's train share within
    // tolerance of 900k ppm) asserted in ClusterSamplingSpec.
    "samp_hash_split" -> { (s, d) =>
      import s.implicits._
      val b = expr(
        "CAST(conv(substring(md5(concat('split:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000")
      val g = t(s, d, "documents")
        .withColumn("split",
          when(b < 900, "train").when(b < 950, "val").otherwise("test"))
        .withColumn("n_tok", size(split($"text", " +")).cast("long"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      val tot = g.groupBy($"source").agg(sum($"n_docs").as("t_docs"))
      g.join(tot, Seq("source"))
        .select($"source", $"split", $"n_docs", $"n_tokens",
          expr("(n_docs * 1000000) div t_docs").as("doc_share_ppm"))
        .orderBy($"source", $"split")
    },

    // deterministic 5-fold cross-validation manifest (the ablation /
    // held-out-eval twin of samp_hash_split): fold = md5 hash of the
    // doc id mod 5, so the assignment is a pure row-local function —
    // reproducible on any engine, any shard count, any rerun, and
    // folds are disjoint-and-exhaustive BY CONSTRUCTION. Output is the
    // per-(source, fold) doc/token mass with each fold's ppm share of
    // its source. Scale shape: one narrow hash projection + a partial
    // agg onto the |sources|×5 key space.
    "samp_kfold" -> { (s, d) =>
      import s.implicits._
      val g = t(s, d, "documents")
        .withColumn("fold", expr(
          "CAST(conv(substring(md5(concat('fold:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 5"))
        .withColumn("n_tok", size(split($"text", " +")).cast("long"))
        .groupBy($"source", $"fold")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      val tot = g.groupBy($"source").agg(sum($"n_docs").as("t_docs"))
      g.join(tot, Seq("source"))
        .select($"source", $"fold", $"n_docs", $"n_tokens",
          expr("(n_docs * 1000000) div t_docs").as("doc_share_ppm"))
        .orderBy($"source", $"fold")
    },

    // QUALITY-WEIGHTED sampling — acceptance probability proportional to
    // the doc's blended quality score (the CCNet-style "keep good text
    // preferentially" gate): keep iff hash·2·10⁶ < quality_ppm·2³².
    // Acceptance = quality/2 exactly (a perfect-quality doc keeps with
    // p=0.5, junk with p≈0), decided per row by the same deterministic
    // md5 hash as every sampler here — reproducible on any engine, any
    // shard count, any rerun. Integer overflow bound: h < 2³², h·2e6 <
    // 2³²·2e6 ≈ 8.6e15 — safely inside int64 at any corpus size, because
    // neither side grows with the data. Scale shape: the score + hash +
    // verdict are ONE narrow pass over documents; the report is a
    // |sources|-row partial agg. Per-doc verdict recount, determinism and
    // the corpus-wide mean-quality lift of the kept set are the laws
    // RecSimSpec asserts.
    "samp_quality" -> { (s, d) =>
      import s.implicits._
      def ppm(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0) + lit(0.5)).cast("long")
      val scored = graft.queries.TextQueries.qualityScored(t(s, d, "documents"))
        .select($"doc_id", $"source", ppm($"score").as("q_ppm"))
        .withColumn("h", docHash)
        .withColumn("keep", ($"h" * lit(2000000L)) < ($"q_ppm" * lit(HashSpace)))
      scored.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
          sum($"q_ppm").as("sq_all"),
          sum(when($"keep", $"q_ppm").otherwise(0L)).as("sq_kept"))
        .select($"source", $"n_docs", $"n_kept",
          expr("(n_kept * 1000000) div n_docs").as("kept_share_ppm"),
          expr("sq_all div n_docs").as("mean_q_all_ppm"),
          expr("sq_kept div greatest(1L, n_kept)").as("mean_q_kept_ppm"))
        .orderBy($"source")
    },

    // source × quality-band composition grid — the data-card table
    // behind samp_quality's one-number lift (WHICH sources carry the
    // high-quality mass decides where a mixture budget should move;
    // a mean hides a bimodal source). Fixed 0.1-wide score bands
    // (q_ppm div 100000 — no global quantile pass, so no single-
    // partition ntile window at corpus scale), per-source ppm share.
    // Scale shape: one narrow scoring pass, partial agg onto the
    // |sources|×11 grid, share window over that bounded relation.
    "samp_quality_grid" -> { (s, d) =>
      import s.implicits._
      def ppm(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0) + lit(0.5)).cast("long")
      graft.queries.TextQueries.qualityScored(t(s, d, "documents"))
        .select($"source", ppm($"score").as("q_ppm"))
        .withColumn("band", expr("q_ppm div 100000"))
        .groupBy($"source", $"band")
        .agg(count(lit(1)).as("n_docs"),
          min($"q_ppm").as("min_q_ppm"), max($"q_ppm").as("max_q_ppm"))
        .withColumn("src_n", sum($"n_docs").over(Window.partitionBy($"source")))
        .select($"source", $"band", $"n_docs",
          expr("(n_docs * 1000000) div src_n").as("share_ppm"),
          $"min_q_ppm", $"max_q_ppm")
        .orderBy($"source", $"band")
    },

    // Neyman optimal stratified allocation (survey-sampling's n_h ∝
    // N_h·S_h rule, applied to corpus strata: variable strata earn more
    // of the annotation/eval budget than uniform ones): per-language
    // doc counts and integer length-variances (sd = floor √var — IEEE
    // sqrt of exactly-representable integers, identical both engines),
    // weights N·sd, and the EXACT integer apportionment via largest-
    // remainder rounding so Σ alloc = n precisely (base = floor share,
    // the deficit distributed to the largest remainders with a
    // deterministic lang tie-break). Scale shape: one |strata|-row
    // partial agg over the corpus; every window runs on the
    // |strata|-row profile.
    "samp_neyman" -> { (s, d) =>
      import s.implicits._
      val n = 200L
      val st = t(s, d, "documents")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sx"),
          sum($"n_chars" * $"n_chars").as("sxx"))
        .withColumn("mean_c", expr("sx div n_docs"))
        .withColumn("var_c", expr("greatest(0L, sxx div n_docs - mean_c * mean_c)"))
        .withColumn("sd_chars", expr("CAST(FLOOR(sqrt(var_c)) AS BIGINT)"))
        .withColumn("w", $"n_docs" * $"sd_chars")
      val tot = st.agg(greatest(lit(1L), sum($"w")).as("tw"))
      val wr = Window.orderBy($"rem".desc, $"lang")
      val wAll = Window.partitionBy(lit(1))
      st.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"($n * w) div tw"))
        .withColumn("rem", expr(s"($n * w) % tw"))
        .withColumn("rk", row_number().over(wr).cast("long"))
        .withColumn("deficit", lit(n) - sum($"base").over(wAll))
        .withColumn("alloc", $"base" + when($"rk" <= $"deficit", 1L).otherwise(0L))
        .select($"lang", $"n_docs", $"sd_chars", $"w".as("weight"), $"alloc")
        .orderBy($"lang")
    },

    // water-filling token allocation (the budget solve behind "cap the
    // giant sources so the mix fits B tokens"): find the unique cap c*
    // with Σ min(tokens_s, c*) = B, allocate min(tokens_s, c*) per
    // source. Closed-form over the sorted source profile — sources
    // sorted by token count ascending, prefix sums P_i: the cap lives
    // in the first segment where P_i + (S−i)·c fits B, c* = (B−P_i) div
    // (S−i) — so the whole solve is one window over the |sources|-row
    // profile relation, NO driver loop, no bisection, corpus touched
    // exactly once for the counts. Integer-exact: the div-floor cap
    // under-fills by < S tokens (reported as `slack`), never over-fills
    // — the conservative side a budget wants. The uncapped small
    // sources keep everything; the capped giants all land on c*.
    "samp_waterfill" -> { (s, d) =>
      import s.implicits._
      val budget = 20000L
      val prof = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"source").agg(count(lit(1)).as("n_tokens"))
      val w = Window.orderBy($"n_tokens", $"source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(lit(1))
      val solved = prof
        .withColumn("cum", sum($"n_tokens").over(w))
        .withColumn("i", row_number().over(Window.orderBy($"n_tokens", $"source")).cast("long"))
        .withColumn("s_total", count(lit(1)).over(wAll))
        .withColumn("grand", sum($"n_tokens").over(wAll))
        // feasible boundary i: sources 1..i keep everything and even
        // capping the rest at t_i stays within budget — the max feasible
        // i is the water line (every feasible candidate cap is ≤ the
        // true level, so MAX picks the boundary one)
        .withColumn("feasible", expr(
          s"cum + (s_total - i) * n_tokens <= $budget"))
      val cap = solved
        .agg(coalesce(
          max(when($"feasible", expr(
            // i = S: the whole corpus fits — cap at the largest source
            s"if(i = s_total, n_tokens, ($budget - cum) div (s_total - i))"))),
          // no source fits whole → flat split of the budget
          expr(s"$budget div max(s_total)")).as("cap"))
      solved.crossJoin(broadcast(cap))
        .select($"source", $"n_tokens",
          least($"n_tokens", $"cap").as("alloc"),
          ($"n_tokens" > $"cap").cast("long").as("capped"),
          $"cap",
          lit(budget).as("budget"))
        .orderBy($"source")
    },

    // DSIR-style importance weighting (Xie et al., "Data Selection for
    // Language Models via Importance Resampling", NeurIPS'23): score
    // every raw document by how target-like its hashed-unigram profile
    // is — weight_ppm(bucket) = smoothed P_target(bucket)/P_raw(bucket),
    // doc score = token-count-weighted mean of its buckets' ratios.
    // Target here = the lang='en' slice (stand-in for "trusted corpus");
    // the feature space is 1024 md5-hashed buckets, the paper's
    // hashed-ngram trick that makes the model corpus-size-independent.
    // Integer-exact end to end: ratios as
    // ((ct+1)·(Nr+B)·10⁶) div ((cr+1)·(Nt+B)) in DECIMAL(38,0) (the
    // cross-multiplied add-one form — one integral divide, no float
    // log-likelihoods), so selection replays bit-identically in the
    // oracle. Scale shape: BOTH count relations are ≤B=1024 rows no
    // matter the corpus size (the whole point of hashing the feature
    // space) — the weight table broadcasts; per-doc bucket counts group
    // on a superset of the token index's doc_id bucketing (no exchange);
    // the doc score is one partial agg on doc_id. Output: the top-64
    // most target-like raw docs (the resampling shortlist) with their
    // weights.
    "samp_dsir" -> { (s, d) =>
      import s.implicits._
      val B = 1024
      val toks = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .select($"doc_id", $"lang",
          expr(s"CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % $B").as("bucket"))
      val docBuckets = toks.groupBy($"doc_id", $"lang", $"bucket")
        .agg(count(lit(1)).as("k"))
        .persist() // feeds the two global count relations AND the scoring join
      val raw = docBuckets.groupBy($"bucket").agg(sum($"k").as("cr"))
      val tgt = docBuckets.filter($"lang" === "en")
        .groupBy($"bucket").agg(sum($"k").as("ct"))
      val totals = docBuckets.agg(
        sum($"k").as("nr"),
        sum(when($"lang" === "en", $"k").otherwise(0L)).as("nt"))
      val weights = raw.join(tgt, Seq("bucket"), "left")
        .crossJoin(broadcast(totals))
        .withColumn("w_ppm", expr(
          s"CAST((CAST(coalesce(ct, 0L) + 1L AS DECIMAL(38,0)) * (nr + $B) * 1000000) div " +
            s"(CAST(cr + 1L AS DECIMAL(38,0)) * (nt + $B)) AS BIGINT)"))
        .select($"bucket", $"w_ppm")
      docBuckets
        .join(broadcast(weights), Seq("bucket"))
        .groupBy($"doc_id")
        .agg(sum($"k").as("n_tokens"),
          expr("sum(w_ppm * k) div sum(k)").as("dsir_ppm"))
        .orderBy($"dsir_ppm".desc, $"doc_id")
        .limit(64)
    },

    // Duffield–Lund–Thorup PRIORITY SAMPLING (the weighted-without-
    // replacement scheme with the optimal-variance subset-sum estimator):
    // priority q = w / u with u uniform in (0,1], keep the k largest,
    // τ = the (k+1)-th priority, estimator ŵ = max(w, τ) — Σŵ over the
    // sample is an unbiased estimate of Σw over the corpus. Determinism:
    // u = (docHash+1)/2³², so q = (w·2³²)/(h+1) is ONE IEEE division of
    // two exactly-representable integers (w·2³² < 2⁵³ for any doc under
    // ~2M chars) — bit-identical across engines, no libm. Scale shape:
    // one narrow pass computes q, the k+1 survivors come from a
    // distributed TakeOrdered (no global sort), τ broadcasts back as a
    // 1-row relation.
    "samp_priority" -> { (s, d) =>
      import s.implicits._
      val k = PriorityK
      val base = t(s, d, "documents")
        .select($"doc_id", $"source", $"n_chars".cast("long").as("w"), docHash.as("h"))
        .withColumn("q",
          ($"w" * lit(HashSpace)).cast("double") / ($"h" + lit(1L)).cast("double"))
      val topK1 = base.orderBy($"q".desc, $"doc_id").limit(k + 1)
      val wRank = Window.orderBy($"q".desc, $"doc_id")
      val ranked = topK1.withColumn("rn", row_number().over(wRank))
      val tau = ranked.filter($"rn" === k + 1)
        .select($"q".as("tau")).withColumn("one", lit(1))
      ranked.filter($"rn" <= k).withColumn("one", lit(1))
        .join(broadcast(tau), Seq("one"))
        .select($"doc_id", $"source", $"w",
          floor($"q").cast("long").as("pri_int"),
          floor(greatest($"w".cast("double"), $"tau")).cast("long").as("est_w"))
        .orderBy($"doc_id")
    },

    // mixture-diversity scorecard — the 1-row number a mixture review
    // opens with: entropy of the per-source token-mass distribution
    // against its ln(n_sources) ceiling (norm → 10⁶ means the mix is
    // balanced; a collapsing norm says one source is eating the budget —
    // the before/after metric for samp_temperature/samp_waterfill runs).
    // Exact integer micro-nats via the native ln_micro kernel +
    // DECIMAL(38,0) sums. Scale shape: one per-source token count off
    // the bucketed index (|sources| rows), then a 1-row rollup.
    "samp_src_entropy" -> { (s, d) =>
      import s.implicits._
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"source").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_sources"),
          sum($"n").as("n_tokens"),
          max($"n").as("max_source"),
          sum($"n".cast(dec) * expr("ln_micro(n)")).as("sln"))
        .withColumn("entropy_micro",
          expr("ln_micro(n_tokens) - (sln div CAST(n_tokens AS DECIMAL(38,0)))").cast("long"))
        .withColumn("norm_ppm",
          when($"n_sources" === 1, 0L)
            .otherwise(expr("(entropy_micro * 1000000) div ln_micro(n_sources)")))
        .select($"n_sources", $"n_tokens", $"max_source", $"entropy_micro", $"norm_ppm")
    },

    // cross-split EXACT-dup leakage audit — the decontamination check
    // run on the split ITSELF (dd_leakage finds near-dup eval→train
    // leaks via LSH; this counts byte-identical (normalized) content
    // straddling samp_hash_split's train/val/test boundary — the
    // cheapest leak to have and the most embarrassing to ship): per
    // ordered split pair, leaking fingerprint groups + exact
    // cross-pair count c₁·c₂ (the dd_exact_cross counts arithmetic on
    // the split axis — no row-level self-join, a hot template group
    // costs one aggregate row). Scale shape: two chained partial aggs,
    // per-fp ≤3-split combination explode, ≤3-row output.
    "samp_split_leak" -> { (s, d) =>
      import s.implicits._
      // EXACTLY samp_hash_split's assignment rule — the audit must see
      // the split the sampler actually deals
      val b = expr(
        "CAST(conv(substring(md5(concat('split:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000")
      val cnt = t(s, d, "documents")
        .withColumn("split",
          when(b < 900, "train").when(b < 950, "val").otherwise("test"))
        .select(graft.queries.DedupQueries.normFpCol($"text").as("fp"), $"split")
        .groupBy($"fp", $"split").agg(count(lit(1)).as("c"))
      cnt.groupBy($"fp")
        .agg(sort_array(collect_list(struct($"split", $"c"))).as("sc"))
        .select(explode(expr(
          """flatten(transform(sc, (a, i) ->
            |  transform(slice(sc, i + 1, size(sc) - i), b ->
            |    named_struct('split_lo', a.split, 'split_hi', b.split,
            |      'n_pairs', CASE WHEN b.split = a.split
            |        THEN CAST(0 AS BIGINT) ELSE a.c * b.c END))))"""
            .stripMargin)).as("p"))
        .filter($"p.n_pairs" > 0)
        .groupBy($"p.split_lo".as("split_lo"), $"p.split_hi".as("split_hi"))
        .agg(count(lit(1)).as("n_groups"), sum($"p.n_pairs").as("n_pairs"))
        .orderBy($"split_lo", $"split_hi")
    },

    // per-source epoch schedule — HOW the upsampling actually executes
    // (samp_rebalance says "factor 2300 milli"; a training loop runs
    // FULL passes plus a sampled remainder — this emits that plan:
    // full_epochs = target div tokens, remainder as an exact ppm hash
    // threshold, so the schedule is reproducible row-locally on any
    // engine): uniform token target (total div |sources|, the
    // samp_rebalance allocation). Scale shape: one narrow token-count
    // partial agg, |sources|-row profile, broadcast 1-row total.
    "samp_epoch_plan" -> { (s, d) =>
      import s.implicits._
      val prof = t(s, d, "documents")
        .select($"source", size(split($"text", " +")).cast("long").as("n_tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      val tot = prof.agg(sum($"n_tokens").as("tt"),
        count(lit(1)).as("ns"))
      prof.crossJoin(broadcast(tot))
        .withColumn("target_tokens", expr("tt div ns"))
        .select($"source", $"n_docs", $"n_tokens", $"target_tokens",
          expr("target_tokens div n_tokens").as("full_epochs"),
          expr("((target_tokens % n_tokens) * 1000000) div n_tokens").as("rem_ppm"))
        .orderBy($"source")
    }
  )

  val oracles: Map[String, String] = Map(
    "samp_src_entropy" -> {
      val (lnC, lastC) = FixedLnSql.chain("sc", "ssa", Nil, Seq("n"))
      val (lnP, lastP) = FixedLnSql.chain("per", "ssb",
        Seq("max_source", "sln"), Seq("n_sources", "n_tokens"))
      s"""WITH toks AS (
         |  SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
         |sc AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n
         |  FROM toks WHERE length(tok) > 0 GROUP BY source),
         |$lnC,
         |per AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         |    CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    CAST(MAX(n) AS BIGINT) AS max_source,
         |    SUM(CAST(n AS HUGEINT) * ln_n) AS sln
         |  FROM $lastC),
         |$lnP
         |SELECT n_sources, n_tokens, max_source,
         |  CAST(ln_n_tokens - (sln // n_tokens) AS BIGINT) AS entropy_micro,
         |  CASE WHEN n_sources = 1 THEN 0
         |    ELSE CAST(((ln_n_tokens - (sln // n_tokens)) * 1000000) // ln_n_sources AS BIGINT)
         |  END AS norm_ppm
         |FROM $lastP""".stripMargin
    },

    "samp_stratified" ->
      s"""WITH n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |h AS (
         |  SELECT lang, doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents)
         |SELECT h.lang, h.doc_id FROM h JOIN n ON n.lang = h.lang
         |WHERE h.h < ${StratumTarget * HashSpace} // n.n
         |ORDER BY h.lang, h.doc_id""".stripMargin,

    "samp_rebalance" ->
      """WITH prof AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split_regex(text, ' +'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |a AS (
        |  SELECT *, SUM(n_tokens) OVER () // COUNT(*) OVER () AS alloc_tokens
        |  FROM prof)
        |SELECT source, n_docs, n_tokens, CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
        |  CAST((alloc_tokens * 1000) // n_tokens AS BIGINT) AS factor_milli
        |FROM a ORDER BY source""".stripMargin,

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

    "samp_temp_sweep" ->
      """WITH n AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source),
        |sw AS (
        |  SELECT 500 AS tau_milli, source, n AS n_docs,
        |    CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000.0) AS BIGINT) AS w FROM n
        |  UNION ALL
        |  SELECT 750, source, n,
        |    CAST(FLOOR(SQRT(CAST(n AS DOUBLE) * SQRT(CAST(n AS DOUBLE))) * 1000.0) AS BIGINT) FROM n
        |  UNION ALL
        |  SELECT 1000, source, n, n * 1000 FROM n)
        |SELECT CAST(tau_milli AS BIGINT) AS tau_milli, source, n_docs, w,
        |  CAST((w * 1000000) // SUM(w) OVER (PARTITION BY tau_milli) AS BIGINT) AS share_ppm
        |FROM sw ORDER BY tau_milli, source""".stripMargin,

    "samp_share_skew" ->
      """WITH p AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split_regex(text, ' +'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1)
        |SELECT source, n_docs, n_tokens,
        |  CAST((n_docs * 1000000) // SUM(n_docs) OVER () AS BIGINT) AS doc_share_ppm,
        |  CAST((n_tokens * 1000000) // SUM(n_tokens) OVER () AS BIGINT) AS tok_share_ppm,
        |  CAST((n_tokens * 1000000) // SUM(n_tokens) OVER ()
        |    - (n_docs * 1000000) // SUM(n_docs) OVER () AS BIGINT) AS skew_ppm
        |FROM p ORDER BY source""".stripMargin,

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
         |ORDER BY source, doc_id""".stripMargin,

    "samp_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents)
         |SELECT CAST(h % $NShards AS BIGINT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY h % $NShards ORDER BY h, doc_id) AS BIGINT) AS pos,
         |  doc_id
         |FROM h ORDER BY shard, pos""".stripMargin,

    "samp_upsample" ->
      s"""WITH n AS (
         |  SELECT source, ($UpsampleTarget * 1000) // CAST(COUNT(*) AS BIGINT) AS milli
         |  FROM documents GROUP BY source),
         |h AS (
         |  SELECT source, doc_id,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents),
         |c AS (
         |  SELECT h.source, h.doc_id,
         |    CAST(n.milli // 1000
         |      + CASE WHEN h.h < (n.milli % 1000) * $HashSpace // 1000 THEN 1 ELSE 0 END
         |      AS BIGINT) AS copies
         |  FROM h JOIN n ON n.source = h.source)
         |SELECT source, doc_id, copies, CAST(t.copy AS BIGINT) AS copy
         |FROM c, UNNEST(range(1, copies + 1)) AS t(copy)
         |WHERE copies > 0
         |ORDER BY source, doc_id, copy""".stripMargin,

    "samp_pareto" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(NTILE(10) OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id) AS BIGINT) AS decile
        |  FROM d),
        |g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN decile = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS top_decile_tokens
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, n_tokens, top_decile_tokens,
        |  CAST((top_decile_tokens * 1000000) // n_tokens AS BIGINT) AS share_ppm
        |FROM g ORDER BY source""".stripMargin,

    "samp_curriculum" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    CAST(FLOOR(${TextQueries.qualityScoreSql} * 1000000.0 + 0.5) AS BIGINT) AS quality_ppm
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, quality_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY quality_ppm DESC, doc_id) AS BIGINT) AS rnk
         |  FROM q)
         |SELECT doc_id, source, quality_ppm, rnk
         |FROM r WHERE rnk <= $CurriculumK ORDER BY source, rnk""".stripMargin,

    // the oracle states the SPEC (a plain global cumsum); the Spark side
    // must reproduce it exactly through its two-phase sharded prefix sum
    "samp_systematic" ->
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
         |c AS (
         |  SELECT doc_id, w,
         |    COALESCE(SUM(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    SUM(w) OVER () AS tw
         |  FROM d),
         |p AS (
         |  SELECT doc_id, w,
         |    (cum + w) // GREATEST(1, tw // $SysK) - cum // GREATEST(1, tw // $SysK) AS n_picks
         |  FROM c)
         |SELECT doc_id, w, CAST(n_picks AS BIGINT) AS n_picks
         |FROM p WHERE n_picks > 0 ORDER BY doc_id""".stripMargin,

    // HUGEINT where the Spark side uses DECIMAL(38,0): s1² ≈ 1e18·1000
    // overflows BIGINT in both engines; for positive values // and div
    // are the same exact floor.
    "samp_ess" ->
      s"""WITH n AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000.0) AS BIGINT) AS w
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS sw,
         |  CAST(SUM(n_docs) AS BIGINT) AS n_total FROM n),
         |per AS (
         |  SELECT source, n_docs,
         |    CAST((w * 1000000) // sw AS BIGINT) AS mix_share_ppm,
         |    CAST((w * 1000000000) // (sw * n_docs) AS BIGINT) AS doc_weight_nano
         |  FROM n, tot),
         |g AS (
         |  SELECT CAST(SUM(n_docs * doc_weight_nano) AS BIGINT) AS s1,
         |    CAST(SUM(n_docs * doc_weight_nano * doc_weight_nano) AS BIGINT) AS s2
         |  FROM per),
         |e AS (
         |  SELECT CAST(CAST(s1 AS HUGEINT) * s1 * 1000 // s2 AS BIGINT) AS ess_milli
         |  FROM g)
         |SELECT per.source, per.n_docs, per.mix_share_ppm, per.doc_weight_nano,
         |  e.ess_milli,
         |  CAST(e.ess_milli * 1000 // tot.n_total AS BIGINT) AS ess_ratio_ppm
         |FROM per, e, tot ORDER BY per.source""".stripMargin,

    "samp_hash_split" ->
      """WITH x AS (
        |  SELECT source,
        |    CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
        |         WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 < 950 THEN 'val'
        |         ELSE 'test' END AS split,
        |    len(string_split_regex(text, ' +')) AS n_tok
        |  FROM documents),
        |g AS (
        |  SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM x GROUP BY source, split),
        |tot AS (SELECT source, SUM(n_docs) AS t_docs FROM g GROUP BY source)
        |SELECT g.source, g.split, g.n_docs, g.n_tokens,
        |  CAST((g.n_docs * 1000000) // tot.t_docs AS BIGINT) AS doc_share_ppm
        |FROM g JOIN tot ON tot.source = g.source
        |ORDER BY g.source, g.split""".stripMargin,

    // the same md5 recipe with a 'fold:' salt, mod 5
    "samp_kfold" ->
      """WITH x AS (
        |  SELECT source,
        |    CAST('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS fold,
        |    len(string_split_regex(text, ' +')) AS n_tok
        |  FROM documents),
        |g AS (
        |  SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM x GROUP BY source, fold),
        |tot AS (SELECT source, SUM(n_docs) AS t_docs FROM g GROUP BY source)
        |SELECT g.source, g.fold, g.n_docs, g.n_tokens,
        |  CAST((g.n_docs * 1000000) // tot.t_docs AS BIGINT) AS doc_share_ppm
        |FROM g JOIN tot ON tot.source = g.source
        |ORDER BY g.source, g.fold""".stripMargin,

    "samp_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |    CAST(FLOOR((${graft.queries.TextQueries.qualityScoreSql}) * 1000000.0 + 0.5) AS BIGINT) AS q_ppm,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents),
         |v AS (SELECT *, (h * 2000000 < q_ppm * 4294967296) AS keep FROM q)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) FILTER (keep) AS BIGINT) AS n_kept,
         |  CAST((COUNT(*) FILTER (keep) * 1000000) // COUNT(*) AS BIGINT) AS kept_share_ppm,
         |  CAST(SUM(q_ppm) // COUNT(*) AS BIGINT) AS mean_q_all_ppm,
         |  CAST(COALESCE(SUM(q_ppm) FILTER (keep), 0)
         |    // GREATEST(1, COUNT(*) FILTER (keep)) AS BIGINT) AS mean_q_kept_ppm
         |FROM v GROUP BY source ORDER BY source""".stripMargin,

    "samp_quality_grid" ->
      s"""WITH q AS (
         |  SELECT source,
         |    CAST(FLOOR((${graft.queries.TextQueries.qualityScoreSql}) * 1000000.0 + 0.5) AS BIGINT) AS q_ppm
         |  FROM documents),
         |g AS (
         |  SELECT source, q_ppm // 100000 AS band, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    MIN(q_ppm) AS min_q_ppm, MAX(q_ppm) AS max_q_ppm
         |  FROM q GROUP BY 1, 2)
         |SELECT source, CAST(band AS BIGINT) AS band, n_docs,
         |  CAST((n_docs * 1000000) // SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share_ppm,
         |  min_q_ppm, max_q_ppm
         |FROM g ORDER BY source, band""".stripMargin,

    "samp_neyman" ->
      """WITH st AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY lang),
        |st2 AS (
        |  SELECT lang, n_docs,
        |    CAST(FLOOR(sqrt(GREATEST(0, sxx // n_docs - (sx // n_docs) * (sx // n_docs)))) AS BIGINT) AS sd_chars
        |  FROM st),
        |st3 AS (SELECT lang, n_docs, sd_chars, n_docs * sd_chars AS w FROM st2),
        |tot AS (SELECT GREATEST(1, SUM(w)) AS tw FROM st3),
        |base AS (
        |  SELECT st3.*, (200 * w) // tot.tw AS base, (200 * w) % tot.tw AS rem
        |  FROM st3 CROSS JOIN tot),
        |rk AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS BIGINT) AS rk,
        |    200 - SUM(base) OVER () AS deficit
        |  FROM base)
        |SELECT lang, n_docs, sd_chars, CAST(w AS BIGINT) AS weight,
        |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM rk ORDER BY lang""".stripMargin,

    "samp_waterfill" ->
      """WITH prof AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |  FROM (SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents)
        |  WHERE length(tok) > 0 GROUP BY 1),
        |solved AS (
        |  SELECT source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY n_tokens, source) AS BIGINT) AS cum,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, source) AS BIGINT) AS i,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS s_total
        |  FROM prof),
        |cap AS (
        |  SELECT COALESCE(
        |    MAX(CASE WHEN cum + (s_total - i) * n_tokens <= 20000
        |      THEN CASE WHEN i = s_total THEN n_tokens
        |           ELSE (20000 - cum) // (s_total - i) END END),
        |    20000 // MAX(s_total)) AS cap
        |  FROM solved)
        |SELECT s.source, s.n_tokens,
        |  CAST(LEAST(s.n_tokens, c.cap) AS BIGINT) AS alloc,
        |  CAST(CASE WHEN s.n_tokens > c.cap THEN 1 ELSE 0 END AS BIGINT) AS capped,
        |  CAST(c.cap AS BIGINT) AS cap, CAST(20000 AS BIGINT) AS budget
        |FROM solved s CROSS JOIN cap c ORDER BY s.source""".stripMargin,

    "samp_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS bucket
        |  FROM (SELECT doc_id, lang, unnest(string_split_regex(text, ' +')) AS tok
        |        FROM documents)
        |  WHERE length(tok) > 0),
        |db AS (SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM toks GROUP BY 1, 2, 3),
        |raw AS (SELECT bucket, CAST(SUM(k) AS BIGINT) AS cr FROM db GROUP BY 1),
        |tgt AS (SELECT bucket, CAST(SUM(k) AS BIGINT) AS ct
        |  FROM db WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT CAST(SUM(k) AS BIGINT) AS nr,
        |  CAST(COALESCE(SUM(k) FILTER (lang = 'en'), 0) AS BIGINT) AS nt FROM db),
        |w AS (
        |  SELECT raw.bucket,
        |    CAST((CAST(COALESCE(tgt.ct, 0) + 1 AS HUGEINT) * (tot.nr + 1024) * 1000000) //
        |      (CAST(raw.cr + 1 AS HUGEINT) * (tot.nt + 1024)) AS BIGINT) AS w_ppm
        |  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tot)
        |SELECT db.doc_id, CAST(SUM(db.k) AS BIGINT) AS n_tokens,
        |  CAST(SUM(w.w_ppm * db.k) // SUM(db.k) AS BIGINT) AS dsir_ppm
        |FROM db JOIN w ON w.bucket = db.bucket
        |GROUP BY db.doc_id ORDER BY dsir_ppm DESC, doc_id LIMIT 64""".stripMargin,

    "samp_priority" ->
      s"""WITH b AS (
         |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source, w,
         |    CAST(w * $HashSpace AS DOUBLE) / CAST(h + 1 AS DOUBLE) AS q
         |  FROM b),
         |r AS (
         |  SELECT doc_id, source, w, q,
         |    CAST(ROW_NUMBER() OVER (ORDER BY q DESC, doc_id) AS BIGINT) AS rn
         |  FROM q),
         |tau AS (SELECT q AS tau FROM r WHERE rn = ${PriorityK + 1})
         |SELECT doc_id, source, w,
         |  CAST(FLOOR(q) AS BIGINT) AS pri_int,
         |  CAST(FLOOR(GREATEST(CAST(w AS DOUBLE), tau)) AS BIGINT) AS est_w
         |FROM r CROSS JOIN tau WHERE rn <= $PriorityK ORDER BY doc_id""".stripMargin,

    "samp_split_leak" ->
      """WITH sp AS (
        |  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |    CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 < 900 THEN 'train'
        |      WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 < 950 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM documents),
        |cnt AS (
        |  SELECT fp, split, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM sp GROUP BY 1, 2),
        |p AS (
        |  SELECT a.fp, a.split AS split_lo, b.split AS split_hi, a.c * b.c AS n_pairs
        |  FROM cnt a JOIN cnt b ON b.fp = a.fp AND b.split > a.split)
        |SELECT split_lo, split_hi, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(n_pairs) AS BIGINT) AS n_pairs
        |FROM p WHERE n_pairs > 0
        |GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin,

    "samp_epoch_plan" ->
      """WITH p AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split_regex(text, ' +'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt,
        |    CAST(COUNT(*) AS BIGINT) AS ns FROM p)
        |SELECT source, n_docs, n_tokens,
        |  CAST(tot.tt // tot.ns AS BIGINT) AS target_tokens,
        |  CAST((tot.tt // tot.ns) // n_tokens AS BIGINT) AS full_epochs,
        |  CAST((((tot.tt // tot.ns) % n_tokens) * 1000000) // n_tokens AS BIGINT) AS rem_ppm
        |FROM p, tot ORDER BY source""".stripMargin
  )
}
