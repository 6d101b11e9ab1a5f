package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables.t

/** SURVEY §2.D — training-data text analysis over `documents`.
  *
  * Everything is built from codegen'd string/array expressions (no UDFs):
  * token ops are `split`/`regexp_extract_all`/higher-order `filter`, so
  * they inline into whole-stage codegen and scale embarrassingly — one
  * narrow pass over the corpus, the only shuffle being the final
  * aggregation where one exists.
  *
  * Token-level operators (vocab, phrases, bigram LM, tf-idf, CMS, hapax,
  * skip-grams, PMI) read the materialized [[CorpusTokenIndex]] instead of
  * re-splitting text: tokenization is paid once per corpus, and the
  * index's doc_id bucketing + (doc_id, pos) sort feed every per-doc
  * window and groupBy(doc_id, …) with no exchange and no sort.
  * Per-document scorers (quality, langid, repetition, chunking) keep the
  * inline per-row split — for them the array form IS the narrow pass,
  * and a grouped re-assembly from the index would cost a shuffle.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Per-language marker tokens for the n-gram/stopword language scorer.
    * On a real corpus these would be the top distinctive n-grams per
    * language; the classifier mechanics (score → argmax with fixed
    * tie-break) are corpus-independent.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "hash", "key"),
    "en" -> Seq("the", "a", "order"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "stream"))

  private val stopwords = Seq("the", "a", "of", "and", "to")

  private def inList(vs: Seq[String]): String = vs.map(v => s"'$v'").mkString(", ")

  /** symmetric ±2-offset (center, context) skip-gram pair multiset —
    * shared by txt_skipgrams (counts) and txt_pmi (lift). ONE window
    * pass computes both leads (c1, c2) and one explode emits all four
    * pair shapes ((tok,c1), (tok,c2), (c1,tok), (c2,tok)) — a single
    * scan of the token index and a single WindowExec, where the earlier
    * union-of-4-branches form re-ran scan+window per branch (the shared
    * exchange that used to amortize it is gone by design: the index's
    * bucketing feeds the window exchange-free). Tokens come from the
    * materialized corpus token index, whose doc_id bucketing +
    * (doc_id, pos) file sort feed the window with no exchange and no
    * sort.
    */
  private def skipgramPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = CorpusTokenIndex.tokens(s, d)
      .select($"doc_id", $"pos", $"tok")
      .filter(length($"tok") > 0)
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    toks
      .withColumn("c1", lead($"tok", 1).over(w))
      .withColumn("c2", lead($"tok", 2).over(w))
      .select(explode(array(
        struct($"tok".as("center"), $"c1".as("context")),
        struct($"tok".as("center"), $"c2".as("context")),
        struct($"c1".as("center"), $"tok".as("context")),
        struct($"c2".as("center"), $"tok".as("context")))).as("p"))
      // a null lead nulls one FIELD of the struct, never the struct:
      // dropping null center/context keeps exactly the in-bounds pairs
      .filter($"p.center".isNotNull && $"p.context".isNotNull)
      .select($"p.center".as("center"), $"p.context".as("context"))
  }

  /** blended 0..1 quality score (raw double; ppm-ize for output).
    * Shared by txt_quality and the corpus-cleaning pipeline so both stages
    * grade documents identically.
    */
  def qualityScored(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      // materialize the token array once: `tk` is referenced by several
      // downstream expressions, and CollapseProject keeps the projection
      // boundary for non-cheap multiply-referenced aliases, so split()
      // runs once per row instead of once per consumer
      .withColumn("tk", split($"text", " +"))
      .withColumn("len", length($"text").cast("long"))
      .withColumn("n_tok", size($"tk").cast("long"))
      // empty document ⇒ len = 0: guard the ratio (ANSI mode makes x/0
      // throw DIVIDE_BY_ZERO, not NULL) — an empty doc scores 0 punct
      .withColumn("punct_r", when($"len" > 0,
        (($"len" - length(regexp_replace($"text", "[a-z0-9 ]", ""))) / $"len").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("stop_r", (size(expr(s"filter(tk, x -> x IN (${inList(stopwords)}))")) / $"n_tok").cast("double"))
      .withColumn("mwl", (length(regexp_replace($"text", " ", "")) / $"n_tok").cast("double"))
      .withColumn("score",
        lit(0.4) * least($"len" / lit(500.0), lit(1.0))
          + lit(0.3) * (lit(1.0) - $"stop_r")
          + lit(0.3) * least($"mwl" / lit(8.0), lit(1.0)))
  }

  /** the same score as DuckDB SQL (over a relation exposing `text`) */
  val qualityScoreSql: String =
    s"""(0.4 * LEAST(length(text) / 500.0, 1.0)
       | + 0.3 * (1.0 - len(list_filter(string_split_regex(text, ' +'), x -> x IN (${inList(stopwords)}))) / CAST(len(string_split_regex(text, ' +')) AS DOUBLE))
       | + 0.3 * LEAST(length(replace(text, ' ', '')) / CAST(len(string_split_regex(text, ' +')) AS DOUBLE) / 8.0, 1.0))""".stripMargin

  /** PII scrub passes: (pattern, mask), applied IN ORDER — emails before
    * long numbers (an address's digit run must disappear with the email,
    * not survive as a half-masked `<NUM>`), URLs before numbers for the
    * same reason. The patterns are the txt_pii scan patterns, whose
    * Java≡RE2 extraction parity the txt_pii oracle already proves on
    * this corpus; replacement rewrites the same match spans. Shared by
    * txt_scrub, the pipe_clean_corpus scrub stage and the streaming
    * scrub gate so every path redacts identically.
    */
  private[queries] val ScrubPasses: Seq[(String, String)] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "https?://[^ ]+" -> "<URL>",
    "[0-9]{6,}" -> "<NUM>")

  /** the redaction transform: nested codegen'd regexp_replace passes —
    * narrow, no shuffle, no UDF
    */
  private[graft] def scrubbed(text: Column): Column =
    ScrubPasses.foldLeft(text) { case (c, (p, m)) => regexp_replace(c, p, m) }

  /** DuckDB twin of [[scrubbed]] over a SQL expression (the 'g' flag is
    * the replace-all parity rule)
    */
  private[queries] def scrubSqlExpr(col: String): String =
    ScrubPasses.foldLeft(col) { case (c, (p, m)) => s"regexp_replace($c, '$p', '$m', 'g')" }

  /** counts mask tokens in already-scrubbed text (SQL-expr form usable
    * in both engines' dialects via the shared regexp_extract_all)
    */
  private[graft] val MaskAlt = "<EMAIL>|<URL>|<NUM>"

  val queries: Map[String, Q] = Map(
    // token counting: whitespace tokens, regex word tokens, distinct words
    "txt_tokens" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id",
          size(split($"text", " +")).cast("long").as("n_tokens"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("n_words"),
          size(array_distinct(split($"text", " +"))).cast("long").as("n_distinct"))
    },

    // language ID: marker-token scores per language, argmax with
    // alphabetical tie-break; output is the actual×predicted confusion
    "txt_langid" -> { (s, d) =>
      import s.implicits._
      // one split() per row, shared by all five language scorers
      val toks = t(s, d, "documents").select($"lang", split($"text", " +").as("tk"))
      val scored = markers.foldLeft(toks) { case (df, (lang, ws)) =>
        df.withColumn(s"s_$lang",
          size(expr(s"filter(tk, x -> x IN (${inList(ws)}))")).cast("long"))
      }
      val langs = markers.map(_._1)
      val predicted = langs.init.foldRight[Column](lit(langs.last)) { case (lang, rest) =>
        val isMax = langs.filter(_ != lang)
          .map(o => col(s"s_$lang") >= col(s"s_$o"))
          .reduce(_ && _)
        when(isMax, lit(lang)).otherwise(rest)
      }
      scored.withColumn("predicted", predicted)
        .groupBy($"lang", $"predicted")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang", $"predicted")
    },

    // quality scoring: length, punctuation ratio, stopword ratio, mean
    // word length, and a blended 0..1 score. Ratios are emitted as integer
    // parts-per-million via floor(x*1e6+0.5): decimal `round` on a double
    // is engine-dependent exactly at .xxxxxx5 boundaries, while the
    // multiply/add/floor sequence is IEEE-deterministic everywhere.
    "txt_quality" -> { (s, d) =>
      import s.implicits._
      def ppm(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)).cast("long")
      qualityScored(t(s, d, "documents"))
        .select($"doc_id", $"len", $"n_tok",
          ppm($"punct_r").as("punct_ppm"),
          ppm($"stop_r").as("stop_ppm"),
          ppm($"mwl").as("mwl_micro"),
          ppm($"score").as("quality_ppm"))
    },

    // document fingerprint (normalized-content hash) + duplicate groups
    "txt_fingerprint" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", DedupQueries.normFpCol($"text").as("fingerprint"))
        .groupBy($"fingerprint")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
        .orderBy($"fingerprint")
    },

    // corpus vocabulary: top-50 tokens by occurrence count with document
    // frequency — the token-frequency table a BPE/tokenizer-training or
    // stopword-induction step starts from. One column-pruned read of the
    // token index + one partial-agg shuffle on the token; the top-k is a
    // TakeOrdered, never a global sort of the vocabulary.
    "txt_vocab" -> { (s, d) =>
      import s.implicits._
      // two-phase ((tok, doc) then tok) instead of count-next-to-
      // countDistinct, which would EXPAND every token row per aggregate;
      // phase 1 groups on a superset of the index's doc_id bucketing, so
      // it aggregates with NO shuffle
      CorpusTokenIndex.tokens(s, d)
        .select($"doc_id", $"tok")
        .groupBy($"doc_id", $"tok")
        .agg(count(lit(1)).as("k"))
        .groupBy($"tok")
        .agg(sum($"k").as("n_occurrences"), count(lit(1)).as("n_docs"))
        .orderBy($"n_occurrences".desc, $"tok")
        .limit(50)
    },

    // context-length packing: greedily assign docs (in doc_id order, per
    // source stream) to 512-token training bins via a running token count;
    // emit per-bin stats. The running sum is windowed per source, so
    // parallelism = number of packing streams (at 100 TB: salt the stream
    // key to add streams, each bin stays a contiguous doc range).
    "txt_pack_bins" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      t(s, d, "documents")
        .select($"source", $"doc_id", size(split($"text", " +")).cast("long").as("n_tok"))
        .withColumn("bin", floor((sum($"n_tok").over(w) - $"n_tok") / lit(512L)).cast("long"))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .orderBy($"source", $"bin")
    },

    // repetition detection (the Gopher/RefinedWeb-style quality rule):
    // duplicate word-3-gram rate per doc — repetitious machine-generated
    // text scores high. Narrow per-row array ops, no shuffle at all.
    "txt_repetition" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .withColumn("tk", split($"text", " +"))
        .withColumn("g3", expr(
          "if(size(tk) < 3, array(), " +
            "transform(sequence(0, size(tk) - 3), i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2])))"))
        .select($"doc_id",
          size($"g3").cast("long").as("n_grams"),
          size(array_distinct($"g3")).cast("long").as("n_distinct"),
          when(size($"g3") > 0,
            floor((lit(1.0) - size(array_distinct($"g3")) / size($"g3").cast("double")) * lit(1000000.0) + lit(0.5)).cast("long"))
            .otherwise(lit(0L)).as("dup_ppm"))
    },

    // scrub-target pattern scan (the PII-removal pre-pass of a training
    // pipeline): count email-, URL- and long-number-shaped substrings per
    // source, plus how many docs are flagged at all. One narrow codegen'd
    // regexp pass + one partial-agg shuffle on source.
    "txt_pii" -> { (s, d) =>
      import s.implicits._
      def hits(pat: String): Column =
        size(expr(s"regexp_extract_all(text, '$pat', 0)")).cast("long")
      t(s, d, "documents")
        .select($"source",
          hits("[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z]{2,}").as("emails"),
          hits("https?://[^ ]+").as("urls"),
          hits("[0-9]{6,}").as("longnums"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"emails").as("n_emails"),
          sum($"urls").as("n_urls"),
          sum($"longnums").as("n_longnums"),
          sum(when($"emails" + $"urls" + $"longnums" > 0, 1L).otherwise(0L)).as("n_flagged"))
        .orderBy($"source")
    },

    // the redaction transform txt_pii only scans for: emails → <EMAIL>,
    // URLs → <URL>, 6+-digit runs → <NUM>, applied in that order so an
    // address's digits leave with the address. Per doc the scrubbed
    // text plus the inserted-mask count — the step every training
    // pipeline actually runs after the scan says "flagged". Scale
    // shape: three chained codegen'd regexp passes, zero shuffles.
    "txt_scrub" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", scrubbed($"text").as("text_clean"))
        .withColumn("n_masks",
          size(expr(s"regexp_extract_all(text_clean, '$MaskAlt', 0)")).cast("long"))
        .orderBy($"doc_id")
    },

    // top character-trigram profile per language (explode → count →
    // top-5). Trigram extraction is the native linear-pass char_ngrams
    // expression (the transform/substring HOF it replaced is interpreted
    // AND O(chars²) — substring re-scans from the string start per
    // position); short docs yield the empty array, matching the DuckDB
    // oracle's empty range(1, n-1).
    "txt_ngram_profile" -> { (s, d) =>
      import s.implicits._
      val grams = t(s, d, "documents")
        .select($"lang", explode(expr("char_ngrams(text, 3)")).as("gram"))
      val w = Window.partitionBy($"lang").orderBy($"n".desc, $"gram")
      grams.groupBy($"lang", $"gram")
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 5)
        .orderBy($"lang", $"rnk")
    },

    // repeated-phrase boilerplate audit: word-8-grams appearing in 2+
    // DISTINCT docs — the duplicated-substring signal (license headers,
    // navigation chrome, templated intros) that doc-level dedup leaves
    // behind. Scale shape: the 8-gram explode is narrow; the phrase
    // groupBy is one partial-agg shuffle where map-side combine already
    // collapses within-doc repeats (at 100 TB, group on md5(phrase) and
    // keep min(phrase) as the exemplar so the shuffle key is 16 bytes);
    // the top-50 is a TakeOrdered, never a global sort.
    // per-doc n-gram novelty (the "what does each crawl batch actually
    // add" curation audit): fraction of a doc's distinct word-3-grams
    // whose FIRST corpus occurrence (min doc_id) is this doc. Late
    // near-copies score near zero even when exact dedup passes them —
    // the growth-curve signal dataset builders chart per ingest batch.
    // Scale shape: 3-grams come from two codegen'd window leads over the
    // token index (no text rescan); distinctness is the (doc, g) partial
    // agg; first-occurrence is one (g)-keyed min; the flag join is
    // g-co-partitioned with it.
    "txt_novelty" -> { (s, d) =>
      import s.implicits._
      val toks = CorpusTokenIndex.tokens(s, d)
        .select($"doc_id", $"pos".as("i"), $"tok")
      val w = Window.partitionBy($"doc_id").orderBy($"i")
      val g = toks
        .withColumn("t1", lead($"tok", 1).over(w))
        .withColumn("t2", lead($"tok", 2).over(w))
        .filter($"t2".isNotNull)
        .select($"doc_id", concat_ws(" ", $"tok", $"t1", $"t2").as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("k"))
        .persist() // feeds the first-occurrence agg AND the flag join
      val first = g.groupBy($"g").agg(min($"doc_id").as("first_doc"))
      g.join(first, Seq("g"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_new"))
        .withColumn("novelty_ppm", expr("(n_new * 1000000) div n_grams"))
        .orderBy($"doc_id")
    },

    "txt_phrases" -> { (s, d) =>
      import s.implicits._
      // phrase strings come from codegen'd window LEADS over the
      // exploded token relation, not an array transform: Spark's
      // higher-order functions are interpreted CodegenFallback, and one
      // lambda call per 8-gram measured 7+ s at sf0.1 where this form
      // runs in ~2.5 s. Aggregation is two-phase ((phrase, doc) first)
      // instead of countDistinct-next-to-count, which would EXPAND
      // every phrase row per aggregate.
      val toks = CorpusTokenIndex.tokens(s, d)
        .select($"doc_id", $"pos".as("i"), $"tok")
      val w = Window.partitionBy($"doc_id").orderBy($"i")
      val leads = (1 to 7).map(k => lead($"tok", k).over(w))
      toks
        .withColumn("phrase", concat_ws(" ", ($"tok" +: leads): _*))
        .withColumn("t7", leads.last)
        .filter($"t7".isNotNull)
        .groupBy($"phrase", $"doc_id")
        .agg(count(lit(1)).as("k"))
        .groupBy($"phrase")
        .agg(count(lit(1)).as("n_docs"), sum($"k").as("n_occurrences"),
          min($"doc_id").as("first_doc"))
        .filter($"n_docs" >= 2)
        .orderBy($"n_docs".desc, $"phrase")
        .limit(50)
    },

    // bigram-LM quality proxy (the CCNet/perplexity-filter idea, made
    // engine-exact): each bigram (a, b) scores its corpus conditional
    // frequency pred_ppm = c(a,b)·10⁶ div c(a·), and a doc's score is
    // the integer mean over its bigrams — low means the doc's word
    // transitions are rare in this corpus (gibberish, wrong domain,
    // boilerplate soup). Log-free so every value is bit-identical on
    // any engine (a float log-perplexity could not be hash-checked).
    // Scale shape: bigrams come from ONE codegen'd window lead per doc;
    // the model (bigram + prefix counts) is two partial aggs off the
    // same persisted bigram relation; scoring is an equi join on the
    // bigram key and one per-doc agg — no broadcast of the (corpus-
    // sized) model, no global sort.
    "txt_bigram_lm" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"doc_id").orderBy($"i")
      // (doc, bigram) multiplicities first: the groupBy clusters on a
      // superset of the index's doc_id bucketing (no shuffle), and the
      // scoring join then carries DISTINCT per-doc bigrams with their
      // counts instead of every occurrence — the weighted mean
      // sum(pred·k) div sum(k) is integer-identical to the flat form
      val bi = CorpusTokenIndex.tokens(s, d)
        .select($"doc_id", $"pos".as("i"), $"tok".as("a"))
        .withColumn("b", lead($"a", 1).over(w))
        .filter($"b".isNotNull)
        .groupBy($"doc_id", $"a", $"b").agg(count(lit(1)).as("k"))
        .persist() // feeds the model counts AND the scoring join
      val pair = bi.groupBy($"a", $"b").agg(sum($"k").as("cab"))
      val prefix = pair.groupBy($"a").agg(sum($"cab").as("ca"))
      val scored = bi
        .join(pair, Seq("a", "b"))
        .join(prefix, Seq("a"))
        .withColumn("pred_ppm", expr("(cab * 1000000) div ca"))
      scored.groupBy($"doc_id")
        .agg(sum($"k").as("n_bigrams"),
          expr("sum(pred_ppm * k) div sum(k)").as("mean_pred_ppm"),
          min($"pred_ppm").as("min_pred_ppm"))
        .orderBy($"doc_id")
    },

    // held-out LM quality filtering (the CCNet/KenLM pattern: train a
    // small LM on a trusted half, score the rest, drop what the model
    // finds improbable) — add-one-smoothed bigram LM trained on even
    // doc_ids, scoring odd doc_ids. Integer-exact throughout:
    // pred_ppm = ((cab+1)·10⁶) div (ca+V) with V = train token-type
    // count, so unseen bigrams and unseen prefixes both score the
    // uniform floor instead of crashing the product at zero — the
    // smoothing is what makes a HELD-OUT scorer well-defined, which
    // txt_bigram_lm (self-scoring, never missing) doesn't need. Scale
    // shape: the model is a vocab-sized relation (pair + prefix counts),
    // the scoring join carries DISTINCT per-doc bigrams with
    // multiplicities (txt_bigram_lm's weighted-mean trick), V rides in
    // as a broadcast 1-row relation, and the per-doc agg groups on a
    // superset of the token index's doc_id bucketing. keep flags the
    // docs at/above the corpus-independent uniform-floor multiple
    // (the fixed 30000 ppm cutoff sits at the observed score median so
    // both verdicts occur — the mechanics, not the tuned threshold, are
    // the operator).
    "txt_lm_filter" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"doc_id").orderBy($"i")
      val bi = CorpusTokenIndex.tokens(s, d)
        .select($"doc_id", $"pos".as("i"), $"tok".as("a"))
        .withColumn("b", lead($"a", 1).over(w))
        .filter($"b".isNotNull)
        .groupBy($"doc_id", $"a", $"b").agg(count(lit(1)).as("k"))
        .persist() // feeds train-side model counts AND the held-out scoring join
      val train = bi.filter($"doc_id" % 2 === 0)
      val pair = train.groupBy($"a", $"b").agg(sum($"k").as("cab"))
      val prefix = pair.groupBy($"a").agg(sum($"cab").as("ca"))
      val vocab = CorpusTokenIndex.tokens(s, d)
        .filter($"doc_id" % 2 === 0)
        .agg(countDistinct($"tok").as("v"))
      val scored = bi.filter($"doc_id" % 2 === 1)
        .join(pair, Seq("a", "b"), "left")
        .join(prefix, Seq("a"), "left")
        .crossJoin(broadcast(vocab))
        .withColumn("pred_ppm", expr(
          "((coalesce(cab, 0L) + 1L) * 1000000) div (coalesce(ca, 0L) + v)"))
      scored.groupBy($"doc_id")
        .agg(sum($"k").as("n_bigrams"),
          expr("sum(pred_ppm * k) div sum(k)").as("mean_pred_ppm"),
          min($"pred_ppm").as("min_pred_ppm"))
        .withColumn("keep", ($"mean_pred_ppm" >= 30000L).cast("long"))
        .orderBy($"doc_id")
    },

    // per-doc top-3 distinctive terms by df-normalized term weight — the
    // log-free TF-IDF variant score = tf·10⁶ div df, kept integer so the
    // ranking is bit-identical on any engine (log-based idf ties the
    // result to float rounding). The keyword/topic extraction pass of a
    // curation pipeline. Scale shape: tf is one partial-agg shuffle on
    // (doc, token); df derives from tf (already distinct per doc) with a
    // second partial agg on token; the df join shuffles on token and the
    // top-3 is a per-doc window over ≤|doc's vocab| rows — no global
    // sort, no broadcast of the (corpus-sized) vocabulary.
    "txt_tfidf" -> { (s, d) =>
      import s.implicits._
      // tf feeds BOTH the df aggregation and the final join — Catalyst has
      // no cross-branch CSE, so persist it or the corpus explode+agg runs
      // twice (cache scoped by the caller's clearCache, as documented in
      // SparkEntry)
      val tf = CorpusTokenIndex.tokens(s, d)
        .select($"doc_id", $"tok")
        .filter(length($"tok") > 0)
        .groupBy($"doc_id", $"tok")
        .agg(count(lit(1)).as("tf"))
        .persist()
      val df = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy($"doc_id").orderBy($"score_ppm".desc, $"tok")
      tf.join(df, Seq("tok"))
        .withColumn("score_ppm", expr("(tf * 1000000) div df"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 3)
        .select($"doc_id", $"rnk", $"tok", $"tf", $"df", $"score_ppm")
        .orderBy($"doc_id", $"rnk")
    },

    // skip-gram pair extraction (word-embedding training prep): (center,
    // context) counts for offsets ±1, ±2 over each doc's token stream,
    // top-50 by count with total tie-break. Scale shape: TWO leads over
    // one per-doc window sort (no self-join on position), symmetry by
    // union, then a partial-agg shuffle on the pair key — the top-k is a
    // TakeOrdered, never a global sort of the pair space.
    "txt_skipgrams" -> { (s, d) =>
      import s.implicits._
      skipgramPairs(s, d)
        .groupBy($"center", $"context").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"center", $"context")
        .limit(50)
    },

    // collocation mining on the skip-gram pairs: integer-exact lift
    // (observed/expected co-occurrence, the log-free PMI) per pair with
    // minimum support — which co-occurrences are structure, not chance.
    // Scale shape: pair counts and marginals are chained partial aggs;
    // the marginal joins key on single tokens (vocab-sized sides, AQE
    // decides broadcast); the global total is a 1-row broadcast. Bit
    // budget: the lift numerator n_ab·N·1e6 runs in DECIMAL(38,0) with
    // an exact integral divide — int64 would overflow past N ≈ 3e6
    // window pairs (silently wrapping without ANSI; hard-erroring with
    // it), while 38 digits hold to N ≈ 1e13, i.e. the 100 TB corpus.
    // For positive decimals `div` is the exact floor, so the result is
    // bit-identical to the BIGINT form wherever both are defined.
    "txt_pmi" -> { (s, d) =>
      import s.implicits._
      val counts = skipgramPairs(s, d)
        .groupBy($"center", $"context").agg(count(lit(1)).as("n_ab")).persist()
      val tot = counts.agg(sum($"n_ab").as("nn"))
      val marg = counts.groupBy($"center").agg(sum($"n_ab").as("n_a"))
      counts
        .join(marg.select($"center", $"n_a"), Seq("center"))
        .join(marg.select($"center".as("context"), $"n_a".as("n_b")), Seq("context"))
        .crossJoin(broadcast(tot))
        .filter($"n_ab" >= 10)
        .withColumn("lift_ppm", expr(
          "CAST((CAST(n_ab AS DECIMAL(38,0)) * nn * 1000000) div " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
        .select($"center", $"context", $"n_ab", $"lift_ppm")
        .orderBy($"lift_ppm".desc, $"center", $"context")
        .limit(20)
    },

    // count-min sketch over token frequencies (the third mergeable
    // sketch beside HLL/q30 and the quantile sketch/q33 — and the one
    // that is fully oracle-checkable, because the md5-derived hashes
    // make the sketch deterministic): 4 rows × 1024 buckets, estimates
    // for the exact top-20 tokens side by side with truth. CMS never
    // undercounts (est ≥ exact — asserted in AnalyticsOpsSpec); at
    // 100 TB the 4096-cell sketch is a partial-agg that merges across
    // any partitioning, which is the whole point of carrying one.
    "txt_cms" -> { (s, d) =>
      import s.implicits._
      val W = 1024
      val R = 4
      def bucket(r: Int) = expr(
        s"CAST(conv(substring(md5(concat('$r:', tok)), 1, 8), 16, 10) AS BIGINT) % $W")
      def buckets = explode(array((0 until R).map(r =>
        struct(lit(r.toLong).as("r"), bucket(r).as("bucket"))): _*)).as("rb")
      // aggregate per token FIRST: a CMS cell is the sum of the counts
      // of the tokens hashing into it, so building the sketch from the
      // (tok, count) relation is cell-identical while hashing each
      // DISTINCT token once instead of every corpus occurrence 4×; the
      // exact top-20 shares the same persisted counts
      val tokCounts = CorpusTokenIndex.tokens(s, d)
        .select($"tok")
        .filter(length($"tok") > 0)
        .groupBy($"tok").agg(count(lit(1)).as("n_exact"))
        .persist()
      val sketch = tokCounts.select($"n_exact", buckets)
        .select($"rb.r".as("r"), $"rb.bucket".as("bucket"), $"n_exact")
        .groupBy($"r", $"bucket").agg(sum($"n_exact").as("n"))
      val exact = tokCounts
        .orderBy($"n_exact".desc, $"tok").limit(20)
      exact
        .select($"tok", $"n_exact", buckets)
        .select($"tok", $"n_exact", $"rb.r".as("r"), $"rb.bucket".as("bucket"))
        .join(sketch, Seq("r", "bucket"))
        .groupBy($"tok", $"n_exact").agg(min($"n").as("cms_estimate"))
        .orderBy($"n_exact".desc, $"tok")
    },

    // EXACT heavy-hitter tokens via a Misra-Gries candidate prefilter
    // (the two-pass pattern for "all keys above frequency φ" when the
    // key space — a web corpus's vocabulary — is too wide to shuffle):
    // pass 1 runs the weighted MG summary as a typed Aggregator
    // ([[graft.operators.MisraGries]]) — bounded memory per partition,
    // mergeable partials, NO shuffle of token keys at all; its ≤cap-entry
    // candidate set PROVABLY contains every token with count > N/(cap+1)
    // (MisraGriesSpec asserts the law), so with threshold N div 256 and
    // cap = 512 > 255 completeness is by construction, not probability.
    // Pass 2 broadcast-semi-joins the tiny candidate list against the
    // token index and counts exactly — the only shuffle carries O(cap)
    // candidate keys instead of the vocabulary. Output is exact counts
    // only (deterministic); the summary's internal lower bounds are
    // merge-order-dependent and never surface. The single-row collect is
    // bounded by construction (one MgSummary, ≤cap entries).
    "txt_heavy" -> { (s, d) =>
      import s.implicits._
      val toks = CorpusTokenIndex.tokens(s, d)
        .select($"tok")
        .filter(length($"tok") > 0)
        .as[String]
      val mg = new graft.operators.MisraGries(512)
      val summary = toks.select(mg.toColumn).head()
      val thr = math.max(1L, summary.total / 256L)
      val cand = summary.keys.toSeq.toDF("tok")
      toks.toDF("tok")
        .join(broadcast(cand), Seq("tok"))
        .groupBy($"tok")
        .agg(count(lit(1)).as("n_exact"))
        .filter($"n_exact" >= thr)
        .select($"tok", $"n_exact", lit(summary.total).as("n_total"),
          lit(thr).as("thr"))
        .orderBy($"n_exact".desc, $"tok")
    },

    // per-language document-length decile profile (the distribution
    // audit behind truncation/packing decisions — means hide the bimodal
    // shapes that break a fixed context budget): exact equi-depth decile
    // upper bounds per lang, q50_stats_hist's histogram machinery in its
    // GROUPED form. Scale shape: one (lang, n_chars) partial agg, then
    // lang-partitioned windows over the per-group value histogram and a
    // broadcast 10-row decile sweep — never the corpus.
    "txt_len_deciles" -> { (s, d) =>
      import s.implicits._
      val hist = t(s, d, "documents")
        .groupBy($"lang", $"n_chars").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy($"lang").orderBy($"n_chars")
      val wAll = Window.partitionBy($"lang")
      val c = hist
        .withColumn("cum", sum($"c").over(wCum))
        .withColumn("n", sum($"c").over(wAll))
      val ks = s.range(1, 11).select($"id".as("bucket"))
      c.join(broadcast(ks), lit(true))
        .groupBy($"lang", $"bucket")
        .agg(min(when($"cum" * 10 >= $"n" * $"bucket", $"n_chars")).as("ub"),
          max($"n").as("n_docs"))
        .orderBy($"lang", $"bucket")
    },

    // lexical-diversity profile per source: type/token counts, hapax
    // (once-only) types, integer-ppm type-token and hapax ratios — the
    // vocabulary-growth signal that separates template-generated sources
    // from genuinely diverse ones before mixing. Scale shape: two chained
    // partial aggs ((source, tok) then source); the shuffle carries
    // tokens, never document text, and the output is |sources| rows.
    "txt_hapax" -> { (s, d) =>
      import s.implicits._
      CorpusTokenIndex.tokens(s, d)
        .select($"source", $"tok")
        .filter(length($"tok") > 0)
        .groupBy($"source", $"tok").agg(count(lit(1)).as("n"))
        .groupBy($"source")
        .agg(sum($"n").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when($"n" === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("ttr_ppm", expr("(n_types * 1000000) div n_tokens"))
        .withColumn("hapax_ppm", expr("(n_hapax * 1000000) div n_types"))
        .orderBy($"source")
    },

    // Katz burstiness of the head vocabulary — tf/df per word in exact
    // milli units (Katz 1996: content words CLUMP — high occurrences-
    // per-document-touched; function words spread near 1.0). The
    // corpus-level signal behind stopword-list induction and keyword
    // scoring that raw frequency (txt_heavy) can't give: two words with
    // equal tf but different df are different kinds of words. Scale
    // shape: one (tok) partial agg with an exact distinct on the
    // doc-bounded df, then a TakeOrderedAndProject top-50 (never a
    // global window); unique (tf desc, tok) ordering keeps the LIMIT
    // deterministic.
    "txt_burstiness" -> { (s, d) =>
      import s.implicits._
      CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"tok")
        .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
        .withColumn("burst_milli", expr("(tf * 1000) div df"))
        .orderBy($"tf".desc, $"tok")
        .limit(50)
    },

    // quality-by-length calibration table — the evidence behind a
    // Gopher-style length floor (length FEEDS the quality score, so the
    // filter threshold should be read off this table, not guessed: if
    // the short bands still score high the floor is wrong for this
    // corpus): per power-of-2 token-count band, docs and floored
    // mean / min / max quality ppm. Scale shape: one narrow scoring
    // pass, partial agg onto the ≤64-band space, no windows.
    "txt_quality_by_len" -> { (s, d) =>
      import s.implicits._
      qualityScored(t(s, d, "documents"))
        .select($"n_tok", floor($"score" * lit(1000000.0) + lit(0.5)).cast("long").as("q_ppm"))
        .withColumn("band", expr(
          "CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT) ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_docs"), sum($"q_ppm").as("sq"),
          min($"q_ppm").as("min_q_ppm"), max($"q_ppm").as("max_q_ppm"))
        .select($"band", $"n_docs", expr("sq div n_docs").as("mean_q_ppm"),
          $"min_q_ppm", $"max_q_ppm")
        .orderBy($"band")
    },

    // source × language composition grid — the first table on every
    // data card (what each crawl source actually contains, doc AND
    // character mass; txt_langid scores the label's trustworthiness,
    // this LEDGERS it): counts, char mass, exact ppm share within the
    // source. Scale shape: one narrow 3-column projection, partial agg
    // onto the |sources|×|langs| grid, share window over that bounded
    // relation.
    "txt_lang_grid" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"source", $"lang", $"n_chars")
        .groupBy($"source", $"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars".cast("long")).as("n_chars"))
        .withColumn("src_n", sum($"n_docs").over(Window.partitionBy($"source")))
        .select($"source", $"lang", $"n_docs",
          expr("(n_docs * 1000000) div src_n").as("share_ppm"), $"n_chars")
        .orderBy($"source", $"lang")
    },

    // megadoc-concentration audit — what share of each source's TOKEN
    // mass sits in its top-decile longest docs (a source whose mass is
    // three megadocs needs chunking/doc-length caps before its "token
    // count" means anything in a mixture; txt_len_deciles shows the
    // quantiles, this shows the MASS): per source, docs, tokens, the
    // top max(1, ⌊10 %⌋) docs' token mass + exact ppm share (floored
    // decile with a 1-doc floor — code and oracle agree on
    // GREATEST(1, nd div 10)). Scale shape: one
    // narrow token-count projection, a per-source rank window with a
    // unique (len desc, doc_id) ordering, |sources|-row rollup.
    "txt_len_topshare" -> { (s, d) =>
      import s.implicits._
      val tok = t(s, d, "documents")
        .select($"source", $"doc_id", size(split($"text", " +")).cast("long").as("n_tok"))
      val wk = Window.partitionBy($"source")
      val wr = Window.partitionBy($"source").orderBy($"n_tok".desc, $"doc_id")
      tok.withColumn("rnk", row_number().over(wr).cast("long"))
        .withColumn("nd", count(lit(1)).over(wk))
        .groupBy($"source")
        .agg(max($"nd").as("n_docs"), sum($"n_tok").as("n_tokens"),
          sum(when($"rnk" <= greatest(lit(1L), expr("nd div 10")), $"n_tok")
            .otherwise(0L)).as("top_tokens"))
        .withColumn("top_share_ppm", expr("(top_tokens * 1000000) div n_tokens"))
        .orderBy($"source")
    },

    // head-vocabulary mass curve — token mass covered by the top-k word
    // types at k ∈ {1, 5, 10, 25} (the one table that sizes stopword
    // cuts, CMS widths and cache tiers: a 90 %-at-k=10 corpus is a
    // different engineering problem than a flat one; txt_zipf fits the
    // exponent, this reads the mass off directly): exact ppm per k,
    // deterministic (count desc, tok) ranking. Scale shape: one token
    // partial agg onto the vocabulary, then a DISTRIBUTED top-25
    // (TakeOrderedAndProject under the unique (n desc, tok) order —
    // never a rank window: the vocabulary grows with the corpus, so a
    // constant-partition window here would funnel billions of rows
    // through one task at 100 TB). The 25 head types pack into ONE
    // bounded array row; each k's mass is a slice-fold over it and the
    // corpus total rides in on a 1-row aggregate crossJoin.
    "txt_head_mass" -> { (s, d) =>
      import s.implicits._
      val tf = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"tok").agg(count(lit(1)).as("n"))
      val top = tf.orderBy($"n".desc, $"tok").limit(25)
        .agg(sort_array(collect_list(struct((-$"n").as("neg_n"), $"tok"))).as("head"))
      val tot = tf.agg(sum($"n").as("tt"))
      top.crossJoin(tot)
        .filter(size($"head") > 0)
        .select(explode(expr("array(1, 5, 10, 25)")).as("ki"), $"head", $"tt")
        .select($"ki".cast("long").as("k"),
          least($"ki", size($"head")).cast("long").as("n_types"),
          $"tt".as("n_tokens"),
          expr("aggregate(slice(head, 1, ki), 0L, (acc, x) -> acc - x.neg_n)")
            .as("head_tokens"))
        .withColumn("head_share_ppm", expr("(head_tokens * 1000000) div n_tokens"))
        .orderBy($"k")
    },

    // per-source unigram entropy — the mixture-diversity number next to
    // txt_hapax's TTR (low-entropy sources are template mills; the
    // normalized form is comparable across vocabulary sizes). Exact
    // integer micro-nats end to end: H = ln N − (Σ c·ln c)/N with every
    // ln the native fixed-point ln_micro kernel (zero libm) and the sum
    // DECIMAL(38,0), so the oracle replays bit-identically (FixedLnSql).
    // Scale shape: two chained partial aggs ((source, tok) then source);
    // ln_micro is a narrow codegen'd expression per vocabulary row;
    // output is |sources| rows.
    "txt_entropy" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
        .groupBy($"source").agg(
          sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum($"c".cast(dec) * expr("ln_micro(c)")).as("slc"))
        .withColumn("entropy_micro",
          expr("ln_micro(n_tokens) - (slc div CAST(n_tokens AS DECIMAL(38,0)))").cast("long"))
        .withColumn("norm_ppm",
          when($"n_types" === 1, 0L)
            .otherwise(expr("(entropy_micro * 1000000) div ln_micro(n_types)")))
        .select($"source", $"n_tokens", $"n_types", $"entropy_micro", $"norm_ppm")
        .orderBy($"source")
    },

    // per-source readability (integer Flesch reading-ease): 206.835 −
    // 1.015·(words/sentences) − 84.6·(syllables/words), in exact
    // milli-units over per-source TOTALS (never an average of per-doc
    // scores, so no negative-value division anywhere — the two ratio
    // terms divide positive sums and the subtraction happens after).
    // Syllables are the deterministic vowel-group proxy
    // ([aeiouy]+ runs), sentences the [.!?]+ splits — both pure regexp
    // counts any engine reproduces exactly. Scale shape: one narrow
    // corpus pass computing three per-doc counts, then a |sources|-row
    // partial agg.
    "txt_readability" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      t(s, d, "documents")
        .select($"source",
          expr("greatest(CAST(size(filter(split(text, '[.!?]+'), x -> length(trim(x)) > 0)) AS BIGINT), 1L)").as("s_cnt"),
          expr("greatest(CAST(size(filter(split(text, ' +'), x -> length(x) > 0)) AS BIGINT), 1L)").as("w_cnt"),
          expr("CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)").as("y_cnt"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"s_cnt").as("n_sentences"),
          sum($"w_cnt").as("n_words"),
          sum($"y_cnt").as("n_syllables"))
        .withColumn("flesch_milli",
          (lit(206835L)
            - expr("(1015 * CAST(n_words AS DECIMAL(38,0))) div CAST(n_sentences AS DECIMAL(38,0))")
            - expr("(84600 * CAST(n_syllables AS DECIMAL(38,0))) div CAST(n_words AS DECIMAL(38,0))"))
            .cast("long"))
        .select($"source", $"n_docs", $"n_sentences", $"n_words", $"n_syllables", $"flesch_milli")
        .orderBy($"source")
    },

    // per-source conditional next-token entropy H(next | token) — the
    // sequence-predictability twin of txt_entropy (a source whose
    // unigram entropy is healthy can still be templated: its bigrams
    // give the game away when H(next|token) collapses). Exact integer
    // micro-nats: Σ c_ab·(ln c_a − ln c_ab) / N with the native
    // ln_micro kernel; c_a ≥ c_ab termwise so the gap sum is
    // non-negative. Scale shape: the tokenize-once index's per-doc lead
    // window (doc-partitioned, exchange-free on the bucketed index),
    // one (source, a, b) partial agg, a (source, a) prefix rollup joined
    // back on its own grouping key, then a |sources|-row rollup.
    "txt_cond_entropy" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val w = Window.partitionBy($"doc_id").orderBy($"i")
      val bi = CorpusTokenIndex.tokens(s, d)
        .select($"source", $"doc_id", $"pos".as("i"), $"tok".as("a"))
        .withColumn("b", lead($"a", 1).over(w))
        .filter($"b".isNotNull)
        .groupBy($"source", $"a", $"b").agg(count(lit(1)).as("cab"))
      val prefix = bi.groupBy($"source", $"a").agg(sum($"cab").as("ca"))
      bi.join(prefix, Seq("source", "a"))
        .groupBy($"source")
        .agg(sum($"cab").as("n_bigrams"),
          sum($"cab".cast(dec) * (expr("ln_micro(ca)") - expr("ln_micro(cab)"))).as("s_gap"))
        .withColumn("cond_entropy_micro",
          expr("(s_gap div CAST(n_bigrams AS DECIMAL(38,0)))").cast("long"))
        .select($"source", $"n_bigrams", $"cond_entropy_micro")
        .orderBy($"source")
    },

    // per-source KL divergence from the corpus unigram distribution —
    // the drift audit behind mixture weighting (DSIR's denominator
    // intuition as a per-source scalar: how far does each source's
    // token distribution sit from the pool it feeds?). Factored form
    // keeps it overflow-free at any scale: KL = ln Q − ln N_s +
    // (Σ c·(ln c − ln q))/N_s, so only per-count ln_micro values are
    // summed (no c·Q products); c ≤ q termwise makes the summed gap
    // Σ c·(ln q − ln c) non-negative — no negative floor-division trap.
    // Scale shape: the (source, tok) partial agg joins the |vocab|-row
    // corpus-count relation on tok (co-keyed shuffle), one per-source
    // rollup, and the corpus total as a window over the |sources|-row
    // aggregate; output is |sources| rows.
    "txt_kl" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val tc = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      val q = tc.groupBy($"tok").agg(sum($"c").as("qc"))
      tc.join(q, Seq("tok"))
        .groupBy($"source").agg(
          sum($"c").as("n_tokens"),
          sum($"c".cast(dec) * (expr("ln_micro(qc)") - expr("ln_micro(c)"))).as("s_gap"))
        .withColumn("q_total", sum($"n_tokens").over(Window.partitionBy(lit(1))))
        .withColumn("kl_micro",
          expr("ln_micro(q_total) - ln_micro(n_tokens) - (s_gap div CAST(n_tokens AS DECIMAL(38,0)))")
            .cast("long"))
        .select($"source", $"n_tokens", $"kl_micro")
        .orderBy($"source")
    },

    // vocabulary COVERAGE curve — the tokenizer-budget question: how many
    // of the most frequent types cover 50 / 90 / 99 % of all token
    // occurrences? The cumulative rank over the (freq desc, tok) order is
    // a TWO-LEVEL distributed prefix sum, because a single global window
    // would funnel the whole vocabulary through one task: level 1 ranks
    // WITHIN each frequency band (window partitioned by the count value —
    // every row in a band adds the same n, so cum-in-band = rank·n);
    // level 2 prefixes the band totals over the distinct-counts relation,
    // which is O(√total-tokens) rows by construction (d distinct positive
    // counts sum to ≥ d(d+1)/2 ≤ total) — the one whitelisted global
    // window, over a provably sublinear relation. The three thresholds
    // are conditional min-aggregates over the per-type cumulative ranks;
    // output is one row.
    "txt_coverage" -> { (s, d) =>
      import s.implicits._
      val tf = CorpusTokenIndex.tokens(s, d)
        .groupBy($"tok").agg(count(lit(1)).as("n"))
      val wBand = Window.partitionBy($"n").orderBy($"tok")
      val ranked = tf.withColumn("rn", row_number().over(wBand).cast("long"))
      val bands = tf.groupBy($"n")
        .agg(count(lit(1)).as("band_types"))
        .withColumn("band_freq", $"n" * $"band_types")
      val wPfx = Window.orderBy($"n".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val pfx = bands
        .withColumn("types_before", coalesce(sum($"band_types").over(wPfx), lit(0L)))
        .withColumn("freq_before", coalesce(sum($"band_freq").over(wPfx), lit(0L)))
        .select($"n", $"types_before", $"freq_before")
      val cum = ranked.join(pfx, Seq("n"))
        .select(($"types_before" + $"rn").as("type_rank"),
          ($"freq_before" + $"rn" * $"n").as("cum_freq"))
      val tot = tf.agg(sum($"n").as("total_tokens"),
        count(lit(1)).as("n_types")).withColumn("one", lit(1))
      cum.withColumn("one", lit(1)).join(tot, Seq("one"))
        .groupBy($"total_tokens", $"n_types")
        .agg(min(when($"cum_freq" * 100 >= $"total_tokens" * 50, $"type_rank")).as("types_50pct"),
          min(when($"cum_freq" * 100 >= $"total_tokens" * 90, $"type_rank")).as("types_90pct"),
          min(when($"cum_freq" * 100 >= $"total_tokens" * 99, $"type_rank")).as("types_99pct"))
        .select($"total_tokens", $"n_types",
          $"types_50pct", $"types_90pct", $"types_99pct")
    },

    // tokenizer-fertility profile per language (the multilingual-budget
    // audit: a tokenizer that spends 2× the bytes per token on one
    // language silently halves that language's effective context) —
    // chars/bytes per whitespace token and tokens per doc, integer-ppm.
    // Scale shape: one narrow corpus pass computing three per-row
    // lengths, then a |langs|-row partial agg; the shuffle carries five
    // longs per language.
    "txt_fertility" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"lang",
          size(split($"text", " +")).cast("long").as("n_tok"),
          length($"text").cast("long").as("n_chr"),
          expr("octet_length(text)").cast("long").as("n_byt"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tokens"),
          sum($"n_chr").as("n_chars"),
          sum($"n_byt").as("n_bytes"))
        .withColumn("chars_per_tok_ppm", expr("(n_chars * 1000000) div n_tokens"))
        .withColumn("bytes_per_tok_ppm", expr("(n_bytes * 1000000) div n_tokens"))
        .withColumn("toks_per_doc_ppm", expr("(n_tokens * 1000000) div n_docs"))
        .orderBy($"lang")
    },

    // Zipf-fit audit: OLS of ln(freq) on ln(rank) over the top-100
    // vocabulary types — the one-row corpus health check (natural text
    // slopes ≈ −1; template-generated or boilerplate-heavy corpora bend
    // away). Numeric determinism is now CONSTRUCTED, not empirical: the
    // ln's are the native ln_micro fixed-point expression (FixedLnOps —
    // exact 64-bit integer algorithm, zero libm calls), the oracle
    // replays the identical integer steps (FixedLnSql), so every
    // sum/product in the normal equations is bit-identical across
    // engines by construction — the same guarantee class as q52_regr's
    // all-integer pipeline. The final slope/intercept/r² are single IEEE
    // divisions of exact integers. Scale shape: vocabulary partial agg,
    // a distributed top-100 (TakeOrdered, no global sort), then a window
    // over the 100-row relation.
    "txt_zipf" -> { (s, d) =>
      import s.implicits._
      val tf = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"tok").agg(count(lit(1)).as("n"))
      val top = tf.orderBy($"n".desc, $"tok").limit(100)
      val wr = Window.orderBy($"n".desc, $"tok")
      val pts = top
        .withColumn("r", row_number().over(wr).cast("long"))
        .select(expr("ln_micro(r)").as("x"), expr("ln_micro(n)").as("y"))
      pts
        .agg(count(lit(1)).as("k"), sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
          sum($"y" * $"y").as("syy"))
        .withColumn("num", $"k" * $"sxy" - $"sx" * $"sy")
        .withColumn("den", $"k" * $"sxx" - $"sx" * $"sx")
        .withColumn("deny", $"k" * $"syy" - $"sy" * $"sy")
        .withColumn("slope", $"num".cast("double") / $"den".cast("double"))
        .select($"k".as("n_points"),
          floor($"slope" * lit(1000000.0) + lit(0.5)).cast("long").as("slope_ppm"),
          floor((($"sy".cast("double") - $"slope" * $"sx".cast("double")) / $"k".cast("double"))
            + lit(0.5)).cast("long").as("intercept_micro"),
          floor(($"num".cast("double") * $"num".cast("double"))
            / ($"den".cast("double") * $"deny".cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long").as("r2_ppm"))
    },

    // token burstiness (Church's "one sighting breeds more" dispersion
    // law — the Fano factor of per-doc counts over ALL docs, absent docs
    // counting 0): function words land near the Poisson floor (~1),
    // topical words far above it — the signal that separates them for
    // stopword and keyword policies. Exact integer end to end: milli
    // factor = (1000·(N·Σx² − (Σx)²)) div (N·Σx), every term
    // DECIMAL(38,0) (milli, not ppm, keeps the worst-case product under
    // 38 digits at cluster scale). Scale shape: one (tok, doc) partial
    // agg off the bucketed token index, one tok rollup, a distributed
    // top-20 (TakeOrdered, no global sort), the 1-row doc count
    // broadcast.
    "txt_fano" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      val stats = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"tok", $"doc_id").agg(count(lit(1)).as("c"))
        .groupBy($"tok").agg(
          sum($"c").as("total"),
          count(lit(1)).as("n_docs_with"),
          sum($"c".cast(dec) * $"c").as("ssq"))
      val top = stats.orderBy($"total".desc, $"tok").limit(20)
      val nDocs = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      top.crossJoin(broadcast(nDocs))
        .select($"tok", $"total", $"n_docs_with", $"n_docs",
          expr("""(1000 * (CAST(n_docs AS DECIMAL(38,0)) * ssq
                    - CAST(total AS DECIMAL(38,0)) * total))
                  div (CAST(n_docs AS DECIMAL(38,0)) * total)""").as("fano_milli"))
        .orderBy($"total".desc, $"tok")
    },

    // Simpson diversity index per language (the lexical-diversity twin of
    // txt_zipf's rank law): the probability two tokens drawn without
    // replacement are the same type, D = Σ nᵢ(nᵢ−1) / (N(N−1)) — EXACT
    // integer arithmetic end to end (the collision count is a
    // DECIMAL(38,0) sum, the ppm is one integer floor division), unlike
    // an entropy score whose per-engine log rounding could drift. Scale
    // shape: one (lang, token) partial-agg shuffle (map-side combined —
    // the same vocabulary-sized reduce as txt_vocab), then a |langs|-row
    // final agg; nothing is ever per-document wide.
    // cross-language vocabulary overlap (the multilingual-corpus audit:
    // high token Jaccard between two "languages" flags mislabeled or
    // code-mixed sources before per-language budgets are trusted): exact
    // per-pair |A∩B| / |A∪B| in ppm over the distinct-token vocabularies.
    // Scale shape: one (lang, token) distinct shuffle builds the
    // vocabulary; the pair counts come from ONE more token-keyed
    // partial agg (each token contributes its C(langs-with-it, 2) pairs
    // via a per-row combination explode, bounded by |langs|² = constant),
    // never a vocabulary self-join; all-pairs completeness via the
    // |langs|²-row frame built from the size relation.
    "txt_lang_overlap" -> { (s, d) =>
      import s.implicits._
      // token index read for the same reason as txt_simpson/txt_fano
      val vocab = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .select($"lang", $"tok".as("w"))
        .distinct()
      val sizes = vocab.groupBy($"lang").agg(count(lit(1)).as("n"))
      // per token: the sorted list of langs containing it → its C(k,2)
      // pair contributions (k ≤ |langs|, a constant-bounded explode)
      val common = vocab.groupBy($"w")
        .agg(sort_array(collect_set($"lang")).as("ls"))
        .select(explode(expr(
          """flatten(transform(ls, (a, i) ->
             |  transform(slice(ls, i + 2, size(ls)), b -> struct(a AS lang_a, b AS lang_b))))"""
            .stripMargin)).as("p"))
        .groupBy($"p.lang_a".as("lang_a"), $"p.lang_b".as("lang_b"))
        .agg(count(lit(1)).as("n_common"))
      val frame = sizes.select($"lang".as("lang_a"), $"n".as("n_a"))
        .crossJoin(sizes.select($"lang".as("lang_b"), $"n".as("n_b")))
        .filter($"lang_a" < $"lang_b")
      frame.join(common, Seq("lang_a", "lang_b"), "left")
        .withColumn("n_common", coalesce($"n_common", lit(0L)))
        .select($"lang_a", $"lang_b", $"n_a", $"n_b", $"n_common",
          expr("(1000000 * n_common) div (n_a + n_b - n_common)").as("jaccard_ppm"))
        .orderBy($"lang_a", $"lang_b")
    },

    // source-pair vocabulary Jaccard — txt_lang_overlap's machinery on
    // the SOURCE axis (two "different" sources sharing most of their
    // vocabulary are the same crawl in disguise — the mirror-site smell
    // at the vocabulary level, upstream of dd_source_overlap's exact-dup
    // view): exact |A∩B|/|A∪B| ppm per source pair, pair counts from
    // ONE token-keyed partial agg (each token explodes its C(k,2)
    // source pairs, k ≤ |sources| constant) — never a vocabulary
    // self-join; all-pairs completeness from the |sources|²-row frame.
    "txt_src_overlap" -> { (s, d) =>
      import s.implicits._
      val vocab = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .select($"source", $"tok".as("w"))
        .distinct()
      val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("n"))
      val common = vocab.groupBy($"w")
        .agg(sort_array(collect_set($"source")).as("ss"))
        .select(explode(expr(
          """flatten(transform(ss, (a, i) ->
             |  transform(slice(ss, i + 2, size(ss)), b -> struct(a AS src_a, b AS src_b))))"""
            .stripMargin)).as("p"))
        .groupBy($"p.src_a".as("src_a"), $"p.src_b".as("src_b"))
        .agg(count(lit(1)).as("n_common"))
      val frame = sizes.select($"source".as("src_a"), $"n".as("n_a"))
        .crossJoin(sizes.select($"source".as("src_b"), $"n".as("n_b")))
        .filter($"src_a" < $"src_b")
      frame.join(common, Seq("src_a", "src_b"), "left")
        .withColumn("n_common", coalesce($"n_common", lit(0L)))
        .select($"src_a", $"src_b", $"n_a", $"n_b", $"n_common",
          expr("(1000000 * n_common) div (n_a + n_b - n_common)").as("jaccard_ppm"))
        .orderBy($"src_a", $"src_b")
    },

    "txt_simpson" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      // reads the materialized token index (definitionally identical to
      // the inline split+explode — TokenIndexSpec — so the oracle's
      // inline tokenization is unchanged; saves the corpus-wide
      // re-tokenization pass)
      CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .select($"lang", $"tok".as("w"))
        .groupBy($"lang", $"w").agg(count(lit(1)).as("n"))
        .groupBy($"lang").agg(
          sum($"n").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum($"n".cast(dec) * ($"n" - 1)).as("coll"))
        .select($"lang", $"n_tokens", $"n_types",
          when($"n_tokens" > 1,
            expr("""(CAST(1000000 AS DECIMAL(38,0)) * coll)
                    div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))"""))
            .otherwise(0L).as("simpson_ppm"))
        .orderBy($"lang")
    },

    // Heaps-law vocabulary-growth curve (is the crawl still yielding new
    // types, or has the corpus saturated?): the doc_id axis cut into 10
    // equal id-RANGE slices — ingest order, no global rank sort — each
    // checkpoint reporting docs/tokens seen so far and the exact
    // cumulative vocabulary (a type counts at the slice of its FIRST
    // occurrence, via one min-agg over the token index). Scale shape:
    // one narrow per-doc projection, one per-type min partial agg, then
    // everything runs on the 10-row slice spine.
    "txt_heaps" -> { (s, d) =>
      import s.implicits._
      val docs = t(s, d, "documents")
        .select($"doc_id", size(split($"text", " +")).cast("long").as("n_tok"))
      val bounds = docs.agg(min($"doc_id").as("lo"),
        (max($"doc_id") - min($"doc_id") + lit(1L)).as("span"))
      val perb = docs.crossJoin(broadcast(bounds))
        .groupBy(expr("((doc_id - lo) * 10) div span").as("b"))
        .agg(count(lit(1)).as("nd"), sum($"n_tok").as("nt"))
      val newTypes = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"tok").agg(min($"doc_id").as("fd"))
        .crossJoin(broadcast(bounds))
        .groupBy(expr("((fd - lo) * 10) div span").as("b"))
        .agg(count(lit(1)).as("nv"))
      val spine = bounds.select(explode(sequence(lit(0L), lit(9L))).as("b"))
      val w = Window.orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine
        .join(perb, Seq("b"), "left")
        .join(newTypes, Seq("b"), "left")
        .select($"b", coalesce($"nd", lit(0L)).as("nd"),
          coalesce($"nt", lit(0L)).as("nt"), coalesce($"nv", lit(0L)).as("nv"))
        .select(($"b" + 1L).as("decile"),
          sum($"nd").over(w).as("n_docs"),
          sum($"nt").over(w).as("cum_tokens"),
          sum($"nv").over(w).as("vocab"),
          $"nv".as("new_types"))
        .orderBy($"decile")
    },

    // per-language character-class mass profile (the encoding/OCR-noise
    // audit a multilingual corpus runs before trusting its language
    // labels: a "language" whose mass is mostly digits or symbols is a
    // mislabeled log dump): letters / digits / spaces / other as exact
    // counts + ppm of the language's character mass. Counts come from
    // length deltas of class-stripped text — narrow codegen'd per-row
    // work, one partial-agg shuffle onto the |langs| key space.
    "txt_char_classes" -> { (s, d) =>
      import s.implicits._
      def stripped(pat: String) =
        (length($"text") - length(regexp_replace($"text", pat, ""))).cast("long")
      t(s, d, "documents")
        .select($"lang", length($"text").cast("long").as("nc"),
          stripped("[a-z]").as("al"), stripped("[0-9]").as("dg"),
          stripped(" ").as("sp"))
        .groupBy($"lang")
        .agg(sum($"nc").as("n_chars"), sum($"al").as("n_alpha"),
          sum($"dg").as("n_digit"), sum($"sp").as("n_space"))
        .filter($"n_chars" > 0)
        .select($"lang", $"n_chars", $"n_alpha", $"n_digit", $"n_space",
          ($"n_chars" - $"n_alpha" - $"n_digit" - $"n_space").as("n_other"),
          // DECIMAL-guarded: a per-lang char mass past ~9·10¹² would
          // wrap the 10⁶ ppm product in a long
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_alpha) div CAST(n_chars AS DECIMAL(38,0))").as("alpha_ppm"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_digit) div CAST(n_chars AS DECIMAL(38,0))").as("digit_ppm"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_space) div CAST(n_chars AS DECIMAL(38,0))").as("space_ppm"))
        .orderBy($"lang")
    },

    // per-language token-length histogram (the tokenizer-budget shape
    // behind txt_fertility's single ratio: a language whose mass sits in
    // long tokens fragments worse under any subword scheme): exact
    // counts + ppm share per (lang, length) — lengths are bounded by the
    // longest word, so the key space is tiny whatever the corpus size.
    // Scale shape: one column-pruned token-index read, one partial agg.
    "txt_word_len_hist" -> { (s, d) =>
      import s.implicits._
      val g = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"lang", length($"tok").cast("long").as("len"))
        .agg(count(lit(1)).as("n"))
      val tot = g.groupBy($"lang").agg(sum($"n").as("t"))
      g.join(tot, Seq("lang"))
        .select($"lang", $"len", $"n",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n) div CAST(t AS DECIMAL(38,0))")
            .as("share_ppm"))
        .orderBy($"lang", $"len")
    },

    // C4/Gopher-style filter FUNNEL per source (txt_quality scores docs;
    // this reports what each curation rule would actually cut, per
    // source — the report that decides which rules to tune before a big
    // run): five independent rules + the conjunction, every ratio test
    // cross-multiplied so it is exact integer math (no float mean-word-
    // length or TTR). Scale shape: one narrow projection with codegen'd
    // array HOFs per row, one |sources| partial agg — no shuffle beyond
    // the final agg, no token explode.
    "txt_filter_funnel" -> { (s, d) =>
      import s.implicits._
      graft.Tables.t(s, d, "documents")
        .select($"source",
          expr("size(filter(split(text, ' +'), x -> length(x) > 0))").as("n_tok"),
          expr("length(replace(text, ' ', ''))").as("tok_chars"),
          expr("size(filter(split(text, ' +'), x -> x IN ('the','a','of','and','to','in')))").as("n_stop"),
          expr("size(array_distinct(filter(split(text, ' +'), x -> length(x) > 0)))").as("n_dist"),
          expr("length(text) - length(regexp_replace(text, '[0-9]', ''))").as("n_digit"),
          $"n_chars")
        .select($"source",
          ($"n_tok" >= 16 && $"n_tok" <= 256).as("f_len"),
          ($"tok_chars" >= $"n_tok" * 3 && $"tok_chars" <= $"n_tok" * 8).as("f_wordlen"),
          ($"n_stop" * 25 >= $"n_tok").as("f_stop"),
          ($"n_dist" * 2 >= $"n_tok").as("f_ttr"),
          ($"n_digit" * 10 <= $"n_chars").as("f_digit"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"f_len", 1L).otherwise(0L)).as("n_len"),
          sum(when($"f_wordlen", 1L).otherwise(0L)).as("n_wordlen"),
          sum(when($"f_stop", 1L).otherwise(0L)).as("n_stop"),
          sum(when($"f_ttr", 1L).otherwise(0L)).as("n_ttr"),
          sum(when($"f_digit", 1L).otherwise(0L)).as("n_digit"),
          sum(when($"f_len" && $"f_wordlen" && $"f_stop" && $"f_ttr" && $"f_digit",
            1L).otherwise(0L)).as("n_all"))
        .withColumn("pass_all_ppm", expr("(n_all * 1000000) div n_docs"))
        .orderBy($"source")
    },

    // per-source keyness: the top-5 OVER-represented tokens by the exact
    // representation ratio P(tok|source)/P(tok) in ppm (the corpus-mix
    // fingerprint — which vocabulary a source floods relative to the
    // whole corpus; a log-odds score would carry per-engine log
    // rounding, the raw ratio is one integer division). Min support
    // o ≥ 5 keeps noise tokens out. Scale shape: a (source, tok) and a
    // tok partial agg off the bucketed token index, the |sources| and
    // 1-row totals broadcast, top-5 via a source-partitioned window over
    // the already-aggregated relation. o·tc·10⁶ multiplies in
    // DECIMAL(38,0) (≤10³⁵ at any plausible corpus).
    "txt_keyness" -> { (s, d) =>
      import s.implicits._
      val toks = CorpusTokenIndex.tokens(s, d).filter(length($"tok") > 0)
        .select($"source", $"tok")
      val st = toks.groupBy($"source", $"tok").agg(count(lit(1)).as("o"))
        .filter($"o" >= 5)
      val tt = toks.groupBy($"tok").agg(count(lit(1)).as("t"))
      val ss = toks.groupBy($"source").agg(count(lit(1)).as("sc"))
      val tot = toks.agg(count(lit(1)).as("tc"))
      val w = Window.partitionBy($"source").orderBy($"keyness_ppm".desc, $"tok")
      st.join(tt, Seq("tok")).join(broadcast(ss), Seq("source"))
        .crossJoin(broadcast(tot))
        .withColumn("keyness_ppm",
          expr("(CAST(o AS DECIMAL(38,0)) * tc * 1000000) div (CAST(t AS DECIMAL(38,0)) * sc)"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 5)
        .select($"source", $"tok", $"o", $"keyness_ppm", $"rnk")
        .orderBy($"source", $"rnk")
    },

    // per-language CHARACTER-level entropy — the encoding/OCR-noise
    // audit that complements txt_char_classes' class masses with one
    // number (garbled bytes inflate it toward ln|alphabet|; a
    // single-glyph dump collapses it): exact integer micro-nats via the
    // ln_micro kernel (H = ln N − Σ c·ln c / N, every term non-negative,
    // DECIMAL(38,0) sums — oracle replays bit-identically). Scale shape:
    // one narrow char explode, a (lang, char) partial agg onto the
    // alphabet-bounded key space, a |langs|-row rollup.
    "txt_char_entropy" -> { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      t(s, d, "documents")
        .select($"lang", explode(expr("regexp_extract_all(text, '(.)', 1)")).as("ch"))
        .groupBy($"lang", $"ch").agg(count(lit(1)).as("c"))
        .groupBy($"lang").agg(
          sum($"c").as("n_chars"),
          count(lit(1)).as("n_distinct"),
          sum($"c".cast(dec) * expr("ln_micro(c)")).as("slc"))
        .withColumn("h_micro",
          expr("ln_micro(n_chars) - (slc div CAST(n_chars AS DECIMAL(38,0)))").cast("long"))
        .select($"lang", $"n_chars", $"n_distinct", $"h_micro")
        .orderBy($"lang")
    },

    // per-source document-START concentration — the template detector
    // the body-level audits miss (a crawler that prepends the same
    // header to every page shows up as one first-token dominating a
    // source long before the body dupes enough to trip dedup): top-5
    // first tokens per source by doc count with exact ppm share of the
    // source's docs. First token = the min-pos non-empty token per doc
    // (one min_by over the unique pos axis — deterministic). Scale
    // shape: the per-doc argmin is a doc-keyed partial agg off the
    // bucketed token index (no window over the corpus), the counts land
    // on a ≤\|sources\|·\|vocab-heads\| space, and the top-5 window
    // partitions by source over that bounded relation.
    "txt_doc_starts" -> { (s, d) =>
      import s.implicits._
      val firsts = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"doc_id")
        .agg(min_by(struct($"tok", $"source"), $"pos").as("f"))
        .select($"f.tok".as("tok"), $"f.source".as("source"))
      val cnt = firsts.groupBy($"source", $"tok").agg(count(lit(1)).as("n_docs"))
        .withColumn("src_docs", sum($"n_docs").over(Window.partitionBy($"source")))
      val w = Window.partitionBy($"source").orderBy($"n_docs".desc, $"tok")
      cnt.withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 5)
        .select($"source", $"rnk", $"tok", $"n_docs", $"src_docs",
          expr("(n_docs * 1000000) div src_docs").as("share_ppm"))
        .orderBy($"source", $"rnk")
    },

    // boilerplate FOOTER detector — txt_doc_starts' tail-end twin (a
    // crawl source stamping every page with the same closing token —
    // signatures, nav footers, "click here" — shows up as one LAST
    // token dominating; headers and footers are different boilerplate
    // with different scrub rules, so both ends get their own audit):
    // per source, the top-5 most-common document-final tokens + ppm
    // share. Same max_by-on-pos partial agg shape over the token index,
    // bounded rank window.
    "txt_doc_ends" -> { (s, d) =>
      import s.implicits._
      val lasts = CorpusTokenIndex.tokens(s, d)
        .filter(length($"tok") > 0)
        .groupBy($"doc_id")
        .agg(max_by(struct($"tok", $"source"), $"pos").as("f"))
        .select($"f.tok".as("tok"), $"f.source".as("source"))
      val cnt = lasts.groupBy($"source", $"tok").agg(count(lit(1)).as("n_docs"))
        .withColumn("src_docs", sum($"n_docs").over(Window.partitionBy($"source")))
      val w = Window.partitionBy($"source").orderBy($"n_docs".desc, $"tok")
      cnt.withColumn("rnk", row_number().over(w).cast("long"))
        .filter($"rnk" <= 5)
        .select($"source", $"rnk", $"tok", $"n_docs", $"src_docs",
          expr("(n_docs * 1000000) div src_docs").as("share_ppm"))
        .orderBy($"source", $"rnk")
    },

    // duplicate-LINE mass per source — the boilerplate-line audit a web
    // corpus runs before line-level scrubbing (nav bars, footers and
    // cookie banners repeat as LINES across pages long before whole
    // documents repeat; dd_exact sees none of it): per source, lines,
    // distinct lines, mass sitting in repeated lines + exact ppm.
    // Scale shape: lines are grouped by their md5 (16-byte keys shuffle,
    // never the line text), one (source, hash) partial agg, |sources|
    // rollup.
    "txt_dup_lines" -> { (s, d) =>
      import s.implicits._
      val lc = t(s, d, "documents")
        .select($"source", explode(split($"text", "\n")).as("line"))
        .select($"source", md5(trim($"line")).as("h"), length(trim($"line")).as("len"))
        .filter($"len" > 0)
        .groupBy($"source", $"h").agg(count(lit(1)).as("c"))
      lc.groupBy($"source")
        .agg(sum($"c").as("n_lines"), count(lit(1)).as("n_distinct"),
          sum(when($"c" > 1, $"c").otherwise(0L)).as("n_dup_lines"))
        .select($"source", $"n_lines", $"n_distinct", $"n_dup_lines",
          expr("(n_dup_lines * 1000000) div n_lines").as("dup_ppm"))
        .orderBy($"source")
    },

    // lexical-diversity curve by document length — the TTR-vs-length
    // confound made explicit (raw type-token ratio ALWAYS falls with
    // length, so a single corpus-wide TTR — txt_hapax's ttr_ppm —
    // conflates short docs with diverse ones; banding by ⌊log₂ tokens⌋
    // shows diversity at equal length, which is where template spam
    // separates from prose): per band, docs, token mass, the floor-mean
    // and min per-DOC distinct-type ppm. Scale shape: one row-local
    // projection (split + array_distinct per doc, no token explode),
    // partial agg onto ≤64 bands.
    "txt_ttr_curve" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select(size(split($"text", " +")).cast("long").as("nt"),
          size(array_distinct(split($"text", " +"))).cast("long").as("ndt"))
        .withColumn("band", (length(bin($"nt")) - 1).cast("long"))
        .withColumn("ttr_ppm", expr("(ndt * 1000000) div nt"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n_docs"), sum($"nt").as("n_tokens"),
          min($"ttr_ppm").as("min_ttr_ppm"), sum($"ttr_ppm").as("st"))
        .select($"band", $"n_docs", $"n_tokens", $"min_ttr_ppm",
          expr("st div n_docs").as("mean_ttr_ppm"))
        .orderBy($"band")
    },

    // per-source head-vocabulary (data-derived stopword) mass — the
    // per-source PROFILE of txt_head_mass's corpus-wide curve (the 25
    // head types play the stopword role without a language-specific
    // list; a source whose head share sits far from the corpus norm is
    // a different register — code, tables, logs — before any quality
    // model runs): per source, token mass on the corpus top-25 types +
    // exact ppm. Scale shape: the head set is the distributed top-25
    // (TakeOrderedAndProject, the txt_head_mass rule — never a rank
    // window over the growing vocabulary), broadcast into a left join
    // against the (source × vocabulary) partial agg.
    "txt_stopword_mass" -> { (s, d) =>
      import s.implicits._
      val tok = CorpusTokenIndex.tokens(s, d).filter(length($"tok") > 0)
      val head = tok.groupBy($"tok").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok").limit(25)
        .select($"tok", lit(1L).as("is_stop"))
      tok.groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
        .join(broadcast(head), Seq("tok"), "left")
        .groupBy($"source")
        .agg(sum($"c").as("n_tokens"),
          sum(when($"is_stop" === 1L, $"c").otherwise(0L)).as("stop_tokens"))
        .select($"source", $"n_tokens", $"stop_tokens",
          // DECIMAL-guarded: a per-source token mass past ~9·10¹² would
          // wrap the 10⁶ product in a long
          expr("((CAST(1000000 AS DECIMAL(38,0)) * stop_tokens) div CAST(n_tokens AS DECIMAL(38,0)))")
            .cast("long").as("stop_ppm"))
        .orderBy($"source")
    },

    // per-source punctuation-class profile — the register/boilerplate
    // smell beside txt_char_classes' per-LANG encoding audit (prose,
    // code, tables and listicles have sharply different terminal /
    // pause / quote / bracket densities; a "web prose" source whose
    // bracket ppm rivals its period ppm is shipping markup): four
    // punctuation classes as exact counts + ppm of character mass.
    // Counts are length deltas of class-stripped text (row-local
    // codegen), one partial agg onto |sources| rows.
    "txt_punct_profile" -> { (s, d) =>
      import s.implicits._
      def cnt(pat: String) =
        (length($"text") - length(regexp_replace($"text", pat, ""))).cast("long")
      t(s, d, "documents")
        .select($"source", length($"text").cast("long").as("nc"),
          cnt("[.!?]").as("term"), cnt("[,;:]").as("pause"),
          cnt("[\"']").as("quo"), cnt("[(){}\\[\\]]").as("brk"))
        .groupBy($"source")
        .agg(sum($"nc").as("n_chars"), sum($"term").as("n_term"),
          sum($"pause").as("n_pause"), sum($"quo").as("n_quote"),
          sum($"brk").as("n_bracket"))
        .filter($"n_chars" > 0)
        .select($"source", $"n_chars", $"n_term", $"n_pause", $"n_quote", $"n_bracket",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_term) div CAST(n_chars AS DECIMAL(38,0))")
            .cast("long").as("term_ppm"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_pause) div CAST(n_chars AS DECIMAL(38,0))")
            .cast("long").as("pause_ppm"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_bracket) div CAST(n_chars AS DECIMAL(38,0))")
            .cast("long").as("bracket_ppm"))
        .orderBy($"source")
    },

    // per-language sentence-length profile — the context-packing prior
    // txt_pack_bins' chunker needs (mean words per sentence decides
    // where sentence-boundary chunking lands vs hard cuts; a "language"
    // averaging 3 words per terminator is lists, not prose): sentences
    // counted as terminal-punctuation runs, words as alnum runs, exact
    // milli words-per-sentence; a language with zero terminators
    // reports NULL rather than throwing under ANSI. Row-local
    // regexp_extract_all projections, one |langs|-row partial agg.
    "txt_sent_len" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"lang",
          size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long").as("ns"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("nw"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"ns").as("n_sents"),
          sum($"nw").as("n_words"))
        .select($"lang", $"n_docs", $"n_sents", $"n_words",
          expr("CASE WHEN n_sents = 0 THEN NULL ELSE (n_words * 1000) div n_sents END")
            .as("words_per_sent_milli"))
        .orderBy($"lang")
    },

    // code-likeness gate stats — the "is this prose or a code dump"
    // pre-filter every LLM text corpus runs before language ID even
    // makes sense (txt_quality scores prose quality; code fails those
    // heuristics for the WRONG reason and should be routed, not
    // penalized): per doc the exact milli density of code-signal chars
    // ({};()=<>[]), flagged at >= 20 milli; per source, flag rate +
    // floor-mean density. Length-delta counts (row-local), zero-char
    // docs report density 0 by the guarded CASE, |sources|-row rollup.
    "txt_code_signals" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"source", length($"text").cast("long").as("nc"),
          (length($"text") - length(regexp_replace($"text", "[{}();=<>\\[\\]]", "")))
            .cast("long").as("cs"))
        .withColumn("code_milli",
          expr("CASE WHEN nc = 0 THEN CAST(0 AS BIGINT) ELSE (cs * 1000) div nc END"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"code_milli" >= 20L, 1L).otherwise(0L)).as("n_flagged"),
          sum($"code_milli").as("sm"))
        .select($"source", $"n_docs", $"n_flagged",
          expr("(n_flagged * 1000000) div n_docs").as("flag_ppm"),
          expr("sm div n_docs").as("mean_code_milli"))
        .orderBy($"source")
    },

    // printable-ASCII mass per language — the encoding-sanity audit
    // beside txt_char_classes (a lang label whose ASCII share is wrong
    // for the script — "en" at 60 % or "zh" at 99 % — is mislabeled or
    // mojibake; pure-ASCII doc counts separate transliteration from
    // mixed content): chars in [space..tilde] via one class-strip
    // length delta, per-lang mass ppm + fully-ASCII doc count.
    // Row-local projection, |langs|-row partial agg.
    "txt_ascii_ratio" -> { (s, d) =>
      import s.implicits._
      t(s, d, "documents")
        .select($"lang", length($"text").cast("long").as("nc"),
          length(regexp_replace($"text", "[^ -~]", "")).cast("long").as("asc"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"nc").as("n_chars"),
          sum($"asc").as("n_ascii"),
          sum(when($"asc" === $"nc", 1L).otherwise(0L)).as("n_pure_ascii"))
        .filter($"n_chars" > 0)
        .select($"lang", $"n_docs", $"n_chars", $"n_ascii", $"n_pure_ascii",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n_ascii) div CAST(n_chars AS DECIMAL(38,0))")
            .cast("long").as("ascii_ppm"))
        .orderBy($"lang")
    }
  )

  val oracles: Map[String, String] = Map(
    "txt_char_entropy" -> {
      val (lnC, lastC) = FixedLnSql.chain("tc", "cea", Seq("lang"), Seq("c"))
      val (lnP, lastP) = FixedLnSql.chain("per", "ceb",
        Seq("lang", "n_distinct", "slc"), Seq("n_chars"))
      s"""WITH ch AS (
         |  SELECT lang, unnest(regexp_extract_all(text, '(.)', 1)) AS ch FROM documents),
         |tc AS (SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
         |$lnC,
         |per AS (
         |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_chars,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |    SUM(CAST(c AS HUGEINT) * ln_c) AS slc
         |  FROM $lastC GROUP BY 1),
         |$lnP
         |SELECT lang, n_chars, n_distinct,
         |  CAST(ln_n_chars - (slc // n_chars) AS BIGINT) AS h_micro
         |FROM $lastP ORDER BY lang""".stripMargin
    },

    "txt_doc_starts" ->
      """WITH f0 AS (
        |  SELECT doc_id, source, tok, pos,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest(string_split_regex(text, ' +')) AS tok,
        |      generate_subscripts(string_split_regex(text, ' +'), 1) AS pos
        |    FROM documents)
        |  WHERE length(tok) > 0),
        |firsts AS (SELECT source, tok FROM f0 WHERE rn = 1),
        |cnt AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(COUNT(*)) OVER (PARTITION BY source) AS BIGINT) AS src_docs
        |  FROM firsts GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_docs DESC, tok) AS BIGINT) AS rnk
        |  FROM cnt)
        |SELECT source, rnk, tok, n_docs, src_docs,
        |  CAST((n_docs * 1000000) // src_docs AS BIGINT) AS share_ppm
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,

    "txt_doc_ends" ->
      """WITH f0 AS (
        |  SELECT doc_id, source, tok, pos,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos DESC) AS rn
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest(string_split_regex(text, ' +')) AS tok,
        |      generate_subscripts(string_split_regex(text, ' +'), 1) AS pos
        |    FROM documents)
        |  WHERE length(tok) > 0),
        |lasts AS (SELECT source, tok FROM f0 WHERE rn = 1),
        |cnt AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(COUNT(*)) OVER (PARTITION BY source) AS BIGINT) AS src_docs
        |  FROM lasts GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_docs DESC, tok) AS BIGINT) AS rnk
        |  FROM cnt)
        |SELECT source, rnk, tok, n_docs, src_docs,
        |  CAST((n_docs * 1000000) // src_docs AS BIGINT) AS share_ppm
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,

    // same id-range slicing, same first-occurrence rule over the inline
    // tokenization the token index is definitionally identical to
    "txt_heaps" ->
      """WITH dd AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok
        |  FROM documents),
        |bounds AS (
        |  SELECT MIN(doc_id) AS lo, MAX(doc_id) - MIN(doc_id) + 1 AS span FROM dd),
        |perb AS (
        |  SELECT ((d.doc_id - b.lo) * 10) // b.span AS b,
        |    CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(d.n_tok) AS BIGINT) AS nt
        |  FROM dd d, bounds b GROUP BY 1),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok
        |  FROM documents),
        |firsts AS (
        |  SELECT tok, MIN(doc_id) AS fd FROM toks WHERE len(tok) > 0 GROUP BY 1),
        |nvb AS (
        |  SELECT ((f.fd - b.lo) * 10) // b.span AS b, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM firsts f, bounds b GROUP BY 1),
        |j AS (
        |  SELECT t.b, COALESCE(p.nd, 0) AS nd, COALESCE(p.nt, 0) AS nt,
        |    COALESCE(n.nv, 0) AS nv
        |  FROM range(0, 10) t(b)
        |  LEFT JOIN perb p ON p.b = t.b
        |  LEFT JOIN nvb n ON n.b = t.b)
        |SELECT CAST(b + 1 AS BIGINT) AS decile,
        |  CAST(SUM(nd) OVER w AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(SUM(nv) OVER w AS BIGINT) AS vocab,
        |  CAST(nv AS BIGINT) AS new_types
        |FROM j
        |WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY decile""".stripMargin,

    // length deltas of class-stripped text (regexp_replace with the 'g'
    // flag = Spark's replace-all default), HUGEINT ppm floor division
    "txt_char_classes" ->
      """WITH x AS (
        |  SELECT lang, CAST(LENGTH(text) AS BIGINT) AS nc,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS al,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS dg,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS sp
        |  FROM documents),
        |g AS (
        |  SELECT lang, SUM(nc) AS n_chars, SUM(al) AS n_alpha,
        |    SUM(dg) AS n_digit, SUM(sp) AS n_space
        |  FROM x GROUP BY 1)
        |SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_alpha AS BIGINT) AS n_alpha, CAST(n_digit AS BIGINT) AS n_digit,
        |  CAST(n_space AS BIGINT) AS n_space,
        |  CAST(n_chars - n_alpha - n_digit - n_space AS BIGINT) AS n_other,
        |  CAST((1000000 * n_alpha) // n_chars AS BIGINT) AS alpha_ppm,
        |  CAST((1000000 * n_digit) // n_chars AS BIGINT) AS digit_ppm,
        |  CAST((1000000 * n_space) // n_chars AS BIGINT) AS space_ppm
        |FROM g WHERE n_chars > 0 ORDER BY lang""".stripMargin,

    // inline tokenization (definitionally identical to the token index)
    "txt_word_len_hist" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |x AS (
        |  SELECT lang, CAST(LENGTH(tok) AS BIGINT) AS len
        |  FROM toks WHERE LENGTH(tok) > 0),
        |g AS (SELECT lang, len, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY 1, 2),
        |tot AS (SELECT lang, SUM(n) AS t FROM g GROUP BY 1)
        |SELECT g.lang, g.len, g.n,
        |  CAST((1000000 * g.n) // tot.t AS BIGINT) AS share_ppm
        |FROM g JOIN tot ON tot.lang = g.lang
        |ORDER BY g.lang, g.len""".stripMargin,

    // identical rules, cross-multiplied integer tests, list HOFs
    "txt_filter_funnel" ->
      """WITH f AS (
        |  SELECT source,
        |    len(list_filter(string_split_regex(text, ' +'), x -> length(x) > 0)) AS n_tok,
        |    length(replace(text, ' ', '')) AS tok_chars,
        |    len(list_filter(string_split_regex(text, ' +'),
        |        x -> x IN ('the','a','of','and','to','in'))) AS n_stop,
        |    len(list_distinct(list_filter(string_split_regex(text, ' +'),
        |        x -> length(x) > 0))) AS n_dist,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    n_chars
        |  FROM documents),
        |b AS (
        |  SELECT source,
        |    n_tok >= 16 AND n_tok <= 256 AS f_len,
        |    tok_chars >= n_tok * 3 AND tok_chars <= n_tok * 8 AS f_wordlen,
        |    n_stop * 25 >= n_tok AS f_stop,
        |    n_dist * 2 >= n_tok AS f_ttr,
        |    n_digit * 10 <= n_chars AS f_digit
        |  FROM f)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
        |  CAST(SUM(CASE WHEN f_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_wordlen,
        |  CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |  CAST(SUM(CASE WHEN f_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_ttr,
        |  CAST(SUM(CASE WHEN f_digit THEN 1 ELSE 0 END) AS BIGINT) AS n_digit,
        |  CAST(SUM(CASE WHEN f_len AND f_wordlen AND f_stop AND f_ttr AND f_digit
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_all,
        |  CAST((SUM(CASE WHEN f_len AND f_wordlen AND f_stop AND f_ttr AND f_digit
        |    THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS pass_all_ppm
        |FROM b GROUP BY source ORDER BY source""".stripMargin,

    // inline tokenization (definitionally identical to the token index),
    // HUGEINT ratio, the same min-support and tie-break
    "txt_keyness" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |x AS (SELECT source, tok FROM toks WHERE LENGTH(tok) > 0),
        |st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS o FROM x GROUP BY 1, 2),
        |tt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS t FROM x GROUP BY 1),
        |ss AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sc FROM x GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tc FROM x),
        |k AS (
        |  SELECT st.source, st.tok, st.o,
        |    CAST((CAST(st.o AS HUGEINT) * tc * 1000000)
        |      // (CAST(tt.t AS HUGEINT) * ss.sc) AS BIGINT) AS keyness_ppm
        |  FROM st JOIN tt USING (tok) JOIN ss USING (source) CROSS JOIN tot
        |  WHERE st.o >= 5),
        |r AS (
        |  SELECT source, tok, o, keyness_ppm,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY keyness_ppm DESC, tok) AS BIGINT) AS rnk
        |  FROM k)
        |SELECT source, tok, o, keyness_ppm, rnk
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    "txt_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split_regex(text, ' +'))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" -> {
      val scoreCols = markers.map { case (lang, toks) =>
        s"len(list_filter(string_split_regex(text, ' +'), x -> x IN (${inList(toks)}))) AS s_$lang"
      }.mkString(",\n    ")
      val langs = markers.map(_._1)
      val caseExpr = langs.init.map { lang =>
        val cond = langs.filter(_ != lang).map(o => s"s_$lang >= s_$o").mkString(" AND ")
        s"WHEN $cond THEN '$lang'"
      }.mkString("\n    ", "\n    ", s"\n    ELSE '${langs.last}' END")
      s"""WITH scored AS (
         |  SELECT lang,
         |    $scoreCols
         |  FROM documents)
         |SELECT lang, CASE$caseExpr AS predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM scored GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
    },

    "txt_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS len,
        |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok,
        |    CASE WHEN length(text) > 0 THEN
        |      (length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))) / CAST(length(text) AS DOUBLE)
        |    ELSE 0.0 END AS punct_r,
        |    len(list_filter(string_split_regex(text, ' +'), x -> x IN ('the', 'a', 'of', 'and', 'to'))) / CAST(len(string_split_regex(text, ' +')) AS DOUBLE) AS stop_r,
        |    length(replace(text, ' ', '')) / CAST(len(string_split_regex(text, ' +')) AS DOUBLE) AS mwl
        |  FROM documents)
        |SELECT doc_id, len, n_tok,
        |  CAST(FLOOR(punct_r * 1000000.0 + 0.5) AS BIGINT) AS punct_ppm,
        |  CAST(FLOOR(stop_r * 1000000.0 + 0.5) AS BIGINT) AS stop_ppm,
        |  CAST(FLOOR(mwl * 1000000.0 + 0.5) AS BIGINT) AS mwl_micro,
        |  CAST(FLOOR((0.4 * LEAST(len / 500.0, 1.0)
        |    + 0.3 * (1.0 - stop_r)
        |    + 0.3 * LEAST(mwl / 8.0, 1.0)) * 1000000.0 + 0.5) AS BIGINT) AS quality_ppm
        |FROM q ORDER BY doc_id""".stripMargin,

    "txt_fingerprint" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,

    "txt_vocab" ->
      """SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok FROM documents)
        |GROUP BY tok ORDER BY n_occurrences DESC, tok LIMIT 50""".stripMargin,

    "txt_coverage" ->
      """WITH tf AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(text, ' +')) AS tok FROM documents)
        |  GROUP BY tok),
        |c AS (
        |  SELECT CAST(SUM(n) OVER (ORDER BY n DESC, tok) AS BIGINT) AS cum_freq,
        |    CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS type_rank
        |  FROM tf),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM tf)
        |SELECT tot.total_tokens, tot.n_types,
        |  MIN(CASE WHEN cum_freq * 100 >= total_tokens * 50 THEN type_rank END) AS types_50pct,
        |  MIN(CASE WHEN cum_freq * 100 >= total_tokens * 90 THEN type_rank END) AS types_90pct,
        |  MIN(CASE WHEN cum_freq * 100 >= total_tokens * 99 THEN type_rank END) AS types_99pct
        |FROM c, tot GROUP BY 1, 2""".stripMargin,

    "txt_pack_bins" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS cum_before
        |  FROM d)
        |SELECT source, CAST(cum_before // 512 AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,

    "txt_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS tk FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) < 3 THEN []
        |         ELSE list_transform(range(1, len(tk) - 1),
        |                i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] || ' ' || tk[CAST(i AS INT) + 2])
        |    END AS g3
        |  FROM g)
        |SELECT doc_id,
        |  CAST(len(g3) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(g3)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(g3) > 0 THEN
        |    CAST(FLOOR((1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |  ELSE 0 END AS dup_ppm
        |FROM grams ORDER BY doc_id""".stripMargin,

    "txt_pii" ->
      """WITH h AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS emails,
        |    CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS urls,
        |    CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS longnums
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(emails) AS BIGINT) AS n_emails,
        |  CAST(SUM(urls) AS BIGINT) AS n_urls,
        |  CAST(SUM(longnums) AS BIGINT) AS n_longnums,
        |  CAST(SUM(CASE WHEN emails + urls + longnums > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM h GROUP BY source ORDER BY source""".stripMargin,

    "txt_scrub" ->
      (s"""WITH sc AS (
          |  SELECT doc_id, ${scrubSqlExpr("text")} AS text_clean FROM documents)
          |SELECT doc_id, text_clean,
          |  CAST(len(regexp_extract_all(text_clean, '$MaskAlt')) AS BIGINT) AS n_masks
          |FROM sc ORDER BY doc_id""".stripMargin),

    "txt_ngram_profile" ->
      """WITH grams AS (
        |  SELECT lang, substr(text, CAST(i AS INT), 3) AS gram
        |  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)),
        |counted AS (
        |  SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, gram, n,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS BIGINT) AS rnk
        |  FROM counted)
        |SELECT lang, gram, n, rnk FROM ranked WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "txt_novelty" ->
      """WITH g AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS tk FROM documents),
        |tri AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(tk[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS g
        |  FROM g, UNNEST(range(1, len(tk) - 1)) AS t(i)
        |  WHERE len(tk) >= 3),
        |fst AS (SELECT g, MIN(doc_id) AS first_doc FROM tri GROUP BY g)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST((SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM tri t JOIN fst f USING (g)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "txt_phrases" ->
      """WITH g AS (
        |  SELECT doc_id, string_split_regex(text, ' +') AS tk FROM documents),
        |ph AS (
        |  SELECT doc_id,
        |    array_to_string(tk[CAST(i AS INT):CAST(i AS INT) + 7], ' ') AS phrase
        |  FROM g, UNNEST(range(1, len(tk) - 6)) AS t(i)
        |  WHERE len(tk) >= 8)
        |SELECT phrase, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences, MIN(doc_id) AS first_doc
        |FROM ph GROUP BY phrase HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, phrase LIMIT 50""".stripMargin,

    "txt_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, i, tok AS a
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok,
        |          generate_subscripts(string_split_regex(text, ' +'), 1) AS i
        |        FROM documents)),
        |bi AS (
        |  SELECT doc_id, a,
        |    LEAD(a) OVER (PARTITION BY doc_id ORDER BY i) AS b
        |  FROM toks),
        |bi2 AS (SELECT doc_id, a, b FROM bi WHERE b IS NOT NULL),
        |pair AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM bi2 GROUP BY 1, 2),
        |prefix AS (SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM pair GROUP BY 1),
        |scored AS (
        |  SELECT bi2.doc_id, (pair.cab * 1000000) // prefix.ca AS pred_ppm
        |  FROM bi2 JOIN pair ON pair.a = bi2.a AND pair.b = bi2.b
        |  JOIN prefix ON prefix.a = bi2.a)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(pred_ppm) // COUNT(*) AS BIGINT) AS mean_pred_ppm,
        |  CAST(MIN(pred_ppm) AS BIGINT) AS min_pred_ppm
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "txt_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks WHERE len(tok) > 0 GROUP BY 1, 2),
        |df AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |r AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |    CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score_ppm,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY (tf.tf * 1000000) // df.df DESC, tf.tok) AS BIGINT) AS rnk
        |  FROM tf JOIN df ON df.tok = tf.tok)
        |SELECT doc_id, rnk, tok, tf, df, score_ppm
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "txt_skipgrams" ->
      """WITH toks AS (
        |  SELECT doc_id, i AS pos, tok FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok,
        |      generate_subscripts(string_split_regex(text, ' +'), 1) AS i
        |    FROM documents)
        |  WHERE length(tok) > 0),
        |p AS (
        |  SELECT tok AS center,
        |    LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS c1,
        |    LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c2
        |  FROM toks),
        |pairs AS (
        |  SELECT center, c1 AS context FROM p WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM p WHERE c2 IS NOT NULL
        |  UNION ALL SELECT c1, center FROM p WHERE c1 IS NOT NULL
        |  UNION ALL SELECT c2, center FROM p WHERE c2 IS NOT NULL)
        |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n DESC, center, context LIMIT 50""".stripMargin,

    "txt_cms" ->
      """WITH toks AS (
        |  SELECT tok FROM (SELECT unnest(string_split_regex(text, ' +')) AS tok FROM documents)
        |  WHERE length(tok) > 0),
        |cells AS (
        |  SELECT tok, t.r,
        |    CAST('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':' || tok), 1, 8) AS BIGINT) % 1024 AS bucket
        |  FROM toks, UNNEST(range(0, 4)) AS t(r)),
        |sketch AS (
        |  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
        |exact AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM toks GROUP BY 1 ORDER BY n_exact DESC, tok LIMIT 20),
        |lk AS (
        |  SELECT e.tok, e.n_exact, t.r,
        |    CAST('0x' || substr(md5(CAST(t.r AS VARCHAR) || ':' || e.tok), 1, 8) AS BIGINT) % 1024 AS bucket
        |  FROM exact e, UNNEST(range(0, 4)) AS t(r))
        |SELECT lk.tok, lk.n_exact, CAST(MIN(s.n) AS BIGINT) AS cms_estimate
        |FROM lk JOIN sketch s ON s.r = lk.r AND s.bucket = lk.bucket
        |GROUP BY 1, 2 ORDER BY n_exact DESC, tok""".stripMargin,

    "txt_lm_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, i, tok AS a
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok,
        |          generate_subscripts(string_split_regex(text, ' +'), 1) AS i
        |        FROM documents)),
        |bi AS (
        |  SELECT doc_id, a,
        |    LEAD(a) OVER (PARTITION BY doc_id ORDER BY i) AS b
        |  FROM toks),
        |bi2 AS (SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM bi WHERE b IS NOT NULL GROUP BY 1, 2, 3),
        |pair AS (SELECT a, b, CAST(SUM(k) AS BIGINT) AS cab
        |  FROM bi2 WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |prefix AS (SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM pair GROUP BY 1),
        |vocab AS (
        |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok FROM documents)
        |  WHERE doc_id % 2 = 0),
        |scored AS (
        |  SELECT bi2.doc_id, bi2.k,
        |    ((COALESCE(pair.cab, 0) + 1) * 1000000) // (COALESCE(prefix.ca, 0) + vocab.v) AS pred_ppm
        |  FROM bi2
        |  LEFT JOIN pair ON pair.a = bi2.a AND pair.b = bi2.b
        |  LEFT JOIN prefix ON prefix.a = bi2.a
        |  CROSS JOIN vocab
        |  WHERE bi2.doc_id % 2 = 1)
        |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(pred_ppm * k) // SUM(k) AS BIGINT) AS mean_pred_ppm,
        |  CAST(MIN(pred_ppm) AS BIGINT) AS min_pred_ppm,
        |  CAST(CASE WHEN SUM(pred_ppm * k) // SUM(k) >= 30000 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "txt_len_deciles" ->
      """WITH hist AS (
        |  SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cm AS (
        |  SELECT lang, n_chars,
        |    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM hist)
        |SELECT lang, CAST(t.k AS BIGINT) AS bucket,
        |  CAST(MIN(CASE WHEN cum * 10 >= n * t.k THEN n_chars END) AS BIGINT) AS ub,
        |  CAST(MAX(n) AS BIGINT) AS n_docs
        |FROM cm, UNNEST(range(1, 11)) AS t(k)
        |GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "txt_heavy" ->
      """WITH toks AS (
        |  SELECT tok FROM (SELECT unnest(string_split_regex(text, ' +')) AS tok FROM documents)
        |  WHERE length(tok) > 0),
        |tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_exact) AS BIGINT) AS n,
        |  CAST(GREATEST(1, SUM(n_exact) // 256) AS BIGINT) AS thr FROM tc)
        |SELECT tc.tok, tc.n_exact, tot.n AS n_total, tot.thr
        |FROM tc, tot WHERE tc.n_exact >= tot.thr
        |ORDER BY n_exact DESC, tok""".stripMargin,

    "txt_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, i AS pos, tok FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok,
        |      generate_subscripts(string_split_regex(text, ' +'), 1) AS i
        |    FROM documents)
        |  WHERE length(tok) > 0),
        |p AS (
        |  SELECT tok AS center,
        |    LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS c1,
        |    LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS c2
        |  FROM toks),
        |pairs AS (
        |  SELECT center, c1 AS context FROM p WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM p WHERE c2 IS NOT NULL
        |  UNION ALL SELECT c1, center FROM p WHERE c1 IS NOT NULL
        |  UNION ALL SELECT c2, center FROM p WHERE c2 IS NOT NULL),
        |c AS (
        |  SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM pairs GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS nn FROM c),
        |m AS (SELECT center, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM c GROUP BY 1)
        |SELECT c.center, c.context, c.n_ab,
        |  CAST((c.n_ab * tot.nn * 1000000) // (ma.n_a * mb.n_a) AS BIGINT) AS lift_ppm
        |FROM c
        |CROSS JOIN tot
        |JOIN m ma ON ma.center = c.center
        |JOIN m mb ON mb.center = c.context
        |WHERE c.n_ab >= 10
        |ORDER BY lift_ppm DESC, c.center, c.context LIMIT 20""".stripMargin,

    "txt_hapax" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tc AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM toks WHERE length(tok) > 0 GROUP BY 1, 2)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST((COUNT(*) * 1000000) // SUM(n) AS BIGINT) AS ttr_ppm,
        |  CAST((SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS hapax_ppm
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,

    "txt_burstiness" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |g AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
        |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks WHERE LENGTH(tok) > 0 GROUP BY tok)
        |SELECT tok, tf, df, CAST((tf * 1000) // df AS BIGINT) AS burst_milli
        |FROM g ORDER BY tf DESC, tok LIMIT 50""".stripMargin,

    "txt_quality_by_len" ->
      s"""WITH q AS (
        |  SELECT len(string_split_regex(text, ' +')) AS n_tok,
        |    CAST(FLOOR(($qualityScoreSql) * 1000000.0 + 0.5) AS BIGINT) AS q_ppm
        |  FROM documents),
        |g AS (
        |  SELECT CASE WHEN n_tok = 0 THEN CAST(-1 AS BIGINT)
        |              ELSE CAST(length(bin(n_tok)) - 1 AS BIGINT) END AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(q_ppm) AS sq,
        |    MIN(q_ppm) AS min_q_ppm, MAX(q_ppm) AS max_q_ppm
        |  FROM q GROUP BY 1)
        |SELECT band, n_docs, CAST(sq // n_docs AS BIGINT) AS mean_q_ppm,
        |  min_q_ppm, max_q_ppm
        |FROM g ORDER BY band""".stripMargin,

    "txt_lang_grid" ->
      """WITH g AS (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, lang, n_docs,
        |  CAST((n_docs * 1000000) // SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share_ppm,
        |  n_chars
        |FROM g ORDER BY source, lang""".stripMargin,

    "txt_len_topshare" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tok,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id) AS rnk,
        |    COUNT(*) OVER (PARTITION BY source) AS nd
        |  FROM tok)
        |SELECT source, CAST(MAX(nd) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN rnk <= GREATEST(1, nd // 10) THEN n_tok ELSE 0 END) AS BIGINT) AS top_tokens,
        |  CAST((SUM(CASE WHEN rnk <= GREATEST(1, nd // 10) THEN n_tok ELSE 0 END) * 1000000)
        |    // SUM(n_tok) AS BIGINT) AS top_share_ppm
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "txt_head_mass" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tf AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM toks WHERE LENGTH(tok) > 0 GROUP BY tok),
        |r AS (
        |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk,
        |    SUM(n) OVER () AS tt
        |  FROM tf),
        |e AS (
        |  SELECT k, rnk, n, tt
        |  FROM r CROSS JOIN (VALUES (1), (5), (10), (25)) AS ks(k)
        |  WHERE rnk <= k)
        |SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(MAX(tt) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n) AS BIGINT) AS head_tokens,
        |  CAST((SUM(n) * 1000000) // MAX(tt) AS BIGINT) AS head_share_ppm
        |FROM e GROUP BY k ORDER BY k""".stripMargin,

    "txt_readability" ->
      """WITH per AS (
        |  SELECT source,
        |    GREATEST(CAST(len(list_filter(string_split_regex(text, '[.!?]+'), x -> length(trim(x)) > 0)) AS BIGINT), 1) AS s_cnt,
        |    GREATEST(CAST(len(list_filter(string_split_regex(text, ' +'), x -> length(x) > 0)) AS BIGINT), 1) AS w_cnt,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y_cnt
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(s_cnt) AS BIGINT) AS n_sentences,
        |  CAST(SUM(w_cnt) AS BIGINT) AS n_words,
        |  CAST(SUM(y_cnt) AS BIGINT) AS n_syllables,
        |  CAST(206835 - (1015 * CAST(SUM(w_cnt) AS HUGEINT)) // SUM(s_cnt)
        |              - (84600 * CAST(SUM(y_cnt) AS HUGEINT)) // SUM(w_cnt) AS BIGINT) AS flesch_milli
        |FROM per GROUP BY source ORDER BY source""".stripMargin,

    "txt_cond_entropy" -> {
      val (lnJ, lastJ) = FixedLnSql.chain("j", "tca", Seq("source"), Seq("cab", "ca"))
      s"""WITH toks AS (
        |  SELECT source, doc_id, i, tok AS a
        |  FROM (SELECT source, doc_id, unnest(string_split_regex(text, ' +')) AS tok,
        |          generate_subscripts(string_split_regex(text, ' +'), 1) AS i
        |        FROM documents)),
        |bi AS (
        |  SELECT source, doc_id, a,
        |    LEAD(a) OVER (PARTITION BY doc_id ORDER BY i) AS b
        |  FROM toks),
        |bi2 AS (SELECT source, a, b FROM bi WHERE b IS NOT NULL),
        |pair AS (SELECT source, a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM bi2 GROUP BY 1, 2, 3),
        |pfx AS (SELECT source, a, CAST(SUM(cab) AS BIGINT) AS ca FROM pair GROUP BY 1, 2),
        |j AS (
        |  SELECT pair.source, pair.cab, pfx.ca
        |  FROM pair JOIN pfx ON pfx.source = pair.source AND pfx.a = pair.a),
        |$lnJ
        |SELECT source, CAST(SUM(cab) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CAST(cab AS HUGEINT) * (ln_ca - ln_cab)) // SUM(cab) AS BIGINT) AS cond_entropy_micro
        |FROM $lastJ GROUP BY source ORDER BY source""".stripMargin
    },

    "txt_entropy" -> {
      val (lnC, lastC) = FixedLnSql.chain("tc", "lea", Seq("source"), Seq("c"))
      val (lnP, lastP) = FixedLnSql.chain("per", "leb", Seq("source", "slc"), Seq("n_tokens", "n_types"))
      s"""WITH toks AS (
        |  SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tc AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks WHERE length(tok) > 0 GROUP BY 1, 2),
        |$lnC,
        |per AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(CAST(c AS HUGEINT) * ln_c) AS slc
        |  FROM $lastC GROUP BY 1),
        |$lnP
        |SELECT source, n_tokens, n_types,
        |  CAST(ln_n_tokens - (slc // n_tokens) AS BIGINT) AS entropy_micro,
        |  CASE WHEN n_types = 1 THEN 0
        |    ELSE CAST(((ln_n_tokens - (slc // n_tokens)) * 1000000) // ln_n_types AS BIGINT)
        |  END AS norm_ppm
        |FROM $lastP ORDER BY source""".stripMargin
    },

    "txt_kl" -> {
      val (lnJ, lastJ) = FixedLnSql.chain("j", "lka", Seq("source"), Seq("c", "qc"))
      val (lnT, lastT) = FixedLnSql.chain("tot", "lkb", Seq("source", "s_gap"), Seq("n_tokens", "q_total"))
      s"""WITH toks AS (
        |  SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tc AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks WHERE length(tok) > 0 GROUP BY 1, 2),
        |qq AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS qc FROM tc GROUP BY 1),
        |j AS (SELECT tc.source, tc.c, qq.qc FROM tc JOIN qq USING (tok)),
        |$lnJ,
        |per AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    SUM(CAST(c AS HUGEINT) * (ln_qc - ln_c)) AS s_gap
        |  FROM $lastJ GROUP BY 1),
        |tot AS (SELECT *, CAST(SUM(n_tokens) OVER () AS BIGINT) AS q_total FROM per),
        |$lnT
        |SELECT source, n_tokens,
        |  CAST(ln_q_total - ln_n_tokens - (s_gap // n_tokens) AS BIGINT) AS kl_micro
        |FROM $lastT ORDER BY source""".stripMargin
    },

    "txt_fertility" ->
      """WITH per AS (
        |  SELECT lang,
        |    CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS n_tok,
        |    CAST(length(text) AS BIGINT) AS n_chr,
        |    CAST(strlen(text) AS BIGINT) AS n_byt
        |  FROM documents)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chr) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_byt) AS BIGINT) AS n_bytes,
        |  CAST((SUM(n_chr) * 1000000) // SUM(n_tok) AS BIGINT) AS chars_per_tok_ppm,
        |  CAST((SUM(n_byt) * 1000000) // SUM(n_tok) AS BIGINT) AS bytes_per_tok_ppm,
        |  CAST((SUM(n_tok) * 1000000) // COUNT(*) AS BIGINT) AS toks_per_doc_ppm
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

    "txt_zipf" ->
      ("""WITH toks AS (
        |  SELECT unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tf AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM toks WHERE length(tok) > 0 GROUP BY 1),
        |top AS (SELECT n, tok FROM tf ORDER BY n DESC, tok LIMIT 100),
        |rk AS (
        |  SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS r, n
        |  FROM top),
        |""".stripMargin + FixedLnSql.chain("rk", "lz", Nil, Seq("r", "n"))._1 +
      s""",
        |pts AS (SELECT ln_r AS x, ln_n AS y FROM ${FixedLnSql.chain("rk", "lz", Nil, Seq("r", "n"))._2}),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM pts),
        |f AS (
        |  SELECT k, sx, sy,
        |    k * sxy - sx * sy AS num,
        |    k * sxx - sx * sx AS den,
        |    k * syy - sy * sy AS deny
        |  FROM s),
        |g AS (
        |  SELECT k, sx, sy, num, den, deny,
        |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope
        |  FROM f)
        |SELECT k AS n_points,
        |  CAST(floor(slope * 1000000 + 0.5) AS BIGINT) AS slope_ppm,
        |  CAST(floor(((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(k AS DOUBLE)) + 0.5) AS BIGINT) AS intercept_micro,
        |  CAST(floor((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS r2_ppm
        |FROM g""".stripMargin),

    "txt_fano" ->
      """WITH toks AS (
        |  SELECT doc_id, tok
        |  FROM documents, UNNEST(string_split_regex(text, ' +')) AS u(tok)
        |  WHERE length(tok) > 0),
        |pd AS (SELECT tok, doc_id, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |st AS (
        |  SELECT tok, SUM(c) AS total, CAST(COUNT(*) AS BIGINT) AS n_docs_with,
        |    SUM(c * c) AS ssq
        |  FROM pd GROUP BY 1),
        |top AS (SELECT * FROM st ORDER BY total DESC, tok LIMIT 20),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT tok, CAST(total AS BIGINT) AS total, n_docs_with, n_docs,
        |  CAST((1000 * (n_docs * ssq - total * total)) // (n_docs * total) AS BIGINT)
        |    AS fano_milli
        |FROM top, nd ORDER BY total DESC, tok""".stripMargin,

    "txt_lang_overlap" ->
      """WITH vocab AS (
        |  SELECT DISTINCT lang, w
        |  FROM documents, UNNEST(string_split_regex(text, ' +')) AS u(w)
        |  WHERE length(w) > 0),
        |sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM vocab GROUP BY 1),
        |common AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT sa.lang AS lang_a, sb.lang AS lang_b, sa.n AS n_a, sb.n AS n_b,
        |  COALESCE(c.n_common, 0) AS n_common,
        |  CAST((1000000 * COALESCE(c.n_common, 0)) // (sa.n + sb.n - COALESCE(c.n_common, 0)) AS BIGINT) AS jaccard_ppm
        |FROM sizes sa
        |JOIN sizes sb ON sa.lang < sb.lang
        |LEFT JOIN common c ON c.lang_a = sa.lang AND c.lang_b = sb.lang
        |ORDER BY lang_a, lang_b""".stripMargin,

    "txt_src_overlap" ->
      """WITH vocab AS (
        |  SELECT DISTINCT source, w
        |  FROM documents, UNNEST(string_split_regex(text, ' +')) AS u(w)
        |  WHERE length(w) > 0),
        |sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM vocab GROUP BY 1),
        |common AS (
        |  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT sa.source AS src_a, sb.source AS src_b, sa.n AS n_a, sb.n AS n_b,
        |  COALESCE(c.n_common, 0) AS n_common,
        |  CAST((1000000 * COALESCE(c.n_common, 0)) // (sa.n + sb.n - COALESCE(c.n_common, 0)) AS BIGINT) AS jaccard_ppm
        |FROM sizes sa
        |JOIN sizes sb ON sa.source < sb.source
        |LEFT JOIN common c ON c.src_a = sa.source AND c.src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin,

    "txt_simpson" ->
      """WITH tok AS (
        |  SELECT lang, w
        |  FROM documents, UNNEST(string_split_regex(text, ' +')) AS u(w)
        |  WHERE length(w) > 0),
        |tc AS (SELECT lang, w, COUNT(*) AS n FROM tok GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, SUM(n) AS n_tokens, COUNT(*) AS n_types,
        |    SUM(n * (n - 1)) AS coll
        |  FROM tc GROUP BY 1)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  CAST(CASE WHEN n_tokens > 1
        |    THEN (1000000 * coll) // (n_tokens * (n_tokens - 1))
        |    ELSE 0 END AS BIGINT) AS simpson_ppm
        |FROM agg ORDER BY lang""".stripMargin,

    "txt_dup_lines" ->
      """WITH l AS (
        |  SELECT source, md5(trim(line)) AS h
        |  FROM documents, UNNEST(string_split(text, chr(10))) AS u(line)
        |  WHERE length(trim(line)) > 0),
        |lc AS (SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c FROM l GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_lines,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_lines,
        |  CAST((SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000) // SUM(c) AS BIGINT) AS dup_ppm
        |FROM lc GROUP BY source ORDER BY source""".stripMargin,

    "txt_ttr_curve" ->
      """WITH per AS (
        |  SELECT CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(string_split_regex(text, ' +'))) AS BIGINT) AS ndt
        |  FROM documents),
        |b AS (
        |  SELECT CAST(length(bin(nt)) - 1 AS BIGINT) AS band, nt,
        |    CAST((ndt * 1000000) // nt AS BIGINT) AS ttr_ppm
        |  FROM per)
        |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  MIN(ttr_ppm) AS min_ttr_ppm,
        |  CAST(SUM(ttr_ppm) // COUNT(*) AS BIGINT) AS mean_ttr_ppm
        |FROM b GROUP BY band ORDER BY band""".stripMargin,

    "txt_stopword_mass" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split_regex(text, ' +')) AS tok FROM documents),
        |tf AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM toks WHERE length(tok) > 0 GROUP BY 1),
        |head AS (SELECT tok FROM tf ORDER BY n DESC, tok LIMIT 25),
        |st AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks WHERE length(tok) > 0 GROUP BY 1, 2)
        |SELECT st.source, CAST(SUM(st.c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN h.tok IS NOT NULL THEN st.c ELSE 0 END) AS BIGINT) AS stop_tokens,
        |  CAST((CAST(1000000 AS HUGEINT) * SUM(CASE WHEN h.tok IS NOT NULL THEN st.c ELSE 0 END))
        |    // SUM(st.c) AS BIGINT) AS stop_ppm
        |FROM st LEFT JOIN head h ON h.tok = st.tok
        |GROUP BY st.source ORDER BY st.source""".stripMargin,

    // length deltas of class-stripped text, the txt_char_classes rule
    "txt_punct_profile" ->
      """WITH per AS (
        |  SELECT source, CAST(length(text) AS BIGINT) AS nc,
        |    CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g')) AS BIGINT) AS term,
        |    CAST(length(text) - length(regexp_replace(text, '[,;:]', '', 'g')) AS BIGINT) AS pause,
        |    CAST(length(text) - length(regexp_replace(text, '["'']', '', 'g')) AS BIGINT) AS quo,
        |    CAST(length(text) - length(regexp_replace(text, '[(){}\[\]]', '', 'g')) AS BIGINT) AS brk
        |  FROM documents),
        |g AS (
        |  SELECT source, SUM(nc) AS nc, SUM(term) AS t, SUM(pause) AS p,
        |    SUM(quo) AS q, SUM(brk) AS b
        |  FROM per GROUP BY 1 HAVING SUM(nc) > 0)
        |SELECT source, CAST(nc AS BIGINT) AS n_chars, CAST(t AS BIGINT) AS n_term,
        |  CAST(p AS BIGINT) AS n_pause, CAST(q AS BIGINT) AS n_quote,
        |  CAST(b AS BIGINT) AS n_bracket,
        |  CAST((CAST(1000000 AS HUGEINT) * t) // nc AS BIGINT) AS term_ppm,
        |  CAST((CAST(1000000 AS HUGEINT) * p) // nc AS BIGINT) AS pause_ppm,
        |  CAST((CAST(1000000 AS HUGEINT) * b) // nc AS BIGINT) AS bracket_ppm
        |FROM g ORDER BY source""".stripMargin,

    "txt_sent_len" ->
      """WITH per AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS ns,
        |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS nw
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ns) AS BIGINT) AS n_sents, CAST(SUM(nw) AS BIGINT) AS n_words,
        |  CASE WHEN SUM(ns) = 0 THEN NULL
        |    ELSE CAST((SUM(nw) * 1000) // SUM(ns) AS BIGINT) END AS words_per_sent_milli
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

    "txt_code_signals" ->
      """WITH per AS (
        |  SELECT source, CAST(length(text) AS BIGINT) AS nc,
        |    CAST(length(text) - length(regexp_replace(text, '[{}();=<>\[\]]', '', 'g')) AS BIGINT) AS cs
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    CASE WHEN nc = 0 THEN 0 ELSE (cs * 1000) // nc END AS code_milli
        |  FROM per)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN code_milli >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST((SUM(CASE WHEN code_milli >= 20 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS flag_ppm,
        |  CAST(SUM(code_milli) // COUNT(*) AS BIGINT) AS mean_code_milli
        |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "txt_ascii_ratio" ->
      """WITH per AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS nc,
        |    CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) AS BIGINT) AS asc_n
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nc) AS BIGINT) AS n_chars, CAST(SUM(asc_n) AS BIGINT) AS n_ascii,
        |  CAST(SUM(CASE WHEN asc_n = nc THEN 1 ELSE 0 END) AS BIGINT) AS n_pure_ascii,
        |  CAST((CAST(1000000 AS HUGEINT) * SUM(asc_n)) // SUM(nc) AS BIGINT) AS ascii_ppm
        |FROM per GROUP BY lang HAVING SUM(nc) > 0 ORDER BY lang""".stripMargin
  )
}
