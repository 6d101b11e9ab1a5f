package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Materialized part co-purchase graph — built ONCE per dataset per
  * session and read by the graph-analytics family (q39_triangles,
  * q40_pagerank).
  *
  * Why: both graph queries need the same distinct edge list (parts
  * adjacent when one order contains both) and the same degree relation,
  * and deriving them is the dominant cost of either query (the per-order
  * pair expansion + global distinct dwarfs the triangle intersection and
  * the PageRank rounds at sf0.1). At 100 TB the edge derivation is a full
  * fact-table pass — the same build-once argument as [[CorpusLshIndex]]
  * (shingle/band relations) and [[CorpusTokenIndex]] (token relation),
  * applied to graph shape.
  *
  * What is stored (ids and counts only, never payloads):
  *   - edge (u, v, supp) with u < v — one row per distinct co-purchased
  *     pair, supp = how many orders contain both (the basket-support
  *     count q41_assoc_rules consumes; q39/q40 read just the edge set) —
  *     bucketed by u
  *   - item (x, n_ord) per-part order count (basket item support) —
  *     bucketed by x
  *   - wm   (max_o) one-row order-key high-watermark — the append
  *     contract's guard (see [[append]])
  *   - deg  (x, dg) undirected degree   — bucketed by x, written LAST so
  *     its catalog entry marks the whole index committed (a failed
  *     partial build re-runs from scratch; writes are Overwrite, so
  *     stale on-disk leftovers from a previous JVM are replaced).
  *
  * The edge build avoids a fact-table self-join entirely: one shuffle
  * groups the deduplicated (order, part) pairs into per-order part
  * arrays, the pair expansion is a narrow lambda-filtered explode
  * (`filter(ps, x -> x > u)` keeps each undirected pair once), and the
  * only other wide stage is the distinct on the pair stream. Same
  * session/tmpdir lifecycle as the other indexes; on a cluster these
  * tables live in the warehouse across jobs.
  *
  * Correctness: definitionally the distinct co-occurrence pairs of the
  * lineitem table — CoPurchaseGraphSpec asserts set-equality of the index
  * against an independently-built join-form edge list, and that deg
  * matches the recomputed endpoint counts.
  */
object CoPurchaseGraph {

  import IndexBuckets.{buckets, bucketsOf}

  private def tableName(part: String, tg: String) = s"graft_cpg_${part}_$tg"

  /** Build the two graph tables if this session hasn't yet.
    *
    * `onStage` receives (table, seconds) per index table as it commits —
    * the scale probe's sub-stage observability (the edge stage carries
    * the pair derivation, so a super-linear explode is visible a decade
    * before it flips the total build time). Timings are of real work,
    * never a re-compute: each save is the table's one materializing
    * action.
    */
  def ensure(s: SparkSession, d: String,
      onStage: (String, Double) => Unit = (_, _) => ()): Unit = synchronized {
    val tg = CorpusLshIndex.tag(d)
    if (!s.catalog.tableExists(tableName("deg", tg))) {
      import s.implicits._
      val dir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir"), "graft-cpg-index"), tg)
      dir.mkdirs()
      def save(df: DataFrame, part: String, bucketCols: Seq[String]): DataFrame = {
        val tbl = tableName(part, tg)
        val t0 = System.nanoTime()
        df.write.mode(SaveMode.Overwrite)
          .option("path", new java.io.File(dir, part).getAbsolutePath)
          .bucketBy(buckets(s), bucketCols.head, bucketCols.tail: _*)
          .saveAsTable(tbl)
        onStage(part, (System.nanoTime() - t0) / 1e9)
        s.table(tbl)
      }
      // the distinct (order, part) relation feeds THREE build stages
      // (edge pairs, item counts, the wm guard) — persist it so the
      // build pays the fact-table scan + distinct shuffle once, not
      // three times (r14 optimization; released in the finally below)
      val li = t(s, d, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
        .persist()
      try {
        val parts = li.groupBy($"o").agg(collect_list($"p").as("ps"))
        val rawPairs = parts
          .select(explode($"ps").as("u"), $"ps")
          .select($"u", explode(expr("filter(ps, x -> x > u)")).as("v"))
        val edge = save(rawPairs.groupBy($"u", $"v")
          .agg(count(lit(1)).as("supp")), "edge", Seq("u"))
        save(li.groupBy($"p".as("x")).agg(count(lit(1)).as("n_ord")),
          "item", Seq("x"))
        // symmetrized adjacency (both orientations), bucketed on the
        // scatter key — the iterative consumers (q40 PageRank, q42 BFS)
        // join it against a per-round frontier every round; storing it
        // saves each of them a runtime union + re-materialization, and
        // the u-bucketing co-locates the scatter with any u-keyed build.
        save(edge.select($"u", $"v")
          .unionByName(edge.select($"v".as("u"), $"u".as("v"))), "sym", Seq("u"))
        // order high-watermark: the append contract's guard relation (one
        // row — max indexed order key)
        save(li.agg(max($"o").as("max_o")), "wm", Seq("max_o"))
        val ends = edge.select($"u".as("x")).unionByName(edge.select($"v".as("x")))
        save(ends.groupBy($"x").agg(count(lit(1)).as("dg")), "deg", Seq("x"))
      } finally li.unpersist()
    }
  }

  /** Extend the index with a batch of NEW orders' lineitem rows without
    * re-scanning the base fact table — the graph twin of
    * [[CorpusLshIndex.append]]. The delta pair explode is batch-sized;
    * the merges (edge ∪ delta pairs → summed supports, item ∪ delta
    * counts) are index-sized aggregations; sym and deg re-derive from
    * the merged edge relation. Merged relations are localCheckpoint-
    * pinned before the in-place Overwrite (the
    * [[CorpusTokenIndex.compact]] pattern — lineage to the files being
    * replaced is cut first).
    *
    * Atomicity: unlike ensure (where deg not existing yet IS the
    * uncommitted state), during an append all tables already exist — so
    * the deg catalog entry is DROPPED before the first overwrite and
    * recreated LAST. A failure anywhere in between leaves no deg entry,
    * and the next ensure() sees the index uncommitted and rebuilds every
    * table from the base fact table (appended batches are lost — the
    * session-scoped repair contract shared with [[CorpusLshIndex]]); a
    * reader can never observe a merged edge beside a stale deg/sym.
    *
    * Contract: each batch must carry COMPLETE, never-before-indexed
    * orders — an order whose lineitems straddle two appends would lose
    * its cross-batch co-purchase pairs and double-count item n_ord, and
    * a re-sent order would double its pair supports (the same
    * idempotence contract as re-publishing a message outside the
    * commit). Enforced cheaply via a strict order-key high-watermark:
    * min(batch order key) must exceed max(indexed order key) — crawl
    * batches with monotone keys satisfy it by construction; anything
    * else fails LOUDLY here instead of corrupting supports silently.
    */
  def append(s: SparkSession, d: String, newLineitems: DataFrame): Unit = synchronized {
    ensure(s, d)
    import s.implicits._
    val tg = CorpusLshIndex.tag(d)
    val dir = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-cpg-index"), tg)
    def save(df: DataFrame, part: String, bucketCols: Seq[String]): Unit =
      df.write.mode(SaveMode.Overwrite)
        .option("path", new java.io.File(dir, part).getAbsolutePath)
        .bucketBy(bucketsOf(s, tableName(part, tg)), bucketCols.head, bucketCols.tail: _*)
        .saveAsTable(tableName(part, tg))
    val li = newLineitems
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .localCheckpoint(true)
    // an empty batch is a no-op, not a NULL-unboxing error on its min
    if (li.isEmpty) { li.unpersist(): Unit }
    else appendNonEmpty(s, tg, dir, li, save)
  }

  private def appendNonEmpty(s: SparkSession, tg: String, dir: java.io.File,
      li: DataFrame, save: (DataFrame, String, Seq[String]) => Unit): Unit = {
    import s.implicits._
    // high-watermark guard (two 1-row scalar reads, bounded by
    // construction). An index built over an EMPTY corpus has a NULL
    // watermark (max over zero orders) — the first real crawl batch is
    // then new by definition (the new-tenant-then-first-crawl shape),
    // so NULL reads as the minimum key, never an unboxing throw.
    val wmRow = s.table(tableName("wm", tg)).select($"max_o").head()
    val wm = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)
    val batchMin = li.agg(min($"o")).as[Long].head()
    require(batchMin > wm,
      s"co-purchase append: batch order keys must be complete and new — " +
        s"min batch key $batchMin is not above the indexed high-watermark $wm " +
        s"(straddled or re-sent orders would corrupt pair supports)")
    val parts = li.groupBy($"o").agg(collect_list($"p").as("ps"))
    val pairsNew = parts
      .select(explode($"ps").as("u"), $"ps")
      .select($"u", explode(expr("filter(ps, x -> x > u)")).as("v"))
      .groupBy($"u", $"v").agg(count(lit(1)).as("supp"))
    val mergedEdge = s.table(tableName("edge", tg)).unionByName(pairsNew)
      .groupBy($"u", $"v").agg(sum($"supp").as("supp"))
      .localCheckpoint(true)
    val mergedItem = s.table(tableName("item", tg))
      .unionByName(li.groupBy($"p".as("x")).agg(count(lit(1)).as("n_ord")))
      .groupBy($"x").agg(sum($"n_ord").as("n_ord"))
      .localCheckpoint(true)
    // uncommit: drop the marker BEFORE any table is mutated (its bucket
    // count is captured first — the recreate must match its siblings)
    val degBuckets = bucketsOf(s, tableName("deg", tg))
    s.sql(s"DROP TABLE IF EXISTS ${tableName("deg", tg)}")
    save(mergedEdge, "edge", Seq("u"))
    save(mergedItem, "item", Seq("x"))
    save(mergedEdge.select($"u", $"v")
      .unionByName(mergedEdge.select($"v".as("u"), $"u".as("v"))), "sym", Seq("u"))
    save(li.agg(max($"o").as("max_o")), "wm", Seq("max_o"))
    val ends = mergedEdge.select($"u".as("x"))
      .unionByName(mergedEdge.select($"v".as("x")))
    // recommit: deg recreated LAST
    ends.groupBy($"x").agg(count(lit(1)).as("dg"))
      .write.mode(SaveMode.Overwrite)
      .option("path", new java.io.File(dir, "deg").getAbsolutePath)
      .bucketBy(degBuckets, "x")
      .saveAsTable(tableName("deg", tg))
    Seq(li, mergedEdge, mergedItem).foreach(_.unpersist(): Unit)
  }

  /** Bucket-preserving file-collapse rewrite — the graph twin of
    * [[CorpusLshIndex.compact]] (the last append-only family member to
    * gain one). Unlike the LSH index (SaveMode.Append → one NEW file
    * per bucket per append), [[append]] here merges and Overwrites, and
    * Spark's planned bucketed write shuffles onto the bucket columns —
    * so on THIS write path every table already sits at one file per
    * bucket and compact is a cheap idempotent rewrite
    * (CoPurchaseGraphSpec pins both properties). It exists for layouts
    * this engine did not write: a cluster writer with planned writes
    * disabled, or an external tool, leaves each bucket scattered across
    * ~|tasks| files, and this repartition-onto-bucket-columns rewrite
    * restores one file per bucket with bucket counts (and therefore the
    * exchange-free consumer joins) preserved. Content is untouched — a
    * crash mid-way leaves every already-rewritten table byte-
    * equivalent, so no drop/recreate commit dance is needed (unlike
    * [[append]]). Rows are localCheckpoint-pinned BEFORE the in-place
    * Overwrite (the [[CorpusTokenIndex.compact]] pattern — lineage to
    * the files being replaced is cut first); pinned relations are
    * id/count rows only, never payloads.
    */
  def compact(s: SparkSession, d: String): Unit = synchronized {
    ensure(s, d)
    val tg = CorpusLshIndex.tag(d)
    val dir = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-cpg-index"), tg)
    val specs = Seq("edge" -> Seq("u"), "item" -> Seq("x"), "sym" -> Seq("u"),
      "wm" -> Seq("max_o"), "deg" -> Seq("x"))
    for ((part, cols) <- specs) {
      val tbl = tableName(part, tg)
      val n = bucketsOf(s, tbl)
      val pinned = s.table(tbl).localCheckpoint(true)
      pinned
        .repartition(n, cols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("path", new java.io.File(dir, part).getAbsolutePath)
        .bucketBy(n, cols.head, cols.tail: _*)
        .saveAsTable(tbl)
      pinned.unpersist()
      s.catalog.refreshTable(tbl)
    }
  }

  /** Drop this corpus dir's graph index: catalog tables AND the on-disk
    * files — the cleanup for throwaway corpora (Bench's graph-compact
    * side corpus would otherwise leak one index per run), mirroring
    * [[CorpusLshIndex.dropFor]].
    */
  def dropFor(s: SparkSession, d: String): Unit = synchronized {
    val tg = CorpusLshIndex.tag(d)
    Seq("edge", "item", "sym", "wm", "deg").foreach { part =>
      val tbl = tableName(part, tg)
      if (s.catalog.tableExists(tbl)) s.sql(s"DROP TABLE $tbl"): Unit
    }
    graft.ScaleProbe.rmTree(new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-cpg-index"), tg))
  }

  /** on-disk data-file count for one index table — the compaction
    * observable (CoPurchaseGraphSpec + Bench's graph_compact stage)
    */
  def fileCount(s: SparkSession, d: String, part: String): Int = {
    val tg = CorpusLshIndex.tag(d)
    val f = new java.io.File(new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-cpg-index"), tg), part)
    Option(f.listFiles()).getOrElse(Array.empty)
      .count(x => x.isFile && !x.getName.startsWith("_") && !x.getName.startsWith("."))
  }

  private def read(s: SparkSession, d: String, part: String): DataFrame = {
    ensure(s, d)
    s.table(tableName(part, CorpusLshIndex.tag(d)))
  }

  /** distinct undirected edges (u < v) with basket-support counts */
  def edges(s: SparkSession, d: String): DataFrame = read(s, d, "edge")

  /** undirected degree per vertex */
  def degrees(s: SparkSession, d: String): DataFrame = read(s, d, "deg")

  /** per-part order counts (basket item support) */
  def items(s: SparkSession, d: String): DataFrame = read(s, d, "item")

  /** both-orientation edge relation (u, v) — one row per directed arc */
  def symEdges(s: SparkSession, d: String): DataFrame = read(s, d, "sym")
}
