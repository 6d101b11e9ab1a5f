package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF index over the embedding corpus — the DEPLOY shape
  * of the ANN family: the coarse codebook and the per-cell posting lists
  * stored as tables, so a query probes ONLY its nprobe cells' files
  * instead of scanning the corpus. ann_ivf_topk recomputes the cell
  * assignment per run (fine for a one-shot audit); a serving deployment
  * builds the index once and pays per query a centroid broadcast plus a
  * PARTITION-PRUNED scan of nprobe/|cells| of the data — at 100 TB the
  * difference between touching terabytes and touching gigabytes per
  * query batch (IvfIndexSpec proves the pruned scan reads only the
  * probed cells' partitions, and that the probe result is row-identical
  * to ann_ivf_topk's inline computation).
  *
  * Stored tables (session-scoped catalog + tmpdir path, the same
  * lifecycle contract as [[CorpusLshIndex]]):
  *   - cent  (cent_id, qc, nc)               — the frozen coarse codebook
  *     (deterministic vec_id % CentroidStep seeds, ann_ivf_topk's rule)
  *   - cells (cent_id, vec_id, q, nn)        — posting lists,
  *     DIRECTORY-PARTITIONED by cent_id: pruning is by partition
  *     directory, the physical analogue of FAISS's inverted lists
  *
  * `cells` is written LAST so its catalog entry marks the index
  * committed (a failed partial build re-runs from scratch; Overwrite
  * writes never read stale leftovers).
  *
  * Append contract (the real-world IVF lifecycle): the codebook is
  * FROZEN at build time — new vectors are assigned to the existing
  * centroids and appended to their cells' partitions. Quality decay
  * under drift is the operator's concern (emb_pq_distortion is the
  * matching monitor); correctness is not: append == rebuild whenever
  * the new ids don't add seed positions (IvfIndexSpec).
  */
object EmbIvfIndex {

  private def tableName(part: String, tg: String) = s"graft_ivf_${part}_$tg"

  private def assignOnce(e: DataFrame, cents: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"c_ppm".desc, $"cent_id")
    e.join(broadcast(cents), lit(true))
      .withColumn("dot", expr(
        "aggregate(zip_with(q, qc, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .withColumn("c_ppm",
        floor($"dot" / (sqrt($"nn") * sqrt($"nc")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("crnk", row_number().over(w))
      .filter($"crnk" === 1)
      .select($"cent_id", $"vec_id", $"q", $"nn")
  }

  /** Build the codebook + posting lists if this session hasn't yet. */
  def ensure(s: SparkSession, d: String): Unit = synchronized {
    import s.implicits._
    val tg = CorpusLshIndex.tag(d)
    if (!s.catalog.tableExists(tableName("cells", tg))) {
      val dir = new java.io.File(
        new java.io.File(sys.props("java.io.tmpdir"), "graft-ivf-index"), tg)
      dir.mkdirs()
      // zero-norm vectors are un-indexable under cosine (no direction to
      // assign) — excluded here exactly like the AnnQueries `unit` rule,
      // so neither a seed nor a posting row can put a 0 denominator in
      // the assignment; the IVF oracles mirror the filter
      val e = graft.operators.VectorOps.quantized(s, d).filter($"nn" > 0)
      // corpus-scaled seed step (sqrt-scaled nlist — AnnQueries.centroidStep)
      val cents = e.filter($"vec_id" % AnnQueries.centroidStep(s, d) === 0)
        .select($"vec_id".as("cent_id"), $"q".as("qc"), $"nn".as("nc"))
      cents.write.mode(SaveMode.Overwrite)
        .option("path", new java.io.File(dir, "cent").getAbsolutePath)
        .saveAsTable(tableName("cent", tg))
      assignOnce(e, s.table(tableName("cent", tg)))
        .write.mode(SaveMode.Overwrite)
        .option("path", new java.io.File(dir, "cells").getAbsolutePath)
        .partitionBy("cent_id")
        .saveAsTable(tableName("cells", tg))
    }
  }

  def cents(s: SparkSession, d: String): DataFrame = {
    ensure(s, d)
    s.table(tableName("cent", CorpusLshIndex.tag(d)))
  }

  def cells(s: SparkSession, d: String): DataFrame = {
    ensure(s, d)
    s.table(tableName("cells", CorpusLshIndex.tag(d)))
  }

  /** Assign a new vector batch to the FROZEN codebook and append to the
    * cells' partitions. Batches must carry never-seen vec_ids (same
    * whole-batch contract as the other indexes' appends).
    */
  def append(s: SparkSession, d: String, newVecs: DataFrame): Unit = {
    import s.implicits._
    val tg = CorpusLshIndex.tag(d)
    ensure(s, d)
    // Guard the contract instead of only documenting it: a batch that
    // adds a seed position (vec_id % CentroidStep == 0) or re-sends a
    // vec_id already in the cells table would silently diverge from a
    // rebuild while consumers keep trusting append == rebuild. Both
    // checks are one counting aggregate over the (small) batch; the
    // duplicate check semi-joins the batch against the posting lists.
    // An index built over an EMPTY corpus has ZERO centroids; assigning a
    // batch against an empty codebook would emit no posting rows — the
    // batch silently vanishes while consumers keep trusting append ==
    // rebuild. Fail loudly with the repair path instead (the frozen-
    // codebook contract genuinely needs base vectors to freeze against).
    require(!s.table(tableName("cent", tg)).isEmpty,
      "EmbIvfIndex.append: the index was built over an EMPTY corpus " +
        "(zero centroids) — a frozen-codebook append has no cells to " +
        "assign to and would silently drop the batch; dropFor + ensure " +
        "once base vectors exist")
    val step = AnnQueries.centroidStep(s, d)
    val seeds = newVecs
      .filter(col("vec_id") % step === 0).limit(1).count()
    require(seeds == 0L,
      "EmbIvfIndex.append: batch contains a seed position " +
        s"(vec_id % $step == 0) — the codebook is " +
        "frozen; such a batch would diverge from a rebuild")
    val dups = newVecs.join(
      s.table(tableName("cells", tg)).select($"vec_id"), Seq("vec_id"),
      "left_semi").limit(1).count()
    require(dups == 0L,
      "EmbIvfIndex.append: batch contains vec_ids already present in the " +
        "cells table — appends must carry never-seen ids")
    // A batch can also violate the contract INTERNALLY (same vec_id twice
    // in one batch passes both checks above but writes duplicate posting
    // rows, silently diverging from a rebuild). distinct-vs-total over
    // the small batch catches it in one aggregate.
    val (total, distinct) = newVecs
      .agg(count(lit(1)), countDistinct($"vec_id"))
      .as[(Long, Long)].head()
    require(total == distinct,
      s"EmbIvfIndex.append: batch repeats vec_ids internally ($total rows, " +
        s"$distinct distinct vec_ids) — appends must carry unique ids")
    // insertInto is position-based; a partitioned saveAsTable catalogs
    // the partition column LAST (vec_id, q, nn, cent_id). Zero-norm rows
    // are dropped exactly as ensure's rebuild drops them — append ==
    // rebuild must hold for degenerate batches too.
    assignOnce(newVecs.filter(col("nn") > 0), s.table(tableName("cent", tg)))
      .select(col("vec_id"), col("q"), col("nn"), col("cent_id"))
      .write.mode(SaveMode.Append)
      .format("parquet")
      .insertInto(tableName("cells", tg))
    s.catalog.refreshTable(tableName("cells", tg))
  }

  /** Rewrite the posting lists into fresh one-file-per-cell form — the
    * maintenance op the append path defers (each append adds one file
    * set to every touched cent_id partition directory, so after N
    * appends a probe of k cells opens up to k·(N+1) files; compaction
    * restores the fresh-build read shape without re-deriving anything —
    * no re-assignment, no codebook touch, just a partition-preserving
    * rewrite of rows the index already holds). Mirrors
    * [[CorpusLshIndex.compact]]: rows are localCheckpoint-PINNED before
    * the Overwrite so the write never reads the directories it replaces,
    * and the rewrite repartitions ON cent_id so each task holds whole
    * cells — one file per partition directory. The codebook (cent) is
    * written once at build and never appended, so only cells compacts.
    * Serving is unchanged: the table keeps its cent_id partitioning, so
    * the probe path's partition pruning survives (IvfIndexSpec proves
    * compact == pre-compact cells, the per-cell file collapse, and that
    * the pruned probe still serves row-identically).
    */
  def compact(s: SparkSession, d: String): Unit = synchronized {
    val tg = CorpusLshIndex.tag(d)
    ensure(s, d)
    val dir = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-ivf-index"), tg)
    val tbl = tableName("cells", tg)
    val pinned = s.table(tbl).localCheckpoint(true)
    pinned
      .repartition(col("cent_id"))
      .write.mode(SaveMode.Overwrite)
      .option("path", new java.io.File(dir, "cells").getAbsolutePath)
      .partitionBy("cent_id")
      .saveAsTable(tbl)
    pinned.unpersist(): Unit
    s.catalog.refreshTable(tbl)
  }

  /** Drop this corpus dir's IVF index (catalog tables + files) — the
    * cleanup for throwaway corpora (the bench's maintenance-stage side
    * corpus) and the crash-mid-append repair path (ensure rebuilds).
    */
  def dropFor(s: SparkSession, d: String): Unit = synchronized {
    val tg = CorpusLshIndex.tag(d)
    Seq("cells", "cent").foreach { part =>
      val tbl = tableName(part, tg)
      if (s.catalog.tableExists(tbl)) s.sql(s"DROP TABLE $tbl"): Unit
    }
    graft.ScaleProbe.rmTree(new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft-ivf-index"), tg))
  }
}
