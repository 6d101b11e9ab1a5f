package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.RecQueries

/** Streaming recommendation SERVING — the stream twin of the q44/q45
  * recommendation family: each arriving purchase event is answered with
  * the purchased item's top-3 similar items from the materialized
  * co-purchase neighbor model.
  *
  * Scale shape: entirely STATELESS stream-static — the neighbor model is
  * a bounded ≤3·|items| relation (index-derived, the q44_item_sim
  * output), so serving is one equi join per micro-batch with no
  * watermark, no state store, and no fact-table access on the hot path.
  * The scoped overload persists the model once for the stream's lifetime
  * (every micro-batch would otherwise recompute the window over the edge
  * relation); close the returned [[GateCaches]] at teardown.
  */
object RecStream {

  /** `purchases`: streaming (cust, part, ...). Returns
    * (cust, part, rnk, suggestion, jaccard_ppm) — up to 3 rows per
    * arriving purchase, ordered by model rank within each.
    */
  def suggestions(purchases: DataFrame, d: String): DataFrame =
    suggestionsScoped(purchases, d)._1

  def suggestionsScoped(purchases: DataFrame, d: String): (DataFrame, GateCaches) = {
    val s = purchases.sparkSession
    val nbr = RecQueries.itemNeighbors(s, d)
      .select(col("a").as("part"), col("rnk"),
        col("b").as("suggestion"), col("jaccard_ppm"))
      .persist()
    val out = purchases.join(nbr, Seq("part"))
      .select(col("cust"), col("part"), col("rnk"),
        col("suggestion"), col("jaccard_ppm"))
    (out, new GateCaches(Seq(nbr)))
  }
}
