package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of the weighted Misra-Gries summary ([[MisraGries]]) that
  * txt_heavy's exactness rests on: bounded size, candidate completeness
  * for every key above N/(cap+1), lower-bound error ≤ N/(cap+1), and
  * partition-layout independence of the DOWNSTREAM exact result (the
  * summary itself may differ with merge order; the two-pass query must
  * not).
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(items: Seq[String], cap: Int, parts: Int): MgSummary = {
    val ds = spark.createDataset(items).repartition(parts)
    ds.select(new MisraGries(cap).toColumn).head()
  }

  // zipf-ish synthetic stream: key k appears 1000/k times, k = 1..200
  private val stream: Seq[String] =
    (1 to 200).flatMap(k => Seq.fill(1000 / k)(s"k$k"))
  private val truth: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("summary size never exceeds cap and total is exact") {
    for (parts <- Seq(1, 3, 8)) {
      val s = summarize(stream, cap = 16, parts = parts)
      assert(s.keys.length <= 16)
      assert(s.total === stream.size.toLong)
    }
  }

  test("every key above N/(cap+1) survives, at every partition layout") {
    val cap = 16
    val n = stream.size.toLong
    val mustSurvive = truth.collect { case (k, c) if c > n / (cap + 1) => k }
    assert(mustSurvive.nonEmpty) // the law must actually bite
    for (parts <- Seq(1, 3, 8)) {
      val s = summarize(stream, cap, parts)
      val kept = s.keys.toSet
      mustSurvive.foreach(k => assert(kept.contains(k), s"parts=$parts lost $k"))
    }
  }

  test("adversarial arrival orders cannot break the completeness law") {
    val cap = 16
    val n = stream.size.toLong
    val mustSurvive = truth.collect { case (k, c) if c > n / (cap + 1) => k }
    // sorted order (all copies of a key adjacent) and reverse-sorted
    // order (heavy keys last) are the classic decrement-pressure cases
    for (ordered <- Seq(stream.sorted, stream.sorted.reverse)) {
      val s = summarize(ordered, cap, parts = 1)
      val kept = s.keys.toSet
      mustSurvive.foreach(k => assert(kept.contains(k), s"order lost $k"))
      assert(s.keys.length <= cap)
    }
  }

  test("stored counts are lower bounds within N/(cap+1) of the truth") {
    val cap = 16
    val n = stream.size.toLong
    val s = summarize(stream, cap, parts = 4)
    s.keys.zip(s.lowers).foreach { case (k, lo) =>
      val t = truth(k)
      assert(lo <= t, s"$k stored $lo above truth $t")
      assert(t - lo <= n / (cap + 1), s"$k underestimates by ${t - lo}")
    }
  }

  test("txt_heavy: exact counts, threshold-complete, layout-independent") {
    val rows = graft.SparkEntry.queries("txt_heavy")(spark, sf).collect()
    assert(rows.nonEmpty)
    val thr = rows.head.getLong(3)
    val nTotal = rows.head.getLong(2)
    // exact truth from a plain full aggregation
    val exact = graft.queries.CorpusTokenIndex.tokens(spark, sf)
      .select($"tok").filter(length($"tok") > 0)
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nTotal === exact.values.sum)
    val want = exact.filter(_._2 >= thr)
    assert(rows.length === want.size)
    rows.foreach { r =>
      assert(want.get(r.getString(0)).contains(r.getLong(1)))
    }
  }
}
