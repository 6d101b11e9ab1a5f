package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Every registered query runs end-to-end at sf0.001 (schema resolution,
  * expression validity, no runtime throw). Value correctness is the DuckDB
  * oracle harness (tools/check.py); this spec catches breakage earlier and
  * covers the rows-only queries the oracle can't.
  */
class QueriesSmokeSpec extends SparkSpec {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
    }
  }

  test("every oracle key has a query, flagship entry returns rows") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q30_approx_distinct: HLL estimates within the documented error bound") {
    // approx_count_distinct's default rsd is 0.05; HLL++ is deterministic
    // for a given input, but the estimate must still sit within a few
    // standard deviations of exact or the sketch is miswired. 3·rsd = 15 %.
    val r = SparkEntry.queries("q30_approx_distinct")(spark, sf).collect().head
    for ((approx, exact) <- Seq(
        (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts")),
        (r.getAs[Long]("approx_supps"), r.getAs[Long]("exact_supps")))) {
      assert(exact > 0)
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.15, s"HLL relative error $relErr exceeds 3*rsd (approx=$approx exact=$exact)")
    }
  }
}
