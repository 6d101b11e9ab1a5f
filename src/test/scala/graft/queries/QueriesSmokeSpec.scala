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
}
