package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins whose key distribution has a few hot
  * keys (the classic 100 TB failure: one key's rows land on one task
  * and the stage runs at straggler speed while 999 executors idle).
  *
  * `saltedJoin` splits every key's fact rows across `salts` sub-keys
  * (salt = hash of a per-row unique column, so the split is
  * deterministic and even) and replicates each dim row once per salt
  * value; joining on (key, salt) then spreads a hot key's probe work
  * over `salts` tasks. The result is row-identical to the plain join —
  * the dim replication factor is `salts`, so keep it small (8–32) and
  * the dim side narrow.
  *
  * AQE's skew-join handling covers sort-merge joins it can re-split at
  * runtime; explicit salting is for the cases AQE can't touch — hash
  * aggregations downstream of the join keyed on the same hot key, or
  * engines/paths where the skewed side is already a single over-full
  * partition at read time.
  */
object SkewOps {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `salts` ways.
    *
    * `uniqueCol` must be a fact column that distinguishes rows within a
    * key (any unique id); dim columns other than `key` must not collide
    * with fact column names.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, uniqueCol: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val f = fact.withColumn("__salt", pmod(hash(col(uniqueCol)), lit(salts)))
    val d = dim.withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
