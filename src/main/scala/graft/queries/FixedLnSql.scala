package graft.queries

/** DuckDB-side twin of [[graft.functions.FixedLnOps.lnMicro]]: generates
  * a chain of CTEs that carries a relation through the SAME exact-integer
  * fixed-point ln algorithm, step by step — binary-search ⌊log₂⌋ walk,
  * normalize into [2³⁰, 2³¹), 20 integer squaring steps, one scaled-ln2
  * multiply. Every operation is BIGINT comparison / multiply / constant
  * integer division on non-negative values, where DuckDB `//` and the
  * Spark-side shifts agree exactly — so the oracle replays the native
  * expression bit-for-bit instead of trusting libm parity.
  *
  * Division-by-constant-power-of-two note: the e-walk divides DOWN in
  * binary stages (… // 2³² then // 2¹⁶ …). For non-negative integers
  * floor(floor(x/a)/b) = floor(x/(ab)), so the staged walk equals the
  * single shift the Scala side performs.
  */
object FixedLnSql {

  /** CTE chain computing `ln_<v> = ln_micro(<v>)` for every value column
    * `vals` of relation `src`, carrying `keep` columns through. Emits
    * CTEs named `<pfx>0 … <pfx>N`; the final CTE (returned as `.last`)
    * exposes keep ++ vals ++ vals.map("ln_" + _).
    */
  def chain(src: String, pfx: String, keep: Seq[String], vals: Seq[String]): (String, String) = {
    val carry = (keep ++ vals).mkString(", ")
    val steps = Seq.newBuilder[String]
    var n = 0
    def cte(exprs: Seq[String]): Unit = {
      val prev = if (n == 0) src else s"$pfx${n - 1}"
      steps += s"$pfx$n AS (SELECT $carry, ${exprs.mkString(",\n    ")} FROM $prev)"
      n += 1
    }
    // init: e=0, m=v (the walk reduces m to [2^30, 2^31) while tracking e)
    cte(vals.map(v => s"CAST(0 AS BIGINT) AS e_$v, $v AS m_$v"))
    // phase DOWN for v >= 2^31: halve by 2^s whenever m >= 2^(30+s) —
    // the condition is exactly what keeps m >= 2^30 afterwards
    for (s <- Seq(32, 16, 8, 4, 2, 1)) {
      val p = 1L << s
      val thr = BigInt(1) << (30 + s)
      cte(vals.map(v =>
        s"e_$v + CASE WHEN m_$v >= $thr THEN $s ELSE 0 END AS e_$v, " +
          s"CASE WHEN m_$v >= $thr THEN m_$v // $p ELSE m_$v END AS m_$v"))
    }
    // phase UP for v < 2^30: double by 2^s whenever m < 2^(31-s) (the
    // product stays < 2^31); greedy largest-first reaches [2^30, 2^31)
    for (s <- Seq(16, 8, 4, 2, 1)) {
      val p = 1L << s
      val thr = 1L << (31 - s)
      cte(vals.map(v =>
        s"e_$v - CASE WHEN m_$v < $thr THEN $s ELSE 0 END AS e_$v, " +
          s"CASE WHEN m_$v < $thr THEN m_$v * $p ELSE m_$v END AS m_$v"))
    }
    // e so far counts shifts relative to 2^30: floor(log2 v) = 30 + e
    cte(vals.map(v => s"e_$v + 30 AS e_$v, m_$v AS m_$v, CAST(0 AS BIGINT) AS f_$v"))
    // 20 squaring steps: m in [2^30, 2^31) => m*m < 2^62 (no overflow),
    // t = m*m // 2^30 in [2^30, 2^32); bit = t >= 2^31
    for (_ <- 1 to graft.functions.FixedLnOps.FracBits) {
      cte(vals.map { v =>
        val t = s"(m_$v * m_$v) // 1073741824"
        s"e_$v AS e_$v, " +
          s"f_$v * 2 + CASE WHEN $t >= 2147483648 THEN 1 ELSE 0 END AS f_$v, " +
          s"CASE WHEN $t >= 2147483648 THEN ($t) // 2 ELSE $t END AS m_$v"
      })
    }
    cte(vals.map(v =>
      s"((e_$v * 1048576 + f_$v) * ${graft.functions.FixedLnOps.Ln2MicroC}) // 67108864 AS ln_$v"))
    (steps.result().mkString(",\n"), s"$pfx${n - 1}")
  }
}
