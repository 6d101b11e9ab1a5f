package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Shared embedding-vector plumbing (SURVEY §2.E/F).
  *
  * Quantization: floor(x*1e6+0.5) per element makes every dot product and
  * norm an exact 64-bit integer (|q|≤1e6, 64 dims → |dot| ≤ 6.4e13), so
  * similarity values are bit-identical across engines, partitionings and
  * summation orders — the property the DuckDB oracles rely on.
  */
object VectorOps {

  /** embeddings with quantized vector `q` and integer squared norm `nn` */
  def quantized(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "embeddings")
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))").as("q"))
      .withColumn("nn", expr("aggregate(q, 0L, (acc, x) -> acc + x * x)"))
  }

  val dotExpr: String =
    "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  /** All pairs (va < vb ≤ va+band) with quantized cosine in ppm.
    *
    * The id-range condition alone would force a nested-loop join (O(n²)
    * pair evaluations). Bucketizing vec_id by the band width turns it into
    * an equi hash join — the left side probes its own and the next bucket,
    * so each row is evaluated against ≤ 2·band candidates, and the shuffle
    * key (bucket) scales the plan linearly at any corpus size.
    */
  def bandedCosinePairs(s: SparkSession, d: String, band: Int): DataFrame = {
    import s.implicits._
    val e = quantized(s, d)
    val a = e.select($"vec_id".as("va"), $"q".as("qa"), $"nn".as("na"))
      .withColumn("bucket", explode(array(floor($"va" / band), floor($"va" / band) + 1)))
    val b = e.select($"vec_id".as("vb"), $"q".as("qb"), $"nn".as("nb"))
      .withColumn("bucket", floor($"vb" / band))
    a.join(b, Seq("bucket"))
      .filter($"vb" > $"va" && $"vb" <= $"va" + band)
      .withColumn("dot", expr(dotExpr))
      .withColumn("cos_ppm",
        floor($"dot" / (sqrt($"na") * sqrt($"nb")) * lit(1000000.0) + lit(0.5)).cast("long"))
      .select($"va", $"vb", $"cos_ppm")
  }
}
