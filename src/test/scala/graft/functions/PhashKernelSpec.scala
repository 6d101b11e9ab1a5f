package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.{SparkSpec, Tables}

/** The native phash32 kernel must be bit-identical to the SQL form it
  * replaced (explode 4-grams → md5-derived value → grouped ±1 bit sums)
  * on the full real payload set, and must handle the short-string edge
  * the SQL form expresses as an empty gram array.
  */
class PhashKernelSpec extends SparkSpec {
  import spark.implicits._

  test("kernel == grouped SQL form on every event payload") {
    val p = Tables.events(spark, sf)
      .select(concat(lit("evt-"), $"event_id").as("position"), $"props".as("txt"))
      .filter(length($"txt") >= 4)
    val grams = p.select($"position",
        explode(expr(
          "transform(sequence(1, length(txt) - 3), i -> substring(txt, i, 4))")).as("g"))
      .withColumn("v", conv(substring(md5($"g"), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright($"v", b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$b")
    }
    val sigExpr = (0 until 32).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sqlForm = grams.groupBy($"position").agg(bitSums.head, bitSums.tail: _*)
      .select($"position", sigExpr.as("phash"))
      .as[(String, Long)].collect().toMap
    val kernel = p.select($"position",
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          Phash32(org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("txt")))).as("phash"))
      .as[(String, Long)].collect().toMap
    assert(kernel.nonEmpty)
    assert(kernel === sqlForm)
  }

  test("short strings hash to 0 (the SQL form's empty gram array)") {
    assert(TextOps.phash32(UTF8String.fromString("")) === 0L)
    assert(TextOps.phash32(UTF8String.fromString("abc")) === 0L)
    assert(TextOps.phash32(UTF8String.fromString("abcd")) !== 0L)
  }

  test("kernel == SQL form on non-BMP input (code-point gram boundaries)") {
    // Spark's substring/length (and the DuckDB oracle's substr) are
    // code-point based — a UTF-16 char iteration would shift gram
    // boundaries past any surrogate pair and split pairs mid-gram.
    val texts = Seq(
      "a😀bcd😀ef",                 // supplementary chars mid-string
      "😀😀😀😀",                   // exactly 4 code points, 8 UTF-16 chars
      "𠀀𠀁𠀂𠀃𠀄 plane-2 CJK",     // supplementary CJK run
      "tail pair at end 👩‍🚀🎄ab", // ZWJ sequence + BMP tail
      "abc🎄"                      // 4 code points, pair at the end
    )
    val p = texts.zipWithIndex.map { case (t, i) => (s"nb-$i", t) }
      .toDF("position", "txt")
    val grams = p.select($"position",
        explode(expr(
          "transform(sequence(1, length(txt) - 3), i -> substring(txt, i, 4))")).as("g"))
      .withColumn("v", conv(substring(md5($"g"), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright($"v", b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$b")
    }
    val sigExpr = (0 until 32).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sqlForm = grams.groupBy($"position").agg(bitSums.head, bitSums.tail: _*)
      .select($"position", sigExpr.as("phash"))
      .as[(String, Long)].collect().toMap
    val kernel = texts.zipWithIndex.map { case (t, i) =>
      s"nb-$i" -> TextOps.phash32(UTF8String.fromString(t))
    }.toMap
    assert(sqlForm.size === texts.size)
    assert(kernel === sqlForm)
  }
}
