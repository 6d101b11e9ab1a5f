package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native char_ngrams expression must be value-equal with the
  * transform/substring HOF idiom it replaced — on the whole corpus and
  * on the edges (short strings, multi-byte UTF-8, nulls).
  */
class TextExprSpec extends SparkSpec {
  import spark.implicits._

  private val hof3 = "if(char_length(s) < 3, array(), " +
    "transform(sequence(1, char_length(s) - 2), i -> substring(s, i, 3)))"

  test("char_ngrams equals the HOF form on the whole corpus") {
    val docs = graft.Tables.t(spark, sf, "documents")
      .select($"text".as("s"))
    val both = docs
      .withColumn("native", expr("char_ngrams(s, 3)"))
      .withColumn("hof", expr(hof3))
    assert(both.filter(expr("native <> hof")).count() === 0)
    assert(both.filter(size($"native") > 0).count() > 0)
  }

  test("char_ngrams edges: short, exact-n, multi-byte, empty, null") {
    val rows = Seq("", "a", "ab", "abc", "abcd", "héllo wörld", "æøå", "日本語のテキスト")
      .toDF("s")
      .withColumn("native", expr("char_ngrams(s, 3)"))
      .withColumn("hof", expr(hof3))
    assert(rows.filter(expr("native <> hof")).count() === 0)
    // explicit spot checks: n-gram count = char_length - 2, multi-byte safe
    val m = rows.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1)).toMap
    assert(m("").isEmpty && m("a").isEmpty && m("ab").isEmpty)
    assert(m("abc") === Seq("abc"))
    assert(m("abcd") === Seq("abc", "bcd"))
    assert(m("æøå") === Seq("æøå"))
    assert(m("日本語のテキスト").head === "日本語")
    assert(m("日本語のテキスト").length === 6)
    // null propagates
    val nul = spark.sql("SELECT char_ngrams(CAST(NULL AS STRING), 3) AS g").collect()
    assert(nul.head.isNullAt(0))
  }

  test("other n values match their HOF twins") {
    for (n <- Seq(1, 2, 4)) {
      val hofN = s"if(char_length(s) < $n, array(), " +
        s"transform(sequence(1, char_length(s) - ${n - 1}), i -> substring(s, i, $n)))"
      val docs = graft.Tables.t(spark, sf, "documents")
        .limit(200).select($"text".as("s"))
        .withColumn("native", expr(s"char_ngrams(s, $n)"))
        .withColumn("hof", expr(hofN))
      assert(docs.filter(expr("native <> hof")).count() === 0, s"n=$n")
    }
  }

  private val chain = """md5(trim(regexp_replace(lower(s), '\\s+', ' ')))"""

  test("norm_fp equals the lower/regexp_replace/trim/md5 chain on the whole corpus") {
    val docs = graft.Tables.t(spark, sf, "documents").select($"text".as("s"))
    val both = docs
      .withColumn("native", expr("norm_fp(s)"))
      .withColumn("sqlchain", expr(chain))
    assert(both.filter(expr("native <> sqlchain")).count() === 0)
    assert(both.count() > 0)
  }

  test("norm_fp edges: whitespace runs, trim halves, Unicode case, NBSP, null") {
    val rows = Seq(
      "", " ", " \t\n\u000B\u000C\r ", "a", "  a  ", "a  b", "\ta\tb\r\n",
      "The  Quick fox", "HÉLLO  WÖRLD", "ÆØÅ æøå", "日本語 の  テキスト",
      "a\u00A0b", // NBSP is NOT \s — must survive, not collapse
      "x \t y \n z").toDF("s")
      .withColumn("native", expr("norm_fp(s)"))
      .withColumn("sqlchain", expr(chain))
    assert(rows.filter(expr("native <> sqlchain")).count() === 0)
    // null in, null out (both sides)
    val nulls = Seq[Option[String]](None).toDF("s")
      .withColumn("native", expr("norm_fp(s)"))
      .withColumn("sqlchain", expr(chain))
      .collect()
    assert(nulls.head.isNullAt(1) && nulls.head.isNullAt(2))
  }
}
