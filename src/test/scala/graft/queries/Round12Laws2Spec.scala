package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the round-12 text profile operators
  * (txt_ttr_curve / txt_stopword_mass / txt_sent_len / txt_punct_profile
  * / txt_code_signals / txt_ascii_ratio) — every expectation below is
  * pinned by hand arithmetic, including the head-set tie-break and the
  * zero-terminator NULL guard.
  */
class Round12Laws2Spec extends SparkSpec {
  import spark.implicits._

  /** vocab small enough to hand-rank: tf = a×5 + 36 singletons, so the
    * top-25 head set is 'a' plus the 24 alphabetically-first singletons
    * (the (n desc, tok) tie-break made observable)
    */
  private lazy val dirA: String = {
    val d = graft.rawdata.Topic.tempDir("r12-text-a")
    Seq(
      (1L, "a a a a", "en", "s1"),
      (2L, "a b c d", "en", "s1"),
      (3L, "x", "xx", "s2"),
      (4L, "p q", "xx", "s2"),
      (5L, (1 to 30).map(i => s"t$i").mkString(" "), "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val dirB: String = {
    val d = graft.rawdata.Topic.tempDir("r12-text-b")
    Seq(
      (6L, "Hi! (a, b) 'c': {d};", "fr", "s4"),
      (7L, "héllo wörld", "de", "s5"),
      (8L, "int x = 1; if (y) { z(); }", "en", "s6"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("txt_ttr_curve: hand-computed bands (4-token uniform vs distinct, singleton, pair)") {
    val rows = TextQueries.queries("txt_ttr_curve")(spark, dirA).collect()
      .map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("min_ttr_ppm"), r.getAs[Long]("mean_ttr_ppm"))))
      .toMap
    assert(rows === Map(
      0L -> ((1L, 1L, 1000000L, 1000000L)),   // "x"
      1L -> ((1L, 2L, 1000000L, 1000000L)),   // "p q"
      2L -> ((2L, 8L, 250000L, 625000L)),     // "a a a a" (250k) + "a b c d" (1M)
      4L -> ((1L, 30L, 1000000L, 1000000L)))) // 30 distinct singles
  }

  test("txt_stopword_mass: the top-25 head set resolves ties alphabetically") {
    // head = 'a' (n=5) + first 24 singletons by tok asc:
    // b c d p q t1 t10..t19 t2 t20..t26 — so s1 is fully covered,
    // s2 covers p,q but not x, s3 covers 19 of its 30 types
    val rows = TextQueries.queries("txt_stopword_mass")(spark, dirA).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("stop_tokens"),
          r.getAs[Long]("stop_ppm"))))
      .toMap
    assert(rows === Map(
      "s1" -> ((8L, 8L, 1000000L)),
      "s2" -> ((3L, 2L, 666666L)),
      "s3" -> ((30L, 19L, 633333L))))
  }

  test("txt_sent_len: terminator runs count sentences; zero terminators report NULL") {
    val a = TextQueries.queries("txt_sent_len")(spark, dirA).collect()
    // neither en nor xx has a single [.!?] — the NULL guard, not a throw
    assert(a.length === 2)
    assert(a.forall(_.isNullAt(a.head.fieldIndex("words_per_sent_milli"))))
    val b = TextQueries.queries("txt_sent_len")(spark, dirB).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_sents"), r.getAs[Long]("n_words"),
          Option(r.getAs[java.lang.Long]("words_per_sent_milli")).map(_.longValue()))))
      .toMap
    // fr "Hi! (a, b) 'c': {d};": one ! run, alnum runs i,a,b,c,d
    assert(b("fr") === ((1L, 5L, Some(5000L))))
    // en "int x = 1; if (y) { z(); }": zero terminators ('.' absent),
    // 6 alnum runs (int, x, 1, if, y, z)
    assert(b("en") === ((0L, 6L, None)))
  }

  test("txt_punct_profile: hand-counted class masses for the planted doc") {
    val r = TextQueries.queries("txt_punct_profile")(spark, dirB).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // "Hi! (a, b) 'c': {d};" — 20 chars; term ! = 1; pause , : ; = 3;
    // quote ' ' = 2; bracket ( ) { } = 4
    val s4 = r("s4")
    assert(s4.getAs[Long]("n_chars") === 20L)
    assert(s4.getAs[Long]("n_term") === 1L)
    assert(s4.getAs[Long]("n_pause") === 3L)
    assert(s4.getAs[Long]("n_quote") === 2L)
    assert(s4.getAs[Long]("n_bracket") === 4L)
    assert(s4.getAs[Long]("term_ppm") === 50000L)
    assert(s4.getAs[Long]("bracket_ppm") === 200000L)
  }

  test("txt_code_signals: the code doc flags at its exact milli density, prose does not") {
    val rows = TextQueries.queries("txt_code_signals")(spark, dirB).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_flagged"), r.getAs[Long]("flag_ppm"),
          r.getAs[Long]("mean_code_milli"))))
      .toMap
    // "int x = 1; if (y) { z(); }" — 26 chars, code chars = ; ( y-parens
    // ) { ( ) ; } plus '=' → 9; (9*1000) div 26 = 346
    assert(rows("s6") === ((1L, 1000000L, 346L)))
    assert(rows("s4")._1 === 1L) // the punct doc is bracket-heavy enough to flag too
    assert(rows("s5") === ((0L, 0L, 0L))) // plain prose
  }

  test("txt_ascii_ratio: accented chars counted out, pure-ASCII docs counted") {
    val rows = TextQueries.queries("txt_ascii_ratio")(spark, dirB).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_ascii"),
          r.getAs[Long]("n_pure_ascii"), r.getAs[Long]("ascii_ppm"))))
      .toMap
    // "héllo wörld" — 11 chars, 2 non-ASCII → 9/11 = 818181 ppm
    assert(rows("de") === ((11L, 9L, 0L, 818181L)))
    assert(rows("en") === ((26L, 26L, 1L, 1000000L)))
    assert(rows("fr") === ((20L, 20L, 1L, 1000000L)))
  }
}
