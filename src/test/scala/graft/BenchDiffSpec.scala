package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's round-over-round regression gate must actually read the
  * committed artifact and flag real drifts — its runtime wrapper
  * swallows every Throwable (an artifact must never be lost to a diff
  * bug), so a parse regression would otherwise degrade to a
  * silently-empty `regressions` field.
  */
class BenchDiffSpec extends AnyFunSuite {

  test("parseDetail reads the committed BENCH_DETAIL.json (mins + sf)") {
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists(), "no committed bench detail artifact (fresh clone)")
    val (mins, sf) = Bench.parseDetail(f)
    assert(mins.size > 100, s"all-queries map too small: ${mins.size}")
    assert(mins.contains("q1_agg"))
    assert(mins.valuesIterator.forall(v => v >= 0 && v < 3600))
    assert(sf.contains("sf0.1"),
      s"committed artifact is not a round-close sf0.1 run: '$sf'")
  }

  test("assembleDetail carries all four fixed sections at every checkpoint shape") {
    val fixed = Seq("D", "L", "A", "F")
    for (scale <- Seq(Seq.empty[String], Seq("S10"), Seq("S10", "S100"))) {
      val got = Bench.assembleDetail("D", "L", "A", scale, "F")
      assert(fixed.forall(got.contains),
        s"a checkpoint write dropped a fixed section: $got")
      assert(got.last === "F" && got.head === "D")
      assert(scale.forall(got.contains))
    }
  }

  test("committed BENCH_DETAIL.json keeps the listing-probe section beside the scale probes") {
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists(), "no committed bench detail artifact (fresh clone)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    var hasScale, hasListing = false
    root.elements().forEachRemaining { n =>
      if (n.path("detail").asText("") == "scale-probe") hasScale = true
      if (n.path("detail").asText("") == "listing-probe") hasListing = true
    }
    assert(!hasScale || hasListing,
      "a full (scale-probed) bench artifact is missing its listing-probe section — " +
        "the round-12 silently-dropped-section bug")
  }

  test("committed scale-probe sections carry the heavyweight builds' sub-stage keys") {
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists(), "no committed bench detail artifact (fresh clone)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    root.elements().forEachRemaining { n =>
      // a truncated or stage-errored probe legitimately lacks the keys
      // (the probe design permits both and still reports what it took) —
      // only a CLEAN probe that dropped them is a regression
      val clean = n.path("detail").asText("") == "scale-probe" && !n.has("error") &&
        !n.path("truncated").asBoolean(false) && n.path("stage_errors").size() == 0
      if (clean) {
        val st = n.path("stages")
        for (k <- Seq("graph_edge", "embed_verify"))
          assert(st.has(k),
            s"amp=${n.path("amp").asInt()} probe lost its '$k' sub-stage key — " +
              "the next decade's super-linear sub-stage would be invisible again")
      }
    }
  }

  test("a flagged listing decade reaches the regression gate; a crashed probe carries sentinels") {
    val pairs = Map("list" -> (0.1, 9.9), "paged_list" -> (0.3, 8.8), "cache" -> (0.0, 0.4))
    assert(Bench.listingRegressionsOf(Seq.empty, pairs) === Seq.empty)
    assert(Bench.listingRegressionsOf(Seq("list"), pairs) ===
      Seq(("listing:list", 0.1, 9.9)))
    // the paged/latent variant and the cache contract feed the same gate
    assert(Bench.listingRegressionsOf(Seq("paged_list", "cache"), pairs) ===
      Seq(("listing:paged_list", 0.3, 8.8), ("listing:cache", 0.0, 0.4)))
    // a crashed probe (or unknown stage) carries sentinels, which
    // regressionJson renders as an explicit error marker, never numbers
    assert(Bench.listingRegressionsOf(Seq("probe_error"), pairs) ===
      Seq(("listing:probe_error", -1.0, -1.0)))
    assert(Bench.regressionJson(Bench.listingRegressionsOf(Seq("probe_error"), pairs)) ===
      """[{"q":"listing:probe_error","error":"probe_error"}]""")
  }

  test("new-format listing-probe sections carry the paged/latent variant keys") {
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists(), "no committed bench detail artifact (fresh clone)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    var newFormat = false
    root.elements().forEachRemaining { n =>
      if (n.path("detail").asText("") == "per-pass" && n.has("stages")) newFormat = true
    }
    if (newFormat) root.elements().forEachRemaining { n =>
      if (n.path("detail").asText("") == "listing-probe")
        for (k <- Seq("paged_list_sec", "cached_repeat_sec"))
          assert(n.has(k), s"listing-probe section lost its '$k' key — " +
            "the paged/latent LIST-cost bound would ship unmeasured")
    }
  }

  test("sample-carrying per-pass sections keep the raw ingest samples") {
    // median5 picks the middle element of 5 (and degrades sanely on
    // fewer); the artifact carries the raw spread so a cross-round rate
    // delta is readable as regression-or-noise (this shared VM shows
    // minute-scale neighbor I/O episodes that move even a median-of-5)
    assert(Bench.median5(Seq(3.0, 1.0, 9.0, 2.0, 8.0)) === 3.0)
    assert(Bench.median5(Seq(5.0)) === 5.0)
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists(), "no committed bench detail artifact (fresh clone)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    root.elements().forEachRemaining { n =>
      if (n.path("detail").asText("") == "per-pass" &&
          n.has("ingest_write_sec_samples")) {
        for (k <- Seq("ingest_write_sec_samples", "ingest_read_sec_samples"))
          assert(n.path(k).size() === 5,
            s"'$k' must carry all 5 raw passes, got ${n.path(k).size()}")
      }
    }
  }

  test("a deliberately slowed build stage reaches the regression gate end-to-end") {
    // link 1 — the flag rule: embed_verify and graph_edge carry their
    // measured-band budgets (5.5x volume-bound / 2.5x bench-JVM-aging —
    // each band established by experiment, ScaleProbe.stageAllowance);
    // every sibling flags past 1.5x; sub-flagMinSec stages and stages
    // without a baseline never flag
    val base = Map("graph_edge" -> 6.0, "embed_verify" -> 3.0, "graph_wm" -> 0.2)
    val (ratios, flagged) = ScaleProbe.stageFlagsOf(
      Seq(
        "graph_edge" -> 186.0, // 3.1x — past even the aging band → flags
        "embed_verify" -> 139.7, // 4.66x — inside its designed volume-bound budget
        "graph_wm" -> 3.1, // 1.55x and >2s — a sibling past the linear band: flags
        "graph_new" -> 50.0), // no prior-decade baseline → skipped
      base, linFactor = 10.0, flagMinSec = 2.0)
    assert(ratios.toMap.get("graph_edge").exists(r => math.abs(r - 3.1) < 0.01))
    assert(flagged === Seq("graph_edge", "graph_wm"))
    // the r14 measured points sit INSIDE their budgets (close stays green)
    val (_, cleanFlags) = ScaleProbe.stageFlagsOf(
      Seq("graph_edge" -> 81.9, "embed_verify" -> 139.7),
      Map("graph_edge" -> 5.11, "embed_verify" -> 2.83), 10.0, 2.0)
    assert(cleanFlags === Seq.empty)
    // link 2 — flagged stages map onto gate rows carrying the decade pair
    val rows = Bench.stageRegressionsOf(100, flagged,
      base, Map("graph_edge" -> 186.0, "graph_wm" -> 3.1))
    assert(rows === Seq(("scale100:graph_edge", 6.0, 186.0), ("scale100:graph_wm", 0.2, 3.1)))
    // link 3 — the rows serialize into the `regressions` field close.py's
    // non-empty gate reads; a missing timing becomes an explicit error
    // marker, never a ratio-able number (round-13 ADVICE)
    assert(Bench.regressionJson(rows.take(1)) ===
      """[{"q":"scale100:graph_edge","prev":6,"cur":186}]""")
    assert(Bench.regressionJson(Seq(("scale100:gone", -1.0, 3.0))) ===
      """[{"q":"scale100:gone","error":"probe_error"}]""")
  }

  test("new-format scale-probe sections carry the stage gate keys") {
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.exists(), "no committed bench detail artifact (fresh clone)")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    // only enforce on artifacts written by the stage-gated bench (their
    // per-pass section carries the sf0.1 "stages" baseline) — the gate
    // must not fail the suite against the last round's committed artifact
    var newFormat = false
    root.elements().forEachRemaining { n =>
      if (n.path("detail").asText("") == "per-pass" && n.has("stages")) newFormat = true
    }
    if (newFormat) root.elements().forEachRemaining { n =>
      if (n.path("detail").asText("") == "scale-probe" && !n.has("error")) {
        for (k <- Seq("stage_ratio", "stage_flagged"))
          assert(n.has(k),
            s"amp=${n.path("amp").asInt()} probe lost its '$k' key — " +
              "stage regressions would stop reaching the close gate")
      }
    }
  }

  test("regression rule: both thresholds required, missing prior skipped") {
    val prev = Map("a" -> 1.0, "b" -> 0.1, "c" -> 10.0)
    val got = Bench.regressionsVs(prev, Seq(
      "a" -> 1.9, // >1.5x and >0.4s → flagged
      "b" -> 0.4, // >1.5x but only +0.3s → noise, not flagged
      "c" -> 12.0, // +2s but only 1.2x → not flagged
      "d" -> 99.0)) // no prior (new query) → skipped
    assert(got === Seq(("a", 1.0, 1.9)))
  }
}
