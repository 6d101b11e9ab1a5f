#!/usr/bin/env python3
"""Round-close driver: make the closing evidence chain mechanical.

Usage: python3 tools/close.py <round_number> [--skip-check] [--skip-suite] [--skip-bench]

Sequence (each step loud, nothing swallowed):
  0. tools/check.py at sf0.01 (the DuckDB oracle harness; regenerates
     CORRECTNESS_LOCAL.json for the live zero-row guard),
  1. purge target/test-reports so every report XML provably postdates
     the last source commit (no deleted-spec leftovers),
  2. full ScalaTest suite (must be green),
  3. full bench at sf0.1/local[32] (writes BENCH_DETAIL.json itself,
     including the listing-probe and scale-probe sections),
  4. assemble BENCH_r{N}.json in the driver's artifact shape:
     {"n", "rc", "cpus", "sf", "tail": last 2000 chars of the bench's
      JSON stdout, "parsed": the final {"metric":"total"...} line}.

Committing stays manual — the closing commit must carry
BENCH_r{N}.json + BENCH_DETAIL.json + CORRECTNESS_LOCAL.json together
and be the round's LAST commit. After committing, run

  python3 tools/close.py <N> --verify-commit

to mechanically check that commit: HEAD must touch EXACTLY the three
artifacts, the working tree must be clean (no source edited after the
evidence was produced), and HEAD must postdate the last source-touching
commit.
"""
import json
import shutil
import subprocess
import sys
from pathlib import Path

KNOWN_FLAGS = {"--skip-check", "--skip-suite", "--skip-bench", "--allow-regressions",
               "--verify-commit"}
USAGE = "usage: python3 tools/close.py <round_number> " + " ".join(f"[{f}]" for f in sorted(KNOWN_FLAGS))
args = sys.argv[1:]
bad = [a for a in args[1:] if a not in KNOWN_FLAGS]
if not args or not args[0].isdigit() or bad:
    sys.exit(f"{USAGE}\n" + (f"unknown flags: {bad}" if bad else ""))
ROUND = int(args[0])
REPO = Path(__file__).resolve().parent.parent


def run(cmd, **kw):
    print(f"[close] $ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def git(*a):
    return subprocess.run(["git", *a], cwd=REPO, capture_output=True,
                          text=True, check=True).stdout


if "--verify-commit" in sys.argv:
    expected = {f"BENCH_r{ROUND:02d}.json", "BENCH_DETAIL.json", "CORRECTNESS_LOCAL.json"}
    problems = []
    dirty = git("status", "--porcelain").strip()
    if dirty:
        problems.append(f"working tree not clean (source edited after the evidence?):\n{dirty}")
    head_files = set(git("show", "--name-only", "--format=", "HEAD").split())
    if head_files != expected:
        problems.append(f"HEAD must touch exactly {sorted(expected)}, touches {sorted(head_files)}")
    head_t = int(git("log", "-1", "--format=%ct", "HEAD").strip())
    src_t_raw = git("log", "-1", "--format=%ct", "HEAD", "--",
                    "src", "build.sbt", "tools", "project").strip()
    if src_t_raw and int(src_t_raw) > head_t:
        problems.append("the last source-touching commit postdates HEAD")
    for f in expected:
        if not (REPO / f).exists():
            problems.append(f"{f} missing from the working tree")
    if problems:
        sys.exit("[close] --verify-commit FAILED:\n" + "\n".join(f"  - {p}" for p in problems))
    print(f"[close] --verify-commit OK: HEAD is the round-{ROUND} closing commit "
          f"({sorted(expected)}), tree clean, postdates the last source change")
    sys.exit(0)


if "--skip-check" not in sys.argv:
    r = run([sys.executable, "tools/check.py"])
    if r.returncode != 0:
        sys.exit(f"[close] check.py FAILED (rc={r.returncode}) — fix before closing")

if "--skip-suite" not in sys.argv:
    reports = REPO / "target" / "test-reports"
    if reports.exists():
        shutil.rmtree(reports)
        print(f"[close] purged {reports}")
    r = run(["sbt", "-batch", "test"])
    if r.returncode != 0:
        sys.exit(f"[close] suite FAILED (rc={r.returncode}) — fix before closing")

if "--skip-bench" not in sys.argv:
    import os
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32")
    # stderr folds into stdout: sbt/JVM diagnostics (OOM stacks, GC
    # crashes) land on stderr and were previously discarded, making a
    # failed close undiagnosable from its log (round-13 ADVICE)
    r = run(["sbt", "-batch", "runMain graft.Bench"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    out = r.stdout
    Path("/tmp/graft_close_bench.log").write_text(out)
    if r.returncode != 0:
        print(out[-4000:])
        sys.exit(f"[close] bench FAILED (rc={r.returncode})")
    # the bench's own stdout JSON lines (sbt may prefix program output
    # with "[info] " depending on version/settings — strip it)
    cleaned = [ln.strip().removeprefix("[info]").strip() for ln in out.splitlines()]
    lines = [ln for ln in cleaned
             if ln.startswith("{") and ('"detail"' in ln or '"metric"' in ln)]
    if not lines:
        sys.exit("[close] bench stdout carried no JSON lines — see /tmp/graft_close_bench.log")
    final = next((ln for ln in reversed(lines) if '"metric":"total"' in ln), None)
    if final is None:
        sys.exit("[close] no final total line in bench stdout")
    parsed = json.loads(final)
    tail = "\n".join(lines)[-2000:]
    art = {"n": ROUND, "rc": 0, "cpus": 32, "sf": 0.1, "tail": tail, "parsed": parsed}
    out_path = REPO / f"BENCH_r{ROUND:02d}.json"
    out_path.write_text(json.dumps(art) + "\n")
    print(f"[close] wrote {out_path}")
    print(f"[close] total={parsed['value']}s over {parsed['n_queries']} queries; "
          f"regressions={parsed.get('regressions', [])}")
    # the regression gate FAILS the close (after persisting the evidence)
    # so a scripted/unattended run can never ship a regressed round; a
    # human who has diagnosed the flags as noise reruns or passes
    # --allow-regressions explicitly
    if parsed.get("regressions") and "--allow-regressions" not in sys.argv:
        sys.exit(f"[close] regression gate NON-EMPTY: {parsed['regressions']} — "
                 "rerun the bench (noise) or fix; --allow-regressions overrides")

print("[close] done — review, then commit BENCH artifacts as the round's LAST commit")
