#!/usr/bin/env python3
"""Dev loop: verify a SUBSET of queries against their DuckDB oracles.

Usage: python3 tools/checkq.py q36_range_window,ev_churn [sfdir] [--no-run]

Runs graft.Verify with its query-name filter arg, then compares only
those queries, with check.py's exact normalization/compare rules.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

NAMES = sys.argv[1].split(",")
SF = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/root/testdata/sf0.001"
OUT = "/tmp/graft_verify_q"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--no-run" not in sys.argv:
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {sys.argv[1]}'],
                       capture_output=True, text=True, timeout=1800)
    if "[success]" not in r.stdout:
        print(r.stdout[-5000:]); print(r.stderr[-3000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line: print(line)

con = duckdb.connect()
for t in TABLES:
    p = Path(SF) / f"{t}.parquet"
    if p.exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads(Path(OUT, "oracle_sql.json").read_text())

def norm(v):
    if isinstance(v, float):
        return round(v, 9) if math.isfinite(v) else str(v)
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (bytes, bytearray)): return v.hex()
    if isinstance(v, list): return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return float(v)
    except Exception: pass
    return v

def skey(row):
    # NULL-safe row ordering: None sorts before any value of the column's
    # type without ever being compared to it (Python refuses None < int).
    return tuple((v is None, 0 if v is None else v) for v in row)

def approx_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(af) and math.isnan(bf): return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    return a == b

rc = 0
for name in NAMES:
    res_dir = Path(OUT) / name
    if not res_dir.is_dir():
        print(f"FAIL {name}: no spark output"); rc = 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
    cols = [d[0] for d in con.description]
    if oracle.get(name) is None:
        print(f"SKIP {name}: rows-only, {len(got)} rows"); continue
    try:
        exp = con.execute(oracle[name]).fetchall()
        ecols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); rc = 1; continue
    gi = sorted(range(len(cols)), key=lambda i: cols[i])
    ei = sorted(range(len(ecols)), key=lambda i: ecols[i])
    if sorted(cols) != sorted(ecols):
        print(f"FAIL {name}: columns differ: spark={sorted(cols)} duck={sorted(ecols)}"); rc = 1; continue
    g = sorted([tuple(norm(r[i]) for i in gi) for r in got], key=skey)
    e = sorted([tuple(norm(r[i]) for i in ei) for r in exp], key=skey)
    if len(g) != len(e):
        print(f"FAIL {name}: row count: spark={len(g)} duck={len(e)}"); rc = 1; continue
    bad = next(((rg, re_) for rg, re_ in zip(g, e)
                if not all(approx_eq(a, b) for a, b in zip(rg, re_))), None)
    if bad:
        print(f"FAIL {name}: value diff:\n  spark={bad[0]}\n  duck ={bad[1]}"); rc = 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
sys.exit(rc)
