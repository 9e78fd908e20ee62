#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the engine). Usage:
    python3 tools/check_oracle.py [sfDir] [verifyOutDir]
Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares exactly (columns sorted by name, rows in
emitted order, exact value equality incl. floats) against the Spark result
parquet written by graft.Verify.
"""
import sys, os, json, glob, math
import duckdb
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if v is None:
        return "None"
    return v

def cells_eq(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    try:
        if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
            return int(a) == int(b)
    except Exception:
        pass
    return str(a) == str(b)

ok, failed = [], []
for name in sorted(oracle):
    res = f"{outdir}/{name}"
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{res}/*.parquet')").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        failed.append((name, f"ERROR {type(e).__name__}: {e}"))
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        failed.append((name, f"COLS spark={list(got.columns)} duck={list(exp.columns)}"))
        continue
    # duckdb-level dtype parity (the driver may compare schemas strictly)
    gt = con.sql(f"SELECT * FROM read_parquet('{res}/*.parquet') LIMIT 0")
    et = con.sql(f"SELECT * FROM ({oracle[name]}) q LIMIT 0")
    gd = dict(zip(gt.columns, map(str, gt.types)))
    ed = dict(zip(et.columns, map(str, et.types)))
    dt = {c: (gd.get(c), ed.get(c)) for c in gd if gd.get(c) != ed.get(c)}
    if dt:
        failed.append((name, f"DTYPES {dt}"))
        continue
    if len(got) != len(exp):
        failed.append((name, f"ROWS spark={len(got)} duck={len(exp)}"))
        continue
    bad = None
    gv = [[norm_cell(c) for c in row] for row in got.itertuples(index=False)]
    ev = [[norm_cell(c) for c in row] for row in exp.itertuples(index=False)]
    for i, (gr, er) in enumerate(zip(gv, ev)):
        for j, (g, e) in enumerate(zip(gr, er)):
            if not cells_eq(g, e):
                bad = f"VALUE row {i} col {got.columns[j]}: spark={g!r} duck={e!r}"
                break
        if bad:
            break
    if bad:
        failed.append((name, bad))
    else:
        ok.append(name)

for n in ok:
    print(f"PASS {n}")
for n, why in failed:
    print(f"FAIL {n}: {why}")
missing = [q for q in oracle if not os.path.isdir(f"{outdir}/{q}")]
print(f"\n{len(ok)} pass / {len(failed)} fail / {len(oracle)} oracles; "
      f"missing results: {missing}")
sys.exit(1 if failed else 0)
