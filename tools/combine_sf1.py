#!/usr/bin/env python3
"""Combine two Bench runs (sf0.1 baseline + sf1) into BENCH_sf1_full.json.
Usage: combine_sf1.py <sf0.1_bench.json> <sf1_bench.json> <out.json>
"""
import json, sys

b01 = json.load(open(sys.argv[1]))
b1 = json.load(open(sys.argv[2]))
out = {
    "sf": 1.0,
    "source": "tools/make_sf1.py: sf0.1 replicated 10x with offset keys -> /tmp/sf1",
    "cpus": 32,
    "mem": "16g",
    "samples": "adaptive min (Bench.scala)",
    "baseline": "same-code sf0.1 run, same config, back to back",
    "note": "x_vs_linear = sf1_sec / (10 * sf0.1_sec); <=3.0 is the pass bar, <1.0 is sublinear scaling",
    "total_sec_sf1": round(b1["value"], 1),
    "total_sec_sf0_1": round(b01["value"], 1),
    "n_queries": len(b1["queries"]),
    "queries": {},
}
worst = []
for q, s1 in sorted(b1["queries"].items()):
    s01 = b01["queries"].get(q)
    x = round(s1 / (10 * s01), 2) if s01 and s01 > 0 and s1 >= 0 else None
    out["queries"][q] = {"sf1_sec": round(s1, 2), "sf0_1_sec": round(s01, 2) if s01 is not None else None,
                         "x_vs_linear": x}
    if x is not None:
        worst.append((x, q))
worst.sort(reverse=True)
out["worst_5"] = [{"query": q, "x_vs_linear": x} for x, q in worst[:5]]
out["n_over_3x"] = sum(1 for x, _ in worst if x > 3.0)
json.dump(out, open(sys.argv[3], "w"), indent=1)
print("wrote", sys.argv[3], "n_over_3x =", out["n_over_3x"], "worst:", worst[:5])
