#!/usr/bin/env python3
"""Compute BENCH_REPRO.json from two back-to-back full-suite bench
JSON lines (the round-9 protocol, re-run whenever the suite grows)."""
import json
import statistics
import sys


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith('{') and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main(a_path, b_path, out_path, note=""):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    deltas = [abs(qa[q] - qb[q]) for q in common]
    ratios = [max(qa[q], qb[q]) / max(min(qa[q], qb[q]), 1e-9)
              for q in common]
    def p90(xs):
        xs = sorted(xs)
        return xs[int(0.9 * (len(xs) - 1))]
    out = {
        "what": ("two back-to-back full-suite runs at sf0.1, 32 cpus, "
                 "adaptive sampling per query (round 14)"),
        "total_a_sec": round(a["value"], 1),
        "total_b_sec": round(b["value"], 1),
        "total_ratio": round(b["value"] / a["value"], 3),
        "n_queries": len(common),
        "median_abs_delta_sec": round(statistics.median(deltas), 3),
        "p90_abs_delta_sec": round(p90(deltas), 3),
        "median_ratio": round(statistics.median(ratios), 3),
        "p90_ratio": round(p90(ratios), 3),
        "note": note,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         sys.argv[4] if len(sys.argv) > 4 else "")
