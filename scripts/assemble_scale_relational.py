#!/usr/bin/env python3
"""Assemble the relational-axis scale-sweep artifact: per-query Spark
seconds at the 10x and 100x ScaleData slices with 10x->100x scaling
exponents — the evidence that the star-schema and whole-job conformance
plans survive two orders of magnitude, not just the plan-shape argument.

Usage: assemble_scale_relational.py <bench_10x.json> <bench_100x.json> <out.json>
(bench files = the Bench stdout JSON line, possibly log-prefixed)
"""
import json
import os
import math
import sys


def bench(path):
    line = open(path).read()
    return json.loads(line[line.index('{'):])


def main(b10, b100, out):
    s10, s100 = bench(b10), bench(b100)
    q10, q100 = s10["queries"], s100["queries"]
    common = sorted(set(q10) & set(q100))
    # exponent for a 10x size step between the two slices:
    # 1.0 = linear in data, 0 = flat (fixed overhead still dominates)
    exps = {k: round(math.log10(q100[k] / q10[k]), 3)
            for k in common if q10[k] > 0 and q100[k] > 0}
    superlinear = sorted(k for k, e in exps.items() if e > 1.05)
    doc = {
        "round": int(os.environ.get("GRAFT_ROUND", "8")),
        "cpus": s100.get("sf") and 32,
        "slices": {"10x": s10.get("sf"), "100x": s100.get("sf")},
        "runs_per_query": s10.get("runs_per_query"),
        "agg": "min",
        "queries_10x_s": {k: q10[k] for k in common},
        "queries_100x_s": {k: q100[k] for k in common},
        "task_sec_100x": s100.get("task_sec", {}),
        "shuffle_bytes_100x": s100.get("shuffle_bytes", {}),
        "scaling_exponent_log10": exps,
        "superlinear_over_1.05": superlinear,
        "errors_10x": s10.get("errors", {}),
        "errors_100x": s100.get("errors", {}),
        "note": "100x ScaleData replication of sf0.1 (FK-consistent "
                "strides; lineitem ~60M rows). Exponent near 1 = linear "
                "scaling; >1.05 flagged as super-linear.",
    }
    json.dump(doc, open(out, "w"), indent=1, sort_keys=True)
    t10 = sum(q10[k] for k in common)
    t100 = sum(q100[k] for k in common)
    print(f"10x total {t10:.1f}s, 100x total {t100:.1f}s over "
          f"{len(common)} queries; superlinear: {superlinear}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
