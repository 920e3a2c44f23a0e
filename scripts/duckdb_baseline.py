#!/usr/bin/env python3
"""Per-query DuckDB baseline: times each oracle SQL over the same parquet
tables the Spark catalog reads, producing the single-node reference numbers
Bench's spark_vs_duckdb ratios are computed against.

Usage: python3 scripts/duckdb_baseline.py <verify_out_dir> <sf_dir> [out.json]

<verify_out_dir> must contain oracle_sql.json (written by graft.Verify).
Each query runs `runs` times (default 3, min-of-N like graft.Bench) on a
threads=32 connection (the
local[32] twin); the minimum wall time is recorded — same steady-state
convention as Bench. Queries materialize fully (fetchall), mirroring the
noop-sink materialization on the Spark side.

The output is a committed artifact (BASELINE_duckdb.json): "within 2× of
single-node baseline" becomes a computable per-query ratio instead of a
vacuous claim. Re-generate whenever oracle SQL changes.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir, out_path="BASELINE_duckdb.json", runs=3):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # ScaleData output: a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # GRAFT_BASELINE_ONLY=q2,q8,... restricts the run (the 100x relational
    # slice times 12 queries, not the LLM oracles whose candidate joins
    # are quadratic-ish at that volume). Tokens match the full name or its
    # qNN prefix exactly, like SPARK_GRAFT_BENCH_ONLY.
    only = os.environ.get("GRAFT_BASELINE_ONLY")
    if only:
        toks = {t.strip() for t in only.split(",") if t.strip()}
        oracle = {k: v for k, v in oracle.items()
                  if k in toks or k.split("_")[0] in toks}
    times, errors = {}, {}
    runs = int(os.environ.get("GRAFT_BASELINE_RUNS", runs))
    for name in sorted(oracle):
        sql = oracle[name]
        best = None
        try:
            for _ in range(runs):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[name] = best
            print(f"{name:28s} {best:8.3f} s", flush=True)
        except Exception as e:
            errors[name] = str(e)[:200]
            print(f"{name:28s} ERROR {e}", flush=True)
    out = {
        "engine": "duckdb", "threads": 32, "runs_per_query": runs,
        "agg": "min", "sf": sf_dir, "queries": times, "errors": errors,
        "total": sum(times.values()),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\ntotal {out['total']:.2f} s over {len(times)} queries "
          f"({len(errors)} errors) -> {out_path}")

if __name__ == "__main__":
    main(*sys.argv[1:])
