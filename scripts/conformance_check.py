#!/usr/bin/env python3
"""Value-compare every conformance twin (Spark runner output) against its
rendered DuckDB SQL over the same testdata parquet — the all-52 parity
loop behind the sampled catalog gate.

Usage: conformance_check.py <dumpDir> <sfDir> [jsonOut] [workers]
(dumpDir produced by `Test/runMain graft.ConformanceDump <sfDir> <dumpDir>`;
jsonOut, when given, receives a per-job machine-readable verdict — the
per-round CONFORMANCE_rN.json artifact.)

Comparison: a single-pass MULTISET FINGERPRINT per side —
(count, sum(hash(row)), bit_xor(hash(row))) over the column-sorted row,
the same hash-of-rows class the driver's own correctness gate uses. One
execution per side; exact up to 64-bit hash collisions on a
*difference*, which the sum+xor pair makes vanishingly unlikely. (The
old 2x EXCEPT ALL + count re-ran each oracle three times and ground for
half an hour on the 10M-row fan-out jobs.)

Jobs run in a PROCESS POOL: a few oracles explode through a fan-out
join DuckDB evaluates single-threaded, so job-level parallelism — not
intra-query threads — is what bounds the wall clock.
"""
import json
import multiprocessing as mp
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def check_one(args):
    name, sql, dump, sf = args
    import duckdb
    spark_path = os.path.join(dump, f"{name}.parquet")
    try:
        con = duckdb.connect()
        con.execute("SET threads TO 4")
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        spark_rel = f"read_parquet('{spark_path}/*.parquet')"
        desc = con.execute(f"DESCRIBE SELECT * FROM {spark_rel}").fetchall()
        proj = ", ".join(f'"{c}"' for c in sorted(r[0] for r in desc))
        fp = (f"count(*), sum(hash(ROW({proj}))), "
              f"bit_xor(hash(ROW({proj})))")
        a = con.execute(
            f"SELECT {fp} FROM (SELECT {proj} FROM {spark_rel})").fetchone()
        b = con.execute(
            f"SELECT {fp} FROM (SELECT {proj} FROM ({sql}))").fetchone()
        ok = bool(a == b)
        return name, {"pass": ok, "spark_rows": a[0], "oracle_rows": b[0],
                      "fingerprint_match": a[1] == b[1] and a[2] == b[2],
                      "err": None}, \
            (f"OK    {name} ({a[0]} rows)" if ok else
             f"FAIL  {name}: spark=({a[0]}, {a[1]}, {a[2]}) "
             f"oracle=({b[0]}, {b[1]}, {b[2]})")
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        return name, {"pass": False, "err": msg}, f"ERROR {name}: {msg}"


def main():
    dump, sf = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    sqls = json.load(open(os.path.join(dump, "conformance_sql.json")))
    tasks = [(name, sql, dump, sf) for name, sql in sqls.items()]
    verdicts = {}
    with mp.Pool(workers) as pool:
        for name, verdict, line in pool.imap_unordered(check_one, tasks):
            verdicts[name] = verdict
            print(line, flush=True)
    npass = sum(1 for v in verdicts.values() if v["pass"])
    nfail = len(verdicts) - npass
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf": sf, "jobs_total": len(sqls),
                       "jobs_pass": npass, "jobs_fail": nfail,
                       "comparison": "bit-exact multiset fingerprint "
                                     "(count+sum+xor of row hashes)",
                       "jobs": verdicts}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{npass} pass / {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
