#!/usr/bin/env python3
"""Value-compare every conformance twin (Spark runner output) against its
rendered DuckDB SQL over the same testdata parquet — the all-52 parity
loop behind the sampled catalog gate.

Usage: conformance_check.py <dumpDir> <sfDir> [jsonOut]
(dumpDir produced by `Test/runMain graft.ConformanceDump <sfDir> <dumpDir>`;
jsonOut, when given, receives a per-job machine-readable verdict — the
per-round CONFORMANCE_rN.json artifact.)
"""
import json
import os
import sys

import duckdb

dump, sf = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
verdicts = {}
sqls = json.load(open(os.path.join(dump, "conformance_sql.json")))

con = duckdb.connect()
con.execute("SET threads TO 16")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

npass = nfail = 0
for name, sql in sqls.items():
    spark_path = os.path.join(dump, f"{name}.parquet")
    try:
        # EXACT comparison, no rounding: since round 6 the renderer
        # splices ExactDecimalSql templates (HUGEINT replays of Spark's
        # decimal rescale arithmetic) wherever DuckDB's native decimal
        # typing would diverge, so every job compares bit-for-bit.
        spark_rel = f"read_parquet('{spark_path}/*.parquet')"
        desc = con.execute(f"DESCRIBE SELECT * FROM {spark_rel}").fetchall()
        cols = [r[0] for r in desc]
        proj = ", ".join(f'"{c}"' for c in cols)
        spark_rel = f"(SELECT {proj} FROM {spark_rel})"
        order = ", ".join(f'"{c}"' for c in sorted(cols))
        a = con.execute(
            f"SELECT count(*), count(DISTINCT hash(ROW({order}))) FROM "
            f"(SELECT * FROM {spark_rel})").fetchone()
        # compare as multisets via EXCEPT ALL in both directions
        osql = f"SELECT {proj} FROM ({sql})"
        diff1 = con.execute(
            f"SELECT count(*) FROM ((SELECT * FROM {spark_rel}) EXCEPT ALL "
            f"({osql}))").fetchone()[0]
        diff2 = con.execute(
            f"SELECT count(*) FROM (({osql}) EXCEPT ALL "
            f"(SELECT * FROM {spark_rel}))").fetchone()[0]
        nrows_oracle = con.execute(
            f"SELECT count(*) FROM ({sql})").fetchone()[0]
        ok = diff1 == 0 and diff2 == 0 and a[0] == nrows_oracle
        verdicts[name] = {"pass": ok, "spark_rows": a[0],
                          "oracle_rows": nrows_oracle,
                          "spark_only": diff1, "oracle_only": diff2,
                          "err": None}
        if ok:
            npass += 1
            print(f"OK    {name} ({a[0]} rows)")
        else:
            nfail += 1
            print(f"FAIL  {name}: spark={a[0]} oracle={nrows_oracle} "
                  f"spark-only={diff1} oracle-only={diff2}")
    except Exception as e:
        nfail += 1
        msg = str(e).split("\n")[0][:300]
        verdicts[name] = {"pass": False, "err": msg}
        print(f"ERROR {name}: {msg}")

if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sf, "jobs_total": len(sqls), "jobs_pass": npass,
                   "jobs_fail": nfail, "comparison": "bit-exact multiset",
                   "jobs": verdicts}, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")

print(f"\n{npass} pass / {nfail} fail")
sys.exit(1 if nfail else 0)
