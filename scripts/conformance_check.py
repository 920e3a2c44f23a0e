#!/usr/bin/env python3
"""Value-compare every conformance twin (Spark runner output) against its
rendered DuckDB SQL over the same testdata parquet — the all-52 parity
loop behind the sampled catalog gate.

Usage: conformance_check.py <dumpDir> <sfDir>
(dumpDir produced by `Test/runMain graft.ConformanceDump <sfDir> <dumpDir>`)
"""
import json
import os
import sys

import duckdb

dump, sf = sys.argv[1], sys.argv[2]
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
        spark_rel = f"read_parquet('{spark_path}/*.parquet')"
        desc = con.execute(f"DESCRIBE SELECT * FROM {spark_rel}").fetchall()
        cols = [r[0] for r in desc]
        # DOUBLE columns: round to 6 dp first (mimics Spark's
        # decimal-precision-overflow rescale, which rounds half-up at
        # scale 6 when a numeric(38,12) product exceeds 38 digits — the
        # reference's Spark 3 does the same), then compare at 4 dp to
        # absorb double-vs-decimal last-ulp differences. Sampled catalog
        # queries avoid division entirely and stay exact.
        proj = ", ".join(
            f'round(round("{c}", 6), 4) AS "{c}"' if t == "DOUBLE" else f'"{c}"'
            for c, t in [(r[0], r[1]) for r in desc])
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
        if diff1 == 0 and diff2 == 0 and a[0] == nrows_oracle:
            npass += 1
            print(f"OK    {name} ({a[0]} rows)")
        else:
            nfail += 1
            print(f"FAIL  {name}: spark={a[0]} oracle={nrows_oracle} "
                  f"spark-only={diff1} oracle-only={diff2}")
    except Exception as e:
        nfail += 1
        msg = str(e).split("\n")[0][:300]
        print(f"ERROR {name}: {msg}")

print(f"\n{npass} pass / {nfail} fail")
sys.exit(1 if nfail else 0)
