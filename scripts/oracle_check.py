#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf_dir tables, and
compares as multisets (columns sorted by name, rows sorted).

Type-strict: also compares the DuckDB-reported column TYPES of both
relations. The driver's hasher canonicalizes typed values, so an oracle
emitting HUGEINT (e.g. DuckDB's windowed sum(BIGINT)) or DECIMAL where
Spark wrote BIGINT/DOUBLE fails the driver even when str(v) matches —
round-2's q36 proved stringified comparison alone cannot catch that.
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # ScaleData output: a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = canon(s.fetchall(), s.columns)
            stypes = [str(t) for _, t in
                      sorted(zip(s.columns, s.types), key=lambda p: p[0])]
            d = con.sql(sql)
            dcols, drows = canon(d.fetchall(), d.columns)
            dtypes = [str(t) for _, t in
                      sorted(zip(d.columns, d.types), key=lambda p: p[0])]
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"SCHEMA   {name}: spark={scols} duck={dcols}")
            n_fail += 1
        elif stypes != dtypes:
            bad = [(c, a, b) for c, a, b in zip(scols, stypes, dtypes) if a != b]
            print(f"TYPES    {name}: {bad}")
            n_fail += 1
        elif srows != drows:
            n_fail += 1
            diff = [(a, b) for a, b in zip(srows, drows) if a != b]
            print(f"VALUES   {name}: {len(srows)} vs {len(drows)} rows; "
                  f"first diffs: {diff[:2]}" if len(srows) == len(drows)
                  else f"VALUES {name}: rowcount {len(srows)} vs {len(drows)}")
        else:
            n_pass += 1
            print(f"OK       {name} ({len(srows)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
