#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers the sfDir parquet tables as DuckDB views, runs each SQL from
oracle_sql.json, and compares against the Spark parquet dumped by
graft.Verify: columns sorted by name, rows sorted by all columns, values
canonicalized to strings, then hashed.
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        return str(v)

    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), rows


# A single long-lived DuckDB process grows its mmap count monotonically
# (CTE re-inlining churn) and can exhaust vm.max_map_count (65530) late in
# a 350-query run, after which EVERY later query dies with spurious
# tiny-block "Out of Memory" errors despite tens of GB free. Recycle the
# connection every RECYCLE queries, and retry any failed oracle once in a
# brand-new connection so a mid-run exhaustion can never fail the gate.
RECYCLE = 40


def fresh_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = fresh_con(sf_dir)
    since_recycle = 0
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            failures += 1
            continue
        if since_recycle >= RECYCLE:
            try:
                con.close()
            except Exception:
                pass  # a wedged connection must not abort the gate
            con = fresh_con(sf_dir)
            since_recycle = 0
        since_recycle += 1
        try:
            duck = con.sql(oracle[name]).df()
        except Exception:
            # one retry in a brand-new connection: distinguishes a real
            # SQL error from cumulative process-state exhaustion
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con(sf_dir)
            since_recycle = 1
            try:
                duck = con.sql(oracle[name]).df()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
                failures += 1
                continue
        # the spark-output read shares the connection's process state —
        # protect it with the same fresh-connection retry as the oracle
        # query, or late-run mmap exhaustion aborts the remaining gate
        try:
            spark = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        except Exception:
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con(sf_dir)
            since_recycle = 1
            try:
                duck = con.sql(oracle[name]).df()
                spark = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
            except Exception as e:
                print(f"FAIL {name}: read error: {str(e)[:200]}")
                failures += 1
                continue
        dh, drows = canon(duck)
        sh, srows = canon(spark)
        if len(drows) != len(srows):
            print(f"FAIL {name}: rows duck={len(drows)} spark={len(srows)}")
            failures += 1
        elif sorted(duck.columns) != sorted(spark.columns):
            print(f"FAIL {name}: cols duck={sorted(duck.columns)} spark={sorted(spark.columns)}")
            failures += 1
        elif dh != sh:
            diff = [(a, b) for a, b in zip(drows, srows) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs:")
            for a, b in diff:
                print(f"  duck : {a[:220]}")
                print(f"  spark: {b[:220]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
