#!/usr/bin/env python3
"""Measure per-oracle-query /proc/self/maps growth in ONE long-lived
DuckDB process (dev tool only) — the driver's correctness harness runs
all oracles in a single process, and cumulative map-count growth past
vm.max_map_count (65530) makes every later query fail with spurious
tiny-block OOMs. This probe replays the same protocol and reports the
top growers so their SQL can be trimmed (AS MATERIALIZED on reused heavy
CTEs, flatter chains).

Usage: python3 tools/probe_oracle_maps.py <sfDir> <oracle_sql.json> [topN]
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def maps_count():
    with open(f"/proc/{os.getpid()}/maps") as f:
        return sum(1 for _ in f)


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    growth = []
    failed = []
    before_all = maps_count()
    for name in sorted(oracle):
        before = maps_count()
        try:
            con.sql(oracle[name]).df()
        except Exception as e:
            failed.append((name, str(e).splitlines()[0][:100]))
        growth.append((maps_count() - before, name))
    total = maps_count()
    print(f"maps: start {before_all}, end {total} "
          f"(limit 65530; headroom {65530 - total})")
    print(f"failures in single-process order: {len(failed)}")
    for name, err in failed:
        print(f"  ERR {name}: {err}")
    print(f"top {top_n} per-query map growth:")
    for d, name in sorted(growth, reverse=True)[:top_n]:
        print(f"  {d:6d}  {name}")


if __name__ == "__main__":
    main()
