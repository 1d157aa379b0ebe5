#!/usr/bin/env python3
"""Rebuild the scale-probe fixtures (dev tool only; /tmp is ephemeral).

Grown-corpus protocol (PLANS.md "x100g"): K copies of a source table
with every token prefixed by a per-copy marker (c<k>x<token>), so copies
share NO tokens/shingles/fingerprints — K independent shards, i.e. the
post-exact-dedup shape the dedup/graph contracts prescribe. (Do NOT
interleave a repeated marker token: it dominates SimHash bit sums and
collapses each copy into one fingerprint clique — see the verify skill.)

Usage: python3 tools/gen_scale_fixture.py <sfDir> <outDir> <K> [tables]
  tables: comma list, default "documents". documents grows by token
  prefixing; embeddings/lineitem/orders grow by key offsetting.
"""
import sys
import duckdb


def main():
    sf_dir, out_dir, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    tables = (sys.argv[4] if len(sys.argv) > 4 else "documents").split(",")
    con = duckdb.connect()
    import os
    os.makedirs(out_dir, exist_ok=True)
    for t in tables:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if t == "documents":
            parts = " UNION ALL ".join(f"""
              SELECT doc_id + {i} * 10000000 AS doc_id,
                     array_to_string(list_transform(
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> ''),
                       x -> 'c{i}x' || x), ' ') AS text,
                     lang, source, n_chars
              FROM read_parquet('{src}')""" for i in range(k))
        elif t == "embeddings":
            parts = " UNION ALL ".join(f"""
              SELECT vec_id + {i} * 10000000 AS vec_id, embedding
              FROM read_parquet('{src}')""" for i in range(k))
        elif t == "lineitem":
            parts = " UNION ALL ".join(f"""
              SELECT * REPLACE (l_orderkey + {i} * CAST(100000000 AS BIGINT) AS l_orderkey)
              FROM read_parquet('{src}')""" for i in range(k))
        elif t == "orders":
            parts = " UNION ALL ".join(f"""
              SELECT * REPLACE (o_orderkey + {i} * CAST(100000000 AS BIGINT) AS o_orderkey)
              FROM read_parquet('{src}')""" for i in range(k))
        elif t == "customer":
            parts = " UNION ALL ".join(f"""
              SELECT * REPLACE (c_custkey + {i} * CAST(100000000 AS BIGINT) AS c_custkey)
              FROM read_parquet('{src}')""" for i in range(k))
        else:
            raise SystemExit(f"no growth rule for table {t}")
        con.execute(f"COPY ({parts}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
