"""Blow up sf0.1 into a larger synthetic SF for scaling sweeps.

The driver ships sf<=0.1 (TESTDATA.md, read-only).  For the sf1-class
sweep (SCALE.md) this tool replicates the fact tables FACTOR times with
disjoint key offsets — each replica is a structurally identical,
key-disjoint copy, so every join/agg keeps its exact semantics while
row counts scale linearly (lineitem 600k -> 6M at factor 10).  The
dimension tables region/nation stay fixed (as TPC-H itself scales).

Events get a per-replica time shift (+FACTOR days per copy) so the
stream keeps realistic time density instead of 10x piling on the same
minutes; user_id/event_id offset like the other keys.  Documents get a
replica suffix token so exact-dedup stays trivially non-degenerate;
embeddings keep their vectors (ANN oracles re-run per corpus anyway).

Usage: python tools/blowup_sf.py [--factor 10] [--out /tmp/sf1]
DuckDB does the heavy lifting — one CTAS per table, parallel, no Spark.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> (columns to offset by replica * span)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# the span of each key namespace (max+1 of the base sf0.1 keyspace,
# rounded up to a clean power of ten so offsets are human-readable)
SPANS = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "user_id": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}
FK_SPAN = {"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
           "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in OFFSETS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        sel = []
        for c in cols:
            span = SPANS.get(FK_SPAN.get(c, c))
            if c in keys and span:
                sel.append(f"{c} + r.i * {span} AS {c}")
            elif t == "events" and c == "ts":
                sel.append(f"ts + to_days(CAST(r.i * {args.factor} AS INT)) AS ts")
            elif t == "documents" and c == "text":
                # replica-tag only the tail so shingle profiles survive
                sel.append("CASE WHEN r.i = 0 THEN text ELSE "
                           "text || ' rep' || r.i END AS text")
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"range(0, {args.factor}) r(i)) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
