#!/usr/bin/env python3
"""Generate /tmp/graft_sf1 = 10x replication of /root/testdata/sf0.1.

Recreates the r10 scaling corpus (docs/PERF_r10.md):
  - dimension tables (region, nation) copy through unchanged;
  - keyed fact/dim tables replicate 10x with per-copy key offsets so
    referential joins stay consistent (copy i of orders points at
    copy i of customer, copy i of lineitem at copy i of orders/part/
    supplier);
  - documents get a per-copy ` c<i>` text suffix, so every document
    acquires 9 NEAR-duplicates — deliberately the nastiest duplication
    profile for the pair-join operators;
  - embeddings/events replicate with fresh ids (copies keep the same
    vectors/values, shifting only keys and, for events, timestamps by
    i seconds so event streams stay strictly ordered per copy).

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [ncopies]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key offsets: one per copy, far above the base-table key ranges
C_OFF = 1_000_000       # customer
S_OFF = 1_000_000       # supplier
P_OFF = 1_000_000       # part
O_OFF = 10_000_000      # orders
E_OFF = 10_000_000      # events
D_OFF = 1_000_000       # documents
V_OFF = 1_000_000       # embeddings

REPL = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
      SELECT c_custkey + i*{C_OFF} AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment FROM src, copies""",
    "supplier": f"""
      SELECT s_suppkey + i*{S_OFF} AS s_suppkey, s_name, s_nationkey,
             s_acctbal FROM src, copies""",
    "part": f"""
      SELECT p_partkey + i*{P_OFF} AS p_partkey, p_name, p_brand,
             p_type, p_size, p_retailprice FROM src, copies""",
    "orders": f"""
      SELECT o_orderkey + i*{O_OFF} AS o_orderkey,
             o_custkey + i*{C_OFF} AS o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM src, copies""",
    "lineitem": f"""
      SELECT l_orderkey + i*{O_OFF} AS l_orderkey,
             l_partkey + i*{P_OFF} AS l_partkey,
             l_suppkey + i*{S_OFF} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM src, copies""",
    "events": f"""
      SELECT event_id + i*{E_OFF} AS event_id,
             ts + to_seconds(i) AS ts,
             user_id + i*{C_OFF} AS user_id,
             event_type, value, props FROM src, copies""",
    "documents": f"""
      SELECT doc_id + i*{D_OFF} AS doc_id,
             CASE WHEN i = 0 THEN text
                  ELSE text || ' c' || i::VARCHAR END AS text,
             lang, source,
             CASE WHEN i = 0 THEN n_chars
                  ELSE n_chars + 2 + length(i::VARCHAR) END AS n_chars
      FROM src, copies""",
    "embeddings": f"""
      SELECT vec_id + i*{V_OFF} AS vec_id, embedding, label
      FROM src, copies""",
}


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT range AS i FROM range({N})")
    for t, q in REPL.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{t}.parquet'")
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t:12s} {n}")


if __name__ == "__main__":
    main()
