#!/usr/bin/env python3
"""Deterministic hash-gated SUBSAMPLE of the sf1 data for the
quadratic-oracle keys (VERDICT r11 item #5).

21 keys (the dedup pair family, knn_{centrality,dbscan,edge_overlap},
pipe_{contamination,dedup_weights,split_by_cluster}) run clean on the
Spark side at sf1 but their DELIBERATELY-QUADRATIC DuckDB oracles
(all-pairs gram joins, brute-force kNN recomputes) exhaust the
sandbox at 50k docs / 20k vectors. The fix is not a weaker oracle but
a smaller shared input: BOTH engines run on the SAME deterministic
subsample of the sf1 corpus, so "ran clean at sf1" becomes "compared
exact at sf1 (sampled)" for every key.

Sampling gate = md5-prefix of the row key (the repo's portableHash
construction — any engine can recompute membership):
  documents:  hash(doc_id) % 5 < 2   (50k -> ~20k docs)
  embeddings: hash(vec_id) % 5 < 2   (20k -> ~8k vectors)
All other tables are carried over UNCHANGED (hard links where
possible) — the 21 keys only touch documents/embeddings, but Verify's
session setup may open any table.

Usage: python3 tools/gen_sf1_sample.py [src_dir] [out_dir]
Defaults: /tmp/graft_sf1 -> /tmp/graft_sf1_sample
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1_sample"

SAMPLED = {
    "documents": "('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))"
                 "::BIGINT % 5 < 2",
    "embeddings": "('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,8))"
                  "::BIGINT % 5 < 2",
}
CARRIED = ["region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, gate in SAMPLED.items():
        src, dst = f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet"
        con.execute(
            f"COPY (SELECT * FROM '{src}' WHERE {gate}) TO '{dst}' "
            f"(FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: sampled -> {n} rows")
    for t in CARRIED:
        src, dst = f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet"
        if os.path.exists(dst):
            os.remove(dst)
        try:
            os.link(src, dst)
        except OSError:
            import shutil
            shutil.copyfile(src, dst)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
