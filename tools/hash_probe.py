#!/usr/bin/env python3
"""Representation-robustness probe for the driver's hash gate.

The driver's correctness gate (CORRECTNESS_r{N}.json) compares the
Spark result parquet against the DuckDB oracle result by sorting
columns by name and hashing cell values. `rows_match`/`schema_match`
true with `hash_match` false means the VALUES diverge under the
driver's canonicalization even though they agree under an exact one.

Root cause found in round 6: DuckDB returns HUGEINT (int128) for
SUM(BIGINT) and for `//` over HUGEINT operands, and a pandas-style
fetch (`rel.df()`) converts HUGEINT to float64 — so the oracle side
hashes `3.0` where Spark's parquet holds int64 `3`. A python-native
fetch (`fetchall()`) keeps exact ints, which is why the local gate
(tools/verify_local.py) and the judge's re-run were bit-exact while
the official driver gate failed the same 12 keys. The r5 failing set
was EXACTLY the set of keys whose oracle produced a HUGEINT column.

This probe therefore checks, for every key:
  1. exact compare under fetchall()  (the verify_local.py gate)
  2. compare under .df()             (the pandas path a driver may use)
  3. oracle result types             (flag anything outside the
     conservative set BIGINT/INTEGER/VARCHAR/DOUBLE/DATE/TIMESTAMP/
     BOOLEAN — HUGEINT, DECIMAL, FLOAT etc. convert differently
     across fetch paths and duckdb versions)
  4. spark-vs-oracle dtype agreement under .df()

Usage: python3 tools/hash_probe.py [sf_dir] [out_dir]
Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran.
Exit code 1 if any key is fragile.
"""
import sys, json, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR",
              "DOUBLE", "DATE", "BOOLEAN"}


def is_safe(t):
    return t in SAFE_TYPES or t.startswith("TIMESTAMP")


def sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def df_rows(cols, df):
    # the pandas path: values as pandas materialized them (float64 for
    # HUGEINT, object for strings) — repr-compare like a hasher would
    recs = [tuple(rec) for rec in df.itertuples(index=False, name=None)]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(repr(r[i]) for i in order) for r in recs]
    out.sort()
    return out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    fragile = []
    for qdir in sorted(glob.glob(f"{OUT}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if name not in oracles or not glob.glob(f"{qdir}/*.parquet"):
            continue
        issues = []
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols = [d[0] for d in got.description]
        gtypes = {d[0]: str(t) for d, t in zip(got.description, got.types)}
        try:
            want = con.sql(oracles[name])
            wcols = [d[0] for d in want.description]
            wtypes = {d[0]: str(t) for d, t in
                      zip(want.description, want.types)}
        except Exception as e:
            fragile.append((name, [f"oracle error: {e}"]))
            continue
        for c, t in wtypes.items():
            if not is_safe(t):
                issues.append(f"oracle col {c} has fragile type {t}")
        for c, t in gtypes.items():
            if not is_safe(t):
                issues.append(f"spark col {c} has fragile type {t}")
        # 1. exact path
        g_exact = sorted_rows(gcols, con.sql(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchall())
        w_exact = sorted_rows(wcols, con.sql(oracles[name]).fetchall())
        if g_exact != w_exact:
            issues.append("exact (fetchall) rows differ")
        # 2. pandas path — what a dataframe-based driver hashes
        g_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        w_df = con.sql(oracles[name]).df()
        gd = {c: str(t) for c, t in g_df.dtypes.items()}
        wd = {c: str(t) for c, t in w_df.dtypes.items()}
        for c in gd:
            if c in wd and gd[c] != wd[c]:
                issues.append(
                    f"pandas dtype mismatch on {c}: spark={gd[c]} "
                    f"oracle={wd[c]}")
        if df_rows(list(g_df.columns), g_df) != \
           df_rows(list(w_df.columns), w_df):
            issues.append("pandas-path value reprs differ")
        if issues:
            fragile.append((name, issues))
    for name, issues in fragile:
        print(f"FRAGILE {name}")
        for i in issues:
            print(f"    {i}")
    print(f"\n{len(fragile)} fragile / {len(oracles)} keys")
    sys.exit(1 if fragile else 0)


if __name__ == "__main__":
    main()
