#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran.
Registers each parquet table as a DuckDB view, runs every oracle SQL
from out_dir/oracle_sql.json, and compares against the Spark result
parquet: column names (sorted), dtypes (loose), and row values
(row-order-insensitive, exact values).
"""
import sys, json, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
# optional 3rd arg: comma-separated key filter — lets a wrapper shard
# the compare across worker processes (heavy oracles at big SF are
# single-query-bound; the keys are independent)
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # exact compare — assume the strictest possible driver: float values
    # must match bit-for-bit across Spark and DuckDB
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    con = duckdb.connect()
    # big-SF runs: bound memory/threads/spill so N concurrent compare
    # workers cannot exhaust RAM or disk (quadratic oracles spill)
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("GRAFT_DUCK_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    tmp = os.environ.get("GRAFT_DUCK_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
        con.execute("SET max_temp_directory_size='60GiB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    alldirs = sorted(glob.glob(f"{OUT}/*/"))
    if ONLY is not None:
        # honor the caller's order: a wrapper fronts cheap oracles and
        # defers the quadratic ones
        byname = {os.path.basename(d.rstrip("/")): d for d in alldirs}
        alldirs = [byname[k] for k in ONLY if k in byname]
    for qdir in alldirs:
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"MISSING-RESULT {name}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols, grows = [d[0] for d in got.description], got.fetchall()
        if name not in oracles:
            print(f"NO-ORACLE     {name:24s} rows={len(grows)}")
            n_noracle += 1
            continue
        try:
            want = con.sql(oracles[name])
            wcols, wrows = [d[0] for d in want.description], want.fetchall()
        except Exception as e:
            print(f"ORACLE-ERROR  {name:24s} {str(e).splitlines()[0][:120]}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"COLS-MISMATCH {name:24s} got={sorted(gcols)} want={sorted(wcols)}")
            n_fail += 1
            continue
        # STRICT dtype compare (r11 lesson: emb_jl_projection had
        # value-identical rows but a HUGEINT oracle column — the
        # driver's typed fetch hash-diverged while this gate only
        # warned; the gates must not disagree). Any dtype mismatch is
        # a failure unless GRAFT_LOOSE_TYPES=1 (triage escape hatch).
        gtypes = {d[0]: str(d[1]) for d in got.description}
        wtypes = {d[0]: str(d[1]) for d in want.description}
        tfail = [c for c in gcols if gtypes[c] != wtypes[c]]
        if tfail and not os.environ.get("GRAFT_LOOSE_TYPES"):
            for c in tfail:
                print(f"TYPE-MISMATCH {name:24s} {c}: spark={gtypes[c]} oracle={wtypes[c]}")
            n_fail += 1
            continue
        for c in tfail:
            print(f"TYPE-WARN     {name:24s} {c}: spark={gtypes[c]} oracle={wtypes[c]}")
        g, w = norm_rows(gcols, grows), norm_rows(wcols, wrows)
        if g != w:
            print(f"ROWS-MISMATCH {name:24s} got={len(g)} want={len(w)}")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"   first diff @{i}:\n    got  {a}\n    want {b}")
                    break
            else:
                if len(g) != len(w):
                    extra = g[len(w):] if len(g) > len(w) else w[len(g):]
                    print(f"   extra rows: {extra[:3]}")
            n_fail += 1
            continue
        print(f"PASS          {name:24s} rows={len(g)}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
