#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs DuckDB on each SparkEntry.oracleSql query (views over the sf
parquet tables) and compares against the Spark results that
graft.Verify dumped to OUTDIR/<name>/ — row count, column names, and
cell-exact values (rows sorted, columns sorted by name).

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import json
import sys
import glob

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes, skips = [], [], []

for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "no spark output"))
        continue
    got_rel = con.sql(f"SELECT * FROM read_parquet({spark_files!r})")
    got = got_rel.df()
    gtypes = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
    try:
        want_rel = con.sql(sql)
        want = want_rel.df()
        wtypes = dict(zip(want_rel.columns, [str(t) for t in want_rel.types]))
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        fails.append((name, f"cols differ: spark={gcols} oracle={wcols}"))
        continue
    # TYPE-STRICT gate (r11 lesson: DuckDB promoted a sum() to HUGEINT
    # while Spark emitted BIGINT — pandas value-compare passed but the
    # driver's type-sensitive hash failed). Compare DuckDB logical
    # types on both sides so that class of drift fails locally.
    badtypes = [f"{c}: spark={gtypes[c]} oracle={wtypes[c]}"
                for c in gcols if gtypes[c] != wtypes[c]]
    if badtypes:
        fails.append((name, "dtype mismatch — " + "; ".join(badtypes)))
        continue
    if len(got) != len(want):
        fails.append((name, f"rows differ: spark={len(got)} oracle={len(want)}"))
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    diffs = []
    for c in gcols:
        gv, wv = g[c], w[c]
        try:
            eq = (gv.astype("object") == wv.astype("object")) | (gv.isna() & wv.isna())
        except Exception:
            eq = pd.Series([a == b or (pd.isna(a) and pd.isna(b))
                            for a, b in zip(gv, wv)])
        if not eq.all():
            i = int((~eq).idxmax())
            diffs.append(f"col {c} (dtype spark={gv.dtype} oracle={wv.dtype}): "
                         f"row{i} spark={gv[i]!r} oracle={wv[i]!r} "
                         f"({int((~eq).sum())} cells)")
    if diffs:
        fails.append((name, "; ".join(diffs)))
    else:
        passes.append(name)

declared = set()
for d in glob.glob(f"{OUT}/*/"):
    n = d.rstrip("/").split("/")[-1]
    declared.add(n)
# queries.json is the FULL declared list from SparkEntry.queries; any
# listed query with no output directory crashed inside Verify and must
# fail the gate (it would otherwise vanish from the report entirely).
try:
    all_queries = set(json.load(open(f"{OUT}/queries.json")))
except FileNotFoundError:
    all_queries = declared
for name in sorted(all_queries - declared):
    fails.append((name, "query crashed in Verify (no output directory)"))
rows_only = sorted(declared - set(oracle))
for name in rows_only:
    f = glob.glob(f"{OUT}/{name}/*.parquet")
    n = con.sql(f"SELECT count(*) FROM read_parquet({f!r})").fetchone()[0] if f else 0
    (passes if n > 0 else fails).append(
        (name + " [rows-only]", f"{n} rows") if n == 0 else name + f" [rows-only {n} rows]")

print(f"PASS {len(passes)}: {passes}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
print("ALL GREEN")
