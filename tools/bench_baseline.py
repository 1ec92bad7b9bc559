#!/usr/bin/env python3
"""DuckDB baseline timings for BASELINE.md.

Times every SparkEntry.oracleSql query (dumped by graft.Verify as
oracle_sql.json) over the same sf parquet tables: warm run, then one
timed run, 32 threads.

Usage: python3 tools/bench_baseline.py [sfdir] [oracle_sql.json]
"""
import json
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql("SET threads=32")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(ORACLE))
out = {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        con.sql(sql).fetchall()
        t0 = time.time()
        con.sql(sql).fetchall()
        out[name] = round(time.time() - t0, 3)
    except Exception as e:  # noqa: BLE001 - report, keep timing the rest
        out[name] = f"ERR {str(e)[:120]}"

total = sum(v for v in out.values() if isinstance(v, float))
print(json.dumps({"total_sec": round(total, 3), "sf": SF, "queries": out},
                 indent=2))
