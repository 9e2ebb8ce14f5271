#!/usr/bin/env python3
"""DuckDB side of the bench comparison: run every oracle_sql entry from a
graft.Verify dump against the given SF dir and print one JSON line with
per-query and total wall seconds — the same workload shape as graft.Bench
(materialize every result), so the two totals are comparable.

Usage: python3 tools/bench_duckdb.py [sfdir] [oracle_sql.json] [threads]
"""
import json
import sys
import time
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json")
THREADS = int(sys.argv[3]) if len(sys.argv) > 3 else 32

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    oracle = json.loads(ORACLE.read_text())
    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    per = {}
    total = 0.0
    for name in sorted(oracle):
        t0 = time.monotonic()
        try:
            con.execute(oracle[name]).fetch_arrow_table()
            dt = time.monotonic() - t0
        except Exception as exc:
            per[name] = None
            print(f"ERR {name}: {str(exc).splitlines()[0]}", file=sys.stderr)
            continue
        per[name] = round(dt, 3)
        total += dt
    print(json.dumps({
        "metric": "duckdb_total",
        "value": round(total, 3),
        "unit": "sec",
        "threads": THREADS,
        "duckdb": duckdb.__version__,
        "n_queries": sum(1 for v in per.values() if v is not None),
        "queries": per,
        "sf": SF,
    }))


if __name__ == "__main__":
    main()
