#!/usr/bin/env python
"""Local mirror of the driver's verify: smoke entry() at sf0.001, then
every queries() entry vs oracle_sql() via DuckDB at sf0.01.

Usage: python selfcheck.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from flink_parameter_server_spark.session import get_spark
from flink_parameter_server_spark.sources import TABLES
from tests.oracle import compare

SF = "/root/testdata/sf0.01"


def main() -> int:
    args = sys.argv[1:]
    sf = SF
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    only = set(args)

    spark = get_spark("fps-selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    t0 = time.time()
    n = entrymod.entry(spark).count()
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s")
    assert n > 0

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            df = fn(spark, sf)
            if name in oracles:
                ok, msg = compare(df, con, oracles[name])
            else:
                ok, msg = True, f"rows-only ({df.count()} rows)"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name:35s} {time.time() - t0:6.1f}s  {msg}")
        if not ok:
            failed.append(name)
    skipped = len(qs) - n_run
    summary = f"\n{n_run - len(failed)}/{n_run} pass"
    if skipped:
        summary += f" ({skipped} not selected)"
    print(summary + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
