#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables; compare row count, column names, and an order-insensitive value
hash. Queries without oracle SQL get a rows-only check.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from pypdfocr_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # 17-significant-digit round-trip repr → bit-exact
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(srows)} cols={scols} ({dt:.1f}s) [rows-only]")
            if len(srows) == 0:
                print(f"WARN  {name}: empty result for rows-only query")
            continue
        try:
            ddf = con.execute(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error {exc}")
            failures += 1
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash(scols, srows)
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'=' if ok_hash else f'{sh[:8]} vs {dh[:8]}'} ({dt:.1f}s)"
        )
        if not ok_hash and ok_count and ok_cols:
            # print first differing row for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            s_set = sorted("\x01".join(canon_value(r[i]) for i in order_s) for r in srows)
            d_set = sorted("\x01".join(canon_value(r[i]) for i in order_d) for r in drows)
            for a, b in zip(s_set, d_set):
                if a != b:
                    print(f"      spark: {a[:200]}")
                    print(f"      duck : {b[:200]}")
                    break
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
