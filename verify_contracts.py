#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs each __spark_entry__.queries() entry and its oracle_sql() side-by-side
(DuckDB) and compares row count, column names, and an order-insensitive value
multiset. Usage:

    python verify_contracts.py [sf] [name_filter ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("\x1f".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.001
    name_filter = sys.argv[2:]

    import duckdb

    import __spark_entry__ as entrymod
    from mongo_log_parser_spark.session import build_session

    spark = build_session(master="local[8]")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql(sf)
    sf_dir = f"/root/testdata/sf{sf}"
    con = duckdb.connect()
    # Pin the oracle session to UTC: parquet timestamps surface as TIMESTAMPTZ
    # and any truncation/CAST would otherwise follow the host timezone (the
    # oracle SQL is also written TZ-independent via AT TIME ZONE 'UTC', but
    # the driver's own DuckDB connection is outside our control — this keeps
    # the local gate equivalent on any host).
    con.execute("SET TimeZone='UTC'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"~ {name}: no oracle (rows-only) — {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = []
        if sorted(c.lower() for c in scols) != sorted(ocols):
            problems.append(
                f"schema: spark={sorted(scols)} oracle={sorted(ocols)}"
            )
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm = df_multiset([c.lower() for c in scols], srows)
            om = df_multiset(ocols, orows)
            if sm != om:
                only_s = list((sm - om).keys())[:3]
                only_o = list((om - sm).keys())[:3]
                problems.append(f"values: {len((sm-om))} spark-only / {len((om-sm))} oracle-only")
                for x in only_s:
                    problems.append(f"  S: {x[:260]}")
                for x in only_o:
                    problems.append(f"  O: {x[:260]}")
        if problems:
            failures.append(name)
            print(f"✗ {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name} ({len(srows)} rows)")
    spark.stop()
    if failures:
        print(f"\nFAILED: {failures}")
        sys.exit(1)
    print("\nALL MATCH")


if __name__ == "__main__":
    main()
