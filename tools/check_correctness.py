"""Local facsimile of the driver's correctness gate: run each harness
query on Spark and its oracle on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_warehouse_agnostic_spark.harness import ORACLES, QUERIES  # noqa: E402
from etl_warehouse_agnostic_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    # Byte-faithful comparison: no tz-stripping, no float re-rendering.
    # Round-1 lesson: a %.9g/tz-strip normalization here green-lit
    # dq_checks locally while the driver's hash (full-fidelity) failed
    # it. If the engines disagree in the last bit, we must fail too.
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    return str(v)


# DuckDB types whose Python/pandas conversion diverges between fetch
# paths (fetchall→int vs .df()→float64). An oracle emitting one of
# these can pass locally yet hash-mismatch on the driver: force a CAST.
_RISKY_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            sp_rows = df.collect()
            sp_cols = df.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(sp_rows)} rows, {time.monotonic()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.sql(sql)
            du_cols = [c.lower() for c in rel.columns]
            du_types = [str(t) for t in rel.types]
            du_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        risky = [c for c, t in zip(du_cols, du_types) if str(t).upper() in _RISKY_DUCK_TYPES]
        if risky:
            problems.append(
                f"oracle emits {risky} as HUGEINT — CAST(... AS BIGINT) it "
                "(driver fetch path renders int128 as float)"
            )
        if sorted(c.lower() for c in sp_cols) != sorted(du_cols):
            problems.append(f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
        if len(sp_rows) != len(du_rows):
            problems.append(f"rowcount spark={len(sp_rows)} duck={len(du_rows)}")
        if not problems:
            a = canon([list(r) for r in sp_rows], [c.lower() for c in sp_cols])
            b = canon([list(r) for r in du_rows], du_cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok   {name}: {len(sp_rows)} rows match ({time.monotonic()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
