"""Local replica of the driver's correctness gate: run every queries()
entry against its oracle_sql() via DuckDB on the same parquet tables and
compare row-count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from cim_framework_graph_partitioning_spark.session import get_spark  # noqa: E402
from cim_framework_graph_partitioning_spark.sources.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def norm_cell(v):
    if v is None:
        return "\x00NULL"  # sortable sentinel (tuples may mix None/str)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    t_start = time.monotonic()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows, cols={scols} [spark {t_spark:.1f}s]")
            continue
        t1 = time.monotonic()
        try:
            res = con.sql(oracles[name])
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        t_duck = time.monotonic() - t1
        ok_schema = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sn, dn = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_vals = sn == dn
        status = "OK  " if (ok_schema and ok_count and ok_vals) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} schema={ok_schema} "
            f"values={ok_vals} [spark {t_spark:.1f}s duck {t_duck:.1f}s]",
            flush=True,
        )
        if status == "FAIL":
            failed.append(name)
            if not ok_schema:
                print(f"   spark cols: {scols}\n   duck  cols: {dcols}")
            if ok_schema and not ok_vals:
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                for a, b in diff:
                    print(f"   spark: {a}\n   duck : {b}")
                extra_s = [r for r in sn if r not in set(dn)][:2]
                extra_d = [r for r in dn if r not in set(sn)][:2]
                if extra_s:
                    print(f"   only-spark: {extra_s}")
                if extra_d:
                    print(f"   only-duck : {extra_d}")
    print(f"total wall: {time.monotonic() - t_start:.1f}s")
    print("FAILED:" if failed else "ALL OK", failed)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
