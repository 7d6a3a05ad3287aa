"""Local replica of the driver's correctness gate: run every queries()
entry against its oracle_sql() via DuckDB and compare row count, column
names, and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from osm_pbf2json_spark.session import get_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session(master="local[8]", shuffle_partitions=8, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(sql)
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {e}")
            continue
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        sset = rowset(spark_cols, [[r[c] for c in spark_cols] for r in spark_rows])
        dset = rowset(duck_cols, duck_rows)
        ok_vals = sset == dset
        status = "OK" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
        print(
            f"[{status}] {name}: rows {len(spark_rows)}/{len(duck_rows)}"
            f" cols={'ok' if ok_cols else (spark_cols, duck_cols)}"
            f" vals={'ok' if ok_vals else 'DIFF'}"
        )
        if not (ok_cols and ok_count and ok_vals):
            failures.append((name, "mismatch"))
            sd = [r for r in sset if r not in set(map(tuple, dset))][:3]
            ds = [r for r in dset if r not in set(map(tuple, sset))][:3]
            print("   spark-only:", sd)
            print("   duck-only :", ds)
    print()
    print(f"{len(failures)} failures: {[f[0] for f in failures]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
