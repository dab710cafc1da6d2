"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf_dir; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)  # full precision
    return str(v)


def frame_multiset(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS','8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("check-oracles")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:32s} rows={len(sdf):7d}  (no oracle, rows-only) {t1-t0:5.1f}s")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        scols, srows = frame_multiset(sdf)
        ocols, orows = frame_multiset(odf)
        ok_cols = scols == ocols
        ok_rows = srows == orows
        status = "OK " if (ok_cols and ok_rows) else "FAIL"
        print(f"{name:32s} {status} rows={len(sdf):7d}/{len(odf):7d} cols={'=' if ok_cols else f'{scols} vs {ocols}'} {t1-t0:5.1f}s")
        if not ok_rows and ok_cols:
            sset, oset = set(srows), set(orows)
            extra = list(sset - oset)[:3]
            missing = list(oset - sset)[:3]
            if extra:
                print(f"    spark-only: {extra}")
            if missing:
                print(f"    oracle-only: {missing}")
            failures += 1
        elif not ok_cols:
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
