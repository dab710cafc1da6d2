"""Dump `.explain("formatted")` for named workload queries to files.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> <query1,query2,...> [sf_dir]

Writes <out_dir>/<query>_<suffix>.txt for each query. Run from the tree
whose plans you want (HEAD for `after`, a worktree of the baseline ref for
`before`). Planning only — no jobs are executed beyond what the workload
constructors themselves run (fixture builds, eager gate materialization),
so prefer sf0.001 and never quote timings from this tool.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("dump-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.workload import WORKLOAD

    for name in names:
        name = name.strip()
        fn, _ = WORKLOAD[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
