"""Jobs-per-entry probe (r13, VERDICT #4): run each workload entry once on
a warm session inside its own job group and report how many Spark JOBS the
entry issued (construct-time actions + the noop drain), plus wall seconds.
Every job pays fixed driver cost (planning, scheduling, result handling),
which is exactly the term that makes seven sf0.1 entries run faster on 8
cores than 32 — fewer jobs is the structural fix the r13 gate rewrite
claims, and this probe is its evidence.

Usage: python tools/probe_job_counts.py [sf_dir] [entry,entry,...]
Prints one JSON line; write it to an artifact via shell redirection.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions",
                "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("probe-job-counts")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.workload import WORKLOAD, load_views, warm_streaming

    load_views(spark, sf_dir)
    spark.table("lineitem").count()
    warm_streaming(spark, sf_dir)

    names = (sys.argv[2].split(",") if len(sys.argv) > 2 else list(WORKLOAD))
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        name = name.strip()
        fn, _ = WORKLOAD[name]
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        # streaming-harness jobs run outside the driver job group (their
        # microbatch threads don't inherit it), as do _parallel_arms
        # thread jobs on Spark versions where InheritableThreadLocal is
        # off — so this counts DRIVER-THREAD jobs; thread-issued jobs are
        # called out per entry in the report where they matter.
        jobs = tracker.getJobIdsForGroup(group)
        out[name] = {"jobs": len(jobs), "sec": round(dt, 3)}
        print(name, out[name], flush=True)
        spark.catalog.clearCache()
    print("##RESULT## " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()


