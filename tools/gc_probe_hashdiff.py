"""Diagnose the bimodal hashdiff_lineitem_dupkeys timing (SURVEY 6.6):
run the entry N times in ONE warm session, recording per-run wall-clock
alongside the JVM's cumulative GC time/count delta and the JIT
compilation-time delta. If slow runs co-move with GC deltas, the mode is
collector phase, not plan; if with JIT, it's recompilation; if neither,
look below the JVM (THP/compaction).

Usage: python tools/gc_probe_hashdiff.py [runs] [entry]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def jvm_counters(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    gc_ms, gc_n = 0, 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    jit = mf.getCompilationMXBean().getTotalCompilationTime()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    return {"gc_ms": gc_ms, "gc_n": gc_n, "jit_ms": jit,
            "heap_used_mb": heap.getUsed() >> 20}


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    entry = sys.argv[2] if len(sys.argv) > 2 else "hashdiff_lineitem_dupkeys"
    pre = [p for p in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if p]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.workload import WORKLOAD, load_views

    load_views(spark, sf_dir)
    spark.table("lineitem").count()
    for p in pre:  # session-pollution experiment: run these once, untimed
        WORKLOAD[p][0](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    if pre:
        print(json.dumps({"pre_ran": pre}), flush=True)
    fn = WORKLOAD[entry][0]
    rows = []
    for i in range(runs):
        c0 = jvm_counters(spark)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        c1 = jvm_counters(spark)
        rows.append({
            "run": i, "sec": dt,
            "gc_ms": c1["gc_ms"] - c0["gc_ms"],
            "gc_n": c1["gc_n"] - c0["gc_n"],
            "jit_ms": c1["jit_ms"] - c0["jit_ms"],
            "heap_mb": c1["heap_used_mb"],
            "load1m": round(os.getloadavg()[0], 1),
        })
        print(json.dumps(rows[-1]), flush=True)
        spark.catalog.clearCache()
    secs = sorted(r["sec"] for r in rows)
    print(json.dumps({"entry": entry, "min": secs[0], "max": secs[-1],
                      "median": secs[len(secs) // 2]}))
    spark.stop()


if __name__ == "__main__":
    main()
