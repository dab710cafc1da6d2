"""Phase-split of the expensive gate entries: driver-side construction
(fn() call — plan building, fixture checks, eager arm materialization
inside the entry) vs the final noop drain (the union + exceptAll
verification job). Times each phase per rep on one warm session.

Usage: python tools/probe_gate_phases.py [sf_dir] [reps] [entry,entry,...]
Prints JSON to stdout; no artifact (exploratory instrument).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = (sys.argv[3].split(",") if len(sys.argv) > 3 else
             ["hashdiff_orders", "snapshot_diff_orders", "ann_topk_ivf",
              "neardup_pairs_jaccard", "ann_topk_lsh", "clean_docs"])
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
        .appName("probe-gate-phases")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.workload import WORKLOAD, load_views, warm_streaming

    load_views(spark, sf_dir)
    spark.table("lineitem").count()
    warm_streaming(spark, sf_dir)

    out = {}
    for name in names:
        fn, _ = WORKLOAD[name]
        phases = []
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            phases.append({"construct": round(t1 - t0, 3),
                           "drain": round(t2 - t1, 3),
                           "total": round(t2 - t0, 3)})
            spark.catalog.clearCache()
        out[name] = phases
        print(name, json.dumps(phases), flush=True)
    print("##RESULT## " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
