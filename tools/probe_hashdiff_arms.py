"""Warm arm-split of the hashdiff_orders gate (VERDICT r10 Next #4).

The entry is THREE full diff pipelines verified equal (_must_equal):
local bucketed hashdiff, the live cross-engine DuckDB path, and the
versioned-table v1-vs-v2 reconstruction diff. This probe times each arm
separately on warm workers (the versioned table and the relaid ingest
copy pre-built), plus the _must_equal verification overhead (the three
eager counts + symmetric-difference unions), so the 20s-class driver
reading decomposes into quotable parts.

Usage: python tools/probe_hashdiff_arms.py [sf_dir] [reps]
Writes tools/PROBE_hashdiff_arms.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from data_diff_spark import workload as W

    arms = {
        "local": W.q_hashdiff_orders,
        "cross_engine": W.q_hashdiff_cross_engine,
        "versioned": W.q_version_diff_orders,
        "gate_all": W.q_hashdiff_orders_all,
    }
    # warmup: one full pass builds the versioned table, the relaid ingest
    # copy, and JITs the codecs — warm numbers only below
    W.q_hashdiff_orders_all(spark, sf_dir).count()
    spark.catalog.clearCache()

    out = {"sf_dir": sf_dir, "reps": reps, "arms": {}}
    for name, fn in arms.items():
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            times.append(round(time.monotonic() - t0, 3))
            for h in getattr(df, "_ddspark_persisted", []):
                try:
                    h.unpersist(True)
                except Exception:
                    pass
            spark.catalog.clearCache()
        out["arms"][name] = {"rows": n, "times": times, "min": min(times)}
    s = sum(out["arms"][a]["min"] for a in ("local", "cross_engine", "versioned"))
    out["verify_overhead_min"] = round(out["arms"]["gate_all"]["min"] - s, 3)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROBE_hashdiff_arms.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
