"""One side of the interleaved A/B benchmark (bench.py with
SPARK_GRAFT_BENCH_BASELINE set).

Loads the workload from the tree named by SPARK_GRAFT_BENCH_TREE (the
working copy OR a baseline git worktree — the same script serves both, so
older baselines need no harness of their own), holds one warm SparkSession,
and times entries on demand: the parent writes an entry name per stdin line,
the worker answers one `##AB## {json}` line on stdout. Interleaving the two
workers entry-by-entry cancels machine drift out of A/B comparisons — the
failure mode that made cross-run bench totals uninterpretable (two runs an
hour apart disagreed 1.5x on entries whose code was byte-identical).
"""

from __future__ import annotations

import json
import os
import sys
import time

TREE = os.environ.get("SPARK_GRAFT_BENCH_TREE", os.getcwd())
sys.path.insert(0, TREE)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # C1-only: kills the C2 recompile storms over per-run-unique
        # generated classes (see bench.py BENCH_JVM_FLAGS). Applied to
        # BOTH A/B sides (this script serves head and baseline trees), so
        # ratios stay like-for-like.
        .config("spark.driver.extraJavaOptions",
                "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName(f"bench-ab-{os.path.basename(TREE)}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_diff_spark.workload import WORKLOAD, load_views

    try:  # warm-up, mirroring bench.py: not counted, failure non-fatal
        load_views(spark, sf_dir)
        spark.table("lineitem").count()
        from data_diff_spark import workload as _wlw
        # getattr: this script serves baseline worktrees that may predate
        # the streaming warmup helper
        getattr(_wlw, "warm_streaming", lambda *_: None)(spark, sf_dir)
    except Exception:  # noqa: BLE001
        pass

    print("##AB## " + json.dumps({"ready": True, "entries": len(WORKLOAD)}),
          flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        if name == "QUIT":
            break
        if name not in WORKLOAD:
            # a baseline tree may simply predate the entry
            print("##AB## " + json.dumps({"entry": name, "skip": True}),
                  flush=True)
            continue
        try:
            from data_diff_spark import workload as _wl
            # getattr: the HEAD worker script serves baseline trees too,
            # and an old tree's workload may predate _ORACLE_SCANS
            _scans = getattr(_wl, "_ORACLE_SCANS", {})
            _scans.clear()
            load0 = os.getloadavg()[0]
            t0 = time.time()
            df = WORKLOAD[name][0](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            # 1-min loadavg before the sample: two warm workers on an idle
            # 32-cpu box sit well under ~40 between entries; a sample taken
            # at load 70+ was sharing the machine and its timing is
            # evidence of nothing (the r7 protocol audit found exactly such
            # a contaminated artifact — samples swinging 13s->156s)
            out = {"entry": name, "sec": round(time.time() - t0, 3),
                   "load1m": round(load0, 1)}
            # Evidence for the A/B artifact: which parquet copy the
            # cross-engine oracle side scanned (relaid multi-file copy vs
            # the single-row-group original is a documented ~4x swing on
            # the hashdiff gate — a ratio claim must show both sides took
            # the same path).
            if _scans:
                out["oracle_scans"] = dict(_scans)
        except Exception as e:  # noqa: BLE001
            out = {"entry": name, "err": f"{type(e).__name__}: {e}"[:200]}
        print("##AB## " + json.dumps(out), flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
