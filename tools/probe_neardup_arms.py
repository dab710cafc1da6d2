"""Warm arm-split of neardup_pairs_jaccard: brute inverted-index Jaccard,
minhash-LSH dedup, and the incremental probe, each noop-drained separately
on one warm session, plus the full entry. Exploratory instrument.

Usage: python tools/probe_neardup_arms.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def drain(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
        .appName("probe-neardup-arms")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark import workload as W

    W.load_views(spark, sf_dir)
    spark.table("documents").count()
    out = []
    for _ in range(reps):
        s = {}
        s["jaccard_brute"] = drain(W.q_ngram_jaccard_pairs(spark, sf_dir))
        s["minhash_lsh"] = drain(W.q_dedup_minhash_lsh(spark, sf_dir))
        s["incremental"] = drain(W.q_lsh_incremental(spark, sf_dir))
        t0 = time.time()
        full = W.q_neardup_pairs_all(spark, sf_dir)
        s["full_construct"] = round(time.time() - t0, 3)
        s["full_drain"] = drain(full)
        while W._PENDING_RELEASE:
            try:
                W._PENDING_RELEASE.pop().unpersist(False)
            except Exception:
                pass
        spark.catalog.clearCache()
        out.append(s)
    print("##RESULT## " + json.dumps(out))


if __name__ == "__main__":
    main()
