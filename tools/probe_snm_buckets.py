"""snm_pairs bucket-size histogram (r13, VERDICT #5): the sorted-
neighborhood plan partitions the corpus into monotone prefix buckets and
runs per-bucket windows — a skewed prefix distribution (Zipf openings at
real-corpus scale) makes one bucket a straggler window partition. This
probe replays the exact census + driver merge fold from
dedup.snm_pairs for each of the entry's two passes and prints the bucket
count, max/median/mean sizes, and the top-5 buckets, at each sf_dir.

Usage: python tools/probe_snm_buckets.py [sf_dir ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def buckets_for(keyed, window=4, refined=True):
    """Replicates snm_pairs' bucket fold; refined=True runs the shipped
    _snm_census (r13 skew guard), refined=False the raw base census."""
    if refined:
        from data_diff_spark.operators.dedup import _snm_census
        census = _snm_census(keyed, 2, window)
    else:
        rows = keyed.groupBy(
            F.substring("_k", 1, 2).alias("_pfx")).count().collect()
        census = sorted((r["_pfx"], r["count"]) for r in rows)
    buckets = []
    for pfx, cnt in census:
        if buckets and buckets[-1][1] <= window:
            ps, n = buckets[-1]
            buckets[-1] = (ps + [pfx], n + cnt)
        else:
            buckets.append(([pfx], cnt))
    if len(buckets) > 1 and buckets[-1][1] <= window:
        ps_last, n_last = buckets.pop()
        ps, n = buckets[-1]
        buckets[-1] = (ps + ps_last, n + n_last)
    return buckets


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", ".scratch/sf1"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("probe-snm-buckets")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.workload import load_views

    out = {}
    for sf_dir in sf_dirs:
        load_views(spark, sf_dir)
        docs = spark.table("documents").withColumn(
            "k2", F.expr("substring(text, 11)"))
        n = docs.count()
        entry = {"n_docs": n, "passes": {}}
        for sort_col in ("text", "k2"):
            keyed = docs.select(
                F.col("doc_id").alias("id"), F.col(sort_col).alias("_k"),
            ).filter(F.col("_k").isNotNull())
            import statistics as st
            stats = {}
            for label, refined in (("raw", False), ("refined", True)):
                bs = buckets_for(keyed, refined=refined)
                sizes = sorted((b[1] for b in bs), reverse=True)
                stats[label] = {
                    "n_buckets": len(bs),
                    "max": sizes[0], "top5": sizes[:5],
                    "median": st.median(sizes),
                    "mean": round(st.mean(sizes), 1),
                    "max_share_pct": round(100.0 * sizes[0] / n, 1),
                }
            entry["passes"][sort_col] = stats
        out[sf_dir] = entry
        print(sf_dir, json.dumps(entry), flush=True)
    print("##RESULT## " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
