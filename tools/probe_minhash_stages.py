"""Stage-split of the minhash_lsh_dedup pipeline (dedup_resolve's cost
center): shingles / signatures / banding+candidates / exact verify, each
drained with the noop sink on one warm session. Exploratory instrument —
prints JSON, no artifact.

Usage: python tools/probe_minhash_stages.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _drain(df):
    df.write.format("noop").mode("overwrite").save()


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
        .appName("probe-minhash-stages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.workload import load_views
    from data_diff_spark.operators import dedup as DD
    from data_diff_spark.planutil import explode_nonnull
    from data_diff_spark.functions.text import P31
    from data_diff_spark.operators.dedup import (
        shingle_sets, minhash_signatures, lsh_candidate_pairs,
    )
    from data_diff_spark.functions.text import hash60, perm_coefficients

    load_views(spark, sf_dir)
    docs = spark.table("documents")
    out = {"sf_dir": sf_dir, "reps": reps, "stages": {}}

    def stage(name, build):
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            _drain(build())
            ts.append(round(time.time() - t0, 3))
        out["stages"][name] = {"times": ts, "min": min(ts)}
        print(f"{name:28s} {ts}", file=sys.stderr)

    # 1. shingles alone
    stage("shingles", lambda: shingle_sets(docs))

    # 2. signatures off cached shingles (the entry's real shape) vs cold
    s = shingle_sets(docs).persist()
    s.count()
    stage("signatures_cached_shingles",
          lambda: minhash_signatures(docs, _shingles=s))

    # 2b. exploded hash rows only (explode + hash60, no 128-perm agg)
    stage("exploded_hash_rows",
          lambda: explode_nonnull(s, ["id"], F.col("shingles"), "sh")
          .select("id", (hash60(F.col("sh")) % P31).alias("h")))

    # 2c. the 128-perm agg over a CACHED exploded frame (isolates the agg)
    ex = (explode_nonnull(s, ["id"], F.col("shingles"), "sh")
          .select("id", (hash60(F.col("sh")) % P31).alias("h")).persist())
    n_ex = ex.count()
    out["exploded_rows"] = n_ex

    def _agg():
        aggs = [
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % P31).alias(f"mh{i}")
            for i, (a, b) in enumerate(perm_coefficients(128))
        ]
        return ex.groupBy("id").agg(*aggs)

    stage("perm128_agg_cached_rows", _agg)

    # 3. banding + candidate join off cached signatures
    sig = minhash_signatures(docs, _shingles=s).persist()
    sig.count()
    stage("band_candidates_cached_sig",
          lambda: lsh_candidate_pairs(sig))

    # 4. exact verify off cached candidates + cached shingles
    cand = lsh_candidate_pairs(sig).persist()
    cand.count()

    def _verify():
        sa = s.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
        sb = s.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (cand.join(sa, "id_a").join(sb, "id_b")
                .withColumn("jaccard", inter.cast("double") / union)
                .filter(F.col("jaccard") >= 0.8)
                .select("id_a", "id_b", "jaccard"))

    stage("verify_cached_cand", _verify)

    # 5. the whole operator end-to-end (the production arm's shape)
    for h in (cand, sig, ex, s):
        h.unpersist(blocking=True)

    def _full():
        p = DD.minhash_lsh_dedup(docs, threshold=0.8)
        try:
            return p
        finally:
            pass

    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription("probe:full_minhash_lsh_dedup")
        p = DD.minhash_lsh_dedup(docs, threshold=0.8)
        t0 = time.time()
        _drain(p)
        ts.append(round(time.time() - t0, 3))
        for hh in getattr(p, "_ddspark_persisted", []):
            hh.unpersist(blocking=True)
    out["stages"]["full_minhash_lsh_dedup"] = {"times": ts, "min": min(ts)}
    print(f"{'full_minhash_lsh_dedup':28s} {ts}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
