"""Shuffle-bytes evidence for the r13 _minhash_arrow map-side-combine fix
(VERDICT r12 Next #2 done-criterion): run the minhash signature stage at
sf1 / sf10 in BOTH shapes —

  old (r12):  ex.repartition(id) -> mapInPandas(fold)
              (shuffles every exploded (id, shingle-hash) row:
               document-length-dependent bytes)
  new (r13):  ex -> mapInPandas(fold per input partition)
              -> groupBy(id).min(mh*)
              (shuffles <= k+1 longs per (partition, doc))

Shuffle write bytes come from the Spark UI REST API (stage metrics summed
over the job's stages, attributed via job groups); wall seconds are
alternated new/old/new/old on the same warm session and quoted as min.

Usage: python tools/probe_minhash_shuffle_bytes.py [sf_dir ...]
Prints one JSON line per sf_dir and a ##RESULT## summary.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications/"
                                f"{spark.sparkContext.applicationId}{path}") as r:
        return json.load(r)


def _job_shuffle_bytes(spark, group):
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
    total_w = total_r = 0
    seen = set()
    for jid in ids:
        job = _rest(spark, f"/jobs/{jid}")
        for sid in job["stageIds"]:
            if sid in seen:
                continue
            seen.add(sid)
            for att in _rest(spark, f"/stages/{sid}"):
                total_w += att.get("shuffleWriteBytes", 0)
                total_r += att.get("shuffleReadBytes", 0)
    return total_w, total_r


def main() -> None:
    sf_dirs = sys.argv[1:] or [".scratch/sf1", ".scratch/sf10"]
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
        .config("spark.ui.enabled", "true")  # REST metrics source
        .appName("probe-minhash-shuffle-bytes")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark.operators import dedup as DD
    from data_diff_spark.planutil import explode_nonnull
    from data_diff_spark.workload import load_views

    results = {}
    gid = 0
    for sf_dir in sf_dirs:
        load_views(spark, sf_dir)
        docs = spark.table("documents")
        n_docs = docs.count()
        from data_diff_spark.functions.text import hash60

        def mk_ex():
            s = DD.shingle_sets(docs, 3, "text", "doc_id")
            return explode_nonnull(s, ["id"], F.col("shingles"), "sh").select(
                "id", (hash60(F.col("sh")) % DD.P31) .alias("h"))

        coeffs = DD.perm_coefficients(128)
        k = len(coeffs)
        from pyspark.sql import types as T
        schema = T.StructType(
            [T.StructField("id", T.LongType())]
            + [T.StructField(f"mh{i}", T.LongType()) for i in range(k)])

        def new_df():
            return DD._minhash_arrow(mk_ex(), coeffs)

        def old_df():
            return mk_ex().repartition(F.col("id")).mapInPandas(
                _fold_factory(coeffs), schema)

        entry = {"n_docs": n_docs, "new": {"sec": [], "w": [], "r": []},
                 "old": {"sec": [], "w": [], "r": []}}
        for rep in range(2):
            for label, build in (("new", new_df), ("old", old_df)):
                nonlocal_group = f"mh_{label}_{sf_dir}_{gid}"
                gid += 1
                spark.sparkContext.setJobGroup(nonlocal_group, label)
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                entry[label]["sec"].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobGroup(None, None)
                w, r = _job_shuffle_bytes(spark, nonlocal_group)
                entry[label]["w"].append(w)
                entry[label]["r"].append(r)
        results[sf_dir] = entry
        print(sf_dir, json.dumps(entry), flush=True)
        spark.catalog.clearCache()
    print("##RESULT## " + json.dumps(results))
    spark.stop()


def _fold_factory(coeffs):
    """The r12 fold body (identical math to dedup._minhash_arrow's)."""
    k = len(coeffs)
    from data_diff_spark.operators.dedup import P31

    def fold(batches):
        import numpy as np
        import pandas as pd
        A = np.array([a for a, _ in coeffs], dtype=np.int64)
        B = np.array([b for _, b in coeffs], dtype=np.int64)
        cols = [f"mh{i}" for i in range(k)]
        step = max(1, (1 << 20) // k)
        acc = None
        for pdf in batches:
            partials = [] if acc is None else [acc]
            for lo in range(0, len(pdf), step):
                blk = pdf.iloc[lo:lo + step]
                idv = blk["id"].to_numpy()
                hv = blk["h"].to_numpy(dtype=np.int64)
                order = np.argsort(idv, kind="stable")
                idv, hv = idv[order], hv[order]
                vals = (hv[:, None] * A[None, :] + B[None, :]) % P31
                bounds = np.flatnonzero(np.r_[True, idv[1:] != idv[:-1]])
                p = pd.DataFrame(
                    np.minimum.reduceat(vals, bounds, axis=0), columns=cols)
                p.insert(0, "id", idv[bounds])
                partials.append(p)
            if partials:
                acc = pd.concat(partials, ignore_index=True).groupby(
                    "id", as_index=False, sort=False).min()
        if acc is not None:
            yield acc

    return fold


if __name__ == "__main__":
    main()
