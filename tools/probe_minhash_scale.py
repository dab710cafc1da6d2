"""Decade characterization of the Arrow minhash signature fold (§5 of
OPTIMIZATION_r12.md): at sf1/sf3/sf10 (10/30/100x the bench corpus), time

  - the signature stage alone over cached shingles, SQL aggregate vs the
    Arrow segment-min fold (the dispatch's two routes, same input), and
  - the full minhash_lsh_dedup production arm with the n_rows hint (the
    route real corpora take),

noop-drained on one warm session per scale. Writes
tools/PROBE_minhash_scale.json. Needs .scratch/sf{1,3,10}
(tools/make_sf.py 10 / 30 --topk-embeddings / 100 --topk-embeddings).

Usage: python tools/probe_minhash_scale.py [reps]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F


def _drain(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out = {"metric": "minhash_scale_probe", "unit": "sec", "reps": reps,
           "cpus": cpus, "scales": {}}
    for tag, factor in (("sf1", 10), ("sf3", 30), ("sf10", 100)):
        sf_dir = os.path.join(REPO, ".scratch", tag)
        if not os.path.isdir(sf_dir):
            out["scales"][tag] = {"err": "replica missing"}
            continue
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.driver.memory", "24g")
            .config("spark.driver.extraJavaOptions",
                    "-XX:TieredStopAtLevel=1 -XX:ReservedCodeCacheSize=512m")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .appName(f"probe-minhash-scale-{tag}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        from data_diff_spark.workload import load_views
        from data_diff_spark.operators import dedup as DD
        from data_diff_spark.streaming.events_stream import table_rows

        load_views(spark, sf_dir)
        docs = spark.table("documents")
        n_docs = table_rows(spark, sf_dir, "documents")
        rec = {"factor_vs_sf0.1": factor, "n_docs": n_docs, "stages": {}}

        s = DD.shingle_sets(docs).persist()
        s.count()

        def stage(name, build):
            ts = []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"probe:{tag}:{name}")
                t0 = time.time()
                _drain(build())
                ts.append(round(time.time() - t0, 3))
            rec["stages"][name] = {"times": ts, "min": min(ts)}
            print(f"{tag} {name:24s} {ts}", file=sys.stderr)

        stage("signatures_sql",
              lambda: DD.minhash_signatures(docs, _shingles=s))
        stage("signatures_arrow",
              lambda: DD.minhash_signatures(docs, _shingles=s, n_rows=n_docs))
        rec["signatures_ratio_arrow_vs_sql"] = round(
            rec["stages"]["signatures_arrow"]["min"]
            / rec["stages"]["signatures_sql"]["min"], 3)
        s.unpersist(blocking=True)

        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"probe:{tag}:full_arm")
            p = DD.minhash_lsh_dedup(docs, threshold=0.8, n_rows=n_docs)
            t0 = time.time()
            _drain(p)
            ts.append(round(time.time() - t0, 3))
            for hh in getattr(p, "_ddspark_persisted", []):
                hh.unpersist(blocking=True)
        rec["stages"]["full_arm_hinted"] = {"times": ts, "min": min(ts)}
        print(f"{tag} {'full_arm_hinted':24s} {ts}", file=sys.stderr)

        out["scales"][tag] = rec
        spark.stop()

    # per-decade growth of the hinted arm and of the arrow stage
    sc = out["scales"]
    for a, b, fac in (("sf1", "sf3", 3), ("sf3", "sf10", 10.0 / 3)):
        if a in sc and b in sc and "stages" in sc[a] and "stages" in sc[b]:
            for st in ("signatures_arrow", "full_arm_hinted"):
                r = round(sc[b]["stages"][st]["min"]
                          / max(1e-9, sc[a]["stages"][st]["min"]), 3)
                out.setdefault("growth", {}).setdefault(st, {})[
                    f"{a}->{b} (data x{fac:.2g})"] = r
    path = os.path.join(REPO, "tools", "PROBE_minhash_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
