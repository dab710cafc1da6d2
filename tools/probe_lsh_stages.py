"""Stage-split of ann_topk_lsh's arms at sf0.1: time each sub-pipeline of
the auto and pinned arms separately (band codes, candidate ids, re-rank,
topk) on one warm session, noop-drained. Exploratory instrument.

Usage: python tools/probe_lsh_stages.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


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
        .appName("probe-lsh-stages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark import workload as W
    from data_diff_spark.operators import similarity as S

    W.load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    base, qs = W._emb_base(spark), W._emb_queries(spark)
    n = table_rows(spark, sf_dir, "embeddings")
    out = {"n_rows": n, "samples": []}
    for rep in range(reps):
        s = {}
        # --- auto arm, staged ---
        ab, ar = S._auto_ann_bands(n)
        nf = 4
        c = S.band_codes(base, ab, ar, 64, "vec_id", "embedding")
        s["auto_corpus_codes"] = drain(c)
        qsrc = S.multiprobe_codes(qs, ab, ar, nf, 64, "vec_id", "embedding")
        s["auto_query_codes"] = drain(qsrc)
        qr = qsrc.select(F.col("id").alias("id_q"), "band_idx", "code")
        cand_ids = (
            c.select("id", "band_idx", "code")
            .join(F.broadcast(qr), ["band_idx", "code"])
            .filter(F.col("id") != F.col("id_q"))
            .select("id_q", F.col("id").alias("id_c"))
            .distinct()
        )
        s["auto_cand_ids"] = drain(cand_ids)
        s["auto_n_pairs"] = cand_ids.count()
        p = S._prepared(base, "vec_id", "embedding")
        pq = S._prepared(qs, "vec_id", "embedding")
        withvecs = (
            cand_ids
            .join(p.select(F.col("id").alias("id_c"), F.col("qv").alias("qv_c"),
                           F.col("nrm").alias("nrm_c")), "id_c")
            .join(F.broadcast(pq.select(F.col("id").alias("id_q"),
                                        F.col("qv").alias("qv_q"),
                                        F.col("nrm").alias("nrm_q"))), "id_q")
        )
        s["auto_withvecs"] = drain(withvecs)
        pairs = S._pairs_cosine_blas(withvecs)
        s["auto_rerank_blas"] = drain(pairs)
        s["auto_full_arm"] = drain(S.ann_topk_lsh(
            base, qs, k=5, dim=64, n_rows=n))
        # --- pinned arm ---
        s["pinned_full_arm"] = drain(S.ann_topk_lsh(
            base, qs, k=5, bands=8, rows_per_band=4, dim=64, n_rows=n))
        # --- exact arm ---
        s["exact_full_arm"] = drain(S.cosine_topk(base, qs, k=5, n_rows=n))
        out["samples"].append(s)
        spark.catalog.clearCache()
    print("##RESULT## " + json.dumps(out))


if __name__ == "__main__":
    main()
