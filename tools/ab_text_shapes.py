"""A/B the text_analysis_docs stage shape (VERDICT r6 ask #8).

Shapes, all zero-shuffle (the property that matters at cluster scale):
  fused   — the shipped shape: simhash | vector | barrier | one final
            WIDE projection computing every scalar stat + fingerprints.
  split2  — the judge's suggested middle shape: fingerprints (+simhash/
            vector) in one barried projection, scalar stats + quality in
            the next — two narrower codegen operators instead of one
            very wide one.
  split3  — stats annotated in their own barried projection, final
            select is a pure rename.

Interleaved in ONE warm session, repeats alternating, min+median
reported — same discipline as bench.py's A/B mode.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_text_shapes.py [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_diff_spark import workload as W
from data_diff_spark.functions import text as TX
from data_diff_spark.operators import dedup as DD
from data_diff_spark.planutil import project_barrier


def _final_cols(qf):
    c = F.col("text")
    return qf.select(
        "doc_id",
        TX.token_count(c).cast("long").alias("n_tokens"),
        TX.bpe_token_count(c).cast("long").alias("n_bpe_tokens"),
        TX.lang_id(c).alias("lang_pred"),
        TX.alpha_ratio(c).alias("alpha_ratio"),
        TX.mean_token_len(c).alias("mean_token_len"),
        TX.stopword_ratio(c, "en").alias("stopword_ratio_en"),
        TX.quality_score(c).alias("quality_score"),
        TX.set_fingerprint(c).alias("set_fp"),
        TX.rolling_fingerprint(c).alias("rolling_fp"),
        "simhash",
        "keep",
        "reject_reason",
        F.concat_ws(",", F.col("vector")).alias("vector_str"),
    )


def shape_fused(spark, sf_dir):
    return W.q_text_analysis_docs(spark, sf_dir)


def shape_split2(spark, sf_dir):
    W.load_views(spark, sf_dir)
    c = F.col("text")
    base = spark.table("documents").select("doc_id", "text")
    base = DD.with_simhash(base, "text", out="simhash")
    base = TX.hashed_vector(base, dim=64)
    base = project_barrier(base)
    fp = base.select(
        "doc_id", "text", "simhash", "vector",
        TX.set_fingerprint(c).alias("set_fp"),
        TX.rolling_fingerprint(c).alias("rolling_fp"),
    )
    fp = project_barrier(fp)
    qf = TX.quality_filter(
        fp, min_tokens=20, min_quality=0.25, allowed_langs=["en", "und"])
    return qf.select(
        "doc_id",
        TX.token_count(c).cast("long").alias("n_tokens"),
        TX.bpe_token_count(c).cast("long").alias("n_bpe_tokens"),
        TX.lang_id(c).alias("lang_pred"),
        TX.alpha_ratio(c).alias("alpha_ratio"),
        TX.mean_token_len(c).alias("mean_token_len"),
        TX.stopword_ratio(c, "en").alias("stopword_ratio_en"),
        TX.quality_score(c).alias("quality_score"),
        "set_fp", "rolling_fp", "simhash", "keep", "reject_reason",
        F.concat_ws(",", F.col("vector")).alias("vector_str"),
    )


def shape_split3(spark, sf_dir):
    W.load_views(spark, sf_dir)
    c = F.col("text")
    base = spark.table("documents").select("doc_id", "text")
    base = DD.with_simhash(base, "text", out="simhash")
    base = TX.hashed_vector(base, dim=64)
    base = project_barrier(base)
    fp = base.select(
        "doc_id", "text", "simhash", "vector",
        TX.set_fingerprint(c).alias("set_fp"),
        TX.rolling_fingerprint(c).alias("rolling_fp"),
    )
    fp = project_barrier(fp)
    st = fp.select(
        "*",
        TX.token_count(c).cast("long").alias("n_tokens"),
        TX.bpe_token_count(c).cast("long").alias("n_bpe_tokens"),
        TX.lang_id(c).alias("lang_pred"),
        TX.alpha_ratio(c).alias("alpha_ratio"),
        TX.mean_token_len(c).alias("mean_token_len"),
        TX.stopword_ratio(c, "en").alias("stopword_ratio_en"),
        TX.quality_score(c).alias("quality_score"),
    )
    st = project_barrier(st)
    qf = TX.quality_filter(
        st, min_tokens=20, min_quality=0.25, allowed_langs=["en", "und"])
    return qf.select(
        "doc_id", "n_tokens", "n_bpe_tokens", "lang_pred", "alpha_ratio",
        "mean_token_len", "stopword_ratio_en", "quality_score",
        "set_fp", "rolling_fp", "simhash", "keep", "reject_reason",
        F.concat_ws(",", F.col("vector")).alias("vector_str"),
    )


SHAPES = {"fused": shape_fused, "split2": shape_split2, "split3": shape_split3}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    W.load_views(spark, sf_dir)

    # equal output first: any shape change that alters VALUES is void
    frames = {k: fn(spark, sf_dir) for k, fn in SHAPES.items()}
    ref = frames["fused"]
    for k, df in frames.items():
        if k == "fused":
            continue
        d1 = ref.exceptAll(df.select(*ref.columns)).count()
        d2 = df.select(*ref.columns).exceptAll(ref).count()
        assert d1 == 0 and d2 == 0, f"{k} output differs: {d1}/{d2}"

    times = {k: [] for k in SHAPES}
    for _ in range(repeats):
        for k, fn in SHAPES.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[k].append(round(time.time() - t0, 3))
    out = {
        "sf_dir": sf_dir, "repeats": repeats,
        "min": {k: min(v) for k, v in times.items()},
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "samples": times,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
