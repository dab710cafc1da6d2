"""Dedup-chain scale probe: does the LSH -> connected-components ->
resolve pipeline hold as the near-dup graph grows? (VERDICT r3 #9)

The scaling risk in the chain is components(): each round is two shuffles,
so wall-clock scales with ROUND COUNT x per-round data. Rounds are
O(log diameter); near-dup clusters are quasi-cliques, so the claim is that
rounds stay FLAT as the corpus (and every cluster's size) grows 10x. This
probe measures exactly that on three corpora:

    sf0.01 documents            (~1.2k docs)
    sf0.1  documents            (~12k docs)
    sf0.1 x10 replicated        (~120k docs; every doc duplicated 10x with
                                 fresh ids -> every cluster 10x larger and
                                 denser, the adversarial direction)

Prints one JSON line: per-corpus {docs, pairs, rounds, secs_*}.

Round counts are read from the components() convergence log record —
the same counter the operator uses to stop.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


class _RoundCapture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.rounds = None

    def emit(self, record):
        if "converged after" in record.getMessage():
            self.rounds = int(record.args[0]) if record.args else None


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_diff_spark.operators import dedup as DD

    cap = _RoundCapture()
    logging.getLogger("data_diff_spark.operators.dedup").addHandler(cap)
    logging.getLogger("data_diff_spark.operators.dedup").setLevel(logging.INFO)

    def corpus(name):
        if name == "sf0.01":
            return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        if name == "sf0.1":
            return spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        if name == "sf0.1x10":
            base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
            return base.crossJoin(spark.range(10).select(F.col("id").alias("__r"))).select(
                (F.col("doc_id") * 10 + F.col("__r")).alias("doc_id"),
                *[c for c in base.columns if c != "doc_id"],
            ).repartition(64)
        raise ValueError(name)

    out = {}
    for name in ("sf0.01", "sf0.1", "sf0.1x10"):
        docs = corpus(name).persist()
        n = docs.count()
        t0 = time.time()
        pairs = DD.minhash_lsh_dedup(docs, threshold=0.8).persist()
        n_pairs = pairs.count()
        t_pairs = time.time() - t0

        cap.rounds = None
        t0 = time.time()
        comp = DD.components(pairs)
        n_comp = comp.select("component").distinct().count()
        t_comp = time.time() - t0

        t0 = time.time()
        kept = DD.dedup_resolve(docs, pairs).count()
        t_resolve = time.time() - t0

        out[name] = {
            "docs": n,
            "pairs": n_pairs,
            "components": n_comp,
            "kept": kept,
            "rounds": cap.rounds,
            "secs_pairs": round(t_pairs, 2),
            "secs_components": round(t_comp, 2),
            "secs_resolve": round(t_resolve, 2),
        }
        pairs.unpersist()
        docs.unpersist()
        print(f"# {name}: {out[name]}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
