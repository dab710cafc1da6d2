"""Scale probe: semdedup_incremental's O(new)-per-ingest claim, measured.

Builds IVF layouts from corpora of increasing size (1x / 4x / 16x the
sf embeddings, replicated with distinct ids and per-replica scaling so
cell occupancy grows linearly), then probes the SAME fixed-size batch
against each. The claim under test: probe wall-clock grows with the
BATCH and the matching cells' occupancy — never with corpus pair count
(corpus^2 would be 16x/256x between steps).

Usage: python tools/scale_probe_semdedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_diff_spark.operators import similarity as SIM


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    n0 = emb.count()
    batch = emb.filter(F.col("vec_id") % 37 == 0).select(
        (F.col("vec_id") + 90_000_000).alias("vec_id"), "embedding")
    nb = batch.count()
    print(f"base corpus {n0} vectors; fixed probe batch {nb}")

    scratch = tempfile.mkdtemp(prefix="semdedup_probe_")
    for mult in (1, 4, 16):
        reps = [
            emb.select((F.col("vec_id") + 1_000_000 * r).alias("vec_id"),
                       F.transform("embedding",
                                   lambda x, r=r: x * (1.0 + 0.003 * r)).alias("embedding"))
            for r in range(mult)
        ]
        corpus = reps[0]
        for r in reps[1:]:
            corpus = corpus.unionAll(r)
        corpus = corpus.repartition(32).persist()
        n = corpus.count()
        path = os.path.join(scratch, f"layout_x{mult}")
        t0 = time.time()
        SIM.write_ivf_layout(corpus, path, n_cells=16)
        build = time.time() - t0
        t0 = time.time()
        out = SIM.semdedup_incremental(batch, path, threshold=0.9)
        marked = out.filter(F.col("dup_of").isNotNull()).count()
        probe = time.time() - t0
        for h in getattr(out, "_ddspark_persisted", []):
            h.unpersist()
        corpus.unpersist()
        print(f"x{mult:<3} corpus={n:>7}  layout build {build:6.1f}s  "
              f"probe {probe:6.1f}s  dups_marked={marked}")
    spark.stop()


if __name__ == "__main__":
    main()
