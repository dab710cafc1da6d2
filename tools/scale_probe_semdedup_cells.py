"""Scale probe: semdedup auto-n_cells keeps ~1k rows/cell past the old
train_cap ceiling — including past the REAL default ceiling (2048).

VERDICT r6 (What's wrong #2): with n_cells=None the derived cell count
used to clamp at train_cap (default 2048), so above ~2M rows cells grew
without bound and the intra-cell join went quadratic in exactly the
regime SemDeDup's growing-cluster-count rule exists to avoid. The fix
(similarity._auto_n_cells) couples the training-sample cap to the
derived cell count; the companion fix (_assign_cells) moves assignment
to a broadcast + chunked-BLAS pandas UDF above 256 centroids, because
the SQL literal-matrix transform is O(cells*dim) interpreted work per
row and would be its own quadratic at 50k cells.

The probe runs the EXACT sizing/training/assignment path the operator
runs (auto rule -> train_ivf_centroids -> _assign_cells) and reports the
cell-occupancy histogram. The intra-cell pair join is deliberately NOT
run here: its cost is n_cells * (rows/cell)^2 ~ LINEAR in the corpus
once occupancy is flat, which is precisely what the histogram proves,
and it is exercised end-to-end by the gated entry + pytest.

The last step (2.5M rows -> 2500 cells) crosses the old 2048 default
clamp: under the OLD behavior it would report n_cells=2048 and growing
occupancy; now it derives 2500 cells and occupancy stays ~1000.

Corpus: deterministic md5-derived embeddings (dim 8) spread uniformly —
the probe measures the SIZING rule, not clustering quality.

Usage: python tools/scale_probe_semdedup_cells.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_diff_spark.operators import similarity as SIM

DIM = 8


def _vecs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.conv(F.substring(F.md5(F.concat_ws("_", F.col("id"), F.lit(d))), 1, 6), 16, 10)
             .cast("double") / 16777215.0 - 0.5)
            for d in range(DIM)
        ]).alias("embedding"),
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in (512_000, 1_000_000, 2_500_000):
        t0 = time.time()
        c = SIM._prepared(_vecs(spark, n), "vec_id", "embedding").persist()
        rows = c.count()
        n_cells, train_cap = SIM._auto_n_cells(rows, train_cap=2048,
                                               max_auto_cells=65_536)
        cents = SIM.train_ivf_centroids(c, n_cells, n_iter=2,
                                        train_cap=train_cap)
        occ = (
            SIM._assign_cells(c, cents)
            .groupBy("cell").count()
            .agg(F.count("*").alias("cells"), F.avg("count").alias("mean"),
                 F.max("count").alias("max"))
            .collect()[0]
        )
        dt = time.time() - t0
        old = min(n_cells, 2048)
        print(
            f"corpus {n:>9,}: auto n_cells {n_cells:>5} (train_cap -> "
            f"{train_cap}); observed {occ['cells']:>5} cells, mean occ "
            f"{occ['mean']:>7.1f}, max {occ['max']:>6}  ({dt:5.1f}s)  "
            f"[old clamp: {old} cells -> mean {rows / old:,.0f}]",
            flush=True,
        )
        c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
