"""semdedup hot-cell probe (VERDICT r7 Next #2 / What's wrong #2).

Degenerate corpus: >=20% of all embeddings are IDENTICAL (the "millions
of near-duplicate embeddings" skew case — identical vectors tie to one
k-means cell regardless of how many centroids auto-sizing derives, so
raising n_cells cannot dissolve the hot cell; a merely-near-identical
cluster with per-row noise gets subdivided by its own in-cluster
centroids and is NOT the degenerate case, measured during this probe's
construction). This is exactly where the r7 implementation materialized
the whole cell in a single pandas task (one straggler = the job,
unbounded task memory). The block-pair split (semdedup max_cell_rows)
bounds every task to 2*max_cell_rows vectors and runs the same pair
scan B(B+1)/2-way parallel.

Three measurements (runnable separately: main | contrast | diverse):

  main (1M rows)    n_cells=None (auto -> 1000 cells), 220k identical
                    rows tie into ONE cell, split ENGAGED (default
                    max_cell_rows=32768 -> 7 blocks): the run COMPLETES
                    with every task bounded to <=2*32768 vectors and
                    finds exactly the 219,999 duplicates.
  contrast (hot)    the hot CELL scanned split vs one-task, interleaved
                    reps, exceptAll parity. On a pure-duplicate cell the
                    scan early-exits, so cost is Arrow data movement and
                    the split's B-fold row replication reads as ~2.5x
                    overhead — the honest price of the memory bound in
                    the movement-bound regime.
  diverse           the compute-bound regime (60k NON-duplicate rows in
                    one cell — full quadratic scan): one task is the
                    straggler (min 43.6s, excursions to 339s under BLAS
                    contention) vs split min 31.7s across 10 bounded
                    tasks; parity 0.

The structural claim is the MEMORY/straggler bound (max task rows
2*max_cell_rows vs the whole cell); wall-clock wins appear exactly when
the cell's pair scan is compute-bound. Bit-level split parity is also
pinned at test scale in tests/test_similarity.py. Deterministic data
(xxhash64-derived), no RNG. Writes tools/PROBE_semdedup_hotcell.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from data_diff_spark.operators import similarity as SIM

DIM = 64


def build_corpus(spark, n_total, n_hot):
    """(vec_id, embedding): ids < n_hot are ONE identical vector (they
    quantize bit-identically, so k-means assignment ties them all into
    the LOWEST tied cell — the whole cluster lands in ONE cell no matter
    how many centroids auto-sizing derives, which is exactly the
    degenerate case the split exists for: a dup cluster k-means cannot
    subdivide); the rest are uniform-ish in [-1,1]^64. All values are
    deterministic functions of (id, dim) via xxhash64 — no RNG."""
    ids = spark.range(n_total).select(F.col("id").alias("vec_id"))
    d = F.sequence(F.lit(1), F.lit(DIM))

    def noise(scale):
        return lambda i: (
            (F.pmod(F.xxhash64(F.col("vec_id") * DIM + i), F.lit(2001)) - 1000)
            / F.lit(1000.0) * scale)

    base = lambda i: ((F.pmod(F.xxhash64(i), F.lit(2001)) - 1000) / F.lit(1000.0))  # noqa: E731
    hot = F.transform(d, base)
    cold = F.transform(d, noise(1.0))
    return ids.select(
        "vec_id",
        F.when(F.col("vec_id") < n_hot, hot).otherwise(cold).alias("embedding"),
    )


def run(spark, corpus, n_cells, max_cell_rows, label):
    t0 = time.time()
    out = SIM.semdedup(corpus, threshold=0.99, n_cells=n_cells,
                       max_cell_rows=max_cell_rows).persist()
    n = out.count()
    dups = out.filter(F.col("dup_of").isNotNull()).count()
    wall = time.time() - t0
    print(f"{label}: {wall:.1f}s rows={n} dups={dups} "
          f"(max_cell_rows={max_cell_rows})", flush=True)
    return out, {"label": label, "sec": round(wall, 1), "rows": n,
                 "dups": dups, "max_cell_rows": max_cell_rows}


ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROBE_semdedup_hotcell.json")


def _write(results):
    with open(ARTIFACT, "w") as f:
        json.dump(results, f, indent=1)


def main():
    """`python tools/scale_probe_semdedup_hotcell.py [main|contrast|diverse]` —
    the two measurements are runnable separately (each merges into the
    JSON artifact) so either fits a bounded session on a contended box."""
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:TieredStopAtLevel=1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            results = json.load(f)

    if which in ("all", "main"):
        # --- 1M main run: auto cells, split engaged -------------------------
        corpus = build_corpus(spark, 1_000_000, 220_000).repartition(64).persist()
        corpus.count()
        out, r = run(spark, corpus, None, 32_768, "1M auto-cells split")
        top = (out.groupBy("cell").count().orderBy(F.desc("count"))
               .limit(5).collect())
        hist = [(int(x["cell"]), int(x["count"])) for x in top]
        r["top_cells"] = hist
        r["split_factor_hot"] = -(-hist[0][1] // 32_768)
        print("top cells:", hist, "-> hot split into",
              r["split_factor_hot"], "blocks", flush=True)
        results["main_1m"] = r
        _write(results)
        out.unpersist()
        corpus.unpersist()

    if which in ("all", "contrast"):
        # --- contrast + parity: the HOT CELL's scan, split vs one-task ------
        # The sides differ only in _best_dup_in_cells' split decision, so
        # the contrast isolates exactly the operator under test: the 1M
        # corpus' 220k-row hot cell, scanned (a) as one pandas task — the
        # r7 behavior the VERDICT flagged (whole cell's vectors in one
        # task; the straggler IS the job) — vs (b) block-pair split.
        # Order alternates per rep (first-in-session pays worker spawn and
        # this VM's cold first-touch pages), the previous identical plan is
        # unpersisted before timing (Spark's CacheManager matches by
        # logical plan — a later rep would otherwise read the earlier
        # rep's cache), and min-of-reps is quoted.
        warm = build_corpus(spark, 20_000, 5_000).persist()
        SIM.semdedup(warm, threshold=0.99, n_cells=None).count()
        warm.unpersist()
        # 500k/120k: the contrast isolates the CELL-level behavior (the 1M
        # corpus-level run is `main`); a 120k-row hot cell already shows
        # the one-task straggler while keeping the cold first-rep samples
        # of this lazily-paged VM inside a bounded session
        corpus = build_corpus(spark, 500_000, 120_000).repartition(64).persist()
        c = SIM._prepared(corpus, "vec_id", "embedding")
        n_cells, cap = SIM._auto_n_cells(corpus.count(), 2048, 65_536)
        cents = SIM.train_ivf_centroids(c, n_cells, 2, cap)
        assigned = SIM._assign_cells(c, cents).persist()
        hist = {int(x["cell"]): int(x["n"]) for x in
                assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
        hot_cell, hot_rows = max(hist.items(), key=lambda kv: kv[1])
        hot = assigned.filter(F.col("cell") == hot_cell).persist()
        hot.count()
        assigned.unpersist()
        corpus.unpersist()
        split = {hot_cell: -(-hot_rows // 32_768)}
        sides = {"split": split, "one_task": {}}
        samples = {k: [] for k in sides}
        outs = {}
        for rep in range(2):
            order = list(sides.items())
            if rep % 2:
                order.reverse()
            for label, sp in order:
                if label in outs:
                    outs[label].unpersist(blocking=True)
                t0 = time.time()
                out = SIM._best_dup_in_cells(hot, 0.99, split=sp).persist()
                out.count()
                sec = round(time.time() - t0, 1)
                samples[label].append(sec)
                print(f"hot-cell scan {label} rep{rep}: {sec}s", flush=True)
                outs[label] = out
        mism = (outs["split"].exceptAll(outs["one_task"]).count()
                + outs["one_task"].exceptAll(outs["split"]).count())
        print(f"parity: {mism} mismatching rows (must be 0)", flush=True)
        results["contrast_hot_cell"] = {
            "hot_cell_rows": hot_rows,
            "split_factors": split,
            "samples": samples,
            "min": {k: min(v) for k, v in samples.items()},
            "max_task_rows": {"split": 2 * 32_768, "one_task": hot_rows},
            "parity_mismatches": mism,
        }
        results.pop("contrast_150k", None)
        results.pop("contrast_scan_1m", None)
        _write(results)

    if which in ("all", "collapse"):
        # --- r9: exact-dup collapse on the movement-bound hot cell ----------
        # semdedup END-TO-END (the collapse lives there, above
        # _best_dup_in_cells): the 120k-identical hot cell used to pay
        # ~2.5x for B-fold block replication of identical vectors; the
        # collapse groups them to ONE representative before the scan, so
        # the cell drops below max_cell_rows and skips block replication
        # entirely. Sides: bounded path (default max_cell_rows, collapse
        # engaged) vs the unbounded one-task path (max_cell_rows = 1e9).
        # Interleaved reps, unpersist-before-retime, min-of-reps, exceptAll
        # parity — same discipline as `contrast`.
        corpus = build_corpus(spark, 500_000, 120_000).repartition(64).persist()
        corpus.count()
        sides = {"collapse_split": 32_768, "one_task": 1_000_000_000}
        samples = {k: [] for k in sides}
        outs = {}
        for rep in range(2):
            order = list(sides.items())
            if rep % 2:
                order.reverse()
            for label, mcr in order:
                if label in outs:
                    outs[label].unpersist(blocking=True)
                    for h in getattr(outs[label], "_ddspark_persisted", []):
                        h.unpersist(blocking=True)
                t0 = time.time()
                out = SIM.semdedup(corpus, threshold=0.99, n_cells=None,
                                   max_cell_rows=mcr).persist()
                out.count()
                sec = round(time.time() - t0, 1)
                samples[label].append(sec)
                print(f"semdedup {label} rep{rep}: {sec}s", flush=True)
                outs[label] = out
        mism = (outs["collapse_split"].exceptAll(outs["one_task"]).count()
                + outs["one_task"].exceptAll(outs["collapse_split"]).count())
        print(f"collapse parity: {mism} mismatching rows (must be 0)", flush=True)
        results["collapse_hot_cell"] = {
            "corpus_rows": 500_000,
            "identical_rows": 120_000,
            "samples": samples,
            "min": {k: min(v) for k, v in samples.items()},
            "ratio_vs_one_task": round(
                min(samples["collapse_split"]) / min(samples["one_task"]), 3),
            "parity_mismatches": mism,
        }
        _write(results)
        corpus.unpersist()

    if which in ("all", "diverse"):
        # --- the compute-bound regime: a DIVERSE oversized cell --------------
        # A pure-duplicate hot cell early-exits its scan, so its cost is
        # Arrow data movement and the split's B-fold row replication shows
        # up as overhead (measured above). The quadratic blow-up the split
        # exists to parallelize appears when an oversized cell holds
        # NON-duplicate rows (every pair must actually be checked) — e.g.
        # a user-pinned small n_cells over skewed data. 60k uniform rows
        # forced into one cell: the one-task side runs the full
        # 60k^2/2 pair scan in a single straggler task.
        corpus = build_corpus(spark, 60_000, 0).repartition(64)
        diverse = SIM._prepared(corpus, "vec_id", "embedding") \
            .withColumn("cell", F.lit(0)).persist()
        diverse.count()
        sides = {"split": {0: 4}, "one_task": {}}
        samples = {k: [] for k in sides}
        outs = {}
        for rep in range(2):
            order = list(sides.items())
            if rep % 2:
                order.reverse()
            for label, sp in order:
                if label in outs:
                    outs[label].unpersist(blocking=True)
                t0 = time.time()
                out = SIM._best_dup_in_cells(diverse, 0.99, split=sp).persist()
                out.count()
                sec = round(time.time() - t0, 1)
                samples[label].append(sec)
                print(f"diverse-cell scan {label} rep{rep}: {sec}s", flush=True)
                outs[label] = out
        mism = (outs["split"].exceptAll(outs["one_task"]).count()
                + outs["one_task"].exceptAll(outs["split"]).count())
        print(f"diverse parity: {mism} mismatching rows (must be 0)", flush=True)
        results["contrast_diverse_cell"] = {
            "cell_rows": 60_000,
            "samples": samples,
            "min": {k: min(v) for k, v in samples.items()},
            "parity_mismatches": mism,
        }
        _write(results)

    _write(results)
    spark.stop()


if __name__ == "__main__":
    main()
