"""Production-arm bench series (r11 VERDICT Next #1).

The driver bench (bench.py) measures GATE entries — each a union of the
production operator plus its verification arms (_must_equal variants,
scoped oracle replays, recall baselines). That is the right correctness
instrument, but operator-level regressions can hide under, or be
mistaken for, gate-arm growth (hashdiff_orders: 3.9s operator inside a
16s entry). This tool generalizes tools/probe_hashdiff_arms.py across
the most expensive families: for each, it times

  - `arm`  — the PRIMARY production call a real user makes (one arm, no
             oracle scopes, no verification unions), and
  - `gate` — the full registry entry the driver times,

on the same warm workers, and reports gate_tax = gate - arm. Run it at
round close alongside the A/B (the closeout discipline): a future round
where `arm` regresses but `gate` moves inside noise — or vice versa —
becomes attributable.

Usage: python tools/bench_arms.py [sf_dir] [reps] [out.json]
Default writes BENCH_ARMS_r12.json at the repo root (pass the round's
filename explicitly at each round close).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F


def _drain(df):
    """ONE full execution, all columns materialized, no driver transfer —
    the noop sink, exactly bench.py's instrument. count() is NOT a
    drain: OptimizeOneRowPlan folds count() over a one-row global
    aggregate to a literal (the checksum arm read 0.15s before this
    fix), and column pruning lets it skip output-column work."""
    df.write.format("noop").mode("overwrite").save()
    for h in getattr(df, "_ddspark_persisted", []):
        try:
            h.unpersist(True)
        except Exception:  # noqa: BLE001
            pass


def _rows(df):
    """Row count for artifact metadata, kept OUT of the timed region."""
    n = df.count()
    for h in getattr(df, "_ddspark_persisted", []):
        try:
            h.unpersist(True)
        except Exception:  # noqa: BLE001
            pass
    return n


def _arm_ann_lsh(spark, sf_dir):
    """The production AUTO shape (occupancy-ruled width + multi-probe) —
    what a user calls; the gate adds the pinned 8x4 arm, the exact-topk
    recall baseline (the documented BNLJ), and the auto_topk value arm."""
    from data_diff_spark import workload as W
    from data_diff_spark.operators import similarity as SIM
    from data_diff_spark.streaming.events_stream import table_rows

    W.load_views(spark, sf_dir)
    n = table_rows(spark, sf_dir, "embeddings")
    return SIM.ann_topk_lsh(W._emb_base(spark), W._emb_queries(spark),
                            k=5, dim=W.EMB_DIM, n_rows=n)


def _arm_ann_ivf(spark, sf_dir):
    """The production AUTO shape (rows/1000 cells, BLAS-dispatched
    assignment); the gate adds the pinned-16-cell oracle arm, the PQ/ADC
    arm, the layout read-back _must_equal, and the exact re-rank arm."""
    from data_diff_spark import workload as W
    from data_diff_spark.operators import similarity as SIM
    from data_diff_spark.streaming.events_stream import table_rows

    W.load_views(spark, sf_dir)
    n = table_rows(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(W._emb_base(spark), W._emb_queries(spark),
                        k=5, n_rows=n)


def _arm_clean_docs(spark, sf_dir):
    """train LM + clean_corpus survivors — the pipeline a user runs; the
    gate adds the per-stage replay, per-doc perplexity, and the two BPE
    training/tokenize replay scopes."""
    from data_diff_spark import workload as W
    from data_diff_spark.functions.lm import train_ngram_lm
    from data_diff_spark.pipeline import clean_corpus

    W.load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    corpus = spark.sql(W.DOCS2_SQL)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    model, total = train_ngram_lm(docs, n=W.CLEAN_LM_N)
    cleaned, _counts = clean_corpus(
        corpus, min_tokens=10, min_quality=0.3, near_dup_threshold=None,
        benchmark=bench, decontaminate_n=5, redact=False,
        lm_model=(model, total), max_perplexity=W.CLEAN_PPL_CEILING,
        lm_n=W.CLEAN_LM_N,
    )
    return cleaned.select("doc_id")


def families(W):
    """entry name -> (production-arm fn, gate fn). Arm = the single call
    a reference user's workflow makes; docstrings on the local arms name
    what the gate adds on top."""
    return {
        "hashdiff_orders": (W.q_hashdiff_orders, W.q_hashdiff_orders_all),
        "neardup_pairs_jaccard": (W.q_dedup_minhash_lsh, W.q_neardup_pairs_all),
        "ann_topk_lsh": (_arm_ann_lsh, W.q_ann_topk_lsh),
        "snapshot_diff_orders": (W.q_snapshot_diff, W.q_snapshot_scd2_all),
        "ann_topk_ivf": (_arm_ann_ivf, W.q_ann_topk_ivf_all),
        "clean_docs": (_arm_clean_docs, W.q_clean_docs),
        "diff_stats_orders": (W.q_diff_stats_orders, W.q_diff_stats_all),
        "asof_purchase_all": (W.q_asof_purchase, W.q_asof_purchase_all),
        "checksum_orders": (W.q_checksum_orders, W.q_checksum_orders_scoped),
        "events_rollup": (W.q_events_rollup, W.q_events_rollup_all),
        "dedup_resolve": (W.q_dedup_resolve, W.q_dedup_resolve_all),
        "embedding_neardup_lsh": (W.q_embedding_neardup,
                                  W.q_embedding_neardup_all),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH_ARMS_r12.json")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("bench-arms")
        .getOrCreate()
    )
    from data_diff_spark import workload as W

    fams = families(W)
    out = {"metric": "bench_arms", "unit": "sec", "sf_dir": sf_dir,
           "reps": reps, "cpus": cpus, "families": {}}
    for name, (arm_fn, gate_fn) in fams.items():
        # warmup: one gate pass builds every on-disk fixture the family
        # reads (_built_once indexes, versioned tables, snapshots) and
        # JITs the codecs — warm numbers only below
        _drain(gate_fn(spark, sf_dir))
        spark.catalog.clearCache()
        rec = {}
        for leg, fn in (("arm", arm_fn), ("gate", gate_fn)):
            n = _rows(fn(spark, sf_dir))  # metadata, outside the timing
            spark.catalog.clearCache()
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                _drain(fn(spark, sf_dir))
                times.append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
            rec[leg] = {"rows": n, "times": times, "min": min(times),
                        "median": sorted(times)[len(times) // 2]}
        rec["gate_tax_min"] = round(rec["gate"]["min"] - rec["arm"]["min"], 3)
        if name == "dedup_resolve":
            # the one family where gate < arm is structural, not noise:
            # the gate persists pairs and shares ONE assign_clusters run
            # across its scopes, while the plain dedup_resolve(docs,
            # pairs) call recomputes the component assignment internally
            # — the gate is the better-composed pipeline.
            rec["note"] = ("negative tax expected: gate shares one "
                           "assign_clusters run; plain arm recomputes "
                           "assignment from pairs")
        out["families"][name] = rec
        print(f"{name:28s} arm={rec['arm']['min']:6.2f}s "
              f"gate={rec['gate']['min']:6.2f}s "
              f"tax={rec['gate_tax_min']:6.2f}s", flush=True)
    out["arm_total_min"] = round(
        sum(r["arm"]["min"] for r in out["families"].values()), 3)
    out["gate_total_min"] = round(
        sum(r["gate"]["min"] for r in out["families"].values()), 3)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("arm_total_min", "gate_total_min", "sf_dir")}))
    spark.stop()


if __name__ == "__main__":
    main()
