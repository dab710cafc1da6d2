"""Decade-up scale characterization: sf1 → sf3 → sf10 (r11 VERDICT Next #2).

The sf1 ratios (tools/PROBE_r11_sf1_scalers.json) cover one 10× step from
the driver's sf0.1. This probe extends the characterization two more
steps — factor 30 and factor 100 replicas built by tools/make_sf.py — for
12 families' PRODUCTION ARMS (the bench_arms.py definition: the single
call a user makes, no oracle scopes): the top-8 most expensive entries
plus the flagship lineitem diffs (hashdiff at 60M rows/side, joindiff's
full-outer SMJ) and the two scan-agg entries whose one-row outputs
exposed the count()-drain fold. For each
entry at each scale it records wall-clock (min of reps, warm), output
rows, and the entry's NAMED growth metric (LSH candidate pairs, ANN
candidates-per-query, IVF cell count, survivor counts), then judges each
scale step: a time ratio materially above the data ratio is reported as
SUPERLINEAR — a finding, not a footnote.

Special attention (the r11 ask):
  - auto-ANN shapes beyond toy cell counts: sf10 embeddings = 200k
    vectors → auto IVF cells = 200 (rows/1000), the first probe where
    _ASSIGN_UDF_MIN_WORK and the trainer caps rule at real cell counts;
  - neardup_pairs_jaccard's candidate growth (shingle-disjoint replicas
    ⇒ candidates must grow linearly with docs, never quadratically).

Prereqs (build once; factor 30/100 need the --topk-embeddings opt-in,
whose exact cost is stamped in EMBEDDINGS_TOPK_ONLY.json — the embedding
entries probed here are top-k shapes, which that marker declares valid):
    python tools/make_sf.py 10
    python tools/make_sf.py 30  --topk-embeddings
    python tools/make_sf.py 100 --topk-embeddings

Usage: python tools/probe_r12_sf10.py [reps]
Writes tools/PROBE_r12_sf10.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F

SCALES = [  # (tag, sf_dir, data factor relative to sf0.1)
    ("sf1", os.path.join(REPO, ".scratch", "sf1"), 10),
    ("sf3", os.path.join(REPO, ".scratch", "sf3"), 30),
    ("sf10", os.path.join(REPO, ".scratch", "sf10"), 100),
]
SUPERLINEAR_TOL = 1.3  # time-ratio / data-ratio above this = SUPERLINEAR


def _drain(df):
    """ONE full execution of the plan, all columns materialized, no
    driver transfer — the noop sink, exactly bench.py's instrument.
    count() is NOT a drain: OptimizeOneRowPlan folds count() over a
    one-row global aggregate to a literal (checksum/collect_stats read
    0.16s flat at 60M rows before this fix), and column pruning lets it
    skip output-column work everywhere else."""
    df.write.format("noop").mode("overwrite").save()
    for h in getattr(df, "_ddspark_persisted", []):
        try:
            h.unpersist(True)
        except Exception:  # noqa: BLE001
            pass


def _rows(df):
    """Row count for artifact metadata — separate from the timed drain
    (running count() inside the timed region would re-execute the plan)."""
    n = df.count()
    for h in getattr(df, "_ddspark_persisted", []):
        try:
            h.unpersist(True)
        except Exception:  # noqa: BLE001
            pass
    return n


def _ann_lsh_candidates(spark, W, SIM, sf_dir):
    """Distinct (query, corpus) candidates per query at the AUTO shape —
    the quantity the occupancy rule holds ~flat (probe_ann_growth's
    measure, re-derived at this corpus size)."""
    from data_diff_spark.streaming.events_stream import table_rows

    n = table_rows(spark, sf_dir, "embeddings")
    emb, qs = W._emb_base(spark), W._emb_queries(spark)
    bands, rpb = SIM._auto_ann_bands(n)
    n_flip = 2
    c = SIM.band_codes(emb, bands, rpb, W.EMB_DIM)
    qr = SIM.multiprobe_codes(qs, bands, rpb, n_flip, W.EMB_DIM).select(
        F.col("id").alias("id_q"), "band_idx", "code")
    ncand = (c.join(qr, ["band_idx", "code"])
             .filter(F.col("id") != F.col("id_q"))
             .select("id_q", "id").distinct().count())
    nq = qs.count()
    return {"bands": bands, "rows_per_band": rpb,
            "cand_per_q": round(ncand / max(1, nq), 1), "n_queries": nq}


def _ann_ivf_candidates(spark, W, SIM, sf_dir):
    """Probed-cell corpus rows per query at the AUTO cell count (the
    ranking stage's exact pair load; probe_ivf_growth's measure)."""
    from data_diff_spark.streaming.events_stream import table_rows

    n = table_rows(spark, sf_dir, "embeddings")
    emb, qs = W._emb_base(spark), W._emb_queries(spark)
    cells = SIM._auto_ivf_cells(n)
    cap = max(2048, 2 * cells)
    c = SIM._prepared(emb, "vec_id", "embedding")
    cents = SIM.train_ivf_centroids(c, cells, 2, cap)
    assigned = SIM._assign_cells(c, cents, n_rows=n).persist()
    probed = SIM._probed_queries(qs, cents, 4, "vec_id", "embedding")
    cand = assigned.join(probed.select("id_q", "cell"), "cell").count()
    nq = qs.count()
    assigned.unpersist(True)
    return {"auto_cells": len(cents),
            "cand_per_q": round(cand / max(1, nq), 1), "n_queries": nq}


def _neardup_candidates(spark, DD, sf_dir):
    """LSH band-bucket candidate pairs at the operator's 32x4/k=128/n=3
    shape — the pre-verification join volume that must stay linear in
    docs for shingle-disjoint replicas."""
    docs = spark.table("documents")
    sig = DD.minhash_signatures(docs, 128, 3, "text", "doc_id")
    return {"lsh_candidates": DD.lsh_candidate_pairs(sig, 32, 4).count(),
            "n_docs": docs.count()}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .appName("probe-r12-sf10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from data_diff_spark import workload as W
    from data_diff_spark.operators import dedup as DD
    from data_diff_spark.operators import similarity as SIM
    from tools.bench_arms import _arm_ann_ivf, _arm_ann_lsh, _arm_clean_docs

    # (entry, production arm, growth-metric fn or None, named growth term)
    ENTRIES = [
        ("hashdiff_orders", W.q_hashdiff_orders, None,
         "diff rows ∝ modified keys (key-offset replicas preserve the "
         "%100 modification patterns exactly)"),
        ("neardup_pairs_jaccard", W.q_dedup_minhash_lsh,
         lambda s, d: _neardup_candidates(s, DD, d),
         "LSH candidates ∝ docs (replicas are shingle-disjoint; no "
         "cross-replica bucket collisions beyond hash accidents)"),
        ("ann_topk_lsh", _arm_ann_lsh,
         lambda s, d: _ann_lsh_candidates(s, W, SIM, d),
         "cand_per_q ~flat (occupancy rule widens codes with the corpus); "
         "queries ∝ corpus, so total work ∝ corpus"),
        ("snapshot_diff_orders", W.q_snapshot_diff, None,
         "diff rows ∝ modified keys; snapshot scan ∝ corpus"),
        ("ann_topk_ivf", _arm_ann_ivf,
         lambda s, d: _ann_ivf_candidates(s, W, SIM, d),
         "cand_per_q ~flat (auto cells = rows/1000, n_probe fixed); "
         "training cap bounds the Lloyd pass"),
        ("clean_docs", _arm_clean_docs, None,
         "CAVEAT at replica scale: the shingle-disjoint replica tags "
         "(`r3·the`) defeat the stopword/perplexity heuristics, so "
         "survivors collapse toward 0 above sf1 — the probe still pays "
         "the full-corpus quality scan + LM training (the dominant "
         "stages), but dedup/decontaminate run under-loaded; treat the "
         "ratio as a lower bound for those two stages only"),
        ("diff_stats_orders", W.q_diff_stats_orders, None,
         "constant output; two scans + one shuffle ∝ corpus"),
        ("hashdiff_lineitem_dupkeys", W.q_hashdiff_lineitem, None,
         "diff rows ∝ modified keys; flagship duplicate-PK multiset diff "
         "at 60M rows/side, ~2% uniform diff rate = the reference-"
         "documented hashdiff degradation regime (every coarse bucket "
         "dirty). r12 fix: large mismatched fine-bucket sets stay "
         "JVM-side (broadcast-join of the id frame) instead of a driver "
         "collect+reupload"),
        ("joindiff_lineitem_compound", W.q_joindiff_lineitem, None,
         "one full-outer SMJ on the compound key — the reference's "
         "joindiff cost model ('approximates JOIN operation') at 60M "
         "rows/side"),
        ("collect_stats_lineitem", W.q_collect_stats_lineitem, None,
         "constant 1-row output; one scan-agg over lineitem (this entry "
         "is WHY the drain is a noop write: count() folded the whole "
         "plan to a literal via OptimizeOneRowPlan)"),
        ("checksum_orders", W.q_checksum_orders, None,
         "constant 1-row output; one normalize+md5 scan-agg over orders"),
        ("asof_purchase_all", W.q_asof_purchase, None,
         "output rows ∝ events; ONE shuffle on user_id + window (the "
         "noop drain materializes the window columns, so the operator "
         "cannot be pruned out of the measured plan)"),
    ]

    out = {"metric": "scale_probe_r12", "unit": "sec", "reps": reps,
           "cpus": cpus, "superlinear_tol": SUPERLINEAR_TOL, "scales": {},
           "entries": {}}
    missing = [t for t, d, _ in SCALES
               if not os.path.exists(os.path.join(d, "lineitem.parquet"))]
    if missing:
        raise SystemExit(f"missing replicas {missing}: run tools/make_sf.py "
                         f"first (see module docstring)")

    for tag, sf_dir, fac in SCALES:
        out["scales"][tag] = {"dir": sf_dir, "factor_vs_sf0.1": fac}
        marker = os.path.join(sf_dir, "EMBEDDINGS_TOPK_ONLY.json")
        if os.path.exists(marker):
            with open(marker) as f:
                out["scales"][tag]["embeddings_marker"] = json.load(f)
        for name, fn, growth_fn, term in ENTRIES:
            rec = out["entries"].setdefault(name, {"growth_term": term})
            rows = _rows(fn(spark, sf_dir))  # metadata, also warms fixtures
            _drain(fn(spark, sf_dir))  # warmup of the noop path (JIT)
            spark.catalog.clearCache()
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                _drain(fn(spark, sf_dir))
                times.append(round(time.monotonic() - t0, 3))
                spark.catalog.clearCache()
            rec[tag] = {"min": min(times), "times": times, "rows": rows}
            if growth_fn is not None:
                rec[tag]["growth"] = growth_fn(spark, sf_dir)
            print(f"{tag:5s} {name:26s} min={min(times):8.2f}s rows={rows}"
                  f" {rec[tag].get('growth', '')}", flush=True)

    # judge each scale step: time ratio vs data ratio
    steps = [("sf1", "sf3", 3.0), ("sf3", "sf10", 100 / 30)]
    for name, _, _, _ in [(e[0], 0, 0, 0) for e in ENTRIES]:
        rec = out["entries"][name]
        rec["ratios"] = {}
        verdicts = []
        for a, b, dr in steps:
            tr = round(rec[b]["min"] / max(1e-9, rec[a]["min"]), 2)
            sup = tr > dr * SUPERLINEAR_TOL
            rec["ratios"][f"{b}/{a}"] = {
                "time": tr, "data": round(dr, 2),
                "verdict": "SUPERLINEAR" if sup else "ok"}
            verdicts.append(sup)
        rec["superlinear"] = any(verdicts)
    bad = [n for n, r in out["entries"].items() if r["superlinear"]]
    out["superlinear_entries"] = bad
    path = os.path.join(REPO, "tools", "PROBE_r12_sf10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(json.dumps({"superlinear_entries": bad, "written": path}))
    spark.stop()


if __name__ == "__main__":
    main()
