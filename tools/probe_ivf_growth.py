"""IVF corpus-growth probe (r9): the fixed-16-cell gate shape vs the
rows/1000 auto rule, at sf0.1 (2k vectors) and the sf1 replica (20k).

Measures, per (scale, shape): candidates per query (the exact pair count
the ranking stage pays), recall@5 vs the exact oracle, and wall-clock for
ivf_topk and ivf_pq_topk. The claim under test: with auto cells the
candidate load per query is FLAT above the 16-cell floor (~n_probe*1000),
while the fixed gate shape grows linearly with the corpus; recall at the
auto shape stays within noise of the fixed shape.

Writes tools/PROBE_ivf_growth.json. Run on an idle box:
    python tools/probe_ivf_growth.py
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from data_diff_spark.operators import similarity as SIM

    def load(sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
        )

    def load_syn10():
        # 200k vectors: 10 golden-angle-rotated replicas of the sf1
        # embeddings (make_sf.replicate — same isometry guarantees), the
        # scale where the auto rule is ABOVE its 16-cell floor on both
        # ends and the flat candidates-per-query claim is visible. Also
        # exercises the >=32-cell BLAS assignment path end-to-end.
        from tools.make_sf import replicate

        base = load(".scratch/sf1")
        parts = [replicate(base, "embeddings", i) for i in range(10)]
        outp = parts[0]
        for p in parts[1:]:
            outp = outp.unionByName(p)
        return outp

    out = {}
    scales = [
        ("sf0.1", lambda: load("/root/testdata/sf0.1"), 200),
        ("sf1", lambda: load(".scratch/sf1"), 200),
        ("sf10syn", load_syn10, 2000),
    ]
    for tag, loader, qmod in scales:
        emb = loader().persist()
        n = emb.count()
        qs = emb.filter(F.col("vec_id") % qmod == 0)
        nq = qs.count()
        exact = {(r.id_q, r.id_c) for r in SIM.cosine_topk(emb, qs, k=5).collect()}
        auto_cells = SIM._auto_ivf_cells(n)
        for label, cells in (("fixed16", 16), ("auto", auto_cells)):
            cap = max(2048, 2 * cells)
            # exact candidate load = probed-cell corpus rows per query
            c = SIM._prepared(emb, "vec_id", "embedding")
            cents = SIM.train_ivf_centroids(c, cells, 2, cap)
            assigned = SIM._assign_cells(c, cents).persist()
            probed = SIM._probed_queries(qs, cents, 4, "vec_id", "embedding")
            cand = assigned.join(probed.select("id_q", "cell"), "cell").count()
            t0 = time.time()
            ivf = {(r.id_q, r.id_c)
                   for r in SIM.ivf_topk(emb, qs, k=5, n_cells=cells, train_cap=cap).collect()}
            t1 = time.time()
            pq = {(r.id_q, r.id_c)
                  for r in SIM.ivf_pq_topk(emb, qs, k=5, n_cells=cells, train_cap=cap, n_rows=n).collect()}
            t2 = time.time()
            out[f"{tag}/{label}"] = {
                "corpus_rows": n, "n_queries": nq, "n_cells": cells,
                "candidates_per_query": round(cand / nq, 1),
                "ivf_recall_at_5": round(len(exact & ivf) / len(exact), 3),
                "pq_recall_at_5": round(len(exact & pq) / len(exact), 3),
                "ivf_wall_s": round(t1 - t0, 2), "pq_wall_s": round(t2 - t1, 2),
            }
            assigned.unpersist()
            spark.catalog.clearCache()
        emb.unpersist()
    g_fixed = out["sf10syn/fixed16"]["candidates_per_query"] / out["sf1/fixed16"]["candidates_per_query"]
    g_auto = out["sf10syn/auto"]["candidates_per_query"] / out["sf1/auto"]["candidates_per_query"]
    out["summary"] = {
        "corpus_growth_sf1_to_sf10syn": round(
            out["sf10syn/auto"]["corpus_rows"] / out["sf1/auto"]["corpus_rows"], 2),
        "cand_growth_fixed16": round(g_fixed, 2),
        "cand_growth_auto": round(g_auto, 2),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_ivf_growth.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))
    for k in out:
        if k != "summary":
            print(k, out[k])


if __name__ == "__main__":
    main()
