"""IVF-PQ re-rank recall probe (r10, VERDICT Next #2): PQ recall@5 was
0.632 at 200k rows (PROBE_ivf_growth.json) vs exact-rank IVF's 1.0. The
standard fix is ADC-rank to top-R, then exact-dot re-rank of exactly
those candidates (similarity.exact_rerank). This probe measures, at the
same 200k synthetic corpus (10 golden-angle-rotated sf1 replicas) and
at sf1 (20k), recall@5 and wall-clock for plain ADC vs rerank=R across
R, plus the re-rank candidate volume (R * |Q| — the bounded raw-vector
read the stage pays).

Writes tools/PROBE_pq_rerank.json. Run on an idle box:
    python tools/probe_pq_rerank.py
"""

import json
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
        from tools.make_sf import replicate

        base = load(".scratch/sf1")
        parts = [replicate(base, "embeddings", i) for i in range(10)]
        outp = parts[0]
        for p in parts[1:]:
            outp = outp.unionByName(p)
        return outp

    out = {}
    scales = [
        ("sf1", lambda: load(".scratch/sf1"), 200),
        ("sf10syn", load_syn10, 2000),
    ]
    for tag, loader, qmod in scales:
        emb = loader().persist()
        n = emb.count()
        qs = emb.filter(F.col("vec_id") % qmod == 0)
        nq = qs.count()
        exact = {(r.id_q, r.id_c) for r in SIM.cosine_topk(emb, qs, k=5, n_rows=n).collect()}
        res = {"rows": n, "queries": nq, "arms": {}}
        arms = [("adc", None), ("rr20", 20), ("rr100", 100), ("rr500", 500)]
        for label, R in arms:
            t0 = time.time()
            got = {(r.id_q, r.id_c)
                   for r in SIM.ivf_pq_topk(emb, qs, k=5, n_rows=n, rerank=R).collect()}
            dt = time.time() - t0
            recall = len(exact & got) / len(exact)
            res["arms"][label] = {
                "recall@5": round(recall, 4),
                "sec": round(dt, 2),
                "rerank_pairs": (R or 0) * nq,
            }
            print(tag, label, res["arms"][label], flush=True)
        out[tag] = res
        emb.unpersist()
        spark.catalog.clearCache()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PROBE_pq_rerank.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
