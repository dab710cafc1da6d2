"""ann_topk_lsh corpus-growth probe (VERDICT r7 Next #4).

The r7 shape kept fixed 8x4 bands: each 4-bit band bucket holds ~1/16 of
the corpus at ANY size, so per-query candidates grew LINEARLY with the
corpus — the occupancy blowup cosine_pairs_lsh escaped in r7. The auto
mode under test sizes the code width by the occupancy rule
(rows_per_band ~ log2(n / target_occupancy)) and recovers recall with
margin-guided multi-probe (similarity.multiprobe_codes).

For each corpus (sf0.1 = 2k vectors, .scratch/sf1 = 20k — build with
`python tools/make_sf.py 10`) this probe measures, against the EXACT
cosine_topk oracle:

  recall      |approx top-5 ∩ exact top-5| / |exact top-5|
  cand_per_q  distinct (query, corpus) candidate pairs per query —
              the quantity that must stay ~flat as the corpus grows
  fixed8x4    the same two numbers for the old fixed shape, for contrast

Pass/fail: recall >= 0.9 at every size AND auto cand_per_q growing
sublinearly (ratio of cand_per_q across a 10x corpus step << 10x).

Writes tools/PROBE_ann_growth.json and prints one line per corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from data_diff_spark.operators import similarity as SIM

CORPORA = [
    ("/root/testdata/sf0.1", "sf0.1"),
    (os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  ".scratch", "sf1"), "sf1.0"),
]


def measure(spark, emb, q, n, bands, rows_per_band, n_flip, tag):
    exact = {(r.id_q, r.id_c) for r in SIM.cosine_topk(emb, q, k=5).collect()}
    t0 = time.time()
    approx = {(r.id_q, r.id_c) for r in SIM.ann_topk_lsh(
        emb, q, k=5, bands=bands, rows_per_band=rows_per_band,
        n_flip=n_flip, n_rows=n).collect()}
    wall = time.time() - t0
    recall = len(exact & approx) / max(1, len(exact))
    c = SIM.band_codes(emb, bands, rows_per_band, 64)
    qsrc = (SIM.multiprobe_codes(q, bands, rows_per_band, n_flip, 64)
            if n_flip else SIM.band_codes(q, bands, rows_per_band, 64))
    qr = qsrc.select(F.col("id").alias("id_q"), "band_idx", "code")
    ncand = (c.join(F.broadcast(qr), ["band_idx", "code"])
             .filter(F.col("id") != F.col("id_q"))
             .select("id_q", "id").distinct().count())
    nq = q.count()
    return {"shape": tag, "bands": bands, "rows_per_band": rows_per_band,
            "n_flip": n_flip, "recall": round(recall, 4),
            "cand_per_q": round(ncand / nq, 1), "sec": round(wall, 2)}


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:TieredStopAtLevel=1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for sfdir, tag in CORPORA:
        if not os.path.exists(os.path.join(sfdir, "embeddings.parquet")):
            print(f"{tag}: missing {sfdir} (run tools/make_sf.py) — skipped")
            continue
        emb = spark.read.parquet(f"{sfdir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        ).persist()
        n = emb.count()
        q = emb.filter(F.col("vec_id") % 20 == 0)
        ab, ar = SIM._auto_ann_bands(n)
        rows = [
            measure(spark, emb, q, n, ab, ar, 4, "auto"),
            measure(spark, emb, q, n, 8, 4, 0, "fixed8x4"),
        ]
        for r in rows:
            r.update({"corpus": tag, "n": n})
            print(json.dumps(r), flush=True)
        out.extend(rows)
        emb.unpersist()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROBE_ann_growth.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    autos = [r for r in out if r["shape"] == "auto"]
    ok = all(r["recall"] >= 0.9 for r in autos)
    if len(autos) == 2 and autos[0]["n"]:
        growth = autos[1]["cand_per_q"] / max(1.0, autos[0]["cand_per_q"])
        scale = autos[1]["n"] / autos[0]["n"]
        print(f"auto cand/q growth {growth:.2f}x for {scale:.0f}x corpus; "
              f"recall>=0.9: {ok}")
    spark.stop()


if __name__ == "__main__":
    main()
