"""Similarity-search operator tests. Cross-engine value parity is covered by
the oracle gate; here we pin ranking semantics, the LSH completeness
guarantee at high thresholds, and ANN recall."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 10 == 0)


def test_topk_shape_and_ranking(emb, queries):
    out = SIM.cosine_topk(emb, queries, k=3).collect()
    n_q = queries.count()
    assert len(out) == 3 * n_q
    by_q = {}
    for r in out:
        by_q.setdefault(r.id_q, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        # ranks follow cosine descending
        assert rows[0].cosine >= rows[1].cosine >= rows[2].cosine
        assert all(r.id_c != r.id_q for r in rows)


def test_lsh_pairs_complete_at_high_threshold(emb):
    """At threshold ~1 every qualifying pair agrees on all hyperplane signs
    w.p. ~1, so LSH must find exactly what brute force finds."""
    copies = emb.limit(5).select(
        (F.col("vec_id") + 777000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.5).alias("embedding"),
    )
    corpus = emb.unionAll(copies)
    got = sorted(
        (r.id_a, r.id_b) for r in SIM.cosine_pairs_lsh(corpus, threshold=0.999).collect()
    )
    want = sorted((r.vec_id, r.vec_id + 777000) for r in emb.limit(5).collect())
    assert got == want


def test_ann_recall_vs_exact(emb, queries):
    exact = {
        (r.id_q, r.id_c)
        for r in SIM.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.id_q, r.id_c)
        for r in SIM.ann_topk_lsh(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_ivf_recall_vs_exact(emb, queries):
    from data_diff_spark.operators.similarity import ivf_topk

    exact = {(r.id_q, r.id_c) for r in SIM.cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.id_q, r.id_c) for r in ivf_topk(emb, queries, k=5).collect()}
    assert len(approx) == len(exact)  # always returns a full top-k
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"


def test_ivf_deterministic_across_partitionings(emb, queries):
    """The integer quantizer must give identical results regardless of how
    the corpus is partitioned (md5-ordered sample + exact int arithmetic)."""
    a = sorted((r.id_q, r.id_c, r.rank) for r in SIM.ivf_topk(emb, queries, k=5).collect())
    b = sorted(
        (r.id_q, r.id_c, r.rank)
        for r in SIM.ivf_topk(emb.repartition(17), queries, k=5).collect()
    )
    assert a == b


def test_ivf_layout_roundtrip(emb, queries, tmp_path):
    """write_ivf_layout + ivf_topk_from_layout == direct ivf_topk (same
    deterministic centroids), with the corpus physically cell-partitioned."""
    import os

    path = str(tmp_path / "ivf_layout")
    cents = SIM.write_ivf_layout(emb, path)
    direct = sorted(
        (r.id_q, r.id_c, r.rank) for r in SIM.ivf_topk(emb, queries, k=5).collect()
    )
    from_layout = sorted(
        (r.id_q, r.id_c, r.rank)
        for r in SIM.ivf_topk_from_layout(
            emb.sparkSession, path, cents, queries, k=5
        ).collect()
    )
    assert direct == from_layout
    assert any(d.startswith("cell=") for d in os.listdir(path))


def test_quantized_dot_exactness(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in SIM.cosine_pairs_lsh(df, threshold=-2.0, bands=8, rows_per_band=4, dim=2).collect()
    }
    # identical vectors: exactly 1.0 (integer dot = norm product squared)
    assert out.get((1, 2)) == 1.0


def test_quantize_embeddings_reconstruction_bound(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = SIM.quantize_embeddings(emb)
    joined = emb.join(q, "vec_id").select(
        F.array_max(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.col("qvec"),
                lambda x, qi: F.abs(x - qi * F.col("scale")),
            )
        ).alias("max_err"),
        "scale",
    )
    # symmetric rounding: per-element error <= scale/2 (+ fp slack)
    bad = joined.filter(F.col("max_err") > F.col("scale") * 0.5 + 1e-12).count()
    assert bad == 0
    # int8 range respected
    assert q.select(F.array_max(F.transform("qvec", F.abs)).alias("m")).agg(
        F.max("m")
    ).collect()[0][0] <= 127


def test_quantize_embeddings_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
    r = SIM.quantize_embeddings(df).collect()[0]
    assert r["scale"] == 0.0 and list(r["qvec"]) == [0, 0, 0]


def test_ivf_layout_self_describing(emb, queries, tmp_path):
    """A fresh session needs only the layout path: centroids are stored
    with it (centroids.json) and centroids=None loads them."""
    path = str(tmp_path / "ivf_sd")
    cents = SIM.write_ivf_layout(emb, path)
    with_cents = sorted(
        (r.id_q, r.id_c, r.rank)
        for r in SIM.ivf_topk_from_layout(
            emb.sparkSession, path, cents, queries, k=5
        ).collect()
    )
    from_disk = sorted(
        (r.id_q, r.id_c, r.rank)
        for r in SIM.ivf_topk_from_layout(
            emb.sparkSession, path, None, queries, k=5
        ).collect()
    )
    assert from_disk == with_cents
