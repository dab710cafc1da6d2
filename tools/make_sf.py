"""Generate a larger-SF replica of the driver's testdata by key-offset
replication of sf0.1 (VERDICT r4 ask #1: scale-validate the expensive
workload entries at sf1.0).

Scaling rules (factor N, default 10), designed so every workload entry's
*semantic* load scales linearly — the point is to measure the PLAN, not to
manufacture quadratic blow-ups in the data:

- region/nation: fixed dims, copied as-is (TPC-H keeps them constant
  across SFs).
- customer/supplier/part/orders/lineitem/events: replica i adds a
  per-table key offset (multiples of 100, so every `key % 100` pattern in
  MODIFIED_*_SQL is preserved exactly) to the PK and to every FK,
  keeping referential integrity within each replica.
- documents: replica i>0 prefixes every whitespace token with `r{i}·`,
  so replicas are fully shingle-disjoint: near-dup/minhash/SNM pair
  structure replicates per-copy (linear), instead of every doc gaining
  N-1 spurious near-twins (quadratic in the data, which would measure the
  corpus, not the operator). n_chars is recomputed to stay consistent.
- embeddings: replica i is GLOBALLY ROTATED by theta_i = i*golden-angle
  (~137.508deg; block-diagonal 2x2 rotations over the 32 coordinate
  planes).
  A rotation is an isometry, so every intra-replica pairwise cosine —
  and therefore the per-replica near-dup/top-k structure — is preserved
  EXACTLY, while any cross-replica pair (x, R_j R_i^-1 x') sits at
  angle (|i-j|*theta mod 360): the irrational step never repeats a
  rotation (ADVICE r7: the old 12deg step wrapped at |i-j|=30,
  reintroducing cross-replica exact duplicates at factor >= 31), and
  main() asserts the realized minimum cross-replica angle stays above
  acos(0.99), so the 0.99-threshold embedding entries gain ZERO
  cross-replica pairs at any accepted factor. (VERDICT r6 ask #5: the
  before-that rule added i*1e-3 to element 0, which left every vector a
  ~0.9999996-cosine near-dup of its own replicas — 470x more qualifying
  pairs at sf1.0, so the probe measured output volume, not the plan.)

Output: .scratch/sf{N/10}/TABLE.parquet next to the repo. Never touches
/root/testdata. Usage: python tools/make_sf.py [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SRC = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")

# key column -> per-replica offset (all ≡ 0 mod 100; big enough that no
# replica's key range — including MODIFIED_*_SQL's +10M insert shift on
# orderkeys — can collide with the next replica's)
OFFSETS = {
    "c_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 1_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

FIXED_DIMS = ("region", "nation")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Per-replica rotation step: the GOLDEN ANGLE, 360*(1-1/phi). Irrational
# multiple of 360, so no two replicas ever share a rotation (ADVICE r7:
# the old 12deg step wraps mod 360 — replica pairs with |i-j| == 30 got
# IDENTICAL rotations, silently reintroducing cross-replica exact
# duplicates at factor >= 31), and among irrational steps it maximizes
# the worst-case pairwise gap as the replica count grows (the classic
# phyllotaxis property): realized min cross-replica angle is 20.1deg at
# factor 10, 12.4deg at 20, dropping below acos(0.99) only at factor 30.
# Incommensurate does NOT mean well-separated for every factor (the
# three-distance theorem lets d*theta mod 360 creep toward 0 for large d),
# so main() ASSERTS the realized minimum cross-replica angle keeps
# cross-replica cosine below the 0.99 operating threshold and refuses
# factors beyond it — no silent quadratic blow-up at any factor.
import math as _math

THETA_DEG = 360.0 * (1.0 - 2.0 / (1.0 + _math.sqrt(5.0)))
MIN_CROSS_ANGLE_DEG = 8.2  # acos(0.99) = 8.11 deg, with margin


def min_cross_replica_angle_deg(factor: int) -> float:
    best = 360.0
    for d in range(1, factor):
        a = (d * THETA_DEG) % 360.0
        best = min(best, a, 360.0 - a)
    return best


def replicate(df, table: str, i: int):
    if i == 0:
        return df
    out = df
    for c in df.columns:
        if c in OFFSETS:
            out = out.withColumn(c, (F.col(c) + F.lit(i * OFFSETS[c])).cast(df.schema[c].dataType))
    if table == "documents":
        tag = F.lit(f"r{i}·")
        out = out.withColumn(
            "text",
            F.array_join(F.transform(F.split(F.col("text"), " "), lambda t: F.concat(tag, t)), " "),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        import math

        th = math.radians(THETA_DEG * i)
        c, s = F.lit(math.cos(th)), F.lit(math.sin(th))
        e = F.col("embedding")
        out = out.withColumn(
            "embedding",
            F.transform(
                e,
                # paired 2x2 rotation: even idx pairs with idx+1, odd with
                # idx-1 (element_at is 1-based); dim 64 = 32 full planes
                lambda x, idx: F.when(
                    idx % 2 == 0,
                    c * x - s * F.element_at(e, idx + 2),
                ).otherwise(
                    s * F.element_at(e, idx) + c * x
                ).cast("float"),
            ),
        )
    return out


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    topk_only = "--topk-embeddings" in sys.argv[2:]
    angle = min_cross_replica_angle_deg(factor)
    if angle < MIN_CROSS_ANGLE_DEG and not topk_only:
        raise SystemExit(
            f"factor={factor}: minimum cross-replica rotation angle "
            f"{angle:.2f}deg < {MIN_CROSS_ANGLE_DEG}deg — some replica pair "
            f"would sit above cosine 0.99 and the embedding probes would "
            f"measure spurious cross-replica near-dups. Use a smaller factor, "
            f"or pass --topk-embeddings if (and only if) the replica will "
            f"feed TOP-K probes: top-k work profiles tolerate the bounded "
            f"per-vector twin count (quantified in the marker this writes), "
            f"but threshold-pair entries (embedding_neardup_lsh, semdedup) "
            f"would measure the twins, not the operator.")
    dest_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", f"sf{factor / 10:g}",
    )
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    os.makedirs(dest_root, exist_ok=True)
    if angle < MIN_CROSS_ANGLE_DEG:
        # --topk-embeddings accepted: stamp the replica with exactly what
        # the weakened guarantee costs, so no later probe can read this
        # dir as near-dup-clean. Same-base cross-replica cosine at
        # distance d is exactly cos(d*THETA) (the 2x2-plane rotations act
        # identically on every plane), so the qualifying-pair census is
        # closed-form — no corpus scan needed.
        import json as _json

        near_d = [d for d in range(1, factor)
                  if min((d * THETA_DEG) % 360.0,
                         360.0 - (d * THETA_DEG) % 360.0) < 8.11]
        pairs_per_base = sum(factor - d for d in near_d)
        with open(os.path.join(dest_root, "EMBEDDINGS_TOPK_ONLY.json"), "w") as f:
            _json.dump({
                "factor": factor,
                "min_cross_replica_angle_deg": round(angle, 3),
                "near_twin_d": near_d,
                "same_base_pairs_above_cos099_per_base_vector": pairs_per_base,
                "avg_twins_per_vector": round(2 * pairs_per_base / factor, 2),
                "valid_for": "top-k probes (ann_topk_lsh/ivf, cosine_topk):"
                             " bounded extra candidates per query",
                "invalid_for": "threshold-pair entries (embedding_neardup_"
                               "lsh, semdedup, cosine_pairs_lsh): twin"
                               " pairs would dominate the pair count",
            }, f, indent=1)
        print(f"embeddings marker: {len(near_d)} near-twin distances, "
              f"~{2 * pairs_per_base / factor:.1f} twins/vector")
    for t in TABLES:
        dest = os.path.join(dest_root, f"{t}.parquet")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            print(f"{t}: exists, skipped")
            continue
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in FIXED_DIMS:
            big = base
        else:
            big = None
            for i in range(factor):
                rep = replicate(base, t, i)
                big = rep if big is None else big.unionAll(rep)
        nparts = 1 if t in FIXED_DIMS else 64
        big.repartition(nparts).write.mode("overwrite").parquet(dest)
        print(f"{t}: {spark.read.parquet(dest).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
