"""Streaming set-similarity join: incoming documents vs a static corpus.

The ingest-time question every dedup pipeline eventually needs answered
continuously: "is this arriving document a near-duplicate of anything we
already hold?" (streaming set-similarity join, cf. ICDE 2020 "Distributed
Streaming Set Similarity Join" — our hot-shingle cap plays the role of
their frequency-based filters). Spark-first shape:

  static side   shingle inverted index (shingle -> corpus doc, corpus set
                size), computed once and persisted — at 100 TB this is a
                bucketed table keyed by shingle;
  stream side   each micro-batch's docs explode to their shingles and
                stream-static EQUI-join the index; per (arriving doc,
                corpus doc) candidate the common-shingle count aggregates
                and exact Jaccard filters.

Only pairs sharing >= 1 surviving shingle are ever formed (with
threshold > 0 that is every qualifying pair). Viral shingles (document
frequency above `max_shingle_freq`) are removed from BOTH sides with the
same driver-collected literal set — map-side `array_except`, no extra
join — so the reported Jaccard is exact over the pruned shingle space,
the same contract as batch jaccard_pairs.

State: the per-pair aggregation holds (arriving doc x candidate) counts.
Bounded runs use complete mode (the equivalence test); production
attaches a watermark on the arrival timestamp so pair state evicts.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_diff_spark.operators.dedup import DEFAULT_MAX_SHINGLE_FREQ, shingle_sets
from data_diff_spark.planutil import explode_nonnull

# a "viral" set bigger than this will not broadcast sanely as a literal —
# raise instead of silently building a megabyte expression
_MAX_VIRAL_LITERAL = 100_000


def corpus_index(
    corpus: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: Optional[int] = DEFAULT_MAX_SHINGLE_FREQ,
) -> Tuple[DataFrame, List[str]]:
    """(persisted index[sh, ref_id, ref_sz], viral shingle list).

    The viral list is driver-collected (heavy hitters only — bounded by
    corpus vocabulary skew, guarded by _MAX_VIRAL_LITERAL) so both sides
    can prune map-side with the same literal set."""
    s = shingle_sets(corpus, n, text_col, id_col)
    ex = explode_nonnull(
        s, [F.col("id").alias("ref_id")], F.col("shingles"), "sh"
    )
    viral: List[str] = []
    if max_shingle_freq is not None:
        vdf = (
            ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_freq)
            .select("sh")
            .limit(_MAX_VIRAL_LITERAL + 1)
        )
        viral = [r["sh"] for r in vdf.collect()]
        if len(viral) > _MAX_VIRAL_LITERAL:
            raise ValueError(
                "corpus_index: viral-shingle set exceeds "
                f"{_MAX_VIRAL_LITERAL}; raise max_shingle_freq"
            )
    pruned = _pruned_shingles(s, viral)
    index = (
        explode_nonnull(
            pruned,
            [F.col("id").alias("ref_id"), F.size("shingles").alias("ref_sz")],
            F.col("shingles"), "sh",
        )
        .persist()
    )
    return index, viral


def _pruned_shingles(s: DataFrame, viral: List[str]) -> DataFrame:
    if not viral:
        return s
    lit = F.array(*[F.lit(v) for v in viral])
    return s.withColumn("shingles", F.array_except("shingles", lit))


def streaming_neardup_vs_corpus(
    stream: DataFrame,
    index: DataFrame,
    viral: List[str],
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, ref_id, jaccard >= threshold) for every arriving doc
    against the static corpus index. Works identically on a batch frame
    (the equivalence test runs both paths through this function)."""
    s = _pruned_shingles(shingle_sets(stream, n, text_col, id_col), viral)
    ex = explode_nonnull(
        s, ["id", F.size("shingles").alias("sz")], F.col("shingles"), "sh"
    )
    cand = ex.join(index, "sh")  # stream-static equi-join
    agg = cand.groupBy("id", "ref_id").agg(
        F.count(F.lit(1)).alias("inter"),
        F.max("sz").alias("sz"),
        F.max("ref_sz").alias("ref_sz"),
    )
    return (
        agg.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz") + F.col("ref_sz") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id").alias(id_col), "ref_id", "jaccard")
    )
