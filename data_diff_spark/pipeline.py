"""End-to-end corpus cleaning: the C4 / CCNet / Gopher recipe as one
composition of this repo's verified operators.

Every stage already exists, is individually oracle-checked or
reference-pinned, and is documented for 100 TB; what a user actually
runs is the CHAIN. `clean_corpus` wires it in the order the public
pipelines converged on (filter cheap-to-expensive, dedup before the
model-based filter so the LM never scores text dedup will discard):

  1. quality_filter      map-only keep/reject rules (tokens, quality
                         score, language) — functions/text.py
  2. exact_dedup         byte-identical collapse — operators/dedup.py
  3. near-dup resolve    MinHash-LSH pairs -> connected components ->
                         one canonical doc per cluster
  4. strip duplicate     substring-level dedup: remove cross-doc
     spans                duplicated passages — operators/spans.py
  5. decontaminate       n-gram overlap vs an eval benchmark
  6. redact_pii          email/SSN/phone regex pipeline
  7. perplexity filter   Stupid-Backoff LM scoring (optional: needs a
                         trained model) — functions/lm.py

Each stage is optional (None/False disables); the return is the cleaned
corpus plus a per-stage row-count audit. The audit costs one count()
action per enabled stage — pipelines at scale run it (the stage-yield
report is the first thing anyone asks for); pass audit=False to fuse
everything into the terminal action instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    min_quality: float = 0.3,
    allowed_langs: Optional[Sequence[str]] = None,
    near_dup_threshold: Optional[float] = 0.8,
    strip_spans_k: Optional[int] = None,
    benchmark: Optional[DataFrame] = None,
    decontaminate_n: int = 5,
    redact: bool = True,
    lm_model: Optional[Tuple[DataFrame, int]] = None,
    max_perplexity: Optional[float] = None,
    lm_n: int = 3,
    audit: bool = True,
) -> Tuple[DataFrame, Dict[str, int]]:
    """Run the cleaning chain; returns (cleaned_df, stage_counts).

    stage_counts maps stage name -> surviving row count (input first,
    stages in execution order); empty when audit=False. With audit on,
    the returned frame is left persisted (it was just materialized for
    its count — re-caching it would be waste); unpersist() when done."""
    from data_diff_spark.operators import dedup as DD
    from data_diff_spark.operators import spans as SP
    from data_diff_spark.functions import text as TX

    counts: Dict[str, int] = {}
    cached: List[DataFrame] = []

    def note(stage: str, frame: DataFrame) -> DataFrame:
        if audit:
            # persist before counting: without it each stage's count()
            # re-executes the entire upstream chain (quadratic in stages).
            # The previous stage's cache is dropped once this one is
            # materialized — at most two stage outputs live at once.
            frame = frame.persist()
            counts[stage] = frame.count()
            if cached:
                cached.pop().unpersist()
            cached.append(frame)
        return frame

    out = note("input", df)

    # 1. rule-based quality gate (map-only; cheapest first)
    out = note(
        "quality_filter",
        TX.quality_filter(
            out, text_col=text_col, min_tokens=min_tokens,
            min_quality=min_quality, allowed_langs=allowed_langs,
        ).filter("keep").drop("keep", "reject_reason"),
    )

    # 2. exact dedup: keep each text's canonical (minimum-id) copy
    canon = DD.exact_dedup(out, text_col=text_col, id_col=id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    out = note("exact_dedup", out.join(canon, id_col, "left_semi"))

    # 3. near-dup clustering: one survivor per LSH cluster
    if near_dup_threshold is not None:
        # audit mode already counted the surviving docs — reuse it as the
        # action-free corpus-size hint for the signature fold dispatch
        pairs = DD.minhash_lsh_dedup(
            out, threshold=near_dup_threshold, text_col=text_col,
            id_col=id_col, n_rows=counts.get("exact_dedup"),
        )
        # dedup_resolve covers EVERY doc (assign_clusters gives singletons
        # their own cluster), so the survivor set is the whole keep-list;
        # score passed explicitly so text_col != "text" works
        survivors = DD.dedup_resolve(
            out, pairs, id_col=id_col,
            score=TX.quality_score(F.col(text_col)),
        ).select(F.col("kept_id").alias(id_col))
        out = note("near_dup_resolve", out.join(survivors, id_col, "left_semi"))

    # 4. substring-level dedup: remove duplicated passages in place
    if strip_spans_k is not None:
        sp = SP.duplicate_spans(out, k=strip_spans_k, text_col=text_col, id_col=id_col)
        out = note(
            "strip_spans",
            SP.strip_duplicate_spans(out, sp, text_col=text_col, id_col=id_col),
        )

    # 5. benchmark decontamination: drop docs overlapping the eval set
    if benchmark is not None:
        hits = DD.decontaminate(
            out, benchmark, text_col=text_col, id_col=id_col, n=decontaminate_n
        ).select(id_col)
        out = note("decontaminate", out.join(hits, id_col, "left_anti"))

    # 6. PII redaction (in place, map-only)
    if redact:
        out = note(
            "redact_pii",
            out.withColumn(text_col, TX.redact_pii(F.col(text_col))),
        )

    # 7. model-based quality: CCNet perplexity ceiling
    if lm_model is not None and max_perplexity is not None:
        from data_diff_spark.functions.lm import perplexity_filter

        model, total = lm_model
        out = note(
            "perplexity_filter",
            perplexity_filter(
                out, model, total, max_perplexity,
                n=lm_n, text_col=text_col, id_col=id_col,
            ),
        )

    return out, counts
