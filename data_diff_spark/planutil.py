"""Optimizer-fence utilities shared by operators and the workload.

One documented implementation of the CollapseProject barrier instead of
inline copies scattered through the codebase (the round-4 review's ask):
the trick is subtle and version-fragile, so it lives here with its
contract spelled out and its effects pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BARRIER_COL = "__ddspark_barrier"


def project_barrier(df: DataFrame) -> DataFrame:
    """Prevent CollapseProject from folding projections ABOVE this point
    into the ones BELOW it, so multiply-referenced non-cheap expressions
    (token-hash arrays, n-gram slices) are materialized once per row
    instead of being re-inlined into every downstream reference.

    Mechanism: append-then-drop a non-deterministic dummy column
    (``uuid()``). Catalyst's CollapseProject refuses to merge a Project
    across a non-deterministic expression, so the projection boundary
    survives optimization. Measured effect during development:
    text_analysis 5.0s -> 1.3s at sf0.1 when the simhash/vector array
    stage stays separate from the 64-reference final select.

    Measured status on Spark 4.1.2 (round 5): CollapseProject's
    "non-cheap expression referenced more than once" rule ALREADY keeps
    these boundaries — removing the barrier does not change the expansion
    counts for either call site. The barrier stays as belt-and-braces
    for Spark versions whose cheapness heuristic differs; the actual
    guarantee is the plan pins in tests/test_plans.py (bounded
    md5/split-expansion counts for text_analysis and the LM n-gram
    explode), which fail on any Spark whose optimizer re-inlines the
    stages — with or without this fence.
    """
    return df.withColumn(_BARRIER_COL, F.expr("uuid()")).drop(_BARRIER_COL)


def explode_nonnull(df: DataFrame, cols, arr, alias: str) -> DataFrame:
    """select(*cols, explode(arr)) without the double-evaluation trap.

    A plain explode makes InferFiltersFromGenerate derive
    `size(arr) > 0 AND isnotnull(arr)`, and predicate pushdown
    substitutes the staged projections into that Filter on its way to
    the scan — the entire pipeline producing `arr` (tokenize, shingles,
    band codes) is inlined into the Filter condition and evaluated a
    SECOND time per input row; interpreted higher-order lambdas make the
    copy the expensive one. Measured: decontaminate's gram stream 3.1x
    at sf1.0 (10.5s -> 3.4s) from this change alone. explode_OUTER
    infers nothing; empty/null arrays emit one all-null row each,
    dropped by the isnotnull filter over the GENERATED attribute, which
    cannot push below the Generate.

    Contract: `arr`'s ELEMENTS must be non-null by construction
    (token/gram/code arrays are) — a legitimate null element would be
    dropped here, where plain explode would keep it.
    """
    return (
        df.select(*cols, F.explode_outer(arr).alias(alias))
        .filter(F.col(alias).isNotNull())
    )


def posexplode_nonnull(df: DataFrame, cols, arr, pos_alias: str,
                       alias: str) -> DataFrame:
    """posexplode twin of explode_nonnull (same trap, same contract);
    filters on the generated POSITION, so struct elements with nullable
    fields survive intact."""
    return (
        df.select(*cols, F.posexplode_outer(arr).alias(pos_alias, alias))
        .filter(F.col(pos_alias).isNotNull())
    )
