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
