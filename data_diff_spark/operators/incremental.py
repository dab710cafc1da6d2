"""Incremental aggregate maintenance: refresh a rollup from a diff.

The payoff of owning a diff engine at 100 TB: when 0.1% of a table
changed, its downstream GROUP BY rollups should NOT be recomputed by
rescanning 100 TB — the diff already names every changed row, and for
the distributive aggregates (count, sum — avg derives) the new rollup is
the old rollup plus each group's delta:

    delta(g) = Σ (+rows of g) − Σ (−rows of g)

This is classic incremental view maintenance (delta processing) on top
of diff_tables/snapshot/versioned output: '-' rows carry the OLD version
of updated rows, '+' rows the new, so the pair's net contribution is
exactly the update's effect.

Scale shape: one map-combined aggregation over the DIFF (small), one
outer join against the old rollup on the group keys — broadcast-eligible
when the delta touches few groups, which is the whole point. Groups
whose count reaches zero are dropped; brand-new groups appear.

Exactness: sums go through decimal(38,6) so the refreshed rollup is
BIT-IDENTICAL to a from-scratch recompute (floating-point += would
drift per refresh cycle); cast back to the original column type at the
end. min/max are NOT maintainable from deltas alone (a deleted extremum
needs a rescan of its group) — callers needing them refresh those
groups' rows explicitly; this module refuses rather than approximates.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGN_COL = "sign"
_DEC = "decimal(38,6)"


def aggregate_table(
    df: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n",
) -> DataFrame:
    """The from-scratch rollup this module maintains: per group, a row
    count and exact decimal sums. `sums` maps output name -> source
    column."""
    keys = list(keys)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[
            F.sum(F.col(src).cast(_DEC)).alias(out)
            for out, src in sums.items()
        ],
    )


def refresh_aggregate(
    agg: DataFrame,
    diff: DataFrame,
    keys: Sequence[str],
    sums: Mapping[str, str],
    count_col: str = "n",
) -> DataFrame:
    """old rollup + diff -> new rollup, bit-identical to recomputing
    aggregate_table over the patched base table. `diff` is diff_tables
    output: sign ('-'/'+') + base columns."""
    keys = list(keys)
    plus = (F.col(SIGN_COL) == "+").cast("int")
    pm = plus * 2 - 1  # +1 / -1
    delta = diff.groupBy(*keys).agg(
        F.sum(pm).alias("__dn"),
        *[
            F.sum(F.col(src).cast(_DEC) * pm).alias(f"__d_{out}")
            for out, src in sums.items()
        ],
    )
    on = None
    for k in keys:
        c = F.col(f"a.{k}").eqNullSafe(F.col(f"d.{k}"))
        on = c if on is None else on & c
    j = agg.alias("a").join(delta.alias("d"), on, "full_outer")
    new_n = F.coalesce(F.col(f"a.{count_col}"), F.lit(0)) + F.coalesce(
        F.col("d.__dn"), F.lit(0)
    )
    out_keys = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    out_sums = [
        (
            F.coalesce(F.col(f"a.{out}"), F.lit(0).cast(_DEC))
            + F.coalesce(F.col(f"__d_{out}"), F.lit(0).cast(_DEC))
        ).alias(out)
        for out in sums
    ]
    return (
        j.select(*out_keys, new_n.alias(count_col), *out_sums)
        .filter(F.col(count_col) > 0)  # emptied groups disappear
    )
