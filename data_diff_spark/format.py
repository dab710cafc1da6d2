"""Typed machine-readable diff output.

Spark re-expression of the reference's JSON interface
(/root/reference/data_diff/format.py:38-120: jsonify / JsonDiffRowValue /
JsonExclusiveRowValue): one record per affected primary key with a status
and per-column old/new values as canonical strings.

Output schema:
    key:    array<string>            the PK values (normalized strings)
    status: string                   'added' | 'removed' | 'changed'
    values: map<string, struct<old: string, new: string>>

Stays a DataFrame — `df.toJSON()` yields the JSONL machine feed; nothing is
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_diff_spark.diff import DiffResult
from data_diff_spark.operators.joindiff import SIGN_COL


def jsonify(result: DiffResult) -> DataFrame:
    """Typed per-key diff records from a DiffResult.

    For duplicate-PK multisets (hashdiff's diff_sets semantics emits several
    rows per side) old/new carry the first row of each side ordered by the
    remaining columns — deterministic, and exact for the 99% case of unique
    PKs; counts are preserved in n_old/n_new.
    """
    df = result.df
    keys = list(result.table1.key_columns)
    value_cols = [c for c in df.columns if c != SIGN_COL and c not in keys]

    is_old = F.col(SIGN_COL) == "-"
    aggs = [
        F.sum(F.when(is_old, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(~is_old, 1).otherwise(0)).alias("n_new"),
    ]
    for c in value_cols:
        s = F.col(c).cast("string")
        aggs.append(F.min(F.when(is_old, s)).alias(f"__old_{c}"))
        aggs.append(F.min(F.when(~is_old, s)).alias(f"__new_{c}"))

    g = df.groupBy(*keys).agg(*aggs)
    status = (
        F.when(F.col("n_old") == 0, F.lit("added"))
        .when(F.col("n_new") == 0, F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    values = F.map_from_arrays(
        F.array(*[F.lit(c) for c in value_cols]),
        F.array(*[
            F.struct(
                F.col(f"__old_{c}").alias("old"), F.col(f"__new_{c}").alias("new")
            )
            for c in value_cols
        ]),
    )
    return g.select(
        F.array(*[F.col(k).cast("string") for k in keys]).alias("key"),
        status.alias("status"),
        "n_old",
        "n_new",
        values.alias("values"),
    )
