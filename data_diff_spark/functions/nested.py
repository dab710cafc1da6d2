"""Nested-schema utilities: flatten structs, explode arrays-of-structs.

The reference compares arrays/structs as opaque JSON strings (SURVEY
§1.3: normalize_array/Struct → to_json); an analytics engine also needs
the other direction — turning nested event/metadata payloads into flat
relational columns for joins, diffs, and feature tables.

flatten(df): every struct field becomes a top-level column with a
dotted-path name (a.b.c), recursively; arrays are LEFT ALONE by default
(flattening must not change row count) — pass explode=[...] to
explode_outer named array-of-struct columns first (row count multiplies
by array size; empty/null arrays keep one row with NULLs, so no data is
silently dropped). Pure projection + optional generate: no UDF, no
shuffle, fully codegen'd.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _leaf_paths(schema: T.StructType, prefix: str = "") -> List[str]:
    out = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out += _leaf_paths(f.dataType, prefix=f"{path}.")
        else:
            out.append(path)
    return out


def flatten(
    df: DataFrame,
    explode: Optional[Sequence[str]] = None,
    sep: str = ".",
) -> DataFrame:
    """Flatten every struct column to dotted-path top-level columns;
    optionally explode_outer the named array columns first (outer: empty
    arrays survive as NULL rows). Column name collisions after renaming
    raise rather than silently shadow."""
    for arr in explode or []:
        df = df.withColumn(arr, F.explode_outer(F.col(arr)))
    cols = []
    names = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            for path in _leaf_paths(f.dataType, prefix=f"{f.name}."):
                names.append(path.replace(".", sep))
                cols.append(F.col(path).alias(path.replace(".", sep)))
        else:
            names.append(f.name)
            cols.append(F.col(f.name))
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"flatten: name collisions {sorted(dupes)}; use a different sep")
    return df.select(*cols)
