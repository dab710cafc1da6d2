"""Schema refinement by sampling — UUID / JSON / alphanum detection in
string columns.

Spark re-expression of the reference's `_refine_coltypes`
(/root/reference/data_diff/databases/base.py:1113-1160): physical schemas
say "string", but a string column holding UUIDs should be compared trimmed
(String_UUID, database_types.py:211-234), one holding JSON documents should
be compared structurally, and one holding alphanumeric tokens is flagged
String_Alphanum (database_types.py:238-262 — in the reference this enables
base-66 key-space arithmetic; Spark range/hash-partitions strings natively,
so here the kind is detection parity: surfaced to the user and
comparison-neutral). The reference samples 64 rows and applies per-value
checks; we do exactly that — the sample is tiny and driver-side by design
(64 rows, like the reference), everything downstream stays distributed.
"""

from __future__ import annotations

import logging
import re
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

SAMPLE_ROWS = 64  # reference base.py:1120

UUID_RE = re.compile(
    r"^\s*[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\s*$"
)
JSON_RE = re.compile(r"^\s*[\[{].*[\]}]\s*$", re.DOTALL)
# the reference's base-66 alphanumeric alphabet (utils.py:122):
# space, dash, digits, uppercase, underscore, lowercase
ALPHANUM_RE = re.compile(r"^[ \-0-9A-Z_a-z]+$")


def refine_string_kinds(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    sample_rows: int = SAMPLE_ROWS,
) -> Dict[str, str]:
    """{column: 'uuid' | 'json' | 'alphanum'} for every string column whose
    sampled non-null values all match the kind's pattern. Columns with no
    non-null sample values are left unrefined; mixed UUID/non-UUID columns
    warn and disable UUID handling (reference base.py:1136-1140)."""
    string_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
        and (columns is None or f.name in columns)
    ]
    if not string_cols:
        return {}
    sample = df.select(*string_cols).limit(sample_rows).collect()
    kinds: Dict[str, str] = {}
    for c in string_cols:
        values = [row[c] for row in sample if row[c] is not None]
        if not values:
            continue
        n_uuid = sum(1 for v in values if UUID_RE.match(v))
        if n_uuid == len(values):
            kinds[c] = "uuid"
            continue
        if n_uuid:
            logger.warning(
                "Mixed UUID/Non-UUID values detected in column %r, "
                "disabling UUID support.", c)
            continue
        if all(JSON_RE.match(v) for v in values):
            kinds[c] = "json"
        elif all(ALPHANUM_RE.match(v) for v in values):
            # UUIDs match ALPHANUM_RE too — order matters (reference
            # checks uuid first, base.py:1137-1152)
            kinds[c] = "alphanum"
    return kinds


def refined(segment):
    """TableSegment with sampled kind refinement applied to its compared
    string columns."""
    kinds = refine_string_kinds(segment.df, segment.relevant_columns)
    return segment.with_(kind_overrides=kinds) if kinds else segment
