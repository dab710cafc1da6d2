"""Cross-engine hashdiff: one side in Spark, the other in a remote SQL
engine that computes its own bucket digests.

This is the reference's core scenario — diff a table you can scan with
Spark against one that lives in PostgreSQL/Snowflake/DuckDB — re-expressed
for the bucketed algorithm (operators/hashdiff.py): the remote side never
ships rows for matching buckets; it runs ONE digest query

    SELECT bucket, count(*), sum(md5_as_int(fingerprint(normalized cols)))
    GROUP BY bucket

using the exact checksum formula of the reference's dialects (bit-identical
to our normalize.py — that equivalence is what the golden tests pin), and
ships only n_buckets digest rows plus the rows of mismatched buckets.

`RemoteSide` is the adapter contract (digest query + row download);
`DuckDBSide` implements it for DuckDB as the stand-in engine available in
this environment — a PostgresSide via JDBC follows the same two methods.

Scale notes: network transfer is O(n_buckets + differing rows), same as the
reference's checksum-then-download model; the Spark side stays fully
distributed. Bucket alignment uses a cross-engine-stable key hash
(md5-based, not xxhash64 — xxhash64 exists only in Spark).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_diff_spark.constants import CHECKSUM_OFFSET
from data_diff_spark.normalize import md5_as_int, normalized_columns, row_fingerprint
from data_diff_spark.operators.joindiff import SIGN_COL
from data_diff_spark.table import TableSegment

# Cross-engine bucket id: low 8 hex digits of md5 of the normalized key
# fingerprint, mod n_buckets. Computable in any engine with md5().
_BUCKET = "__bucket__"
_CKS = "__cks__"


def _spark_bucket(key_norm: List, n_buckets: int):
    joined = F.concat_ws("|", *[F.coalesce(c, F.lit("<null>")) for c in key_norm])
    return F.pmod(F.conv(F.substring(F.md5(joined), 1, 8), 16, 10).cast("long"), F.lit(n_buckets))


_DECIMAL_RE = re.compile(r"DECIMAL\s*\(\s*\d+\s*,\s*(\d+)\s*\)")


def _duckdb_norm_sql(col: str, duck_type: str) -> str:
    """DuckDB rendering of normalize.py's canonical strings (the reference's
    DuckDB dialect, databases/duckdb.py:105-116)."""
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        # Normalize at the column's OWN scale, exactly like the Spark side
        # (normalize.py normalize_as_string: DecimalType -> scale digits) and
        # the reference's duckdb.py normalize_number. A fixed scale here
        # (e.g. 6) renders DECIMAL(15,2) as '1234.500000' while Spark says
        # '1234.50' — every bucket digest would mismatch.
        m = _DECIMAL_RE.match(t)
        scale = int(m.group(1)) if m else 6
        return f"cast(cast({col} as decimal(38,{scale})) as varchar)"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return f"cast(cast({col} as decimal(38,6)) as varchar)"
    if "TIMESTAMP" in t:
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S.%f')"
    if t == "DATE":
        return f"strftime({col}, '%Y-%m-%d')"
    if t == "BOOLEAN":
        return f"cast(cast({col} as int) as varchar)"
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT", "UBIGINT", "UINTEGER"):
        return f"cast({col} as varchar)"
    return col  # VARCHAR


class DuckDBSide:
    """Remote adapter: a DuckDB relation (parquet path or table name) with
    declared key columns. Stands in for any reference dialect."""

    def __init__(self, relation_sql: str, key_columns: Sequence[str],
                 columns: Sequence[str], con=None):
        import duckdb

        self.relation_sql = relation_sql
        self.key_columns = list(key_columns)
        self.columns = list(columns)  # keys first, reference column order
        self.con = con or duckdb.connect()
        desc = self.con.execute(f"describe select * from {relation_sql}").fetchall()
        self.types = {r[0]: r[1] for r in desc}

    def _fingerprint_sql(self) -> str:
        parts = ", ".join(
            f"coalesce({_duckdb_norm_sql(c, self.types[c])}, '<null>')" for c in self.columns
        )
        return f"concat_ws('|', {parts})"

    def _cks_sql(self) -> str:
        return f"(('0x' || substring(md5({self._fingerprint_sql()}), 21, 12))::BIGINT - {CHECKSUM_OFFSET})"

    def _bucket_sql(self, n_buckets: int) -> str:
        key_parts = ", ".join(
            f"coalesce({_duckdb_norm_sql(k, self.types[k])}, '<null>')" for k in self.key_columns
        )
        key_fp = f"concat_ws('|', {key_parts})"
        return f"(('0x' || substring(md5({key_fp}), 1, 8))::BIGINT % {n_buckets})"

    def bucket_digests(self, n_buckets: int):
        """[(bucket, count, checksum_sum)] — ONE remote aggregation query."""
        q = f"""
        select {self._bucket_sql(n_buckets)} as bucket, count(*) as cnt,
               sum({self._cks_sql()})::BIGINT as cks
        from {self.relation_sql} group by 1
        """
        return self.con.execute(q).fetchall()

    def fetch_buckets(self, n_buckets: int, bucket_ids: Sequence[int]):
        """Rows (plus per-row checksum) of the given buckets — the only row
        download, proportional to differing data."""
        if not bucket_ids:
            import pandas as pd

            return pd.DataFrame(columns=self.columns + [_CKS, _BUCKET])
        ids = ", ".join(str(int(b)) for b in bucket_ids)
        q = f"""
        select {", ".join(self.columns)}, {self._cks_sql()} as {_CKS},
               {self._bucket_sql(n_buckets)} as {_BUCKET}
        from {self.relation_sql}
        where {self._bucket_sql(n_buckets)} in ({ids})
        """
        return self.con.execute(q).fetch_df()


def hash_diff_remote(
    t1: TableSegment,
    remote: DuckDBSide,
    n_buckets: int = 1024,
) -> DataFrame:
    """Diff a Spark-side segment against a remote-engine side.

    Phase 1: both engines independently compute (bucket, count, sum cks);
    only digests cross the wire. Phase 2: rows of mismatched buckets are
    fetched from the remote and diffed against the Spark rows of those
    buckets with the multiset-per-PK semantics of hashdiff phase 2.
    """
    spark = t1.df.sparkSession
    cols = list(t1.relevant_columns)
    keys = list(t1.key_columns)
    if len(cols) != len(remote.columns):
        raise ValueError(f"column arity mismatch: {cols} vs {remote.columns}")

    normd = normalized_columns(t1.schema, cols, t1.precision_overrides, t1.kind_overrides)
    key_norm = normalized_columns(t1.schema, cols[:len(keys)], t1.precision_overrides, t1.kind_overrides)
    a = (
        t1.make_select()
        .select(
            *cols,
            # long (not decimal): 49-bit values, and pandas/Arrow int64
            # round-trips exactly when remote rows are unioned in
            md5_as_int(row_fingerprint(normd)).cast("long").alias(_CKS),
            _spark_bucket(key_norm, n_buckets).alias(_BUCKET),
        )
        .persist()
    )

    local = {
        r[_BUCKET]: (r["cnt"], r["cks"])
        for r in a.groupBy(_BUCKET)
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(_CKS).cast("long").alias("cks"))
        .collect()
    }
    remote_digests = {int(b): (int(c), int(s) if s is not None else None)
                      for b, c, s in remote.bucket_digests(n_buckets)}

    bad = sorted(
        b for b in set(local) | set(remote_digests)
        if local.get(b) != remote_digests.get(b)
    )

    a_bad = a.filter(F.col(_BUCKET).isin([int(b) for b in bad]))
    b_pdf = remote.fetch_buckets(n_buckets, bad)
    # align remote column names to the Spark side's
    b_pdf = b_pdf.rename(columns=dict(zip(remote.columns, cols)))
    if len(b_pdf):
        # DuckDB's fetch_df renders DECIMAL as float64; Spark's DecimalType
        # rejects floats, so quantize back (driver-side, dirty rows only).
        from decimal import Decimal

        import pandas as pd
        from pyspark.sql import types as T

        for f in a.schema.fields:
            if isinstance(f.dataType, T.DecimalType) and f.name in b_pdf.columns:
                q = Decimal(1).scaleb(-f.dataType.scale)
                b_pdf[f.name] = b_pdf[f.name].map(
                    lambda v, q=q: None if pd.isna(v) else Decimal(str(v)).quantize(q)
                )
    b_df = spark.createDataFrame(b_pdf, schema=a.schema) if len(b_pdf) else spark.createDataFrame([], a.schema)

    from pyspark.sql import Window

    u = a_bad.withColumn(SIGN_COL, F.lit("-")).unionByName(
        b_df.withColumn(SIGN_COL, F.lit("+"))
    )
    # Partition the multiset windows by the NORMALIZED key strings — the same
    # canonical form the bucket digests hash. Raw-value partitioning would
    # split logically-equal keys (uuid kind_override trims, cross-side type
    # coercions) into separate windows and emit spurious -/+ pairs. Both
    # union legs share a.schema (b_df is coerced to it), so t1's
    # normalization applies to both.
    key_norm_u = normalized_columns(t1.schema, keys, t1.precision_overrides, t1.kind_overrides)
    w = Window.partitionBy(*[F.coalesce(c, F.lit("<null>")) for c in key_norm_u])
    is_a = (F.col(SIGN_COL) == "-").cast("long")
    ca = F.sum(is_a).over(w)
    cb = F.sum(1 - is_a).over(w)
    sa = F.sum(F.when(F.col(SIGN_COL) == "-", F.col(_CKS))).over(w)
    sb = F.sum(F.when(F.col(SIGN_COL) == "+", F.col(_CKS))).over(w)
    differs = (ca != cb) | ~sa.eqNullSafe(sb)
    out = u.withColumn("__emit__", differs).filter("__emit__").select(SIGN_COL, *cols)
    out._ddspark_persisted = [a]  # released via DiffResult.unpersist()
    return out
