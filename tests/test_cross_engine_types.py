"""Cross-ENGINE type matrix — the reference's flagship test shape
(test_database_types.py:517-783): write the SAME logical values into two
different engines (Spark-side parquet/DataFrame vs a live DuckDB), run
the digests-only cross-engine diff, and require (a) ZERO diff rows and
(b) ZERO phase-2 rows fetched from the remote (every bucket digest
matched — the `rows_downloaded == 0` assertion of the reference,
test_database_types.py:760-761). Then flip exactly one remote value and
require exactly that key to surface.

DuckDB stands in for the remote engine (the only live second engine in
this sandbox); the same DuckDBSide/JdbcSide contract carries the other
ten dialects."""

import datetime

import duckdb
import pytest
from pyspark.sql import Row

from data_diff_spark import table_segment
from data_diff_spark.operators.remote import DuckDBSide, hash_diff_remote

TS = datetime.datetime
D = datetime.date

ADVERSARIAL_NUMBERS = [
    0.0, -1.0, 3.141592653589793, 1.0 / 3.0, 0.000001, -0.000001,
    123456789.987654321, 2.0 ** 31, 1.5, None,
]

CATEGORIES = [
    # (name, duckdb type, spark type, values)
    ("bigint", "BIGINT", "bigint",
     [0, 1, -1, 2**62, -(2**62), 42, None]),
    ("integer", "INTEGER", "int",
     [0, 1, -1, 2**31 - 1, -(2**31) + 1, None]),
    ("double", "DOUBLE", "double", ADVERSARIAL_NUMBERS),
    ("decimal", "DECIMAL(20,6)", "decimal(20,6)",
     ["0.000001", "-1.5", "123456789.987654", "0", None]),
    ("timestamp", "TIMESTAMP", "timestamp",
     [TS(2024, 1, 1), TS(2024, 6, 15, 12, 34, 56, 123456),
      TS(1999, 12, 31, 23, 59, 59, 999999), TS(1970, 1, 1), None]),
    ("date", "DATE", "date",
     [D(2024, 1, 1), D(1999, 12, 31), D(1970, 1, 1), D(2100, 2, 28), None]),
    ("boolean", "BOOLEAN", "boolean", [True, False, None]),
    ("varchar", "VARCHAR", "string",
     ["a", " b ", "", "héllo \N{GRINNING FACE}", "line\nbreak",
      "d8e8fca2-dc0f-4db5-9b37-8f2f1f0a4653", None]),
]


def _sides(spark, ducktype, sparktype, values):
    import decimal as _dec

    con = duckdb.connect()
    con.execute(f"create table t (id bigint, v {ducktype})")
    con.executemany("insert into t values (?, ?)", list(enumerate(values)))
    pyvals = [
        _dec.Decimal(v) if sparktype.startswith("decimal") and v is not None else v
        for v in values
    ]
    df = spark.createDataFrame(
        [Row(id=i, v=v) for i, v in enumerate(pyvals)],
        f"id bigint, v {sparktype}",
    )
    return df, con


class _CountingSide(DuckDBSide):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.fetched_rows = 0

    def fetch_bucket_rows(self, spark, schema, n_buckets, bucket_ids):
        out = super().fetch_bucket_rows(spark, schema, n_buckets, bucket_ids)
        self.fetched_rows += out.count()
        return out


@pytest.mark.parametrize(
    "name,ducktype,sparktype,values", CATEGORIES, ids=[c[0] for c in CATEGORIES]
)
def test_cross_engine_zero_diff_zero_download(spark, name, ducktype, sparktype, values):
    df, con = _sides(spark, ducktype, sparktype, values)
    t1 = table_segment(df, ["id"], extra_columns=["v"])
    side = _CountingSide("t", ["id"], ["id", "v"], con=con)
    diff = hash_diff_remote(t1, side, n_buckets=64)
    assert diff.count() == 0
    assert side.fetched_rows == 0  # reference rows_downloaded == 0


@pytest.mark.parametrize(
    "name,ducktype,sparktype,values",
    [c for c in CATEGORIES if c[0] in ("bigint", "double", "timestamp", "varchar")],
    ids=["bigint", "double", "timestamp", "varchar"],
)
def test_cross_engine_single_mutation_isolated(spark, name, ducktype, sparktype, values):
    """Flip ONE remote value: exactly that key surfaces as a -/+ pair."""
    df, con = _sides(spark, ducktype, sparktype, values)
    mutate = {
        "bigint": "update t set v = 999 where id = 1",
        "double": "update t set v = v + 1 where id = 2",
        "timestamp": "update t set v = v + interval 1 second where id = 0",
        "varchar": "update t set v = v || 'x' where id = 0",
    }[name]
    con.execute(mutate)
    t1 = table_segment(df, ["id"], extra_columns=["v"])
    diff = hash_diff_remote(t1, DuckDBSide("t", ["id"], ["id", "v"], con=con), n_buckets=64)
    rows = diff.collect()
    target = {"bigint": 1, "double": 2, "timestamp": 0, "varchar": 0}[name]
    assert sorted(r["sign"] for r in rows) == ["+", "-"]
    assert {r["id"] for r in rows} == {target}
