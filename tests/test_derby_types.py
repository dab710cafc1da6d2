"""LIVE per-type matrix against embedded Derby over real JDBC — the
reference's flagship test (test_database_types.py:47-370: per-adapter
type lists x adversarial values, zero-diff + rows_downloaded == 0),
EXECUTED against a second engine rather than golden-pinned.

Complements tests/test_cross_engine_types.py (DuckDB matrix): Derby's
checksum SQL runs through CREATE-FUNCTION-registered Java (remote.py:
DERBY_SETUP_SQL) and the quirky CHAR/TRIM normalization casts, so every
type category here proves the whole dialect chain — write over JDBC,
digest remotely, compare bit-level — on a genuinely different SQL engine.

Derby's one documented normalization deviation (varchar->decimal cast
TRUNCATES where Spark rounds HALF_UP) is pinned as a deviation test, not
hidden: a double whose 7th fractional digit rounds up MUST surface as a
false diff.
"""

import datetime
import decimal

import pytest
from pyspark.sql import Row

from data_diff_spark import table_segment
from data_diff_spark.operators.remote import (
    DerbyDialect, JdbcSide, derby_setup, hash_diff_remote, jdbc_probe_types,
)

TS = datetime.datetime
D = datetime.date

# Doubles chosen so digits beyond the 6-digit canonical precision round
# DOWN (digit 7 < 5): there Spark's HALF_UP and Derby's truncation agree.
# The round-up case is pinned separately as the documented deviation.
SAFE_DOUBLES = [0.0, -1.0, 1.5, 0.25, 1.0 / 3.0, 0.000001, -0.000001,
                2.0 ** 31, 0.1234561, None]

CATEGORIES = [
    # (name, spark type, create-table override or None, values)
    ("bigint", "bigint", None, [0, 1, -1, 2 ** 62, -(2 ** 62), 42, None]),
    ("integer", "int", None, [0, 1, -1, 2 ** 31 - 1, -(2 ** 31) + 1, None]),
    ("double", "double", None, SAFE_DOUBLES),
    ("decimal", "decimal(20,6)", None,
     ["0.000001", "-1.5", "123456789.987654", "0", None]),
    ("timestamp", "timestamp", None,
     [TS(2024, 1, 1), TS(2024, 6, 15, 12, 34, 56, 123456),
      TS(1999, 12, 31, 23, 59, 59, 999999), TS(1970, 1, 1), None]),
    ("date", "date", None,
     [D(2024, 1, 1), D(1999, 12, 31), D(1970, 1, 1), D(2100, 2, 28), None]),
    ("boolean", "boolean", None, [True, False, None]),
    # Spark's Derby JDBC dialect binds StringType as CLOB (setNull(CLOB)
    # cannot target a VARCHAR column), so VARCHAR columns are only
    # writable when the column is non-null; the nullable string case IS
    # the CLOB category.
    ("varchar", "string", "v VARCHAR(128)",
     ["a", " b ", "héllo \N{GRINNING FACE}", "line\nbreak",
      "d8e8fca2-dc0f-4db5-9b37-8f2f1f0a4653"]),
    ("clob", "string", None,  # Spark's default StringType mapping
     ["plain", "x" * 500, "héllo \N{GRINNING FACE}", "tab\tline\nbreak", None]),
]


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby_types") / "typesdb"
    return f"jdbc:derby:{db};create=true"


def _write_side(spark, derby_url, table, sparktype, override, values):
    pyvals = [
        decimal.Decimal(v) if sparktype.startswith("decimal") and v is not None else v
        for v in values
    ]
    df = spark.createDataFrame(
        [Row(id=i, v=v) for i, v in enumerate(pyvals)],
        f"id bigint, v {sparktype}",
    )
    w = (df.write.format("jdbc").option("url", derby_url)
         .option("dbtable", table)
         .option("driver", "org.apache.derby.jdbc.EmbeddedDriver"))
    if override:
        w = w.option("createTableColumnTypes", override)
    w.mode("overwrite").save()
    return df


def _side(spark, derby_url, table, counter=None):
    types = jdbc_probe_types(spark, derby_url, table)
    qtypes = {f'"{k}"': v for k, v in types.items()}
    side = JdbcSide(
        spark, derby_url, table, ['"id"'], ['"id"', '"v"'], qtypes,
        dialect=DerbyDialect(),
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    if counter is not None:
        inner = side._reader

        def counting(sql):
            counter.append(sql)
            return inner(sql)

        side._reader = counting
    return side


@pytest.mark.parametrize(
    "name,sparktype,override,values", CATEGORIES, ids=[c[0] for c in CATEGORIES]
)
def test_derby_zero_diff_zero_download(spark, derby_url, name, sparktype,
                                       override, values):
    derby_setup(spark, derby_url)
    df = _write_side(spark, derby_url, f"t_{name}", sparktype, override, values)
    t1 = table_segment(df, ["id"], extra_columns=["v"])
    queries = []
    side = _side(spark, derby_url, f"t_{name}", counter=queries)
    diff = hash_diff_remote(t1, side, n_buckets=16)
    assert diff.count() == 0
    assert len(queries) == 1  # the digest aggregation; zero rows downloaded


@pytest.mark.parametrize("name,mutate,target", [
    ("bigint", 'update t_bigint set "v" = 999 where "id" = 1', 1),
    ("timestamp",
     "update t_timestamp set \"v\" = timestamp('2024-06-15 12:34:56.123457') "
     'where "id" = 1', 1),
    ("varchar", 'update t_varchar set "v" = \'a \' where "id" = 0', 0),
    # CLOB fetch path: the dialect must cast CLOB->VARCHAR in the phase-2
    # row fetch (Derby's getString raises 22005 on raw CLOB)
    ("clob", 'update t_clob set "v" = \'plainx\' where "id" = 0', 0),
])
def test_derby_single_mutation_isolated(spark, derby_url, name, mutate, target):
    """Flip ONE Derby-side value through a direct JDBC statement: exactly
    that key surfaces as a -/+ pair. (Re-writes the table first so the
    matrix tests stay order-independent.)"""
    derby_setup(spark, derby_url)
    cat = next(c for c in CATEGORIES if c[0] == name)
    df = _write_side(spark, derby_url, f"t_{name}", cat[1], cat[2], cat[3])
    con = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    try:
        con.createStatement().execute(mutate)
    finally:
        con.close()
    t1 = table_segment(df, ["id"], extra_columns=["v"])
    rows = hash_diff_remote(t1, _side(spark, derby_url, f"t_{name}"),
                            n_buckets=16).collect()
    assert sorted(r["sign"] for r in rows) == ["+", "-"]
    assert {r["id"] for r in rows} == {target}


def test_derby_double_truncation_deviation_pinned(spark, derby_url):
    """The documented deviation, pinned so it can't silently widen: pi's
    7th fractional digit rounds UP, so Spark canonicalizes 3.141593 while
    Derby truncates to 3.141592 — the checksum mismatch surfaces as a
    false diff on exactly that row (never a missed one)."""
    derby_setup(spark, derby_url)
    vals = [1.5, 3.141592653589793, 0.25]
    df = _write_side(spark, derby_url, "t_dev", "double", None, vals)
    t1 = table_segment(df, ["id"], extra_columns=["v"])
    rows = hash_diff_remote(t1, _side(spark, derby_url, "t_dev"),
                            n_buckets=16).collect()
    assert {r["id"] for r in rows} == {1}
    assert sorted(r["sign"] for r in rows) == ["+", "-"]
