"""URL extraction / canonicalization / domain keys (functions/web.py):
handcrafted cases, idempotence property, composition dedup."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_diff_spark.functions.web import (
    canonical_url,
    dedup_by_url,
    extract_urls,
    registered_domain,
    url_host,
)

CASES = [
    # raw -> canonical
    ("HTTP://Example.COM/Path", "http://example.com/Path"),      # scheme+host lowered, path kept
    ("https://example.com:443/a", "https://example.com/a"),       # default port
    ("http://example.com:80", "http://example.com"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),   # non-default kept
    ("https://example.com/", "https://example.com"),              # bare trailing slash
    ("https://example.com/a/", "https://example.com/a/"),         # path slash kept
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a?utm_source=x&q=1", "https://example.com/a?q=1"),
    ("https://example.com/a?q=1&fbclid=abc", "https://example.com/a?q=1"),
    ("https://example.com/a?gclid=1&utm_campaign=c", "https://example.com/a"),
    ("  https://example.com/a  ", "https://example.com/a"),       # trim
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    once = canonical_url("url")
    twice = canonical_url(once)
    bad = df.select(once.alias("a"), twice.alias("b")).filter("a <> b")
    assert bad.count() == 0


def test_url_host_and_registered_domain(spark):
    rows = [
        ("https://www.Example.co.uk/x", "www.example.co.uk", "example.co.uk"),
        ("http://a.b.example.com/x", "a.b.example.com", "example.com"),
        ("https://example.com", "example.com", "example.com"),
        ("https://localhost:8080/x", "localhost", "localhost"),
        ("not a url", "", ""),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "url string")
    got = df.select(
        url_host("url").alias("h"), registered_domain("url").alias("d")
    ).collect()
    assert [(r["h"], r["d"]) for r in got] == [(h, d) for _, h, d in rows]


def test_extract_urls(spark):
    df = spark.createDataFrame(
        [("see https://a.com/x and http://b.org, nothing else",), ("no links",)],
        "text string",
    )
    got = [r["u"] for r in df.select(extract_urls("text").alias("u")).collect()]
    assert got[0] == ["https://a.com/x", "http://b.org"]  # trailing ',' stripped
    assert got[1] == []


def test_dedup_by_url(spark):
    df = spark.createDataFrame(
        [
            ("https://example.com/a?utm_source=x", 1),
            ("HTTPS://EXAMPLE.com/a", 2),
            ("https://example.com/b", 3),
        ],
        "url string, score int",
    )
    out = dedup_by_url(df)
    assert out.count() == 2
    by_curl = {r["canonical_url"]: r["score"] for r in out.collect()}
    assert set(by_curl) == {"https://example.com/a", "https://example.com/b"}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60))
def test_canonical_never_errors_and_idempotent_fuzz(spark, hostile):
    """Arbitrary junk through canonical_url: no exception, and a second
    pass is a fixed point."""
    df = spark.createDataFrame([(f"https://Ex.com/{hostile}",), (hostile,)], "url string")
    rows = df.select(
        canonical_url("url").alias("a"), canonical_url(canonical_url("url")).alias("b")
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]
