"""WARC ingestion (sources/warc.py) + html_to_text (functions/web.py):
hand-built spec fixtures, plain and member-gzipped, end-to-end into the
text pipeline."""

import gzip

import pytest
from pyspark.sql import functions as F

from data_diff_spark.functions.web import html_to_text
from data_diff_spark.sources.warc import http_payload, parse_warc_bytes, read_warc

HTML = (b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><p>Hello &amp; welcome</p><script>var x=1;</script>"
        b"<div>to the <b>corpus</b></div><!-- note --></body></html>")


def _record(rid, rtype, uri, payload, extra=b""):
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid + b">\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        + (b"WARC-Target-URI: " + uri + b"\r\n" if uri else b"")
        + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n"
    )
    return hdr + payload + b"\r\n\r\n"


def _http_response(body):
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


def _warc_file():
    return (
        _record(b"1", b"warcinfo", b"", b"software: test\r\n")
        + _record(b"2", b"request", b"http://a.example/x", b"GET /x HTTP/1.1\r\n")
        + _record(b"3", b"response", b"http://a.example/x", _http_response(HTML))
        + _record(b"4", b"response", b"http://b.example/y",
                  _http_response(b"<p>Second&nbsp;doc</p>"))
    )


def test_parse_plain_and_gzip_members():
    raw = _warc_file()
    for data in (raw, b"".join(
        gzip.compress(_record(b"9", b"response", b"http://c.example/z",
                              _http_response(b"<i>z</i>")))
        for _ in range(1)
    ) + gzip.compress(raw)):
        recs = parse_warc_bytes(data)
        assert len(recs) >= 4 or data is not raw
    recs = parse_warc_bytes(raw)
    assert [r[1] for r in recs] == ["warcinfo", "request", "response", "response"]
    assert recs[2][2] == "http://a.example/x"
    assert http_payload(recs[2][5]) == HTML


def test_truncated_tail_stops_cleanly():
    raw = _warc_file() + b"GARBAGE NOT A RECORD"
    assert len(parse_warc_bytes(raw)) == 4


def test_read_warc_end_to_end(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(_warc_file())
    (d / "b.warc.gz").write_bytes(
        gzip.compress(_record(b"5", b"response", b"http://c.example/z",
                              _http_response(b"<h1>Third</h1> page")))
        + gzip.compress(_record(b"6", b"request", b"http://c.example/z", b"GET"))
    )
    df = read_warc(spark, str(d), warc_types=["response"])
    rows = {r.target_uri: r for r in df.collect()}
    assert set(rows) == {
        "http://a.example/x", "http://b.example/y", "http://c.example/z"
    }
    assert rows["http://a.example/x"].warc_type == "response"
    # into the text pipeline: strip HTTP envelope, decode, extract text
    texts = {
        r.target_uri: r.text
        for r in df.select(
            "target_uri",
            html_to_text(
                F.decode(F.udf(http_payload, "binary")("content"), "utf-8")
            ).alias("text"),
        ).collect()
    }
    assert texts["http://a.example/x"] == "T Hello & welcome to the corpus"
    assert texts["http://b.example/y"] == "Second doc"
    assert texts["http://c.example/z"] == "Third page"


def test_html_to_text_entities_and_blocks(spark):
    df = spark.createDataFrame(
        [("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>",),
         ("<script>bad()</script>ok<style>x{}</style>",),
         ("plain text already",)],
        "h string",
    )
    got = [r.t for r in df.select(html_to_text(F.col("h")).alias("t")).collect()]
    assert got == ['a <tag> "q" \'s\'', "ok", "plain text already"]
