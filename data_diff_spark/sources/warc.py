"""WARC ingestion: read web-archive files into DataFrames.

Common Crawl — the substrate of every public web-scale training corpus —
ships as WARC (ISO 28500): a concatenation of records, each a header
block (WARC/1.0 + name:value lines) and a Content-Length-framed payload,
usually with each record individually gzipped and the members
concatenated into one .warc.gz file (the member boundaries are what make
per-record random access possible).

Spark-first shape: `spark.read.format("binaryFile")` distributes FILES;
record splitting + header parsing runs inside `mapInPandas` (Arrow
batches of file rows), so adding machines adds parsing throughput and no
custom Hadoop InputFormat is needed. One WARC file is one task — exactly
how Common Crawl is meant to be consumed (100k x ~1 GB files; the unit
of parallelism is the file). For files larger than executor memory,
re-shard upstream or use the gzip member stream (records decompress one
member at a time; the raw bytes of one FILE do transit memory once).

The parser is pure stdlib (zlib multi-member stream + byte framing), so
there is nothing to install; fixtures in tests are hand-built from the
spec, both plain and member-gzipped.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content binary"
)


def parse_warc_bytes(data: bytes) -> List[Tuple[str, str, str, str, str, bytes]]:
    """Split one WARC file's bytes into records:
    (record_id, warc_type, target_uri, warc_date, content_type, payload).

    Handles plain concatenated records AND per-record gzip members
    (detected by magic); tolerates trailing garbage by stopping at the
    first unparseable boundary."""
    import gzip
    import io
    import zlib

    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members -> one decompressed stream; record
        # framing below re-splits it (Content-Length framing survives)
        out = []
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        buf = data
        while buf:
            out.append(d.decompress(buf))
            buf = d.unused_data
            if buf:
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            else:
                break
        data = b"".join(out)

    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos:pos + 5].startswith(b"WARC/"):
            break  # trailing garbage / truncation: stop cleanly
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        payload = data[body_start:body_start + clen]
        records.append((
            headers.get("warc-record-id", ""),
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            headers.get("content-type", ""),
            payload,
        ))
        pos = body_start + clen
    return records


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: Optional[List[str]] = None,
) -> DataFrame:
    """DataFrame of WARC records from a path/glob of .warc / .warc.gz
    files. `warc_types` filters record kinds early (['response'] is the
    usual ask — request/metadata records never leave the parser)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    keep = list(warc_types) if warc_types is not None else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for rec in parse_warc_bytes(bytes(r["content"])):
                    if keep is not None and rec[1] not in keep:
                        continue
                    rows.append((r["path"], *rec))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_id", "warc_type", "target_uri",
                    "warc_date", "content_type", "content",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def http_payload(content: bytes) -> bytes:
    """Strip the HTTP response envelope a 'response' record's payload
    carries (status line + headers + CRLFCRLF) and return the body."""
    sep = content.find(b"\r\n\r\n")
    if content[:5] == b"HTTP/" and sep >= 0:
        return content[sep + 4:]
    return content
