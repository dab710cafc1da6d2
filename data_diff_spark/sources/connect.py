"""URI → TableSegment connect layer.

The reference registers 13 database adapters by URI scheme
(/root/reference/data_diff/databases/_connect.py:79-93). For a Spark engine
the adapters collapse to Spark data sources; we keep the same API shape —
one registry, scheme-dispatched — so `connect_to_table(uri, keys)` feels the
same as the reference's `connect_to_table`.

Supported schemes:
    parquet://<path>         files readable by spark.read.parquet
    csv://<path>             header=true, inferSchema
    json://<path>
    orc://<path>
    delta://<path>[@vN]      gated: needs delta-lake jars on the cluster
    versioned://<root>[@vN]  commit-log parquet table (sources/versioned.py)
    table://<catalog.tbl>    any table registered in the Spark catalog
    duckdb://<db>#<rel>      driver-guarded DuckDB reader (small tables;
                             big ones: operators/remote.py digests)
    sqlite://<db>#<rel>      driver-guarded stdlib-sqlite3 reader (same
                             contract; digest path = SQLiteSide)
    jdbc:<subprotocol>://…   pushed-down JDBC read (Postgres/MySQL/… —
                             the reference's remote-DB adapters)
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_diff_spark.table import TableSegment, table_segment

Reader = Callable[[SparkSession, str, dict], DataFrame]


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Schema-adaptive timestamp ingestion for the driver's events table.

    The testdata generator has shipped `ts` two ways across rounds:
    TIMESTAMP(NANOS) (which Spark only reads via
    spark.sql.legacy.parquet.nanosAsLong=true, surfacing a long of epoch
    nanos) and plain timestamp[us] (surfacing TIMESTAMP_NTZ). Adapt to
    whichever we got instead of hard-coding one: longs are truncated
    ns -> us with integer division (ns values exceed 2^53, float division
    would lose microseconds); TIMESTAMP_NTZ is cast to TIMESTAMP (sessions
    pin spark.sql.session.timeZone=UTC, so the cast is value-identical and
    keeps watermarks legal — Spark requires TIMESTAMP event time). DuckDB
    reads the same file to the same µs values, so the oracle sides stay
    bit-identical either way.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df

_REGISTRY: Dict[str, Reader] = {}


def register_scheme(scheme: str) -> Callable[[Reader], Reader]:
    def deco(fn: Reader) -> Reader:
        _REGISTRY[scheme] = fn
        return fn
    return deco


@register_scheme("parquet")
def _read_parquet(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    return spark.read.options(**opts).parquet(rest)


@register_scheme("csv")
def _read_csv(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    o = {"header": "true", "inferSchema": "true", **opts}
    return spark.read.options(**o).csv(rest)


@register_scheme("json")
def _read_json(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    return spark.read.options(**opts).json(rest)


@register_scheme("arrowshards")
def _read_arrowshards(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    """arrowshards://<dir> — a training-export Arrow IPC shard directory
    (sources/export.py) read back as a source: exported corpora are
    diffable/cleanable inputs again, not a write-only terminal."""
    from data_diff_spark.sources.export import read_arrow_shards

    return read_arrow_shards(spark, rest)


@register_scheme("webdataset")
def _read_webdataset(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    """webdataset://<dir> — WebDataset tar shards read back; options:
    key_col (default 'key'), extensions (col->ext mapping, required),
    text_cols (iterable of columns to utf-8 decode)."""
    from data_diff_spark.sources.export import read_webdataset

    exts = opts.get("extensions")
    if not exts:
        raise ValueError("webdataset source needs an 'extensions' col->ext mapping")
    return read_webdataset(
        spark, rest, opts.get("key_col", "key"), exts,
        text_cols=opts.get("text_cols"),
    )


@register_scheme("orc")
def _read_orc(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    return spark.read.options(**opts).orc(rest)


@register_scheme("delta")
def _read_delta(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    """delta://<path>[@vN]  — needs the delta-lake runtime on the cluster:
    io.delta:delta-spark_2.13:<spark-matching version> on the classpath plus
    spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension and
    spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog
    (e.g. spark-submit --packages io.delta:delta-spark_2.13:4.0.0). This
    sandbox ships no delta jars (and no network to fetch them), so the
    call raises with the requirement spelled out; versioned:// provides
    the same snapshot/time-travel diff story on plain parquet."""
    path, _, ver = rest.partition("@v")
    try:
        r = spark.read.options(**opts)
        if ver:
            r = r.option("versionAsOf", int(ver))
        return r.format("delta").load(path)
    except Exception as e:  # delta jars not on this cluster
        raise NotImplementedError(
            "delta:// needs delta-lake jars: add io.delta:delta-spark_2.13 "
            "via --packages and the DeltaSparkSessionExtension configs "
            "(none are baked into this environment); versioned:// offers "
            "version-to-version diffs on plain parquet"
        ) from e


@register_scheme("versioned")
def _read_versioned(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    """versioned://<root>[@vN] — commit-log parquet table (see
    sources/versioned.py); @vN time-travels, otherwise latest."""
    from data_diff_spark.sources import versioned as V

    path, _, ver = rest.partition("@v")
    return V.read_version(spark, path, int(ver) if ver else None)


@register_scheme("table")
def _read_table(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    return spark.table(rest)


# driver-side materialization guard for the duckdb:// scheme: above this,
# refuse and point at the digest path (operators/remote.py). Override per
# call with max_rows=N.
DUCKDB_MAX_ROWS = 5_000_000


@register_scheme("duckdb")
def _read_duckdb(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    """duckdb://<db-path>#<table-or-query>  (duckdb://#<query> for :memory:).

    The reference ships a DuckDB adapter (databases/duckdb.py); here the
    relation is materialized through Arrow on the driver — appropriate for
    small/reference-side tables ONLY, so relations above DUCKDB_MAX_ROWS
    (or the max_rows option) raise instead of silently flooding the driver.
    For digest-only cross-engine diffs of BIG DuckDB tables use
    operators/remote.py, which ships bucket digests instead of rows.
    """
    import duckdb

    db, _, rel = rest.partition("#")
    con = duckdb.connect(db) if db else duckdb.connect()
    rel = rel or opts.get("table", "")
    if not rel:
        raise ValueError("duckdb URI needs '#<table-or-query>'")
    q = rel if rel.lstrip().lower().startswith("select") else f"select * from {rel}"
    max_rows = int(opts.get("max_rows", DUCKDB_MAX_ROWS))
    n = con.execute(f"select count(*) from ({q}) t").fetchone()[0]
    if n > max_rows:
        raise ValueError(
            f"duckdb relation has {n} rows (> max_rows={max_rows}); the "
            "duckdb:// scheme materializes through the driver — use "
            "operators.remote.hash_diff_remote (digests-only) for big "
            "tables, or pass max_rows=N to override")
    tbl = con.execute(q).fetch_arrow_table()
    return spark.createDataFrame(tbl.to_pandas())


@register_scheme("sqlite")
def _read_sqlite(spark: SparkSession, rest: str, opts: dict) -> DataFrame:
    """sqlite://<db-path>#<table-or-query>  (sqlite://#<query> for :memory:).

    Stdlib sqlite3 — the third LIVE engine (operators/remote.py:
    SQLiteSide carries the digest-only cross-engine path; this scheme is
    the row-materializing reader for small/reference-side tables, with
    the same driver guard as duckdb://)."""
    import sqlite3

    db, _, rel = rest.partition("#")
    con = sqlite3.connect(db or ":memory:")
    rel = rel or opts.get("table", "")
    if not rel:
        raise ValueError("sqlite URI needs '#<table-or-query>'")
    q = rel if rel.lstrip().lower().startswith("select") else f"select * from {rel}"
    max_rows = int(opts.get("max_rows", DUCKDB_MAX_ROWS))
    n = con.execute(f"select count(*) from ({q}) t").fetchone()[0]
    if n > max_rows:
        raise ValueError(
            f"sqlite relation has {n} rows (> max_rows={max_rows}); the "
            "sqlite:// scheme materializes through the driver — use "
            "operators.remote.SQLiteSide + hash_diff_remote (digests-only) "
            "for big tables, or pass max_rows=N to override")
    cur = con.execute(q)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # tuples, not pandas: pandas coerces None -> NaN in float columns,
    # silently turning SQL NULLs into NaNs on the Spark side
    return spark.createDataFrame(rows, schema=names)


def _read_jdbc(spark: SparkSession, uri: str, opts: dict) -> DataFrame:
    # jdbc:postgresql://host/db?dbtable=schema.tbl — Spark pushes filters
    # and projections down to the remote database, which is how the
    # reference's remote adapters behave.
    if "dbtable" not in opts and "query" not in opts:
        raise ValueError("jdbc source needs a 'dbtable' or 'query' option")
    return spark.read.format("jdbc").option("url", uri).options(**opts).load()


def read_uri(spark: SparkSession, uri: str, **options) -> DataFrame:
    """Resolve a source URI to a DataFrame."""
    if uri.startswith("jdbc:"):
        return _read_jdbc(spark, uri, options)
    if "://" in uri:
        scheme, rest = uri.split("://", 1)
    else:
        scheme, rest = "table", uri  # bare name = catalog table
    reader = _REGISTRY.get(scheme)
    if reader is None:
        raise ValueError(f"unknown scheme {scheme!r}; known: {sorted(_REGISTRY)} + jdbc:")
    return reader(spark, rest, options)


def connect_to_table(
    spark: SparkSession,
    uri: str,
    key_columns: Sequence[str],
    update_column: Optional[str] = None,
    extra_columns: Optional[Sequence[str]] = None,
    where: Optional[str] = None,
    **options,
) -> TableSegment:
    """URI → TableSegment (reference connect_to_table, __init__.py:14-40)."""
    df = read_uri(spark, uri, **options)
    seg = table_segment(df, key_columns, update_column, extra_columns)
    return seg.with_(where=where) if where else seg


def morton_code(a, b, bits: int = 21) -> "F.Column":
    """Interleave the low `bits` bits of two non-negative integer columns
    into one Z-order key: bit i of `a` lands at position 2i, bit i of `b`
    at 2i+1. Pure integer Column expression (exact, cross-engine
    replayable); 21 bits per dimension keeps the key inside a signed
    int64. Values are masked to `bits` bits — pre-scale real columns into
    that range (rank, bucket, or truncate)."""
    a = (F.col(a) if isinstance(a, str) else a).cast("long")
    b = (F.col(b) if isinstance(b, str) else b).cast("long")
    # statically unrolled (shift amounts must be Python ints): 2*bits terms
    # of pure long arithmetic inside one codegen stage
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), i * 2)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * 2 + 1)
        )
    return out


def duckdb_morton_code(a: str, b: str, bits: int = 21) -> str:
    """DuckDB replica of morton_code (same bit interleave)."""
    return (
        f"list_sum(list_transform(generate_series(0, {bits - 1}, 1), i -> "
        f"((({a}::BIGINT >> i) & 1) << (i * 2)) + ((({b}::BIGINT >> i) & 1) << (i * 2 + 1))"
        f"))::BIGINT"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 21,
    num_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on two columns: rows are range-partitioned
    and sorted by their Morton key, so each output file covers a compact
    rectangle in (a, b) space and parquet min/max stats prune files for
    range predicates on EITHER column — the poor-engine's Delta OPTIMIZE
    ZORDER, with no table format required. One range-exchange + in-task
    sort; at 100 TB this is the standard layout pass before handing a
    table to ad-hoc analytics."""
    z = morton_code(col_a, col_b, bits).alias("__z")
    (
        df.select("*", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_sized(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    sample_rows: int = 10_000,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> int:
    """Write with file count chosen so each output file lands near
    `target_file_mb` — the layout knob that matters at 100 TB (thousands
    of 100 KB files starve scan parallelism setup; single 50 GB files
    can't parallelize a read). Bytes/row is measured, not guessed: a
    bounded deterministic sample is written once to a scratch sibling
    and its ENCODED size extrapolated (schema-based estimates miss
    compression by 10x on text). Returns the file count used.

    For multi-column range locality use zorder_write; for join locality
    write_bucketed. This is the plain "right-sized files" pass."""
    import math
    import shutil
    import tempfile

    n = df.count()
    if n == 0:
        df.write.mode(mode).format(fmt).save(path)
        return 1
    probe_dir = tempfile.mkdtemp(prefix="ddspark_sizer_")
    try:
        k = min(sample_rows, n)
        df.limit(k).coalesce(1).write.mode("overwrite").format(fmt).save(probe_dir)
        sampled = sum(
            os.path.getsize(os.path.join(probe_dir, f))
            for f in os.listdir(probe_dir)
            if not f.startswith(("_", "."))
        )
        bytes_per_row = max(sampled / k, 1e-6)
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)
    total = bytes_per_row * n
    files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df.repartition(files).write.mode(mode).format(fmt).save(path)
    return files


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and sorted) by the diff key so later
    diffs/joins on that key are ZERO-SHUFFLE: both sides' scans come up
    HashPartitioning(key, n) and sorted, so the full-outer sort-merge join
    needs neither an Exchange nor a Sort (verified by plan test). This is
    the Spark equivalent of the reference's assumption that both sides are
    physically indexed by PK — for a table diffed daily at 100 TB, paying
    one bucketed write amortizes the diff shuffle away entirely.

    Use with diff_tables(..., null_safe_keys=False): a null-safe join key
    is rewritten to (coalesce(k), isnull(k)) which can never match the
    bucket partitioning, re-introducing the shuffle."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def write_bloom(
    df,
    path: str,
    bloom_cols,
    ndv: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Parquet write with split-block bloom filters on the named columns
    (parquet-mr's `parquet.bloom.filter.enabled#col` options).

    The scale story: min/max stats (zorder_write's lever) prune RANGES;
    bloom filters prune POINT lookups on high-cardinality, unsorted
    columns — `key IN (...)` diff probes, id anti-joins, needle queries
    over 100 TB skip whole row groups that provably lack the key. ~1.2
    bytes/NDV of file overhead at the default 1% FPP; `ndv` should be
    the expected distinct count PER ROW GROUP (overshooting wastes
    bytes, undershooting inflates the false-positive rate, and a false
    positive only costs reading a row group that min/max failed to
    prune anyway).

    Spark's vectorized parquet reader consults the filters automatically
    for =/IN predicates; nothing changes on the read path."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
    w.parquet(path)


def bloom_filter_offsets(spark, file_path: str):
    """{column: bloom_filter_offset} for one parquet file via the JVM
    footer reader (-1 = no bloom filter); pyarrow does not expose this,
    the test harness and layout audits need it."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(file_path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(jpath, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        out = {}
        cols = reader.getFooter().getBlocks().get(0).getColumns()
        for i in range(cols.size()):
            cd = cols.get(i)
            out[cd.getPath().toDotString()] = cd.getBloomFilterOffset()
        return out
    finally:
        reader.close()
