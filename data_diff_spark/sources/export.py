"""Training-export shards: Arrow IPC and WebDataset tars, write AND read.

The last step of a training-data pipeline is not a table — it is a
directory of SHARDS a dataloader streams: Arrow IPC files (zero-copy
mmap for tabular/token data) or WebDataset tars (the de-facto format
for multimodal samples: one tar member per field, grouped by key —
public: Aizman et al., "High Performance I/O For Large Scale Deep
Learning"). Spark writes neither natively; both are a per-partition
file-writing pass.

Design: the writer is `mapInPandas` whose OUTPUT is the manifest — one
row per shard file (path, rows, bytes). The action that materializes
the manifest performs the writes; shard names are deterministic
(shard-{partition:05d}-{seq:04d}) so a retried task overwrites its own
files instead of duplicating them; each attempt writes to a PRIVATE
temp file (suffixed with the task attempt id, so concurrent speculative
attempts never share a tmp path) then atomically renames, closing the
torn-file window. Shard sizing is rows-per-shard
within each partition — repartition upstream to set the shard count's
order of magnitude; a partition's final shard may run short.

No shuffle, no driver involvement, no external deps (pyarrow ships with
Spark; tarfile is stdlib).

Read-back (read_arrow_shards / read_webdataset) closes the round trip:
exported corpora are first-class SOURCES again — inspectable, diffable,
re-cleanable — not a write-only terminal. Distribution unit is the shard
file (binaryFile rows decoded in mapInPandas), the same
one-file-one-task shape as WARC ingestion: shards are sized by the
writer (rows_per_shard), so tasks are bounded by construction. The Arrow
schema is probed from one shard's FOOTER on the driver — metadata-only,
no data rows driver-side.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

from pyspark.sql import DataFrame

MANIFEST_SCHEMA = "path string, rows long, bytes long"


def _shard_writer(out_dir: str, rows_per_shard: int, write_fn, prefix: str = "shard"):
    """mapInPandas body factory: chunk the partition's batches into
    shards, write each via write_fn(pdf, tmp_path), emit manifest rows.
    `prefix` qualifies shard names (streaming sinks pass a batch-id
    prefix so a replayed micro-batch rewrites its own files)."""
    return _multi_shard_writer([(out_dir, write_fn)], rows_per_shard, prefix)


def _multi_shard_writer(targets, rows_per_shard: int, prefix: str = "shard"):
    """Like _shard_writer, but each buffered shard is written to EVERY
    (out_dir, write_fn) target — one pass over the input produces all
    formats, instead of one scan (and one recomputation of the input
    pipeline) per format. Shard slicing and names are identical to the
    single-target writer, so per-format output bytes are unchanged."""
    import pandas as pd
    from pyspark import TaskContext

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # the tmp name must be private to THIS attempt: with speculative
        # execution two attempts of one partition run concurrently, and a
        # shared tmp path could publish interleaved bytes via os.replace
        attempt = ctx.taskAttemptId()
        seq = 0
        buf: list = []
        buffered = 0

        def flush():
            nonlocal seq, buf, buffered
            if not buffered:
                return []
            pdf = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            name = f"{prefix}-{pid:05d}-{seq:04d}"
            rows = []
            for out_dir, write_fn in targets:
                final = os.path.join(out_dir, name + write_fn.ext)
                tmp = f"{final}.{attempt}.tmp"
                write_fn(pdf, tmp)
                os.replace(tmp, final)
                rows.append({"path": final, "rows": len(pdf),
                             "bytes": os.path.getsize(final)})
            seq += 1
            buf, buffered = [], 0
            return rows

        manifest = []
        for pdf in batches:
            start = 0
            while start < len(pdf):
                take = min(rows_per_shard - buffered, len(pdf) - start)
                buf.append(pdf.iloc[start:start + take])
                buffered += take
                start += take
                if buffered >= rows_per_shard:
                    manifest.extend(flush())
        manifest.extend(flush())
        yield pd.DataFrame(manifest or [], columns=["path", "rows", "bytes"])

    return gen


def _arrow_write_fn():
    def write(pdf, p):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        table = pa.Table.from_pandas(pdf, preserve_index=False)
        with ipc.new_file(p, table.schema) as w:
            w.write_table(table)

    write.ext = ".arrow"
    return write


def write_arrow_shards(
    df: DataFrame, path: str, rows_per_shard: int = 100_000,
    shard_prefix: str = "shard",
) -> DataFrame:
    """Arrow IPC (Feather v2) shard files; returns the manifest
    DataFrame — materializing it performs the export."""
    os.makedirs(path, exist_ok=True)
    return df.mapInPandas(
        _shard_writer(path, rows_per_shard, _arrow_write_fn(), shard_prefix),
        MANIFEST_SCHEMA,
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    extensions: Dict[str, str],
    rows_per_shard: int = 10_000,
    shard_prefix: str = "shard",
) -> DataFrame:
    """WebDataset tar shards: each row becomes members
    '{key}.{ext}' per mapped column — binary columns raw, strings utf-8,
    everything else JSON. Returns the manifest DataFrame; materializing
    it performs the export. Keys must be unique per row (they are the
    sample identity inside the tar)."""
    os.makedirs(path, exist_ok=True)
    return df.mapInPandas(
        _shard_writer(path, rows_per_shard,
                      _webdataset_write_fn(key_col, extensions), shard_prefix),
        MANIFEST_SCHEMA,
    )


def _webdataset_write_fn(key_col: str, extensions: Dict[str, str]):
    exts = dict(extensions)

    def write(pdf, p):
        import io
        import json
        import tarfile

        with tarfile.open(p, "w") as tar:
            for _, row in pdf.iterrows():
                key = str(row[key_col])
                for col, ext in exts.items():
                    v = row[col]
                    if v is None:
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        data = bytes(v)
                    elif isinstance(v, str):
                        data = v.encode("utf-8")
                    else:
                        data = json.dumps(v, default=str).encode("utf-8")
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tar.addfile(info, io.BytesIO(data))

    write.ext = ".tar"
    return write


def write_arrow_and_webdataset(
    df: DataFrame,
    arrow_path: str,
    wds_path: str,
    key_col: str,
    extensions: Dict[str, str],
    rows_per_shard: int = 10_000,
    shard_prefix: str = "shard",
) -> DataFrame:
    """BOTH shard formats in ONE pass over `df`: each buffered shard is
    written as an Arrow IPC file and a WebDataset tar (identical slicing
    and bytes to the two single-format writers at the same
    rows_per_shard). One scan — and one evaluation of the input pipeline
    — instead of one per format. Returns the combined manifest."""
    for p in (arrow_path, wds_path):
        os.makedirs(p, exist_ok=True)
    return df.mapInPandas(
        _multi_shard_writer(
            [(arrow_path, _arrow_write_fn()),
             (wds_path, _webdataset_write_fn(key_col, extensions))],
            rows_per_shard, shard_prefix),
        MANIFEST_SCHEMA,
    )


# --- read-back sources ------------------------------------------------------


def read_arrow_shards(df_or_spark, path: str) -> DataFrame:
    """Arrow IPC shard directory -> DataFrame. One task per shard file;
    schema from the first shard's footer (driver reads metadata only)."""
    import glob as _glob

    import pyarrow.ipc as ipc

    spark = df_or_spark
    shards = sorted(_glob.glob(os.path.join(path, "*.arrow")))
    if not shards:
        raise FileNotFoundError(f"no *.arrow shards under {path}")
    # hard import: a zero-row pandas fallback cannot infer binary columns,
    # which is exactly what media exports carry — better a clear ImportError
    # on an API move than a silently broken fallback
    from pyspark.sql.pandas.types import from_arrow_schema

    schema = from_arrow_schema(ipc.open_file(shards[0]).schema)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        for pdf in batches:
            for content in pdf["content"]:
                yield ipc.open_file(io.BytesIO(content)).read_all().to_pandas()

    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.arrow"))
        .select("content")
    )
    return files.mapInPandas(_decode, schema)


def read_webdataset(
    spark,
    path: str,
    key_col: str,
    extensions: Dict[str, str],
    text_cols: Optional[set] = None,
) -> DataFrame:
    """WebDataset tar directory -> DataFrame: `key_col` (string, the member
    basename) plus one column per mapped extension — binary by default,
    utf-8-decoded for columns named in text_cols. Missing members are
    null (the writer skips null fields). One task per tar shard."""
    cols = list(extensions)
    text_cols = set(text_cols or ())
    by_ext = {ext: col for col, ext in extensions.items()}

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import tarfile

        import pandas as pd

        # member names are '{key}.{ext}' with no restriction on dots in the
        # key (the writer imposes none), so match against the KNOWN ext
        # suffixes instead of splitting at the first dot — 'img.001.txt'
        # is key 'img.001', not key 'img' with a dropped member
        suffixes = sorted(
            ((f".{ext}", col) for ext, col in by_ext.items()),
            key=lambda sc: -len(sc[0]),
        )
        for pdf in batches:
            rows: Dict[str, dict] = {}
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(content)) as tar:
                    for m in tar.getmembers():
                        for suf, col in suffixes:
                            if m.name.endswith(suf):
                                key = m.name[: -len(suf)]
                                break
                        else:
                            continue
                        data = tar.extractfile(m).read()
                        rows.setdefault(key, {})[col] = (
                            data.decode("utf-8") if col in text_cols else data
                        )
            out = [
                {key_col: k, **{c: v.get(c) for c in cols}}
                for k, v in rows.items()
            ]
            yield pd.DataFrame(out, columns=[key_col] + cols)

    fields = ", ".join(
        f"{c} {'string' if c in text_cols else 'binary'}" for c in cols
    )
    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.tar"))
        .select("content")
    )
    return files.mapInPandas(_decode, f"{key_col} string, {fields}")
