"""Sequence packing: assign documents to fixed token-budget training
sequences (the concat-then-chunk packing every LLM pre-training run does
before writing examples).

Semantics: within each shard, documents are concatenated in a
deterministic order (ascending id) into one token stream, and the stream
is chunked into consecutive `budget`-token sequences. Each document
reports the pack its FIRST token lands in and its offset there; a document
may straddle a pack boundary (exactly like real pretraining packing — the
writer splits it). This keeps the operator a pure window computation:

    cum       = sum(tokens) over (partition by shard order by id)
    pack_loc  = (cum - tokens) div budget      -- bucket of the start offset
    offset    = (cum - tokens) mod budget

Scale notes (100 TB):
  - The only shuffle is the window over `shard`; shards are assigned by a
    content hash of the id, so they are uniform regardless of id
    distribution, and n_shards bounds per-task sort size — size it so a
    shard's (id, tokens) pairs fit a task sort spill budget (pairs are
    ~16 bytes/doc; 2^20 docs/shard is nothing).
  - A single global stream (n_shards=1) is a one-task sort — only for
    tests. Real runs use many shards; each shard is an independent stream,
    which is also what keeps packing embarrassingly re-runnable per shard.
  - Token counting is the map-side cost; pass `tokens_col` if counts are
    precomputed (they should be, in a real pipeline).

The reference engine has no packing surface; this is a beyond-reference
operator for the training-pipeline story. Deterministic and integer-only,
so the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_diff_spark.functions.text import bpe_token_count, duckdb_bpe_token_count, duckdb_hash60, hash60

# Packs per shard are numbered locally; the global pack_id is
# shard * PACKS_PER_SHARD + pack_local. 2^40 packs/shard * budget tokens is
# beyond any corpus; the id stays well inside int64 for n_shards < 2^23.
PACKS_PER_SHARD = 1 << 40


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Optional[str] = None,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each document a (pack_id, pack_offset) under a fixed token
    budget. Returns the id, its token count, shard, global pack_id, and
    pack_offset (where the doc's first token lands inside its pack).
    Documents with zero tokens still land in a pack (zero-width)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = (
        F.col(tokens_col) if tokens_col else bpe_token_count(F.col(text_col))
    ).cast("long")
    shard = F.pmod(hash60(F.col(id_col).cast("string")), F.lit(n_shards))
    d = docs.select(
        F.col(id_col), toks.alias("n_tokens"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start")
    d = d.select(id_col, "n_tokens", "shard", start)
    return d.select(
        id_col,
        "n_tokens",
        "shard",
        (
            F.col("shard") * F.lit(PACKS_PER_SHARD)
            # exact integer floordiv (see temporal.bin_of: floor of a double
            # division can misbucket at exact boundaries)
            + (
                (F.col("__start") - F.pmod(F.col("__start"), F.lit(budget)))
                / F.lit(budget)
            ).cast("long")
        ).alias("pack_id"),
        F.pmod(F.col("__start"), F.lit(budget)).alias("pack_offset"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token windows: chunk i covers
    tokens [i*step, i*step + chunk_tokens) with step = chunk_tokens -
    overlap (the RAG/embedding-ingest chunking everybody runs). Map-side
    explode — zero shuffle; output rows carry the chunk's token count and
    the md5 of its joined text (not the text — at 100 TB the chunk stream
    is written straight to the sink, the digest is for dedup/lineage).
    Documents shorter than one step still yield their single partial chunk;
    empty documents yield none."""
    from data_diff_spark.functions.text import tokens

    if not (0 <= overlap < chunk_tokens):
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    d = docs.select(F.col(id_col), t.alias("__t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__t") - 1, F.lit(0)), F.lit(step)
    )
    d = d.withColumn("__start", F.explode(starts)).filter(
        F.col("__start") < F.size("__t")
    )
    chunk = F.slice("__t", F.col("__start") + 1, chunk_tokens)
    return d.select(
        id_col,
        (F.col("__start") / F.lit(step)).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def duckdb_chunk_documents(
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB replica of chunk_documents (1-based inclusive list slices ==
    Spark's slice(start, length) on the same bounds)."""
    from data_diff_spark.functions.text import duckdb_tokens

    step = chunk_tokens - overlap
    return f"""
with t as (select {id_col}, {duckdb_tokens(text_col)} as toks from {table}),
s as (
  select {id_col}, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), {step})) as start
  from t
)
select {id_col}, (start // {step})::BIGINT as chunk_idx,
       len(toks[start + 1 : start + {chunk_tokens}])::BIGINT as n_tokens,
       md5(array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ')) as chunk_md5
from s where start < len(toks)
"""


def duckdb_pack_sequences(
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 64,
    table: str = "documents",
) -> str:
    """DuckDB replica of pack_sequences() (same hash, same window)."""
    toks = duckdb_bpe_token_count(text_col)
    shard = f"{duckdb_hash60(f'{id_col}::VARCHAR')} % {n_shards}"
    return f"""
with d as (
  select {id_col}, {toks}::BIGINT as n_tokens, {shard} as shard from {table}
),
c as (
  -- window sum promotes to HUGEINT; pin everything back to BIGINT so the
  -- output types (and their string forms) match Spark's longs exactly
  select *, (sum(n_tokens) over (partition by shard order by {id_col}
             rows between unbounded preceding and current row) - n_tokens)::BIGINT as s
  from d
)
select {id_col}, n_tokens, shard::BIGINT as shard,
       (shard * {PACKS_PER_SHARD} + s // {budget})::BIGINT as pack_id,
       (s % {budget})::BIGINT as pack_offset
from c
"""
