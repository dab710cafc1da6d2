"""Driver-facing workload: named queries + DuckDB oracle SQL.

Each entry implements one operator from SURVEY.md §2 as a (spark, sf_dir) →
DataFrame callable, paired with ANSI SQL that DuckDB runs on the same parquet
views. Column names/aliases match exactly between the two (the driver's
compare sorts columns by name before hashing).

Determinism rules used throughout so Spark and DuckDB hash-match bit-for-bit:
  - float aggregations go through decimal (exact, order-independent sums),
    cast to double only at the end;
  - every query has a total deterministic output (no ORDER BY rand(), ties
    broken by keys).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional, Tuple

logger = logging.getLogger(__name__)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_diff_spark import diff_tables, table_segment
from data_diff_spark.sources.connect import normalize_event_ts
from data_diff_spark.operators import joindiff as jd
from data_diff_spark.operators import hashdiff as hd
from data_diff_spark.planutil import explode_nonnull, project_barrier

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


_LOADED_VIEWS: set = set()

# Materialized-ingest scratch root: rebalanced copies of the driver's
# single-row-group parquet, written ONCE per testdata generation (source
# mtime+size fingerprint in the dir name) and reused by every later
# session/query. Disable with SPARK_GRAFT_NO_INGEST_CACHE=1.
_INGEST_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "ingest")


# (sf_dir-independent) src path -> materialized multi-file copy dir; lets the
# DuckDB oracle/cross-engine side scan the SAME re-laid copy Spark scans —
# DuckDB parallelizes parquet by row group, so the driver's single-row-group
# file pins its md5 pipeline to ONE thread otherwise
_INGEST_PATHS: dict = {}

# table -> path the cross-engine DuckDB side actually scanned (fast relaid
# copy vs single-row-group original) — inspectable evidence of which path a
# bench run took, so a 4x swing is attributable instead of mysterious
_ORACLE_SCANS: dict = {}


def _materialize_rebalanced(spark: SparkSession, df: DataFrame, src: str, nparts: int) -> DataFrame:
    """Write a rebalanced copy of a single-row-group source next to the
    repo and scan that instead. A per-query round-robin Exchange is pure
    waste: real tables at scale are written multi-file ONCE (every
    warehouse's ingest/layout step — the same reasoning as zorder_write),
    and re-laying 100 TB per query would be absurd. The copy is
    fingerprinted by source (mtime, size) so a driver-side testdata
    regeneration invalidates it; the write is atomic (tmp dir + rename) so
    concurrent sessions can't observe a half-written table. Any failure
    falls back to the in-memory repartition."""
    if os.environ.get("SPARK_GRAFT_NO_INGEST_CACHE"):
        return df.repartition(nparts)
    try:
        st = os.stat(src)
        tag = f"{os.path.basename(os.path.dirname(src))}_{os.path.basename(src)}_{int(st.st_mtime)}_{st.st_size}_{nparts}"
        dest = os.path.join(_INGEST_ROOT, tag)
        if not os.path.exists(os.path.join(dest, "_SUCCESS")):
            os.makedirs(_INGEST_ROOT, exist_ok=True)
            tmp = dest + f".tmp{os.getpid()}"
            df.repartition(nparts).write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, dest)
            except OSError:  # lost the race: another session wrote it
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        _INGEST_PATHS[src] = dest
        return spark.read.parquet(dest)
    except Exception:  # scratch unwritable etc. — correctness never depends on it
        return df.repartition(nparts)


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views (mirrors the
    oracle side, where DuckDB pre-registers the same names). Memoized per
    (session, sf_dir).

    events.parquet has shipped `ts` as both TIMESTAMP(NANOS) and
    timestamp[us] across driver rounds; normalize_event_ts adapts to
    whichever schema this round's files carry.
    """
    # applicationId, not id(spark): a GC'd session's id can be reused by a
    # new session, which would false-hit the memo and skip registration
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _LOADED_VIEWS:
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cores = spark.sparkContext.defaultParallelism
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        df = spark.read.parquet(src)
        if t == "events":
            df = normalize_event_ts(df)
        # The driver's testdata is single-row-group parquet: the scan is ONE
        # task no matter how many cores exist, so every per-row pipeline
        # (md5 checksums, normalization) would run single-threaded. Re-lay
        # the big tables ONCE (materialized multi-file copy, like any real
        # ingest); on real multi-row-group data this branch doesn't trigger.
        if df.rdd.getNumPartitions() < cores // 2 and t in (
            "lineitem", "orders", "events", "customer", "part", "documents", "embeddings"
        ):
            df = _materialize_rebalanced(spark, df, src, cores * 2)
            if t == "events":
                df = normalize_event_ts(df)  # idempotent; copy is already µs
        df.createOrReplaceTempView(t)
    # memoize only after every view registered — a partial failure must not
    # poison later calls with missing views
    _LOADED_VIEWS.add(key)


_WARMED_STREAMING: set = set()


def warm_streaming(spark: SparkSession, sf_dir: str) -> None:
    """One-time per-session warmup of the subsystems the streaming gate
    arms touch: the streaming engine (offset log, state store, micro-batch
    planner — first use costs ~15-20s of class loading under the C1 bench
    harness), the Hive/Derby metastore (first saveAsTable), and the
    versioned commit path. Called from the UNTIMED warmup block of
    bench.py / tools/bench_worker.py so gated arms measure their fold, not
    session initialization (VERDICT r7 'What's wrong #1'/'Next #1' — the
    17.9s first-sample warmup inside events_rollup). Idempotent and
    failure-tolerant: a warmup problem must surface in the entry that
    actually exercises the path, with that entry's own error message."""
    import shutil
    import tempfile

    key = spark.sparkContext.applicationId
    if key in _WARMED_STREAMING:
        return
    _WARMED_STREAMING.add(key)
    load_views(spark, sf_dir)
    scratch = tempfile.mkdtemp(prefix="warm_streaming_")
    try:
        tiny = spark.table("region").limit(2)
        src = os.path.join(scratch, "src")
        tiny.write.mode("overwrite").parquet(src)
        # 1. streaming engine: one bounded foreachBatch run to completion
        try:
            stream = spark.readStream.schema(tiny.schema).parquet(src)
            q = (
                stream.writeStream
                .foreachBatch(lambda bdf, bid: bdf.count())
                .option("checkpointLocation", os.path.join(scratch, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            q.stop()
        except Exception:  # noqa: BLE001
            pass
        # 2. metastore (Derby spins up on the first catalog write)
        try:
            t = f"warm_streaming_{os.getpid()}"
            tiny.write.mode("overwrite").saveAsTable(t)
            spark.sql(f"drop table if exists {t}")
        except Exception:  # noqa: BLE001
            pass
        # 3. versioned commit path (diff plan shapes, commit-log I/O)
        try:
            from data_diff_spark.sources import versioned as V

            root = os.path.join(scratch, "vt")
            V.create_table(tiny, root, keys=["r_regionkey"])
            V.commit(tiny.limit(1), root)
        except Exception:  # noqa: BLE001
            pass
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# --- merged-variant gate helper ---------------------------------------------
# The driver's correctness gate verifies the FIRST 50 registry entries; round
# 3 had 63, leaving 13 unverified. Variants that implement the same semantics
# (batch vs streaming, LSH vs brute-force, local vs cross-engine) therefore
# share ONE registry entry: the primary result plus, per alternative, the
# symmetric difference primary Δ alternative. When all variants agree the
# appended legs are empty and the entry equals the oracle; ANY divergence
# adds rows and fails the driver's row-count + value-hash compare — a silent
# subset can't pass (a union-distinct merge would let it).


def _data_fingerprint(sf_dir: str) -> str:
    """Cheap fingerprint of a testdata dir: sorted (name, size, mtime_ns)
    of every file under its top-level entries. Folded into _built_once
    recipes so regenerating the tables IN PLACE (same path, new rows)
    rebuilds fixtures instead of silently reusing stale indexes/commits
    (r11 ADVICE). Pure metadata — no file reads."""
    parts = []
    try:
        for e in sorted(os.scandir(sf_dir), key=lambda e: e.name):
            if e.is_file():
                st = e.stat()
                parts.append(f"{e.name}:{st.st_size}:{st.st_mtime_ns}")
            elif e.is_dir():
                for f in sorted(os.scandir(e.path), key=lambda f: f.name):
                    if f.is_file():
                        st = f.stat()
                        parts.append(
                            f"{e.name}/{f.name}:{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        return "<unreadable>"
    return ";".join(parts)


def _built_once(root: str, recipe: str, build, sf_dir: str = None) -> None:
    """Construct an on-disk fixture (versioned table, persisted index,
    partitioned layout) at most once per (path, recipe): in a real
    deployment these artifacts EXIST and the gated operator READS them —
    paying their construction on every bench invocation misattributes
    build cost to the operator (the q_version_diff_orders policy). The
    marker stores the construction recipe, so any recipe change rebuilds;
    passing sf_dir folds a data fingerprint into the recipe so in-place
    data regeneration rebuilds too."""
    import shutil

    if sf_dir is not None:
        recipe = f"{recipe}|data={_data_fingerprint(sf_dir)}"
    marker = os.path.join(root, ".built")
    try:
        if open(marker).read() == recipe:
            return
    except OSError:
        pass
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    build()
    with open(marker, "w") as f:
        f.write(recipe)


def _must_equal(primary: DataFrame, *others: DataFrame) -> DataFrame:
    # Arm-equality gate: when every verification arm is multiset-identical
    # to the primary the output is exactly the primary's rows; ANY
    # divergence adds rows, breaking the driver's row-count + hash check.
    # A silent subset cannot pass: an arm missing rows still raises
    # |n_p - n_a| above zero for those rows, and spurious arm rows appear
    # with n_p = 0.
    #
    # Shape (r13, replacing the per-arm exceptAll pair): ONE sign-tagged
    # aggregate — union the primary and every arm with an arm tag,
    # hash-partition once on the full row tuple, and re-emit each distinct
    # row n_p + sum_i |n_p - n_a_i| times. That is the identical multiset
    # to the old p ∪ p.exceptAll(a_i) ∪ a_i.exceptAll(p) output
    # (exceptAll itself rewrites to exactly this union+count+replicate
    # machinery per LEG — RewriteExceptAll — so this runs Spark's own
    # plan once per GATE instead of twice per ARM): one Exchange per gate
    # instead of two per arm, and the primary's pipeline is scanned once
    # instead of 1 + 2·arms times.
    #
    # Because every subtree now appears exactly ONCE in the output plan,
    # the r12 persist/localCheckpoint/concurrent-count scaffolding is
    # gone entirely: nothing is multi-referenced, so there is no cache
    # race to pre-empt, no lineage re-analyzed twice, no checkpoint block
    # write, and no per-arm count job — the drain's single job schedules
    # the independent arm stages concurrently by itself (guide §2.6).
    # Callers that want an arm materialized DURING another construct-time
    # phase (e.g. overlapping a driver-bound stream harness) persist and
    # count that arm themselves before passing it in.
    if not others:
        return primary
    cols = primary.columns
    tag = "__dd_gate_arm__"
    u = primary.withColumn(tag, F.lit(0))
    for i, o in enumerate(others, start=1):
        u = u.unionAll(o.select(*cols).withColumn(tag, F.lit(i)))
    n_of = [F.count(F.when(F.col(tag) == i, True)).alias(f"__dd_n{i}__")
            for i in range(len(others) + 1)]
    g = u.groupBy(*cols).agg(*n_of)
    emit = F.col("__dd_n0__")
    for i in range(1, len(others) + 1):
        emit = emit + F.abs(F.col("__dd_n0__") - F.col(f"__dd_n{i}__"))
    # array_repeat+explode replicates each row `emit` times (Spark's own
    # ReplicateRows equivalent); emit >= 1 for every grouped row, and an
    # explode of an empty array drops the row, so no filter is needed.
    out = (
        g.withColumn(tag, F.explode(F.array_repeat(F.lit(1), emit.cast("int"))))
        .select(*cols)
    )
    return _track_persisted(out, [], primary, *others)


def _parallel_arms(*thunks):
    """Construct independent gate arms in concurrent driver threads (guide
    §2.6: Spark accepts jobs from multiple threads, and with FIFO
    scheduling the later arms' tasks back-fill slots the earlier arms
    leave idle at stage barriers). Each thunk builds one arm INCLUDING
    its internal eager actions — digest collects, _must_equal counts,
    fixture reads — which previously ran end-to-end sequentially even
    though the arms are independent pipelines (the r12 phase probe read
    the hashdiff gate's construction at ~13s against a 3.9s slowest
    arm). Results return in thunk order; the first exception
    propagates. Callers must invoke load_views() BEFORE the parallel
    block so the view-registration memo is already warm (two threads
    racing into _materialize_rebalanced would write the same scratch
    copy concurrently)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]


def _track_persisted(out: DataFrame, handles, *inputs) -> DataFrame:
    """Attach persisted-cache handles to `out` (the `_ddspark_persisted`
    contract from operators/hashdiff.py), merging in any handles carried by
    the inputs, so _with_cache_release can free them all deterministically.

    Deliberately NOT a GC finalizer: releasing caches from weakref callbacks
    fires py4j unpersist calls at arbitrary GC moments — including from
    other threads mid-action — where they contend with the running job's
    CacheManager/plan locks (measured: multi-second to 50s stalls on
    queries whose own code was byte-identical). Release must happen on the
    main thread between entries, never at GC time."""
    all_handles = list(getattr(out, "_ddspark_persisted", []))
    all_handles += list(handles)
    for src in inputs:
        all_handles += list(getattr(src, "_ddspark_persisted", []))
    out._ddspark_persisted = all_handles
    return out


class _CkptRelease:
    """Release handle for a localCheckpoint'd DataFrame, shaped like a
    persisted handle (`.unpersist(blocking)`) so it rides the same
    `_ddspark_persisted` / `_PENDING_RELEASE` contract. A checkpointed
    Dataset's plan is a LogicalRDD over the persisted internal-row RDD;
    DataFrame.unpersist() would only consult the CacheManager (a no-op
    here) — freeing the MEMORY_AND_DISK blocks requires unpersisting that
    RDD itself. Without this, checkpoint blocks survive until JVM GC +
    ContextCleaner, i.e. effectively for the whole 50-entry bench session
    (r12 ADVICE: unbounded accumulation at large sf)."""

    def __init__(self, df: DataFrame):
        self._jrdd = df._jdf.queryExecution().analyzed().rdd()

    def unpersist(self, blocking: bool = False):
        self._jrdd.unpersist(blocking)


# --- deterministic "modified" tables for diff queries ----------------------
# One SQL string, valid in BOTH Spark SQL and DuckDB, so the two engines
# construct byte-identical second sides: ~1% deleted, ~1% updated (+100.0 is
# exact in binary), ~1% inserted under shifted keys.

MODIFIED_ORDERS_SQL = """
select o_orderkey, o_custkey, o_orderstatus,
       case when o_orderkey % 100 = 2 then o_totalprice + 100.0 else o_totalprice end as o_totalprice,
       o_orderdate, o_orderpriority
from orders where o_orderkey % 100 <> 1
union all
select o_orderkey + 10000000 as o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
from orders where o_orderkey % 100 = 3
"""

# The "theirs" divergent copy for the three-way merge gate (merge3): with
# base=orders and ours=MODIFIED_ORDERS_SQL, these rules are built so every
# diff3 status occurs with real counts —
#   unchanged   keys no rule touches
#   ours        %100==2, %3==2: only ours updates (+100)
#   theirs      %100==5 (status->'X'), %100==7 (deleted),
#               +10M inserts for %100==4
#   both_same   %100==2, %3==0: both +100; %100==1 odd: both delete;
#               +10M inserts for %100==3 even: identical insert
#   conflict    %100==2, %3==1: +100 vs +200; %100==1 even: ours deletes,
#               theirs updates (+50); +10M inserts for %100==3 odd:
#               different price
MODIFIED_ORDERS2_SQL = """
select o_orderkey, o_custkey,
       case when o_orderkey % 100 = 5 then 'X' else o_orderstatus end as o_orderstatus,
       case when o_orderkey % 100 = 2 and o_orderkey % 3 = 0 then o_totalprice + 100.0
            when o_orderkey % 100 = 2 and o_orderkey % 3 = 1 then o_totalprice + 200.0
            when o_orderkey % 100 = 1 and o_orderkey % 2 = 0 then o_totalprice + 50.0
            else o_totalprice end as o_totalprice,
       o_orderdate, o_orderpriority
from orders
where o_orderkey % 100 <> 7 and not (o_orderkey % 100 = 1 and o_orderkey % 2 = 1)
union all
select o_orderkey + 10000000 as o_orderkey, o_custkey, o_orderstatus,
       case when o_orderkey % 2 = 1 then o_totalprice + 5.0 else o_totalprice end as o_totalprice,
       o_orderdate, o_orderpriority
from orders where o_orderkey % 100 = 3
union all
select o_orderkey + 10000000 as o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate, o_orderpriority
from orders where o_orderkey % 100 = 4
"""

MODIFIED_LINEITEM_SQL = """
select l_orderkey, l_linenumber, l_partkey, l_suppkey,
       case when l_orderkey % 100 = 2 then l_quantity + 1.0 else l_quantity end as l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
from lineitem where l_orderkey % 100 <> 1
union all
select l_orderkey + 10000000 as l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
from lineitem where l_orderkey % 100 = 3
"""

ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
LINEITEM_DIFF_COLS = [
    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
]


def _orders_segments(spark: SparkSession, sf_dir: str):
    load_views(spark, sf_dir)
    t1 = table_segment(spark.table("orders"), ["o_orderkey"],
                       extra_columns=ORDERS_COLS[1:])
    t2 = table_segment(spark.sql(MODIFIED_ORDERS_SQL), ["o_orderkey"],
                       extra_columns=ORDERS_COLS[1:])
    return t1, t2


def _lineitem_segments(spark: SparkSession, sf_dir: str):
    load_views(spark, sf_dir)
    keys = ["l_orderkey", "l_linenumber"]
    extras = [c for c in LINEITEM_DIFF_COLS if c not in keys]
    t1 = table_segment(
        spark.table("lineitem").select(*LINEITEM_DIFF_COLS), keys, extra_columns=extras
    )
    t2 = table_segment(spark.sql(MODIFIED_LINEITEM_SQL), keys, extra_columns=extras)
    return t1, t2


def _orders_diff_oracle(sign_only: bool = False) -> str:
    nonkey = ORDERS_COLS[1:]
    differs = " or ".join(f"a.{c} is distinct from b.{c}" for c in nonkey)
    acols = ", ".join(f"a.{c} as {c}" for c in ORDERS_COLS)
    bcols = ", ".join(f"b.{c} as {c}" for c in ORDERS_COLS)
    return f"""
with t2 as ({MODIFIED_ORDERS_SQL})
select '-' as sign, {acols}
from orders a left join t2 b on a.o_orderkey = b.o_orderkey
where b.o_orderkey is null or {differs}
union all
select '+' as sign, {bcols}
from t2 b left join orders a on a.o_orderkey = b.o_orderkey
where a.o_orderkey is null or {differs}
"""


def _lineitem_diff_oracle() -> str:
    keys = ["l_orderkey", "l_linenumber"]
    nonkey = [c for c in LINEITEM_DIFF_COLS if c not in keys]
    on = " and ".join(f"a.{k} = b.{k}" for k in keys)
    differs = " or ".join(f"a.{c} is distinct from b.{c}" for c in nonkey)
    acols = ", ".join(f"a.{c} as {c}" for c in LINEITEM_DIFF_COLS)
    bcols = ", ".join(f"b.{c} as {c}" for c in LINEITEM_DIFF_COLS)
    return f"""
with t2 as ({MODIFIED_LINEITEM_SQL})
select '-' as sign, {acols}
from lineitem a left join t2 b on {on}
where b.l_orderkey is null or {differs}
union all
select '+' as sign, {bcols}
from t2 b left join lineitem a on {on}
where a.l_orderkey is null or {differs}
"""


# --- DuckDB-side normalization (mirrors data_diff_spark.normalize) ---------

CHECKSUM_OFFSET = 140737488355327  # (2**48 - 1) // 2, constants.py


def duckdb_norm(col: str, kind: str, precision: int = 6) -> str:
    """DuckDB SQL producing the same canonical string as normalize.py."""
    if kind == "int":
        return f"cast({col} as varchar)"
    if kind == "float":
        # via varchar: DuckDB's direct double->decimal goes through float
        # multiplication, inexact beyond 2^53/10^precision; the string
        # round-trip matches Spark's exact conversion for all doubles.
        # Sub-half-ulp guard: DuckDB's varchar->decimal rounds on the first
        # SIGNIFICANT dropped digit regardless of position (5e-324 ->
        # 0.000001); Spark renders everything below half-ulp as zero.
        via = f"cast(cast(cast({col} as varchar) as decimal(38,{precision})) as varchar)"
        zero = f"cast(cast(0 as decimal(38,{precision})) as varchar)"
        return f"(case when abs({col}) < 5e-{precision + 1} then {zero} else {via} end)"
    if kind == "str":
        return col
    if kind == "ts":
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S.%f')"
    raise ValueError(kind)


def duckdb_fingerprint(cols_kinds) -> str:
    parts = ", ".join(
        f"coalesce({duckdb_norm(c, k)}, '<null>')" for c, k in cols_kinds
    )
    return f"concat_ws('|', {parts})"


def duckdb_md5_as_int(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 21, 12))::BIGINT - {CHECKSUM_OFFSET})"


LINEITEM_KINDS = [
    ("l_orderkey", "int"), ("l_linenumber", "int"), ("l_partkey", "int"),
    ("l_suppkey", "int"), ("l_quantity", "float"), ("l_extendedprice", "float"),
    ("l_discount", "float"), ("l_tax", "float"), ("l_returnflag", "str"),
    ("l_linestatus", "str"), ("l_shipdate", "ts"),
]


# --- diff queries -----------------------------------------------------------


def q_joindiff_orders(spark, sf_dir):
    t1, t2 = _orders_segments(spark, sf_dir)
    return jd.join_diff(t1, t2)


def q_hashdiff_orders(spark, sf_dir):
    t1, t2 = _orders_segments(spark, sf_dir)
    return hd.hash_diff(t1, t2, n_buckets=1024)


def q_joindiff_lineitem(spark, sf_dir):
    t1, t2 = _lineitem_segments(spark, sf_dir)
    return jd.join_diff(t1, t2)


def q_hashdiff_lineitem(spark, sf_dir):
    """hashdiff over a compound key WITH duplicate key values (the driver's
    lineitem has ~23% duplicate (l_orderkey, l_linenumber) pairs) — exercises
    the diff_sets multiset semantics end-to-end."""
    t1, t2 = _lineitem_segments(spark, sf_dir)
    return hd.hash_diff(t1, t2, n_buckets=1024)


def _hashdiff_lineitem_oracle() -> str:
    """Digest-based oracle: a PK is emitted iff its row multiset differs,
    where the multiset is identified by (count, sum of md5 row checksums) —
    the same checksum formula as the engine, already proven bit-identical."""
    cks = duckdb_md5_as_int(duckdb_fingerprint(LINEITEM_KINDS))
    cols = ", ".join(c for c, _ in LINEITEM_KINDS)
    sel = lambda side: ", ".join(f"{side}.{c} as {c}" for c, _ in LINEITEM_KINDS)
    return f"""
with t2 as ({MODIFIED_LINEITEM_SQL}),
a as (select {cols}, {cks} as cks from lineitem),
b as (select {cols}, {cks} as cks from t2),
pa as (select l_orderkey, l_linenumber, count(*) as ca, sum(cks) as sa from a group by 1, 2),
pb as (select l_orderkey, l_linenumber, count(*) as cb, sum(cks) as sb from b group by 1, 2),
bad as (
  select coalesce(pa.l_orderkey, pb.l_orderkey) as k1,
         coalesce(pa.l_linenumber, pb.l_linenumber) as k2
  from pa full outer join pb
    on pa.l_orderkey = pb.l_orderkey and pa.l_linenumber = pb.l_linenumber
  where coalesce(ca, 0) <> coalesce(cb, 0) or sa is distinct from sb
)
select '-' as sign, {sel('a')} from a join bad on a.l_orderkey = bad.k1 and a.l_linenumber = bad.k2
union all
select '+' as sign, {sel('b')} from b join bad on b.l_orderkey = bad.k1 and b.l_linenumber = bad.k2
"""


def q_diff_stats_orders(spark, sf_dir):
    t1, t2 = _orders_segments(spark, sf_dir)
    return (
        jd.join_diff(t1, t2)
        .groupBy("sign")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_DIFF_STATS_ORDERS = f"""
select sign, count(*) as n from ({_orders_diff_oracle()}) group by sign
"""

# numeric orders columns the gated drift arm monitors (categorical TVD uses
# xxhash64 buckets — Spark-specific, so it stays pinned by the numpy oracle
# in tests/test_drift.py; PSI is pure arithmetic and replays in DuckDB)
DRIFT_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


def q_diff_stats_all(spark, sf_dir):
    """'+/-/!' sign counts AND the streaming drift monitor in one scoped
    relation (VERDICT r6 ask #3: drift_stream had no CORRECTNESS row).
    The drift arm is _must_equal(batch score, bounded single-batch
    streaming score through the real foreachBatch sink) — batch_id is
    compared too, so a surprise batch split is a loud mismatch — and the
    PSI values themselves are replayed by the DuckDB oracle (baseline =
    the deterministically modified orders table, bins fixed from the
    baseline only, exactly DriftMonitor's rule).

    The modified-orders table is persisted ONCE and shared by all its
    consumers in this entry — the sign diff's right side, the monitor's
    min/max pass, and its baseline bin counts (r7 recomputed the union
    per pass; VERDICT r7 'What's wrong #1' attributed most of the entry's
    fixed cost to exactly that plus the metastore sink)."""
    load_views(spark, sf_dir)
    mod = spark.sql(MODIFIED_ORDERS_SQL).persist()
    from concurrent.futures import ThreadPoolExecutor

    from data_diff_spark.streaming.drift_stream import monitor_orders_bounded

    # the bounded drift-monitor run is independent of the sign-diff arm:
    # run it on a side thread while signs CONSTRUCTS and materializes
    # (guide §2.6 — signs previously executed inside the drain,
    # serialized after the whole streaming harness; since r13b the sign
    # arm's plan building also hides under the monitor, the asof
    # reorder). mod is materialized FIRST: the signs count and the
    # monitor's batch score are otherwise concurrent first readers of
    # the lazily-persisted mod, which race and recompute partitions
    # (r12 ADVICE).
    mod.count()
    with ThreadPoolExecutor(max_workers=1) as _ex:
        _fut = _ex.submit(monitor_orders_bounded, spark, sf_dir, DRIFT_COLS,
                          mod)
        t1 = table_segment(spark.table("orders"), ["o_orderkey"],
                           extra_columns=ORDERS_COLS[1:])
        t2 = table_segment(mod, ["o_orderkey"], extra_columns=ORDERS_COLS[1:])
        signs_src = jd.join_diff(t1, t2).groupBy("sign").agg(
            F.count(F.lit(1)).alias("n"))
        signs = signs_src.select(
            F.lit("signs").alias("scope"), F.col("sign").alias("k"),
            F.lit("count").alias("metric"),
            F.col("n").cast("double").alias("value"),
            F.lit(None).cast("double").alias("aux_a"),
            F.lit(None).cast("double").alias("aux_b"),
            F.lit(False).alias("flag"),
        ).persist()
        signs.count()
        b, s = _fut.result()

    def shape(df):
        return df.select(
            F.lit("drift").alias("scope"), F.col("column").alias("k"),
            "metric", F.round("value", 6).alias("value"),
            F.col("null_rate_baseline").alias("aux_a"),
            F.col("null_rate_batch").alias("aux_b"),
            F.col("drifted").alias("flag"), "batch_id",
        )

    drift = _must_equal(shape(b), shape(s))
    # derived selects drop the _ddspark_persisted attr — re-attach (plus
    # the shared mod cache) so the gate's caches release deterministically
    # between entries
    return _track_persisted(
        signs.unionAll(drift.select(*signs.columns)), [mod, signs], drift)


def _drift_psi_col_oracle(c: str) -> str:
    """DuckDB replay of DriftMonitor's PSI for one numeric column:
    baseline-pinned equi-width bins (20), +1e-6 smoothing, natural log —
    the same IEEE double pipeline as operators/drift._bin_counts, so the
    only divergence risk is summation order, absorbed by round(...,6)."""
    return f"""
select 'drift' as scope, '{c}' as k, 'psi' as metric,
       round(psi, 6) as value, nr_base as aux_a, nr_cur as aux_b,
       psi > 0.2 as flag
from (
  with base as ({MODIFIED_ORDERS_SQL}),
  mm as (
    select min(cast({c} as double)) as lo,
           case when (max(cast({c} as double)) - min(cast({c} as double))) / 20 = 0
                then 1e0
                else (max(cast({c} as double)) - min(cast({c} as double))) / 20 end as w
    from base),
  bbin as (select least(greatest(floor((cast({c} as double) - mm.lo) / mm.w), 0), 19) as b
           from base, mm where {c} is not null),
  cbin as (select least(greatest(floor((cast({c} as double) - mm.lo) / mm.w), 0), 19) as b
           from orders, mm where {c} is not null),
  bt as (select count(*) as t, sum(case when {c} is null then 1 else 0 end) as nn from base),
  ct as (select count(*) as t, sum(case when {c} is null then 1 else 0 end) as nn from orders),
  hist as (
    select cast(coalesce(bc.n, 0) as double) / bt.t + 1e-6 as p,
           cast(coalesce(cc.n, 0) as double) / ct.t + 1e-6 as q
    from (select range as i from range(0, 20)) bins
    left join (select b, count(*) as n from bbin group by b) bc on bc.b = bins.i
    left join (select b, count(*) as n from cbin group by b) cc on cc.b = bins.i
    cross join bt cross join ct)
  select sum((p - q) * ln(p / q)) as psi,
         (select cast(nn as double) / t from bt) as nr_base,
         (select cast(nn as double) / t from ct) as nr_cur
  from hist
)
"""


def _diff_stats_all_oracle() -> str:
    arms = "\nunion all\n".join(_drift_psi_col_oracle(c) for c in DRIFT_COLS)
    return f"""
select 'signs' as scope, sign as k, 'count' as metric,
       cast(n as double) as value, cast(null as double) as aux_a,
       cast(null as double) as aux_b, false as flag
from ({ORACLE_DIFF_STATS_ORDERS})
union all
{arms}
"""


def q_percol_diff_orders(spark, sf_dir):
    t1, t2 = _orders_segments(spark, sf_dir)
    return jd.count_diff_per_column(t1, t2)


def _percol_oracle() -> str:
    nonkey = ORDERS_COLS[1:]
    # exclusive rows count as different in every column (value IS DISTINCT
    # FROM NULL), matching the reference's is_diff_* flags
    # (joindiff_tables.py:326)
    diffs = ", ".join(
        f"cast(sum(case when a.{c} is distinct from b.{c} then 1 else 0 end) as bigint) as diff_{c}"
        for c in nonkey
    )
    return f"""
with t2 as ({MODIFIED_ORDERS_SQL})
select count(*) as rows_joined,
       cast(sum(case when b.o_orderkey is null then 1 else 0 end) as bigint) as exclusive_a,
       cast(sum(case when a.o_orderkey is null then 1 else 0 end) as bigint) as exclusive_b,
       {diffs}
from orders a full outer join t2 b on a.o_orderkey = b.o_orderkey
"""


def q_hashdiff_cross_engine(spark, sf_dir):
    """TRUE cross-engine diff: the Spark side scans parquet; the second side
    lives in DuckDB (standing in for PostgreSQL/Snowflake) and computes its
    own bucket digests with the reference's checksum SQL. Only digests +
    mismatched-bucket rows cross the engine boundary."""
    import duckdb

    from data_diff_spark.operators.remote import DuckDBSide, hash_diff_remote

    load_views(spark, sf_dir)
    t1 = table_segment(
        spark.table("orders").select(*ORDERS_COLS), ["o_orderkey"],
        extra_columns=ORDERS_COLS[1:],
    )
    con = duckdb.connect()
    # never leave the remote side's parallelism to chance: the default is
    # core count, but an inherited session setting of 1 would silently
    # serialize the md5 scan
    con.execute(f"PRAGMA threads={os.cpu_count() or 8}")
    for t in ("orders",):
        src = f"{sf_dir}/{t}.parquet"
        # scan the re-laid multi-file ingest copy when one exists: DuckDB
        # parallelizes parquet by ROW GROUP, so the driver's
        # single-row-group file would pin the remote md5 pipeline to one
        # thread — the layout-at-ingest step pays off on both engines
        fast = _INGEST_PATHS.get(src)
        # LOUD degradation: a silently-missed fast path cost a past round a
        # 4x swing on this entry between runs of identical code (the relaid
        # copy existed in one run's scratch and not the other's)
        if fast is None and not os.environ.get("SPARK_GRAFT_NO_INGEST_CACHE"):
            logger.warning(
                "cross-engine leg: no relaid ingest copy for %s — the DuckDB "
                "side will scan the single-row-group original on ONE thread "
                "per file; expect this entry ~4x slower (scratch unwritable, "
                "or load_views skipped materialization)", src,
            )
        src = fast or src
        _ORACLE_SCANS[t] = src
        if os.path.isdir(src):  # directory-style parquet
            src = f"{src}/*.parquet"
        con.execute(f"create view {t} as select * from read_parquet('{src}')")
    con.execute(f"create view t2 as {MODIFIED_ORDERS_SQL}")
    remote = DuckDBSide("t2", ["o_orderkey"], ORDERS_COLS, con=con)
    return hash_diff_remote(t1, remote)


def q_joindiff_orders_window(spark, sf_dir):
    """Diff restricted to an update-column window (reference min_update/
    max_update, table_segment.py:166-170): both sides filter to orders
    updated inside a fixed date range before comparing."""
    load_views(spark, sf_dir)
    lo, hi = "1994-01-01 00:00:00", "1996-01-01 00:00:00"
    t1 = table_segment(spark.table("orders").select(*ORDERS_COLS), ["o_orderkey"],
                       update_column="o_orderdate", extra_columns=ORDERS_COLS[1:],
                       min_update=lo, max_update=hi)
    t2 = table_segment(spark.sql(MODIFIED_ORDERS_SQL), ["o_orderkey"],
                       update_column="o_orderdate", extra_columns=ORDERS_COLS[1:],
                       min_update=lo, max_update=hi)
    return jd.join_diff(t1, t2)


def _orders_window_oracle() -> str:
    nonkey = ORDERS_COLS[1:]
    differs = " or ".join(f"a.{c} is distinct from b.{c}" for c in nonkey)
    acols = ", ".join(f"a.{c} as {c}" for c in ORDERS_COLS)
    bcols = ", ".join(f"b.{c} as {c}" for c in ORDERS_COLS)
    rng = ("o_orderdate >= timestamp '1994-01-01 00:00:00' "
           "and o_orderdate < timestamp '1996-01-01 00:00:00'")
    return f"""
with t1 as (select {', '.join(ORDERS_COLS)} from orders where {rng}),
t2 as (select * from ({MODIFIED_ORDERS_SQL}) where {rng})
select '-' as sign, {acols}
from t1 a left join t2 b on a.o_orderkey = b.o_orderkey
where b.o_orderkey is null or {differs}
union all
select '+' as sign, {bcols}
from t2 b left join t1 a on a.o_orderkey = b.o_orderkey
where a.o_orderkey is null or {differs}
"""


def q_checksum_orders_keyrange(spark, sf_dir):
    """Segment checksum under a key-range restriction (reference
    make_select key bounds, table_segment.py:158-179): [1000, 9000)."""
    load_views(spark, sf_dir)
    t = table_segment(spark.table("orders").select(*ORDERS_COLS), ["o_orderkey"],
                      extra_columns=ORDERS_COLS[1:],
                      min_key=(1000,), max_key=(9000,))
    return t.make_select().agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(t.checksum_column()).cast("string").alias("cks"),
    )


# --- segment-query operators (SURVEY §2.2) ---------------------------------


def q_checksum_orders(spark, sf_dir):
    """count(*) + md5-checksum of every row, the hashdiff segment query —
    pins full normalization parity against DuckDB."""
    load_views(spark, sf_dir)
    t = table_segment(spark.table("orders"), ["o_orderkey"], extra_columns=ORDERS_COLS[1:])
    agg = t.make_select().agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(t.checksum_column()).cast("string").alias("cks"),
    )
    return agg


ORACLE_CHECKSUM_ORDERS = """
select count(*) as cnt,
       cast(sum(('0x' || substring(md5(
           concat_ws('|',
             coalesce(cast(o_orderkey as varchar), '<null>'),
             coalesce(cast(o_custkey as varchar), '<null>'),
             coalesce(o_orderstatus, '<null>'),
             coalesce(cast(cast(o_totalprice as decimal(38,6)) as varchar), '<null>'),
             coalesce(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f'), '<null>'),
             coalesce(o_orderpriority, '<null>')
           )), 21, 12))::BIGINT - 140737488355327) as varchar) as cks
from orders
"""


ORACLE_CHECKSUM_KEYRANGE = ORACLE_CHECKSUM_ORDERS.replace(
    "from orders", "from orders where o_orderkey >= 1000 and o_orderkey < 9000"
)


ORDERS_KINDS = [
    ("o_orderkey", "int"), ("o_custkey", "int"), ("o_orderstatus", "str"),
    ("o_totalprice", "float"), ("o_orderdate", "ts"), ("o_orderpriority", "str"),
]


def q_get_values_orders(spark, sf_dir):
    """The download path (reference get_values, table_segment.py:181-187):
    every compared column rendered to its canonical comparable string —
    kept distributed; the driver's gate hashes the full normalized
    relation, pinning the entire normalization layer column-by-column."""
    load_views(spark, sf_dir)
    t = table_segment(spark.table("orders").select(*ORDERS_COLS), ["o_orderkey"],
                      extra_columns=ORDERS_COLS[1:])
    return t.get_values()


def _get_values_oracle() -> str:
    cols = ", ".join(f"{duckdb_norm(c, k)} as {c}" for c, k in ORDERS_KINDS)
    return f"select {cols} from orders"


def q_key_range_orders(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.table("orders").agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count(F.lit(1)).alias("cnt"),
    )


# --- relational/query-builder surface (SURVEY §2.3) -------------------------


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary — groupBy/agg surface. Sums in decimal for
    cross-engine determinism, cast to double at the end."""
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q1_SQL)


TPCH_Q1_SQL = """
select l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(38,2))) as double) as sum_qty,
       cast(sum(cast(l_extendedprice as decimal(38,2))) as double) as sum_base_price,
       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(38,4))) as double) as sum_disc_price,
       cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(38,6))) as double) as sum_charge,
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q3_SQL)


TPCH_Q3_SQL = """
select o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(38,4))) as double) as revenue
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
where c.c_mktsegment = 'BUILDING'
group by o.o_orderkey, o.o_orderdate, o.o_orderpriority
order by revenue desc, o_orderkey
limit 10
"""


def q_tpch_q5(spark, sf_dir):
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q5_SQL)


TPCH_Q5_SQL = """
select n.n_name,
       cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(38,4))) as double) as revenue
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
join supplier s on s.s_suppkey = l.l_suppkey and s.s_nationkey = c.c_nationkey
join nation n on n.n_nationkey = s.s_nationkey
join region r on r.r_regionkey = n.n_regionkey
group by n.n_name
order by revenue desc, n_name
"""


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar subquery,
    decorrelated by Catalyst into an aggregate+join — a relational
    capability the reference's AST cannot express (SURVEY §2.3 has no
    subqueries). Inner avg through decimal so the filter boundary is exact
    in both engines."""
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q17_SQL)


TPCH_Q17_SQL = """
select cast(cast(sum(cast(l_extendedprice as decimal(38,4))) as double) / 7.0 as double) as avg_yearly
from lineitem, part
where p_partkey = l_partkey
  and p_brand like 'Brand%1'
  and l_quantity < (
    select 0.2 * avg(cast(l_quantity as decimal(38,6)))
    from lineitem l2 where l2.l_partkey = p_partkey
  )
"""


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): 8-table join, year extraction,
    conditional aggregation, share = double division of exact decimal sums
    — identical IEEE result in both engines given identical inputs."""
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q8_SQL)


TPCH_Q8_SQL = """
select o_year,
       cast(cast(sum(case when nation = 'NATION_0' then volume else cast(0 as decimal(38,4)) end) as double)
            / cast(sum(volume) as double) as double) as mkt_share
from (
  select year(o.o_orderdate) as o_year,
         cast(l.l_extendedprice * (1 - l.l_discount) as decimal(38,4)) as volume,
         n2.n_name as nation
  from part p
  join lineitem l on p.p_partkey = l.l_partkey
  join orders o on l.l_orderkey = o.o_orderkey
  join customer c on o.o_custkey = c.c_custkey
  join nation n1 on c.c_nationkey = n1.n_nationkey
  join region r on n1.n_regionkey = r.r_regionkey
  join supplier s on l.l_suppkey = s.s_suppkey
  join nation n2 on s.s_nationkey = n2.n_nationkey
  where r.r_name = 'AMERICA' and p.p_type = 'PROMO'
) t
group by o_year
order by o_year
"""


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item report): top-20 customers by revenue lost
    to returns; deterministic tie-break on the key."""
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q10_SQL)


TPCH_Q10_SQL = """
select c.c_custkey, c.c_name,
       cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(38,4))) as double) as revenue,
       c.c_acctbal, n.n_name
from customer c
join orders o on c.c_custkey = o.o_custkey
join lineitem l on l.l_orderkey = o.o_orderkey
join nation n on c.c_nationkey = n.n_nationkey
where l.l_returnflag = 'R'
group by c.c_custkey, c.c_name, c.c_acctbal, n.n_name
order by revenue desc, c_custkey
limit 20
"""


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a LEFT SEMI join
    (the AST surface the reference lacks — SURVEY §2.3 'no semi/anti' —
    and only emulates via outer-join NULL flags, joindiff_tables.py:77-78).
    Predicate adapted to the driver's lineitem columns (late shipment =
    shipped >60 days after order date). Catalyst plans the subquery as a
    shuffled/broadcast semi join with both filters pushed to the scans."""
    load_views(spark, sf_dir)
    return spark.sql(TPCH_Q4_SQL)


TPCH_Q4_SQL = """
select o_orderpriority, count(*) as order_count
from orders o
where o_orderdate >= timestamp '1995-01-01' and o_orderdate < timestamp '1995-04-01'
  and exists (select 1 from lineitem l
              where l.l_orderkey = o.o_orderkey
                and l.l_shipdate > o.o_orderdate + interval 60 day)
group by o_orderpriority
"""


def q_set_ops(spark, sf_dir):
    """EXCEPT ALL / INTERSECT surface (reference TableOp, ast_classes.py:548-563)."""
    load_views(spark, sf_dir)
    a = spark.table("orders").select("o_orderkey", "o_totalprice")
    b = spark.sql(MODIFIED_ORDERS_SQL).select("o_orderkey", "o_totalprice")
    return a.exceptAll(b)


ORACLE_SET_OPS = f"""
select o_orderkey, o_totalprice from orders
except all
select o_orderkey, o_totalprice from ({MODIFIED_ORDERS_SQL})
"""


def q_events_hourly(spark, sf_dir):
    """Time-bucketed aggregation over the events table (window-less rollup)."""
    load_views(spark, sf_dir)
    return spark.sql(EVENTS_HOURLY_SQL)


EVENTS_HOURLY_SQL = """
select date_trunc('hour', ts) as hour, event_type,
       count(*) as n,
       cast(sum(cast(value as decimal(38,4))) as double) as total_value
from events
group by date_trunc('hour', ts), event_type
"""


def q_events_sessionize(spark, sf_dir):
    """Sessionization via window functions (beyond-reference operator: the
    reference has no window/analytic surface, SURVEY §2.3 'Window functions:
    none'). Gap threshold compared in integer microseconds so Spark and the
    DuckDB oracle agree exactly."""
    from pyspark.sql import Window

    load_views(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = spark.table("events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    gap = F.col("us") - F.lag("us").over(w)
    new_session = F.when(gap.isNull() | (gap > 1800 * 1000 * 1000), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SESSIONIZE_ORACLE = """
with gaps as (
  select user_id,
         case when lag(epoch_us(ts)) over (partition by user_id order by ts, event_id) is null
                   or epoch_us(ts) - lag(epoch_us(ts)) over (partition by user_id order by ts, event_id) > 1800000000
              then 1 else 0 end as new_session
  from events
)
select user_id, cast(sum(new_session) as bigint) as n_sessions, count(*) as n_events
from gaps group by user_id
"""


# --- training-data pipeline: text analysis & dedup (beyond-reference) ------
# The reference has no text/dedup surface (SURVEY §2.3); these are the
# 100 TB-pipeline operators the engine adds on top, all oracle-checked
# against DuckDB with bit-identical md5-derived hashing.

from data_diff_spark.functions import text as TX
from data_diff_spark.operators import dedup as DD


def q_text_stats(spark, sf_dir):
    load_views(spark, sf_dir)
    c = F.col("text")
    return spark.table("documents").select(
        "doc_id",
        TX.token_count(c).cast("long").alias("n_tokens"),
        TX.bpe_token_count(c).cast("long").alias("n_bpe_tokens"),
        TX.lang_id(c).alias("lang_pred"),
        TX.alpha_ratio(c).alias("alpha_ratio"),
        TX.mean_token_len(c).alias("mean_token_len"),
        TX.stopword_ratio(c, "en").alias("stopword_ratio_en"),
        TX.quality_score(c).alias("quality_score"),
    )


def _text_stats_oracle() -> str:
    p = TX.duckdb_quality_parts("text")
    return f"""
select doc_id, {p['token_count']}::BIGINT as n_tokens,
       {TX.duckdb_bpe_token_count('text')}::BIGINT as n_bpe_tokens,
       {TX.duckdb_lang_id('text')} as lang_pred,
       {p['alpha_ratio']} as alpha_ratio,
       {p['mean_token_len']} as mean_token_len,
       {p['stopword_ratio_en']} as stopword_ratio_en,
       {TX.duckdb_quality_score('text')} as quality_score
from documents
"""


def q_doc_fingerprints(spark, sf_dir):
    load_views(spark, sf_dir)
    c = F.col("text")
    from data_diff_spark.streaming.events_stream import table_rows

    return DD.with_simhash(
        spark.table("documents"), "text", out="simhash",
        n_rows=table_rows(spark, sf_dir, "documents"),
    ).select(
        "doc_id",
        TX.set_fingerprint(c).alias("set_fp"),
        TX.rolling_fingerprint(c).alias("rolling_fp"),
        "simhash",
    )


def _doc_fingerprints_oracle() -> str:
    return f"""
select doc_id, {TX.duckdb_set_fingerprint('text')} as set_fp,
       {TX.duckdb_rolling_fingerprint('text')} as rolling_fp,
       {DD.duckdb_simhash('text')} as simhash
from documents
"""


def q_quality_filter(spark, sf_dir):
    """Corpus cleaning stage: keep/reject + first-failing-rule annotation
    per document (token bounds, quality floor, language allowlist) — one
    map-only pass."""
    load_views(spark, sf_dir)
    return TX.quality_filter(
        spark.table("documents").select("doc_id", "text"),
        min_tokens=20, min_quality=0.25, allowed_langs=["en", "und"],
    ).select("doc_id", "keep", "reject_reason")


def _quality_filter_oracle() -> str:
    reason = TX.duckdb_quality_filter(
        "text", min_tokens=20, min_quality=0.25, allowed_langs=["en", "und"]
    )
    return f"""
select doc_id, ({reason}) is null as keep, {reason} as reject_reason
from documents
"""


# doubled corpus (ids shifted) so exact dedup has real work to do: every
# text appears exactly twice -> 500 groups of n_copies=2
DOCS2_SQL = """
select doc_id, text from documents
union all
select doc_id + 1000000 as doc_id, text from documents
"""


def q_hashed_doc_vectors(spark, sf_dir):
    """Feature-hashing vectorizer (map-only text -> 64-dim signed count
    vector); serialized to a canonical string for the value-hash compare."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    return TX.hashed_vector(
        spark.table("documents"), dim=64,
        n_rows=table_rows(spark, sf_dir, "documents"),
    ).select(
        "doc_id", F.concat_ws(",", F.col("vector")).alias("vector_str")
    )


def _hashed_vectors_oracle() -> str:
    return f"""
select doc_id, array_to_string({TX.duckdb_hashed_vector('text', 64)}, ',') as vector_str
from documents
"""


def q_dedup_exact(spark, sf_dir):
    load_views(spark, sf_dir)
    return DD.exact_dedup(spark.sql(DOCS2_SQL))


ORACLE_DEDUP_EXACT = f"""
select md5(text) as fp, min(doc_id) as canonical_id, count(*) as n_copies
from ({DOCS2_SQL}) group by md5(text)
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    load_views(spark, sf_dir)
    return DD.jaccard_pairs(spark.table("documents"), n=3, threshold=0.8)


def q_dedup_minhash_lsh(spark, sf_dir):
    """LSH candidates + exact verification; at 32 bands x 4 rows the miss
    probability per true pair at J=0.8 is ~5e-8, so the brute-force oracle
    matches (verified: identical 25 pairs at sf0.01)."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    return DD.minhash_lsh_dedup(spark.table("documents"), threshold=0.8,
                                n_rows=table_rows(spark, sf_dir, "documents"))


def _jaccard_pairs_oracle(threshold: float = 0.8) -> str:
    ng = TX.duckdb_word_ngrams("text", 3)
    return f"""
with t as (select doc_id, list_distinct({ng}) as s from documents),
p as (select a.doc_id as id_a, b.doc_id as id_b,
             len(list_intersect(a.s, b.s)) as inter, len(a.s) as sa, len(b.s) as sb
      from t a join t b on a.doc_id < b.doc_id)
select id_a, id_b, inter::double / (sa + sb - inter) as jaccard
from p where inter::double / (sa + sb - inter) >= {threshold}
"""


def q_docs_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment by content-hash ranges —
    reproducible on any cluster layout and replayable in any engine with
    md5 (functions/sampling.py)."""
    from data_diff_spark.functions import sampling as SMP

    load_views(spark, sf_dir)
    return SMP.split_assign(
        spark.table("documents"), {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"]
    ).select("doc_id", "split")


def _docs_split_oracle() -> str:
    from data_diff_spark.functions import sampling as SMP

    expr = SMP.duckdb_split_assign_expr({"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"])
    return f"select doc_id, {expr} as split from documents"


def q_docs_stratified_sample(spark, sf_dir):
    """Deterministic 20-per-language sample: hash-ranked row_number within
    each stratum, map-side pruned via WindowGroupLimit[Partial]."""
    from data_diff_spark.functions import sampling as SMP

    load_views(spark, sf_dir)
    return SMP.stratified_sample(
        spark.table("documents"), ["lang"], 20, ["doc_id"]
    ).select("doc_id", "lang")


def _docs_stratified_oracle() -> str:
    from data_diff_spark.functions.sampling import duckdb_hash60

    h = duckdb_hash60("concat_ws(chr(31), '', doc_id::varchar)")
    return f"""
with ranked as (
  select doc_id, lang,
         row_number() over (
           partition by lang
           order by {h} asc, concat_ws(chr(31), '', doc_id::varchar) asc
         ) as rn
  from documents
)
select doc_id, lang from ranked where rn <= 20
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering end-to-end: LSH pairs -> connected components
    (min-label + pointer jumping, operators/dedup.py:components) -> every
    document tagged with its cluster id (own id for singletons)."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    docs = spark.table("documents")
    pairs = DD.minhash_lsh_dedup(docs, threshold=0.8,
                                 n_rows=table_rows(spark, sf_dir, "documents"))
    out = DD.assign_clusters(docs, pairs).select("doc_id", "cluster_id")
    # derived DataFrames do not inherit the _ddspark_persisted contract;
    # re-attach so the shingle cache is released with the result
    return _track_persisted(out, [], pairs)


def q_dedup_resolve(spark, sf_dir):
    """The full dedup pipeline's last stage: one surviving document per
    near-dup cluster (highest quality_score, ties -> max doc_id), plus
    cluster size. Singleton docs survive trivially (n_members=1)."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    docs = spark.table("documents")
    pairs = DD.minhash_lsh_dedup(docs, threshold=0.8,
                                 n_rows=table_rows(spark, sf_dir, "documents"))
    return _track_persisted(DD.dedup_resolve(docs, pairs), [], pairs)


def _components_cte(threshold: float = 0.8) -> str:
    """DuckDB CTE chain replaying pairs -> connected components: transitive
    closure by recursive CTE (UNION dedups visited (src,node) rows), then
    component = min reachable node. Must be spliced into a WITH RECURSIVE."""
    ng = TX.duckdb_word_ngrams("text", 3)
    return f"""
t as (select doc_id, list_distinct({ng}) as s from documents),
p as (select a.doc_id as id_a, b.doc_id as id_b
      from t a join t b on a.doc_id < b.doc_id
      where len(list_intersect(a.s, b.s))::double
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}),
e as (select id_a as a, id_b as b from p union select id_b, id_a from p),
walk(src, node) as (
  select a, a from e
  union
  select w.src, e.b from walk w join e on w.node = e.a
),
comp as (select src as doc_id, min(node) as cluster_id from walk group by src)
"""


def _dedup_clusters_oracle() -> str:
    return f"""
with recursive {_components_cte()}
select d.doc_id, coalesce(c.cluster_id, d.doc_id) as cluster_id
from documents d left join comp c using (doc_id)
"""


def _dedup_resolve_oracle() -> str:
    q = TX.duckdb_quality_score("text")
    return f"""
with recursive {_components_cte()},
scored as (
  select coalesce(c.cluster_id, d.doc_id) as cluster_id, d.doc_id as id, {q} as score
  from documents d left join comp c using (doc_id)
),
ranked as (
  select *, row_number() over (partition by cluster_id order by score desc, id desc) as rn,
         count(*) over (partition by cluster_id) as n_members
  from scored
)
select cluster_id, id as kept_id, n_members, score as kept_score
from ranked where rn = 1
"""


def q_simhash_neardup_pairs(spark, sf_dir):
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    return DD.simhash_pairs(
        spark.table("documents"), max_hamming=3,
        n_rows=table_rows(spark, sf_dir, "documents"),
    ).withColumn(
        "hamming", F.col("hamming").cast("long")
    )


def _simhash_pairs_oracle(max_hamming: int = 3) -> str:
    return f"""
with s as (select doc_id, {DD.duckdb_simhash('text')} as sh from documents)
select a.doc_id as id_a, b.doc_id as id_b,
       bit_count(xor(a.sh, b.sh))::BIGINT as hamming
from s a join s b on a.doc_id < b.doc_id
where bit_count(xor(a.sh, b.sh)) <= {max_hamming}
"""


# --- similarity search over embeddings (beyond-reference) ------------------

from data_diff_spark.operators import similarity as SIM

EMB_DIM = 64


def _emb_base(spark):
    # uniform array<double> so the augmented corpus unions cleanly
    return spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _emb_queries(spark):
    return _emb_base(spark).filter(F.col("vec_id") % 20 == 0)


# replica count for the ivf_auto gate corpus: sized so the auto cell rule
# (rows/1000, floor 16) derives DIFFERENT shapes at the two gate sfs —
# sf0.01: 500*12 = 6000 rows -> 16 (floor); sf0.1: 2000*12 = 24000 -> 24
_AUTO_REPLICAS = 12
_AUTO_REPLICA_STRIDE = 10_000_000


def _emb_auto_corpus(base):
    """Deterministic replica augmentation for the auto-shape gate: replica
    r carries vec_id + r*stride and the embedding CIRCULARLY SHIFTED by r
    positions (direction changes, so clustering stays non-degenerate) —
    one map-only explode, trivially replayed by list slicing in SQL."""
    dim = EMB_DIM
    r = F.col("__r")
    return base.select(
        "vec_id", "embedding", F.explode(
            F.sequence(F.lit(0), F.lit(_AUTO_REPLICAS - 1))).alias("__r"),
    ).select(
        (F.col("vec_id") + r * F.lit(_AUTO_REPLICA_STRIDE)).alias("vec_id"),
        F.concat(
            F.slice("embedding", r + 1, F.lit(dim) - r),
            F.slice("embedding", F.lit(1), r),
        ).alias("embedding"),
    )


def q_cosine_topk(spark, sf_dir):
    """Exact top-5 corpus neighbors for a 5% query sample — broadcast the
    queries, single corpus scan, integer-exact dot products."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    return SIM.cosine_topk(_emb_base(spark), _emb_queries(spark), k=5,
                           n_rows=table_rows(spark, sf_dir, "embeddings"))


ORACLE_COSINE_TOPK = f"""
with q as (select vec_id as id,
           list_transform(embedding, x -> round(x::double * {SIM.QUANT_SCALE})::bigint) as qv
           from embeddings),
n as (select id, qv, {SIM.duckdb_norm('qv', EMB_DIM)} as nrm from q),
p as (select qr.id as id_q, c.id as id_c,
             {SIM.duckdb_dot('qr.qv', 'c.qv', EMB_DIM)}::double / (qr.nrm * c.nrm) as cosine
      from n qr join n c on c.id <> qr.id
      where qr.id % 20 = 0),
r as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from p)
select id_q, id_c, rank::BIGINT as rank, cosine from r where rank <= 5
"""


def _emb_augmented(spark):
    """Corpus with deterministic near-duplicates planted: vec_id%10==0 rows
    re-appear under id+1000000 scaled by 1.01 (cosine ~ 1 with the
    original). Same construction as the DuckDB oracle."""
    base = _emb_base(spark)
    copies = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    return base.unionAll(copies)


def q_embedding_neardup(spark, sf_dir):
    load_views(spark, sf_dir)
    # sizing hint: base corpus (memoized count) + the ~10% planted copies —
    # keeps _auto_bands action-free (no per-run df.count(); VERDICT r7
    # 'What's wrong #3'); the miss bound is derived from the chosen band
    # shape, so the +-1-row hint inexactness cannot affect the oracle
    from data_diff_spark.streaming.events_stream import table_rows

    n = table_rows(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs_lsh(_emb_augmented(spark), threshold=0.99,
                                dim=EMB_DIM, n_rows=n + n // 10)


ORACLE_EMBEDDING_NEARDUP = f"""
with corpus as (
  select vec_id, list_transform(embedding, x -> x::double) as emb from embeddings
  union all
  select vec_id + 1000000, list_transform(embedding, x -> x::double * 1.01)
  from embeddings where vec_id % 10 = 0
),
q as (select vec_id as id, list_transform(emb, x -> round(x * {SIM.QUANT_SCALE})::bigint) as qv from corpus),
n as (select id, qv, {SIM.duckdb_norm('qv', EMB_DIM)} as nrm from q),
p as (select a.id as id_a, b.id as id_b,
             {SIM.duckdb_dot('a.qv', 'b.qv', EMB_DIM)}::double / (a.nrm * b.nrm) as cosine
      from n a join n b on a.id < b.id)
select id_a, id_b, cosine from p where cosine >= 0.99
"""


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the near-dup-augmented corpus:
    deterministic Lloyd cells, intra-cell cosine pairs, each row marked
    with its smallest lower-id duplicate. The planted copies (vec_id%10
    re-scaled by 1.01, cosine ~1) guarantee real duplicate structure for
    the gate to verify."""
    load_views(spark, sf_dir)
    return SIM.semdedup(_emb_augmented(spark), threshold=0.99, n_cells=16)


def _semdedup_oracle(threshold=0.99, n_cells=16, n_iter=2, train_cap=2048,
                     dim=EMB_DIM) -> str:
    """DuckDB replay of semdedup INCLUDING its training loop (the same
    Lloyd-CTE machinery as _ann_ivf_oracle, over the augmented corpus):
    assign every row to its nearest cell, compute intra-cell cosine pairs
    (zero-norm rows excluded — NaN cosine must never qualify), and mark
    each id's smallest lower-id neighbor at cosine >= threshold."""
    def dist(a, b):
        return SIM.duckdb_int_l2(a, b, dim)

    iter_sql, prev = _lloyd_iter_ctes(n_iter, dim)
    return f"""
with corpus as (
  select vec_id, list_transform(embedding, x -> x::double) as emb from embeddings
  union all
  select vec_id + 1000000, list_transform(embedding, x -> x::double * 1.01)
  from embeddings where vec_id % 10 = 0
),
q0 as (select vec_id as id,
        list_transform(emb, x -> round(x * {SIM.QUANT_SCALE})::bigint) as qv
       from corpus),
m as (select id, qv, {SIM.duckdb_norm('qv', dim)} as nrm from q0),
samp as (select qv, row_number() over (order by md5(id::varchar), id) as rn
         from m order by md5(id::varchar), id limit {train_cap}),
c0 as (select rn - 1 as cell, qv as cv from samp where rn <= {n_cells}),
{iter_sql},
acorp as (select id, qv, nrm, cell from (
            select m.id, m.qv, m.nrm, c.cell,
                   row_number() over (partition by m.id order by {dist('m.qv', 'c.cv')}, c.cell) as rk
            from m cross join {prev} c) t where rk = 1),
p as (select a.id, b.id as id_b,
             {SIM.duckdb_dot('a.qv', 'b.qv', dim)}::double / (a.nrm * b.nrm) as cosine
      from acorp a join acorp b on a.cell = b.cell and b.id < a.id
      where a.nrm > 0 and b.nrm > 0),
best as (select id, id_b, cosine,
                row_number() over (partition by id order by id_b, cosine) as rk
         from p where cosine >= {threshold})
select a.id, a.cell::BIGINT as cell, b.id_b as dup_of, b.cosine as dup_cosine
from acorp a left join (select * from best where rk = 1) b using (id)
"""


def q_semdedup_incremental(spark, sf_dir):
    """Persisted-layout SemDeDup increment as an oracle scope (r10
    VERDICT Next #1 — previously pytest-only): the embeddings table is
    written as the cell-partitioned IVF layout with frozen Lloyd
    centroids (write_ivf_layout), then the planted scaled copies
    (vec_id % 10, x1.01 — the same augmentation the full semdedup arm
    dedups) ingest against it via semdedup_incremental. The oracle
    replays the Lloyd training over the STORED corpus only (training is
    frozen at corpus build — the incremental contract), assigns
    old ∪ new to those centroids, and marks each NEW row's smallest
    lower-id cell neighbor at cosine >= threshold."""
    import tempfile

    load_views(spark, sf_dir)
    old = spark.table("embeddings")
    new = old.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    path = os.path.join(tempfile.gettempdir(), "dds_semdedup_gate",
                        os.path.basename(os.path.normpath(sf_dir)))
    # build-once: the persisted layout EXISTS in a real deployment — the
    # O(new) ingest probe is the operator under test
    _built_once(path, f"{sf_dir}|cells=16|write_ivf_layout-defaults",
                lambda: SIM.write_ivf_layout(old, path, n_cells=16),
                sf_dir=sf_dir)
    return SIM.semdedup_incremental(new, path, threshold=0.99)


def _semdedup_inc_oracle(threshold=0.99, n_cells=16, n_iter=2,
                         train_cap=2048, dim=None) -> str:
    """DuckDB replay of the incremental contract: Lloyd trains on the
    stored corpus ONLY (write_ivf_layout's md5-ordered bounded sample),
    old ∪ new assign to the frozen centroids, pairs restrict to new ids."""
    dim = dim if dim is not None else EMB_DIM

    def dist(a, b):
        return SIM.duckdb_int_l2(a, b, dim)

    iter_sql, prev = _lloyd_iter_ctes(n_iter, dim)
    return f"""
with old0 as (select vec_id as id,
        list_transform(embedding, x -> round(x::double * {SIM.QUANT_SCALE})::bigint) as qv
       from embeddings),
new0 as (select vec_id + 1000000 as id,
        list_transform(embedding, x -> round(x::double * 1.01 * {SIM.QUANT_SCALE})::bigint) as qv
       from embeddings where vec_id % 10 = 0),
m as (select id, qv, {SIM.duckdb_norm('qv', dim)} as nrm
      from (select * from old0 union all select * from new0)),
samp as (select qv, row_number() over (order by md5(id::varchar), id) as rn
         from (select id, qv from old0) o
         order by md5(id::varchar), id limit {train_cap}),
c0 as (select rn - 1 as cell, qv as cv from samp where rn <= {n_cells}),
{iter_sql},
acorp as (select id, qv, nrm, cell from (
            select m.id, m.qv, m.nrm, c.cell,
                   row_number() over (partition by m.id order by {dist('m.qv', 'c.cv')}, c.cell) as rk
            from m cross join {prev} c) t where rk = 1),
p as (select a.id, b.id as id_b,
             {SIM.duckdb_dot('a.qv', 'b.qv', dim)}::double / (a.nrm * b.nrm) as cosine
      from acorp a join acorp b on a.cell = b.cell and b.id < a.id
      where a.nrm > 0 and b.nrm > 0 and a.id >= 1000000),
best as (select id, id_b, cosine,
                row_number() over (partition by id order by id_b, cosine) as rk
         from p where cosine >= {threshold})
select a.id, a.cell::BIGINT as cell, b.id_b as dup_of, b.cosine as dup_cosine
from acorp a left join (select * from best where rk = 1) b using (id)
where a.id >= 1000000
"""


def q_embedding_neardup_all(spark, sf_dir):
    """LSH-bucketed cosine near-dup pairs AND SemDeDup's cluster-scoped
    duplicate marking over the same planted-duplicate corpus, as one
    scope-tagged relation (both are embedding near-dup semantics; the
    registry is capped at 50 entries), plus the persisted-layout
    incremental ingest as its own scope (r11). Columns are aligned: the
    semdedup legs report (id, dup_of, dup_cosine) as (id_a, id_b,
    cosine) plus the cell; the pairs leg carries a null cell."""
    # The three arms are independent pipelines whose CONSTRUCTION runs
    # internal actions (semdedup's Lloyd training collects, the
    # incremental arm's stored-layout fixture) — previously serial, the
    # r12 verdict's last >5s entry without the concurrent-arm treatment
    # (r13 phase probe: ~4.4s serial construct + ~4.3s drain warm). Build
    # them concurrently (_parallel_arms, guide §2.6); the arm OUTPUTS stay
    # lazy on purpose — the drain's single job overlaps all three
    # pipelines' stages, and the measured eager variant (persist+count
    # each arm, drain reads cache) LOST to this shape (7.6s vs 6.6s warm
    # min: three concurrent count jobs schedule the same work worse than
    # one drain job, and nothing here is multi-referenced at entry level).
    load_views(spark, sf_dir)

    raw_pairs, raw_sem, raw_inc = _parallel_arms(
        lambda: q_embedding_neardup(spark, sf_dir),
        lambda: q_semdedup(spark, sf_dir),
        lambda: q_semdedup_incremental(spark, sf_dir))
    pairs = raw_pairs.select(
        F.lit("pairs").alias("scope"), "id_a", "id_b", "cosine",
        F.lit(None).cast("long").alias("cell"),
    )
    sem = raw_sem.select(
        F.lit("semdedup").alias("scope"), F.col("id").alias("id_a"),
        F.col("dup_of").alias("id_b"), F.col("dup_cosine").alias("cosine"),
        "cell",
    )
    inc = raw_inc.select(
        F.lit("sem_inc").alias("scope"), F.col("id").alias("id_a"),
        F.col("dup_of").alias("id_b"), F.col("dup_cosine").alias("cosine"),
        "cell",
    )
    # derived selects drop the _ddspark_persisted attr, so re-attach the
    # raw frames' handles (operators' internal persists)
    return _track_persisted(
        pairs.unionAll(sem).unionAll(inc), [], raw_pairs, raw_sem, raw_inc)


ORACLE_EMBEDDING_NEARDUP_ALL = f"""
select 'pairs' as scope, id_a, id_b, cosine, NULL::BIGINT as cell
from ({{pairs}})
union all
select 'semdedup' as scope, id as id_a, dup_of as id_b, dup_cosine as cosine, cell
from ({{sem}})
union all
select 'sem_inc' as scope, id as id_a, dup_of as id_b, dup_cosine as cosine, cell
from ({{sem_inc}})
"""


def q_ann_topk_ivf(spark, sf_dir):
    """IVF approximate top-k. The coarse quantizer is the deterministic
    integer Lloyd of train_ivf_centroids (md5-ordered bounded sample, exact
    int64 assignment/update), so the whole pipeline — training included —
    is replayed by the DuckDB oracle and hash-matched."""
    load_views(spark, sf_dir)
    return SIM.ivf_topk(_emb_base(spark), _emb_queries(spark), k=5, n_cells=16)


# ADC candidate depth for the gated re-rank arm (the production knob is
# ivf_pq_topk's rerank=; tools/probe_pq_rerank.py sizes it at corpus scale)
_GATE_RERANK = 20


def q_ann_topk_ivf_all(spark, sf_dir):
    """Three scoped arms off the same coarse quantizer:

      scope='ivf'        ivf_topk — exact cosine re-rank inside probed
                         cells;
      scope='ivf_pq'     ivf_pq_topk — the memory-bound 100 TB path:
                         ranking reads only m=8 PQ codes per candidate
                         (ADC lookup tables), never the raw vectors. The
                         oracle replays coarse training, all m subspace
                         codebook trainings, the encode argmin, and ADC
                         (as dot(query, reconstruction) — equal by
                         linearity) end-to-end;
      scope='ivf_pq_rr'  the ADC-then-exact re-rank stage (r9 VERDICT
                         Next #2): exact_rerank over the ADC top-20
                         candidate set, re-ranked to top-5 by exact
                         cosine — the recall-recovery stage the 0.632
                         PQ recall at 200k demanded. One ADC pass feeds
                         both PQ scopes (ivf_pq is the rank<=5 prefix of
                         the same total ADC ordering ivf_pq_topk(k=5)
                         computes), so the entry never trains or encodes
                         twice for them.
    """
    load_views(spark, sf_dir)
    base, qs = _emb_base(spark), _emb_queries(spark)
    from data_diff_spark.streaming.events_stream import table_rows

    # the gate PINS n_cells=16: a static SQL oracle cannot replay the
    # size-dependent auto cell count (ann_topk_lsh precedent). The row
    # hint only routes the exact re-rank/encode folds to their BLAS
    # parity paths above sf0.01 — values identical, oracle unaffected.
    n = table_rows(spark, sf_dir, "embeddings")
    # scope='ivf_auto' (r10 VERDICT Next #2): the PRODUCTION auto shape —
    # n_cells derived from the corpus size (rows/1000, floor 16), the
    # default a user gets — gated against a SELF-SIZING oracle whose
    # n_cells/train_cap are scalar subqueries over the same corpus, so
    # ONE static SQL replays whatever shape the data derives. The raw
    # embeddings table is small enough that both gate sfs would derive
    # the floor (16), so the auto scope runs over a deterministic
    # replica-augmented corpus (circular-shift replicas, replayed in
    # SQL) sized so sf0.01 derives 16 and sf0.1 derives 24 — two
    # genuinely different shapes through the same derivation.
    au_corpus = _emb_auto_corpus(base)

    # The three arms each run their own training actions at construction
    # (coarse Lloyd collects; the adc arm additionally the m subspace
    # codebook trainings) — independent pipelines over different
    # corpora/shapes, so they construct CONCURRENTLY (_parallel_arms,
    # guide §2.6) instead of back-to-back. auto/adc are ALSO materialized
    # EAGERLY inside their thunks (the _must_equal lesson): the four arms
    # union into ONE action, and a lazily-persisted subtree with two
    # consumers (adc feeds both PQ scopes) or an expensive sibling (the
    # auto arm's 12x corpus) gets its partitions raced/recomputed inside
    # that action.
    def _b_auto():
        a = SIM.ivf_topk(
            au_corpus,
            au_corpus.filter((F.col("vec_id") % 20 == 0)
                             & (F.col("vec_id") < _AUTO_REPLICA_STRIDE)),
            k=5, n_rows=n * _AUTO_REPLICAS).persist()
        a.count()
        return a

    def _b_adc():
        a = SIM.ivf_pq_topk(base, qs, k=_GATE_RERANK, n_cells=16,
                            n_rows=n).persist()
        a.count()
        return a

    ivf, auto, adc = _parallel_arms(
        lambda: SIM.ivf_topk(base, qs, k=5, n_cells=16, n_rows=n),
        _b_auto, _b_adc)
    # scope='ivf_pq' verifies BOTH routes to the same ADC top-5 (r11
    # VERDICT Next #4): the in-memory rank<=5 prefix of the k=20 ADC
    # ordering, and ivf_pq_topk_from_layout reading a PERSISTED codes-only
    # layout (pq_meta.json + cell-partitioned parquet — the deployment
    # shape, where the index exists and a fresh session queries by path).
    # Training is deterministic, so layout codes == in-memory codes and
    # any drift in the write/read/metadata round trip adds symmetric-
    # difference rows that break the row-count + hash gate. _built_once:
    # constructing the index is write_ivf_pq_layout's job, not the query's.
    import tempfile

    pq_path = os.path.join(tempfile.gettempdir(), "dds_ivfpq_gate",
                           os.path.basename(os.path.normpath(sf_dir)))
    _built_once(pq_path,
                f"{sf_dir}|cells=16|m=8|kc=16|write_ivf_pq_layout-defaults",
                lambda: SIM.write_ivf_pq_layout(base, pq_path, n_cells=16,
                                                n_rows=n),
                sf_dir=sf_dir)
    pq = _must_equal(adc.filter(F.col("rank") <= 5),
                     SIM.ivf_pq_topk_from_layout(spark, pq_path, qs, k=5))
    rr = SIM.exact_rerank(adc, base, qs, k=5, n_rows=n)
    out = (
        ivf.select(F.lit("ivf").alias("scope"), "*")
        .unionAll(auto.select(F.lit("ivf_auto").alias("scope"), "*"))
        .unionAll(pq.select(F.lit("ivf_pq").alias("scope"), "*"))
        .unionAll(rr.select(F.lit("ivf_pq_rr").alias("scope"), "*"))
    )
    return _track_persisted(out, [adc, auto], ivf, adc, pq, rr)


def _lloyd_iter_ctes(n_iter: int, dim: int, prefix: str = "") -> Tuple[str, str]:
    """Unrolled deterministic integer Lloyd iterations as DuckDB CTEs —
    bit-identical replay of train_ivf_centroids' numpy int64 arithmetic
    (floored integer centroid means, assignment ties to the lowest cell).
    Assumes CTEs `{prefix}samp` (rn, qv — the md5-ordered bounded sample)
    and `{prefix}c0` (cell, cv — the seeds) exist; `prefix` lets two
    independently-sized trainings coexist in one WITH (the pinned-16 and
    the auto-shape chains). Returns (iter_sql, final_cte_name)."""
    def dist(a, b):
        return SIM.duckdb_int_l2(a, b, dim)

    iters = []
    p = prefix
    prev = f"{p}c0"
    for it in range(1, n_iter + 1):
        iters.append(f"""
{p}a{it} as (select rn, qv, cell from (
         select s.rn, s.qv, c.cell,
                row_number() over (partition by s.rn order by {dist('s.qv', 'c.cv')}, c.cell) as rk
         from {p}samp s cross join {prev} c) t where rk = 1),
{p}u{it} as (select cell, list(cv order by dim) as cv from (
         select cell, dim, cast(floor(sum(val)::double / count(*)) as bigint) as cv from (
           select cell, unnest(qv) as val, unnest(range(1, {dim + 1})) as dim from {p}a{it}) z
         group by cell, dim) g group by cell),
{p}c{it} as (select {prev}.cell, coalesce({p}u{it}.cv, {prev}.cv) as cv
          from {prev} left join {p}u{it} using (cell))""")
        prev = f"{p}c{it}"
    return ",".join(iters), prev


def _ann_ivf_oracle(k=5, n_cells=16, n_probe=4, n_iter=2, train_cap=2048, dim=EMB_DIM) -> str:
    """DuckDB replay of ivf_topk including its training loop: seeds = first
    n_cells rows in md5(id) order, n_iter unrolled Lloyd iterations with
    floored integer centroid means, ties broken to the lowest cell —
    bit-identical to train_ivf_centroids' numpy int64 arithmetic."""
    def dist(a, b):
        return SIM.duckdb_int_l2(a, b, dim)

    iter_sql, prev = _lloyd_iter_ctes(n_iter, dim)
    return f"""
with n as (select vec_id as id,
            list_transform(embedding, x -> round(x::double * {SIM.QUANT_SCALE})::bigint) as qv
           from embeddings),
m as (select id, qv, {SIM.duckdb_norm('qv', dim)} as nrm from n),
samp as (select qv, row_number() over (order by md5(id::varchar), id) as rn
         from m order by md5(id::varchar), id limit {train_cap}),
c0 as (select rn - 1 as cell, qv as cv from samp where rn <= {n_cells}),
{iter_sql},
acorp as (select id, qv, nrm, cell from (
            select m.id, m.qv, m.nrm, c.cell,
                   row_number() over (partition by m.id order by {dist('m.qv', 'c.cv')}, c.cell) as rk
            from m cross join {prev} c) t where rk = 1),
probe as (select id_q, qv_q, nrm_q, cell from (
            select q.id as id_q, q.qv as qv_q, q.nrm as nrm_q, c.cell,
                   row_number() over (partition by q.id order by {dist('q.qv', 'c.cv')}, c.cell) as rk
            from m q cross join {prev} c where q.id % 20 = 0) t where rk <= {n_probe}),
p as (select pr.id_q, a.id as id_c,
             {SIM.duckdb_dot('pr.qv_q', 'a.qv', dim)}::double / (pr.nrm_q * a.nrm) as cosine
      from acorp a join probe pr on a.cell = pr.cell where a.id <> pr.id_q),
r as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from p)
select id_q, id_c, rank::BIGINT as rank, cosine from r where rank <= {k}
"""


def _pq_lloyd_ctes(mi: int, off: int, ds: int, n_iter: int, k_codes: int) -> Tuple[str, str]:
    """Per-subspace PQ codebook training as unrolled CTEs — the subspace
    analogue of _lloyd_iter_ctes, bit-identical to train_pq_codebooks'
    numpy loop (same md5-ordered `samp`, seeds = first k_codes subvectors,
    argmin ties to the lowest code, floored integer means). Names are
    prefixed p{mi}_ so all m chains coexist in one WITH."""
    def dist(a, b):
        return SIM.duckdb_int_l2(a, b, ds)

    p = f"p{mi}"
    ctes = [f"""
{p}s as (select rn, qv[{off + 1}:{off + ds}] as sv from samp),
{p}c0 as (select rn - 1 as code, sv as cv from {p}s where rn <= {k_codes})"""]
    prev = f"{p}c0"
    for it in range(1, n_iter + 1):
        ctes.append(f"""
{p}a{it} as (select rn, sv, code from (
         select s.rn, s.sv, c.code,
                row_number() over (partition by s.rn order by {dist('s.sv', 'c.cv')}, c.code) as rk
         from {p}s s cross join {prev} c) t where rk = 1),
{p}u{it} as (select code, list(cv order by dim) as cv from (
         select code, dim, cast(floor(sum(val)::double / count(*)) as bigint) as cv from (
           select code, unnest(sv) as val, unnest(range(1, {ds + 1})) as dim from {p}a{it}) z
         group by code, dim) g group by code),
{p}c{it} as (select {prev}.code, coalesce({p}u{it}.cv, {prev}.cv) as cv
          from {prev} left join {p}u{it} using (code))""")
        prev = f"{p}c{it}"
    return ",".join(ctes), prev


def _ann_ivf_all_oracle(k=5, n_cells=16, n_probe=4, n_iter=2, train_cap=2048,
                        m=8, k_codes=16, dim=EMB_DIM, rerank=None) -> str:
    if rerank is None:
        rerank = _GATE_RERANK
    """One WITH replaying BOTH arms off shared coarse CTEs: scope='ivf'
    is the existing ivf_topk replay; scope='ivf_pq' additionally replays
    the m per-subspace codebook trainings, the encode argmin, and ADC —
    computed by linearity as dot(query, reconstructed vector), which
    equals the Spark side's m lookup-table reads integer-for-integer."""
    def dist(a, b):
        return SIM.duckdb_int_l2(a, b, dim)

    ds = dim // m
    iter_sql, prev = _lloyd_iter_ctes(n_iter, dim)
    au_iter, au_prev = _lloyd_iter_ctes(n_iter, dim, prefix="au_")
    pq_chains, pq_finals = [], []
    for mi in range(m):
        c, fin = _pq_lloyd_ctes(mi, mi * ds, ds, n_iter, k_codes)
        pq_chains.append(c)
        pq_finals.append(fin)
    enc = ",".join(f"""
e{mi} as (select id, code from (
    select a.id, c.code,
           row_number() over (partition by a.id
               order by {SIM.duckdb_int_l2(f'a.qv[{mi * ds + 1}:{mi * ds + ds}]', 'c.cv', ds)}, c.code) as rk
    from acorp a cross join {pq_finals[mi]} c) t where rk = 1)"""
        for mi in range(m))
    enc_joins = " ".join(f"join e{mi} using (id)" for mi in range(m))
    rv_concat = " || ".join(f"b{mi}.cv" for mi in range(m))
    book_joins = " ".join(
        f"join {pq_finals[mi]} b{mi} on b{mi}.code = e{mi}.code" for mi in range(m)
    )
    return f"""
with n as (select vec_id as id,
            list_transform(embedding, x -> round(x::double * {SIM.QUANT_SCALE})::bigint) as qv
           from embeddings),
m as (select id, qv, {SIM.duckdb_norm('qv', dim)} as nrm from n),
samp as (select qv, row_number() over (order by md5(id::varchar), id) as rn
         from m order by md5(id::varchar), id limit {train_cap}),
c0 as (select rn - 1 as cell, qv as cv from samp where rn <= {n_cells}),
{iter_sql},
acorp as (select id, qv, nrm, cell from (
            select m.id, m.qv, m.nrm, c.cell,
                   row_number() over (partition by m.id order by {dist('m.qv', 'c.cv')}, c.cell) as rk
            from m cross join {prev} c) t where rk = 1),
probe as (select id_q, qv_q, nrm_q, cell from (
            select q.id as id_q, q.qv as qv_q, q.nrm as nrm_q, c.cell,
                   row_number() over (partition by q.id order by {dist('q.qv', 'c.cv')}, c.cell) as rk
            from m q cross join {prev} c where q.id % 20 = 0) t where rk <= {n_probe}),
p as (select pr.id_q, a.id as id_c,
             {SIM.duckdb_dot('pr.qv_q', 'a.qv', dim)}::double / (pr.nrm_q * a.nrm) as cosine
      from acorp a join probe pr on a.cell = pr.cell where a.id <> pr.id_q),
r as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from p),
{",".join(pq_chains)},
{enc},
recon as (select a.id, {rv_concat} as rv
          from acorp a {enc_joins} {book_joins}),
rnorms as (select id, sqrt({SIM.duckdb_dot('rv', 'rv', dim)}::double) as rnrm from recon),
ppq as (select pr.id_q, a.id as id_c,
               {SIM.duckdb_dot('pr.qv_q', 're.rv', dim)}::double / (pr.nrm_q * rn.rnrm) as cosine
        from acorp a join probe pr on a.cell = pr.cell
        join recon re on re.id = a.id join rnorms rn on rn.id = a.id
        where a.id <> pr.id_q),
rpq as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from ppq),
qsel as (select id, qv, nrm from m where id % 20 = 0),
rrp as (select cnd.id_q, cnd.id_c,
               {SIM.duckdb_dot('q.qv', 'a.qv', dim)}::double / (q.nrm * a.nrm) as cosine
        from (select id_q, id_c from rpq where rank <= {rerank}) cnd
        join acorp a on a.id = cnd.id_c
        join qsel q on q.id = cnd.id_q),
rrk as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from rrp),
-- AUTO-SIZED chain (r10 VERDICT Next #2): the oracle sizes ITSELF from
-- the data — n_cells = max(16, ceil(rows/1000)) and the grown training
-- cap as scalar subqueries — so ONE static SQL string replays the
-- PRODUCTION auto shape at every sf. The auto corpus is the replica
-- augmentation (circular shifts) sized so sf0.01 derives 16 cells and
-- sf0.1 derives 24 (two different shapes through the same derivation).
au_raw as (select vec_id + rs.r * {_AUTO_REPLICA_STRIDE} as id,
                  embedding[rs.r + 1:{dim}] || embedding[1:rs.r] as emb
           from embeddings cross join
                (select unnest(range(0, {_AUTO_REPLICAS})) as r) rs),
au_m as (select id, qv, {SIM.duckdb_norm('qv', dim)} as nrm from (
           select id, list_transform(emb, x -> round(x::double * {SIM.QUANT_SCALE})::bigint) as qv
           from au_raw) t),
au_sz as (select greatest(16, cast(ceil(count(*) / 1000.0) as bigint)) as cells from au_m),
au_cap as (select greatest({train_cap}, 2 * cells) as cap from au_sz),
au_samp as (select qv, rn from (
            select qv, row_number() over (order by md5(id::varchar), id) as rn from au_m) t
            where rn <= (select cap from au_cap)),
au_c0 as (select rn - 1 as cell, qv as cv from au_samp
          where rn <= (select cells from au_sz)),
{au_iter},
au_acorp as (select id, qv, nrm, cell from (
            select m.id, m.qv, m.nrm, c.cell,
                   row_number() over (partition by m.id order by {dist('m.qv', 'c.cv')}, c.cell) as rk
            from au_m m cross join {au_prev} c) t where rk = 1),
au_probe as (select id_q, qv_q, nrm_q, cell from (
            select q.id as id_q, q.qv as qv_q, q.nrm as nrm_q, c.cell,
                   row_number() over (partition by q.id order by {dist('q.qv', 'c.cv')}, c.cell) as rk
            from au_m q cross join {au_prev} c
            where q.id % 20 = 0 and q.id < {_AUTO_REPLICA_STRIDE}) t where rk <= {n_probe}),
au_p as (select pr.id_q, a.id as id_c,
             {SIM.duckdb_dot('pr.qv_q', 'a.qv', dim)}::double / (pr.nrm_q * a.nrm) as cosine
      from au_acorp a join au_probe pr on a.cell = pr.cell where a.id <> pr.id_q),
au_r as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from au_p)
select 'ivf' as scope, id_q, id_c, rank::BIGINT as rank, cosine from r where rank <= {k}
union all
select 'ivf_auto' as scope, id_q, id_c, rank::BIGINT as rank, cosine from au_r where rank <= {k}
union all
select 'ivf_pq' as scope, id_q, id_c, rank::BIGINT as rank, cosine from rpq where rank <= {k}
union all
select 'ivf_pq_rr' as scope, id_q, id_c, rank::BIGINT as rank, cosine from rrk where rank <= {k}
"""


ANN_RECALL_CLAIM = 0.9  # the auto-mode batch-recall bound the gate asserts


def q_ann_topk_lsh(spark, sf_dir):
    """Approximate top-k (LSH bucket-restricted), two scoped arms:

      scope='topk'         the PINNED 8x4 shape: hyperplanes are
                           md5-derived integers, dot products exact
                           int64, so the bucket restriction is
                           deterministic and the DuckDB oracle replays
                           the identical band codes and hash-matches (a
                           static SQL oracle cannot replay the
                           corpus-size-dependent auto shape);
      scope='auto_recall'  the PRODUCTION DEFAULT (occupancy-ruled auto
                           width + multi-probe, the corpus-growth story)
                           gated HLL-style (r8 VERDICT Next #5): Spark
                           computes batch recall of the auto top-k
                           against its own exact top-k and emits the
                           literal claim bound when recall >=
                           ANN_RECALL_CLAIM, else the failing recall —
                           the oracle emits the bound unconditionally,
                           so any recall dip hash-mismatches the gate.
                           'n_queries' pins the batch size to the
                           oracle's own count of the query set.
                           Measured: recall 1.0 at sf0.01, 0.968 at
                           sf0.1 (margin over the 0.9 claim);
                           corpus-growth behavior in
                           tools/probe_ann_growth.py."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    base, qs = _emb_base(spark), _emb_queries(spark)
    n = table_rows(spark, sf_dir, "embeddings")
    # n_rows on the PINNED shape: bands/rows_per_band are both given, so
    # the hint cannot change the bucket restriction — it only routes the
    # exact re-rank fold to its BLAS parity path above the corpus-rows
    # dispatch threshold (sf0.001/sf0.01 gates stay on the SQL fold;
    # sf0.1 dispatches — values bit-identical either way, parity pinned:
    # similarity._PAIRS_TOPK_BLAS_MIN_ROWS)
    pinned = SIM.ann_topk_lsh(base, qs, k=5, bands=8, rows_per_band=4,
                              dim=EMB_DIM, n_rows=n).persist()
    topk = pinned.select(
        F.lit("topk").alias("scope"),
        F.concat_ws(":", "id_q", "rank").alias("k"),
        F.col("id_c").cast("string").alias("v_str"),
        F.col("cosine").cast("double").alias("v_num"),
    )
    # The three expensive subtrees — pinned shape, production auto shape,
    # exact baseline — are independent pipelines: persist each and
    # materialize them CONCURRENTLY (the _must_equal pattern, guide §2.6
    # overlap), so the drain job only reads cache. Eager materialization
    # of `auto` is also a correctness-of-measurement fix: it feeds BOTH
    # the recall join and the auto_topk value gate (r10 VERDICT Next #2 —
    # occupancy-ruled width + multi-probe, replayed row-by-row by a
    # SELF-SIZING oracle: sf0.01 derives r=4, sf0.1 r=5), and a
    # lazily-persisted subtree with two concurrent first readers in the
    # one drain action gets its partitions raced/recomputed (the r12
    # phase probe caught the drain paying the ~6s auto pipeline twice).
    auto = SIM.ann_topk_lsh(base, qs, k=5, dim=EMB_DIM, n_rows=n).persist()
    exact = SIM.cosine_topk(base, qs, k=5, n_rows=n).persist()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(lambda h: h.count(), (pinned, auto, exact)))
    autok = auto.select(
        F.lit("auto_topk").alias("scope"),
        F.concat_ws(":", "id_q", "rank").alias("k"),
        F.col("id_c").cast("string").alias("v_str"),
        F.col("cosine").cast("double").alias("v_num"),
    )
    # one pass: exact LEFT JOIN auto marks hits, one aggregation yields
    # (nq, hits), and BOTH output rows explode from that single 1-row
    # frame — the exact-oracle subtree (the documented brute-force
    # baseline, the same BNLJ as cosine_topk_exact) appears ONCE in the
    # plan instead of once per union branch
    j = exact.select("id_q", "id_c").join(
        auto.select("id_q", "id_c").withColumn("_hit", F.lit(1)),
        ["id_q", "id_c"], "left")
    rec = j.agg(
        F.countDistinct("id_q").alias("nq"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("hits"),
    ).select(
        (F.col("hits").cast("double") / (5.0 * F.col("nq"))).alias("recall"),
        "nq",
    )
    rows2 = rec.select(F.explode(F.array(
        F.struct(
            F.lit("batch").alias("k"),
            F.when(F.col("recall") >= ANN_RECALL_CLAIM,
                   F.lit(ANN_RECALL_CLAIM))
             .otherwise(F.col("recall")).cast("double").alias("v_num")),
        F.struct(
            F.lit("n_queries").alias("k"),
            F.col("nq").cast("double").alias("v_num")),
    )).alias("s")).select(
        F.lit("auto_recall").alias("scope"), F.col("s.k").alias("k"),
        F.lit(None).cast("string").alias("v_str"),
        F.col("s.v_num").alias("v_num"),
    )
    return _track_persisted(topk.unionAll(autok).unionAll(rows2),
                            [pinned, auto, exact])


def _ann_lsh_oracle(k=5, bands=8, rows_per_band=4, dim=EMB_DIM,
                    max_rpb=24, n_flip=4) -> str:
    """DuckDB replay of ann_topk_lsh: same plane matrix (plane_coefficients
    on both sides), same sign/packing arithmetic, same candidate join;
    plus the auto_recall claim rows (the bound literal — Spark only
    matches it when its measured recall clears the bound — and the
    query-set size recomputed independently); plus the FULL auto-shape
    replay (scope='auto_topk', r10 VERDICT Next #2): rows_per_band from
    the occupancy rule as a scalar subquery (the 192-plane literal's
    prefix is the derived shape's plane set — plane_coefficients is
    prefix-stable), margin-guided multi-probe (per band, flip each of
    the n_flip lowest-|projection| bits, ties by plane position), exact
    cosine re-rank. ONE static SQL string replays the production shape
    at any sf."""
    planes = SIM.duckdb_planes_literal(bands, rows_per_band, dim)
    code_terms = " + ".join(
        f"bits[b.band_idx * {rows_per_band} + {r + 1}] * {1 << r}"
        for r in range(rows_per_band)
    )
    # plane literal wide enough for the clamp ceiling; the derived shape
    # uses its first bands*r rows
    planes_wide = SIM.duckdb_planes_literal(bands, max_rpb, dim)
    dot_pl = SIM.duckdb_dot("d.qv", "p.pl[pi]", dim)
    margin_struct = ("{'m': abs(d.dots[c.band_idx * d.r + j + 1]), 'j': j}")
    return f"""
with n as (select vec_id as id,
            list_transform(embedding, x -> round(x::double * {SIM.QUANT_SCALE})::bigint) as qv
           from embeddings),
m as (select id, qv, {SIM.duckdb_norm('qv', dim)} as nrm,
        list_transform({planes},
          p -> case when {SIM.duckdb_dot('qv', 'p', dim)} > 0 then 1 else 0 end) as bits
      from n),
codes as (select id, qv, nrm, b.band_idx, {code_terms} as code
          from m cross join (select unnest(range(0, {bands})) as band_idx) b),
p as (select distinct q.id as id_q, c.id as id_c,
             {SIM.duckdb_dot('q.qv', 'c.qv', dim)}::double / (q.nrm * c.nrm) as cosine
      from codes c join codes q on c.band_idx = q.band_idx and c.code = q.code
      where q.id % 20 = 0 and c.id <> q.id),
r as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank from p),
au2_sz as (select least({max_rpb}, greatest({rows_per_band},
             cast(ceil(log2(greatest(2.0, count(*) / 64.0))) as bigint))) as r
           from n),
au2_pl as (select {planes_wide} as pl),
au2_d as (select d.id, d.qv, d.nrm, s.r,
            list_transform(generate_series(1, {bands} * s.r),
              pi -> {dot_pl}) as dots
          from (select id, qv, nrm from m) d, au2_sz s, au2_pl p),
au2_codes as (
  select d.id, d.r, b.band_idx,
         list_sum(list_transform(generate_series(0, d.r - 1),
           j -> case when d.dots[b.band_idx * d.r + j + 1] > 0
                     then (1::bigint << j) else 0::bigint end))::bigint as code
  from au2_d d cross join (select unnest(range(0, {bands})) as band_idx) b),
au2_qb as (
  select c.id, c.band_idx, c.code,
         list_transform(
           list_sort(list_transform(generate_series(0, d.r - 1),
             j -> {margin_struct}))[1:{n_flip}],
           s -> s.j) as flips
  from au2_codes c join au2_d d using (id)
  where c.id % 20 = 0),
au2_probe as (
  select distinct id, band_idx, code from (
    select id, band_idx, code from au2_qb
    union all
    select id, band_idx, xor(code, (1::bigint << f)) as code
    from au2_qb, unnest(flips) as t(f))),
au2_cand as (select distinct q.id as id_q, c.id as id_c
  from au2_probe q join au2_codes c
    on c.band_idx = q.band_idx and c.code = q.code
  where c.id <> q.id),
au2_p as (select cand.id_q, cand.id_c,
            {SIM.duckdb_dot('qq.qv', 'cc.qv', dim)}::double / (qq.nrm * cc.nrm) as cosine
  from au2_cand cand
  join au2_d qq on qq.id = cand.id_q
  join au2_d cc on cc.id = cand.id_c),
au2_r as (select *, row_number() over (partition by id_q order by cosine desc, id_c) as rank
          from au2_p)
select 'topk' as scope, id_q || ':' || rank as k, id_c::varchar as v_str, cosine as v_num
from r where rank <= {k}
union all
select 'auto_topk' as scope, id_q || ':' || rank as k, id_c::varchar as v_str, cosine as v_num
from au2_r where rank <= {k}
union all
select 'auto_recall', 'batch', cast(null as varchar), {ANN_RECALL_CLAIM}
union all
select 'auto_recall', 'n_queries', cast(null as varchar),
       (select count(*) from embeddings where vec_id % 20 = 0)::double
"""


# --- multimodal plumbing (beyond-reference) ---------------------------------

from data_diff_spark.functions import multimodal as MM


def q_multimodal_features(spark, sf_dir):
    """Binary media column + Arrow-batched mapInPandas feature extraction
    (the real-decoder template with the deterministic fake decoder). The
    whole Python round-trip is oracle-checked: byte counts, md5 digests and
    byte means must match DuckDB's view of the same bytes."""
    load_views(spark, sf_dir)
    media = MM.attach_fake_media(spark.table("documents"))
    return MM.extract_features(media)


def q_image_decode_features(spark, sf_dir):
    """REAL image decode path: deterministic P6 (netpbm) images generated
    per doc, decoded by the pure-numpy codec inside mapInPandas, per-channel
    pixel means emitted. The oracle recomputes the same pixels
    arithmetically in SQL — two independent routes to identical doubles
    (functions/multimodal.py)."""
    load_views(spark, sf_dir)
    media = MM.attach_ppm_media(spark.table("documents"))
    return MM.extract_image_features(media)


def q_webp_decode_features(spark, sf_dir):
    """REAL WebP decode path: the same deterministic pixels as the P6 leg,
    round-tripped through LOSSLESS WebP (libwebp encode via ctypes; decode
    through the full RIFF dispatch in functions/webp.py, whose native VP8L
    implementation is conformance-pinned against libwebp in
    tests/test_webp.py). Lossless means the arithmetic pixel oracle of the
    P6 leg applies to this container format unchanged."""
    load_views(spark, sf_dir)
    media = MM.attach_webp_media(spark.table("documents"))
    return MM.extract_image_features(media).select(
        "doc_id",
        F.col("width").alias("webp_width"),
        F.col("height").alias("webp_height"),
        F.col("mean_r").alias("webp_mean_r"),
        F.col("mean_g").alias("webp_mean_g"),
        F.col("mean_b").alias("webp_mean_b"),
    )


def q_audio_decode_features(spark, sf_dir):
    """REAL audio decode path: deterministic mono PCM16 WAV clips generated
    per doc, RIFF-parsed by the pure-numpy codec inside mapInPandas; RMS
    and zero-crossing counts hash-matched against the oracle's arithmetic
    replay of the same samples (functions/multimodal.py)."""
    load_views(spark, sf_dir)
    media = MM.attach_wav_media(spark.table("documents"))
    return MM.extract_audio_features(media)


ORACLE_MULTIMODAL = """
select doc_id, length(text)::BIGINT as n_bytes, md5(text) as content_md5,
       case when length(text) > 0 then
         list_sum(list_transform(generate_series(1, length(text)),
                                 i -> ascii(substring(text, i, 1))))::double / length(text)
       else 0.0 end as byte_mean
from documents
"""


# --- JSON surface (reference JSON ColType, database_types.py:273-275) -------


def q_events_json_extract(spark, sf_dir):
    """JSON path extraction + typed aggregation over events.props — the
    reference compares JSON as minified strings (normalize_json); here the
    engine also computes on extracted values."""
    load_views(spark, sf_dir)
    return (
        spark.table("events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_EVENTS_JSON = """
select event_type, count(*) as n,
       sum((props->>'$.k')::BIGINT)::BIGINT as sum_k,
       min((props->>'$.k')::BIGINT) as min_k,
       max((props->>'$.k')::BIGINT) as max_k
from events group by event_type
"""


def q_collect_stats_lineitem(spark, sf_dir):
    """Per-table stats pass (reference _collect_stats,
    joindiff_tables.py:268-305): count + sum of every numeric compared
    column in one aggregation. Sums go through decimal for cross-engine
    determinism."""
    load_views(spark, sf_dir)
    keys = ["l_orderkey", "l_linenumber"]
    extras = [c for c in LINEITEM_DIFF_COLS if c not in keys]
    t = table_segment(spark.table("lineitem").select(*LINEITEM_DIFF_COLS), keys, extra_columns=extras)
    from pyspark.sql import types as T

    numeric = [f.name for f in t.schema.fields
               if f.name in t.relevant_columns and isinstance(f.dataType, T.NumericType)]
    return t.make_select().agg(
        F.count(F.lit(1)).alias("count"),
        *[F.sum(F.col(c).cast("decimal(38,4)")).cast("double").alias(f"sum_{c}") for c in numeric],
    )


ORACLE_COLLECT_STATS = """
select count(*) as count,
       cast(sum(cast(l_orderkey as decimal(38,4))) as double) as sum_l_orderkey,
       cast(sum(cast(l_linenumber as decimal(38,4))) as double) as sum_l_linenumber,
       cast(sum(cast(l_partkey as decimal(38,4))) as double) as sum_l_partkey,
       cast(sum(cast(l_suppkey as decimal(38,4))) as double) as sum_l_suppkey,
       cast(sum(cast(l_quantity as decimal(38,4))) as double) as sum_l_quantity,
       cast(sum(cast(l_extendedprice as decimal(38,4))) as double) as sum_l_extendedprice,
       cast(sum(cast(l_discount as decimal(38,4))) as double) as sum_l_discount,
       cast(sum(cast(l_tax as decimal(38,4))) as double) as sum_l_tax
from lineitem
"""


def q_collect_stats_all(spark, sf_dir):
    """The stats pass AND the table-health surface that consumes it, as
    one scoped relation (r9 VERDICT Next #1 — validate/profile were
    implemented + pytest-pinned but had no CORRECTNESS row):

      scope='stats'     the reference _collect_stats wide row
                        (joindiff_tables.py:268-305), unpivoted;
      scope='validate'  operators/validate.py rules over lineitem — the
                        dbt-schema-test analogue (the reference's PK
                        discovery reads exactly these tests,
                        dbt_parser.py:468-504): one aggregation pass for
                        all scan rules + broadcast left-anti joins for
                        the two referential rules, a deliberate mix of
                        passing and failing rules so the counts are
                        load-bearing;
      scope='profile'   the ANALYZE-style column profiler's exactly-
                        replayable core (count/nulls/exact distinct/
                        min/max over four types); mean + approx
                        percentiles stay pytest-pinned (approximate
                        sketches aren't DuckDB-replayable — same
                        precedent as the HLL ndv arm's bounded-error
                        gate)."""
    from data_diff_spark.operators import validate as V

    load_views(spark, sf_dir)
    # ONE persisted narrow projection feeds all three arms (r10 VERDICT
    # Next #3 — the scopes used to pay three separate parquet scans of
    # lineitem): the union of the stats columns, every validated column,
    # and the profiled columns. Materialized eagerly so the union action
    # reads cache instead of racing three first-readers through the scan
    # (the _must_equal lesson). The operators themselves are untouched —
    # the gate still drives validate()/profile()/the stats agg verbatim,
    # just over the cached frame.
    _narrow_cols = sorted(set(LINEITEM_DIFF_COLS) | {
        "l_returnflag", "l_linestatus", "l_quantity", "l_linenumber",
        "l_shipdate", "l_orderkey", "l_suppkey"})
    li = spark.table("lineitem").select(*_narrow_cols).persist()
    li.count()

    keys = ["l_orderkey", "l_linenumber"]
    t = table_segment(li.select(*LINEITEM_DIFF_COLS), keys,
                      extra_columns=[c for c in LINEITEM_DIFF_COLS if c not in keys])
    from pyspark.sql import types as T

    numeric = [f.name for f in t.schema.fields
               if f.name in t.relevant_columns and isinstance(f.dataType, T.NumericType)]
    wide = t.make_select().agg(
        F.count(F.lit(1)).alias("count"),
        *[F.sum(F.col(c).cast("decimal(38,4)")).cast("double").alias(f"sum_{c}")
          for c in numeric],
    )
    stat_cols = wide.columns  # count, sum_*
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as double)" for c in stat_cols
    )
    stats = wide.select(
        F.expr(f"stack({len(stat_cols)}, {stack_args}) as (k, v_num)")
    ).select(
        F.lit("stats").alias("scope"), "k",
        F.lit(None).cast("string").alias("v_str"), "v_num",
    )
    rules = [
        V.not_null("l_orderkey"),
        V.unique("l_orderkey"),
        V.unique("l_orderkey", "l_linenumber"),
        V.accepted_values("l_returnflag", ["A", "N", "R"]),
        V.accepted_values("l_linestatus", ["O"]),
        V.in_range("l_quantity", 1, 40),
        V.matches("l_returnflag", "[AN]"),
        V.relationship("l_orderkey", spark.table("orders"), "o_orderkey"),
        V.relationship(
            "l_suppkey",
            spark.table("supplier").filter(F.col("s_suppkey") % 2 == 0),
            "s_suppkey",
        ),
    ]
    # validate() and profile() each run their report jobs eagerly
    # (collects over the cached li) — independent pipelines, previously
    # serial at construct (r13 probe: 1.5s + 1.3s back-to-back after the
    # 0.4s li materialization). Build them concurrently (guide §2.6):
    # construct is max(validate, profile), not their sum. li is already
    # materialized, so the concurrent readers only hit cache.
    raw_val, prof = _parallel_arms(
        lambda: V.validate(li, rules),
        lambda: V.profile(
            li.select("l_quantity", "l_returnflag", "l_linenumber",
                      "l_shipdate"),
            exact=True, numeric_stats=False,  # replayable core only
        ),
    )
    val = raw_val.select(
        F.lit("validate").alias("scope"),
        F.col("rule").alias("k"),
        F.col("passed").cast("string").alias("v_str"),
        F.col("n_failed").cast("double").alias("v_num"),
    )
    pr = prof.select(
        "column",
        F.expr(
            "stack(5,"
            " 'count', cast(`count` as double), cast(null as string),"
            " 'nulls', cast(`nulls` as double), cast(null as string),"
            " 'distinct', cast(`distinct` as double), cast(null as string),"
            " 'min', cast(null as double), `min`,"
            " 'max', cast(null as double), `max`) as (stat, v_num, v_str)"
        ),
    ).select(
        F.lit("profile").alias("scope"),
        F.concat_ws(":", "column", "stat").alias("k"),
        "v_str", "v_num",
    )
    return _track_persisted(stats.unionByName(val).unionByName(pr), [li])


def _collect_stats_all_oracle() -> str:
    stat_cols = [
        "count", "sum_l_orderkey", "sum_l_linenumber", "sum_l_partkey",
        "sum_l_suppkey", "sum_l_quantity", "sum_l_extendedprice",
        "sum_l_discount", "sum_l_tax",
    ]
    ks = ", ".join(f"'{c}'" for c in stat_cols)
    vs = ", ".join(f"cast({c} as double)" for c in stat_cols)
    rules = [
        ("not_null(l_orderkey)",
         "sum(case when l_orderkey is null then 1 else 0 end)"),
        ("unique(l_orderkey)",
         "count(*) - count(distinct l_orderkey)"),
        ("unique(l_orderkey, l_linenumber)",
         "count(*) - count(distinct (l_orderkey, l_linenumber))"),
        ("accepted_values(l_returnflag)",
         "sum(case when l_returnflag not in ('A','N','R') and l_returnflag is not null then 1 else 0 end)"),
        ("accepted_values(l_linestatus)",
         "sum(case when l_linestatus not in ('O') and l_linestatus is not null then 1 else 0 end)"),
        ("in_range(l_quantity)",
         "sum(case when (l_quantity < 1 or l_quantity > 40) and l_quantity is not null then 1 else 0 end)"),
        ("matches(l_returnflag)",
         "sum(case when not regexp_full_match(l_returnflag, '(?:[AN])') and l_returnflag is not null then 1 else 0 end)"),
    ]
    rk = ", ".join(f"'{n}'" for n, _ in rules)
    rv = ", ".join(f"cast({e} as double)" for _, e in rules)
    prof = []
    for c in ("l_quantity", "l_returnflag", "l_linenumber", "l_shipdate"):
        prof += [
            f"select 'profile' as scope, '{c}:count' as k, cast(null as varchar) as v_str, cast(count({c}) as double) as v_num from lineitem",
            f"select 'profile', '{c}:nulls', cast(null as varchar), cast(sum(case when {c} is null then 1 else 0 end) as double) from lineitem",
            f"select 'profile', '{c}:distinct', cast(null as varchar), cast(count(distinct {c}) as double) from lineitem",
            f"select 'profile', '{c}:min', cast(min({c}) as varchar), cast(null as double) from lineitem",
            f"select 'profile', '{c}:max', cast(max({c}) as varchar), cast(null as double) from lineitem",
        ]
    prof_sql = "\nunion all\n".join(prof)
    return f"""
with stats_wide as ({ORACLE_COLLECT_STATS})
select 'stats' as scope, unnest([{ks}]) as k,
       cast(null as varchar) as v_str, unnest([{vs}]) as v_num
from stats_wide
union all
select 'validate' as scope, k,
       case when v_num = 0 then 'true' else 'false' end as v_str, v_num
from (
  select unnest([{rk}]) as k, unnest([{rv}]) as v_num
  from lineitem
)
union all
select 'validate', 'relationship(l_orderkey -> o_orderkey)',
       case when cnt = 0 then 'true' else 'false' end, cnt
from (select cast(count(*) as double) as cnt from lineitem l
      where l.l_orderkey is not null
        and not exists (select 1 from orders o where o.o_orderkey = l.l_orderkey))
union all
select 'validate', 'relationship(l_suppkey -> s_suppkey)',
       case when cnt = 0 then 'true' else 'false' end, cnt
from (select cast(count(*) as double) as cnt from lineitem l
      where l.l_suppkey is not null
        and not exists (select 1 from supplier s
                        where s.s_suppkey % 2 = 0 and s.s_suppkey = l.l_suppkey))
union all
{prof_sql}
"""


def q_events_session_window(spark, sf_dir):
    """Native Spark session windows (F.session_window, 30-min gap) reduced
    to per-user session/event counts — same oracle as the lag-based
    sessionization, proving the two formulations agree."""
    load_views(spark, sf_dir)
    sw = (
        spark.table("events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    return sw.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
    )


def q_events_rollup(spark, sf_dir):
    """Hierarchical rollup (hour within event_type + subtotals + grand
    total) — the reference has no grouping-sets surface (SURVEY §2.3 'No
    grouping sets / cube / rollup'); Spark and DuckDB both execute this
    exact SQL."""
    load_views(spark, sf_dir)
    return spark.sql(EVENTS_ROLLUP_SQL)


EVENTS_ROLLUP_SQL = """
select event_type, date_trunc('hour', ts) as hour, count(*) as n,
       cast(sum(cast(value as decimal(38,4))) as double) as total_value
from events
group by rollup(event_type, date_trunc('hour', ts))
"""

# DataSketches HLL lg_k=12 relative standard error (~1.6%, library docs);
# the gated guard admits 3*RSE before poisoning the relation
_HLL_3RSE = 3 * 0.0163


# Subsequence-match gate shape (functions/timeseries.py): the UCR-style
# z-normalized pattern, threshold semantics (every subsequence with dist
# <= T — no global top-k ordering, so there is no FP-tie cutoff to
# destabilize the gate), sized by a measured probe: 126 matches at
# sf0.01, 1240 at sf0.1. All distance arithmetic is order-pinned IEEE
# (left folds, explicit products — see timeseries._sq), so the DuckDB
# list_reduce replay is bit-identical.
_SUBSEQ_PATTERN = [0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0]
_SUBSEQ_MAX_DIST = 2.0


def q_events_rollup_all(spark, sf_dir):
    """Hierarchical rollup, the streaming HLL-NDV maintenance loop, AND
    the time-series subsequence match in one scoped relation (ndv: VERDICT
    r6 ask #3; subseq: r9 VERDICT Next #1 — implemented + pytest-pinned,
    no CORRECTNESS row until now). The ndv arm is _must_equal(batch
    distinct_rollup, multi-micro-batch streaming fold read back from its
    versioned store) — the sketch-union losslessness contract made
    load-bearing — and the DataSketches estimate itself is oracle-checked
    as a bounded-error claim: total_value carries the EXACT distinct
    count when the estimate sits within 3*RSE of it, else the (negated)
    estimate, which can never hash-match DuckDB's exact count — an
    approximate operator gated without pretending DuckDB can replay HLL
    registers. The subseq arm runs subsequence_match in threshold mode
    over the (user_id, ts)-deduplicated series; its oracle replays the
    window + z-norm + distance fold in DuckDB SQL."""
    load_views(spark, sf_dir)
    roll = spark.sql(EVENTS_ROLLUP_SQL).select(
        F.lit("rollup").alias("scope"), "event_type", "hour", "n", "total_value")

    from data_diff_spark.streaming.sketch_stream import ndv_rollup_batch_equivalent

    # the fold's frames are |event_type| rows of sketches — run the whole
    # harness (batch agg, per-batch union-merge joins, versioned commits)
    # at the stream-sized partition count, not the session's wide default.
    # Deliberately NOT overlapped with the rollup arm (r12): the stream
    # overlap that paid on asof/diff_stats REGRESSED here (A/B 1.197,
    # median 1.214) — this arm is ~1s of batch work against a
    # driver-bound micro-batch loop whose planning the concurrent job
    # starves; overlap only pays when the batch side is meaty.
    batch, final = _sized_stream_state(
        spark, lambda: ndv_rollup_batch_equivalent(spark, sf_dir),
        n=_event_stream_state_n(spark, sf_dir))
    core = _must_equal(batch, final)
    exact = spark.table("events").groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_ndv"))
    ndv = core.join(exact, "event_type").select(
        F.lit("ndv").alias("scope"), "event_type",
        F.lit(None).cast(dict(roll.dtypes)["hour"]).alias("hour"),
        F.col("n_rows").alias("n"),
        F.when(
            F.abs(F.col("user_id__ndv") - F.col("exact_ndv"))
            <= F.lit(_HLL_3RSE) * F.col("exact_ndv"),
            F.col("exact_ndv").cast("double"),
        ).otherwise(-F.col("user_id__ndv")).alias("total_value"),
    )
    from data_diff_spark.functions.timeseries import subsequence_match

    series = spark.table("events").groupBy("user_id", "ts").agg(
        F.max("value").alias("value"))
    sub = subsequence_match(
        series, _SUBSEQ_PATTERN, top_k=None, max_dist=_SUBSEQ_MAX_DIST,
    ).select(
        F.lit("subseq").alias("scope"),
        F.col("user_id").cast("string").alias("event_type"),
        F.col("start_ts").cast(dict(roll.dtypes)["hour"]).alias("hour"),
        F.lit(None).cast("long").alias("n"),
        F.round("dist", 6).alias("total_value"),
    )
    return _track_persisted(
        roll.unionAll(ndv.select(*roll.columns))
        .unionAll(sub.select(*roll.columns)), [], core)


def _subseq_oracle_arm() -> str:
    from data_diff_spark.functions.timeseries import _znorm_query

    m = len(_SUBSEQ_PATTERN)
    q = "[" + ", ".join(repr(v) for v in _znorm_query(_SUBSEQ_PATTERN)) + "]"
    t = repr(float(_SUBSEQ_MAX_DIST))
    # list_reduce is a sequential left fold and (0.0 + x) == x in IEEE, so
    # every sum matches Spark's F.aggregate fold bit-for-bit; products are
    # explicit (never pow) on both sides
    return f"""
select 'subseq' as scope, cast(user_id as varchar) as event_type,
       start_ts as hour, cast(null as bigint) as n,
       round(dist, 6) as total_value
from (
  with sdedup as (
    select user_id, ts, max(value) as v from events group by user_id, ts),
  w as (
    select user_id, ts,
           list(v) over (partition by user_id order by ts
                         rows between current row and {m - 1} following) as seq
    from sdedup),
  f as (select user_id, ts, seq from w where len(seq) = {m}),
  z as (select user_id, ts, seq,
               list_reduce(seq, (a, b) -> a + b) / {m} as mu from f),
  z2 as (select user_id, ts, seq, mu,
                sqrt(list_reduce(list_transform(seq, x -> (x - mu) * (x - mu)),
                                 (a, b) -> a + b) / {m}) as sd
         from z),
  d as (select user_id, ts,
               sqrt(list_reduce(list_transform(generate_series(1, {m}),
                 i -> ((seq[i] - mu) / sd - ({q})[i])
                      * ((seq[i] - mu) / sd - ({q})[i])),
                 (a, b) -> a + b)) as dist
        from z2 where sd <> 0)
  select user_id, ts as start_ts, dist from d where dist <= {t}
) s
"""


ORACLE_EVENTS_ROLLUP_ALL = f"""
select 'rollup' as scope, event_type, hour, n, total_value
from ({EVENTS_ROLLUP_SQL})
union all
select 'ndv' as scope, event_type, cast(null as timestamp) as hour,
       count(*) as n, cast(count(distinct user_id) as double) as total_value
from events group by event_type
union all
{_subseq_oracle_arm()}
"""


# --- structured streaming (beyond-reference) --------------------------------


def q_events_sessionize_stream(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    gap sessionization with state carried across micro-batches, run to
    completion on bounded input. Shares the batch sessionization oracle."""
    from data_diff_spark.streaming.sessionize import sessionize_batch_equivalent

    return _sized_stream_state(spark, lambda: sessionize_batch_equivalent(spark, sf_dir),
                               n=_event_stream_state_n(spark, sf_dir))


def q_events_stream_validate(spark, sf_dir):
    """Streaming diff: stream-static join validating arriving events against
    a (deterministically perturbed) reference table — '+' = unknown key,
    '!' = value mismatch. Bounded run equals the batch left-join diff."""
    from data_diff_spark.streaming.diff_stream import validate_events_stream

    return validate_events_stream(spark, sf_dir)


ORACLE_STREAM_VALIDATE = """
with ref as (
  select event_id, event_type,
         case when event_id % 50 = 0 then value + 1.0 else value end as value
  from events where event_id % 97 <> 0
)
select case when r.event_id is null then '+' else '!' end as sign,
       e.event_id, e.event_type, e.value
from events e left join ref r on e.event_id = r.event_id
where r.event_id is null
   or e.event_type is distinct from r.event_type
   or e.value is distinct from r.value
"""


def q_events_hourly_stream(spark, sf_dir):
    """Streaming hourly rollup run to completion (AvailableNow) — on bounded
    input the result must equal the batch GROUP BY, so it shares the
    events_hourly oracle."""
    from data_diff_spark.streaming.events_stream import hourly_rollup_batch_equivalent

    return _sized_stream_state(spark, lambda: hourly_rollup_batch_equivalent(spark, sf_dir),
                               n=_event_stream_state_n(spark, sf_dir))


def q_events_dedup_stream(spark, sf_dir):
    """Stateful streaming dedup (dropDuplicatesWithinWatermark): every
    event delivered twice, exactly one survives — the at-least-once ->
    exactly-once guard, with state bounded by the watermark horizon."""
    from data_diff_spark.streaming.events_stream import streaming_dedup_batch_equivalent

    load_views(spark, sf_dir)
    return _sized_stream_state(spark, lambda: streaming_dedup_batch_equivalent(spark, sf_dir),
                               n=_event_stream_state_n(spark, sf_dir, factor=2))


ORACLE_EVENTS_DEDUP_STREAM = """
select event_id, event_type, value from events
"""


def q_joindiff_mixed_precision(spark, sf_dir):
    """Automatic precision unification (unify.py; reference
    _validate_and_adjust_columns, hashdiff_tables.py:118-167): side B holds
    timestamps truncated to whole seconds (declared precision 0), so
    diff_tables reduces the pair to the minimum mutual precision — the
    truncation alone yields ZERO spurious diffs; only the planted value
    changes (event_id % 100 = 7) emerge."""
    load_views(spark, sf_dir)
    e = spark.table("events").select("event_id", "ts", "value")
    t1 = table_segment(e, ["event_id"])
    mod = e.select(
        "event_id",
        F.date_trunc("second", F.col("ts")).alias("ts"),
        F.when(F.col("event_id") % 100 == 7, F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    t2 = table_segment(mod, ["event_id"], precision_overrides={"ts": 0})
    return diff_tables(t1, t2).df


ORACLE_MIXED_PRECISION = """
select '-' as sign, event_id, ts, value from events where event_id % 100 = 7
union all
select '+' as sign, event_id, date_trunc('second', ts) as ts, value + 1.0 as value
from events where event_id % 100 = 7
"""


# --- temporal joins (operators/temporal.py; no reference counterpart — the
# sqeleton AST stops at equi/theta joins, ast_classes.py) --------------------


def q_asof_purchase(spark, sf_dir):
    """As-of join: every event tagged with the user's most recent purchase
    at-or-before it (backward, ties match). Spark side is the zero-join
    union+window design — ONE shuffle on user_id; the oracle is DuckDB's
    native ASOF LEFT JOIN, so the semantics are pinned against an
    independent implementation, not our own brute force."""
    from data_diff_spark.operators.temporal import asof_join

    load_views(spark, sf_dir)
    ev = spark.table("events").select("event_id", "user_id", "ts", "event_type", "value")
    # asof_join output is nondeterministic when the right side has duplicate
    # (by, on) rows (our window's pick vs DuckDB ASOF's pick could diverge):
    # pre-aggregate purchases to one row per (user_id, ts), identically on
    # both sides (ADVICE r3)
    purchases = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(ev, purchases, on="ts", by=["user_id"], prefix="purchase_")


ORACLE_ASOF_PURCHASE = """
select e.event_id, e.user_id, e.ts, e.event_type, e.value,
       p.ts as purchase_ts, p.value as purchase_value
from events e
asof left join (
  select user_id, ts, max(value) as value
  from events where event_type = 'purchase'
  group by user_id, ts
) p
  on e.user_id = p.user_id and e.ts >= p.ts
"""


def q_asof_global(spark, sf_dir):
    """Keyless as-of join: every event tagged with the globally most
    recent purchase at-or-before it — no `by` key, so the naive plan is a
    single-task global window. The operator's global path time-buckets
    instead (window per bucket + per-bucket carry broadcast); oracle is
    DuckDB's native ASOF LEFT JOIN with only the inequality condition."""
    from data_diff_spark.operators.temporal import asof_join

    load_views(spark, sf_dir)
    ev = spark.table("events").select("event_id", "user_id", "ts", "event_type")
    # one row per ts so the as-of pick is deterministic on both engines
    latest = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(ev, latest, on="ts", by=[], prefix="purchase_")


ORACLE_ASOF_GLOBAL = """
select e.event_id, e.user_id, e.ts, e.event_type,
       p.ts as purchase_ts, p.purchase_value
from events e
asof left join (
  select ts, max(value) as purchase_value
  from events where event_type = 'purchase' group by ts
) p on e.ts >= p.ts
"""


def q_range_join_attribution(spark, sf_dir):
    """Interval-overlap join: events attributed to the 30-minute window
    after each same-user purchase (the classic ad-attribution shape).
    Executes as a bucketed-bin EQUI-join (intervals exploded to 30-min
    bins), not the BroadcastNestedLoop Catalyst would pick for the raw
    inequality join; test_plans pins that."""
    from data_diff_spark.operators.temporal import interval_join

    load_views(spark, sf_dir)
    ev = spark.table("events").select("event_id", "user_id", "ts", "event_type")
    intervals = (
        spark.table("events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("interval 30 minutes")).alias("end_ts"),
        )
    )
    return interval_join(
        ev, intervals, by=["user_id"], bin_width="30 minutes", closed="left"
    ).select("purchase_id", "event_id", "user_id", "ts", "event_type")


ORACLE_RANGE_JOIN = """
select p.event_id as purchase_id, e.event_id, e.user_id, e.ts, e.event_type
from events e
join events p
  on e.user_id = p.user_id
 and p.event_type = 'purchase'
 and e.ts >= p.ts
 and e.ts < p.ts + interval 30 minute
"""


def q_range_join_stream(spark, sf_dir):
    """Stream-stream interval join (watermarked, state-evicting) run to
    completion on bounded input — same result, and same oracle, as the
    batch range_join_attribution (streaming/temporal_stream.py).

    State-store partition count = shuffle partitions at query start; each
    partition carries per-batch checkpoint I/O, so it must be sized to the
    state VOLUME, not the cluster width (64 partitions for ~100k buffered
    rows is pure checkpoint overhead — measured 13.6s -> 2.8s at sf0.1
    going 64 -> 8). A production stream sizes this once at job start; the
    bounded harness save/restores around the run."""
    from data_diff_spark.streaming.temporal_stream import (
        attribution_stream_batch_equivalent,
    )

    load_views(spark, sf_dir)
    return _sized_stream_state(spark, lambda: attribution_stream_batch_equivalent(spark, sf_dir),
                                n=_event_stream_state_n(spark, sf_dir))


def _sized_stream_state(spark, thunk, n: int = 8):
    """Run a bounded streaming harness with state partitions sized to the
    harness's state volume (see q_range_join_stream docstring); restores
    the session's shuffle partitioning afterwards."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        return thunk()
    finally:
        spark.conf.set(key, old)


def _event_stream_state_n(spark, sf_dir, factor: int = 1) -> int:
    """State-partition count for the bounded event-stream gates, from the
    ONE sizing rule (events_stream.bounded_stream_sizing — r7 carried a
    separate '8 under 500k events else 32' two-point fit here). `factor`
    scales the row count for harnesses that amplify the input (the dedup
    gate streams every event twice)."""
    from data_diff_spark.streaming.events_stream import (
        bounded_stream_sizing,
        table_rows,
    )

    _, n = bounded_stream_sizing(
        factor * table_rows(spark, sf_dir),
        spark.sparkContext.defaultParallelism)
    return n


# --- training-pipeline ops round 3: decontamination, packing, PII ----------


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any 5-gram with the
    'benchmark' subset (doc_id % 97 = 0 stands in for an eval set). The
    benchmark gram set is broadcast — corpus grams are filtered map-side,
    only hits shuffle (operators/dedup.py:decontaminate)."""
    load_views(spark, sf_dir)
    docs = spark.table("documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = DD.decontaminate(docs, bench, n=5)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("n_bench_docs").cast("long").alias("n_bench_docs"),
    )


def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (concat-then-chunk, 512-token packs,
    8 hash shards): every doc gets its (pack_id, pack_offset). Integer-only
    and hash-sharded, so the oracle replays it bit-for-bit
    (functions/packing.py)."""
    from data_diff_spark.functions import packing as PK

    load_views(spark, sf_dir)
    return PK.pack_sequences(spark.table("documents"), budget=512, n_shards=8)


def _pack_sequences_oracle() -> str:
    from data_diff_spark.functions import packing as PK

    return PK.duckdb_pack_sequences(budget=512, n_shards=8)


def q_mix_corpora(spark, sf_dir):
    """Training-mixture construction: 'web' (all docs) at 30%, 'curated'
    (en docs) at 100%, deterministically hash-sampled and source-tagged
    (functions/sampling.py:mix_corpora). The oracle replays both sampling
    predicates bit-identically."""
    from data_diff_spark.functions.sampling import mix_corpora

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text", "lang")
    out = mix_corpora(
        {"web": (docs, 0.3), "curated": (docs.filter(F.col("lang") == "en"), 1.0)},
        ["doc_id"],
    )
    return out.select("doc_id", "lang", "mix_source")


def _mix_corpora_oracle() -> str:
    from data_diff_spark.functions.sampling import duckdb_hash_sample_pred

    web = duckdb_hash_sample_pred(0.3, ["doc_id"], salt="mix:web")
    return f"""
select doc_id, lang, 'curated' as mix_source from documents where lang = 'en'
union all
select doc_id, lang, 'web' as mix_source from documents where {web}
"""


# --- clean_docs: the LM/BPE/clean_corpus gate (VERDICT r7 Next #3) ----------

# perplexity ceiling for the gated chain: the corpus' bigram-ppl
# distribution at sf0.01 reads min 27.5 / median 30.7 / max 41.2, so 31.0
# keeps ~55% — the filter provably drops AND keeps rows, and no document
# sits within 1e-6 of the boundary (summation-order ulps cannot flip a
# keep decision between engines)
CLEAN_PPL_CEILING = 31.0
CLEAN_BPE_MERGES = 6
# greedy re-tokenization steps to unroll in the oracle: every merge
# application shrinks a word's symbol sequence by >= 1, so <= len(word)
# steps suffice; the corpus' longest word is 8 chars (9 symbols with </w>)
CLEAN_BPE_STEPS = 8
CLEAN_LM_N = 2  # bigram: exercises the full backoff chain (hit -> alpha*unigram -> OOV floor)


def q_clean_docs(spark, sf_dir):
    """The training-data cleaning story end-to-end as ONE oracle-checked
    relation (VERDICT r7 Next #3: functions/lm.py, functions/bpe.py and
    pipeline.clean_corpus carried only pytest parity pins):

      scope='stage'      clean_corpus survivor count per stage over the
                         doubled corpus (DOCS2_SQL, so exact_dedup has
                         real work): quality rules -> exact dedup ->
                         decontaminate (vs the doc_id%97 benchmark) ->
                         Stupid-Backoff perplexity ceiling;
      scope='survivor'   the final kept doc_id set, hash-matched;
      scope='ppl'        per-doc (n_scored, log10prob) for doc_id%20=0 —
                         lm.score_documents' bigram backoff arithmetic
                         replayed by DuckDB (logprob rounded to 6dp: the
                         only cross-engine divergence is double-sum
                         order, ~1e-11 at these magnitudes);
      scope='bpe_merge'  the first 6 BPE merges from bpe.train_bpe —
                         the oracle replays the TRAINING loop (pair
                         counts, argmax with the cnt-desc/a/b tiebreak,
                         left-to-right non-overlapping merge) as
                         unrolled CTEs, like the IVF Lloyd replay;
      scope='bpe_len'    per-doc bpe_tokenize token counts for
                         doc_id%20=0 — the oracle replays the GREEDY
                         lowest-rank-first re-tokenization as unrolled
                         fixpoint steps (<= max word length iterations).
    """
    from data_diff_spark.functions.bpe import bpe_tokenize, train_bpe
    from data_diff_spark.functions.lm import score_documents, train_ngram_lm
    from data_diff_spark.pipeline import clean_corpus

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    corpus = spark.sql(DOCS2_SQL)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    # train_bpe is a driver-sequential loop of CLEAN_BPE_MERGES one-row
    # collect jobs, fully independent of the LM/clean pipeline: run it on
    # a side thread so its rounds back-fill task slots while the LM
    # trains and clean_corpus's audit counts execute (guide §2.6 — the
    # r12 phase split read this entry's construction at ~10s of purely
    # sequential training/audit actions)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as _ex:
        fut_bpe = _ex.submit(train_bpe, docs, n_merges=CLEAN_BPE_MERGES)
        model, total = train_ngram_lm(docs, n=CLEAN_LM_N)
        cleaned, counts = clean_corpus(
            corpus, min_tokens=10, min_quality=0.3,
            near_dup_threshold=None, benchmark=bench, decontaminate_n=5,
            redact=False, lm_model=(model, total),
            max_perplexity=CLEAN_PPL_CEILING, lm_n=CLEAN_LM_N, audit=True,
        )
        merges = fut_bpe.result()

    def shaped(scope, k, v_str, v_num):
        return F.lit(scope).alias("scope"), k.cast("string").alias("k"), \
            v_str.cast("string").alias("v_str"), v_num.cast("double").alias("v_num")

    null_s, null_d = F.lit(None).cast("string"), F.lit(None).cast("double")
    stage = spark.createDataFrame(
        [(k, float(v)) for k, v in counts.items()], "k string, v double"
    ).select(*shaped("stage", F.col("k"), null_s, F.col("v")))
    surv = cleaned.select(*shaped("survivor", F.col("doc_id"), null_s, null_d))
    ppl = score_documents(
        docs.filter(F.col("doc_id") % 20 == 0), model, total, n=CLEAN_LM_N
    ).select(*shaped("ppl", F.col("doc_id"), F.col("n_scored"),
                     F.round("logprob", 6)))
    mrows = spark.createDataFrame(
        [(str(i + 1), f"{a} {b}") for i, (a, b) in enumerate(merges)],
        "k string, v string",
    ).select(*shaped("bpe_merge", F.col("k"), F.col("v"), null_d))
    blen = bpe_tokenize(
        docs.filter(F.col("doc_id") % 20 == 0), merges
    ).select(*shaped("bpe_len", F.col("doc_id"), null_s, F.col("bpe_len")))
    out = stage.unionAll(surv).unionAll(ppl).unionAll(mrows).unionAll(blen)
    return _track_persisted(out, [cleaned, model])


def _clean_lm_ctes() -> str:
    """Bigram Stupid-Backoff training + scoring over `tokd` (doc_id, toks):
    CTEs uni/big/tot/sc — sc = (doc_id, n_scored, logprob), replaying
    lm.train_ngram_lm(n=2) + score_documents exactly (order-2 counts over
    BOS-padded tokens, order-1 over raw tokens; chain = hit ? c2/d2 :
    0.4 * (coalesce(c1,1)/N))."""
    return """
uni as (select tok as gram, count(*)::bigint as cnt
        from (select unnest(toks) as tok from tokd) group by 1),
big as (select p[i] || ' ' || p[i+1] as gram, count(*)::bigint as cnt from (
          select ['<s>'] || toks as p,
                 unnest(generate_series(1, len(toks))) as i from tokd
        ) group by 1),
tot as (select sum(len(toks))::bigint as n from tokd),
sc as (
  select doc_id, count(*)::bigint as n_scored,
         sum(log10(case when b.cnt is not null and u1.cnt is not null
                        then 1.0 * (b.cnt::double / u1.cnt::double)
                        else 0.4 * (coalesce(u2.cnt, 1.0)::double
                                    / (select n from tot)) end)) as logprob
  from (select doc_id, ['<s>'] || toks as p,
               unnest(generate_series(2, len(toks)+1)) as i
        from tokd where len(toks) > 0) q
  left join big b on b.gram = q.p[q.i-1] || ' ' || q.p[q.i]
  left join uni u1 on u1.gram = q.p[q.i-1]
  left join uni u2 on u2.gram = q.p[q.i]
  group by doc_id)"""


def _bpe_fold_sql(a: str, b: str) -> str:
    """SQL replay of bpe._apply_merge's left-to-right non-overlapping
    fold over a space-wrapped symbol string: list_reduce appends each
    symbol, merging it into the accumulator's LAST token when (last,
    cur) == (a, b). A single SQL replace() is NOT equivalent: adjacent
    occurrences share the boundary space, so only the first merges
    (' b a n a n a ' + (a,n) -> ' b an a n a ' under replace, vs the
    fold's b,an,an,a) — DuckDB-verified both ways. The merged token
    cannot re-merge within the pass because a||b != a (b non-empty),
    the same guard _apply_merge documents; ends_with(acc, ' '||a) is an
    exact last-token test because symbols are space-free."""
    return (f"' ' || list_reduce("
            f"list_filter(string_split(s, ' '), x -> x <> ''), "
            f"(acc, x) -> case when x = {b} and (acc = {a} "
            f"or ends_with(acc, ' ' || {a})) "
            f"then acc || x else acc || ' ' || x end) || ' '")


def _clean_bpe_ctes(k: int = CLEAN_BPE_MERGES, steps: int = CLEAN_BPE_STEPS) -> str:
    """BPE replay CTEs: bm1..bmk = the trained merges (training loop
    unrolled: weighted adjacent-pair counts over the symbol strings,
    argmax with train_bpe's cnt-desc/a-asc/b-asc tiebreak, merge applied
    via _bpe_fold_sql — exactly _apply_merge's left-to-right
    non-overlapping fold); gv{steps} = greedy re-tokenization of the
    doc_id%20 subset's vocabulary (each step applies the LOWEST-rank
    merge whose pair occurs — bpe_encode_words' rule — with the same
    fold, so each gv step is exactly one encode step; extra steps are
    no-ops, so unrolling past the fixpoint is safe); blen = per-doc
    subword counts."""
    sym0 = ("' ' || array_to_string(list_transform(generate_series(1, "
            "length(word)), i -> word[i]) || ['</w>'], ' ') || ' '")
    parts = [f"""
wc as (select word, count(*)::bigint as n from (
        select unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) as word
        from documents) group by 1),
bs0 as (select {sym0} as s, n from wc)"""]
    for t in range(1, k + 1):
        parts.append(f"""
bp{t} as (select l[i] as a, l[i+1] as b, sum(n)::bigint as cnt from (
           select list_filter(string_split(s, ' '), x -> x <> '') as l, n,
                  unnest(generate_series(1,
                    len(list_filter(string_split(s, ' '), x -> x <> '')) - 1)) as i
           from bs{t-1}) group by 1, 2),
bm{t} as (select a, b from bp{t} order by cnt desc, a asc, b asc limit 1),
bs{t} as (select {_bpe_fold_sql('m.a', 'm.b')} as s, n
          from bs{t-1}, bm{t} m)""")
    joins = ", ".join(f"bm{j} j{j}" for j in range(1, k + 1))
    parts.append(f"""
dw as (select doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                         x -> x <> '')) as word
       from documents where doc_id % 20 = 0),
gv0 as (select word, {sym0} as s from (select distinct word from dw))""")
    for t in range(1, steps + 1):
        whens = " ".join(
            f"when position(' ' || j{j}.a || ' ' || j{j}.b || ' ' in s) > 0 "
            f"then {_bpe_fold_sql(f'j{j}.a', f'j{j}.b')}"
            for j in range(1, k + 1))
        parts.append(f"""
gv{t} as (select word, case {whens} else s end as s from gv{t-1}, {joins})""")
    parts.append(f"""
wlen as (select word,
                len(list_filter(string_split(s, ' '), x -> x <> ''))::bigint as n_sub
         from gv{steps}),
blen as (select dw.doc_id, sum(wlen.n_sub)::bigint as bpe_len
         from dw join wlen using (word) group by dw.doc_id)""")
    return ",".join(parts)


def _clean_docs_oracle() -> str:
    qf_reason = TX.duckdb_quality_filter("text", 10, 1_000_000, 0.3, None)
    ng = f"list_distinct({TX.duckdb_word_ngrams('text', 5)})"
    h60 = TX.duckdb_hash60("g.g")
    merge_rows = " union all ".join(
        f"select 'bpe_merge', '{t}', a || ' ' || b, null from bm{t}"
        for t in range(1, CLEAN_BPE_MERGES + 1))
    return f"""
with
corpus as ({DOCS2_SQL}),
tokd as (select doc_id, text, {TX.duckdb_tokens('text')} as toks from documents),
qf2 as (select doc_id, text from corpus where {qf_reason} is null),
ed as (select doc_id, text from (
        select q.*, min(doc_id) over (partition by md5(text)) as mid from qf2 q) t
       where doc_id = mid),
bg as (select distinct {h60} as g
       from (select doc_id, unnest({ng}) as g
             from documents where doc_id % 97 = 0) g(doc_id, g)),
contam as (select distinct cg.id from
       (select g.doc_id as id, {h60} as g
        from (select doc_id, unnest({ng}) as g from ed) g(doc_id, g)) cg
       join bg using (g)),
dec as (select ed.doc_id, ed.text, {TX.duckdb_tokens('ed.text')} as toks
        from ed where ed.doc_id not in (select id from contam)),
{_clean_lm_ctes()},
dsc as (
  select doc_id, count(*)::bigint as n_scored,
         sum(log10(case when b.cnt is not null and u1.cnt is not null
                        then 1.0 * (b.cnt::double / u1.cnt::double)
                        else 0.4 * (coalesce(u2.cnt, 1.0)::double
                                    / (select n from tot)) end)) as logprob
  from (select doc_id, ['<s>'] || toks as p,
               unnest(generate_series(2, len(toks)+1)) as i
        from dec where len(toks) > 0) q
  left join big b on b.gram = q.p[q.i-1] || ' ' || q.p[q.i]
  left join uni u1 on u1.gram = q.p[q.i-1]
  left join uni u2 on u2.gram = q.p[q.i]
  group by doc_id),
surv as (select doc_id from dsc
         where n_scored > 0
           and pow(10.0, -logprob / n_scored) <= {CLEAN_PPL_CEILING}),
{_clean_bpe_ctes()}
select 'stage' as scope, s.k as k, cast(null as varchar) as v_str, s.v as v_num from (
  select 'input' as k, (select count(*) from corpus)::double as v
  union all select 'quality_filter', (select count(*) from qf2)::double
  union all select 'exact_dedup', (select count(*) from ed)::double
  union all select 'decontaminate', (select count(*) from dec)::double
  union all select 'perplexity_filter', (select count(*) from surv)::double) s
union all
select 'survivor', doc_id::varchar, null, null from surv
union all
select 'ppl', sc.doc_id::varchar, sc.n_scored::varchar, round(sc.logprob, 6)
from sc where sc.doc_id % 20 = 0
union all
{merge_rows}
union all
select 'bpe_len', doc_id::varchar, null, bpe_len::double from blen
"""


def q_token_vocab(spark, sf_dir):
    """Corpus vocabulary / heavy hitters: top-100 tokens by total count with
    document frequency — the tokenizer-vocab / stopword-discovery pass.
    One explode + one agg: partial (map-side) counts make the shuffle carry
    one row per (token, map partition), so the plan scales with vocabulary,
    not corpus size. Ties broken by token for determinism."""
    load_views(spark, sf_dir)
    toks = explode_nonnull(
        spark.table("documents"), ["doc_id"], TX.tokens(F.col("text")), "token"
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(100)
    )


ORACLE_TOKEN_VOCAB = f"""
with t as (
  select doc_id, unnest({{toks}}) as token from documents
)
select token, count(*) as n, count(distinct doc_id) as doc_freq
from t
group by token
order by n desc, token asc
limit 100
""".replace("{toks}", "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')")


def q_token_vocab_all(spark, sf_dir):
    """token_vocab with a DELIBERATE hot key under the gate (VERDICT r6
    ask #6): the corpus token stream plus a planted '__hot__' token (64
    copies per document — roughly a quarter of all token rows, the
    one-reducer-is-the-critical-path regime) aggregated TWO ways and
    _must_equal'd:

      plain:  one groupBy(token) with count + countDistinct — the shape
              whose hot key lands on a single reducer;
      salted: operators/skew.salted_agg two-stage count (group by
              (token, salt-of-row) then combine), joined with the
              skew-safe two-stage distinct (groupBy(token, doc_id) ->
              groupBy(token)) — no reducer ever sees more than
              ~|hot|/n_salt rows of the hot key.

    Identical output is the salted plan's correctness proof; the DuckDB
    oracle replays the skewed corpus independently."""
    load_views(spark, sf_dir)
    from data_diff_spark.operators.skew import salted_agg

    docs = spark.table("documents")
    toks = explode_nonnull(
        docs, ["doc_id"], TX.tokens(F.col("text")), "token"
    ).unionAll(docs.select(
        "doc_id",
        F.explode(F.array_repeat(F.lit("__hot__"), 64)).alias("token"),
    ))

    def top100(df):
        return df.orderBy(F.desc("n"), F.asc("token")).limit(100)

    plain = top100(
        toks.groupBy("token").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
    )
    n_salted = salted_agg(toks, ["token"], [("token", "count", "n")])
    df_salted = (
        toks.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    salted = top100(n_salted.join(df_salted, "token"))
    return _must_equal(plain, salted.select("token", "n", "doc_freq"))


ORACLE_TOKEN_VOCAB_SKEWED = f"""
with t as (
  select doc_id, unnest({{toks}}) as token from documents
  union all
  select doc_id, '__hot__' as token from documents, range(64)
)
select token, count(*) as n, count(distinct doc_id) as doc_freq
from t
group by token
order by n desc, token asc
limit 100
""".replace("{toks}", "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')")


def q_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (64-token chunks, 8 overlap) —
    map-side explode, chunk digests instead of chunk text
    (functions/packing.py:chunk_documents)."""
    from data_diff_spark.functions import packing as PK

    load_views(spark, sf_dir)
    return PK.chunk_documents(spark.table("documents"), chunk_tokens=64, overlap=8)


def _chunk_documents_oracle() -> str:
    from data_diff_spark.functions import packing as PK

    return PK.duckdb_chunk_documents(chunk_tokens=64, overlap=8)


def q_repetition_stats(spark, sf_dir):
    """Gopher/MassiveText repetition signals over documents with planted
    line structure: every 7th token boundary becomes a line break, and docs
    with doc_id % 3 = 0 get their first pseudo-line appended twice — so
    dup-line and top-bigram fractions take nontrivial, doc-dependent
    values. Planting is replayed identically in the oracle."""
    load_views(spark, sf_dir)
    base = spark.table("documents").select("doc_id", _plant_lines_spark().alias("__lined"))
    return TX.with_repetition_stats(base, text_col="__lined", keep=["doc_id"])


def _plant_lines_spark():
    toks = TX.tokens(F.col("text"))
    # join tokens back with '\n' after every 7th token, ' ' otherwise —
    # concat_ws over the transformed array (linear), never a fold (quadratic)
    lined = F.concat_ws(
        "",
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda w, i: F.when(F.pmod(i, F.lit(7)) == 0, F.concat(w, F.lit("\n"))).otherwise(
                F.concat(w, F.lit(" "))
            ),
        ),
    )
    first_line = F.element_at(F.split(lined, "\n"), 1)
    return F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(lined, F.lit("\n"), first_line, F.lit("\n"), first_line),
    ).otherwise(lined)


def _plant_lines_duckdb() -> str:
    toks = TX.duckdb_tokens("text")
    lined = (
        f"list_aggregate(list_transform({toks}, (w, i) -> "
        f"case when i % 7 = 0 then w || chr(10) else w || ' ' end), 'string_agg', '')"
    )
    first = f"string_split({lined}, chr(10))[1]"
    return (
        f"(case when doc_id % 3 = 0 then {lined} || chr(10) || {first} || chr(10) || {first} "
        f"else {lined} end)"
    )


def _repetition_stats_oracle() -> str:
    e = TX.duckdb_repetition_stats(_plant_lines_duckdb())
    return f"""
select doc_id, {e['n_lines']} as n_lines, {e['dup_line_frac']} as dup_line_frac,
       {e['dup_line_char_frac']} as dup_line_char_frac,
       {e['top_bigram_frac']} as top_bigram_frac
from documents
"""


def q_redact_pii(spark, sf_dir):
    """PII redaction over documents with deterministically planted PII
    (emails/SSN/phone derived from doc_id — the raw corpus is synthetic and
    clean, planting makes every row exercise every pattern). Output carries
    per-kind counts and the md5 of the redacted text, not the text itself."""
    load_views(spark, sf_dir)
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1 555-000-"),
        F.lpad(F.pmod(F.col("doc_id"), 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789."),
    )
    r = TX.redact_pii(planted)
    return spark.table("documents").select(
        "doc_id",
        r["n_email"].cast("long").alias("n_email"),
        r["n_ssn"].cast("long").alias("n_ssn"),
        r["n_phone"].cast("long").alias("n_phone"),
        F.md5(r["text"]).alias("redacted_md5"),
    )


def _redact_pii_oracle() -> str:
    planted = (
        "text || ' contact user' || doc_id::VARCHAR || '@mail.example.com or +1 555-000-' "
        "|| lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ssn 123-45-6789.'"
    )
    e = TX.duckdb_redact_pii(planted)
    return f"""
select doc_id, {e['n_email']} as n_email, {e['n_ssn']} as n_ssn,
       {e['n_phone']} as n_phone, md5({e['text']}) as redacted_md5
from documents
"""


def q_quantize_embeddings(spark, sf_dir):
    """int8 symmetric embedding quantization (similarity.py:
    quantize_embeddings); the vector is serialized to a comma string for
    the value-hash compare (the same convention as hashed_doc_vectors)."""
    load_views(spark, sf_dir)
    q = SIM.quantize_embeddings(spark.table("embeddings"))
    return q.select(
        "vec_id", "scale", F.concat_ws(",", F.col("qvec")).alias("qvec_str")
    )


DOC_CLUSTERS = 8


def q_embeddings_repr_all(spark, sf_dir):
    """Representation operators in one scoped relation:

      scope='quantize'      int8 symmetric embedding quantization;
      scope='doc_clusters'  cluster_documents — feature-hashed doc
                            vectors + the deterministic integer Lloyd
                            (r9): per-doc cluster id, training replayed
                            by the oracle like the IVF arms;
      scope='cluster_sizes' the per-cluster membership counts (the
                            mixture-inspection output).
    """
    load_views(spark, sf_dir)
    q = q_quantize_embeddings(spark, sf_dir).select(
        F.lit("quantize").alias("scope"), F.col("vec_id").alias("k"),
        F.col("qvec_str").alias("v_str"), F.col("scale").cast("double").alias("v_num"),
    )
    from data_diff_spark.streaming.events_stream import table_rows

    cl = SIM.cluster_documents(
        spark.table("documents"), n_clusters=DOC_CLUSTERS,
        n_rows=table_rows(spark, sf_dir, "documents"),
    ).persist()
    docs = cl.select(
        F.lit("doc_clusters").alias("scope"), F.col("doc_id").alias("k"),
        F.lit(None).cast("string").alias("v_str"),
        F.col("cluster").cast("double").alias("v_num"),
    )
    sizes = cl.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("cluster_sizes").alias("scope"), F.col("cluster").cast("long").alias("k"),
        F.lit(None).cast("string").alias("v_str"), F.col("n").cast("double").alias("v_num"),
    )
    return _track_persisted(q.unionAll(docs).unionAll(sizes), [cl], cl)


def _doc_clusters_oracle(n_clusters=DOC_CLUSTERS, dim=64, n_iter=2, train_cap=2048) -> str:
    """Replay of cluster_documents: the feature-hash vectorizer
    (duckdb_hashed_vector) feeds the same md5-ordered-sample Lloyd CTEs
    the IVF oracle uses; assignment = argmin with ties to the lowest
    cluster."""
    hv = TX.duckdb_hashed_vector("text", dim)
    iter_sql, prev = _lloyd_iter_ctes(n_iter, dim)
    dist = SIM.duckdb_int_l2("h.qv", "c.cv", dim)
    return f"""
with hv as (select doc_id as id, {hv} as qv from documents),
samp as (select qv, row_number() over (order by md5(id::varchar), id) as rn
         from hv order by md5(id::varchar), id limit {train_cap}),
c0 as (select rn - 1 as cell, qv as cv from samp where rn <= {n_clusters}),
{iter_sql}
select id as doc_id, cluster from (
  select h.id, c.cell as cluster,
         row_number() over (partition by h.id order by {dist}, c.cell) as rk
  from hv h cross join {prev} c) t where rk = 1
"""


def _embeddings_repr_oracle() -> str:
    e = SIM.duckdb_quantize()
    return f"""
select 'quantize' as scope, vec_id as k,
       array_to_string({e['qvec']}, ',') as v_str,
       cast({e['scale']} as double) as v_num
from embeddings
union all
select 'doc_clusters' as scope, doc_id as k, cast(null as varchar) as v_str,
       cast(cluster as double) as v_num
from ({{dc}})
union all
select 'cluster_sizes' as scope, cluster as k, cast(null as varchar) as v_str,
       cast(count(*) as double) as v_num
from ({{dc}}) group by cluster
"""


def q_zorder_key_events(spark, sf_dir):
    """Morton (Z-order) key over (user_id, event_id mod 2^21) — the exact
    integer bit-interleave behind zorder_write's multi-column data-skipping
    layout (sources/connect.py). The oracle replays the interleave
    bit-for-bit."""
    from data_diff_spark.sources.connect import morton_code

    load_views(spark, sf_dir)
    return spark.table("events").select(
        "event_id",
        morton_code(F.col("user_id"), F.pmod(F.col("event_id"), F.lit(1 << 21))).alias("zkey"),
    )


def _zorder_oracle() -> str:
    from data_diff_spark.sources.connect import duckdb_morton_code

    z = duckdb_morton_code("user_id", f"(event_id % {1 << 21})")
    return f"select event_id, {z} as zkey from events"


def q_version_diff_orders(spark, sf_dir):
    """Version-to-version diff on the commit-log parquet table format
    (sources/versioned.py — the jar-free Delta story): create orders as
    v1, commit the modified table (stored as DIFF rows, not a second
    copy), then diff v1 vs v2 through reconstruction. The oracle diffs
    the same two logical tables directly — storage roundtrip + apply_diff
    reconstruction must be invisible to the result."""
    import tempfile

    from data_diff_spark.sources import versioned as V

    load_views(spark, sf_dir)
    root = os.path.join(
        tempfile.gettempdir(), "ddspark_versioned",
        f"orders_{sf_dir.strip('/').replace('/', '_')}",
    )
    import shutil

    # build-once per sf_dir (same policy as _materialize_rebalanced): in a
    # real deployment the versioned table EXISTS — version_diff reads it.
    # The marker pins the exact construction recipe so any change rebuilds.
    marker = os.path.join(root, ".built")
    recipe = f"{sf_dir}|{MODIFIED_ORDERS_SQL}|{','.join(ORDERS_COLS)}"
    built = False
    try:
        built = open(marker).read() == recipe
    except OSError:
        pass
    if not built:
        shutil.rmtree(root, ignore_errors=True)
        V.create_table(spark.table("orders").select(*ORDERS_COLS), root, ["o_orderkey"])
        V.commit(spark.sql(MODIFIED_ORDERS_SQL).select(*ORDERS_COLS), root)
        assert [h["kind"] for h in V.history(root)] == ["full", "diff"]
        with open(marker, "w") as f:
            f.write(recipe)
    return V.version_diff(spark, root, 1, 2)


def q_apply_diff_roundtrip(spark, sf_dir):
    """Closure of the diff algebra: apply_diff(orders, diff(orders,
    modified)) must equal modified EXACTLY — verified by count + full
    md5-checksum of the patched table against the oracle computing the
    same over the modified table directly. diff -> patch -> verify is the
    replication/repair loop a data-diff user closes by hand."""
    from data_diff_spark.diff import apply_diff

    load_views(spark, sf_dir)
    t1, t2 = _orders_segments(spark, sf_dir)
    d = diff_tables(t1, t2).df
    applied = apply_diff(t1.make_select(), d, ["o_orderkey"])
    seg = table_segment(applied, ["o_orderkey"], extra_columns=ORDERS_COLS[1:])
    return seg.make_select().agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(seg.checksum_column()).cast("string").alias("cks"),
    )


def _apply_diff_oracle() -> str:
    # ORACLE_CHECKSUM_ORDERS over the modified table instead of orders
    return ORACLE_CHECKSUM_ORDERS.replace(
        "from orders", f"from ({MODIFIED_ORDERS_SQL})"
    )


# --- snapshot diff ----------------------------------------------------------


def q_snapshot_diff(spark, sf_dir):
    """Diff the 'modified' orders against a digest snapshot of the original
    (operators/snapshot.py): snapshot = (keys, row checksum) only, so
    yesterday's table need not exist at diff time. Signs match a plain
    full-outer row compare — which is exactly what the oracle computes,
    row-by-row, WITHOUT checksums: two independent routes to the same
    change set."""
    import os

    from data_diff_spark.operators import snapshot as SN

    load_views(spark, sf_dir)
    t_orig, t_mod = _orders_segments(spark, sf_dir)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scratch",
        f"orders_snapshot_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    # build-once (r12): the snapshot is YESTERDAY's artifact — in the
    # workflow under test it exists and diff_against_snapshot reads it;
    # re-writing it per bench invocation misattributed the write job to
    # the diff (the q_version_diff_orders policy). The data fingerprint
    # rebuilds it whenever the testdata changes.
    _built_once(path, f"{sf_dir}|orders-digest-snapshot",
                lambda: SN.write_snapshot(t_orig, path), sf_dir=sf_dir)
    return SN.diff_against_snapshot(t_mod, SN.load_snapshot(spark, path)).select(
        "sign", "o_orderkey"
    )


ORACLE_SNAPSHOT_DIFF = f"""
with cur as (select * from ({MODIFIED_ORDERS_SQL})),
old as (select * from orders)
select case when o.o_orderkey is null then '+'
            when c.o_orderkey is null then '-'
            else '!' end as sign,
       coalesce(c.o_orderkey, o.o_orderkey) as o_orderkey
from cur c
full outer join old o on c.o_orderkey = o.o_orderkey
where o.o_orderkey is null or c.o_orderkey is null
   or (c.o_custkey, c.o_orderstatus, c.o_totalprice, c.o_orderdate, c.o_orderpriority)
      is distinct from
      (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority)
"""


def q_scd2_orders(spark, sf_dir):
    """SCD Type-2 merge (operators/scd.py): the warehouse workflow that
    CONSUMES a diff change set. Dimension = orders as open current rows
    (valid_from = order date) plus a synthesized closed history version
    for every 50th key; change batch = the modified-orders relation with
    one effective date. The oracle replays the full merge semantics —
    latest-per-key, null-safe no-op detection, close+insert, brand-new
    keys, history pass-through — as one full-outer join with four
    branches. The streaming CDC sink (streaming/cdc_stream.py) is a thin
    composition of three independently-gated primitives (merge_scd2 here,
    versioned.commit in the hashdiff third arm, foreachBatch plumbing) and
    stays pytest-pinned rather than re-running a stream per bench entry —
    same precedent as the incremental-LSH composition. Gating it was
    re-costed in r12 (the r11 Next #4 ask): a trigger_once run over a 1%
    orders slice (tools/PROBE_cdc_gate_cost.json) measures 2.8s warm
    median / 7.0s cold at sf0.1 — versioned create + streaming machinery
    + merge commit, near-independent of slice size (sf0.01 reads the
    same 2.5s) — ~3x the VERDICT's own <=1s bar, so the measured-cost
    note declines it (the r10 SQLite discipline)."""
    from data_diff_spark.operators.scd import merge_scd2

    load_views(spark, sf_dir)
    orders = spark.table("orders")
    odate = F.to_date("o_orderdate")
    dim_cur = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        odate.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    dim_hist = orders.filter(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") - 1).alias("o_totalprice"),
        F.date_sub(odate, 30).alias("valid_from"),
        odate.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    changes = spark.sql(
        f"select o_orderkey, o_orderstatus, o_totalprice from ({MODIFIED_ORDERS_SQL})"
    ).withColumn("effective_ts", F.lit("1998-12-01").cast("date"))
    merged = merge_scd2(
        dim_cur.unionByName(dim_hist), changes, ["o_orderkey"],
        tracked_cols=["o_orderstatus", "o_totalprice"],
    )
    return merged.select(
        F.lit("scd2").alias("scope"),
        "o_orderkey",
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            F.col("valid_from").cast("string"),
            F.coalesce(F.col("valid_to").cast("string"), F.lit("open")),
            F.col("is_current").cast("string"),
        ).alias("v_str"),
        F.col("o_totalprice").cast("double").alias("v_num"),
    )


def q_merge3_orders(spark, sf_dir):
    """Three-way diff + merge (operators/merge3.py; r9 VERDICT Next #1 —
    implemented + pytest-pinned, no CORRECTNESS row until now): base =
    orders, ours = the standard modified copy, theirs = a second
    divergent copy built so every diff3 status occurs (see
    MODIFIED_ORDERS2_SQL). Two scoped arms off ONE pipeline family:
    scope='diff3' is the per-key classification, scope='merge3' the
    merged table under prefer='ours'. The oracle replays the
    classification as a 3-frame full-outer join with row-tuple
    IS DISTINCT FROM comparisons — fingerprint-free, so the md5-
    fingerprint route and the raw-tuple route must agree key by key."""
    from data_diff_spark.operators.merge3 import diff3, merge3

    load_views(spark, sf_dir)

    def seg(df):
        return table_segment(df, ["o_orderkey"], extra_columns=ORDERS_COLS[1:])

    base = seg(spark.table("orders").select(*ORDERS_COLS))
    ours = seg(spark.sql(MODIFIED_ORDERS_SQL))
    theirs = seg(spark.sql(MODIFIED_ORDERS2_SQL))
    # ONE classification join feeds both arms. localCheckpoint, not
    # persist (r12): the classification tree (3-frame full outer +
    # status CASE) is referenced by the diff3 scope AND by merge3's
    # winner join, and Catalyst re-analyzes a persisted subtree's full
    # logical tree on every downstream action — the lineage-truncated
    # form took this entry's cached-side projections from 2.7s to 0.03s
    # (bounded blocks, values identical, failure = re-run the entry).
    # EAGER since r13: the lazy gate means the entry's single drain job
    # reads d from two branches (d3 scope + merge3's winner join) — lazy
    # blocks would race concurrent first readers and recompute the
    # classification join; eager materialization runs it exactly once,
    # overlapped with the snapshot entry's other arms (_parallel_arms).

    def m3_proj(df):
        return df.select(
            F.lit("merge3").alias("scope"), "o_orderkey",
            F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("v_str"),
            F.col("o_totalprice").cast("double").alias("v_num"),
        )

    # merge_versions arm (r10 VERDICT Next #1): the same three states as
    # COMMITS of a versioned table — v1 = base snapshot, v2/v3 = diff
    # commits reconstructed through apply_diff at read time — merged via
    # merge_versions. _must_equal makes the versioned route share the
    # merge3 oracle: any divergence (commit-log replay, diff folding,
    # version addressing) adds symmetric-difference rows and fails the
    # driver's hash gate. Cost control, both legitimate at the semantics
    # level: (a) the versioned table is BUILT ONCE per sf_dir (it EXISTS
    # in a real deployment; merge_versions READS it); (b) the versioned
    # route verifies the o_orderkey % 3 = 0 key slice — merge3 classifies
    # each key independently, so the restricted merge equals the full
    # merge restricted, and the alternative passes the remaining keys
    # through from the (persisted) primary.
    import tempfile

    from data_diff_spark.operators.merge3 import merge_versions
    from data_diff_spark.sources import versioned as V

    root = os.path.join(tempfile.gettempdir(), "dds_merge_versions_gate",
                        os.path.basename(os.path.normpath(sf_dir)))
    sub = F.col("o_orderkey") % 3 == 0
    recipe = (f"{sf_dir}|mod3|{MODIFIED_ORDERS_SQL}|{MODIFIED_ORDERS2_SQL}|"
              f"{','.join(ORDERS_COLS)}")

    def _build_mv():
        _built_once(root, recipe, lambda: (
            V.create_table(base.df.select(*ORDERS_COLS).filter(sub), root,
                           keys=["o_orderkey"]),
            V.commit(ours.df.select(*ORDERS_COLS).filter(sub), root),
            V.commit(theirs.df.select(*ORDERS_COLS).filter(sub), root),
        ), sf_dir=sf_dir)
        return m3_proj(merge_versions(spark, root, 1, 2, 3, prefer="ours"))

    # the versioned-route construction (fixture manifest check + the
    # commit-log reconstruction plans, ~2-3s of driver/catalog work,
    # measured r13b) needs nothing from `d` — build it on a side thread
    # while the classification join checkpoints (guide §2.6/§7.3)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as _ex:
        _fut_mv = _ex.submit(_build_mv)
        d = diff3(base, ours, theirs).localCheckpoint()
        d3 = d.select(
            F.lit("diff3").alias("scope"), "o_orderkey",
            F.col("merge_status").alias("v_str"),
            F.lit(None).cast("double").alias("v_num"),
        )
        m3 = m3_proj(merge3(base, ours, theirs, prefer="ours", d3=d))
        mv = _fut_mv.result()
    # _must_equal's r13 single-aggregate shape, specialized to the verified
    # slice: slice membership (o_orderkey % 3 = 0) is computable from the
    # grouped row itself, so ONE sign-tagged aggregate over m3 ∪ mv emits
    # each row n_p + |n_p·[slice] − n_mv| times — the identical multiset to
    # the old p ∪ psub.exceptAll(mv) ∪ mv.exceptAll(psub) (non-slice
    # primary rows pass through n_p times with [slice] = 0 and n_mv = 0;
    # a spurious non-slice mv row still surfaces, with n_p possibly > 0,
    # as n_p + n_mv copies — exactly the old mv.exceptAll(psub) leg). m3
    # and mv each appear ONCE in the plan, so neither needs persist /
    # localCheckpoint / an eager count, and the old exceptAll pair's two
    # aggregations collapse into one Exchange.
    tag = "__dd_gate_arm__"
    cols = m3.columns
    u = m3.withColumn(tag, F.lit(0)).unionAll(
        mv.select(*cols).withColumn(tag, F.lit(1)))
    g = u.groupBy(*cols).agg(
        F.count(F.when(F.col(tag) == 0, True)).alias("__dd_n0__"),
        F.count(F.when(F.col(tag) == 1, True)).alias("__dd_n1__"),
    )
    emit = F.col("__dd_n0__") + F.abs(
        F.col("__dd_n0__") * sub.cast("long") - F.col("__dd_n1__"))
    m3 = (
        g.withColumn(tag, F.explode(F.array_repeat(F.lit(1), emit.cast("int"))))
        .select(*cols)
    )
    # d's checkpoint blocks are freed between entries via the persisted-
    # handle contract (see _CkptRelease) instead of waiting for GC
    return _track_persisted(d3.unionByName(m3), [_CkptRelease(d)])


def q_ivm_orders(spark, sf_dir):
    """Incremental aggregate maintenance (operators/incremental.py; r9
    VERDICT Next #1): the per-custkey rollup of orders refreshed FROM THE
    DIFF (old rollup + delta arithmetic over the -/+ rows), never
    rescanning the 'new' table — the 100 TB point of owning a diff
    engine. The oracle computes the rollup from scratch over the
    modified table; the bit-identical claim (exact decimal sums) means
    the two routes hash-match, not just approximately agree."""
    from data_diff_spark.diff import diff_tables
    from data_diff_spark.operators.incremental import (
        aggregate_table, refresh_aggregate)

    t1, t2 = _orders_segments(spark, sf_dir)
    res = diff_tables(t1, t2)
    keys, sums = ["o_custkey"], {"sum_price": "o_totalprice"}
    old = aggregate_table(spark.table("orders"), keys, sums)
    refreshed = refresh_aggregate(old, res.df, keys, sums)
    out = refreshed.select(
        F.lit("ivm").alias("scope"),
        F.col("o_custkey").alias("o_orderkey"),
        F.col("n").cast("string").alias("v_str"),
        F.col("sum_price").cast("double").alias("v_num"),
    )
    return _track_persisted(out, [], res.df)


def q_snapshot_scd2_all(spark, sf_dir):
    """Digest-snapshot diff, the SCD2 merge that consumes such a change
    set, the three-way merge that reconciles two divergent copies, and
    the diff-driven incremental rollup refresh — the full change-
    consumption family, one scoped relation (r9: snap+scd2; r10 adds
    diff3/merge3/ivm). All five arms are driven by the same
    deterministic modified-orders machinery; each arm's oracle replays
    it independently."""
    load_views(spark, sf_dir)

    # All four arm constructions are independent pipelines over the same
    # deterministic modified-orders machinery: build them concurrently
    # (_parallel_arms), and persist+materialize the two arms that were
    # previously computed inside the drain (snap, scd2) so the drain job
    # only reads cache — the r12 phase probe read this entry as 6.3s of
    # sequential construction (merge3/ivm internal actions) followed by
    # an 8.9s drain (snap + scd2 executing serially after them).
    def _snap():
        df = q_snapshot_diff(spark, sf_dir).select(
            F.lit("snap").alias("scope"),
            "o_orderkey",
            F.col("sign").alias("v_str"),
            F.lit(None).cast("double").alias("v_num"),
        ).persist()
        df.count()
        return df

    def _scd2():
        df = q_scd2_orders(spark, sf_dir).persist()
        df.count()
        return df

    snap, scd2, m3, ivm = _parallel_arms(
        _snap, _scd2,
        lambda: q_merge3_orders(spark, sf_dir),
        lambda: q_ivm_orders(spark, sf_dir),
    )
    return _track_persisted(
        snap.unionByName(scd2).unionByName(m3).unionByName(ivm),
        [snap, scd2], snap, scd2, m3, ivm,
    )


ORACLE_SNAPSHOT_SCD2_ALL = f"""
with dim_cur as (
  select o_orderkey, o_orderstatus, o_totalprice,
         cast(o_orderdate as date) as valid_from,
         cast(null as date) as valid_to, true as is_current
  from orders),
dim_hist as (
  select o_orderkey, 'X' as o_orderstatus, o_totalprice - 1 as o_totalprice,
         cast(o_orderdate as date) - 30 as valid_from,
         cast(o_orderdate as date) as valid_to, false as is_current
  from orders where o_orderkey % 50 = 0),
ch as (
  select o_orderkey, o_orderstatus, o_totalprice, date '1998-12-01' as eff
  from ({MODIFIED_ORDERS_SQL})),
j as (
  select d.o_orderkey as dk, d.o_orderstatus as ds, d.o_totalprice as dp,
         d.valid_from as vf,
         c.o_orderkey as ck, c.o_orderstatus as cs, c.o_totalprice as cp, c.eff
  from dim_cur d full outer join ch c on d.o_orderkey = c.o_orderkey),
scd as (
  -- unchanged current rows (no observation, or observation equals current)
  select dk as o_orderkey, ds as o_orderstatus, dp as o_totalprice,
         vf as valid_from, cast(null as date) as valid_to, true as is_current
  from j where dk is not null
    and (ck is null or ((ds, dp) is not distinct from (cs, cp)))
  union all
  -- real change: close the current row at the effective date
  select dk, ds, dp, vf, eff, false
  from j where dk is not null and ck is not null
    and ((ds, dp) is distinct from (cs, cp))
  union all
  -- insert the new version (changed keys and brand-new keys)
  select ck, cs, cp, eff, cast(null as date), true
  from j where ck is not null
    and (dk is null or ((ds, dp) is distinct from (cs, cp)))
  union all
  select * from dim_hist)
select 'scd2' as scope, o_orderkey,
       o_orderstatus || '|' || cast(valid_from as varchar) || '|' ||
         coalesce(cast(valid_to as varchar), 'open') || '|' ||
         cast(is_current as varchar) as v_str,
       cast(o_totalprice as double) as v_num
from scd
union all
select 'snap' as scope, o_orderkey, sign as v_str, cast(null as double) as v_num
from ({{snap}})
"""


def _merge3_ivm_oracle() -> str:
    """DuckDB replay of the diff3 classification (fingerprint-free: raw
    row-tuple IS DISTINCT FROM over a 3-frame full-outer join), the
    prefer='ours' merge winner selection, and the from-scratch rollup the
    IVM refresh must equal bit-for-bit."""
    nk = ORDERS_COLS[1:]
    bsel = ", ".join(f"b.{c} as b_{c}" for c in nk)
    osel = ", ".join(f"o.{c} as o_{c}" for c in nk)
    tsel = ", ".join(f"t.{c} as t_{c}" for c in nk)
    bt = "(" + ", ".join(f"b_{c}" for c in nk) + ")"
    ot = "(" + ", ".join(f"o_{c}" for c in nk) + ")"
    tt = "(" + ", ".join(f"t_{c}" for c in nk) + ")"
    return f"""
with m3o as ({MODIFIED_ORDERS_SQL}),
m3t as ({MODIFIED_ORDERS2_SQL}),
j3 as (
  select coalesce(b.o_orderkey, o.o_orderkey, t.o_orderkey) as k,
         b.o_orderkey is not null as in_b,
         o.o_orderkey is not null as in_o,
         t.o_orderkey is not null as in_t,
         {bsel}, {osel}, {tsel}
  from orders b
  full outer join m3o o on b.o_orderkey = o.o_orderkey
  full outer join m3t t on coalesce(b.o_orderkey, o.o_orderkey) = t.o_orderkey
),
cls as (
  select *, case when not oc and not tc then 'unchanged'
                 when oc and not tc then 'ours'
                 when not oc and tc then 'theirs'
                 when same_res then 'both_same'
                 else 'conflict' end as status
  from (
    select *,
      ((in_b <> in_o) or (in_b and in_o and {bt} is distinct from {ot})) as oc,
      ((in_b <> in_t) or (in_b and in_t and {bt} is distinct from {tt})) as tc,
      ((in_o = in_t) and (not in_o or {ot} is not distinct from {tt})) as same_res
    from j3) z
)
select 'diff3' as scope, k as o_orderkey, status as v_str,
       cast(null as double) as v_num
from cls
union all
select 'merge3' as scope, k as o_orderkey,
       st || '|' || pr as v_str, cast(tp as double) as v_num
from (
  select k,
    case when status = 'unchanged' then b_o_orderstatus
         when status in ('ours','both_same','conflict') then o_o_orderstatus
         else t_o_orderstatus end as st,
    case when status = 'unchanged' then b_o_orderpriority
         when status in ('ours','both_same','conflict') then o_o_orderpriority
         else t_o_orderpriority end as pr,
    case when status = 'unchanged' then b_o_totalprice
         when status in ('ours','both_same','conflict') then o_o_totalprice
         else t_o_totalprice end as tp,
    case when status = 'unchanged' then in_b
         when status in ('ours','both_same','conflict') then in_o
         else in_t end as present
  from cls) w
where present
union all
select 'ivm' as scope, o_custkey as o_orderkey,
       cast(n as varchar) as v_str, sum_price as v_num
from (
  select o_custkey, count(*) as n,
         cast(sum(cast(o_totalprice as decimal(38,6))) as double) as sum_price
  from m3o group by o_custkey) r
"""


def _snapshot_family_oracle() -> str:
    return (
        "select * from (\n"
        + ORACLE_SNAPSHOT_SCD2_ALL.format(snap=ORACLE_SNAPSHOT_DIFF)
        + "\n) union all select * from (\n"
        + _merge3_ivm_oracle()
        + "\n)"
    )


def q_duplicate_spans(spark, sf_dir):
    """Substring-level dedup (operators/spans.py): maximal cross-doc
    duplicated word spans via k-gram anchoring — the passage-granularity
    family member next to exact/Jaccard/MinHash/SimHash whole-doc dedup.
    Oracle rebuilds spans from the raw gram text (no hashing) with SQL
    windows: two independent routes to the same span set."""
    from data_diff_spark.operators.spans import duplicate_spans

    load_views(spark, sf_dir)
    return duplicate_spans(spark.table("documents"), k=8)


def _duplicate_spans_oracle(k: int = 8) -> str:
    t = TX.duckdb_tokens("text")
    return f"""
with w as (select doc_id, {t} as ws from documents),
g as (select doc_id, i as pos, array_to_string(ws[i:i+{k - 1}],' ') as gram
      from w, unnest(range(1, len(ws)-{k}+2)) as t(i) where len(ws) >= {k}),
d as (select gram from g group by gram having count(distinct doc_id) > 1),
m as (select doc_id, pos, pos+{k}-1 as e from g where gram in (select gram from d)),
isl as (select doc_id, pos, e,
         case when pos > coalesce(max(e) over (partition by doc_id order by pos
              rows between unbounded preceding and 1 preceding), -1) + 1
              then 1 else 0 end as brk
        from m),
isl2 as (select *, sum(brk) over (partition by doc_id order by pos
          rows between unbounded preceding and current row) as grp from isl)
select doc_id, min(pos) as span_start, max(e) as span_end,
       max(e)-min(pos)+1 as span_words
from isl2 group by doc_id, grp
"""


def q_snm_pairs(spark, sf_dir):
    """MULTI-PASS sorted-neighborhood near-dup pairs (dedup.py:
    snm_pairs_multi, the Hernandez-Stolfo merge/purge configuration):
    pass 1 sorts by the text, pass 2 by its 10-char-offset suffix (so
    records differing only in their opening words still meet), pair sets
    canonicalized and unioned. Each pass is the blocking strategy that
    needs a TOTAL order, executed as monotone prefix buckets + carry rows
    instead of a single-task global sort. The oracle IS the naive global
    row_number formulation of both passes, so the gate proves the bucketed
    plan reproduces the total-order semantics exactly; Levenshtein
    similarity kept integer (dist, max_len) so the hash compare is
    float-free."""
    from data_diff_spark.operators.dedup import snm_pairs_multi

    load_views(spark, sf_dir)
    docs = spark.table("documents").withColumn("k2", F.expr("substring(text, 11)"))
    return snm_pairs_multi(
        docs, ["text", "k2"], compare_col="text", window=4, max_edit_pct=20
    )


ORACLE_SNM_PAIRS = """
with s as (select doc_id, text, row_number() over (order by text, doc_id) as rn
           from documents),
p1 as (select a.doc_id as id_a, b.doc_id as id_b,
              levenshtein(a.text, b.text)::INT as edit_dist,
              greatest(length(a.text), length(b.text))::INT as max_len
       from s a join s b on b.rn > a.rn and b.rn <= a.rn + 4),
s2 as (select doc_id, text,
              row_number() over (order by substring(text, 11), doc_id) as rn
       from documents),
p2 as (select a.doc_id as id_a, b.doc_id as id_b,
              levenshtein(a.text, b.text)::INT as edit_dist,
              greatest(length(a.text), length(b.text))::INT as max_len
       from s2 a join s2 b on b.rn > a.rn and b.rn <= a.rn + 4)
select distinct least(id_a, id_b) as id_a, greatest(id_a, id_b) as id_b,
       edit_dist, max_len
from (select * from p1 union all select * from p2)
where edit_dist*100 <= 20*max_len
"""


# --- merged gate entries (see _must_equal) ----------------------------------


def q_events_hourly_all(spark, sf_dir):
    """Batch hourly rollup AND its streaming formulation (AvailableNow, run
    to completion) verified equal under one gate entry. The stream arm's
    bounded harness runs eagerly at construction — build the batch plan
    concurrently with it (guide §2.6)."""
    load_views(spark, sf_dir)
    batch, stream = _parallel_arms(
        lambda: q_events_hourly(spark, sf_dir),
        lambda: q_events_hourly_stream(spark, sf_dir),
    )
    return _must_equal(batch, stream)


def q_events_sessionize_all(spark, sf_dir):
    """Three independent sessionization formulations — lag-window batch,
    native session_window, stateful streaming (applyInPandasWithState) —
    verified equal under one gate entry. The stream arm's bounded harness
    runs eagerly at construction — build the two batch plans concurrently
    with it (guide §2.6)."""
    load_views(spark, sf_dir)
    lag, sw, stream = _parallel_arms(
        lambda: q_events_sessionize(spark, sf_dir),
        lambda: q_events_session_window(spark, sf_dir),
        lambda: q_events_sessionize_stream(spark, sf_dir),
    )
    return _must_equal(lag, sw, stream)


_LSH_INC_MOD = 11  # doc_id % 11 == 0 is the "new ingest batch" slice


def q_lsh_incremental(spark, sf_dir):
    """Persisted-LSH-index increment as an oracle scope (r10 VERDICT Next
    #1 — previously pytest-only): the corpus minus every 11th doc is
    materialized as the bucketed bands+shingles index (lsh_index_write),
    the 11th-doc slice probes it (minhash_lsh_incremental), and the
    output — near-dup pairs touching AT LEAST ONE new doc — must equal
    the full-corpus brute-force Jaccard pairs restricted to pairs with a
    new id (same 32x4-band miss-probability argument as the full arm:
    ~5e-8 per true pair at J=0.8). Index write + Exchange-free probe are
    both inside the gated pipeline."""
    import tempfile

    load_views(spark, sf_dir)
    docs = spark.table("documents")
    path = os.path.join(tempfile.gettempdir(), "dds_lsh_gate",
                        os.path.basename(os.path.normpath(sf_dir)))
    # build-once: the persisted index EXISTS in a real deployment — the
    # O(new) probe is the operator under test (index construction itself
    # is the minhash pipeline the 'pairs' scope already gates)
    from data_diff_spark.streaming.events_stream import table_rows

    n_docs = table_rows(spark, sf_dir, "documents")
    _built_once(path, f"{sf_dir}|mod={_LSH_INC_MOD}|t=0.8|lsh_index_write-defaults",
                lambda: DD.lsh_index_write(
                    docs.filter(F.col("doc_id") % _LSH_INC_MOD != 0), path,
                    threshold=0.8, n_rows=n_docs - n_docs // _LSH_INC_MOD),
                sf_dir=sf_dir)
    return DD.minhash_lsh_incremental(
        docs.filter(F.col("doc_id") % _LSH_INC_MOD == 0), path)


def q_neardup_pairs_all(spark, sf_dir):
    """Brute-ish inverted-index Jaccard AND banded MinHash-LSH (candidate
    gen + exact verify) must emit the identical pair set (at 32x4 bands the
    per-pair miss probability at J=0.8 is ~5e-8); plus the persisted-index
    incremental composition as its own oracle scope (r11 — previously
    pinned only in tests/test_text_dedup.py)."""
    load_views(spark, sf_dir)
    # every subtree here — both gate arms and the incremental probe —
    # appears exactly once in the output plan (r13 single-aggregate gate),
    # so nothing needs persist or an eager count: the drain's one job
    # schedules the three independent pipelines' stages concurrently
    # (guide §2.6) with zero extra actions. CONSTRUCTION itself is not
    # free, though: building the three plans costs ~1.1s + 0.9s + 2.2s of
    # driver-side analysis/py4j/catalog work (the incremental arm reads
    # the bucketed-index catalog entry) measured warm at sf0.1 — serial
    # by default, so the independent constructions run in concurrent
    # driver threads (guide §7.3: plan-building is real wall-clock).
    a, b, inc_raw = _parallel_arms(
        lambda: q_ngram_jaccard_pairs(spark, sf_dir),
        lambda: q_dedup_minhash_lsh(spark, sf_dir),
        lambda: q_lsh_incremental(spark, sf_dir),
    )
    pairs = _must_equal(a, b)
    p = pairs.select(F.lit("pairs").alias("scope"), "id_a", "id_b", "jaccard")
    inc = inc_raw.select(
        F.lit("incremental").alias("scope"), "id_a", "id_b", "jaccard")
    return _track_persisted(p.unionAll(inc), [], pairs, inc_raw)


def _neardup_pairs_all_oracle() -> str:
    return f"""
with allp as ({_jaccard_pairs_oracle()})
select 'pairs' as scope, * from allp
union all
select 'incremental' as scope, * from allp
where id_a % {_LSH_INC_MOD} = 0 or id_b % {_LSH_INC_MOD} = 0
"""


def q_range_join_all(spark, sf_dir):
    """Batch bucketed-bin interval join AND the watermarked stream-stream
    variant, verified equal under one gate entry. The stream arm runs its
    bounded harness to completion eagerly (driver-bound micro-batch
    machinery) — build the batch arm's plan concurrently instead of after
    it (guide §2.6)."""
    load_views(spark, sf_dir)
    batch, stream = _parallel_arms(
        lambda: q_range_join_attribution(spark, sf_dir),
        lambda: q_range_join_stream(spark, sf_dir),
    )
    return _must_equal(batch, stream)


def q_hashdiff_orders_all(spark, sf_dir):
    """Local bucketed hashdiff, the true cross-engine path (DuckDB side
    computing its own digests), AND the versioned-table v1-vs-v2 diff
    (commit-log reconstruction, sources/versioned.py) must all produce
    the identical diff relation. The three arm constructions each run
    internal actions (paired-digest collect + differing-key count;
    Spark-side digest toArrow + the DuckDB-side digest scan; the
    reconstruction diff's same two) — independent pipelines, so they
    build concurrently (_parallel_arms) instead of back-to-back."""
    load_views(spark, sf_dir)
    local, cross, ver = _parallel_arms(
        lambda: q_hashdiff_orders(spark, sf_dir),
        lambda: q_hashdiff_cross_engine(spark, sf_dir),
        lambda: q_version_diff_orders(spark, sf_dir),
    )
    return _must_equal(local, cross, ver)


def q_asof_purchase_all(spark, sf_dir):
    """Keyed as-of join (per-user window), keyless global as-of (time-
    bucketed carry design), and the STREAM-STREAM as-of run to completion
    (VERDICT r6 ask #3: it had no CORRECTNESS row) in one scoped relation;
    the oracles are DuckDB's native ASOF LEFT JOIN in both shapes. The
    streaming arm's final reductions are mapped back to the keyed shape
    through the static events table (event_id is unique — pinned in
    tests/test_asof_stream.py) and _must_equal'd into the keyed arm, so
    any divergence in the as-of core (event -> matched purchase) is a
    loud hash mismatch."""
    from concurrent.futures import ThreadPoolExecutor

    from data_diff_spark.streaming.asof_stream import asof_stream_batch_equivalent

    # state partitions from the one bounded-stream sizing rule (the r7
    # two-point fit — 8 under 500k events else 32 — lived here, and its
    # `spark.table("events").count()` cost a full action per run).
    # The bounded stream-stream run is independent of the batch window
    # arms: run it on a side thread while the keyed window and the
    # keyless global arm CONSTRUCT and materialize (guide §2.6) — the
    # r13b timeline probe read ~1.5s of keyed/glob plan building running
    # BEFORE the harness thread even started; the future now launches
    # first, so plan construction also hides under the harness.
    with ThreadPoolExecutor(max_workers=1) as _ex:
        _fut = _ex.submit(lambda: _sized_stream_state(
            spark, lambda: asof_stream_batch_equivalent(spark, sf_dir),
            n=_event_stream_state_n(spark, sf_dir)))
        keyed = q_asof_purchase(spark, sf_dir).withColumn(
            "scope", F.lit("keyed")).persist()
        raw_glob = q_asof_global(spark, sf_dir).persist()
        keyed.count()
        raw_glob.count()
        sfinal = _fut.result()
    ev = spark.table("events").select(
        "event_id", "user_id", "ts", "event_type", "value")
    skeyed = (
        sfinal.select("event_id", "purchase_us", "purchase_value")
        .join(ev, "event_id")
        .select(
            "event_id", "user_id", "ts", "event_type", "value",
            F.timestamp_micros("purchase_us").alias("purchase_ts"),
            "purchase_value",
        )
        .withColumn("scope", F.lit("keyed"))
    )
    keyed = _must_equal(keyed, skeyed.select(*keyed.columns))

    glob = (
        raw_glob
        .withColumn("value", F.lit(None).cast(dict(keyed.dtypes)["value"]))
        .withColumn("scope", F.lit("global"))
    )
    return _track_persisted(
        keyed.unionAll(glob.select(*keyed.columns)), [raw_glob], keyed, raw_glob)


ORACLE_ASOF_ALL = """
select 'keyed' as scope, e.event_id, e.user_id, e.ts, e.event_type, e.value,
       p.ts as purchase_ts, p.value as purchase_value
from events e
asof left join (
  select user_id, ts, max(value) as value
  from events where event_type = 'purchase'
  group by user_id, ts
) p on e.user_id = p.user_id and e.ts >= p.ts
union all
select 'global' as scope, e.event_id, e.user_id, e.ts, e.event_type,
       cast(null as double) as value,
       p.ts as purchase_ts, p.purchase_value
from events e
asof left join (
  select ts, max(value) as purchase_value
  from events where event_type = 'purchase' group by ts
) p on e.ts >= p.ts
"""


def q_joindiff_orders_scoped(spark, sf_dir):
    """joindiff over the full table + restricted to an update-column window
    (min_update/max_update), tagged by scope in one relation."""
    full = q_joindiff_orders(spark, sf_dir).withColumn("scope", F.lit("full"))
    win = q_joindiff_orders_window(spark, sf_dir).withColumn("scope", F.lit("window"))
    return full.unionAll(win.select(*full.columns))


ORACLE_JOINDIFF_ORDERS_SCOPED = f"""
select 'full' as scope, * from ({_orders_diff_oracle()})
union all
select 'window' as scope, * from ({_orders_window_oracle()})
"""


def q_export_roundtrip_checksums(spark, sf_dir):
    """Training-export round trip as an oracle gate (VERDICT r10 Next #1):
    the canonical normalized strings of a deterministic orders slice
    (o_orderkey % 7 = 0) are exported to BOTH shard formats — Arrow IPC
    files and WebDataset tars (sources/export.py) — read back through the
    same readers the arrowshards:// / webdataset:// URI schemes use, and
    re-checksummed with the segment fingerprint. The oracle recomputes
    (count, checksum) directly from the orders table, so ANY byte the
    writer/reader pair loses or alters (member naming, utf-8 encoding,
    null-member skipping, shard boundaries, empty strings) breaks the
    hash. Zero-diff through the export IS the gate. Reference tie: the
    materialize sink surface (joindiff_tables.py:396-399)."""
    import shutil
    import tempfile

    from data_diff_spark.constants import NULL_LITERAL
    from data_diff_spark.normalize import md5_as_int
    from data_diff_spark.sources.export import (
        read_arrow_shards,
        read_webdataset,
    )

    load_views(spark, sf_dir)
    sub = spark.table("orders").select(*ORDERS_COLS).filter(
        F.col("o_orderkey") % 7 == 0)
    t = table_segment(sub, ["o_orderkey"], extra_columns=ORDERS_COLS[1:])
    vals = t.get_values()  # canonical strings, nulls preserved
    base = os.path.join(tempfile.gettempdir(), "dds_export_gate",
                        os.path.basename(os.path.normpath(sf_dir)))
    a_dir, w_dir = os.path.join(base, "arrow"), os.path.join(base, "wds")
    # one member per column per key: extensions are the member suffix and
    # must be UNIQUE per column (same-ext columns overwrite each other)
    exts = {c: c.removeprefix("o_") for c in ORDERS_COLS[1:]}
    for d in (a_dir, w_dir):
        # the read-back frames are evaluated lazily by the caller, so the
        # dirs persist for the session; a fresh run clears stale shards
        # (leftover extra shards would be silently unioned into the scan)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    # ONE pass writes both shard formats (r13b): the two concurrent
    # writer jobs each re-evaluated the full normalization pipeline over
    # the slice; the fused writer scans it once and emits identical
    # per-format bytes (same slicing, same names)
    from data_diff_spark.sources.export import write_arrow_and_webdataset

    write_arrow_and_webdataset(
        vals, a_dir, w_dir, key_col="o_orderkey", extensions=exts,
        rows_per_shard=4096).count()

    def cks_agg(df):
        fp = F.concat_ws(
            "|", *[F.coalesce(F.col(c), F.lit(NULL_LITERAL)) for c in ORDERS_COLS])
        return df.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(md5_as_int(fp)).cast("string").alias("cks"),
        )

    back_a = read_arrow_shards(spark, a_dir).select(*ORDERS_COLS)
    back_w = read_webdataset(
        spark, w_dir, key_col="o_orderkey", extensions=exts,
        text_cols=set(ORDERS_COLS[1:]),
    ).select(*ORDERS_COLS)
    return (
        cks_agg(back_a).withColumn("scope", F.lit("arrowshards"))
        .unionAll(cks_agg(back_w).withColumn("scope", F.lit("webdataset")))
    )


ORACLE_CHECKSUM_EXPORT_SLICE = ORACLE_CHECKSUM_ORDERS.replace(
    "from orders", "from orders where o_orderkey % 7 = 0"
)


def q_checksum_orders_scoped(spark, sf_dir):
    """Segment (count, checksum) over: the full table, a key-range
    restriction, the apply_diff(A, diff(A,B)) == B closure, and the
    Arrow-IPC / WebDataset export round trips — five checksum workflows,
    one scoped relation."""
    full = q_checksum_orders(spark, sf_dir).withColumn("scope", F.lit("full"))
    rng = q_checksum_orders_keyrange(spark, sf_dir).withColumn("scope", F.lit("keyrange"))
    app = q_apply_diff_roundtrip(spark, sf_dir).withColumn("scope", F.lit("applied"))
    exp = q_export_roundtrip_checksums(spark, sf_dir)
    return (full.unionAll(rng.select(*full.columns))
            .unionAll(app.select(*full.columns))
            .unionAll(exp.select(*full.columns)))


def _checksum_scoped_oracle() -> str:
    return f"""
select 'full' as scope, * from ({ORACLE_CHECKSUM_ORDERS})
union all
select 'keyrange' as scope, * from ({ORACLE_CHECKSUM_KEYRANGE})
union all
select 'applied' as scope, * from ({_apply_diff_oracle()})
union all
select 'arrowshards' as scope, * from ({ORACLE_CHECKSUM_EXPORT_SLICE})
union all
select 'webdataset' as scope, * from ({ORACLE_CHECKSUM_EXPORT_SLICE})
"""


def q_text_analysis_docs(spark, sf_dir):
    """The full per-document text-analysis surface in one relation: stats
    (tokens/BPE/lang-ID/quality), fingerprints (set/rolling/simhash), the
    cleaning-stage keep/reject verdict, and the hashed feature vector.

    All four parts are map-only column pipelines over the same rows, so
    they FUSE into one zero-shuffle chain of projections — the previous
    formulation joined the four standalone queries on doc_id, paying
    three shuffles to reassemble rows that were never apart (5.7 -> 4.7s
    at sf0.1; the remaining cost is the genuine breadth of per-row
    expression work, measured ~1.3s when the parts run as four separate
    codegen stages — the price of one very wide fused stage, accepted
    here for the zero-shuffle plan shape that matters at cluster scale).
    Stage order keeps the expensive array intermediates (token-hash
    arrays for simhash/vector) in their own projections per the
    staged-projection rule.

    r7 (VERDICT r6 ask #8): the suggested middle shapes — fingerprints
    and stats split behind one or two extra barriers — were A/B'd in one
    warm session (tools/ab_text_shapes.py, AB_r7_text_shapes.json):
    three interleaved runs read fused/split2/split3 within +-10% of each
    other with no stable winner (e.g. mins 3.99/4.17/4.12, medians
    4.67/4.25/5.03). The wide-stage overhead is NOT the codegen width;
    the fused shape stays (fewest operators, existing plan pin)."""
    from data_diff_spark.streaming.events_stream import table_rows

    load_views(spark, sf_dir)
    c = F.col("text")
    base = spark.table("documents").select("doc_id", "text")
    base = DD.with_simhash(base, "text", out="simhash",
                           n_rows=table_rows(spark, sf_dir, "documents"))
    base = TX.hashed_vector(base, dim=64,
                            n_rows=table_rows(spark, sf_dir, "documents"))
    # collapse barrier: without it CollapseProject folds the final scalar
    # select into the simhash/vector projections and the token-hash arrays
    # re-evaluate per reference (measured 5.0s vs 1.3s); shape pinned in
    # tests/test_plans.py::test_text_analysis_stays_staged
    base = project_barrier(base)
    qf = TX.quality_filter(
        base, min_tokens=20, min_quality=0.25, allowed_langs=["en", "und"]
    )
    return qf.select(
        "doc_id",
        TX.token_count(c).cast("long").alias("n_tokens"),
        TX.bpe_token_count(c).cast("long").alias("n_bpe_tokens"),
        TX.lang_id(c).alias("lang_pred"),
        TX.alpha_ratio(c).alias("alpha_ratio"),
        TX.mean_token_len(c).alias("mean_token_len"),
        TX.stopword_ratio(c, "en").alias("stopword_ratio_en"),
        TX.quality_score(c).alias("quality_score"),
        TX.set_fingerprint(c).alias("set_fp"),
        TX.rolling_fingerprint(c).alias("rolling_fp"),
        "simhash",
        "keep",
        "reject_reason",
        F.concat_ws(",", F.col("vector")).alias("vector_str"),
    )


def _text_analysis_oracle() -> str:
    return f"""
with s1 as ({_text_stats_oracle()}),
s2 as ({_doc_fingerprints_oracle()}),
s3 as ({_quality_filter_oracle()}),
s4 as ({_hashed_vectors_oracle()})
select s1.doc_id, s1.n_tokens, s1.n_bpe_tokens, s1.lang_pred, s1.alpha_ratio,
       s1.mean_token_len, s1.stopword_ratio_en, s1.quality_score,
       s2.set_fp, s2.rolling_fp, s2.simhash,
       s3.keep, s3.reject_reason,
       s4.vector_str
from s1
join s2 using (doc_id)
join s3 using (doc_id)
join s4 using (doc_id)
"""


def q_gifbmp_decode_features(spark, sf_dir):
    """REAL GIF + BMP decode paths in one leg: the same deterministic
    pixels, containerized as exact-palette GIF (even ids — LZW, color
    table) and 24-bit BMP (odd ids — DIB rows), decoded through the
    decode_image dispatch (functions/gif.py, functions/bmp.py; both
    pinned against independent in-test references). Lossless, so the
    arithmetic pixel oracle applies unchanged."""
    load_views(spark, sf_dir)
    media = MM.attach_gif_bmp_media(spark.table("documents"))
    return MM.extract_image_features(media).select(
        "doc_id",
        F.col("width").alias("gifbmp_width"),
        F.col("height").alias("gifbmp_height"),
        F.col("mean_r").alias("gifbmp_mean_r"),
        F.col("mean_g").alias("gifbmp_mean_g"),
        F.col("mean_b").alias("gifbmp_mean_b"),
    )


def q_hierjpeg_decode_features(spark, sf_dir):
    """REAL hierarchical-JPEG decode path (T.81 Annex J): the same
    deterministic pixels, containerized as a two-level lossless pyramid
    (DHP + reduced SOF3 + EXP + differential SOF7) and decoded through
    decode_image's full marker dispatch — reference expansion and
    differential reconstruction included (functions/jpeg.py; pyramid
    semantics pinned in tests/test_jpeg_hierarchical.py). Lossless, so
    the arithmetic pixel oracle applies unchanged."""
    load_views(spark, sf_dir)
    media = MM.attach_hierjpeg_media(spark.table("documents"))
    return MM.extract_image_features(media).select(
        "doc_id",
        F.col("width").alias("hjpeg_width"),
        F.col("height").alias("hjpeg_height"),
        F.col("mean_r").alias("hjpeg_mean_r"),
        F.col("mean_g").alias("hjpeg_mean_g"),
        F.col("mean_b").alias("hjpeg_mean_b"),
    )


def q_multimodal_decode_all(spark, sf_dir):
    """All six multimodal decode paths joined on doc_id: the
    deterministic fake-decoder template (byte stats), the REAL netpbm
    image codec (per-channel pixel means), the REAL RIFF/WAV audio codec
    (RMS/zero-crossings), the REAL WebP container round-trip, the REAL
    GIF/BMP pair, and the REAL hierarchical-JPEG pyramid — each an
    Arrow-batched mapInPandas pipeline."""
    # Overlap tried and REVERTED on measurement (r12): persisting the six
    # codec legs and materializing them concurrently (_must_equal pattern)
    # read 1.075 min / 1.091 median vs this shape in an interleaved A/B
    # (AB_r12_multimodal_overlap.json) — under bench conditions the one
    # drain action already runs the independent leg stages concurrently
    # (AQE submits ready stages together), so the persist+count pass is
    # pure overhead. The per-leg split lives in
    # tools/probe_multimodal_legs.py: hottest leg is hierjpeg at ~1.1s of
    # genuine encode+decode compute.
    out = q_multimodal_features(spark, sf_dir)
    out = out.join(q_image_decode_features(spark, sf_dir), "doc_id")
    out = out.join(q_audio_decode_features(spark, sf_dir), "doc_id")
    out = out.join(q_webp_decode_features(spark, sf_dir), "doc_id")
    out = out.join(q_gifbmp_decode_features(spark, sf_dir), "doc_id")
    out = out.join(q_hierjpeg_decode_features(spark, sf_dir), "doc_id")
    return out


def _multimodal_all_oracle() -> str:
    return f"""
with s1 as ({ORACLE_MULTIMODAL}),
s2 as ({MM.ORACLE_IMAGE_FEATURES}),
s3 as ({MM.ORACLE_AUDIO_FEATURES}),
s4 as ({MM.ORACLE_IMAGE_FEATURES}),
s5 as ({MM.ORACLE_IMAGE_FEATURES}),
s6 as ({MM.ORACLE_IMAGE_FEATURES})
select s1.doc_id, s1.n_bytes, s1.content_md5, s1.byte_mean,
       s2.width, s2.height, s2.mean_r, s2.mean_g, s2.mean_b,
       s3.sample_rate, s3.n_samples, s3.rms, s3.n_zero_cross,
       s4.width as webp_width, s4.height as webp_height,
       s4.mean_r as webp_mean_r, s4.mean_g as webp_mean_g,
       s4.mean_b as webp_mean_b,
       s5.width as gifbmp_width, s5.height as gifbmp_height,
       s5.mean_r as gifbmp_mean_r, s5.mean_g as gifbmp_mean_g,
       s5.mean_b as gifbmp_mean_b,
       s6.width as hjpeg_width, s6.height as hjpeg_height,
       s6.mean_r as hjpeg_mean_r, s6.mean_g as hjpeg_mean_g,
       s6.mean_b as hjpeg_mean_b
from s1
join s2 using (doc_id)
join s3 using (doc_id)
join s4 using (doc_id)
join s5 using (doc_id)
join s6 using (doc_id)
"""


def q_dedup_resolve_all(spark, sf_dir):
    """The near-dup pipeline end-to-end in one relation: LSH pairs ->
    connected components -> every doc tagged with (cluster_id, the cluster's
    kept canonical doc, cluster size, kept score)."""
    load_views(spark, sf_dir)
    from data_diff_spark.streaming.events_stream import table_rows

    docs = spark.table("documents")
    pairs = DD.minhash_lsh_dedup(docs, threshold=0.8,
                                 n_rows=table_rows(spark, sf_dir, "documents")
                                 ).persist()
    # one components() run feeds both the per-doc tags and the resolver
    # (dedup_resolve would otherwise recompute the assignment from pairs)
    assigned = DD.assign_clusters(docs, pairs).persist()
    clusters = assigned.select("doc_id", "cluster_id")
    resolved = DD.dedup_resolve(docs, pairs, clusters=assigned)
    out = clusters.join(resolved, "cluster_id").select(
        "doc_id", "cluster_id", "kept_id", "n_members", "kept_score"
    )
    # pairs as a handle releases ITS persist; pairs as an input harvests
    # the shingle cache riding on pairs._ddspark_persisted too
    return _track_persisted(out, [pairs, assigned], pairs)


def _dedup_resolve_all_oracle() -> str:
    q = TX.duckdb_quality_score("text")
    return f"""
with recursive {_components_cte()},
assigned as (
  select d.doc_id, coalesce(c.cluster_id, d.doc_id) as cluster_id
  from documents d left join comp c using (doc_id)
),
scored as (
  select a.cluster_id, d.doc_id as id, {q} as score
  from documents d join assigned a using (doc_id)
),
ranked as (
  select *, row_number() over (partition by cluster_id order by score desc, id desc) as rn,
         count(*) over (partition by cluster_id) as n_members
  from scored
),
kept as (select cluster_id, id as kept_id, n_members, score as kept_score
         from ranked where rn = 1)
select a.doc_id, a.cluster_id, k.kept_id, k.n_members, k.kept_score
from assigned a join kept k using (cluster_id)
"""


DOCS_TOKEN_BUDGET = 12000  # ~44% of the sf0.01 corpus, ~4.4% of sf0.1


def q_docs_token_budget(spark, sf_dir):
    """Budgeted corpus selection (functions/sampling.py): best-quality
    greedy prefix under a global token budget, found by histogram
    threshold search — no corpus sort; only the boundary region pays an
    ordered window. The oracle IS the naive global sort + window cumsum:
    two routes to the same kept set, per-doc token counts pinned in tag."""
    from data_diff_spark.functions.sampling import select_by_token_budget

    load_views(spark, sf_dir)
    kept = select_by_token_budget(spark.table("documents"), DOCS_TOKEN_BUDGET)
    out = kept.select(
        F.lit("budget").alias("scope"), "doc_id",
        F.col("n_tok").cast("string").alias("tag"),
    )
    return _track_persisted(out, getattr(kept, "_ddspark_persisted", []), kept)


def _docs_token_budget_oracle() -> str:
    q = TX.duckdb_quality_score("text")
    t = TX.duckdb_tokens("text")
    return f"""
with s as (select doc_id as id, {q} as score, len({t})::bigint as n_tok from documents),
c as (select id, n_tok,
             sum(n_tok) over (order by score desc, id asc
                              rows between unbounded preceding and current row) as cum
      from s)
select id as doc_id, n_tok from c where cum <= {DOCS_TOKEN_BUDGET}
"""


_WARC_GATE_MOD = 5  # documents slice wrapped into the synthetic WARC corpus


def q_warc_extract(spark, sf_dir):
    """WARC ingestion + html_to_text as an oracle gate (r10 VERDICT Next
    #1 — the extraction was pytest-only): a deterministic documents slice
    is HTML-escaped, wrapped in a template carrying script/style/comment
    traps, written as per-partition WARC files with full HTTP response
    records (DISTRIBUTED — the driver never sees a document), read back
    through sources/warc.py:read_warc, the HTTP envelope stripped in SQL,
    text re-extracted with functions/web.py:html_to_text, and the doc id
    parsed back out of the WARC-Target-URI. The oracle replays the
    template + the exact entity/tag/whitespace pipeline from the raw
    documents table — any drift in WARC framing (Content-Length, CRLF
    boundaries), HTTP payload split, or the extraction regexes breaks the
    row hash. Reference tie: C4-style ingestion is the pipeline in front
    of every text operator here."""
    import shutil
    import tempfile
    from typing import Iterator

    from data_diff_spark.functions.web import html_to_text
    from data_diff_spark.sources.warc import read_warc

    load_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text").filter(
        F.col("doc_id") % _WARC_GATE_MOD == 0)
    out_dir = os.path.join(tempfile.gettempdir(), "dds_warc_gate",
                           os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_warc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import os as _os
        import uuid

        import pandas as pd
        from pyspark import TaskContext

        # Deterministic per-partition file names: a retried or speculative
        # task OVERWRITES its predecessor's files instead of leaving
        # duplicate records that would spuriously fail the gate (r11
        # ADVICE). NOTE: executor-side open() into the driver's tempdir
        # assumes local mode — on a real cluster this writer targets a
        # shared filesystem path instead.
        pid = TaskContext.get().partitionId()
        seq = 0
        for pdf in batches:
            if not len(pdf):
                continue
            chunks = []
            for _, r in pdf.iterrows():
                did = int(r["doc_id"])
                esc = ((r["text"] or "")
                       .replace("&", "&amp;").replace("<", "&lt;")
                       .replace(">", "&gt;"))
                html = (
                    f"<html><head><title>d{did}</title>"
                    "<script>var x='<p>no</p>';</script>"
                    "<style>.x{color:red}</style></head>"
                    f"<body><!-- hidden --><h1>Doc {did}</h1>"
                    f"<p>{esc}</p></body></html>"
                ).encode("utf-8")
                http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                        b"charset=utf-8\r\n\r\n" + html)
                hdr = (
                    "WARC/1.0\r\n"
                    "WARC-Type: response\r\n"
                    f"WARC-Record-ID: <urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, str(did))}>\r\n"
                    f"WARC-Target-URI: http://synth.example/doc/{did}\r\n"
                    "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                    "Content-Type: application/http; msgtype=response\r\n"
                    f"Content-Length: {len(http)}\r\n\r\n"
                ).encode("ascii")
                chunks.append(hdr + http + b"\r\n\r\n")
            name = _os.path.join(out_dir, f"part-{pid:05d}-{seq:04d}.warc")
            seq += 1
            with open(name, "wb") as f:
                f.write(b"".join(chunks))
            yield pd.DataFrame({"n": [len(chunks)]})

    docs.mapInPandas(write_warc, "n long").count()  # materialize the corpus
    recs = read_warc(spark, os.path.join(out_dir, "*.warc"),
                     warc_types=["response"])
    body = F.expr(
        "substring(cast(content as string), "
        "instr(cast(content as string), '\r\n\r\n') + 4)")
    return recs.select(
        F.lit("warc").alias("scope"),
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        html_to_text(body).alias("tag"),
    )


def _warc_extract_oracle() -> str:
    # replay: escape -> (template text content) -> html_to_text's entity
    # decode IN ORDER -> whitespace collapse + trim. The unescape chain
    # must mirror web.py's replacement order (nbsp, amp, lt, gt, quot,
    # #39, apos) — the amp-before-lt double-unescape is part of the
    # pinned semantics, not a bug to "fix" on one side only.
    esc = ("replace(replace(replace(coalesce(text,''),"
           "'&','&amp;'),'<','&lt;'),'>','&gt;')")
    une = esc
    for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "''"),
                     ("&apos;", "''")):
        une = f"replace({une}, '{ent}', '{rep}')"
    return f"""
select 'warc' as scope, doc_id,
       trim(regexp_replace(
         'd' || doc_id || ' Doc ' || doc_id || ' ' || {une},
         '\\s+', ' ', 'g')) as tag
from documents where doc_id % {_WARC_GATE_MOD} = 0
"""


def q_docs_sampling(spark, sf_dir):
    """Deterministic sampling surface in one scoped relation: content-hash
    train/val/test split assignment, 20-per-language stratified sample,
    the corpus-mixture construction (r8: mix_corpora folded in here —
    both are hash-sampling semantics — to free a registry slot for the
    clean_docs LM/BPE gate), budgeted corpus selection (r9: the
    token-budget curation step, histogram threshold search vs the
    oracle's global-sort cumsum), and the WARC/html_to_text ingestion
    round trip (r11 — hosted here because the (scope, doc_id, tag)
    shape fits extraction output; see q_warc_extract)."""
    load_views(spark, sf_dir)
    # the five sub-constructions are independent, and two are not free:
    # the WARC arm writes its fixture files (a job) and the budget arm
    # runs its histogram threshold search — build them in concurrent
    # driver threads (guide §2.6/§7.3; measured 1.8s serial at sf0.1)
    s, t, m, b, w = _parallel_arms(
        lambda: q_docs_split_assign(spark, sf_dir).select(
            F.lit("split").alias("scope"), "doc_id",
            F.col("split").alias("tag")),
        lambda: q_docs_stratified_sample(spark, sf_dir).select(
            F.lit("stratified").alias("scope"), "doc_id",
            F.col("lang").alias("tag")),
        lambda: q_mix_corpora(spark, sf_dir).select(
            F.lit("mix").alias("scope"), "doc_id",
            F.col("mix_source").alias("tag")),
        lambda: q_docs_token_budget(spark, sf_dir),
        lambda: q_warc_extract(spark, sf_dir),
    )
    return _track_persisted(
        s.unionAll(t).unionAll(m).unionAll(b).unionAll(w.select(*s.columns)),
        [], b)


def _docs_sampling_oracle() -> str:
    return f"""
select 'split' as scope, doc_id, split as tag from ({_docs_split_oracle()})
union all
select 'stratified' as scope, doc_id, lang as tag from ({_docs_stratified_oracle()})
union all
select 'mix' as scope, doc_id, mix_source as tag from ({_mix_corpora_oracle()})
union all
select 'budget' as scope, doc_id, cast(n_tok as varchar) as tag
from ({_docs_token_budget_oracle()})
union all
select * from ({_warc_extract_oracle()})
"""


# --- registry ---------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

# ≤50 entries so the driver's 50-entry gate covers EVERY operator family
# (round 3 registered 63 and the last 13 went unverified). Same-semantics
# variants share an entry via _must_equal (divergence = hash mismatch);
# differently-shaped siblings union under a scope tag. r3->r4 renames:
#   events_hourly        += events_hourly_stream
#   events_sessionize    += events_session_window, events_sessionize_stream
#   neardup_pairs_jaccard = ngram_jaccard_pairs + dedup_minhash_lsh
#   range_join_attribution += range_join_stream
#   hashdiff_orders      += hashdiff_cross_engine
#   joindiff_orders      += joindiff_orders_window  (scope tag)
#   checksum_orders      += checksum_orders_keyrange, apply_diff_roundtrip
#   text_analysis_docs    = text_stats + doc_fingerprints +
#                           quality_filter_docs + hashed_doc_vectors
#   multimodal_decode     = multimodal_features + image_decode_features +
#                           audio_decode_features
#   dedup_resolve        += dedup_clusters (per-doc cluster + kept columns)
#   docs_sampling         = docs_split_assign + docs_stratified_sample
WORKLOAD: Dict[str, Tuple[QueryFn, Optional[str]]] = {
    "joindiff_orders": (q_joindiff_orders_scoped, ORACLE_JOINDIFF_ORDERS_SCOPED),
    "hashdiff_orders": (q_hashdiff_orders_all, _orders_diff_oracle()),
    "joindiff_lineitem_compound": (q_joindiff_lineitem, _lineitem_diff_oracle()),
    "hashdiff_lineitem_dupkeys": (q_hashdiff_lineitem, _hashdiff_lineitem_oracle()),
    "diff_stats_orders": (q_diff_stats_all, _diff_stats_all_oracle()),
    "percol_diff_counts_orders": (q_percol_diff_orders, _percol_oracle()),
    "checksum_orders": (q_checksum_orders_scoped, _checksum_scoped_oracle()),
    "key_range_orders": (
        q_key_range_orders,
        "select min(o_orderkey) as min_key, max(o_orderkey) as max_key, count(*) as cnt from orders",
    ),
    "tpch_q1": (q_tpch_q1, TPCH_Q1_SQL),
    "tpch_q3": (q_tpch_q3, TPCH_Q3_SQL),
    "tpch_q5": (q_tpch_q5, TPCH_Q5_SQL),
    "tpch_q17_subquery": (q_tpch_q17, TPCH_Q17_SQL),
    "tpch_q8_market_share": (q_tpch_q8, TPCH_Q8_SQL),
    "tpch_q10_returns": (q_tpch_q10, TPCH_Q10_SQL),
    "tpch_q4_exists": (q_tpch_q4, TPCH_Q4_SQL),
    "set_ops_except": (q_set_ops, ORACLE_SET_OPS),
    "events_hourly": (q_events_hourly_all, EVENTS_HOURLY_SQL),
    "events_sessionize": (q_events_sessionize_all, SESSIONIZE_ORACLE),
    "text_analysis_docs": (q_text_analysis_docs, _text_analysis_oracle()),
    "dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    # r11: persisted-index increment folded in as scope='incremental'
    "neardup_pairs_jaccard": (q_neardup_pairs_all, _neardup_pairs_all_oracle()),
    "docs_sampling": (q_docs_sampling, _docs_sampling_oracle()),
    "dedup_resolve": (q_dedup_resolve_all, _dedup_resolve_all_oracle()),
    "simhash_neardup_pairs": (q_simhash_neardup_pairs, _simhash_pairs_oracle()),
    "cosine_topk_exact": (q_cosine_topk, ORACLE_COSINE_TOPK),
    # r11: persisted-layout incremental ingest folded in as scope='sem_inc'
    "embedding_neardup_lsh": (
        q_embedding_neardup_all,
        ORACLE_EMBEDDING_NEARDUP_ALL.format(
            pairs=ORACLE_EMBEDDING_NEARDUP, sem=_semdedup_oracle(),
            sem_inc=_semdedup_inc_oracle()),
    ),
    "ann_topk_lsh": (q_ann_topk_lsh, _ann_lsh_oracle()),
    # r9: IVF-PQ folded in as a second scope (same coarse quantizer)
    "ann_topk_ivf": (q_ann_topk_ivf_all, _ann_ivf_all_oracle()),
    "multimodal_decode": (q_multimodal_decode_all, _multimodal_all_oracle()),
    "events_json_extract": (q_events_json_extract, ORACLE_EVENTS_JSON),
    # r10: validate rules + the profiler's exact core folded in as scopes
    "collect_stats_lineitem": (q_collect_stats_all, _collect_stats_all_oracle()),
    "events_rollup": (q_events_rollup_all, ORACLE_EVENTS_ROLLUP_ALL),
    "events_stream_validate": (q_events_stream_validate, ORACLE_STREAM_VALIDATE),
    "get_values_orders": (q_get_values_orders, _get_values_oracle()),
    "events_dedup_stream": (q_events_dedup_stream, ORACLE_EVENTS_DEDUP_STREAM),
    "joindiff_mixed_precision": (q_joindiff_mixed_precision, ORACLE_MIXED_PRECISION),
    "asof_purchase_all": (q_asof_purchase_all, ORACLE_ASOF_ALL),
    "duplicate_spans_docs": (q_duplicate_spans, _duplicate_spans_oracle()),
    "range_join_attribution": (q_range_join_all, ORACLE_RANGE_JOIN),
    "decontaminate_docs": (q_decontaminate, DD.duckdb_decontaminate("doc_id % 97 = 0", n=5)),
    "pack_sequences_docs": (q_pack_sequences, _pack_sequences_oracle()),
    "redact_pii_docs": (q_redact_pii, _redact_pii_oracle()),
    "chunk_documents": (q_chunk_documents, _chunk_documents_oracle()),
    "token_vocab": (q_token_vocab_all, ORACLE_TOKEN_VOCAB_SKEWED),
    # r9: SCD2 merge folded in as a scoped arm (it had only pytest pins);
    # r10: diff3/merge3 (three-way reconcile) + ivm (diff-driven rollup
    # refresh) folded in — the full change-consumption family
    "snapshot_diff_orders": (q_snapshot_scd2_all, _snapshot_family_oracle()),
    "snm_pairs_docs": (q_snm_pairs, ORACLE_SNM_PAIRS),
    # r9: cluster_documents folded in as scopes (same entry key)
    "quantize_embeddings": (
        q_embeddings_repr_all,
        _embeddings_repr_oracle().format(dc=_doc_clusters_oracle()),
    ),
    "zorder_key_events": (q_zorder_key_events, _zorder_oracle()),
    # r8: mix_corpora folded into docs_sampling (scope='mix'); its slot now
    # gates the LM/BPE/clean_corpus family (VERDICT r7 Next #3)
    "clean_docs": (q_clean_docs, _clean_docs_oracle()),
    "repetition_stats_docs": (q_repetition_stats, _repetition_stats_oracle()),
}


# Persisted handles from the most recently returned entry, released on the
# main thread when the NEXT entry is invoked (by which point the previous
# result has been drained — the driver/bench run entries strictly
# sequentially). Deterministic release between entries is the replacement
# for the GC-finalizer design, which stalled running jobs (see
# _track_persisted).
_PENDING_RELEASE: list = []


def _with_cache_release(fn: QueryFn) -> QueryFn:
    """Wrap a registry entry so the PREVIOUS entry's `_ddspark_persisted`
    handles are released before this entry runs. The driver's correctness
    harness and bench run 50 entries in one session without ever calling
    DiffResult.unpersist(); without this, every diff/dedup entry's operator
    caches would accumulate for the whole run."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        while _PENDING_RELEASE:
            h = _PENDING_RELEASE.pop()
            try:
                h.unpersist(False)
            except Exception:  # noqa: BLE001 - session teardown races
                pass
        out = fn(spark, sf_dir)
        _PENDING_RELEASE.extend(getattr(out, "_ddspark_persisted", []))
        return out

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


WORKLOAD = {name: (_with_cache_release(fn), sql) for name, (fn, sql) in WORKLOAD.items()}
