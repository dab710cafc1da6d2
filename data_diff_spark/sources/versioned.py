"""Versioned parquet tables: commit-log time travel with no table-format jars.

The reference's daily driver is diffing LIVE mutable warehouse tables (13
adapters, /root/reference/data_diff/databases/_connect.py:79-93). The Spark
equivalent is a table format with version history — Delta/Iceberg — but
those need jars this cluster may not carry (connect.py's delta:// gate).
This module provides the "what changed between version N and M" story on
plain parquet:

    layout:  <root>/_versions.json          commit log (single writer)
             <root>/v00001/                 full parquet snapshot
             <root>/v00002/                 DIFF rows (sign + columns)
             <root>/v00005/                 full again (checkpoint)

Every commit stores either the full table or just the diff produced by
diff_tables — whichever is smaller (auto-checkpoint above
`checkpoint_ratio`, the same trade as Delta's periodic checkpoint files vs
its JSON action log). Reading version N finds the latest full snapshot at
or before N and folds apply_diff (diff.py — closure property is
oracle-verified by the apply_diff_roundtrip workload query) over the diff
commits after it.

Scale notes (100 TB):
  - storage per commit is O(changed rows), not O(table) — the property
    that makes daily versions of a 100 TB table affordable;
  - reconstruction cost is one full-snapshot scan + one left_anti join
    per diff commit since the checkpoint (each anti-join key set is the
    commit's '-' rows — broadcast-eligible when diffs are small); keep
    chains short with checkpoint_every;
  - version_diff(v1, v2) reconstructs both sides and runs the engine's
    own differ — semantics identical to diffing two live tables;
  - the JSON log is single-writer (write-temp-then-rename). Concurrent
    writers need a real transaction log — that is exactly the point where
    Delta/Iceberg (delta:// scheme) takes over.

URI scheme (registered in sources/connect.py):
    versioned://<root>        latest version
    versioned://<root>@v3     time travel to version 3
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_versions.json"


@dataclass
class _Commit:
    version: int
    kind: str  # "full" | "diff"
    dir: str
    timestamp: float
    rows: Optional[int] = None
    # row count of the TABLE at this version (not of the stored diff).
    # Maintained so commit() can make its checkpoint decision from the
    # diff's sign counts alone — without it every commit re-scanned the
    # entire new table just to evaluate the ratio heuristic, a full-table
    # pass per commit that dwarfs the diff itself at warehouse scale.
    # Optional for logs written before this field existed (compat path
    # in commit() falls back to one count).
    table_rows: Optional[int] = None


@dataclass
class _Log:
    keys: List[str]
    commits: List[_Commit] = field(default_factory=list)

    @property
    def latest(self) -> int:
        return self.commits[-1].version if self.commits else 0


def _log_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def _read_log(root: str) -> _Log:
    with open(_log_path(root)) as f:
        raw = json.load(f)
    return _Log(
        keys=raw["keys"],
        commits=[_Commit(**c) for c in raw["commits"]],
    )


def _write_log(root: str, log: _Log) -> None:
    # single-writer atomicity: POSIX rename; object stores / concurrent
    # writers need a real transaction log (Delta/Iceberg) — documented above
    tmp = _log_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"keys": log.keys, "commits": [vars(c) for c in log.commits]}, f, indent=1
        )
    os.replace(tmp, _log_path(root))


def _refresh(df: DataFrame, root: str) -> None:
    # Spark's shared file-status cache survives a rmtree+recreate of the
    # same path (stale part-file listings -> FILE_NOT_EXIST on read);
    # invalidate after every write so a rebuilt table re-lists cleanly
    df.sparkSession.catalog.refreshByPath(root)


def create_table(df: DataFrame, root: str, keys: Sequence[str]) -> int:
    """Version 1: a full snapshot + a fresh commit log."""
    os.makedirs(root, exist_ok=True)
    d = "v00001"
    df.write.mode("overwrite").parquet(os.path.join(root, d))
    _refresh(df, root)
    # count the WRITTEN files (zero-column parquet scan), not df — the
    # snapshot is already materialized, recomputing df's plan would run
    # its whole pipeline a second time
    n = df.sparkSession.read.parquet(os.path.join(root, d)).count()
    _write_log(root, _Log(keys=list(keys), commits=[
        _Commit(version=1, kind="full", dir=d, timestamp=time.time(),
                table_rows=n)
    ]))
    return 1


def read_version(
    spark: SparkSession, root: str, version: Optional[int] = None
) -> DataFrame:
    """Reconstruct a version: latest full snapshot ≤ version, then fold
    apply_diff over the diff commits after it."""
    from data_diff_spark.diff import apply_diff

    log = _read_log(root)
    if version is None:
        version = log.latest
    chain = [c for c in log.commits if c.version <= version]
    if not chain or chain[-1].version != version:
        known = [c.version for c in log.commits]
        raise ValueError(f"version {version} not in {root} (has {known})")
    fulls = [i for i, c in enumerate(chain) if c.kind == "full"]
    if not fulls:
        raise ValueError(
            f"version {version} in {root} was vacuumed (no reachable full "
            f"snapshot at or below it)"
        )
    base_i = max(fulls)
    df = spark.read.parquet(os.path.join(root, chain[base_i].dir))
    for c in chain[base_i + 1:]:
        diff = spark.read.parquet(os.path.join(root, c.dir))
        df = apply_diff(df, diff, log.keys)
    return df


def commit(
    df_new: DataFrame,
    root: str,
    checkpoint_ratio: float = 0.5,
    checkpoint_every: int = 10,
    skip_empty: bool = True,
    **diff_kwargs,
) -> int:
    """Commit the next version: diff the new table against the current
    head and store whichever is smaller — the diff rows, or (when the
    diff covers more than `checkpoint_ratio` of the table, or every
    `checkpoint_every` commits) a full snapshot that resets the
    reconstruction chain. A zero-diff commit is skipped (the current
    version number is returned) unless skip_empty=False — replayed
    streaming batches and no-op merges must not grow the log."""
    from data_diff_spark.diff import diff_tables
    from data_diff_spark.table import table_segment

    log = _read_log(root)
    spark = df_new.sparkSession
    head = read_version(spark, root)
    if [(f.name, f.dataType) for f in head.schema.fields] != [
        (f.name, f.dataType) for f in df_new.schema.fields
    ]:
        # schema evolution: a diff against the old shape is ill-defined
        # (added/dropped/retyped columns) — cut the chain with a full
        # snapshot, the same policy as a Delta overwriteSchema commit
        v = log.latest + 1
        d = f"v{v:05d}"
        df_new.write.mode("overwrite").parquet(os.path.join(root, d))
        _refresh(df_new, root)
        n = spark.read.parquet(os.path.join(root, d)).count()
        log.commits.append(_Commit(version=v, kind="full", dir=d,
                                   timestamp=time.time(), table_rows=n))
        _write_log(root, log)
        return v
    res = diff_tables(
        table_segment(head, log.keys), table_segment(df_new, log.keys), **diff_kwargs
    )
    diff_df = res.df.persist()
    try:
        # One aggregation gives everything the commit decision needs: the
        # diff size AND the new table's row count (prev + inserts -
        # deletes; an update is one '-' plus one '+', net zero). The old
        # code ran df_new.count() here — a second full pass over the
        # entire new table per commit, purely for the checkpoint
        # heuristic. At warehouse scale the diff is tiny and that scan
        # WAS the commit cost.
        from pyspark.sql import functions as F  # noqa: N812

        from data_diff_spark.operators import joindiff as _jd

        signs = dict(
            (r[_jd.SIGN_COL], r["n"])
            for r in diff_df.groupBy(F.col(_jd.SIGN_COL)).agg(
                F.count(F.lit(1)).alias("n")).collect()
        )
        n_diff = sum(signs.values())
        if n_diff == 0 and skip_empty:
            return log.latest
        prev_rows = log.commits[-1].table_rows
        if prev_rows is None:  # log predates table_rows: one-time fallback
            prev_rows = head.count()
        new_rows = prev_rows + signs.get("+", 0) - signs.get("-", 0)
        v = log.latest + 1
        d = f"v{v:05d}"
        since_full = 0  # diff commits since the last checkpoint
        for c in reversed(log.commits):
            if c.kind == "full":
                break
            since_full += 1
        # a changed key contributes TWO diff rows (-/+), so changed-row
        # fraction >= ratio  <=>  n_diff >= 2 * ratio * count
        full = (
            since_full + 1 >= checkpoint_every
            or n_diff >= 2 * checkpoint_ratio * max(new_rows, 1)
        )
        if full:
            df_new.write.mode("overwrite").parquet(os.path.join(root, d))
            _refresh(df_new, root)
            log.commits.append(
                _Commit(version=v, kind="full", dir=d, timestamp=time.time(),
                        table_rows=new_rows)
            )
        else:
            diff_df.write.mode("overwrite").parquet(os.path.join(root, d))
            _refresh(diff_df, root)
            log.commits.append(
                _Commit(version=v, kind="diff", dir=d, timestamp=time.time(),
                        rows=n_diff, table_rows=new_rows)
            )
        _write_log(root, log)
        return v
    finally:
        diff_df.unpersist()
        res.unpersist()


def checkpoint(spark: SparkSession, root: str) -> int:
    """Write the current head as a full snapshot (Delta checkpoint
    analogue): reconstruction chains after this start here."""
    log = _read_log(root)
    v = log.latest + 1
    d = f"v{v:05d}"
    read_version(spark, root).write.mode("overwrite").parquet(os.path.join(root, d))
    spark.catalog.refreshByPath(root)
    log.commits.append(_Commit(version=v, kind="full", dir=d, timestamp=time.time(),
                               table_rows=log.commits[-1].table_rows))
    _write_log(root, log)
    return v


def version_diff(
    spark: SparkSession, root: str, v1: int, v2: int, **diff_kwargs
) -> DataFrame:
    """Row-level diff between two stored versions — the reference's
    "what changed" story on a table format (its same-DB joindiff,
    /root/reference/data_diff/joindiff_tables.py:113-334, pointed at two
    commits of ONE table instead of two tables). Reconstructs both
    versions and runs the engine's differ."""
    from data_diff_spark.diff import diff_tables
    from data_diff_spark.table import table_segment

    log = _read_log(root)
    a = read_version(spark, root, v1)
    b = read_version(spark, root, v2)
    return diff_tables(
        table_segment(a, log.keys), table_segment(b, log.keys), **diff_kwargs
    ).df


def history(root: str) -> List[dict]:
    """The commit log (Delta DESCRIBE HISTORY analogue)."""
    return [vars(c) for c in _read_log(root).commits]


def vacuum(root: str, spark: Optional[SparkSession] = None) -> List[int]:
    """Delete the data of versions that no longer serve reconstruction:
    every commit strictly BEFORE the latest full snapshot (versions at or
    after it reconstruct from that snapshot alone). The Delta VACUUM
    trade, made explicit: storage is reclaimed, time travel to vacuumed
    versions now raises. Commits stay in the log (history/audit survive)
    with kind '<kind>-vacuumed'; returns the vacuumed version numbers.

    Single-writer, like commit(): data dirs are removed only AFTER the
    rewritten log lands (a crash between the two leaves dangling dirs,
    never a log pointing at deleted data)."""
    import shutil

    log = _read_log(root)
    last_full = max(
        (i for i, c in enumerate(log.commits) if c.kind == "full"), default=None
    )
    if last_full is None:
        raise ValueError(f"{root}: no full snapshot to vacuum against")
    victims = [c for c in log.commits[:last_full] if not c.kind.endswith("-vacuumed")]
    if not victims:
        return []
    for c in victims:
        c.kind = f"{c.kind}-vacuumed"
    _write_log(root, log)
    for c in victims:
        shutil.rmtree(os.path.join(root, c.dir), ignore_errors=True)
    if spark is not None:
        spark.catalog.refreshByPath(root)
    return [c.version for c in victims]
