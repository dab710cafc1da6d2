"""Streaming drift monitor: score each micro-batch against a baseline.

Composes operators/drift.py with foreachBatch: a reference profile
(bins fixed ONCE from the baseline table, so scores are comparable
across batches) is computed up front; every arriving micro-batch gets
its bin counts from one map-side aggregation and its PSI / hash-TVD /
null-rate report appended to a sink table. This is the standard
model-input monitoring loop — alert when a feed's distribution walks
away from what the model was trained on.

Differences from the batch drift_report: bins come from the BASELINE
only (a drifted batch must not move the ruler), and empty batches are
skipped. State: none beyond the driver-held baseline counts — each
batch is scored independently.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_diff_spark.operators.drift import (
    N_HASH_BUCKETS,
    _EPS,
    _bin_counts,
    _numeric_cols,
)


class DriftMonitor:
    """Fixed-baseline scorer; `score(df)` returns report rows for any
    batch frame, `sink(stream, ...)` attaches it to a streaming query."""

    def __init__(
        self,
        baseline: DataFrame,
        columns: Optional[Sequence[str]] = None,
        n_bins: int = 20,
        psi_threshold: float = 0.2,
        tvd_threshold: float = 0.1,
    ):
        cols = [c for c in (columns or baseline.columns)]
        nums = set(_numeric_cols(baseline, cols))
        self.cats = [c for c in cols if c not in nums]
        self.columns = cols
        self.psi_threshold = psi_threshold
        self.tvd_threshold = tvd_threshold
        # bins pinned to the baseline's min/max — the ruler never moves
        if nums:
            r = baseline.agg(*[
                a for c in nums for a in (
                    F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"hi_{c}"),
                )
            ]).collect()[0]
            self.cols_bins = {}
            for c in nums:
                lo, hi = r[f"lo_{c}"], r[f"hi_{c}"]
                if lo is None:
                    continue
                self.cols_bins[c] = (lo, ((hi - lo) / n_bins) or 1.0, n_bins)
        else:
            self.cols_bins = {}
        self._base = _bin_counts(baseline, self.cols_bins, self.cats)
        self._base_total = max(self._base["__total"], 1)

    def score(self, batch: DataFrame, batch_id: int = -1) -> List[tuple]:
        r = _bin_counts(batch, self.cols_bins, self.cats)
        t = r["__total"]
        if t == 0:
            return []
        rows = []
        b, bt = self._base, self._base_total
        for c in self.columns:
            nr_base, nr = b[f"n_{c}"] / bt, r[f"n_{c}"] / t
            if c in self.cols_bins:
                nb = self.cols_bins[c][2]
                psi = 0.0
                for i in range(nb):
                    p = b[f"b_{c}_{i}"] / bt + _EPS
                    q = r[f"b_{c}_{i}"] / t + _EPS
                    psi += (p - q) * math.log(p / q)
                rows.append((batch_id, c, "psi", psi, nr_base, nr,
                             psi > self.psi_threshold))
            elif c in self.cats:
                tvd = 0.5 * sum(
                    abs(b[f"b_{c}_{i}"] / bt - r[f"b_{c}_{i}"] / t)
                    for i in range(N_HASH_BUCKETS)
                )
                rows.append((batch_id, c, "tvd_hash64", tvd, nr_base, nr,
                             tvd > self.tvd_threshold))
        return rows

    REPORT_SCHEMA = (
        "batch_id long, column string, metric string, value double, "
        "null_rate_baseline double, null_rate_batch double, drifted boolean"
    )

    def sink(self, stream: DataFrame, checkpoint_dir: str, table: str,
             trigger_once: bool = False):
        """Streaming query appending one report row per column per
        micro-batch to a sink table: a filesystem path (contains a path
        separator — parquet append, no catalog/metastore involved) or a
        catalog table name (saveAsTable). The report is a few rows per
        batch; a metastore round-trip per micro-batch is pure overhead
        for the path case, so it is only paid when a catalog name is
        asked for."""
        as_path = os.sep in table
        def _score(batch_df: DataFrame, batch_id: int) -> None:
            rows = self.score(batch_df, batch_id)
            if rows:
                spark = batch_df.sparkSession
                report = spark.createDataFrame(rows, self.REPORT_SCHEMA)
                if as_path:
                    # no coalesce(1): a 1-task write over a many-partition
                    # local relation stalls ~5s in local mode (measured —
                    # the single task walks every empty parent partition);
                    # Spark only writes non-empty partitions anyway
                    report.write.mode("append").parquet(table)
                else:
                    report.write.mode("append").saveAsTable(table)

        w = (
            stream.writeStream.foreachBatch(_score)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()


def monitor_orders_bounded(spark, sf_dir: str, columns, baseline=None):
    """Driver-gate harness (VERDICT r6 ask #3): score the orders table
    against the deterministically-modified baseline BOTH ways — as one
    batch frame and as a bounded stream through the real `sink()` path —
    and return the two report DataFrames for a `_must_equal` arm.

    The stream source is the single-file orders parquet with AvailableNow
    and no maxFilesPerTrigger, so the bounded run is exactly ONE
    micro-batch — the regime where the per-batch scorer must equal the
    batch score bit-for-bit (the monitor scores each batch independently
    by design; multi-batch state crossing is pinned in
    tests/test_drift_stream.py). batch_id is kept in both reports so a
    surprise batch split breaks the equality loudly instead of averaging
    away.

    `baseline` (optional, already persisted by the caller) lets the gate
    entry share ONE materialization of the modified-orders table between
    this monitor and its sign-count arm — DriftMonitor reads the baseline
    twice (min/max then bin counts), and recomputing the union per pass
    was most of the r7 entry's fixed cost. The sink target is a scratch
    PATH (parquet append), keeping the per-run metastore round-trips of
    the old saveAsTable sink out of the measured arm."""
    import shutil
    import tempfile

    from data_diff_spark.streaming.events_stream import _as_stream_dir
    from data_diff_spark.workload import MODIFIED_ORDERS_SQL, load_views

    load_views(spark, sf_dir)
    cols = list(columns)
    if baseline is None:
        baseline = spark.sql(MODIFIED_ORDERS_SQL)
    baseline = baseline.select(*cols)
    mon = DriftMonitor(baseline, columns=cols)

    def _batch_side():
        rows = mon.score(spark.table("orders").select(*cols), batch_id=0)
        return spark.createDataFrame(rows, mon.REPORT_SCHEMA)

    def _stream_side():
        schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .parquet(_as_stream_dir(sf_dir, "orders"))
            .select(*cols)
        )
        scratch = tempfile.mkdtemp(prefix="drift_gate_")
        ckpt = os.path.join(scratch, "ckpt")
        sink_dir = os.path.join(scratch, "report")
        try:
            q = mon.sink(stream, ckpt, sink_dir, trigger_once=True)
            q.awaitTermination()
            q.stop()
            if not os.path.isdir(sink_dir):
                # the sink writes only non-empty batches; no report dir
                # means the bounded source produced NO data — a harness
                # bug (e.g. the r7 directory-symlink stream defect),
                # never a valid score
                raise RuntimeError(
                    "drift gate: streaming sink wrote no batches — the "
                    "bounded orders stream was empty")
            # the report is |columns| rows — bounded driver collect by
            # design
            return spark.createDataFrame(
                spark.read.schema(mon.REPORT_SCHEMA)
                .parquet(sink_dir).collect(),
                mon.REPORT_SCHEMA)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    # once the monitor's baseline profile exists, the one-batch score and
    # the bounded stream harness are independent read-only consumers of
    # it (the harness is driver-bound micro-batch machinery; the batch
    # score is one aggregation job) — run them concurrently (guide §2.6)
    # instead of back-to-back. Both score() calls read mon._base only in
    # driver-side Python after their own aggregations return.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        fb = ex.submit(_batch_side)
        fs = ex.submit(_stream_side)
        batch_df, stream_df = fb.result(), fs.result()
    return batch_df, stream_df
