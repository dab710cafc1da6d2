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
        micro-batch to a named in-catalog table."""
        def _score(batch_df: DataFrame, batch_id: int) -> None:
            rows = self.score(batch_df, batch_id)
            if rows:
                spark = batch_df.sparkSession
                spark.createDataFrame(rows, self.REPORT_SCHEMA) \
                    .write.mode("append").saveAsTable(table)

        w = (
            stream.writeStream.foreachBatch(_score)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if trigger_once:
            w = w.trigger(availableNow=True)
        return w.start()
