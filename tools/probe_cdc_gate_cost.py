"""Measure what gating the streaming CDC sink would COST per bench
invocation (r11 VERDICT Next #4: gate it "if <=~1s", else decline with a
measured-cost note — the r10 SQLite discipline).

The candidate gate shape: a trigger_once (availableNow) run of
scd2_stream_sink over a 1% slice of orders as the change stream, folded
into a freshly-created versioned SCD2 dimension, then _must_equal vs the
sequential merge_scd2 path. This probe times ONLY the streaming leg
(dimension create + stream start + awaitTermination), repeated, warm —
the cost a gate would add to every bench invocation. The sequential
comparison side is already paid by q_scd2_orders.

Usage: python tools/probe_cdc_gate_cost.py [sf_dir] [repeats]
Writes tools/PROBE_cdc_gate_cost.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from data_diff_spark.sources import versioned as V
from data_diff_spark.streaming.cdc_stream import scd2_stream_sink


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("probe-cdc-gate-cost")
        .getOrCreate()
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    changes = (
        orders.filter(F.col("o_orderkey") % 100 == 0)  # the 1% slice
        .select(
            "o_orderkey", "o_orderstatus",
            (F.col("o_totalprice") + 1).alias("o_totalprice"),
            F.to_timestamp(F.lit("1998-12-01")).alias("effective_ts"),
        )
    )
    n_changes = changes.count()  # warm the scan outside the timed region

    samples = []
    for i in range(repeats):
        scratch = tempfile.mkdtemp(prefix="dds_cdc_probe_")
        try:
            src = os.path.join(scratch, "src")
            changes.coalesce(1).write.parquet(src)
            root = os.path.join(scratch, "dim")
            dim = orders.select(
                "o_orderkey", "o_orderstatus", "o_totalprice",
                F.to_timestamp(F.to_date("o_orderdate")).alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
            t0 = time.time()
            V.create_table(dim, root, keys=["o_orderkey", "valid_from"])
            stream = (
                spark.readStream.schema(changes.schema).parquet(src)
            )
            q = scd2_stream_sink(
                stream, root, keys=["o_orderkey"],
                checkpoint_dir=os.path.join(scratch, "ckpt"),
                trigger_once=True,
            )
            q.awaitTermination()
            n_out = V.read_version(spark, root).count()
            samples.append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    samples_sorted = sorted(samples)
    out = {
        "metric": "cdc_gate_cost",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_changes": n_changes,
        "dim_rows_after": n_out,
        "repeats": repeats,
        "samples": samples,
        "median": samples_sorted[len(samples) // 2],
        "min": samples_sorted[0],
        "note": (
            "cost a CDC-sink gate scope would ADD to every bench "
            "invocation: versioned create + availableNow stream + SCD2 "
            "merge commit; decided against the <=1s bar in "
            "q_scd2_orders's docstring"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROBE_cdc_gate_cost.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
