"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: joindiff of orders vs a deterministically modified
    copy at sf0.001 — one FULL OUTER JOIN, sign-classified rows."""
    from data_diff_spark.workload import q_joindiff_orders

    return q_joindiff_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_diff_spark.workload import WORKLOAD

    return {name: fn for name, (fn, _oracle) in WORKLOAD.items()}


def oracle_sql() -> dict[str, str]:
    from data_diff_spark.workload import WORKLOAD

    return {name: oracle for name, (_fn, oracle) in WORKLOAD.items() if oracle is not None}
