"""data-diff-spark — a PySpark-native table diff & data-processing engine.

Re-expresses the capabilities of datafold/data-diff (reference at
/root/reference) Spark-first: the diff operators are declarative DataFrame
plans optimized by Catalyst/AQE rather than generated SQL strings fanned out
over thread pools.

Public surface:
    table_segment(df, keys, ...)      -> TableSegment
    diff_tables(t1, t2, algorithm=..) -> DiffResult (diff DataFrame + stats)
    connect_to_table(spark, uri, ...) -> TableSegment
"""

from data_diff_spark.diff import Algorithm, DiffResult, diff_tables
from data_diff_spark.sources.connect import connect_to_table
from data_diff_spark.table import TableSegment, table_segment

__version__ = "0.1.0"

__all__ = [
    "Algorithm",
    "DiffResult",
    "TableSegment",
    "connect_to_table",
    "diff_tables",
    "table_segment",
    "__version__",
]
