"""CLP's aggregation vocabulary: count and count-by-time.

The reference's reducer merges per-worker partials
(reducer/Operator.hpp:20-36 intra/inter-stage, reducer/CountOperator.cpp:4-41);
Spark's partial+final hash aggregation is the same two-phase plan, for free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def count_all(df: DataFrame) -> DataFrame:
    """CountOperator (reducer/CountOperator.cpp:4-41) over one group."""
    return df.agg(F.count("*").alias("count"))


def count_by_group(df: DataFrame, *group_cols: str) -> DataFrame:
    """GroupTags (reducer/GroupTags.hpp:9) -> groupBy(cols).count()."""
    return df.groupBy(*group_cols).agg(F.count("*").alias("count"))


def count_by_time(df: DataFrame, bucket_ms: int, ts_col: str = "ts") -> DataFrame:
    """Bucket = (epoch_ms / size) * size with integer truncation
    (clp/clo/OutputHandler.hpp:269-271)."""
    # NTZ timestamps are interpreted in the session TZ (UTC in get_spark).
    epoch = F.unix_millis(F.col(ts_col).cast("timestamp"))
    bucket = (epoch - F.pmod(epoch, F.lit(bucket_ms))).alias("bucket_ts")
    return df.groupBy(bucket).agg(F.count("*").alias("count")).orderBy("bucket_ts")


def top_k_latest(df: DataFrame, k: int, ts_col: str = "ts") -> DataFrame:
    """Top-k latest results — CLP keeps a min-heap of k by timestamp and
    skips whole files older than the heap min
    (clp/clo/OutputHandler.hpp:146-153,190-220). Spark compiles
    orderBy+limit to TakeOrderedAndProject: the same bounded heap per
    partition + merge, with no global sort."""
    return df.orderBy(F.col(ts_col).desc()).limit(k)
