"""Skew evidence: salted repartition must spread a pathologically hot
key (one conversation owning half the corpus; one sink owning most rows)
across many tasks instead of serializing it — the north rule's explicit
skew-handling requirement (reference analog: oversized filename groups
split across archives, scheduler/compress/partition.py:99-138)."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.operators import route


@pytest.fixture(scope="module")
def skewed(spark):
    """50% of rows in ONE conversation, 90% of rows in ONE role."""
    n = 40_000
    half = spark.range(n // 2).select(
        F.lit("hot_conv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
    )
    rest = spark.range(n // 2).select(
        F.concat(F.lit("c"), (F.col("id") % 500).cast("string")).alias("conv_id"),
        (F.col("id") / 500).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 5 == 0, "assistant").otherwise("user").alias("role"),
    )
    return half.unionByName(rest).persist()


def _partition_sizes(df):
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").count().collect()
    )
    return [r["count"] for r in rows]


def test_salted_repartition_spreads_hot_keys(skewed):
    parts = 16
    sizes = _partition_sizes(
        route.salted(skewed, parts, "role", salt_buckets=16)
    )
    total = sum(sizes)
    assert total == skewed.count()
    # without salt, (role='user') would pin ~90% of rows to one task;
    # with salt, no task may hold more than ~3x the fair share
    assert max(sizes) <= 3 * total / parts, sizes


def test_unsalted_repartition_is_the_bad_baseline(skewed):
    """Demonstrate the hazard the salt removes: repartitioning by the
    skewed key alone concentrates most rows in very few tasks."""
    sizes = _partition_sizes(skewed.repartition(16, F.col("role")))
    total = sum(sizes)
    assert max(sizes) >= 0.8 * total  # one task owns ~90% of the data
