"""SparkSession factory with scale-oriented defaults.

Single place for configs so tests, bench, and spark-submit entry points
share the same tuning:

* AQE on (runtime re-plan, skew-join splitting) — stands in for CLP's
  scheduler-level partition balancing
  (job_orchestration/scheduler/compress/partition.py:99-138).
* Arrow on — every CLP-specific kernel is an Arrow-batched pandas UDF.
* Parquet zstd — mirrors CLP's zstd segment compression
  (components/core/src/clp/streaming_compression/zstd/).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "clp-core-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # master="" => inherit spark.master from the launcher (spark-submit);
    # the cluster job entry (clp_core_spark.job) uses this so the same code
    # runs under local test sessions and multi-executor spark-submit.
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # 10MB (Spark's default) is conservative for executors sized in
        # GBs: it pushed the duplicate-span dup-hash set (~1.1M longs,
        # ~27MB hashed) into a sort-merge join that shuffled+sorted the
        # 56M-row probe side — 340s vs 194s once the set broadcasts
        # (BENCH round-5 curation notes). 64MB keeps slim hash-set/
        # dictionary relations broadcastable while AQE's runtime stats
        # still protect against genuinely large sides.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # FAIR lets concurrently-submitted jobs (epoch-scoped ingest /
        # per-archive search with max_concurrent > 1) share executors
        # instead of head-of-line blocking behind one epoch's stages;
        # SPARK_GRAFT_SCHEDULER=FIFO restores the default
        .config(
            "spark.scheduler.mode",
            os.environ.get("SPARK_GRAFT_SCHEDULER", "FAIR"),
        )
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
