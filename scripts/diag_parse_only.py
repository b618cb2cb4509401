"""Isolate parse-UDF scaling: tokenize the staged corpus, no dicts/writes.

Usage: SPARK_GRAFT_CPUS=8|32 python scripts/diag_parse_only.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from clp_core_spark.operators import encode_pipeline  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402
from clp_core_spark.sources import transcripts  # noqa: E402


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clp_bench/transcripts_sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "diag-parse",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "131072",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup python workers
    w = transcripts.generate_transcripts(spark, num_turns=2_000, partitions=64)
    encode_pipeline.parse(w, slim=True).select(F.sum(F.size("var_types"))).collect()

    df = spark.read.parquet(path)
    nparts = df.rdd.getNumPartitions()
    t0 = time.time()
    n = encode_pipeline.parse(df, slim=True).select(F.sum(F.size("var_types"))).collect()[0][0]
    dt = time.time() - t0
    print(f"PARSE cpus={cpus} input_parts={nparts} vars={n} {dt:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
