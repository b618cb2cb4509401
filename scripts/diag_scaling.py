"""Phase timing of the exact bench.run_pipeline chain (hash var-ID mode).

Usage: SPARK_GRAFT_CPUS=8|32 python scripts/diag_scaling.py [input_path]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from clp_core_spark.operators import encode_pipeline, enrich, route  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402
from clp_core_spark.sources import transcripts  # noqa: E402


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clp_bench/transcripts_sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "diag",
        shuffle_partitions=max(int(cpus), 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "131072",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def ph(name, t0):
        print(f"PHASE {name} {time.time() - t0:.1f}s", flush=True)

    t_all = time.time()
    df = spark.read.parquet(path)

    t0 = time.time()
    encoded, lt_dict, var_dict = encode_pipeline.encode(df, key_cols=["conv_id", "turn_idx"])
    ph("encode_plan(dict builds inside)", t0)

    t0 = time.time()
    enriched = enrich.enrich(encoded, transcripts.role_dim(spark), transcripts.tool_dim(spark))
    enriched = route.with_logtype_class(enriched.join(F.broadcast(lt_dict), "logtype_id")).drop("logtype")
    enriched = enriched.persist()
    n = enriched.count()
    ph(f"materialize_enriched(n={n})", t0)

    sinks_root = "/tmp/clp_bench/sinks_diag"
    shutil.rmtree(sinks_root, ignore_errors=True)
    for kind in route.SINK_KINDS:
        t0 = time.time()
        out = enriched.withColumn(kind, F.coalesce(F.col(kind), F.lit("__null__")))
        (
            route.salted(out, int(cpus), kind)
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy(kind)
            .parquet(f"{sinks_root}/by_{kind}")
        )
        ph(f"route_{kind}", t0)

    t0 = time.time()
    route.sink_counts(enriched).collect()
    ph("counts", t0)
    ph("TOTAL", t_all)
    spark.stop()


if __name__ == "__main__":
    main()
