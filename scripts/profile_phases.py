"""Phase-level profiling of the e2e pipeline at the staged bench corpus.

Usage: SPARK_GRAFT_CPUS=8 python scripts/profile_phases.py [input_path]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from clp_core_spark.operators import dictionaries, encode_pipeline, enrich, route  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402
from clp_core_spark.sources import transcripts  # noqa: E402


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clp_bench/transcripts_sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile", shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    def ph(name, t0):
        print(f"\nPHASE {name} {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    df = spark.read.parquet(path)
    parsed = encode_pipeline.parse(df).persist()
    parsed.count()
    ph("parse", t0)

    t0 = time.time()
    lt = dictionaries.build_logtype_dict(parsed).persist()
    lt.count()
    ph("lt_dict", t0)

    t0 = time.time()
    vd = dictionaries.build_var_dict(parsed).persist()
    n_vd = vd.count()
    ph(f"var_dict(n={n_vd})", t0)

    t0 = time.time()
    with_ids = encode_pipeline.resolve_dict_ids(parsed, vd, ["conv_id", "turn_idx"],
                                                var_dict_count=n_vd)
    encoded = with_ids.join(F.broadcast(lt), "logtype")
    encoded = encoded.withColumn("n_vars", F.size("encoded_vars")).drop(
        "logtype", "var_strs", "dict_strs", "dict_ids", "text"
    ).persist()
    encoded.count()
    ph("resolve+join", t0)

    t0 = time.time()
    enriched = enrich.enrich(encoded, transcripts.role_dim(spark), transcripts.tool_dim(spark))
    enriched = route.with_logtype_class(enriched.join(F.broadcast(lt), "logtype_id")).drop("logtype")
    enriched = enriched.persist()
    enriched.count()
    ph("enrich", t0)

    t0 = time.time()
    shutil.rmtree("/tmp/clp_bench/sinks_prof", ignore_errors=True)
    route.route(enriched, "/tmp/clp_bench/sinks_prof", partitions=int(cpus))
    ph("route", t0)

    t0 = time.time()
    route.sink_counts(enriched).collect()
    ph("counts", t0)
    spark.stop()


if __name__ == "__main__":
    main()
