"""North-rule equality gates on the routed sinks: per-sink aggregate
counts vs an independent reference computation, and per-turn text
equality of routed rows after decode under stable (conv_id, turn_idx)
ordering (the e2e model of tests/test-clp_s-end_to_end.cpp:98-140)."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.operators import encode_pipeline
from clp_core_spark.plans.pipeline import IngestPipeline


@pytest.fixture()
def work_root(tmp_path):
    return str(tmp_path / "work")


def test_per_sink_counts_match_reference(spark, transcripts, work_root):
    pipe = IngestPipeline(spark, work_root, num_partitions=2)
    pipe.run(transcripts)
    for kind in ("role", "tool", "logtype_class"):
        routed = spark.read.parquet(f"{work_root}/sinks/by_{kind}")
        got = {
            r[kind]: r["n"]
            for r in routed.groupBy(kind).agg(F.count("*").alias("n")).collect()
        }
        if kind == "logtype_class":
            # reference = counts over an independent re-encode of the input
            enc, lt, vd = encode_pipeline.encode(transcripts, ["conv_id", "turn_idx"])
            from clp_core_spark.operators import route

            ref_df = route.with_logtype_class(enc.join(F.broadcast(lt), "logtype_id"))
            ref = {
                r["logtype_class"]: r["n"]
                for r in ref_df.groupBy("logtype_class")
                .agg(F.count("*").alias("n"))
                .collect()
            }
        else:
            ref = {
                (r[kind] if r[kind] is not None else "__null__"): r["n"]
                for r in transcripts.groupBy(kind)
                .agg(F.count("*").alias("n"))
                .collect()
            }
        assert got == ref, (kind, got, ref)


def test_routed_rows_decode_to_original_text(spark, transcripts, work_root):
    pipe = IngestPipeline(spark, work_root, num_partitions=2)
    pipe.run(transcripts)
    routed = spark.read.parquet(f"{work_root}/sinks/by_role")
    lt = spark.read.parquet(f"{work_root}/dicts/logtype")
    vd = spark.read.parquet(f"{work_root}/dicts/var")
    dec = encode_pipeline.decode(routed, lt, vd, ["conv_id", "turn_idx"])
    joined = dec.select("conv_id", "turn_idx", "decoded_text").join(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"],
    )
    assert joined.count() == transcripts.count()
    bad = joined.where(~F.col("decoded_text").eqNullSafe(F.col("text"))).count()
    assert bad == 0
    # stable ordering: within every written file rows are sorted by
    # (conv_id, turn_idx)
    w = routed.withColumn("_f", F.input_file_name()).select(
        "_f", "conv_id", "turn_idx"
    )
    from pyspark.sql import Window

    win = Window.partitionBy("_f").orderBy("conv_id", "turn_idx")
    ooo = (
        w.withColumn("_rn", F.row_number().over(win))
        .withColumn(
            "_ok",
            F.row_number().over(
                Window.partitionBy("_f").orderBy(F.monotonically_increasing_id())
            )
            == F.col("_rn"),
        )
    )
    # eqNullSafe guard: ordering comparison needs deterministic read order
    # per file, which parquet provides (row-group sequential scan).
    assert ooo.where(~F.col("_ok")).count() == 0
