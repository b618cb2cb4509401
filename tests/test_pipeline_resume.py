"""Checkpoint/resume semantics of the ingest pipeline: partial runs
resume where they stopped, dictionaries stay consistent across epochs,
and re-runs are idempotent."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.plans.pipeline import IngestPipeline
from clp_core_spark.sources.transcripts import generate_transcripts


@pytest.fixture()
def work_root(tmp_path):
    return str(tmp_path / "work")


@pytest.fixture(scope="module")
def input_df(spark):
    return generate_transcripts(spark, num_turns=3000, seed=42).persist()


def test_partial_then_resume(spark, input_df, work_root):
    pipe = IngestPipeline(spark, work_root, num_partitions=4)
    pipe.run(input_df, partitions=[0, 1])
    assert pipe.done_partitions() == {0, 1}

    ledger = pipe.run(input_df)  # resume: only 2 and 3 run
    assert {r["partition_id"] for r in ledger.collect()} == {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in ledger.collect()) == input_df.count()


def test_rerun_is_noop_and_idempotent(spark, input_df, work_root):
    pipe = IngestPipeline(spark, work_root, num_partitions=4)
    pipe.run(input_df)
    before = sorted(
        map(tuple, spark.read.parquet(f"{work_root}/sinks/by_role")
            .groupBy("role").count().collect())
    )
    ledger_rows = pipe.ledger().count()
    pipe.run(input_df)  # everything done -> no new ledger rows
    assert pipe.ledger().count() == ledger_rows
    after = sorted(
        map(tuple, spark.read.parquet(f"{work_root}/sinks/by_role")
            .groupBy("role").count().collect())
    )
    assert before == after


def test_dict_ids_consistent_across_epochs(spark, input_df, work_root):
    """An ID assigned in epoch 0 must survive later epochs unchanged, and
    all IDs stay dense and unique (mirrors CLP's monotone dict counters)."""
    pipe = IngestPipeline(spark, work_root, num_partitions=4)
    pipe.run(input_df, partitions=[0])
    first = {
        r["logtype"]: r["logtype_id"]
        for r in spark.read.parquet(f"{work_root}/dicts/logtype").collect()
    }
    pipe.run(input_df)
    final = {
        r["logtype"]: r["logtype_id"]
        for r in spark.read.parquet(f"{work_root}/dicts/logtype").collect()
    }
    for k, v in first.items():
        assert final[k] == v
    ids = sorted(final.values())
    assert ids == list(range(len(ids)))

    # var dict (hash mode): IDs are unique and deterministic per string
    rows = spark.read.parquet(f"{work_root}/dicts/var").collect()
    var_ids = [r["var_id"] for r in rows]
    assert len(set(var_ids)) == len(var_ids)
    import pyspark.sql.functions as F2

    check = (
        spark.read.parquet(f"{work_root}/dicts/var")
        .where(F2.xxhash64("var_str") != F2.col("var_id"))
        .count()
    )
    assert check == 0


def test_routed_rows_match_input(spark, input_df, work_root):
    pipe = IngestPipeline(spark, work_root, num_partitions=2)
    pipe.run(input_df)
    routed = spark.read.parquet(f"{work_root}/sinks/by_role")
    assert routed.count() == input_df.count()
    # stable (conv_id, turn_idx) pairs survive routing exactly once
    assert (
        routed.select("conv_id", "turn_idx").exceptAll(
            input_df.select("conv_id", "turn_idx")
        ).count()
        == 0
    )
    m = pipe.metrics()
    assert m["rows"] == input_df.count() and m["partitions_done"] == 2
