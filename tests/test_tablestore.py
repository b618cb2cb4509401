"""TableStore contract: idempotent partition overwrite + partition-pruned
reads, same interface whether the backend is parquet (CI path) or Iceberg
(exercised only when the runtime jar is present — SURVEY §1.5)."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.plans.tablestore import TableStore, iceberg_available


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "tables"), mode="parquet")


def _df(spark, epoch, tag):
    return spark.range(10).select(
        F.lit(epoch).alias("epoch_part"),
        F.col("id"),
        F.lit(tag).alias("tag"),
    )


def test_overwrite_is_per_partition_idempotent(spark, store):
    store.overwrite_partitions(_df(spark, 0, "a"), "t", ["epoch_part"])
    store.overwrite_partitions(_df(spark, 1, "b"), "t", ["epoch_part"])
    # rewriting epoch 0 must not touch epoch 1
    store.overwrite_partitions(_df(spark, 0, "a2"), "t", ["epoch_part"])
    rows = store.read("t").collect()
    tags = {(r["epoch_part"], r["tag"]) for r in rows}
    assert tags == {(0, "a2"), (1, "b")}
    assert len(rows) == 20


def test_partition_filter_prunes_scan(spark, store):
    for e in range(4):
        store.overwrite_partitions(_df(spark, e, f"t{e}"), "p", ["epoch_part"])
    pruned = store.read("p", partition_filter={"epoch_part": [1, 3]})
    assert {r["epoch_part"] for r in pruned.collect()} == {1, 3}
    # parquet mode: unselected partition dirs are never listed
    files = pruned.inputFiles()
    assert files and all(
        "epoch_part=1" in f or "epoch_part=3" in f for f in files
    )


def test_empty_partition_filter_returns_empty_df(spark, store):
    """A filter value list that selects ZERO partitions (e.g. a time
    range overlapping no ledger epoch) must yield an empty DataFrame
    with the table schema, not a zero-path read error."""
    store.overwrite_partitions(_df(spark, 0, "a"), "e", ["epoch_part"])
    out = store.read("e", partition_filter={"epoch_part": []})
    assert out.count() == 0
    assert set(out.columns) == {"epoch_part", "id", "tag"}


def test_auto_mode_resolves(spark, tmp_path):
    ts = TableStore(spark, str(tmp_path / "auto"), mode="auto")
    assert ts.format in ("parquet", "iceberg")
    if not iceberg_available(spark):
        assert ts.format == "parquet"


def test_forcing_iceberg_without_runtime_raises(spark, tmp_path):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present")
    with pytest.raises(RuntimeError):
        TableStore(spark, str(tmp_path / "x"), mode="iceberg")


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="Iceberg runtime jar not in the sandbox image",
)
def test_iceberg_mode_same_contract(spark, tmp_path):
    ts = TableStore(spark, str(tmp_path / "ice"), mode="iceberg")
    ts.overwrite_partitions(_df(spark, 0, "a"), "t", ["epoch_part"])
    ts.overwrite_partitions(_df(spark, 0, "a2"), "t", ["epoch_part"])
    assert {r["tag"] for r in ts.read("t").collect()} == {"a2"}
