"""Crash-safety of the persisted-dictionary swap: at every interruption
point of the rename-aside protocol, load_dict still returns a complete
dictionary consistent with the last committed ledger row."""

import os
import shutil

import pytest

from clp_core_spark.plans import dictstore


@pytest.fixture()
def dicts_path(tmp_path):
    return str(tmp_path / "dicts")


def _write(spark, path, values):
    spark.createDataFrame(
        [(v, i) for i, v in enumerate(values)], "var_str string, var_id long"
    ).write.mode("overwrite").parquet(path)


def _values(df):
    return {r["var_str"] for r in df.collect()}


def test_save_then_load_roundtrip(spark, dicts_path):
    df = spark.createDataFrame([("a", 0), ("b", 1)], "var_str string, var_id long")
    dictstore.save_dict(dicts_path, "var", df)
    assert _values(dictstore.load_dict(spark, dicts_path, "var")) == {"a", "b"}
    # second save replaces atomically
    df2 = spark.createDataFrame([("a", 0), ("c", 2)], "var_str string, var_id long")
    dictstore.save_dict(dicts_path, "var", df2)
    assert _values(dictstore.load_dict(spark, dicts_path, "var")) == {"a", "c"}
    assert not os.path.exists(f"{dicts_path}/var_old")
    assert not os.path.exists(f"{dicts_path}/var_next")


def test_crash_between_rename_aside_and_promote(spark, dicts_path):
    """Simulate a crash after the current dict moved to _old but before
    _next was promoted: the previous version must still load (round-1
    code lost the dictionary here — silent dense-ID reassignment on
    resume)."""
    _write(spark, f"{dicts_path}/var_old", ["epoch0_a", "epoch0_b"])
    _write(spark, f"{dicts_path}/var_next", ["epoch0_a", "epoch0_b", "epoch1_c"])
    # no {dicts_path}/var — exactly the mid-swap state
    got = dictstore.load_dict(spark, dicts_path, "var")
    assert got is not None
    assert _values(got) == {"epoch0_a", "epoch0_b"}


def test_crash_before_rename_aside(spark, dicts_path):
    """_next fully written but the swap never started: current wins."""
    _write(spark, f"{dicts_path}/var", ["cur"])
    _write(spark, f"{dicts_path}/var_next", ["cur", "new"])
    assert _values(dictstore.load_dict(spark, dicts_path, "var")) == {"cur"}


def test_recovery_resumes_cleanly_after_mid_swap_crash(spark, dicts_path):
    """A save over the mid-swap debris must leave a clean final state."""
    _write(spark, f"{dicts_path}/var_old", ["a"])
    _write(spark, f"{dicts_path}/var_next", ["a", "b"])
    rebuilt = spark.createDataFrame(
        [("a", 0), ("b", 1)], "var_str string, var_id long"
    )
    dictstore.save_dict(dicts_path, "var", rebuilt)
    assert _values(dictstore.load_dict(spark, dicts_path, "var")) == {"a", "b"}
    assert not os.path.exists(f"{dicts_path}/var_old")


def test_missing_dict_returns_none(spark, dicts_path):
    shutil.rmtree(dicts_path, ignore_errors=True)
    assert dictstore.load_dict(spark, dicts_path, "var") is None
