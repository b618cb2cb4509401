"""pack_sequences invariants: capacity, exactly-once assignment,
partition-independence, fill quality, overlong isolation, and a
brute-force within-group FFD oracle."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from clp_core_spark.operators import packing


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    lens = rng.integers(5, 900, size=800).tolist()
    rows = [(i, int(l)) for i, l in enumerate(lens)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]).persist()


def test_capacity_and_exactly_once(docs):
    out = packing.pack_sequences(
        docs, "doc_id", "n_tokens", seq_len=1024, num_groups=8
    ).persist()
    assert out.count() == 800
    assert out.filter(F.col("overlong")).isEmpty()  # all lens < 1024
    assert out.filter(F.col("seq_id").isNull()).isEmpty()
    over = (
        out.groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > 1024)
    )
    assert over.isEmpty()
    # a sequence never spans pack groups (seq_id encodes its group)
    assert out.filter(
        (F.col("seq_id").bitwiseAND(F.lit((1 << 32) - 1)) < 0)
        | ((F.shiftright("seq_id", 32)) != F.col("pack_group"))
    ).isEmpty()


def test_partition_independent(docs):
    a = packing.pack_sequences(
        docs.repartition(3), "doc_id", "n_tokens", seq_len=512, num_groups=4
    )
    b = packing.pack_sequences(
        docs.repartition(17, "n_tokens"),
        "doc_id",
        "n_tokens",
        seq_len=512,
        num_groups=4,
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_fill_quality(spark, docs):
    out = packing.pack_sequences(
        docs, "doc_id", "n_tokens", seq_len=1024, num_groups=4
    )
    stats = packing.packing_stats(out, 1024).collect()[0]
    assert stats["n_overlong"] == 0
    assert stats["packed_tokens"] == sum(r["n_tokens"] for r in docs.collect())
    # FFD on uniform(5,900) lengths packs well clear of 80%
    assert stats["mean_fill_ratio"] > 0.8, stats


def test_overlong_isolated(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 2000), (3, 60)], ["doc_id", "n_tokens"]
    )
    out = packing.pack_sequences(df, "doc_id", "n_tokens", seq_len=100)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["overlong"] and rows[2]["seq_id"] is None
    assert not rows[1]["overlong"] and rows[1]["seq_id"] is not None
    assert rows[3]["seq_id"] is not None


def test_null_and_negative_counts_flagged_not_fatal(spark):
    """A NULL n_tokens must not kill the kernel (pandas delivers it as
    NaN) and a negative count must not 'free' bin capacity — both are
    flagged unpackable like overlong docs."""
    df = spark.createDataFrame(
        [(1, 50), (2, None), (3, -7), (4, 60)],
        "doc_id long, n_tokens long",
    )
    out = packing.pack_sequences(df, "doc_id", "n_tokens", seq_len=100)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["overlong"] and rows[2]["seq_id"] is None
    assert rows[2]["n_tokens"] is None  # the corrupt value is not rewritten
    assert rows[3]["overlong"] and rows[3]["seq_id"] is None
    assert rows[1]["seq_id"] is not None and rows[4]["seq_id"] is not None


def test_matches_local_ffd_oracle(spark):
    """Single group -> the whole packing is one FFD run; compare the
    (doc -> bin) assignment against an independent local FFD."""
    lens = [300, 300, 300, 200, 200, 150, 100, 90, 60, 10]
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lens)], ["doc_id", "n_tokens"]
    )
    out = packing.pack_sequences(df, "doc_id", "n_tokens", seq_len=512, num_groups=1)
    got = {r["doc_id"]: r["seq_id"] & 0xFFFFFFFF for r in out.collect()}

    order = sorted(range(len(lens)), key=lambda i: (-lens[i], str(i)))
    bins: list[int] = []
    want = {}
    for i in order:
        for b, r in enumerate(bins):
            if r >= lens[i]:
                bins[b] -= lens[i]
                want[i] = b
                break
        else:
            bins.append(512 - lens[i])
            want[i] = len(bins) - 1
    assert got == want


def test_validation(docs):
    with pytest.raises(ValueError, match="seq_len"):
        packing.pack_sequences(docs, "doc_id", "n_tokens", seq_len=0)
    with pytest.raises(ValueError, match="num_groups"):
        packing.pack_sequences(docs, "doc_id", "n_tokens", seq_len=10, num_groups=0)
