"""Deterministic split/sample invariants: partition-independence (the
property df.sample lacks), group integrity, DuckDB hash parity,
monotone sampling, and strata handling."""

import duckdb
import pyspark.sql.functions as F
import pytest

from clp_core_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"conv-{i % 37:04d}", ["en", "de", "fr"][i % 3], 10 + i % 90)
        for i in range(1200)
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "conv_id", "lang", "n_chars"]
    ).persist()


def test_hash_bucket_matches_duckdb(spark):
    """The documented cross-engine contract: Spark's bucket equals
    DuckDB's 0x-cast md5 form for string and integer keys."""
    df = spark.createDataFrame(
        [("abc",), ("conv-0001",), ("",), ("7",)], ["k"]
    )
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", sampling.hash_bucket(F.col("k"), salt="s").alias("b")
        ).collect()
    }
    for k, b in got.items():
        want = duckdb.sql(
            "SELECT CAST(('0x' || substr(md5('s' || ?), 1, 15)) AS BIGINT)"
            f" % {sampling.BUCKETS}",
            params=[k],
        ).fetchone()[0]
        assert b == want, k


def test_split_partition_independent(docs):
    """Identical assignment regardless of partition layout — the exact
    failure mode of seed-per-partition randomSplit."""
    a = sampling.split_assign(docs.repartition(2), "doc_id")
    b = sampling.split_assign(docs.repartition(16, "lang"), "doc_id")
    assert a.select("doc_id", "split").exceptAll(
        b.select("doc_id", "split")
    ).isEmpty()


def test_split_conv_integrity_and_coverage(docs):
    """Splitting on conv_id: every conversation lands whole in ONE
    split, every row is assigned, and all splits are populated."""
    out = sampling.split_assign(
        docs, "conv_id", {"train": 0.6, "val": 0.2, "test": 0.2}
    )
    straddlers = (
        out.groupBy("conv_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert straddlers.isEmpty()
    by_split = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert set(by_split) == {"train", "val", "test"}
    assert sum(by_split.values()) == 1200


def test_split_weights_validated(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.split_assign(docs, "doc_id", {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError, match="at least one"):
        sampling.split_assign(docs, "doc_id", {})


def test_sample_monotone_and_partition_independent(docs):
    """Raising the fraction only ADDS rows; the kept set ignores
    partitioning; the realized rate is near the target."""
    keep10 = sampling.stratified_sample(docs, "doc_id", 0.10)
    keep30 = sampling.stratified_sample(
        docs.repartition(13, "conv_id"), "doc_id", 0.30
    )
    assert keep10.select("doc_id").exceptAll(
        keep30.select("doc_id")
    ).isEmpty()
    n10, n30 = keep10.count(), keep30.count()
    assert 0.05 * 1200 < n10 < 0.15 * 1200
    assert 0.24 * 1200 < n30 < 0.36 * 1200


def test_stratified_fractions_and_absent_strata(docs):
    """Per-stratum rates are honored and unlisted strata drop to 0."""
    out = sampling.stratified_sample(
        docs, "doc_id", {"en": 1.0, "de": 0.25}, strata_col="lang"
    )
    rates = dict(
        out.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert rates.get("en") == 400  # 1200/3 per lang, frac 1.0 keeps all
    assert "fr" not in rates
    assert 0.10 * 400 < rates.get("de", 0) < 0.45 * 400
    with pytest.raises(ValueError, match="strata_col"):
        sampling.stratified_sample(docs, "doc_id", {"en": 0.5})
    with pytest.raises(ValueError, match="not in"):
        sampling.stratified_sample(docs, "doc_id", 1.5)


def test_null_keys_never_pollute_a_split(spark):
    """A NULL key gets a NULL split (never the last declared split —
    that would pile every bad parse into the eval set) and is dropped
    by stratified_sample (no stable membership, no honest fraction)."""
    df = spark.createDataFrame(
        [("a", "en"), (None, "en"), ("b", "de")], "k string, lang string"
    )
    out = sampling.split_assign(df, "k")
    nulls = out.filter(F.col("k").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["split"] is None
    assert out.filter(F.col("k").isNotNull() & F.col("split").isNull()).isEmpty()
    kept = sampling.stratified_sample(df, "k", 1.0)
    assert {r["k"] for r in kept.collect()} == {"a", "b"}


def test_deterministic_shuffle_is_a_salted_permutation(docs):
    """Same order regardless of input partitioning; a different salt
    gives a different (but equally reproducible) permutation; nothing
    is lost."""
    a = [r["doc_id"] for r in
         sampling.deterministic_shuffle(docs.repartition(3), "doc_id").collect()]
    b = [r["doc_id"] for r in
         sampling.deterministic_shuffle(
             docs.repartition(11, "lang"), "doc_id").collect()]
    assert a == b
    assert sorted(a) == list(range(1200))
    assert a != list(range(1200))  # actually shuffled
    c = [r["doc_id"] for r in
         sampling.deterministic_shuffle(docs, "doc_id", salt="epoch2").collect()]
    assert c != a and sorted(c) == sorted(a)


def test_split_then_sample_independent_salts(docs):
    """The sample salt is independent of the split salt: sampling 50%
    keeps ~50% of EACH split, not an aliased band of one of them."""
    out = sampling.stratified_sample(
        sampling.split_assign(docs, "doc_id", {"a": 0.5, "b": 0.5}),
        "doc_id",
        0.5,
    )
    rates = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    for s in ("a", "b"):
        assert 0.35 * 600 < rates.get(s, 0) < 0.65 * 600, rates


def test_mixture_fractions_math():
    # binding stratum (scarce relative to target) keeps everything
    fr = sampling.mixture_fractions(
        {"web": 1000, "code": 100, "chat": 400},
        {"web": 0.5, "code": 0.25, "chat": 0.25},
    )
    # T = min(1000/.5, 100/.25, 400/.25) = 400; keeps: web 200/1000,
    # code 100/100, chat 100/400
    assert fr == {"web": 0.2, "code": 1.0, "chat": 0.25}
    with pytest.raises(ValueError):
        sampling.mixture_fractions({"a": 10}, {"a": 1.0, "b": 1.0})
    with pytest.raises(ValueError):
        sampling.mixture_fractions({"a": 10}, {"a": 0.0})


def test_mixture_sample_realizes_target_proportions(docs):
    # docs has 400 rows per lang; target 2:1:1 over en/de/fr
    out = sampling.mixture_sample(
        docs, "doc_id", {"en": 0.5, "de": 0.25, "fr": 0.25}, "lang"
    )
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # T = min(400/.5, 400/.25) = 800 -> en keeps all 400 (binding),
    # de/fr keep ~200 each (bucket granularity ~ +/- O(sqrt(n)))
    assert got["en"] == 400
    for lang in ("de", "fr"):
        assert abs(got[lang] - 200) < 40, got
    # deterministic: same call, same membership
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in sampling.mixture_sample(
            docs, "doc_id", {"en": 0.5, "de": 0.25, "fr": 0.25}, "lang"
        ).collect()
    }
    assert ids1 == ids2


def test_mixture_sample_subset_of_corpus_and_drops_unweighted(docs):
    out = sampling.mixture_sample(
        docs, "doc_id", {"en": 0.9, "de": 0.1}, "lang"
    ).collect()
    assert all(r["lang"] != "fr" for r in out)  # unweighted stratum dropped
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert {r["doc_id"] for r in out} <= all_ids


def test_mixture_sample_token_weighted(docs):
    """weight_col switches the mixture unit to token mass: strata with
    heavier docs need fewer rows to reach the same target share."""
    out = sampling.mixture_sample(
        docs, "doc_id", {"en": 0.5, "de": 0.5}, "lang", weight_col="n_chars"
    )
    got = {
        r["lang"]: r["w"]
        for r in out.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()
    }
    assert set(got) == {"en", "de"}
    # realized WEIGHT shares near 50/50 (bucket granularity tolerance)
    total = sum(got.values())
    assert abs(got["en"] / total - 0.5) < 0.1, got


def test_mixture_sample_high_cardinality_stratum_driver_safe(spark):
    """The per-stratum aggregate collects ONLY weights-named strata: a
    high-cardinality stratum column (e.g. a URL host) must not drag its
    whole domain onto the driver (round-5 verdict, Wrong #3). Output is
    identical because mixture_fractions never reads unnamed strata."""
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("host-"), (F.col("id") % 4000).cast("string")).alias(
            "host"
        ),
    )
    # name two strata out of ~4000
    out = sampling.mixture_sample(
        df, "doc_id", {"host-1": 0.5, "host-2": 0.5}, strata_col="host"
    )
    rows = out.collect()
    assert rows and {r["host"] for r in rows} <= {"host-1", "host-2"}
