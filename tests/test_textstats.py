"""Text-analysis column functions: token counts, quality, lang-id,
fingerprints — checked against plain-Python references."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.functions import textstats

DOCS = [
    (0, "the quick brown fox and the lazy dog sat on the mat in the sun"),
    (1, "el perro y el gato se fueron de la casa en los campos"),
    (2, "le chat et le chien sont dans les jardins de la maison"),
    (3, "der hund und die katze sind von dem haus zu den feldern"),
    (4, "xyzzy plugh qwerty"),
    (5, ""),
    (6, "Hello, world! 42 things; cost=3.14 (approx)"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _col(df, expr, name="v"):
    return {r["doc_id"]: r[name] for r in df.select("doc_id", expr.alias(name)).collect()}


def test_token_count_ws(df):
    out = _col(df, textstats.token_count_ws(F.col("text")))
    for i, t in DOCS:
        assert out[i] == len(t.split(" ")), (i, t)


def test_token_count_bpe_ish(df):
    import re

    out = _col(df, textstats.token_count_bpe_ish(F.col("text")))
    pat = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9 ]")
    for i, t in DOCS:
        assert out[i] == len(pat.findall(t)), (i, t)


def test_lang_id(df):
    out = _col(df, textstats.lang_id(F.col("text")))
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "fr"
    assert out[3] == "de"
    assert out[4] == "unknown"
    assert out[5] == "unknown"


def test_quality_score_ranges(df):
    out = _col(df, textstats.quality_score(F.col("text")))
    assert out[5] == 0.0
    for i, t in DOCS:
        assert 0.0 <= out[i] <= 1.0
    assert out[0] > out[4]  # stopword-bearing English beats gibberish


def test_fingerprint64_matches_python(df):
    out = _col(df, textstats.fingerprint64(F.col("text")))
    for i, t in DOCS:
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % 2147483648
        assert out[i] == h, (i, t)


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "b a")], "doc_id long, text string"
    )
    out = _col(df, textstats.fingerprint64(F.col("text")))
    assert out[0] != out[1]


def test_dup_line_ratio_and_top_bigram(spark):
    rows = [
        (0, "a b\na b\nc d"),        # 3 lines, 2 distinct -> 1/3 dup
        (1, "x y x y x y"),          # bigrams: xy yx xy yx xy -> 3/5
        (2, "one"),                  # <2 tokens -> bigram frac 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        textstats.dup_line_ratio(F.col("text")).alias("dl"),
        textstats.top_bigram_fraction(F.col("text")).alias("tb"),
    ).collect()}
    assert abs(got[0]["dl"] - (1 - 2 / 3)) < 1e-6
    assert got[1]["dl"] == 0.0
    assert abs(got[1]["tb"] - 3 / 5) < 1e-6
    assert got[2]["tb"] == 0.0


def test_gopher_keep_gate(spark):
    good = "the quick brown fox jumps over the lazy dog again today ok"
    rows = [
        (0, good),                                   # passes every rule
        (1, "short text"),                           # too few tokens
        (2, "\n".join(["dup line here ok now"] * 12)),  # dup-line ratio 11/12
        (3, " ".join(["12345"] * 20)),               # alpha ratio 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["k"] for r in df.select(
        "doc_id", textstats.gopher_keep(F.col("text")).alias("k")
    ).collect()}
    assert got == {0: True, 1: False, 2: False, 3: False}
