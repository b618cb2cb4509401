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


# ---------------------------------------------------------------------------
# PII detection / redaction


PII_DOCS = [
    (0, "contact alice.smith+spam@example.co.uk or bob@sub.domain.org now"),
    (1, "server 10.0.0.1 talked to 192.168.255.254 on port 443"),
    (2, "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567"),
    (3, "card 1234 5678 9012 3456 or 1234-5678-9012-3456 or 1234567890123456"),
    (4, "no sensitive content here at all, just 42 and 3.14"),
    (5, "mixed: eve@corp.io from 172.16.0.9 card 9999 8888 7777 6666"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_pii_counts(pii_df):
    cols = textstats.pii_counts(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in pii_df.select(
            "doc_id", *[c.alias(k) for k, c in cols.items()]
        ).collect()
    }
    assert (rows[0]["email"], rows[0]["ipv4"]) == (2, 0)
    assert rows[1]["ipv4"] == 2
    assert (rows[2]["ssn"], rows[2]["phone"]) == (1, 2)
    assert rows[3]["card"] == 3
    assert all(rows[4][k] == 0 for k in ("email", "ipv4", "ssn", "phone", "card"))
    assert (rows[5]["email"], rows[5]["ipv4"], rows[5]["card"]) == (1, 1, 1)


def test_redact_pii(pii_df):
    out = {
        r["doc_id"]: r["red"]
        for r in pii_df.select(
            "doc_id", textstats.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert out[0] == "contact <EMAIL> or <EMAIL> now"
    assert out[1] == "server <IPV4> talked to <IPV4> on port 443"
    assert out[2] == "ssn <SSN> phone <PHONE> alt <PHONE>"
    assert out[3] == "card <CARD> or <CARD> or <CARD>"
    assert out[4] == PII_DOCS[4][1]
    assert out[5] == "mixed: <EMAIL> from <IPV4> card <CARD>"


def test_redact_pii_kinds_subset(pii_df):
    out = {
        r["doc_id"]: r["red"]
        for r in pii_df.select(
            "doc_id",
            textstats.redact_pii(F.col("text"), kinds=("email",)).alias("red"),
        ).collect()
    }
    assert out[0] == "contact <EMAIL> or <EMAIL> now"
    assert out[1] == PII_DOCS[1][1]  # ipv4 untouched when not requested


def test_pii_dialect_parity_duckdb(pii_df):
    """The SAME literal patterns must behave identically in DuckDB (RE2)
    — the dialect-parity contract the module header promises. Redaction
    chain and per-kind counts are both cross-checked."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", PII_DOCS)
    red_expr = "text"
    for kind, pat in textstats.PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        red_expr = f"regexp_replace({red_expr}, '{esc}', '<{kind.upper()}>', 'g')"
    duck = dict(con.execute(f"SELECT doc_id, {red_expr} FROM t").fetchall())
    spark_red = {
        r["doc_id"]: r["red"]
        for r in pii_df.select(
            "doc_id", textstats.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert duck == spark_red
    for kind, pat in textstats.PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        duck_n = dict(con.execute(
            f"SELECT doc_id, len(regexp_extract_all(text, '{esc}')) FROM t"
        ).fetchall())
        spark_n = {
            r["doc_id"]: r["n"]
            for r in pii_df.select(
                "doc_id", textstats.pii_counts(F.col("text"))[kind].alias("n")
            ).collect()
        }
        assert duck_n == spark_n, kind
