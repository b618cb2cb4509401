"""Golden clp_s ClpString-search corpus, ported verbatim from the
reference (tests/test-clp_s-search.cpp:169-193 + the
test_log_files/test_search.jsonl records): KQL string predicates over
CLP-encoded JSON string columns must return the reference's exact idx
sets, running dictionary-first on the encoded columns."""

import pytest

from clp_core_spark.operators import clps_search, semistructured

# test_log_files/test_search.jsonl, byte-for-byte
RECORDS = [
    '{"idx": 0, "a": "clp string"}',
    '{"idx": 1, "msg": "Msg 1: \\"Abc123\\""}',
    '{"idx": 2, "msg": "Msg 2: \'Abc123\'"}',
    '{"idx": 3, "msg": "Msg 3: \\nAbc123"}',
    '{"idx": 4, "skip_msg": "Msg 4: \\\\Abc123"}',
    '{"idx": 5, "msg": "Msg 5: \\rAbc123"}',
    '{"idx": 6, "msg": "Msg 6: \\tAbc123"}',
    '{"idx": 7, "arr": [{"a": 999}, {"b": 1001}]}',
    '{"idx": 8, "arr": {"a": 999, "b": 1001}}',
]

# (kql query, expected idx set) — test-clp_s-search.cpp:171-182. The
# reference itself skips the Msg 4 query (CLP generates no subqueries).
# arr.b > 1000 must hit BOTH the array-of-objects record (7) and the
# plain-object record (8) — structurize_arrays semantics.
GOLDEN = [
    (r"NOT a: b", {0}),
    (r'msg: "Msg 1: \"Abc123\""', {1}),
    ("msg: \"Msg 2: 'Abc123'\"", {2}),
    (r'msg: "Msg 3: \nAbc123"', {3}),
    (r'msg: "Msg 5: \rAbc123"', {5}),
    (r'msg: "Msg 6: \tAbc123"', {6}),
    (r'msg: "*Abc123*"', {1, 2, 3, 5, 6}),
    (r"arr.b > 1000", {7, 8}),
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(RECORDS)], "rid long, js string"
    )
    enc, tree, smap = semistructured.encode_semistructured(
        df, "js", key_cols=["rid"], structurize_arrays=True
    )
    clp_cols = [
        r["path"]
        for r in tree.collect()
        if r["node_type"] == semistructured.T_CLPSTRING and "." not in r["path"]
    ]
    enc2, dicts = clps_search.encode_clpstring_columns(
        enc, clp_cols, key_cols=["rid"]
    )
    enc2 = enc2.persist()
    enc2.count()
    return enc2, dicts


@pytest.mark.parametrize("query,expected", GOLDEN)
def test_golden_clps_search(corpus, query, expected):
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(enc2, query, dicts, ["rid"])
    assert {r["idx"] for r in got.select("idx").collect()} == expected, query


def test_raw_clpstring_columns_are_dropped(corpus):
    enc2, dicts = corpus
    for c in dicts:
        assert c not in enc2.columns, f"raw ClpString column {c} retained"
        assert f"{c}__logtype_id" in enc2.columns
        assert f"{c}__encoded_vars" in enc2.columns


def test_structurized_array_in_tree(corpus):
    enc2, _ = corpus
    assert dict(enc2.dtypes)["arr"].startswith("array<struct")


def test_or_chain_unions(corpus):
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2, 'msg: "Msg 1: \\"Abc123\\"" OR msg: "Msg 3: \\nAbc123"',
        dicts, ["rid"],
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {1, 3}


def test_ignore_case_clpstring_search(corpus):
    """clp_s --ignore-case: the dictionary comparisons lower both sides
    (DictionaryReader ignore-case probes); 'MSG 3:*' finds the
    lowercase-m record only when the flag is set."""
    enc2, dicts = corpus
    sensitive = clps_search.kql_filter_clps(
        enc2, 'msg: "MSG 3:*"', dicts, ["rid"]
    )
    assert sensitive.count() == 0
    relaxed = clps_search.kql_filter_clps(
        enc2, 'msg: "MSG 3:*"', dicts, ["rid"], ignore_case=True
    )
    assert {r["idx"] for r in relaxed.select("idx").collect()} == {3}
