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


# --- OrOfAndForm's De Morgan half: arbitrary AND/OR/NOT nesting
# (clp_s/search/OrOfAndForm.cpp:31-51; distribution intentionally skipped —
# the tree evaluates as ONE Column over ONE scan)


def test_nnf_pushes_not_to_leaves():
    """NOT pushes to leaves by De Morgan; no interior NOT nodes remain,
    and AND/OR structure is preserved (no distribution)."""
    tree = clps_search._parse_bool_tree('(a: 1 OR b: 2) AND c: 3')
    nnf = clps_search._to_nnf(tree)
    assert nnf == (
        "and",
        [
            ("or", [("leafn", False, "a: 1"), ("leafn", False, "b: 2")]),
            ("leafn", False, "c: 3"),
        ],
    )
    tree = clps_search._parse_bool_tree('NOT (a: 1 OR NOT b: 2)')
    nnf = clps_search._to_nnf(tree)
    assert nnf == (
        "and", [("leafn", True, "a: 1"), ("leafn", False, "b: 2")]
    )


def test_wide_or_is_single_scan(corpus):
    """A pure-predicate OR chain — even a wide one — compiles to ONE
    disjunctive filter over ONE scan: no join, no union, no dedup
    exchange in the physical plan (the r4 DNF execution produced one
    scan per OR-group plus a corpus-sized dedup)."""
    enc2, dicts = corpus
    q = " OR ".join(f"idx: {i}" for i in range(40))
    got = clps_search.kql_filter_clps(enc2, q, dicts, ["rid"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    # everything ABOVE the first cached-corpus scan must be just the one
    # disjunctive Filter — no Union, no Join, no dedup exchange (the
    # text below/inside InMemoryTableScan is the corpus BUILD lineage)
    top = plan.split("InMemoryTableScan", 1)[0]
    assert "Filter" in top, plan
    for bad in ("Union", "Join", "Exchange", "Aggregate"):
        assert bad not in top, plan
    assert {r["idx"] for r in got.select("idx").collect()} == set(range(9))


def test_mixed_tree_is_single_corpus_pass(corpus):
    """(clp-search OR plain) — the dictionary hit-set left-joins in as a
    marker flag and the tree evaluates on one corpus pass: the corpus
    relation is scanned once as the probe side (plus the self-join scans
    that BUILD the tiny hit-key set), never unioned with itself."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2, 'msg: "*Abc123*" OR idx: 0', dicts, ["rid"]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, plan
    assert {r["idx"] for r in got.select("idx").collect()} == {0, 1, 2, 3, 5, 6}


def test_dnf_subquery_expansion_and_value_lists_whole():
    """Nested-object subqueries expand to prefixed clauses (clp_s
    NestedQuery) so their inner clauses join the normalization; value
    lists stay ONE primitive clause."""
    tree = clps_search._parse_bool_tree('obj: {x: 1 AND y: 2} OR col: (a or b)')
    assert tree == (
        "or",
        [
            ("and", [("leaf", "obj.x: 1"), ("leaf", "obj.y: 2")]),
            ("leaf", "col: (a or b)"),
        ],
    )
    # deep nesting + NOT inside braces
    tree = clps_search._parse_bool_tree('a: {b: {c: 1} AND NOT d > 5}')
    assert tree == (
        "and",
        [("leaf", "a.b.c: 1"), ("not", ("leaf", "a.d > 5"))],
    )


def test_mixed_boolean_tree_over_clpstring(corpus):
    """(clp-search OR clp-search) AND plain-range — the everyday query
    shape the homogeneous-chain restriction used to reject."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2,
        '(msg: "*Abc123*" OR a: "clp string") AND idx > 2',
        dicts,
        ["rid"],
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {3, 5, 6}


def test_not_over_parenthesized_or(corpus):
    """NOT (p OR q) == NOT p AND NOT q; NOT over a ClpString search
    ranges only over records whose schema HAS the column."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2, 'NOT (msg: "Msg 1: *" OR msg: "Msg 2: *")', dicts, ["rid"]
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {3, 5, 6}


def test_and_or_equal_precedence_left_assoc(corpus):
    """Reference grammar: AND and OR live in ONE alternative, binding
    left-associatively at equal precedence — 'a OR b AND FALSE' is
    '(a OR b) AND FALSE', not 'a OR (b AND FALSE)'."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2,
        'a: "clp string" OR msg: "Msg 1: *" AND idx > 100',
        dicts,
        ["rid"],
    )
    assert got.count() == 0


def test_negated_wildcard_key(corpus):
    """NOT *: v must also exclude rows matching v inside ClpString
    columns (the positive hit set unions dictionary searches; NOT
    anti-joins it from the rows where a matched leaf is present)."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2, 'NOT *: "clp string"', dicts, ["rid"]
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {1, 2, 3, 4, 5, 6}


def test_same_leaf_shared_across_groups(corpus):
    """After distribution the repeated clause compiles once (plan cache):
    (a AND c) OR (b AND c) — c's search relation is shared."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2,
        '(idx < 3 OR idx > 4) AND msg: "*Abc123*"',
        dicts,
        ["rid"],
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {1, 2, 5, 6}


def test_fused_encode_is_one_scan_and_matches_unfused(spark):
    """encode_semistructured(clp_string_cols=...) computes the CLP parse
    in the SAME projection as the JSON flatten: every ArrowEvalPython
    occurrence in the final plan is the one fused node (both columns'
    UDFs, identical expression ids) under the cached flat relation — the
    parse executes once for the whole chain. Results must be identical
    to the unfused two-pass path."""
    rows = [
        (i, '{"msg": "req num %d done", "note": "user %d ok", "user": %d}'
         % (i, i % 7, i))
        for i in range(128)
    ]
    df = spark.createDataFrame(rows, "rid long, js string")
    enc_f, _, _ = semistructured.encode_semistructured(
        df, "js", key_cols=["rid"], clp_string_cols=["msg", "note"]
    )
    enc2_f, dicts_f = clps_search.encode_clpstring_columns(
        enc_f, ["msg", "note"], key_cols=["rid"]
    )
    plan = enc2_f._jdf.queryExecution().executedPlan().toString()
    nodes = [ln for ln in plan.splitlines() if "ArrowEvalPython" in ln]
    assert nodes, plan
    assert all(".msg" in ln and ".note" in ln for ln in nodes), plan
    # each occurrence is a textual repeat inside the cached relation
    assert plan.count("InMemoryTableScan") >= len(nodes), plan

    enc_u, _, _ = semistructured.encode_semistructured(
        df, "js", key_cols=["rid"]
    )
    enc2_u, dicts_u = clps_search.encode_clpstring_columns(
        enc_u, ["msg", "note"], key_cols=["rid"]
    )
    q = '(msg: "*num 12*" OR note: "*user 3*") AND user > 5'
    got_f = {r["rid"] for r in clps_search.kql_filter_clps(
        enc2_f, q, dicts_f, ["rid"]).select("rid").collect()}
    got_u = {r["rid"] for r in clps_search.kql_filter_clps(
        enc2_u, q, dicts_u, ["rid"]).select("rid").collect()}
    expect = {
        i for i in range(128)
        if (("num 12" in f"req num {i} done") or ("user 3" in f"user {i % 7} ok"))
        and i > 5
    }
    assert got_f == got_u == expect


def test_value_list_over_clpstring(corpus):
    """Value lists on an encoded column run as dictionary searches:
    or-mode unions hits, and-mode intersects, not-mode negates the OR
    over present rows (kql.cpp value-list semantics)."""
    enc2, dicts = corpus
    got = clps_search.kql_filter_clps(
        enc2, 'msg: ("Msg 1: *" or "Msg 2: *")', dicts, ["rid"]
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {1, 2}
    got = clps_search.kql_filter_clps(
        enc2, 'msg: (and "Msg*" "*Abc123*")', dicts, ["rid"]
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {1, 2, 3, 5, 6}
    got = clps_search.kql_filter_clps(
        enc2, 'msg: (not "Msg 1: *" "Msg 2: *")', dicts, ["rid"]
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {3, 5, 6}
    # clause-level NOT composes with the list's own negation
    got = clps_search.kql_filter_clps(
        enc2, 'NOT msg: (not "Msg 1: *" "Msg 2: *")', dicts, ["rid"]
    )
    assert {r["idx"] for r in got.select("idx").collect()} == {1, 2}


def test_nested_object_query_over_encoded_clpstring(spark):
    """clp_s NestedQuery meets the mini-Grep: `obj: {msg: "*x*"}` must
    run as a dictionary search on the flattened encoded leaf obj__msg —
    and the dotted form `obj.msg: v` addresses the same column."""
    rows = [
        (i, '{"obj": {"msg": "req num %d done", "lvl": %d}}' % (i, i % 4))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "rid long, js string")
    enc, tree, _ = semistructured.encode_semistructured(
        df, "js", key_cols=["rid"], clp_string_cols=["obj__msg"]
    )
    enc2, dicts = clps_search.encode_clpstring_columns(
        enc, ["obj__msg"], key_cols=["rid"]
    )
    expect = {i for i in range(60) if "num 1" in f"req num {i} done" and i % 4 == 2}
    got = clps_search.kql_filter_clps(
        enc2, 'obj: {msg: "*num 1*" AND lvl: 2}', dicts, ["rid"]
    )
    assert {r["rid"] for r in got.select("rid").collect()} == expect
    got2 = clps_search.kql_filter_clps(
        enc2, 'obj.msg: "*num 1*" AND obj.lvl: 2', dicts, ["rid"]
    )
    assert {r["rid"] for r in got2.select("rid").collect()} == expect


def test_nested_bare_value_scopes_to_prefix(spark):
    """A bare value inside a nested-object subquery searches only under
    that column's subtree — kql.cpp visitNestedQuery prepends the column
    to the implicit '*' descriptor too, so `col: {x: 1 AND "bar"}` must
    NOT match rows where "bar" appears outside col.*."""
    rows = [
        (0, '{"col": {"x": 1, "y": "bar"}, "other": "baz"}'),
        (1, '{"col": {"x": 1, "y": "baz"}, "other": "bar"}'),
        (2, '{"col": {"x": 2, "y": "bar"}, "other": "bar"}'),
    ]
    df = spark.createDataFrame(rows, "rid long, js string")
    enc, _, _ = semistructured.encode_semistructured(df, "js", key_cols=["rid"])
    got = clps_search.kql_filter_clps(enc, 'col: {x: 1 AND "bar"}', {}, ["rid"])
    assert {r["rid"] for r in got.select("rid").collect()} == {0}


def test_partial_pre_parse_encodes_missing_columns_only(spark):
    """A PARTIAL pre-parse (one column fused via encode_semistructured,
    the other not) must parse only the missing column — the r4
    all-or-nothing check re-aliased the existing _p_ column and made the
    later references ambiguous (AnalysisException)."""
    rows = [
        (i, '{"msg": "req num %d done", "note": "user %d ok"}' % (i, i % 5))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "rid long, js string")
    enc, _, _ = semistructured.encode_semistructured(
        df, "js", key_cols=["rid"], clp_string_cols=["msg"]  # note NOT fused
    )
    enc2, dicts = clps_search.encode_clpstring_columns(
        enc, ["msg", "note"], key_cols=["rid"]
    )
    got = clps_search.kql_filter_clps(
        enc2, 'msg: "*num 12*" OR note: "*user 3*"', dicts, ["rid"]
    )
    expect = {
        i for i in range(40)
        if "num 12" in f"req num {i} done" or "user 3" in f"user {i % 5} ok"
    }
    assert {r["rid"] for r in got.select("rid").collect()} == expect


def test_decode_clpstring_column_roundtrips(corpus):
    """Result marshalling (clp_s Output.cpp): the encoded ClpString
    columns decode back to their EXACT original values, with absent
    leaves as NULL."""
    import json as _json

    enc2, dicts = corpus
    out = enc2
    for c in dicts:
        out = clps_search.decode_clpstring_column(out, c, dicts, ["rid"])
    got = {r["rid"]: {c: r[c] for c in dicts} for r in out.collect()}
    for rid, rec in enumerate(RECORDS):
        orig = _json.loads(rec)
        for c in dicts:
            assert got[rid][c] == orig.get(c), (rid, c)


def test_dnf_evaluation_equals_direct_compile(spark):
    """Property check for the OrOfAndForm path: on a corpus with NO
    encoded columns, kql_filter_clps (parse tree -> De Morgan -> DNF ->
    filters/unions) must return exactly the rows a direct KqlCompiler
    predicate does, for seeded-random boolean trees up to depth 4."""
    import random

    from clp_core_spark.operators.kql import KqlCompiler

    df = spark.createDataFrame(
        [(i, i % 11, f"x{i % 7}", (i % 13) / 2.0) for i in range(300)],
        "rid long, a long, b string, c double",
    ).persist()
    df.count()
    leaves = ['a > 3', 'a < 7', 'b: x2', 'b: "x*"', 'c >= 2.5', 'b: x5']

    def gen(rng, depth):
        r = rng.random()
        if depth >= 4 or r < 0.35:
            return rng.choice(leaves)
        if r < 0.5:
            return f"NOT ({gen(rng, depth + 1)})"
        op = rng.choice(["AND", "OR"])
        return f"({gen(rng, depth + 1)} {op} {gen(rng, depth + 1)})"

    rng = random.Random(20260817)
    for trial in range(25):
        q = gen(rng, 0)
        want = {
            r["rid"]
            for r in df.filter(KqlCompiler(df).compile(q)).select("rid").collect()
        }
        got = {
            r["rid"]
            for r in clps_search.kql_filter_clps(df, q, {}, ["rid"])
            .select("rid")
            .collect()
        }
        assert got == want, q
