"""KQL compiler vs expected row sets (modeled on
components/core/tests/test-clp_s-search.cpp's golden-query style)."""

import datetime as dt

import pytest

from clp_core_spark.operators.kql import kql_filter

ROWS = [
    # idx, msg, level, code, val, ts, ctx(struct)
    (0, "connection opened", "INFO", 200, 1.5, "2024-01-01 10:00:00", ("web", 1)),
    (1, "connection Abc123 closed", "WARN", 404, 2.5, "2024-01-02 10:00:00", ("web", 2)),
    (2, "disk full", "ERROR", 500, 9.0, "2024-01-03 10:00:00", ("db", 3)),
    (3, "Abc123 retry", "ERROR", 503, 0.5, "2024-01-04 10:00:00", ("db", 4)),
    (4, "heartbeat", "INFO", 200, 3.0, "2024-01-05 10:00:00", ("cron", 5)),
]


@pytest.fixture(scope="module")
def df(spark):
    data = [
        (i, m, lv, c, v, dt.datetime.fromisoformat(t), {"svc": s, "shard": sh})
        for (i, m, lv, c, v, t, (s, sh)) in ROWS
    ]
    return spark.createDataFrame(
        data,
        "idx long, msg string, level string, code int, val double,"
        " ts timestamp, ctx struct<svc:string, shard:int>",
    )


def q(df, kql):
    return {r["idx"] for r in kql_filter(df, kql).select("idx").collect()}


def test_exact_and_wildcard(df):
    assert q(df, "level: INFO") == {0, 4}
    assert q(df, 'msg: "disk full"') == {2}
    assert q(df, "msg: *Abc123*") == {1, 3}
    assert q(df, "msg: conn*") == {0, 1}
    assert q(df, "msg: *") == {0, 1, 2, 3, 4}


def test_numeric_and_range(df):
    assert q(df, "code: 200") == {0, 4}
    assert q(df, "code > 400") == {1, 2, 3}
    assert q(df, "val <= 1.5") == {0, 3}
    assert q(df, "code >= 500 AND code <= 503") == {2, 3}


def test_bool_ops_equal_precedence_left_assoc(df):
    assert q(df, "level: ERROR AND code: 503") == {3}
    assert q(df, "level: INFO OR level: WARN") == {0, 1, 4}
    assert q(df, "NOT level: INFO") == {1, 2, 3}
    # ANTLR rule makes AND/OR one left-assoc level:
    # a OR b AND c == (a OR b) AND c
    assert q(df, "level: WARN OR level: ERROR AND code: 503") == {3}


def test_value_list(df):
    assert q(df, "code: (200 503)") == {0, 3, 4}
    assert q(df, "code: (or 200 503)") == {0, 3, 4}
    assert q(df, "level: (not INFO WARN)") == {2, 3}


def test_nested_query_and_dotted_path(df):
    assert q(df, "ctx.svc: db") == {2, 3}
    assert q(df, "ctx: {svc: web AND shard: 2}") == {1}
    assert q(df, "ctx: {shard > 3}") == {3, 4}


def test_default_column_search(df):
    assert q(df, "heartbeat") == {4}
    assert q(df, "*Abc123*") == {1, 3}


def test_date_literal(df):
    assert q(df, 'ts >= date("2024-01-04 00:00:00")') == {3, 4}


def test_escapes(df):
    assert q(df, 'msg: "connection opened"') == {0}
    # clp_s rejects \<space> (unescape_kql_internal default case -> false)
    with pytest.raises(ValueError):
        q(df, r"msg: connection\ opened")
    assert q(df, "msg: disk\\*") == set()  # escaped wildcard is literal


def test_nested_bare_value_scopes_to_prefix(df):
    """A bare value inside a nested-object subquery resolves against the
    prefixed implicit '*' descriptor (kql.cpp visitNestedQuery prepends
    the column to EVERY descriptor), not the whole record — the same
    rewrite kql_filter_clps applies, so both KQL entry points agree."""
    # "heartbeat" lives in msg (row 4) but under no ctx.* string leaf:
    # global default-column semantics would wrongly yield {4}
    assert q(df, "ctx: {shard >= 1 AND heartbeat}") == set()
    assert q(df, "ctx: {shard > 1 AND web}") == {1}
    assert q(df, "ctx: {db}") == {2, 3}
