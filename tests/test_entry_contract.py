"""Driver-contract invariants for __spark_entry__ (cheap, no Spark)."""

import __spark_entry__ as entry

def test_every_query_has_an_oracle():
    """Since round 2 every query is oracle-paired — the formerly rows-only
    simhash/LSH queries have exact DuckDB twins (margin-matched detector /
    inlined-hyperplane signature oracle)."""
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs, f"oracles without queries: {oracles - qs}"
    assert qs == oracles, f"queries missing oracles: {qs - oracles}"


def test_oracle_sql_mentions_only_registered_views():
    import re

    allowed = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    ctes = {
        "h", "sh", "pairs", "sig", "q", "lines", "cells", "a", "probe",
        "reps", "nd", "bad", "edges", "reach",
        "toks", "w", "dup", "isl", "hits", "grams", "bench", "sb",
        "enc", "lut",
    }
    for name, sql in entry.oracle_sql().items():
        tables = set(re.findall(r"(?:FROM|JOIN)\s+([a-z_]+)", sql))
        assert tables <= allowed | ctes, (name, tables - allowed - ctes)


def test_query_callables_are_binary():
    import inspect

    for name, fn in entry.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
