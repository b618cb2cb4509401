"""Driver-contract invariants for __spark_entry__ (cheap, no Spark)."""

import __spark_entry__ as entry

# ops whose results are approximate/probabilistic by nature — the driver
# records a rows-only check for these
ROWS_ONLY = {"dedup_simhash", "sim_lsh_topk"}


def test_every_query_has_oracle_or_is_declared_rows_only():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs, f"oracles without queries: {oracles - qs}"
    assert qs - oracles == ROWS_ONLY, (
        f"queries missing oracles: {qs - oracles - ROWS_ONLY}"
    )


def test_oracle_sql_mentions_only_registered_views():
    import re

    allowed = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in entry.oracle_sql().items():
        tables = set(re.findall(r"(?:FROM|JOIN)\s+([a-z_]+)", sql))
        assert tables <= allowed | {"h", "sh", "pairs"}, (name, tables - allowed)


def test_query_callables_are_binary():
    import inspect

    for name, fn in entry.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
