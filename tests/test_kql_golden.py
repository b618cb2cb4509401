"""Golden port of the reference KQL parser table (tests/test-kql.cpp),
at the descriptor / value-unescape level (pure Python — the Spark
compile of these forms is covered by test_kql.py / test_kql_wildcard_keys).
"""

import pytest

from clp_core_spark.operators.kql import (
    _descriptor_tokens,
    unescape_kql_value,
)

# test-kql.cpp "Pure wildcard key queries": every *:value spelling is a
# pure-wildcard descriptor (quoted '*' included)
PURE_WILDCARD_KEYS = ["*", '"*"', " * ", ' "*" ']


@pytest.mark.parametrize("raw", PURE_WILDCARD_KEYS)
def test_pure_wildcard_descriptor_forms(raw):
    toks = _descriptor_tokens(raw.strip())
    assert toks == (("*", True),), raw


# test-kql.cpp "Escape sequences in column name": a\.b.c and its quoted
# form both resolve to two tokens ('a.b', 'c')
@pytest.mark.parametrize("raw", [r"a\.b.c", r'"a\.b.c"'])
def test_escaped_dot_column_name(raw):
    assert _descriptor_tokens(raw) == (("a.b", False), ("c", False))


# test-kql.cpp "Empty token in column name": rejected by the grammar
@pytest.mark.parametrize("raw", [".a", "a.", "a..c", "a.b."])
def test_empty_descriptor_token_rejected(raw):
    with pytest.raises(ValueError, match="empty token"):
        _descriptor_tokens(raw)


# test-kql.cpp "Escape sequences in value" — (input, expected) pairs,
# byte-for-byte: \\ \? \* stay ESCAPED (live-wildcard distinction);
# unicode escapes resolving to wildcard/backslash chars re-escape.
VALUE_ESCAPES = [
    ("\\\\", "\\\\"),
    ("\\??", "\\??"),
    ("\\**", "\\**"),
    ("\\u9999", "香"),
    ("\\r\\n\\t\\b\\f", "\r\n\t\b\f"),
    ('\\"', '"'),
    ("\\{\\}\\(\\)\\<\\>", "{}()<>"),
    ("\\u003F", "\\?"),
    ("\\u002A", "\\*"),
    ("\\u005C", "\\\\"),
]


@pytest.mark.parametrize("raw,want", VALUE_ESCAPES)
def test_value_escape_table(raw, want):
    assert unescape_kql_value(f'"{raw}"') == want
