"""Golden port of the reference's schema-lexer query-bounds table
(tests/test-Grep.cpp:19-250, "get_bounds_of_next_potential_var" with the
forward/reverse log-surgeon lexers over
tests/test_schema_files/search_schema.txt).

The C++ table interleaves one HEURISTIC-overload call (the '-abc-' token
after '='); this port keeps the SCHEMA-path calls only — the schema
lexer does not flag '-abc-' (no rule matches), which is exactly why the
reference switched overloads there. The commented-out
``REQUIRE(is_var == true)`` lines in the reference (wildcarded tokens
the DFA intersection cannot resolve, e.g. ``abc*123``) are ported as
``is_var False`` — the shipped behavior, ambiguity resolved later by the
odometer."""

from clp_core_spark.functions.schema_tokenizer import SchemaSpec
from clp_core_spark.operators.search import (
    get_bounds_of_next_potential_var_schema,
)

# tests/test_schema_files/search_schema.txt (timestamp rule delimits
# messages upstream; the var rules in file order)
SPEC = SchemaSpec(
    delimiters="\r\n:,=!;%?",
    rules=[
        ("int", r"-{0,1}[0-9]+"),
        ("float", r"-{0,1}[0-9]+\.[0-9]+"),
        ("hex", r"[a-fA-F]+"),
        ("hasNumber", r".*\d.*"),
        ("uniqueVariable", r"[0-9]{4}-a12S34d5678-[0-9]{2}-[0-9]{2}[0-9]{2}-[0-9]{2}-[0-9]{2}-[0-9]{0,3}"),
        ("test", r"[0-9]{4}abc[0-9]{0,3}"),
    ],
)


def _scan(value: str):
    out = []
    begin = end = 0
    while True:
        found, begin, end, is_var = get_bounds_of_next_potential_var_schema(
            value, begin, end, SPEC
        )
        if not found:
            return out, begin
        out.append((value[begin:end], is_var))


def test_empty_and_no_token_inputs():
    assert _scan("") == ([], 0)
    toks, _ = _scan("=")
    assert toks == []


def test_no_wildcards_sequence():
    # test-Grep.cpp:72-160: every digit/hex token is a var; 'MAC' and
    # 'address' match no rule and are consumed silently; '-abc-' is NOT
    # flagged by the schema path (the reference calls the heuristic
    # overload for it)
    s = " MAC address 95: ad ff 95 24 0d ff =-abc- "
    toks, final_begin = _scan(s)
    assert toks == [
        ("95", True),
        ("ad", True),
        ("ff", True),
        ("95", True),
        ("24", True),
        ("0d", True),
        ("ff", True),
    ]
    assert final_begin == len(s)  # REQUIRE(str.length() == begin_pos)


def test_with_wildcards_sequence():
    # test-Grep.cpp:177-250: escaped wildcards stay in the token and are
    # not live; mid-wildcard tokens return with is_var false (the DFA
    # DO-NOTHING branch); '?' is BOTH a schema delimiter and a wildcard
    # (wildcard check wins, escaped '?' is a delimiter again)
    s = "~=1\\*x\\?!abc*123;1.2%x:+394/-=-*abc-"
    toks, _ = _scan(s)
    assert toks == [
        ("1\\*x", True),
        ("abc*123", False),
        ("1.2", True),
        ("+394/-", True),
        ("-*abc-", False),
    ]
