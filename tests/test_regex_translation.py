"""regex -> CLP wildcard translator, ported case-for-case from the
reference's tests/test-regex_utils.cpp."""

import pytest

from clp_core_spark.functions.wildcard import (
    RegexTranslationError,
    regex_to_wildcard,
)


def test_simple_translations():
    assert regex_to_wildcard("") == ""
    assert regex_to_wildcard("xyz") == "xyz"
    assert regex_to_wildcard(". xyz .* zyx .") == "? xyz * zyx ?"
    assert regex_to_wildcard(". xyz .+ zyx .*") == "? xyz ?* zyx *"


@pytest.mark.parametrize(
    "pattern,err",
    [
        (".? xyz .* zyx .", "UnsupportedQuestionMark"),
        (". xyz .** zyx .", "UntranslatableStar"),
        (". xyz .*+ zyx .", "UntranslatablePlus"),
        (". xyz |.* zyx .", "UnsupportedPipe"),
        (". xyz ^.* zyx .", "IllegalCaret"),
        (". xyz $.* zyx .", "IllegalDollarSign"),
        ("abc\\Qdefghi\\Ejkl", "IllegalEscapeSequence"),
    ],
)
def test_unescaped_metachar_errors(pattern, err):
    with pytest.raises(RegexTranslationError, match=err):
        regex_to_wildcard(pattern)


def test_escaped_metachars():
    assert regex_to_wildcard("<>-_/=!") == "<>-_/=!"
    assert regex_to_wildcard("\\<\\>\\-\\_\\/\\=\\!") == "<>-_/=!"
    # wildcard metacharacters keep their escapes in the output
    src = "\\*\\+\\?\\|\\^\\$\\.\\{\\}\\[\\]\\(\\)\\<\\>\\-\\_\\/\\=\\!\\\\"
    assert regex_to_wildcard(src) == "\\*+\\?|^$.{}[]()<>-_/=!\\\\"


def test_charsets():
    assert regex_to_wildcard("x[y]z") == "xyz"
    assert regex_to_wildcard("x[\\^]z") == "x^z"
    assert regex_to_wildcard("x[\\]]z") == "x]z"
    assert regex_to_wildcard("x[-]z") == "x-z"
    assert regex_to_wildcard("x[\\-]z") == "x-z"
    assert regex_to_wildcard("x[\\\\]z") == "x\\\\z"
    assert (
        regex_to_wildcard("[a][b][\\^][-][\\-][\\]][\\\\][c][d]")
        == "ab^--]\\\\cd"
    )
    for bad in ("x[]y", "x[a-z]y", "x[^^]y", "x[^0-9]y", "[xX][yY]",
                "ch:[a-zA-Z0-9]"):
        with pytest.raises(RegexTranslationError, match="UnsupportedCharsetPattern"):
            regex_to_wildcard(bad)
    for bad in ("[\\", "[\\\\", "[xX", "ch:[a-zA-Z0-9"):
        with pytest.raises(RegexTranslationError, match="IncompleteCharsetStructure"):
            regex_to_wildcard(bad)


def test_case_insensitive_charsets():
    ci = dict(case_insensitive_wildcard=True)
    assert regex_to_wildcard("[xX][yY]", **ci) == "xy"
    assert regex_to_wildcard("[Yy][Xx]", **ci) == "yx"
    assert regex_to_wildcard("[aA][Bb][Cc]", **ci) == "abc"
    assert regex_to_wildcard("[aA][Bb][\\^][-][\\]][Cc][dD]", **ci) == "ab^-]cd"
    with pytest.raises(RegexTranslationError, match="IncompleteCharsetStructure"):
        regex_to_wildcard("[xX", **ci)
    with pytest.raises(RegexTranslationError, match="IncompleteCharsetStructure"):
        regex_to_wildcard("[aA][Bb][^[-[\\[Cc[dD", **ci)
    with pytest.raises(RegexTranslationError, match="UnsupportedCharsetPattern"):
        regex_to_wildcard("[aA][Bb][^[-[\\[Cc[dD]", **ci)


def test_anchor_config():
    sub = dict(add_prefix_suffix_wildcards=True)
    assert regex_to_wildcard("^", **sub) == "*"
    assert regex_to_wildcard("$", **sub) == "*"
    assert regex_to_wildcard("^xyz$", **sub) == "xyz"
    assert regex_to_wildcard("xyz", **sub) == "*xyz*"
    assert regex_to_wildcard("^xyz", **sub) == "xyz*"
    assert regex_to_wildcard("xyz$", **sub) == "*xyz"
