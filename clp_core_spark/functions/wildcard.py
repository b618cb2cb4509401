"""CLP wildcard-string utilities.

Ports of clp/string_utils/string_utils.cpp:
``clean_up_wildcard_search_string`` (:132-167) and the semantics of
``wildcard_match_unsafe`` (:169-296) — re-expressed as translation to an
anchored regex, which is exactly equivalent to the reference's greedy
backtracking glob matcher ('*' = any run incl. newlines, '?' = any one
char, '\\' escapes).

These run driver-side on query strings (one string per query), never in
the row path — row-path wildcard work is `rlike` in the JVM.
"""

from __future__ import annotations

import re

WILDCARDS = "?*"


def is_wildcard(c: str) -> bool:
    return c in WILDCARDS


def clean_up_wildcard_search_string(s: str) -> str:
    """Collapse '*' runs; drop escapes of non-wildcard/non-backslash chars
    (string_utils.cpp:132-167)."""
    out = []
    i, n = 0, len(s)
    is_escaped = False
    while i < n:
        c = s[i]
        if is_escaped:
            is_escaped = False
            if is_wildcard(c) or c == "\\":
                out.append("\\")
            out.append(c)
            i += 1
        elif c == "*":
            out.append(c)
            while i < n and s[i] == "*":
                i += 1
        else:
            if c == "\\":
                is_escaped = True
            else:
                out.append(c)
            i += 1
    return "".join(out)


def wildcard_to_regex(w: str, full: bool = True) -> str:
    """Translate a cleaned CLP wildcard string to a Java/Python-compatible
    regex. '*' -> '.*' (DOTALL), '?' -> '.', '\\x' -> literal x; all other
    chars are regex-escaped. Anchored with \\A..\\z when ``full``."""
    parts = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        if c == "\\" and i + 1 < n:
            parts.append(re.escape(w[i + 1]))
            i += 2
        elif c == "*":
            parts.append(".*")
            i += 1
        elif c == "?":
            parts.append(".")
            i += 1
        else:
            parts.append(re.escape(c))
            i += 1
    body = "".join(parts)
    return rf"(?s)\A{body}\z" if full else f"(?s){body}"


def wildcard_match(tame: str, wild: str, case_sensitive: bool = True) -> bool:
    """Reference-equivalent matcher (via regex), for tests and driver-side
    dictionary probes on small collections."""
    if not case_sensitive:
        tame, wild = tame.lower(), wild.lower()
    return re.match(wildcard_to_regex(wild), tame) is not None
