"""KQL front-end: parse the reference's KQL dialect and compile it to a
Spark ``Column`` predicate.

Grammar per clp_s/search/kql/Kql.g4 (ANTLR), semantics per
clp_s/search/kql/kql.cpp + FilterExpr:

- ``col : value`` — equality; values with ``*``/``?`` wildcards match by
  glob (on strings); ``col : (a or b)`` / ``(and a b)`` value lists;
- ``col <op> value`` for < <= > >= (numeric/date comparison);
- ``NOT q``, ``q AND q``, ``q OR q`` — AND/OR at EQUAL precedence,
  left-associative (the ANTLR rule puts them in one alternative);
- ``col : {subquery}`` — nested-object query: keys inside resolve under
  the ``col.`` prefix (clp_s NestedQuery);
- a bare value — match against ANY string column (clp_s default-column
  search);
- ``date("...")`` literals -> timestamps.

Column references resolve against a DataFrame schema; ``a.b`` reaches
into struct fields. Everything compiles to built-in Column expressions
(Catalyst optimizes/pushes down; no UDFs).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from clp_core_spark.functions.wildcard import (
    clean_up_wildcard_search_string,
    is_wildcard,
    wildcard_to_regex,
)

# --- lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r\n]+)
  | (?P<date>date\( (?: "(?:\\.|[^"])*" | [^)]* ) \))
  | (?P<quoted>"(?:\\.|[^"])*")
  | (?P<range_op><=|>=|<|>)
  | (?P<punct>[:(){}])
  | (?P<lit>(?:\\.|[^\\():<>"{}\s])+)
    """,
    re.VERBOSE,
)

_ESCAPES = {"\\t": "\t", "\\r": "\r", "\\n": "\n"}


@dataclass
class Tok:
    kind: str  # 'date' | 'quoted' | 'range_op' | 'punct' | 'lit'
    text: str
    start: int = -1  # source span, for top-level clause splitting
    end: int = -1


def _lex(s: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"KQL lex error at {pos}: {s[pos:pos+20]!r}")
        start, pos = pos, m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Tok(kind, m.group(), start, pos))
    return out


def _unescape(raw: str) -> str:
    """Resolve quoted strings and escape sequences to the literal value."""
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        raw = raw[1:-1]
    out: list[str] = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw):
            nxt = raw[i : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if raw[i + 1] == "u" and i + 6 <= len(raw):
                out.append(chr(int(raw[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(raw[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


_NUM_RE = re.compile(r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?$")

# escapes that resolve to a literal character in KQL values
# (clp_s/Utils.cpp unescape_kql_internal)
_KQL_VALUE_ESCAPES = {
    '"': '"', "t": "\t", "r": "\r", "n": "\n", "b": "\b", "f": "\f",
    "{": "{", "}": "}", "(": "(", ")": ")", "<": "<", ">": ">",
}


def unescape_kql_value(raw: str) -> str:
    """clp_s's StringUtils::unescape_kql_value (clp_s/Utils.cpp): strip
    quotes, resolve escape sequences — but KEEP ``\\\\``, ``\\*`` and
    ``\\?`` escaped so the downstream wildcard interpreter treats them as
    literals. Wildcards are live inside quoted strings too (the reference
    golden query ``msg: "*Abc123*"`` is a wildcard match,
    tests/test-clp_s-search.cpp:180)."""
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        raw = raw[1:-1]
    out: list[str] = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= len(raw):
            raise ValueError("trailing escape in KQL value")
        n = raw[i + 1]
        if n == "\\":
            out.append("\\\\")
        elif n in "*?":
            out.append("\\" + n)
        elif n in _KQL_VALUE_ESCAPES:
            out.append(_KQL_VALUE_ESCAPES[n])
        elif n == "u" and i + 6 <= len(raw):
            ch = chr(int(raw[i + 2 : i + 6], 16))
            # unicode escapes are always literal characters
            out.append("\\" + ch if ch in "\\*?" else ch)
            i += 6
            continue
        else:
            raise ValueError(f"invalid KQL value escape \\{n}")
        i += 2
    return "".join(out)


def _has_unescaped_wildcard(s: str) -> bool:
    escaped = False
    for c in s:
        if escaped:
            escaped = False
        elif c == "\\":
            escaped = True
        elif is_wildcard(c):
            return True
    return False


def _resolve_escapes(s: str) -> str:
    """Final pass for literal (non-wildcard) use: ``\\x`` -> ``x``."""
    out: list[str] = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


# --- parser / compiler --------------------------------------------------------


class KqlCompiler:
    """One-pass recursive-descent parser that emits a Column directly."""

    def __init__(self, df: DataFrame):
        self.df = df
        self._string_cols = [
            f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
        ]

    # public -------------------------------------------------------------

    def compile(self, kql: str) -> Column:
        self.toks = _lex(kql)
        self.pos = 0
        col = self._query(prefix="")
        if self.pos != len(self.toks):
            raise ValueError(f"trailing KQL tokens: {self.toks[self.pos:]}")
        return col

    # helpers --------------------------------------------------------------

    def _peek(self) -> Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self) -> Tok:
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of KQL")
        self.pos += 1
        return t

    @staticmethod
    def _is_kw(t: Tok | None, kw: str) -> bool:
        return t is not None and t.kind == "lit" and t.text.lower() == kw

    def _field(self, prefix: str, name: str) -> Column:
        return F.col(prefix + name if prefix else name)

    def _pred_on_path(self, prefix: str, name: str, leaf_pred) -> Column:
        """Apply ``leaf_pred`` (Column -> Column) at a dotted path. When
        the path crosses an ``array<struct>`` column (a structurized array,
        semistructured.T_SARRAY), the predicate becomes ``exists`` over the
        elements — clp_s structurize_arrays semantics: a record matches if
        ANY element matches (tests/test-clp_s-search.cpp:182)."""
        from pyspark.sql.types import ArrayType, StructType

        full = prefix + name if prefix else name
        parts = full.split(".")
        cur: object = self.df.schema
        for i, p in enumerate(parts):
            if not isinstance(cur, StructType) or p not in cur.fieldNames():
                break
            dt = cur[p].dataType
            if (
                isinstance(dt, ArrayType)
                and isinstance(dt.elementType, StructType)
                and i < len(parts) - 1
            ):
                rest = parts[i + 1 :]
                arr = F.col(".".join(parts[: i + 1]))

                def _elem_pred(e: Column) -> Column:
                    c = e
                    for seg in rest:
                        c = c[seg]
                    return leaf_pred(c)

                return F.exists(arr, _elem_pred)
            cur = dt
        return leaf_pred(F.col(full))

    # grammar --------------------------------------------------------------

    def _query(self, prefix: str) -> Column:
        # NOT / atom, then left-assoc (AND|OR) chain at EQUAL precedence
        left = self._unary(prefix)
        while True:
            t = self._peek()
            if self._is_kw(t, "and"):
                self._next()
                left = left & self._unary(prefix)
            elif self._is_kw(t, "or"):
                self._next()
                left = left | self._unary(prefix)
            else:
                return left

    def _unary(self, prefix: str) -> Column:
        t = self._peek()
        if self._is_kw(t, "not"):
            self._next()
            return ~self._unary(prefix)
        if t is not None and t.kind == "punct" and t.text == "(":
            self._next()
            inner = self._query(prefix)
            self._expect(")")
            return inner
        return self._expression(prefix)

    def _expect(self, text: str) -> None:
        t = self._next()
        if t.text != text:
            raise ValueError(f"expected {text!r}, got {t.text!r}")

    def _expression(self, prefix: str) -> Column:
        t = self._next()
        if t.kind not in ("lit", "quoted"):
            raise ValueError(f"unexpected token {t.text!r}")
        nxt = self._peek()
        if nxt is not None and nxt.kind == "range_op":
            op = self._next().text
            val = self._next()
            return self._range(prefix, _unescape(t.text), op, val)
        if nxt is not None and nxt.kind == "punct" and nxt.text == ":":
            self._next()
            name = _unescape(t.text)
            after = self._peek()
            if after is not None and after.text == "{":
                self._next()
                inner = self._query(prefix=f"{prefix}{name}.")
                self._expect("}")
                return inner
            if after is not None and after.text == "(":
                return self._value_list(prefix, name)
            val = self._next()
            return self._pred_on_path(
                prefix, name, lambda c: self._match(c, val)
            )
        # bare value: match any string column (default-column search)
        return self._any_column_match(t)

    def _value_list(self, prefix: str, name: str) -> Column:
        self._expect("(")
        mode = "or"
        t = self._peek()
        if self._is_kw(t, "and") or self._is_kw(t, "or") or self._is_kw(t, "not"):
            mode = self._next().text.lower()
        parts: list[Column] = []
        while True:
            t = self._peek()
            if t is None:
                raise ValueError("unterminated value list")
            if t.kind == "punct" and t.text == ")":
                self._next()
                break
            val = self._next()
            parts.append(
                self._pred_on_path(prefix, name, lambda c, v=val: self._match(c, v))
            )
        if not parts:
            return F.lit(False)
        out = parts[0]
        for p in parts[1:]:
            if mode == "and":
                out = out & p
            elif mode == "not":
                out = out | p
            else:
                out = out | p
        return ~out if mode == "not" else out

    def _range(self, prefix: str, name: str, op: str, val: Tok) -> Column:
        v = self._literal_value(val)

        def leaf(c: Column) -> Column:
            return {"<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]

        return self._pred_on_path(prefix, name, leaf)

    def _literal_value(self, t: Tok):
        if t.kind == "date":
            inner = t.text[len("date(") : -1]
            return F.to_timestamp(F.lit(_unescape(inner)))
        s = _unescape(t.text)
        if t.kind != "quoted" and _NUM_RE.match(s):
            return F.lit(float(s)) if ("." in s or "e" in s.lower()) else F.lit(int(s))
        return F.lit(s)

    def _match(self, col: Column, t: Tok) -> Column:
        if t.kind == "date":
            return col == self._literal_value(t)
        # clp_s value semantics: unescape keeps \\ \* \? escaped; wildcards
        # are live in quoted strings too; when the pattern has a live
        # wildcard the STILL-ESCAPED text feeds wildcard_to_regex (which
        # interprets backslash escapes as literals) — so 'a*\*b' treats the
        # escaped star literally (clp_s/Utils.cpp unescape_kql_value).
        v = unescape_kql_value(t.text)
        if _has_unescaped_wildcard(v):
            if set(v) == {"*"}:
                return col.isNotNull()
            return col.cast("string").rlike(
                wildcard_to_regex(clean_up_wildcard_search_string(v))
            )
        s = _resolve_escapes(v)
        if t.kind != "quoted" and _NUM_RE.match(s):
            num = float(s) if ("." in s or "e" in s.lower()) else int(s)
            return col == F.lit(num)
        return col == F.lit(s)

    def _any_column_match(self, t: Tok) -> Column:
        if not self._string_cols:
            return F.lit(False)
        out = F.lit(False)
        for name in self._string_cols:
            out = out | self._match(F.col(name), t)
        return out


def kql_filter(df: DataFrame, kql: str) -> DataFrame:
    """``df.filter(<compiled kql>)``."""
    return df.filter(KqlCompiler(df).compile(kql))
