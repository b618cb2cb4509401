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

from clp_core_spark.functions.wildcard import is_wildcard, wildcard_to_regex

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


def _lex(s: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"KQL lex error at {pos}: {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Tok(kind, m.group()))
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
            return self._match(self._field(prefix, name), val)
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
            parts.append(self._match(self._field(prefix, name), self._next()))
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
        c = self._field(prefix, name)
        v = self._literal_value(val)
        return {"<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]

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
        s = _unescape(t.text)
        has_wild = t.kind != "quoted" and any(
            is_wildcard(c) and (i == 0 or t.text[i - 1] != "\\")
            for i, c in enumerate(t.text)
        )
        if has_wild:
            if s == "*":
                return col.isNotNull()
            return col.cast("string").rlike(wildcard_to_regex(s))
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
