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
- ``date("...")`` literals -> timestamps;
- wildcard KEY tokens — a descriptor token that is exactly ``*``
  (unescaped) matches any number of path nodes including zero
  (clp_s/search/SchemaMatch.cpp:70-174 populate_column_mapping;
  DescriptorToken: a token is a wildcard iff it is a single unescaped
  ``*``, ColumnDescriptor.hpp:71-79). ``*.b > 100``, ``a.*: v`` and the
  pure wildcard ``*: v`` compile to the OR of the predicate over every
  type-compatible concrete leaf — zero matching leaves folds to
  ``lit(False)`` (clp_s EmptyExpr propagation).

Column references resolve against a DataFrame schema; ``a.b`` reaches
into struct fields, crosses ``array<struct>`` with ANY-element
(``exists``) semantics, and descends flattened semistructured leaves
(``a__b`` columns count as path ``a.b``). Everything compiles to
built-in Column expressions (Catalyst optimizes/pushes down; no UDFs).
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


def _descriptor_tokens(raw: str) -> tuple[tuple[str, bool], ...]:
    """Column descriptor -> ((token, is_wildcard), ...).

    The raw text splits on UNESCAPED dots; a token is a wildcard iff it
    is a single unescaped ``*`` (``\\*`` is the literal star) — clp_s
    DescriptorToken semantics (ColumnDescriptor.hpp:71-79). Consecutive
    wildcard tokens collapse to one
    (ColumnDescriptor::simplify_descriptor_wildcards)."""
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        raw = raw[1:-1]
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == "\\" and i + 1 < len(raw):
            cur.append(raw[i : i + 2])
            i += 2
            continue
        if c == ".":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    if any(p == "" for p in parts):
        # '.a', 'a.', 'a..c': the reference grammar rejects empty
        # descriptor tokens (test-kql.cpp "Empty token in column name")
        raise ValueError(f"empty token in column descriptor: {raw!r}")
    out: list[tuple[str, bool]] = []
    for p in parts:
        wild = p == "*"
        tok = ("*", True) if wild else (_unescape(p), False)
        if wild and out and out[-1][1]:
            continue  # collapse consecutive wildcards
        out.append(tok)
    return tuple(out)


def _match_tokens(tokens: tuple[tuple[str, bool], ...], segs: tuple[str, ...]) -> bool:
    """NFA match of descriptor tokens over a concrete leaf path; a
    wildcard token consumes any number of segments including zero
    (SchemaMatch.cpp:128-199 edge case 1)."""
    from functools import lru_cache

    n, m = len(tokens), len(segs)

    @lru_cache(maxsize=None)
    def go(i: int, j: int) -> bool:
        if i == n:
            return j == m
        tok, wild = tokens[i]
        if wild:
            return go(i + 1, j) or (j < m and go(i, j + 1))
        return j < m and segs[j] == tok and go(i + 1, j + 1)

    return go(0, 0)


# --- parser / compiler --------------------------------------------------------


class KqlCompiler:
    """One-pass recursive-descent parser that emits a Column directly."""

    def __init__(self, df: DataFrame, array_json_cols: set[str] | None = None):
        """``array_json_cols``: columns holding UNSTRUCTURED arrays as JSON
        text (semistructured.T_ARRAY leaves — clp_s array.dict analog,
        clp_s/archive_constants.hpp:11-24). Predicates on them (or dotted
        paths INTO them, e.g. ``arr.b > 1000``) evaluate against the
        array's parsed elements with ANY-element semantics, without
        decoding the rest of the record (golden behavior
        tests/test-clp_s-search.cpp:182 holds with structurize on AND
        off)."""
        self.df = df
        self.array_json_cols = set(array_json_cols or ())
        self._leaves_cache = None
        self._string_cols = [
            f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
        ]

    # public -------------------------------------------------------------

    def compile(self, kql: str) -> Column:
        self.toks = _lex(kql)
        self.pos = 0
        col = self._query(prefix=())
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

    def _pred_on_path(
        self,
        tokens: tuple[tuple[str, bool], ...],
        leaf_pred,
        numeric_only: bool = False,
        type_ok=None,
    ) -> Column:
        """Apply ``leaf_pred(col, leaf_type)`` at a descriptor. With
        wildcard tokens the descriptor resolves against the schema to the
        OR over every matching concrete leaf (SchemaMatch.cpp:70-174);
        ``type_ok(leaf_simple_type)`` prunes type-incompatible leaves
        (clp_s matches_type — under Spark ANSI semantics an incompatible
        literal/column comparison is a hard error, so pruning is
        mandatory, not an optimization). Literal descriptors keep legacy
        untyped behavior (leaf_type=None). When a literal path crosses an
        ``array<struct>`` column (a structurized array,
        semistructured.T_SARRAY), the predicate becomes ``exists`` over
        the elements — clp_s structurize_arrays semantics: a record
        matches if ANY element matches (tests/test-clp_s-search.cpp:182)."""
        from pyspark.sql.types import ArrayType, StructType

        has_wild = any(w for _, w in tokens)
        literal_segs = None if has_wild else tuple(t for t, _ in tokens)
        allowed = self._NUMERIC_LEAF if numeric_only else self._ATOMIC_LEAF
        preds: list[Column] = []

        # 1) concrete schema leaves (incl. flattened a__b and struct /
        #    array<struct> descents)
        for segs, top, rest, leaf_type in self._schema_leaves():
            if has_wild:
                if (
                    leaf_type not in allowed
                    or (type_ok is not None and not type_ok(leaf_type))
                    or not _match_tokens(tokens, segs)
                ):
                    continue
            elif segs != literal_segs:
                continue
            lt = leaf_type if has_wild else None
            if not rest and top in self.array_json_cols:
                preds.append(
                    self._array_json_pred(top, (), leaf_pred, numeric_only)
                )
            else:
                preds.append(self._apply_at(top, rest, leaf_pred, lt))

        # 2) paths INTO unstructured (JSON-text) arrays: descriptor =
        #    <tokens matching the array column> . <literal sub-path>
        for col_name in self.array_json_cols:
            segs = tuple(col_name.split("__"))
            for i in range(len(tokens) - 1, -1, -1):
                head, tail = tokens[:i], tokens[i:]
                if any(w for _, w in tail):
                    break  # wildcards inside the element sub-path: unsupported
                if not tail or not _match_tokens(head, segs):
                    continue
                preds.append(
                    self._array_json_pred(
                        col_name,
                        tuple(t for t, _ in tail),
                        leaf_pred,
                        numeric_only,
                    )
                )
                break  # longest literal sub-path wins; one pred per column

        if preds:
            out = preds[0]
            for p in preds[1:]:
                out = out | p
            return out
        if has_wild:
            # zero matching leaves -> EmptyExpr (SchemaMatch.cpp:70-97)
            return F.lit(False)

        # literal fallback: unresolved names keep their original
        # analysis-time error semantics (plus legacy struct-walk paths)
        full = ".".join(t for t, _ in tokens)
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
                    return leaf_pred(c, None)

                return F.exists(arr, _elem_pred)
            cur = dt
        return leaf_pred(F.col(full), None)

    def _array_json_pred(
        self,
        col_name: str,
        subpath: tuple[str, ...],
        leaf_pred,
        numeric: bool,
    ) -> Column:
        """ANY-element predicate over a JSON-text array column — the
        search side of clp_s's array.dict: elements are parsed with a
        minimal schema derived from the QUERY (sub-path + predicate
        kind), so no inference pass and no full decode. Single-object
        values wrap as one-element arrays (both shapes match, like
        structurize mode)."""
        raw = F.col(col_name).cast("string")
        wrapped = F.when(raw.rlike(r"^\s*\["), raw).otherwise(
            F.concat(F.lit("["), raw, F.lit("]"))
        )
        leaf_t = "double" if numeric else "string"
        if subpath:
            inner = leaf_t
            for seg in reversed(subpath):
                inner = f"struct<`{seg}`:{inner}>"
            parsed = F.from_json(wrapped, f"array<{inner}>")

            def _elem(e: Column) -> Column:
                c = e
                for seg in subpath:
                    c = c[seg]
                return leaf_pred(c, leaf_t)

            return F.exists(parsed, _elem)
        parsed = F.from_json(wrapped, f"array<{leaf_t}>")
        return F.exists(parsed, lambda e: leaf_pred(e, leaf_t))

    # -- wildcard-key resolution (SchemaMatch analog) -----------------------

    _NUMERIC_LEAF = (
        "byte", "short", "int", "bigint", "float", "double", "date",
        "timestamp", "timestamp_ntz", "decimal",
    )
    _ATOMIC_LEAF = (*_NUMERIC_LEAF, "string", "boolean")

    def _schema_leaves(self) -> list[tuple[tuple[str, ...], str, tuple[str, ...], str]]:
        """Concrete value leaves of the DataFrame schema:
        ``(path_segments, top_column, struct_steps, leaf_simple_type)``.
        Flattened semistructured columns (``a__b``) contribute their
        dotted path (``a.b``); struct fields and array<struct> element
        fields descend one segment per level (array crossings keep
        ANY-element semantics in _apply_at); array<scalar> leaves report
        their ELEMENT type (a predicate on them matches if any element
        matches — the unstructured-array value search)."""
        from pyspark.sql.types import ArrayType, StructType

        if getattr(self, "_leaves_cache", None) is not None:
            return self._leaves_cache
        out: list[tuple[tuple[str, ...], str, tuple[str, ...], str]] = []

        def walk(dtype, segs: tuple[str, ...], top: str, rest: tuple[str, ...]):
            if isinstance(dtype, StructType):
                for f in dtype.fields:
                    walk(f.dataType, segs + (f.name,), top, rest + (f.name,))
                return
            if isinstance(dtype, ArrayType):
                elem = dtype.elementType
                if isinstance(elem, StructType):
                    for f in elem.fields:
                        walk(f.dataType, segs + (f.name,), top, rest + (f.name,))
                    return
                if isinstance(elem, ArrayType):
                    return  # nested scalar matrices: not a value leaf
                out.append((segs, top, rest, elem.simpleString().split("(")[0]))
                return
            out.append((segs, top, rest, dtype.simpleString().split("(")[0]))

        for f in self.df.schema.fields:
            walk(f.dataType, tuple(f.name.split("__")), f.name, ())
        self._leaves_cache = out
        return out

    def _apply_at(
        self, top: str, rest: tuple[str, ...], leaf_pred, leaf_type: str | None = None
    ) -> Column:
        """leaf_pred at a RESOLVED leaf: walk the real schema from column
        ``top`` through ``rest``; each array<struct> crossing becomes
        ``exists`` (any element), and an array<scalar> leaf applies the
        predicate per element via ``exists``."""
        from pyspark.sql.types import ArrayType, StructType

        def walk(col: Column, dtype, parts: tuple[str, ...]) -> Column:
            if isinstance(dtype, ArrayType):
                elem = dtype.elementType
                if parts and isinstance(elem, StructType):
                    p, more = parts[0], parts[1:]
                    sub = elem[p].dataType
                    return F.exists(col, lambda e: walk(e[p], sub, more))
                if not parts and not isinstance(elem, (StructType, ArrayType)):
                    return F.exists(col, lambda e: leaf_pred(e, leaf_type))
            if not parts:
                return leaf_pred(col, leaf_type)
            p, more = parts[0], parts[1:]
            return walk(col[p], dtype[p].dataType, more)

        return walk(F.col(top), self.df.schema[top].dataType, rest)

    # grammar --------------------------------------------------------------

    def _query(self, prefix: tuple) -> Column:
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

    def _unary(self, prefix: tuple) -> Column:
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

    def _expression(self, prefix: tuple) -> Column:
        t = self._next()
        if t.kind not in ("lit", "quoted"):
            raise ValueError(f"unexpected token {t.text!r}")
        nxt = self._peek()
        if nxt is not None and nxt.kind == "range_op":
            op = self._next().text
            val = self._next()
            return self._range(prefix + _descriptor_tokens(t.text), op, val)
        if nxt is not None and nxt.kind == "punct" and nxt.text == ":":
            self._next()
            tokens = prefix + _descriptor_tokens(t.text)
            after = self._peek()
            if after is not None and after.text == "{":
                self._next()
                inner = self._query(prefix=tokens)
                self._expect("}")
                return inner
            if after is not None and after.text == "(":
                return self._value_list(tokens)
            val = self._next()
            return self.match_pred(tokens, val)
        # bare value: default-column search. Inside a nested-object
        # subquery the implicit '*' descriptor is prefixed too (kql.cpp
        # visitNestedQuery prepends the column to EVERY descriptor,
        # including the wildcard one), so `col: {x: 1 AND "bar"}`
        # scopes "bar" to col.* — same rewrite kql_filter_clps applies.
        if prefix:
            return self.match_pred(prefix + _descriptor_tokens("*"), t)
        return self._any_column_match(t)

    def _value_list(self, tokens: tuple) -> Column:
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
            parts.append(self.match_pred(tokens, val))
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

    def _range(self, tokens: tuple, op: str, val: Tok) -> Column:
        v = self._literal_value(val)

        def leaf(c: Column, leaf_type: str | None = None) -> Column:
            return {"<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]

        if val.kind == "date":
            allowed = {"timestamp", "timestamp_ntz", "date"}
        elif val.kind != "quoted" and _NUM_RE.match(_unescape(val.text)):
            allowed = {"byte", "short", "int", "bigint", "float", "double", "decimal"}
        else:
            allowed = {"string"}
        # string-valued ranges must see string leaves (numeric_only=True
        # would intersect to zero leaves and silently fold to lit(False))
        return self._pred_on_path(
            tokens,
            leaf,
            numeric_only=allowed != {"string"},
            type_ok=lambda lt: lt in allowed,
        )

    def match_pred(self, tokens: tuple, val: Tok) -> Column:
        """``descriptor : value`` predicate with type-compatible leaf
        pruning for wildcard descriptors (clp_s matches_type)."""
        return self._pred_on_path(
            tokens,
            lambda c, lt=None, v=val: self._match(c, v, leaf_type=lt),
            type_ok=self._match_type_ok(val),
        )

    def _match_type_ok(self, t: Tok):
        """Leaf types a ``: value`` literal can live on — wildcard-key
        resolution skips the rest (an int literal never tests a boolean
        leaf etc.; under ANSI those comparisons would be errors)."""
        if t.kind == "date":
            allowed = {"timestamp", "timestamp_ntz", "date"}
            return lambda lt: lt in allowed
        v = unescape_kql_value(t.text)
        if _has_unescaped_wildcard(v):
            allowed = {"string"}
        else:
            s = _resolve_escapes(v)
            allowed = {"string"}
            if t.kind != "quoted":
                if _NUM_RE.match(s):
                    allowed |= {
                        "byte", "short", "int", "bigint", "float", "double",
                        "decimal",
                    }
                if s.lower() in ("true", "false"):
                    allowed |= {"boolean"}
        return lambda lt: lt in allowed

    def _literal_value(self, t: Tok):
        if t.kind == "date":
            inner = t.text[len("date(") : -1]
            return F.to_timestamp(F.lit(_unescape(inner)))
        s = _unescape(t.text)
        if t.kind != "quoted" and _NUM_RE.match(s):
            return F.lit(float(s)) if ("." in s or "e" in s.lower()) else F.lit(int(s))
        return F.lit(s)

    def _match(self, col: Column, t: Tok, leaf_type: str | None = None) -> Column:
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
        if leaf_type is not None:
            # typed comparison on a wildcard-resolved leaf: the literal
            # takes the leaf's type (numeric on numeric, string on string,
            # bool on bool) — never a cross-type cast
            if leaf_type == "string":
                return col == F.lit(s)
            if leaf_type == "boolean":
                return col == F.lit(s.lower() == "true")
            if t.kind != "quoted" and _NUM_RE.match(s):
                num = float(s) if ("." in s or "e" in s.lower()) else int(s)
                return col == F.lit(num)
            return F.lit(False)
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


def kql_filter(
    df: DataFrame, kql: str, array_cols: set[str] | None = None
) -> DataFrame:
    """``df.filter(<compiled kql>)``. ``array_cols``: JSON-text
    unstructured-array columns (see KqlCompiler)."""
    return df.filter(KqlCompiler(df, array_json_cols=array_cols).compile(kql))


def unstructured_array_cols(schema_tree: DataFrame) -> set[str]:
    """Flattened column names of the UnstructuredArray leaves in an
    encode_semistructured schema tree — feed to kql_filter(array_cols=)."""
    return {
        r["path"].replace(".", "__")
        for r in schema_tree.collect()
        if r["node_type"] == "UnstructuredArray"
    }
