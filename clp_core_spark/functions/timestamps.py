"""Heuristic timestamp extraction — CLP's TimestampPattern bank
(clp/TimestampPattern.cpp:120-320, pattern list in init(); directive set
clp/TimestampPattern.hpp:23-48) as Spark Column expressions.

Each known pattern carries (num_spaces_before_ts, strptime-like format).
For every pattern we derive:
- an anchored extraction regex (the timestamp must start right after N
  spaces at the beginning of the message), and
- a Spark DateTimeFormatter pattern for ``to_timestamp``.

``extract_timestamp`` tries the patterns in CLP's order and returns the
first parse (first-match-wins, like
TimestampPattern::search_known_ts_patterns). Everything is a single
Catalyst expression tree: regexp_extract + to_timestamp + coalesce — no
UDFs, fully codegen'd, and the same logic is expressible in ANSI SQL for
oracle checks.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

# (num_spaces_before_ts, CLP format) — clp/TimestampPattern.cpp init()
# order preserved. %3 = 3-digit milliseconds.
CLP_PATTERNS: list[tuple[int, str]] = [
    (0, "%Y-%m-%dT%H:%M:%S.%3"),
    (0, "%Y-%m-%dT%H:%M:%S,%3"),
    (0, "%Y-%m-%d %H:%M:%S.%3"),
    (0, "%Y-%m-%d %H:%M:%S,%3"),
    (0, "%Y/%m/%dT%H:%M:%S.%3"),
    (0, "%Y/%m/%dT%H:%M:%S,%3"),
    (0, "%Y/%m/%d %H:%M:%S.%3"),
    (0, "%Y/%m/%d %H:%M:%S,%3"),
    (0, "[%Y-%m-%d %H:%M:%S,%3]"),
    (2, "%Y-%m-%d %H:%M:%S,%3"),
    (0, "<<<%Y-%m-%d %H:%M:%S:%3"),
    (0, "%d %b %Y %H:%M:%S,%3"),
    (0, "%Y-%m-%dT%H:%M:%S"),
    (0, "%Y-%m-%d %H:%M:%S"),
    (0, "%Y/%m/%dT%H:%M:%S"),
    (0, "%Y/%m/%d %H:%M:%S"),
    (0, "[%Y-%m-%dT%H:%M:%S"),
    (0, "[%Y%m%d-%H:%M:%S]"),
    (1, "%Y-%m-%d  %H:%M:%S"),
    (0, "%y/%m/%d %H:%M:%S"),
    (0, "%b %d, %Y %l:%M:%S %p"),
    (1, "[%d/%b/%Y:%H:%M:%S"),
    (3, "[%d/%b/%Y:%H:%M:%S"),
    (3, "[%d/%m/%Y:%H:%M:%S"),
    (6, "%Y-%m-%d %H:%M:%S"),
    (1, "%Y-%m-%d %H:%M:%S"),
    (0, "%m-%d %H:%M:%S.%3"),
]

_MONTH_ABBR = "(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"

# directive -> (regex fragment, spark format fragment)
_DIRECTIVES: dict[str, tuple[str, str]] = {
    "%Y": (r"\d{4}", "yyyy"),
    "%y": (r"\d{2}", "yy"),
    "%m": (r"\d{2}", "MM"),
    "%d": (r"\d{2}", "dd"),
    "%H": (r"\d{2}", "HH"),
    "%M": (r"\d{2}", "mm"),
    "%S": (r"\d{2}", "ss"),
    "%3": (r"\d{3}", "SSS"),
    "%b": (_MONTH_ABBR, "MMM"),
    "%l": (r"\d{1,2}", "h"),
    "%p": (r"[AP]M", "a"),
}


def _compile(fmt: str) -> tuple[str, str]:
    """CLP format string -> (regex, spark to_timestamp format)."""
    rx: list[str] = []
    sp: list[str] = []
    lit: list[str] = []

    def _flush() -> None:
        # Literals go out as ONE quoted run — adjacent single-quoted
        # chunks would read as an escaped quote ('' = literal ').
        if lit:
            run = "".join(lit).replace("'", "''")
            sp.append(f"'{run}'")
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            if d not in _DIRECTIVES:
                raise ValueError(f"unsupported directive {d} in {fmt!r}")
            r, s = _DIRECTIVES[d]
            _flush()
            rx.append(r)
            sp.append(s)
            i += 2
        else:
            # Quote literals for DateTimeFormatter ('[' and ']' are
            # reserved for optional sections; letters are directives).
            rx.append(re.escape(fmt[i]))
            lit.append(fmt[i])
            i += 1
    _flush()
    return "".join(rx), "".join(sp)


COMPILED: list[tuple[int, str, str, str]] = [
    (spaces, fmt, *_compile(fmt)) for spaces, fmt in CLP_PATTERNS
]


def extract_timestamp(msg: Column) -> tuple[Column, Column, Column]:
    """Return (ts, pattern_id, tail) for the first matching known pattern.

    ``tail`` is the message with the timestamp (and the spaces before it)
    removed — CLP stores the remainder and re-inserts the formatted
    timestamp on decompression (TimestampPattern.cpp:801-).
    Non-matching rows get (null, -1, msg).
    """
    ts: Column = F.lit(None).cast("timestamp")
    pid: Column = F.lit(-1)
    tail: Column = msg
    # build in reverse so the FIRST pattern ends outermost (first wins)
    for i in reversed(range(len(COMPILED))):
        spaces, _fmt, rx, spark_fmt = COMPILED[i]
        anchored = "^" + (" " * spaces) + "(" + rx + ")"
        cand = F.regexp_extract(msg, anchored, 1)
        parsed = F.try_to_timestamp(cand, F.lit(spark_fmt))
        hit = (cand != "") & parsed.isNotNull()
        ts = F.when(hit, parsed).otherwise(ts)
        pid = F.when(hit, F.lit(i)).otherwise(pid)
        tail = F.when(
            hit,
            F.substring(msg, F.lit(spaces) + F.length(cand) + 1, F.lit(2**31 - 1)),
        ).otherwise(tail)
    return ts, pid, tail


def with_extracted_timestamp(
    df, msg_col: str = "text", out_prefix: str = "parsed_"
):
    ts, pid, tail = extract_timestamp(F.col(msg_col))
    return (
        df.withColumn(f"{out_prefix}ts", ts)
        .withColumn(f"{out_prefix}pattern_id", pid)
        .withColumn(f"{out_prefix}tail", tail)
    )
