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

# (num_spaces_before_ts, CLP format) — the COMPLETE 33-pattern bank of
# clp/TimestampPattern.cpp:120-192 init(), order preserved (first match
# wins). %3 = 3-digit milliseconds; %k/%e = space-padded hour/day;
# %B/%a = full month / abbreviated weekday; %#3 = relative timestamp in
# milliseconds (a bare integer, TimestampPattern.hpp:42).
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
    (0, "%y%m%d %k:%M:%S"),
    (0, "%b %d, %Y %l:%M:%S %p"),
    (0, "%B %d, %Y %H:%M"),
    (1, "[%d/%b/%Y:%H:%M:%S"),
    (3, "[%d/%b/%Y:%H:%M:%S"),
    (3, "[%d/%m/%Y:%H:%M:%S"),
    (6, "%Y-%m-%d %H:%M:%S"),
    (1, "%Y-%m-%d %H:%M:%S"),
    (4, "%a %b %e %H:%M:%S %Y"),
    (0, "%a %b %e %H:%M:%S %Y"),
    (0, "%b %d %H:%M:%S"),
    (0, "%m-%d %H:%M:%S.%3"),
    (0, "%#3"),
]

_MONTH_ABBR = "(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
_MONTH_FULL = (
    "(?:January|February|March|April|May|June|July|August|September"
    "|October|November|December)"
)
_WEEKDAY_ABBR = "(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)"

# directive -> (regex fragment, spark format fragment). %k/%e are
# space-padded fields: the regex admits the padding and the parse runs on
# a space-collapsed candidate with a width-1 format letter.
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
    "%B": (_MONTH_FULL, "MMMM"),
    # %a matches in the regex but is STRIPPED from the candidate before
    # to_timestamp — Spark >= 3.0 refuses day-of-week letters in parse
    # patterns (and CLP doesn't cross-validate the weekday either).
    "%a": (_WEEKDAY_ABBR, ""),
    # %l is a SPACE-PADDED 2-char hour on the 12-hour clock (" 1".."12",
    # TimestampPattern.cpp:551-566) — same padding family as %k/%e
    "%l": (r"[ \d]?\d", "h"),
    "%p": (r"[AP]M", "a"),
    "%k": (r"[ \d]?\d", "H"),
    "%e": (r"[ \d]?\d", "d"),
}

# Directives whose candidates need JVM-side normalization before parsing:
# space-padded fields collapse their padding; %a strips the weekday token.
_NEEDS_NORMALIZE = ("%k", "%e", "%a", "%l")

# fmt used for CLP's relative-timestamp pattern: the matched integer IS
# the timestamp in milliseconds (TimestampPattern.cpp:652-676, no leading
# zeros).
EPOCH_MS_FMT = "%#3"


def _compile(fmt: str) -> tuple[str, str, bool, bool]:
    """CLP format string -> (regex, spark to_timestamp format,
    collapse_spaces, is_epoch_ms)."""
    if fmt == EPOCH_MS_FMT:
        return r"[1-9]\d*", "", False, True

    rx: list[str] = []
    sp: list[str] = []
    lit: list[str] = []
    collapse = any(d in fmt for d in _NEEDS_NORMALIZE)

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
    return "".join(rx), "".join(sp), collapse, False


# (spaces, clp_fmt, regex, spark_fmt, collapse_spaces, is_epoch_ms)
COMPILED: list[tuple[int, str, str, str, bool, bool]] = [
    (spaces, fmt, *_compile(fmt)) for spaces, fmt in CLP_PATTERNS
]


def _prefix_regex(spaces: int) -> str:
    """CLP's num_spaces_before_ts counts space CHARACTERS anywhere before
    the timestamp (TimestampPattern.cpp:247-258): the timestamp begins
    right after the Nth space, with arbitrary non-space runs between.
    ``(?:[^ ]* ){N}`` consumes exactly the first N spaces, no backtracking
    alternatives — the same forward scan CLP does."""
    return "(?:[^ ]* ){%d}" % spaces


def anchored_pattern_regex(i: int) -> str:
    """Full anchored regex for bank pattern ``i``: group 1 = the prefix
    before the timestamp, group 2 = the timestamp text."""
    spaces, _fmt, rx, _sf, _c, _e = COMPILED[i]
    return "^(" + _prefix_regex(spaces) + ")(" + rx + ")"


def extract_timestamp(msg: Column) -> tuple[Column, Column, Column]:
    """Return (ts, pattern_id, tail) for the first matching known pattern.

    ``tail`` is the message with the timestamp excised but the pre-ts
    prefix KEPT (ParsedMessage.cpp:34-35: content = line[0:ts_begin] +
    line[ts_end:]); decompression re-inserts the formatted timestamp with
    :func:`insert_timestamp`. Non-matching rows get (null, -1, msg).
    """
    ts: Column = F.lit(None).cast("timestamp")
    pid: Column = F.lit(-1)
    tail: Column = msg
    # build in reverse so the FIRST pattern ends outermost (first wins)
    for i in reversed(range(len(COMPILED))):
        _spaces, _fmt, _rx, spark_fmt, collapse, epoch_ms = COMPILED[i]
        anchored = anchored_pattern_regex(i)
        pre = F.regexp_extract(msg, anchored, 1)
        cand = F.regexp_extract(msg, anchored, 2)
        if epoch_ms:
            parsed = F.timestamp_millis(cand.cast("long"))
        else:
            norm = cand
            if collapse:
                norm = F.regexp_replace(norm, "^" + _WEEKDAY_ABBR, "")
                norm = F.regexp_replace(norm, "  +", " ")
            parsed = F.try_to_timestamp(norm, F.lit(spark_fmt))
        hit = (cand != "") & parsed.isNotNull()
        ts = F.when(hit, parsed).otherwise(ts)
        pid = F.when(hit, F.lit(i)).otherwise(pid)
        tail = F.when(
            hit,
            F.concat(
                pre,
                F.substring(
                    msg,
                    F.length(pre) + F.length(cand) + 1,
                    F.lit(2**31 - 1),
                ),
            ),
        ).otherwise(tail)
    return ts, pid, tail


# formatting directive -> Column builder (the inverse of _DIRECTIVES;
# %k/%e restore their space padding, %a formats the true weekday —
# exactly what TimestampPattern::insert_formatted_timestamp emits).
_FORMATTERS = {
    "%Y": lambda ts: F.date_format(ts, "yyyy"),
    "%y": lambda ts: F.date_format(ts, "yy"),
    "%m": lambda ts: F.date_format(ts, "MM"),
    "%d": lambda ts: F.date_format(ts, "dd"),
    "%H": lambda ts: F.date_format(ts, "HH"),
    "%M": lambda ts: F.date_format(ts, "mm"),
    "%S": lambda ts: F.date_format(ts, "ss"),
    "%3": lambda ts: F.date_format(ts, "SSS"),
    "%b": lambda ts: F.date_format(ts, "MMM"),
    "%B": lambda ts: F.date_format(ts, "MMMM"),
    "%a": lambda ts: F.date_format(ts, "EEE"),
    "%l": lambda ts: F.lpad(F.date_format(ts, "h"), 2, " "),
    "%p": lambda ts: F.date_format(ts, "a"),
    "%k": lambda ts: F.lpad(F.date_format(ts, "H"), 2, " "),
    "%e": lambda ts: F.lpad(F.date_format(ts, "d"), 2, " "),
}


def format_timestamp(ts: Column, pattern_id: int) -> Column:
    """Render ``ts`` in bank pattern ``pattern_id``'s format (the
    decompression side of TimestampPattern, .cpp:801-935)."""
    fmt = COMPILED[pattern_id][1]
    if fmt == EPOCH_MS_FMT:
        return F.unix_millis(ts).cast("string")
    parts: list[Column] = []
    lit: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            if lit:
                parts.append(F.lit("".join(lit)))
                lit.clear()
            parts.append(_FORMATTERS[fmt[i : i + 2]](ts))
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    if lit:
        parts.append(F.lit("".join(lit)))
    return F.concat(*parts)


def insert_timestamp(tail: Column, ts: Column, pid: Column) -> Column:
    """Inverse of :func:`extract_timestamp`: re-insert the formatted
    timestamp after the pattern's Nth space (insert_formatted_timestamp,
    TimestampPattern.cpp:760-800). ``pid == -1`` rows pass through."""
    out = tail
    for i in range(len(COMPILED)):
        spaces = COMPILED[i][0]
        pre = F.regexp_extract(tail, "^(" + _prefix_regex(spaces) + ")", 1)
        rest = F.substring(tail, F.length(pre) + 1, F.lit(2**31 - 1))
        out = F.when(
            pid == i, F.concat(pre, format_timestamp(ts, i), rest)
        ).otherwise(out)
    return out


def with_extracted_timestamp(
    df, msg_col: str = "text", out_prefix: str = "parsed_"
):
    ts, pid, tail = extract_timestamp(F.col(msg_col))
    return (
        df.withColumn(f"{out_prefix}ts", ts)
        .withColumn(f"{out_prefix}pattern_id", pid)
        .withColumn(f"{out_prefix}tail", tail)
    )
