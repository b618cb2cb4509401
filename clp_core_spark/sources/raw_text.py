"""Raw log-file source: whole files -> messages (CLP's ingest unit).

CLP's MessageParser groups consecutive lines into one event: a line that
starts with a parseable timestamp begins a new message; other lines
append to the current one (clp/MessageParser.cpp, .hpp:30-34 — "a new
message starts at a parsed timestamp, else newline").

Spark-first shape: files are read with the binaryFile source (one row
per file — line ORDER inside a file is only meaningful per file, so the
file is the parallelism unit, exactly like CLP's one-file-at-a-time
FileCompressor); a mapInPandas kernel splits lines, applies the
timestamp-pattern bank per line, and merges continuation lines. Output:
(path, msg_idx, ts, text) — ingest order is recoverable via
(path, msg_idx), CLP's log_event_idx analog.

The kernel is vectorized over the whole Arrow batch: all files' lines are
flattened into one pandas Series, each timestamp pattern runs as ONE
``str.extract`` + ``pd.to_datetime(format=...)`` over the still-unmatched
subset (first-match-wins, shrinking set), and message boundaries are a
cummax/cumsum over the hit mask — no per-line Python loop, no per-line
regex/strptime calls.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from clp_core_spark.functions.timestamps import COMPILED, anchored_pattern_regex

MESSAGE_SCHEMA = (
    "path string, msg_idx long, ts timestamp, pattern_id int, text string"
)

# CLP directive -> strptime directive. Space-padded %k/%e parse via their
# unpadded twins after the candidate's space runs are collapsed.
_STRPTIME_MAP = {
    "%3": "%f",  # CLP %3 is exactly 3 digits; strptime %f takes 1-6.
    "%b": "%b", "%B": "%B", "%a": "%a",
    "%Y": "%Y", "%y": "%y", "%m": "%m", "%d": "%d", "%e": "%d",
    "%H": "%H", "%k": "%H", "%M": "%M", "%S": "%S",
    "%l": "%I", "%p": "%p",
}


def _py_strptime_format(clp_fmt: str) -> str:
    out = []
    i = 0
    while i < len(clp_fmt):
        if clp_fmt[i] == "%" and i + 1 < len(clp_fmt):
            out.append(_STRPTIME_MAP[clp_fmt[i : i + 2]])
            i += 2
        else:
            out.append(clp_fmt[i].replace("%", "%%"))
            i += 1
    return "".join(out)


# (anchored 2-group regex: (prefix)(ts), pyfmt|None, collapse, epoch_ms,
# yearless) per bank pattern, in CLP's first-match-wins order. The prefix
# group implements num_spaces_before_ts = N space chars anywhere before
# the ts (timestamps.anchored_pattern_regex).
_PATTERNS = [
    (
        re.compile(anchored_pattern_regex(i)),
        None if epoch_ms else _py_strptime_format(fmt),
        collapse,
        epoch_ms,
        ("%Y" not in fmt and "%y" not in fmt and not epoch_ms),
    )
    for i, (spaces, fmt, rx, _spark_fmt, collapse, epoch_ms) in enumerate(COMPILED)
]


# ONE alternation over the whole bank: Python's regex engine tries
# alternatives in order at the anchor, so the matching branch IS the
# first-match-wins pattern — one C-level match per line instead of up to
# 33 pandas str.extract passes (each a per-row Python re call; the bank
# walk dominated raw-text ingest at bench scale: ~3.5s -> ~0.4s per 100k
# lines). Branch i owns capture groups (2i+1, 2i+2) — every bank regex
# must stay capture-free for positional numbering, enforced with a real
# raise (python -O strips asserts) at import time.
for _i in range(len(_PATTERNS)):
    if _PATTERNS[_i][0].groups != 2:
        raise RuntimeError(
            f"timestamp bank pattern {_i} carries capture groups; "
            "_parse_lines' combined-alternation branch numbering requires "
            "exactly (prefix)(ts) per pattern"
        )
_COMBINED_RE = re.compile(
    "^(?:"
    + "|".join(anchored_pattern_regex(i)[1:] for i in range(len(COMPILED)))
    + ")"
)


def _parse_ts_strings(c: pd.Series, pat_ix: int) -> pd.Series:
    """Datetime-parse timestamp TEXTS for one bank pattern (shared by the
    batch path and the rare fall-through retry)."""
    _rx, pyfmt, collapse, epoch_ms, yearless = _PATTERNS[pat_ix]
    if epoch_ms:
        # tolerant: digit runs too long for int64 (e.g. a 23-digit ID)
        # must fall through as unmatched lines, not OverflowError the
        # ingest task. float64 is exact for plausible epoch-ms
        # (< 2^53) and values beyond datetime64[ns] range (~year
        # 2262 = 9.2e12 ms) are masked BEFORE to_datetime — pandas
        # overflows on unit conversion even with errors="coerce"
        num = pd.to_numeric(c, errors="coerce").astype("float64")
        num = num.where((num >= 0) & (num <= 9.2e12))
        return pd.to_datetime(num, unit="ms", errors="coerce")
    norm = c.str.replace("  +", " ", regex=True) if collapse else c
    parsed = pd.to_datetime(norm, format=pyfmt, errors="coerce")
    if yearless and parsed.notna().any():
        # strptime defaults the year to 1900; Spark's formatter
        # defaults to 1970 — align with the engine (and CLP's
        # "imprecise pattern" semantics don't define the year).
        parsed = parsed + pd.DateOffset(years=70)
    return parsed


def _parse_lines(lines: pd.Series) -> tuple[pd.Series, pd.Series, pd.Series]:
    """Vectorized first-match-wins parse of the whole line batch.
    Returns (ts: datetime64 Series with NaT for no-timestamp lines,
    pattern_id: bank index or -1,
    tail: the message content — pre-ts prefix kept, timestamp excised
    (ParsedMessage.cpp:34-35); the original line when no pattern
    matched)."""
    n = len(lines)
    vals = lines.tolist()
    ts_np = np.full(n, np.datetime64("NaT"), dtype="datetime64[ns]")
    pid_np = np.full(n, -1, dtype=np.int32)
    tails: list = list(vals)

    match = _COMBINED_RE.match
    by_branch: dict[int, tuple[list[int], list[str], list[str]]] = {}
    for i, s in enumerate(vals):
        m = match(s)
        if m is None:
            continue
        li = m.lastindex  # = the branch's ts group (2b+2)
        b = (li >> 1) - 1
        rows, cands, tl = by_branch.setdefault(b, ([], [], []))
        rows.append(i)
        cands.append(m.group(li))
        # anchored: line = prefix + ts + rest -> tail = prefix + rest
        tl.append(m.group(li - 1) + s[m.end():])

    retry: list[tuple[int, int]] = []  # (row, failed branch)
    for b in sorted(by_branch):
        rows, cands, tl = by_branch[b]
        parsed = _parse_ts_strings(pd.Series(cands), b)
        ok = parsed.notna().to_numpy()
        ridx = np.asarray(rows, dtype=np.int64)
        ts_np[ridx[ok]] = parsed.to_numpy()[ok]
        pid_np[ridx[ok]] = b
        for k in np.nonzero(~ok)[0]:
            retry.append((rows[k], b))
        for k in np.nonzero(ok)[0]:
            tails[rows[k]] = tl[k]

    # Rare fall-through: a line whose first regex-matching pattern failed
    # datetime parsing retries LATER bank patterns (the per-pattern loop's
    # original semantics).
    for row, failed_b in retry:
        s = vals[row]
        for j in range(failed_b + 1, len(_PATTERNS)):
            m = _PATTERNS[j][0].match(s)
            if m is None:
                continue
            parsed = _parse_ts_strings(pd.Series([m.group(2)]), j)
            if parsed.notna().iloc[0]:
                ts_np[row] = parsed.to_numpy()[0]
                pid_np[row] = j
                tails[row] = m.group(1) + s[m.end():]
                break

    return (
        pd.Series(ts_np, index=lines.index),
        pd.Series(pid_np, index=lines.index, dtype="int32"),
        pd.Series(tails, index=lines.index, dtype=object),
    )


def _messages_frame(paths: list[str], contents: list[str]) -> pd.DataFrame:
    """Split many files' contents into messages in one vectorized pass."""
    file_ix: list[int] = []
    all_lines: list[str] = []
    for i, content in enumerate(contents):
        # strict '\n' delimiter (CLP's only boundary): '\r' and unicode
        # line separators stay IN the message text, so CRLF files
        # reconstruct byte-equal. A single trailing '\n' is consumed
        # (same as the reference's newline-terminated message).
        ls = content.split("\n")
        if ls and ls[-1] == "":
            ls.pop()
        file_ix.extend([i] * len(ls))
        all_lines.append(ls)
    flat = [line for ls in all_lines for line in ls]
    if not flat:
        return pd.DataFrame(
            {"path": pd.Series(dtype=object), "msg_idx": pd.Series(dtype="int64"),
             "ts": pd.Series(dtype="datetime64[ns]"),
             "pattern_id": pd.Series(dtype="int32"),
             "text": pd.Series(dtype=object)}
        )
    lines = pd.Series(flat, dtype=object)
    fix = np.asarray(file_ix, dtype=np.int64)
    ts, pid, tail = _parse_lines(lines)

    # Boundary rule (clp/MessageParser.hpp:30-34): a timestamped line opens
    # a message; before the first timestamp, every line is its own message.
    is_ts = ts.notna().to_numpy()
    seen_ts = pd.Series(is_ts).groupby(fix).cummax().to_numpy()
    new_msg = is_ts | ~seen_ts
    gid = np.cumsum(new_msg) - 1

    texts = pd.Series(tail.to_numpy(dtype=object)).groupby(gid).agg("\n".join)
    first = np.nonzero(new_msg)[0]
    msg_file = fix[first]
    msg_idx = pd.Series(np.ones(len(first), dtype=np.int64)).groupby(
        msg_file
    ).cumcount().to_numpy()
    return pd.DataFrame(
        {
            "path": np.asarray(paths, dtype=object)[msg_file],
            "msg_idx": msg_idx,
            "ts": ts.to_numpy()[first],
            "pattern_id": pid.to_numpy()[first],
            "text": texts.to_numpy(dtype=object),
        }
    )


def split_messages(content: str) -> list[tuple[int, object, str]]:
    """(msg_idx, ts-or-None, text) per message, CLP boundary rule.
    Single-file convenience wrapper over the vectorized kernel."""
    pdf = _messages_frame(["-"], [content])
    out = []
    for r in pdf.itertuples(index=False):
        t = None if pd.isna(r.ts) else r.ts.to_pydatetime()
        out.append((int(r.msg_idx), t, r.text))
    return out


def split_messages_df(files: DataFrame, path_col: str = "path",
                      content_col: str = "content") -> DataFrame:
    """(path, content: string) rows -> message DataFrame via the
    vectorized mapInPandas kernel (shared by read_log_files and
    string-built fixtures)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _messages_frame(
                list(pdf[path_col]), list(pdf[content_col])
            )

    return files.select(path_col, content_col).mapInPandas(
        _kernel, schema=MESSAGE_SCHEMA
    )


def _decompress(name: str, raw: bytes) -> bytes:
    """Transparent codec support for compressed log files (CLP's
    compressed-input path, clp/clp/FileCompressor.cpp + libarchive):
    gzip/bzip2/xz via the stdlib, zstd via pyarrow's bundled codec."""
    low = name.lower()
    if low.endswith(".gz") or low.endswith(".gzip"):
        import gzip

        return gzip.decompress(raw)
    if low.endswith(".bz2"):
        import bz2

        return bz2.decompress(raw)
    if low.endswith((".xz", ".lzma")):
        import lzma

        return lzma.decompress(raw)
    if low.endswith(".zst") or low.endswith(".zstd"):
        import pyarrow as pa

        return pa.Codec("zstd").decompress(raw).to_pybytes()
    return raw


def _expand_file(path: str, raw: bytes) -> list[tuple[str, str]]:
    """One input file -> [(logical path, text)]. Tar archives (incl.
    .tar.gz/.tgz) expand to one logical file per member, addressed as
    ``archive!member`` — each member keeps its own message ordering."""
    low = path.lower()
    if low.endswith((".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tar.xz")):
        import io
        import tarfile

        out: list[tuple[str, str]] = []
        with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    continue
                data = tf.extractfile(m).read()
                out.append((f"{path}!{m.name}", data.decode("utf-8", errors="replace")))
        return out
    body = _decompress(path, raw)
    return [(path, body.decode("utf-8", errors="replace"))]


def read_log_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of raw log files -> message DataFrame. Plain text,
    gzip/bzip2/xz/zstd-compressed files, and tar archives all accepted;
    the file (or archive member) stays the parallelism unit."""
    files = spark.read.format("binaryFile").load(path)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths: list[str] = []
            contents: list[str] = []
            for p, b in zip(pdf["path"], pdf["content"]):
                for logical, text in _expand_file(p, bytes(b)):
                    paths.append(logical)
                    contents.append(text)
            yield _messages_frame(paths, contents)

    return files.select("path", "content").mapInPandas(_kernel, schema=MESSAGE_SCHEMA)
