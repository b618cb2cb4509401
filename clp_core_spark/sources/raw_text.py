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
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from clp_core_spark.functions.timestamps import COMPILED

MESSAGE_SCHEMA = "path string, msg_idx long, ts timestamp, text string"

_PATTERNS = [
    (spaces, re.compile("^" + (" " * spaces) + "(" + rx + ")"), fmt, spark_fmt)
    for spaces, fmt, rx, spark_fmt in COMPILED
]

_STRPTIME_MAP = {
    "%3": "%f",  # parsed as microseconds after right-padding below
    "%b": "%b", "%Y": "%Y", "%y": "%y", "%m": "%m", "%d": "%d",
    "%H": "%H", "%M": "%M", "%S": "%S", "%l": "%I", "%p": "%p",
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


_PY_FORMATS = [_py_strptime_format(fmt) for _, fmt, _, _ in
               [(s, f, r, sf) for s, f, r, sf in COMPILED]]


def _try_parse_line(line: str):
    """First matching known pattern -> (datetime, tail) else None."""
    from datetime import datetime

    for i, (spaces, rx, clp_fmt, _sf) in enumerate(_PATTERNS):
        m = rx.match(line)
        if not m:
            continue
        raw = m.group(1)
        pyfmt = _PY_FORMATS[i]
        cand = raw
        if "%f" in pyfmt:
            # CLP %3 is exactly 3 digits; strptime %f takes 1-6 — works.
            pass
        try:
            ts = datetime.strptime(cand, pyfmt)
        except ValueError:
            continue
        return ts, line[m.end() :]
    return None


def split_messages(content: str) -> list[tuple[int, object, str]]:
    """(msg_idx, ts-or-None, text) per message, CLP boundary rule."""
    msgs: list[tuple[int, object, str]] = []
    cur_ts = None
    cur_lines: list[str] = []
    for line in content.splitlines():
        parsed = _try_parse_line(line)
        if parsed is not None:
            if cur_lines:
                msgs.append((len(msgs), cur_ts, "\n".join(cur_lines)))
            cur_ts, tail = parsed
            cur_lines = [tail]
        elif cur_lines:
            cur_lines.append(line)
        else:
            # no timestamp yet: every line is its own message
            msgs.append((len(msgs), None, line))
    if cur_lines:
        msgs.append((len(msgs), cur_ts, "\n".join(cur_lines)))
    return msgs


def read_log_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of raw log files -> message DataFrame."""
    files = spark.read.format("binaryFile").load(path)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, idxs, tss, texts = [], [], [], []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]).decode("utf-8", errors="replace")
                for msg_idx, ts, text in split_messages(content):
                    paths.append(row["path"])
                    idxs.append(msg_idx)
                    tss.append(ts)
                    texts.append(text)
            yield pd.DataFrame(
                {"path": paths, "msg_idx": idxs, "ts": tss, "text": texts}
            )

    return files.select("path", "content").mapInPandas(_kernel, schema=MESSAGE_SCHEMA)
