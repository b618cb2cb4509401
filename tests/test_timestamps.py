"""Timestamp-pattern extraction vs the reference's fixture formats
(components/core/tests/test_log_files/log.txt uses several of these)."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from clp_core_spark.functions import timestamps

CASES = [
    # (line, expected iso ts or None, expected tail)
    ("2016-05-08T07:34:05.251 a message", "2016-05-08T07:34:05.251000", " a message"),
    ("2016-05-08 07:34:05,251 b", "2016-05-08T07:34:05.251000", " b"),
    ("[2016-05-08 07:34:05,251] c", "2016-05-08T07:34:05.251000", " c"),
    ("<<<2016-05-08 07:34:05:251 d", "2016-05-08T07:34:05.251000", " d"),
    ("08 May 2016 07:34:05,251 e", "2016-05-08T07:34:05.251000", " e"),
    ("2016/05/08T07:34:05 f", "2016-05-08T07:34:05", " f"),
    ("[20160508-07:34:05] g", "2016-05-08T07:34:05", " g"),
    ("16/05/08 07:34:05 h", "2016-05-08T07:34:05", " h"),
    # tail keeps the pre-ts prefix (ParsedMessage.cpp:34-35)
    ("  2016-05-08 07:34:05,251 indented", "2016-05-08T07:34:05.251000", "   indented"),
    ("[08/May/2016:07:34:05 j", None, None),  # needs 1 preceding space
    (" [08/May/2016:07:34:05 j", "2016-05-08T07:34:05", "  j"),
    ("no timestamp here", None, None),
    ("May 08, 2016 7:34:05 PM k", "2016-05-08T19:34:05", " k"),
    # num_spaces_before_ts counts spaces ANYWHERE before the ts
    # (TimestampPattern.cpp:247-258), not just leading ones
    ("E [08/May/2016:07:34:05 j", "2016-05-08T07:34:05", "E  j"),
    # the 6 patterns beyond round 1 (TimestampPattern.cpp:165-192 parity)
    ("150131  9:50:45 body", "2015-01-31T09:50:45", " body"),
    ("January 31, 2015 15:50 x", "2015-01-31T15:50:00", " x"),
    ("ERROR: apport (pid 4557) Sun Jan  1 15:50:45 2015 t",
     "2015-01-01T15:50:45", "ERROR: apport (pid 4557)  t"),
    ("Sun Jan  1 15:50:45 2015 z", "2015-01-01T15:50:45", " z"),
    ("Jan 21 11:56:42 yearless", "1970-01-21T11:56:42", " yearless"),
    ("916321 relative-ms", "1970-01-01T00:15:16.321000", " relative-ms"),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [(i, line) for i, (line, _, _) in enumerate(CASES)], "i long, text string"
    )
    out = timestamps.with_extracted_timestamp(df)
    return {r["i"]: r for r in out.collect()}


def test_extraction(parsed):
    for i, (line, want_ts, want_tail) in enumerate(CASES):
        row = parsed[i]
        if want_ts is None:
            assert row["parsed_ts"] is None, (line, row["parsed_ts"])
            assert row["parsed_pattern_id"] == -1
            assert row["parsed_tail"] == line
        else:
            assert row["parsed_ts"] is not None, line
            assert row["parsed_ts"].isoformat() == want_ts, (line, row["parsed_ts"])
            assert row["parsed_tail"] == want_tail, (line, row["parsed_tail"])


def test_first_pattern_wins(parsed):
    # '2016-05-08T07:34:05.251' must match pattern 0, not the
    # seconds-precision pattern 12.
    assert parsed[0]["parsed_pattern_id"] == 0


def test_pattern_bank_parity():
    """Full parity with clp/TimestampPattern.cpp:120-192 init(): 33
    patterns, same formats, same order, same space counts."""
    assert len(timestamps.CLP_PATTERNS) == 33
    assert timestamps.CLP_PATTERNS[20] == (0, "%y%m%d %k:%M:%S")
    assert timestamps.CLP_PATTERNS[22] == (0, "%B %d, %Y %H:%M")
    assert timestamps.CLP_PATTERNS[28] == (4, "%a %b %e %H:%M:%S %Y")
    assert timestamps.CLP_PATTERNS[29] == (0, "%a %b %e %H:%M:%S %Y")
    assert timestamps.CLP_PATTERNS[30] == (0, "%b %d %H:%M:%S")
    assert timestamps.CLP_PATTERNS[32] == (0, "%#3")


ROUNDTRIP_LINES = [
    "2016-05-08 07:34:05,251 body",
    "  2016-05-08 07:34:05,251 indented",
    "E [08/May/2016:07:34:05 j",
    "150131  9:50:45 body",
    "January 31, 2015 15:50 x",
    # weekday chosen consistent with the date (Jan 2 2015 was a Friday):
    # CLP re-formats the ts from the epoch value, so an inconsistent
    # weekday would not roundtrip byte-exactly in the reference either
    "ERROR: apport (pid 4557) Fri Jan  2 15:50:45 2015 t",
    "916321 relative-ms",
]


@pytest.mark.parametrize("line", ROUNDTRIP_LINES)
def test_roundtrip_insert_timestamp(spark, line):
    """insert_timestamp(extract_timestamp(line)) == line — CLP's
    decompression path (insert_formatted_timestamp,
    TimestampPattern.cpp:760-800)."""
    df = spark.createDataFrame([(line,)], "text string")
    out = timestamps.with_extracted_timestamp(df)
    back = out.select(
        timestamps.insert_timestamp(
            F.col("parsed_tail"), F.col("parsed_ts"), F.col("parsed_pattern_id")
        ).alias("s")
    ).collect()[0]["s"]
    assert back == line, (line, back)
