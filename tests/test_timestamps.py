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
    ("  2016-05-08 07:34:05,251 indented", "2016-05-08T07:34:05.251000", " indented"),
    ("[08/May/2016:07:34:05 j", None, None),  # needs 1 leading space
    (" [08/May/2016:07:34:05 j", "2016-05-08T07:34:05", " j"),
    ("no timestamp here", None, None),
    ("May 08, 2016 7:34:05 PM k", "2016-05-08T19:34:05", " k"),
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


def test_roundtrip_format(spark):
    """Formatting the parsed ts with the same pattern reproduces the
    original prefix (CLP re-inserts the formatted timestamp on decode,
    TimestampPattern.cpp:801-)."""
    line = "2016-05-08 07:34:05,251 body"
    df = spark.createDataFrame([(line,)], "text string")
    out = timestamps.with_extracted_timestamp(df).collect()[0]
    pid = out["parsed_pattern_id"]
    spark_fmt = timestamps.COMPILED[pid][3]
    back = (
        spark.createDataFrame([(out["parsed_ts"],)], "ts timestamp")
        .select(F.date_format("ts", spark_fmt).alias("s"))
        .collect()[0]["s"]
    )
    assert back + out["parsed_tail"] == line
