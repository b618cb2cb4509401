"""Structured Streaming: incremental encode+route over a file stream and
watermarked count-by-time."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.sources.transcripts import generate_transcripts
from clp_core_spark.streaming import stream_pipeline as sp


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    inp = str(root / "input")
    full = generate_transcripts(spark, num_turns=2000, seed=42).persist()
    # two producer "appends"
    a = full.filter(F.crc32("conv_id") % 2 == 0)
    b = full.filter(F.crc32("conv_id") % 2 == 1)
    a.coalesce(1).write.mode("append").parquet(inp)
    b.coalesce(1).write.mode("append").parquet(inp)
    return {"input": inp, "root": str(root), "full": full}


def test_stream_encode_route_matches_batch(spark, staged):
    stream = sp.read_transcript_stream(spark, staged["input"], max_files_per_trigger=1)
    q = sp.route_stream(spark, stream, f"{staged['root']}/work")
    q.awaitTermination(300)

    routed = spark.read.parquet(f"{staged['root']}/work/sinks/by_role")
    assert routed.count() == staged["full"].count()
    # dictionary IDs are unique + dense despite growing across batches
    lt = spark.read.parquet(f"{staged['root']}/work/dicts/logtype")
    ids = sorted(r["logtype_id"] for r in lt.collect())
    assert ids == list(range(len(ids)))

    # per-sink counts equal the batch pipeline's
    want = dict(
        map(tuple, staged["full"].groupBy("role").count().collect())
    )
    got = dict(map(tuple, routed.groupBy("role").count().collect()))
    assert got == want


def test_count_by_time_stream(spark, staged):
    stream = sp.read_transcript_stream(spark, staged["input"])
    agg = sp.count_by_time_stream(stream, bucket="1 hour", watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("cbt")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["bucket_start"]: r["count"]
        for r in spark.sql("SELECT * FROM cbt").collect()
    }
    want = {
        r["bucket_start"]: r["count"]
        for r in staged["full"]
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.count("*").alias("count"))
        .collect()
    }
    assert got == want
