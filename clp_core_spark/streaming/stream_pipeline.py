"""Structured Streaming wrapper for the encode pipeline.

The reference's real-time path is the IR stream: logging libraries emit
events incrementally and archives are built from them later
(clp/ir/LogEventSerializer.cpp, clp/clp/FileCompressor.cpp:438-524). The
Spark-native equivalent is a file/Kafka stream of turns processed in
micro-batches:

- ``encode_stream`` / ``route_stream``: foreachBatch runs the SAME batch
  encode+route code per micro-batch — dictionaries grow incrementally
  across batches exactly like resumed batch epochs (CLP's dictionaries
  are append-only across an archive's lifetime too). The stream
  checkpoint + the idempotent dynamic-overwrite sinks give end-to-end
  exactly-once per sink partition.
- ``count_by_time_stream``: CLP's count-by-time bucketing
  (clp/clo/OutputHandler.hpp:269-271) as a watermarked tumbling window —
  late turns beyond the watermark are dropped, matching the reducer's
  upsert-then-finalize behavior.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from clp_core_spark.operators import dictionaries, encode_pipeline, enrich, route
from clp_core_spark.sources import transcripts


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript turns (parquet directory that
    producers append files to)."""
    reader = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def count_by_time_stream(
    stream: DataFrame,
    bucket: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window count (append-mode safe)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), bucket).alias("bucket"))
        .agg(F.count("*").alias("count"))
        .select(
            F.col("bucket.start").alias("bucket_start"),
            F.col("bucket.end").alias("bucket_end"),
            "count",
        )
    )


class StreamingEncoder:
    """foreachBatch handler: encode + enrich + route each micro-batch,
    growing the dictionaries across batches (epoch = micro-batch)."""

    def __init__(self, spark: SparkSession, work_root: str, partitions: int = 8):
        self.spark = spark
        self.work_root = work_root
        self.partitions = partitions
        self.dicts_path = f"{work_root}/dicts"
        self.sinks_root = f"{work_root}/sinks"

    def _load_dict(self, name: str) -> DataFrame | None:
        from clp_core_spark.plans import dictstore

        return dictstore.load_dict(self.spark, self.dicts_path, name)

    def _save_dict(self, name: str, df: DataFrame) -> None:
        from clp_core_spark.plans import dictstore

        dictstore.save_dict(self.dicts_path, name, df)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encoded, lt_dict, var_dict = encode_pipeline.encode(
            batch_df,
            key_cols=["conv_id", "turn_idx"],
            existing_logtype_dict=self._load_dict("logtype"),
            existing_var_dict=self._load_dict("var"),
        )
        enriched = enrich.enrich(
            encoded, transcripts.role_dim(self.spark), transcripts.tool_dim(self.spark)
        )
        enriched = route.with_logtype_class(
            enriched.join(F.broadcast(lt_dict), "logtype_id")
        ).drop("logtype")
        enriched = enriched.withColumn("batch_id", F.lit(batch_id))
        out = enriched.withColumn("role", F.coalesce(F.col("role"), F.lit("__null__")))
        (
            route.salted(out, self.partitions, "role")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("batch_id", "role")
            .parquet(f"{self.sinks_root}/by_role")
        )
        self._save_dict("logtype", lt_dict)
        self._save_dict("var", var_dict)


def route_stream(
    spark: SparkSession,
    stream: DataFrame,
    work_root: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the encode+route stream; checkpoint under work_root."""
    encoder = StreamingEncoder(spark, work_root)
    writer = (
        stream.writeStream.foreachBatch(encoder.process_batch)
        .option("checkpointLocation", f"{work_root}/checkpoint")
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
