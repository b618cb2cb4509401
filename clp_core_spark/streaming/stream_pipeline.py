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


SESSION_SCHEMA = (
    "conv_id string, session_start_ms long, session_end_ms long, n_turns long"
)
_SESSION_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def sessionize_stream(
    stream: DataFrame,
    gap_ms: int = 300_000,
    watermark: str = "10 minutes",
    key_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator: per-conversation SESSIONIZATION with
    ``applyInPandasWithState`` — the Spark-native shape for operators the
    built-in windowed aggs can't express (a session has a data-dependent
    extent: it closes when the NEXT turn is more than ``gap_ms`` away).

    State per conversation = the open session (start_ms, last_ms,
    n_turns), carried across micro-batches. Each batch builds
    gaps-and-islands over its own (sorted) turns, interval-merges the
    open session in, emits every closed interval and keeps the last one
    open; an event-time timeout at ``last_ms + gap_ms`` (clamped above
    the watermark) flushes the final open session once the watermark
    passes it, so sessions complete without waiting for more data on
    their key. Late rows inside the watermark merge correctly wherever
    they fall: a row within ``gap_ms`` BEFORE the open session's start
    pulls ``session_start_ms`` back (min), and rows more than ``gap_ms``
    earlier form their own (immediately emitted) earlier session —
    matching the batch gaps-and-islands oracle over the rows seen so
    far. The one approximation vs batch: an already-emitted earlier
    session cannot absorb still-later arrivals; rows beyond the
    watermark are dropped (same lateness contract as
    count_by_time_stream).

    Output (append mode): one row per CLOSED session —
    (conv_id, session_start_ms, session_end_ms, n_turns)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdfs, state: GroupState):
        import pandas as pd

        cols = ["conv_id", "session_start_ms", "session_end_ms", "n_turns"]
        sessions: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            sessions.append((key[0], start, last, n))
            state.remove()
        else:
            parts = [pdf for pdf in pdfs if len(pdf)]
            ts_sorted = (
                pd.concat(parts, ignore_index=True)["_ts_ms"]
                .sort_values()
                .astype("int64")
                .to_numpy()
                if parts
                else []
            )
            # gaps-and-islands over this batch's sorted rows, then
            # interval-merge the carried open session in — so a late row
            # can extend the open session BACKWARD (min start) and rows
            # more than gap_ms earlier become their own island instead
            # of being absorbed forward
            islands: list[tuple[int, int, int]] = []
            for t in ts_sorted:
                t = int(t)
                if islands and t - islands[-1][1] <= gap_ms:
                    s, last, n = islands[-1]
                    islands[-1] = (s, max(last, t), n + 1)
                else:
                    islands.append((t, t, 1))
            if state.exists:
                islands.append(tuple(state.get))
                islands.sort(key=lambda iv: iv[0])
                merged = [islands[0]]
                for s, last, n in islands[1:]:
                    ps, plast, pn = merged[-1]
                    if s - plast <= gap_ms:
                        merged[-1] = (ps, max(plast, last), pn + n)
                    else:
                        merged.append((s, last, n))
                islands = merged
            cur = islands[-1] if islands else None
            for s, last, n in islands[:-1]:
                sessions.append((key[0], s, last, n))
            if cur is not None:
                state.update(cur)
                # the flush alarm: must sit strictly above the current
                # watermark or Spark rejects it
                state.setTimeoutTimestamp(
                    max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(sessions, columns=cols)

    return (
        stream.withColumn(
            "_ts_ms", F.unix_millis(F.col(ts_col).cast("timestamp"))
        )
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            assemble,
            SESSION_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
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
