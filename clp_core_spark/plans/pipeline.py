"""Resumable ingest pipeline: per-partition checkpointing, lineage, and
throughput metrics.

CLP splits work into archives — one compression task per archive
partition, tracked in a jobs DB
(job_orchestration/executor/compress/compression_task.py:208-360,
scheduler/compress/partition.py:99-138). Here the unit of work is a
deterministic hash bucket of ``conv_id`` ("epoch partition"): every turn
of a conversation lands in exactly one partition, partitions are
processed independently, and a parquet *ledger* table records one row per
completed partition.

Resume semantics:
- a partition is re-processed iff its ledger row is missing (crash before
  commit) — sink writes use dynamic partition overwrite keyed by the
  epoch partition, so re-running a partition is idempotent;
- dictionaries grow incrementally: new logtypes/vars get IDs at max+1
  (dictionaries.build_*_dict(existing=...)), mirroring the monotone ID
  counters of clp/VariableDictionaryWriter.cpp:16-23. Dictionary state is
  persisted per epoch under {work_root}/dicts.

Lineage per partition: input row count, per-sink routed counts, dict
deltas, wall time, turns/sec — CLP's archive metadata rows
(clp/streaming_archive/MetadataDB.cpp) as a queryable table.
"""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from clp_core_spark.operators import dictionaries, encode_pipeline, enrich, route
from clp_core_spark.sources import transcripts

LEDGER_SCHEMA = (
    "partition_id int, n_rows long, n_routed long, lt_dict_size long,"
    " var_dict_size long, wall_sec double, turns_per_sec double,"
    " input_min_ts timestamp, input_max_ts timestamp, finished_at double"
)


class IngestPipeline:
    def __init__(
        self,
        spark: SparkSession,
        work_root: str,
        num_partitions: int = 16,
        salt_buckets: int = 16,
        var_id_mode: str = "hash",
        write_glt: bool = False,
    ):
        """``var_id_mode='dense'`` + ``write_glt=True`` is the archival
        configuration: dense dictionary IDs and a logtype-clustered copy
        compress ~1.4x better at rest than the hash/row-ordered routing
        format (measured in BENCH/BASELINE.md §Storage ratio)."""
        self.spark = spark
        self.work_root = work_root
        self.num_partitions = num_partitions
        self.salt_buckets = salt_buckets
        self.var_id_mode = var_id_mode
        self.write_glt = write_glt
        self.ledger_path = f"{work_root}/ledger"
        self.dicts_path = f"{work_root}/dicts"
        self.sinks_root = f"{work_root}/sinks"
        self.glt_root = f"{work_root}/glt"

    # -- ledger ------------------------------------------------------------

    def ledger(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.ledger_path)
        except Exception:  # noqa: BLE001 — first run: empty ledger
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def done_partitions(self) -> set[int]:
        return {r["partition_id"] for r in self.ledger().select("partition_id").collect()}

    def _append_ledger(self, row: dict) -> None:
        self.spark.createDataFrame([row], LEDGER_SCHEMA).write.mode("append").parquet(
            self.ledger_path
        )

    # -- dictionaries ------------------------------------------------------

    def _load_dict(self, name: str) -> DataFrame | None:
        try:
            return self.spark.read.parquet(f"{self.dicts_path}/{name}")
        except Exception:  # noqa: BLE001
            return None

    def _save_dict(self, name: str, df: DataFrame) -> None:
        # Write-then-swap keeps the previous epoch readable on failure.
        tmp = f"{self.dicts_path}/{name}_next"
        df.write.mode("overwrite").parquet(tmp)
        final = f"{self.dicts_path}/{name}"
        import shutil

        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

    # -- the per-partition unit of work -------------------------------------

    def run(self, input_df: DataFrame, partitions: list[int] | None = None) -> DataFrame:
        """Process every not-yet-done partition of ``input_df``; return the
        ledger. Deterministic partitioning: pmod(xxhash64(conv_id), N)."""
        part_col = F.pmod(F.xxhash64("conv_id"), F.lit(self.num_partitions)).cast("int")
        df = input_df.withColumn("_epoch_part", part_col)

        todo = [
            p
            for p in (partitions if partitions is not None else range(self.num_partitions))
            if p not in self.done_partitions()
        ]
        for p in todo:
            self._run_partition(df.filter(F.col("_epoch_part") == p).drop("_epoch_part"), p)
        return self.ledger()

    def _run_partition(self, part_df: DataFrame, partition_id: int) -> None:
        t0 = time.time()
        lt_existing = self._load_dict("logtype")
        var_existing = self._load_dict("var")

        encoded, lt_dict, var_dict = encode_pipeline.encode(
            part_df,
            key_cols=["conv_id", "turn_idx"],
            existing_logtype_dict=lt_existing,
            existing_var_dict=var_existing,
            var_id_mode=self.var_id_mode,
        )
        enriched = enrich.enrich(
            encoded, transcripts.role_dim(self.spark), transcripts.tool_dim(self.spark)
        )
        enriched = route.with_logtype_class(
            enriched.join(F.broadcast(lt_dict), "logtype_id")
        ).drop("logtype")
        enriched = enriched.withColumn("epoch_part", F.lit(partition_id)).persist()

        stats = part_df.agg(
            F.count("*").alias("n"), F.min("ts").alias("mn"), F.max("ts").alias("mx")
        ).collect()[0]

        n_routed = 0
        for kind in route.SINK_KINDS:
            path = f"{self.sinks_root}/by_{kind}"
            out = enriched.withColumn(kind, F.coalesce(F.col(kind), F.lit("__null__")))
            (
                route.salted(out, self.spark.sparkContext.defaultParallelism, kind,
                             salt_buckets=self.salt_buckets)
                .sortWithinPartitions("conv_id", "turn_idx")
                .write.mode("overwrite")
                # epoch_part first: overwriting THIS partition's output is
                # idempotent under retries and never touches other epochs.
                .partitionBy("epoch_part", kind)
                .parquet(path)
            )
        n_routed = enriched.count() * len(route.SINK_KINDS)

        if self.write_glt:
            # archival copy: logtype-clustered for min/max file skipping
            # + maximal ratio (GLT layout; BENCH/BASELINE.md)
            route.write_glt_layout(
                enriched, f"{self.glt_root}/epoch_part={partition_id}",
                partitions=max(self.spark.sparkContext.defaultParallelism // 4, 1),
            )

        self._save_dict("logtype", lt_dict)
        self._save_dict("var", var_dict)
        lt_n = self._load_dict("logtype").count()
        var_n = self._load_dict("var").count()
        enriched.unpersist()

        wall = time.time() - t0
        self._append_ledger(
            {
                "partition_id": partition_id,
                "n_rows": stats["n"],
                "n_routed": n_routed,
                "lt_dict_size": lt_n,
                "var_dict_size": var_n,
                "wall_sec": round(wall, 3),
                "turns_per_sec": round(stats["n"] / wall, 1) if wall > 0 else 0.0,
                "input_min_ts": stats["mn"],
                "input_max_ts": stats["mx"],
                "finished_at": time.time(),
            }
        )

    # -- metrics -------------------------------------------------------------

    def metrics(self) -> dict:
        rows = self.ledger().collect()
        total_rows = sum(r["n_rows"] for r in rows)
        total_wall = sum(r["wall_sec"] for r in rows)
        return {
            "partitions_done": len(rows),
            "rows": total_rows,
            "wall_sec": round(total_wall, 3),
            "turns_per_sec": round(total_rows / total_wall, 1) if total_wall else 0.0,
        }

    def emit_metrics(self, path: str | None = None) -> str:
        blob = json.dumps(self.metrics())
        if path:
            with open(path, "w") as f:
                f.write(blob + "\n")
        return blob
