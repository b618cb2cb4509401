"""Crash-safe persisted-dictionary store shared by the batch and
streaming pipelines.

The swap protocol keeps a readable dictionary on disk at every instant
(the reference's analog is the jobs-DB transactional dictionary commit;
a lost dictionary would silently re-assign dense IDs that collide with
IDs already written to earlier epochs' sinks):

1. write the new version to ``<name>_next``
2. move the current version aside to ``<name>_old``
3. move ``<name>_next`` into place
4. drop ``<name>_old``

A crash between any two steps leaves either ``<name>`` or ``<name>_old``
intact; :func:`load_dict` falls back to ``_old``, which is exactly the
state consistent with the last committed ledger row (the new version's
partition never committed its ledger entry, so it re-runs).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def load_dict(spark: SparkSession, dicts_path: str, name: str) -> DataFrame | None:
    # the store is local-fs by contract (save_dict swaps with os.rename),
    # so probe existence first: resolving a missing path through
    # spark.read costs a full analysis pass and logs a WARN stack trace
    # (FileStreamSink.hasMetadata) on every first-epoch load
    for suffix in ("", "_old"):
        path = f"{dicts_path}/{name}{suffix}"
        if not os.path.exists(path):
            continue
        try:
            return spark.read.parquet(path)
        except Exception:  # noqa: BLE001 — racing swap; try the fallback
            continue
    return None


def save_dict(dicts_path: str, name: str, df: DataFrame) -> None:
    final = f"{dicts_path}/{name}"
    tmp = f"{final}_next"
    old = f"{final}_old"
    # df may read from `final` (incremental build); tmp is a different path
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(final):
        os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old, ignore_errors=True)
