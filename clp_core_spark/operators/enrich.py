"""Broadcast lookup enrichment on role/tool dimensions.

CLP analog: tags attached to archives at ingest and filtered at schedule
time (job_orchestration/scheduler/compress/compression_scheduler.py:236-247,
query_scheduler.py:381-386). Here it is a pair of broadcast hash joins —
the dims are tiny, so no shuffle touches the fact table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def enrich(df: DataFrame, role_dim: DataFrame, tool_dim: DataFrame) -> DataFrame:
    """Left-join role/tool attributes; unmatched tools keep null attrs
    (the FIXTURES.md §2 probe row exercises this null path)."""
    out = df.join(F.broadcast(role_dim), "role", "left")
    out = out.join(F.broadcast(tool_dim), "tool", "left")
    return out
