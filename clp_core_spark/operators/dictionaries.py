"""Logtype / variable dictionary construction.

CLP's dictionaries assign sequential insertion-order IDs with exact-string
dedup (clp/VariableDictionaryWriter.cpp:7-37, clp/DictionaryWriter.hpp:105-106).
Insertion order is meaningless in a distributed engine, so we keep the two
properties the rest of the system relies on — *dense* IDs starting at 0 and
*deterministic* string->ID mapping for a given corpus — by ordering
lexicographically. Incremental builds (checkpoint resume) append new
entries at max_id+1, mirroring the writer's monotone ID counter.

ID assignment is fully parallel (no single-partition window): strings are
hash-bucketed, per-bucket counts produce bucket offsets on the driver
(#buckets is small), and a per-bucket window assigns within-bucket ranks.
Scales to variable dictionaries far larger than driver memory.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_ID_BUCKETS = 64


def assign_dense_ids(
    values: DataFrame,
    value_col: str,
    id_col: str,
    start_id: int = 0,
    num_buckets: int = DEFAULT_ID_BUCKETS,
) -> DataFrame:
    """Assign deterministic dense IDs ``start_id..start_id+n-1`` to the
    distinct values of ``value_col``.

    Global ID order is (hash-bucket, value) — deterministic and dense but
    not globally lexicographic, which is all CLP's semantics require
    (IDs are opaque handles; only dedup + stability matter).
    """
    distinct = values.select(F.col(value_col)).where(F.col(value_col).isNotNull()).distinct()
    bucketed = distinct.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_buckets)).cast("int")
    )
    counts = {
        r["_bucket"]: r["cnt"]
        for r in bucketed.groupBy("_bucket").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, start_id
    for b in range(num_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offset_map = F.create_map(
        *[x for b in range(num_buckets) for x in (F.lit(b), F.lit(offsets[b]))]
    )
    w = Window.partitionBy("_bucket").orderBy(value_col)
    return (
        bucketed.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn(id_col, (offset_map[F.col("_bucket")] + F.col("_rn")).cast("long"))
        .select(value_col, id_col)
    )


def build_logtype_dict(
    parsed: DataFrame,
    existing: DataFrame | None = None,
    logtype_col: str = "logtype",
) -> DataFrame:
    """``DataFrame[logtype: string, logtype_id: long]``.

    With ``existing`` (a prior epoch's dictionary), only unseen logtypes get
    new IDs at max_id+1 — deterministic across resumed runs (SURVEY §7
    "hard parts"; mirrors clp/VariableDictionaryWriter.cpp:16-23).
    """
    if existing is None:
        return assign_dense_ids(parsed, logtype_col, "logtype_id")
    new = parsed.select(logtype_col).distinct().join(existing, logtype_col, "left_anti")
    start = (existing.agg(F.max("logtype_id")).collect()[0][0] or -1) + 1
    return existing.unionByName(assign_dense_ids(new, logtype_col, "logtype_id", start_id=start))


def build_var_dict_hash(
    parsed: DataFrame,
    existing: DataFrame | None = None,
    dict_strs_col: str = "dict_strs",
) -> DataFrame:
    """``DataFrame[var_str, var_id=xxhash64(var_str)]`` — the scale path:
    IDs are content hashes, so rows can compute their own IDs inline (no
    resolve join) and epochs merge by plain distinct-union. 64-bit
    collision odds at 10^9 entries ~ 3e-2; at CLP-typical dictionary
    sizes (millions) they are negligible, and a collision would surface
    in the decode-equality gate."""
    vals = (
        parsed.select(F.explode(dict_strs_col).alias("var_str"))
        .where(F.col("var_str").isNotNull())
        .distinct()
        .withColumn("var_id", F.xxhash64("var_str"))
    )
    if existing is None:
        return vals
    return existing.unionByName(
        vals.join(existing, "var_str", "left_anti")
    )


def build_var_dict(
    parsed: DataFrame,
    existing: DataFrame | None = None,
    dict_strs_col: str = "dict_strs",
) -> DataFrame:
    """``DataFrame[var_str: string, var_id: long]`` over all dictionary
    variables appearing in ``parsed[dict_strs_col]`` (array<string>)."""
    vals = parsed.select(F.explode(dict_strs_col).alias("var_str"))
    if existing is None:
        return assign_dense_ids(vals, "var_str", "var_id")
    new = vals.select("var_str").distinct().join(existing, "var_str", "left_anti")
    start = (existing.agg(F.max("var_id")).collect()[0][0] or -1) + 1
    return existing.unionByName(assign_dense_ids(new, "var_str", "var_id", start_id=start))
