"""Parse -> encode stage: text -> (logtype_id, encoded_vars[], var_types[]).

Spark-first layout of CLP's ``Archive::write_msg`` path
(clp/streaming_archive/writer/Archive.cpp:299-316 +
clp/EncodedVariableInterpreter.cpp:206-225):

1. A vectorized Arrow pandas UDF (tokenizer.tokenize_frame) extracts the
   logtype template + typed variables per turn.
2. The logtype dictionary is built by distributed distinct + dense-ID
   assignment and broadcast back (CLP's premise: templates << data).
3. Dictionary variables are resolved to IDs either by broadcasting the
   var dict into the Arrow batch (small dicts — no shuffle) or by
   explode -> shuffle join -> regroup (dicts beyond driver/executor
   memory). Auto-selected by dict size, like AQE picks join strategies.

The encoded row keeps CLP's exact representation: ``encoded_vars[i]`` is
the int value, the 64-bit float packing, or the var-dict ID, disambiguated
by the placeholder sequence in the logtype (equivalently ``var_types``).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clp_core_spark.functions.tokenizer import VT_DICT
from clp_core_spark.operators import dictionaries

PARSED_SCHEMA = StructType(
    [
        StructField("logtype", StringType()),
        StructField("var_strs", ArrayType(StringType())),
        StructField("var_types", ArrayType(IntegerType())),
        StructField("encoded", ArrayType(LongType())),
        StructField("dict_strs", ArrayType(StringType())),
    ]
)

# Slim variant: no var_strs (the encode path never reads it; skipping it
# cuts the per-row Arrow payload roughly in half for var-heavy text).
PARSED_SCHEMA_SLIM = StructType(
    [f for f in PARSED_SCHEMA.fields if f.name != "var_strs"]
)

# Above this many distinct dictionary variables, resolve IDs via shuffle
# join instead of broadcasting the dict into the Arrow batches. The
# broadcast path costs one driver collect + a per-Python-worker pickle
# load, so it anti-scales with executor count for large dicts — keep it
# for genuinely small dictionaries only.
BROADCAST_VAR_DICT_MAX = 200_000

# Middle tier for the join-based resolve: up to this many entries the dict
# rides a JVM-side broadcast hash join (~tens of MB serialized), so the
# exploded corpus-vars relation never shuffles — the shuffle-everything
# path is only for dictionaries too big to broadcast at all.
BROADCAST_JOIN_DICT_MAX = 5_000_000

# One-shot decodes of a dictionary NOT already broadcast-cached take the
# join path above this size — collecting+pickling a big map that will
# never be reused costs more than the join (see decode()).
UNCACHED_BROADCAST_MAX = 25_000


@pandas_udf(PARSED_SCHEMA)
def _parse_udf(texts: pd.Series) -> pd.DataFrame:
    from clp_core_spark.functions.tokenizer import tokenize_frame

    # tokenize_frame emits plain-Python lists (ndarray.tolist), which Arrow
    # ingests directly — no per-row conversion needed here.
    return tokenize_frame(texts)


@pandas_udf(PARSED_SCHEMA_SLIM)
def _parse_slim_udf(texts: pd.Series) -> pd.DataFrame:
    from clp_core_spark.functions.tokenizer import tokenize_frame

    return tokenize_frame(texts, include_var_strs=False)


def parse(
    df: DataFrame,
    text_col: str = "text",
    slim: bool = False,
    schema_spec=None,
) -> DataFrame:
    """Append parsed columns (logtype, [var_strs,] var_types, encoded,
    dict_strs) to ``df``. ``slim=True`` omits var_strs (encode hot path).

    ``schema_spec`` (a functions.schema_tokenizer.SchemaSpec) switches to
    the user-schema tokenizer — CLP's schema-file / log-surgeon alternative
    parse path (clp/clp/FileCompressor.cpp:196-228), same output shape."""
    if schema_spec is not None:
        out_schema = PARSED_SCHEMA_SLIM if slim else PARSED_SCHEMA

        @pandas_udf(out_schema)
        def _schema_udf(texts: pd.Series) -> pd.DataFrame:
            from clp_core_spark.functions.schema_tokenizer import (
                tokenize_frame_schema,
            )

            return tokenize_frame_schema(
                texts, schema_spec, include_var_strs=not slim
            )

        udf = _schema_udf
    elif slim:
        # mapInArrow fast path: the parsed list columns are emitted as
        # Arrow ListArrays built directly from the kernel's flat numpy
        # outputs (offsets via bincount) — no per-row Python lists, no
        # pandas->Arrow reconversion walking them. That conversion cost
        # more than the tokenizer kernel itself at bench scale (guide
        # §4.2: keep batch work in native code end to end).
        import pyarrow as pa

        full_schema = StructType(
            df.schema.fields + list(PARSED_SCHEMA_SLIM.fields)
        )
        names = [f.name for f in full_schema.fields]
        ti = df.columns.index(text_col)

        def _parse_batches(batches):
            from clp_core_spark.functions.tokenizer import (
                tokenize_arrow_arrays,
            )

            for batch in batches:
                extra = tokenize_arrow_arrays(batch.column(ti))
                yield pa.RecordBatch.from_arrays(
                    list(batch.columns) + extra, names=names
                )

        return df.mapInArrow(_parse_batches, full_schema)
    else:
        udf = _parse_udf
    parsed = df.withColumn("_parsed", udf(F.col(text_col)))
    return parsed.select("*", "_parsed.*").drop("_parsed")


def resolve_dict_ids(
    parsed: DataFrame,
    var_dict: DataFrame,
    key_cols: list[str],
    broadcast_threshold: int = BROADCAST_VAR_DICT_MAX,
    var_dict_count: int | None = None,
) -> DataFrame:
    """Replace each dict-var slot of ``encoded`` (which holds the row-local
    dict ordinal after parse) with the global var-dict ID.

    Returns ``parsed`` with ``encoded`` finalized and a ``dict_ids``
    array column (the row's var-dict IDs in order of appearance).
    """
    if var_dict_count is None:
        var_dict_count = var_dict.count()

    if var_dict_count <= broadcast_threshold:
        # Broadcast strategy: ship {var_str -> id} into the Arrow batches;
        # a single vectorized pd.Series.map per batch, zero shuffle.
        spark = parsed.sparkSession
        mapping = {r["var_str"]: r["var_id"] for r in var_dict.collect()}
        bc = spark.sparkContext.broadcast(mapping)

        @pandas_udf(ArrayType(LongType()))
        def _lookup(dict_strs: pd.Series) -> pd.Series:
            import numpy as np

            m = bc.value
            idx = dict_strs.index
            counts = np.fromiter(
                (len(x) if x is not None else 0 for x in dict_strs),
                dtype=np.int64, count=len(dict_strs),
            )
            flat = pd.Series(
                [s for x in dict_strs if x is not None for s in x], dtype=object
            )
            ids = flat.map(m).to_numpy(dtype=object)
            bounds = np.cumsum(counts)[:-1]
            chunks = np.split(ids, bounds)
            return pd.Series([c.tolist() for c in chunks], index=idx, dtype=object)

        resolved = parsed.withColumn("dict_ids", _lookup(F.col("dict_strs")))
    else:
        # Join strategy: explode dict vars with position, equi-join the
        # dict table on the string, regroup ordered by position. Up to
        # BROADCAST_JOIN_DICT_MAX entries the dict side is broadcast
        # (JVM-side, no Python pickling) so the huge exploded relation
        # never shuffles for the join; only the regroup shuffles, on keys.
        ex = parsed.select(
            *key_cols, F.posexplode("dict_strs").alias("_pos", "var_str")
        )
        dict_side = (
            F.broadcast(var_dict)
            if var_dict_count <= BROADCAST_JOIN_DICT_MAX
            else var_dict
        )
        joined = ex.join(dict_side, "var_str", "left")
        regrouped = joined.groupBy(*key_cols).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "var_id"))),
                lambda s: s["var_id"],
            ).alias("dict_ids")
        )
        resolved = parsed.join(regrouped, key_cols, "left").withColumn(
            "dict_ids", F.coalesce("dict_ids", F.array().cast("array<long>"))
        )

    # Merge: dict slots in `encoded` hold the row-local ordinal; swap in the
    # global ID. zip_with stays entirely in the JVM.
    merged = resolved.withColumn(
        "encoded_vars",
        F.zip_with(
            "encoded",
            "var_types",
            lambda v, t: F.when(
                t == F.lit(VT_DICT), F.element_at("dict_ids", (v + 1).cast("int"))
            ).otherwise(v),
        ),
    )
    return merged.drop("encoded")


def encode(
    df: DataFrame,
    key_cols: list[str],
    text_col: str = "text",
    existing_logtype_dict: DataFrame | None = None,
    existing_var_dict: DataFrame | None = None,
    keep_text: bool = False,
    var_id_mode: str = "hash",
    schema_spec=None,
    pre_parsed: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full parse->encode. Returns (encoded_df, logtype_dict, var_dict).

    ``pre_parsed``: a DataFrame that already carries the slim parse
    columns (logtype, var_types, encoded, dict_strs) — e.g. a persisted
    ``parse(df, slim=True)`` shared across sub-epochs — skips the parse
    stage entirely so the corpus is tokenized exactly once per partition.

    ``encoded_df`` columns: key_cols + passthrough + logtype_id,
    encoded_vars (array<long>), var_types (array<int>), n_vars.

    var_id_mode:
    - ``"hash"`` (default, the 100 TB path): a dict var's ID is
      ``xxhash64(var_str)``, computed inline in the row — zero shuffle,
      zero broadcast, trivially stable across epochs/executors. The var
      dictionary table is still built (distinct var_str + id) for search
      probes and decode joins. CLP's IDs are opaque handles; only the
      deterministic 1:1 string<->ID mapping matters for semantics.
    - ``"dense"``: CLP-exact dense sequential IDs
      (clp/VariableDictionaryWriter.cpp:16-23 analog) via
      dictionaries.assign_dense_ids + broadcast/shuffle resolve — the
      faithful-storage mode; costs a resolve join at scale.
    """
    if pre_parsed is not None:
        # caller owns the persist: typically a filter over a cached parent
        parsed = pre_parsed
    else:
        parsed = parse(df, text_col=text_col, slim=True, schema_spec=schema_spec)
        if not keep_text:
            # the raw text is never read again (decode reconstructs it);
            # dropping it BEFORE the persist cuts the cached working set
            # (~25% for short log lines) and the attendant GC churn
            parsed = parsed.drop(text_col)
        # Parse once, feed the dict builds and the encode join.
        parsed = parsed.persist()

    logtype_dict = dictionaries.build_logtype_dict(
        parsed, existing_logtype_dict
    ).persist()
    # Materialize the (tiny) logtype dict NOW: it is broadcast at least
    # twice downstream (the encode join + any logtype-class routing), and
    # concurrent broadcast builds in one job each re-ran the full
    # distinct+rank subtree over the parsed corpus before the cache had
    # materialized (REST stage audit: two 32-task/19-CPU-s stages for a
    # 24-row dictionary). One bounded count pins the cache first.
    logtype_dict.count()

    if var_id_mode == "hash":
        var_dict = dictionaries.build_var_dict_hash(parsed, existing_var_dict)
        with_ids = parsed.withColumn(
            "encoded_vars",
            F.zip_with(
                "encoded",
                "var_types",
                lambda v, t: F.when(
                    t == F.lit(VT_DICT),
                    F.xxhash64(F.element_at("dict_strs", (v + 1).cast("int"))),
                ).otherwise(v),
            ),
        ).drop("encoded")
    else:
        var_dict = dictionaries.build_var_dict(parsed, existing_var_dict).persist()
        with_ids = resolve_dict_ids(parsed, var_dict, key_cols)

    encoded = with_ids.join(F.broadcast(logtype_dict), "logtype")

    drop_cols = ["logtype", "var_strs", "dict_strs", "dict_ids"]
    if not keep_text:
        drop_cols.append(text_col)
    encoded = encoded.withColumn("n_vars", F.size("encoded_vars")).drop(
        *[c for c in drop_cols if c in with_ids.columns]
    )
    return encoded, logtype_dict, var_dict


def _var_dict_broadcast(var_dict: DataFrame):
    """Collect {var_id -> var_str} ONCE per var-dict DataFrame and cache
    the broadcast (plus the fused decode UDF bound to it) on the DataFrame
    object itself. CLP loads each archive's dictionaries into memory once
    and reuses them across every query (clp/DictionaryReader.hpp) — the
    per-decode-call collect+pickle of a 10^5-entry dict was pure repeated
    work (~0.5s/call on the bench corpus). DataFrames are immutable plans
    over deterministic dictionaries, so the cached mapping cannot go
    stale; lifetime is tied to the DF object."""
    cached = getattr(var_dict, "_clp_decode_bc", None)
    if cached is not None:
        return cached
    spark = var_dict.sparkSession
    mapping = {r["var_id"]: r["var_str"] for r in var_dict.collect()}
    bc = spark.sparkContext.broadcast(mapping)

    @pandas_udf(StringType())
    def _decode_map_udf(
        logtype: pd.Series, encoded_vars: pd.Series
    ) -> pd.Series:
        from clp_core_spark.functions.tokenizer import decode_frame_with_map

        return decode_frame_with_map(logtype, encoded_vars, bc.value).astype(
            str
        )

    var_dict._clp_decode_bc = (bc, _decode_map_udf)
    return var_dict._clp_decode_bc


def decode(
    encoded: DataFrame,
    logtype_dict: DataFrame,
    var_dict: DataFrame,
    key_cols: list[str],
    out_col: str = "decoded_text",
    broadcast_threshold: int = BROADCAST_VAR_DICT_MAX,
    var_dict_count: int | None = None,
    slim_to_needed: bool = False,
) -> DataFrame:
    """Inverse of :func:`encode` — reconstruct the original message
    (clp/EncodedVariableInterpreter.cpp:298-367). Used by the roundtrip
    equality gate and the decompress-to-text sink. Pass ``var_dict_count``
    when known to skip the strategy-selection count job.

    ``slim_to_needed``: when the rows to decode are a SMALL residue of
    the corpus (search's wildcard-verify stage) but the dictionary is
    big, first semi-join the dictionary down to the var IDs those rows
    actually reference — the residue references few distinct vars, so
    decode then takes the zero-shuffle broadcast-map path instead of
    shipping the full dictionary (a 1.16M-entry dict costs a ~25 MB
    broadcast + explode/regroup per query without this). Leave False
    for full-corpus decodes, where "needed" IS the whole dictionary and
    the slimming pass would just add work."""
    df = encoded.join(F.broadcast(logtype_dict), "logtype_id")

    var_count = var_dict.count() if var_dict_count is None else var_dict_count
    if slim_to_needed and var_count > broadcast_threshold:
        pairs = F.filter(
            F.arrays_zip("encoded_vars", "var_types"),
            lambda s: s["var_types"] == VT_DICT,
        )
        dict_ids = F.transform(pairs, lambda s: s["encoded_vars"])
        needed = df.select(F.explode(dict_ids).alias("var_id")).distinct()
        var_dict = var_dict.join(F.broadcast(needed), "var_id", "leftsemi")
        var_count = var_dict.count()
    # A dictionary worth collecting once: either its broadcast is already
    # cached on the DF (warm archive — reused across every query), or it
    # is small enough that the one-off collect is trivial. A LARGE dict
    # seen for the first time decodes through the JVM join path instead:
    # the collect + pickle-broadcast of a 10^5-entry map costs ~2x the
    # whole join-path decode when it cannot be amortized (measured 1.4s
    # vs 0.7s per 100k-row one-shot decode at sf0.1).
    has_bc = getattr(var_dict, "_clp_decode_bc", None) is not None
    if var_count <= broadcast_threshold and (
        has_bc or var_count <= UNCACHED_BROADCAST_MAX
    ):
        # Fused fast path: dictionary-ID resolution happens INSIDE the
        # decode kernel via the cached broadcast mapping — one Python
        # stage, no intermediate dict_strs arrays over the Arrow
        # boundary, no per-call dictionary collect (guide §4).
        _, decode_udf = _var_dict_broadcast(var_dict)
        return df.withColumn(
            out_col, decode_udf(F.col("logtype"), F.col("encoded_vars"))
        )

    # Resolve dict-var IDs back to strings, in order of appearance.
    pairs = F.filter(
        F.arrays_zip("encoded_vars", "var_types"), lambda s: s["var_types"] == VT_DICT
    )
    df = df.withColumn("_dict_ids", F.transform(pairs, lambda s: s["encoded_vars"]))
    ex = df.select(*key_cols, F.posexplode("_dict_ids").alias("_pos", "var_id"))
    dict_side = (
        F.broadcast(var_dict)
        if var_count <= BROADCAST_JOIN_DICT_MAX
        else var_dict
    )
    joined = ex.join(dict_side, "var_id", "left")
    regrouped = joined.groupBy(*key_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "var_str"))),
            lambda s: s["var_str"],
        ).alias("dict_strs")
    )
    df = df.join(regrouped, key_cols, "left").withColumn(
        "dict_strs", F.coalesce("dict_strs", F.array().cast("array<string>"))
    )

    @pandas_udf(StringType())
    def _decode_udf(logtype: pd.Series, encoded_vars: pd.Series, dict_strs: pd.Series) -> pd.Series:
        from clp_core_spark.functions.tokenizer import decode_frame

        return decode_frame(logtype, encoded_vars, dict_strs).astype(str)

    return df.withColumn(
        out_col, _decode_udf(F.col("logtype"), F.col("encoded_vars"), F.col("dict_strs"))
    ).drop("_dict_ids", "dict_strs")
