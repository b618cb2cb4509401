"""End-to-end encode->decode equality — the reference's golden roundtrip
gate (components/core/tests/test-clp_s-end_to_end.cpp:98-140): compress,
extract, byte-compare under stable (conv_id, turn_idx) ordering."""

import pyspark.sql.functions as F

from clp_core_spark.operators import encode_pipeline

KEYS = ["conv_id", "turn_idx"]


def test_encode_decode_roundtrip(spark, transcripts):
    encoded, logtype_dict, var_dict = encode_pipeline.encode(
        transcripts, key_cols=KEYS, keep_text=True
    )
    decoded = encode_pipeline.decode(encoded, logtype_dict, var_dict, key_cols=KEYS)
    mismatches = decoded.where(~F.col("decoded_text").eqNullSafe(F.col("text")))
    rows = mismatches.select(*KEYS, "text", "decoded_text").limit(5).collect()
    assert rows == [], f"roundtrip mismatches: {rows}"
    assert decoded.count() == transcripts.count()


def test_dictionary_consistency(spark, transcripts):
    encoded, logtype_dict, var_dict = encode_pipeline.encode(transcripts, key_cols=KEYS)
    lt = logtype_dict.collect()
    n = len(lt)
    ids = sorted(r["logtype_id"] for r in lt)
    assert ids == list(range(n)), "logtype IDs must be dense from 0"
    assert len({r["logtype"] for r in lt}) == n, "logtypes must be unique"

    vd = var_dict.collect()
    vids = [r["var_id"] for r in vd]
    assert len(set(vids)) == len(vd), "var IDs must be unique"
    assert len({r["var_str"] for r in vd}) == len(vd)

    # dense mode keeps CLP's sequential-ID storage property
    _, _, vd_dense = encode_pipeline.encode(
        transcripts, key_cols=KEYS, var_id_mode="dense"
    )
    dense_ids = sorted(r["var_id"] for r in vd_dense.collect())
    assert dense_ids == list(range(len(dense_ids))), "dense var IDs from 0"


def test_dictionary_determinism_across_parallelism(spark, transcripts):
    from clp_core_spark.operators import dictionaries

    parsed = encode_pipeline.parse(transcripts).persist()
    d1 = {r["logtype"]: r["logtype_id"]
          for r in dictionaries.build_logtype_dict(parsed).collect()}
    d2 = {r["logtype"]: r["logtype_id"]
          for r in dictionaries.build_logtype_dict(parsed.repartition(17)).collect()}
    assert d1 == d2, "dictionary IDs must not depend on partitioning"


def test_incremental_dictionary_ids_are_stable(spark, transcripts):
    from clp_core_spark.operators import dictionaries

    parsed = encode_pipeline.parse(transcripts).persist()
    half1 = parsed.where(F.col("turn_idx") % 2 == 0)
    half2 = parsed.where(F.col("turn_idx") % 2 == 1)
    d1 = dictionaries.build_var_dict(half1)
    d12 = dictionaries.build_var_dict(half2, existing=d1)
    m1 = {r["var_str"]: r["var_id"] for r in d1.collect()}
    m12 = {r["var_str"]: r["var_id"] for r in d12.collect()}
    for k, v in m1.items():
        assert m12[k] == v, "existing entries must keep their IDs on resume"
    ids = sorted(m12.values())
    assert ids == list(range(len(ids))), "incremental IDs stay dense"
