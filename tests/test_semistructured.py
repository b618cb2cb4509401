"""clp_s-lite semi-structured ingestion (operators/semistructured.py).

Mirrors the reference's JSON-type-inference and schema-dedup semantics:
clp_s/JsonParser.cpp:195-203 (space rule), clp_s/SchemaTree.hpp:27-40
(node types), clp_s/SchemaMap.cpp:8-15 (schema IDs).
"""

import pyspark.sql.functions as F

from clp_core_spark.operators import semistructured


def _corpus(spark):
    rows = [
        (0, '{"user": 7, "type": "error", "msg": "disk full on node 3"}'),
        (1, '{"user": 8, "type": "signup", "msg": "new account", "extra": true}'),
        (2, '{"user": 9, "type": "click", "msg": "btn a", "pi": 3.14}'),
        (3, '{"user": 10, "type": "view", "msg": "page b", "tags": [1, 2]}'),
        (4, '{"user": 11, "type": "error", "msg": "disk full on node 9"}'),
        (5, '{"nested": {"depth": 2}, "user": 12, "type": "x", "msg": "y z"}'),
    ]
    return spark.createDataFrame(rows, "event_id long, js string")


def test_schema_tree_types(spark):
    enc, tree, smap = semistructured.encode_semistructured(
        _corpus(spark), "js", key_cols=["event_id"]
    )
    types = {r["path"]: r["node_type"] for r in tree.collect()}
    assert types["user"] == "Integer"
    assert types["pi"] == "Float"
    assert types["extra"] == "Boolean"
    assert types["msg"] == "ClpString"  # contains spaces
    assert types["type"] == "VarString"  # never contains a space
    assert types["tags"] == "UnstructuredArray"
    assert types["nested.depth"] == "Integer"


def test_schema_map_dedup_and_ids(spark):
    enc, tree, smap = semistructured.encode_semistructured(
        _corpus(spark), "js", key_cols=["event_id"]
    )
    rows = smap.collect()
    # rows 0 and 4 share a schema; every other row is unique -> 5 schemas
    assert len(rows) == 5
    assert sum(r["n_records"] for r in rows) == 6
    ids = sorted(r["schema_id"] for r in rows)
    assert ids == [0, 1, 2, 3, 4]  # dense
    base = [r for r in rows if r["schema_key"] == "msg,type,user"][0]
    assert base["n_records"] == 2


def test_encoded_columns_and_typed_filter(spark):
    enc, tree, smap = semistructured.encode_semistructured(
        _corpus(spark), "js", key_cols=["event_id"]
    )
    hits = enc.filter((F.col("user") > 8) & (F.col("type") == "error"))
    assert [r["event_id"] for r in hits.collect()] == [4]
    # presence columns are null where the leaf is absent
    assert enc.filter(F.col("extra").isNull()).count() == 5
    # array leaf kept as JSON text
    tags = enc.filter(F.col("event_id") == 3).collect()[0]["tags"]
    assert tags == "[1,2]"


def test_schema_id_stable_across_runs(spark):
    df = _corpus(spark)
    a = semistructured.encode_semistructured(df, "js", key_cols=["event_id"])
    b = semistructured.encode_semistructured(df, "js", key_cols=["event_id"])
    ma = {r["schema_key"]: r["schema_id"] for r in a[2].collect()}
    mb = {r["schema_key"]: r["schema_id"] for r in b[2].collect()}
    assert ma == mb
