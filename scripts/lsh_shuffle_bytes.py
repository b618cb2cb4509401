"""Shuffle-byte evidence for the MinHash-LSH banded-join slimming
(round 2): the banded relation now carries (id, band, bucket) only;
round 1 carried the full shingle array through the self-join 32x.

Runs both shapes on the sf documents corpus and reports total shuffle
write bytes per phase via the Spark REST API. Results recorded in
BENCH/BASELINE.md §MinHash-LSH shuffle.
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from clp_core_spark.operators import dedup  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
UI = "http://localhost:4040"


def total_shuffle_write() -> int:
    apps = json.load(urllib.request.urlopen(f"{UI}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{UI}/api/v1/applications/{app_id}/stages")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _banded(sig, bands: int, rows_per_band: int, keep_shingles: bool):
    cols = ["_id"] + (["_sh"] if keep_shingles else [])
    return sig.select(
        *cols,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("_sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )


def fat_pairs(df, threshold=0.5, bands=32, num_hashes=64):
    """The round-1 shape: shingles ride the banded self-join."""
    base = df.select(
        F.col("doc_id").alias("_id"),
        dedup.word_shingles(F.col("text"), 3).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    sig = base.withColumn("_sig", dedup.minhash_signature(F.col("_sh"), num_hashes))
    banded = _banded(sig, bands, num_hashes // bands, keep_shingles=True)
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"),
            F.col("l._sh").alias("sh_a"), F.col("r._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    v = cand.withColumn("jaccard_sim", dedup.jaccard(F.col("sh_a"), F.col("sh_b")))
    return v.filter(F.col("jaccard_sim") >= threshold).select("id_a", "id_b")


def main() -> None:
    spark = get_spark(
        "lsh-shuffle-bytes",
        extra_conf={
            "spark.ui.enabled": "true",
            # force the self-join through a real shuffle on both shapes so
            # the byte comparison is apples-to-apples (no broadcast)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    d.count()

    b0 = total_shuffle_write()
    n_fat = fat_pairs(d).count()
    b1 = total_shuffle_write()
    n_slim = dedup.minhash_lsh_pairs(d, threshold=0.5).count()
    b2 = total_shuffle_write()

    fat, slim = b1 - b0, b2 - b1
    print(json.dumps({
        "sf_dir": SF_DIR,
        "docs": d.count(),
        "pairs_fat": n_fat,
        "pairs_slim": n_slim,
        "shuffle_write_bytes_fat": fat,
        "shuffle_write_bytes_slim": slim,
        "reduction_x": round(fat / slim, 1) if slim else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
