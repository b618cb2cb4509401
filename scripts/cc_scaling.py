"""Scale evidence for connected_components (alternating star rounds).

Two adversarial graph shapes at local[32]:

1. DEEP PATH — a single path component of N nodes (diameter N-1).
   Min-label propagation needs N-1 rounds (one shuffle per hop); the
   star rounds need O(log N). This is the shape that motivates the
   algorithm.
2. LSH-SHAPED — many small star/clique components plus singletons, the
   shape minhash/simhash pair generation actually emits. Both
   algorithms converge in a handful of rounds here; the comparison
   shows the star path costs nothing extra on the easy case.

Usage: python scripts/cc_scaling.py [path_n] [lsh_docs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from clp_core_spark.operators import dedup  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402


def main() -> None:
    path_n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    lsh_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    spark = get_spark("cc-scaling", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"path_n": path_n, "lsh_docs": lsh_docs}

    # 1. deep path: edges (i, i+1); component min = 0 for every node
    ids = spark.range(path_n - 1)
    path_pairs = ids.select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.time()
    labels = dedup.connected_components(path_pairs)
    n_wrong = labels.filter(F.col("label") != 0).count()
    out["path_star_sec"] = round(time.time() - t0, 1)
    out["path_star_wrong_labels"] = n_wrong

    # 2. LSH-shaped: cluster c has size 1 + (c % 4) members chained to a
    # canonical head; ~half of all docs appear in no pair at all
    docs = spark.range(lsh_docs).select(F.col("id").alias("doc_id"))
    mem = spark.range(lsh_docs).select(
        (F.col("id") - (F.col("id") % 8)).alias("head"),
        F.col("id").alias("m"),
        (F.col("id") % 8).alias("slot"),
    )
    lsh_pairs = mem.filter(
        (F.col("slot") > 0) & (F.col("slot") <= (F.col("head") / 8 % 4))
    ).select(F.col("head").alias("id_a"), F.col("m").alias("id_b"))
    n_pairs = lsh_pairs.count()
    out["lsh_pairs"] = n_pairs

    t0 = time.time()
    star = dedup.near_dup_clusters(docs, lsh_pairs, algorithm="star")
    star_clusters = star.select("canonical_id").distinct().count()
    out["lsh_star_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    prop = dedup.near_dup_clusters(docs, lsh_pairs, algorithm="label")
    prop_clusters = prop.select("canonical_id").distinct().count()
    out["lsh_label_sec"] = round(time.time() - t0, 1)
    out["lsh_clusters_agree"] = star_clusters == prop_clusters
    out["lsh_clusters"] = star_clusters

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
