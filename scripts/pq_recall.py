"""PQ recall evidence (round-5 verdict, next-round #8): recall@k of
sim_pq_topk's ADC ranking vs exact brute-force cosine top-k on the shared
embeddings table, for BOTH codebook modes — the deterministic
(SQL-reproducible) codebooks the declared query uses, and data-trained
codebooks from pq_train. Writes BENCH/pq_recall.json.

Usage: python scripts/pq_recall.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=50)
    args = ap.parse_args()

    from clp_core_spark.operators import similarity
    from clp_core_spark.session import get_spark

    spark = get_spark("pq-recall", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    rows = e.orderBy("vec_id").limit(args.queries).collect()
    dim = len(rows[0]["embedding"])
    trained = similarity.pq_train(e, dim=dim)

    out = {
        "sf_dir": args.sf_dir, "k": args.k, "n_queries": len(rows),
        "dim": dim,
    }
    for mode, books in (("deterministic", None), ("trained", trained)):
        hits = 0
        total = 0
        for r in rows:
            q = [float(x) for x in r["embedding"]]
            exact = {
                x["vec_id"]
                for x in similarity.brute_force_topk(e, q, k=args.k).collect()
            }
            approx = {
                x["vec_id"]
                for x in similarity.pq_topk(
                    e, q, k=args.k, books=books
                ).collect()
            }
            hits += len(exact & approx)
            total += len(exact)
        out[f"recall_at_{args.k}_{mode}"] = round(hits / total, 4)
        print(mode, out[f"recall_at_{args.k}_{mode}"], flush=True)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/pq_recall.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
