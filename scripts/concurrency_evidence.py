"""Measure sequential vs concurrent epoch-partition ingest (dict_scope
='epoch', IngestPipeline.max_concurrent) on identical input.

Sequential epochs leave the cluster idle during each epoch's
driver-side phases (dictionary collects, ledger commits, sink commit
barriers); concurrency overlaps them. Prints one JSON line with both
walls and the speedup.

Usage: python scripts/concurrency_evidence.py [--turns 1000000]
       [--partitions 8] [--concurrent 4] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clp_core_spark.plans.pipeline import IngestPipeline  # noqa: E402
from clp_core_spark.session import get_spark  # noqa: E402
from clp_core_spark.sources import transcripts  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--concurrent", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark(
        "concurrency-evidence",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    staged = "/tmp/clp_conc/input"
    if not os.path.exists(staged + "/_SUCCESS"):
        transcripts.generate_transcripts(
            spark, num_turns=args.turns, partitions=64
        ).write.mode("overwrite").parquet(staged)
    df = spark.read.parquet(staged)
    n = df.count()

    walls = {}
    for label, conc in (("sequential", 1), (f"concurrent_{args.concurrent}", args.concurrent)):
        root = f"/tmp/clp_conc/work_{label}"
        shutil.rmtree(root, ignore_errors=True)
        pipe = IngestPipeline(
            spark, root, num_partitions=args.partitions,
            dict_scope="epoch", max_concurrent=conc,
        )
        t0 = time.time()
        pipe.run(df)
        walls[label] = round(time.time() - t0, 2)
        assert len(pipe.done_partitions()) == args.partitions

    seq = walls["sequential"]
    conc_wall = walls[f"concurrent_{args.concurrent}"]
    print(json.dumps({
        "turns": n,
        "partitions": args.partitions,
        "cpus": args.cpus,
        "sequential_sec": seq,
        "concurrent_sec": conc_wall,
        "speedup": round(seq / conc_wall, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
