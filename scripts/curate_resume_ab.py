"""Curation resume A/B (round-5 verdict, next-round #4): wall time of a
FRESH curate(checkpoint_root=) run vs a RESUME against the committed
checkpoint, on a corpus large enough that the near-dup stage dominates.
The resume leg re-runs the same call in a fresh Spark session; committed
decision tables (exact keep-set, near-dup keep-set, spans) load instead
of recomputing, which is exactly what a restarted 100 TB job does.
Writes BENCH/curate_resume.json.

Usage: python scripts/curate_resume_ab.py [--docs 250000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORK = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/clp_bench")


def run_leg(input_path: str, ckpt: str, label: str) -> dict:
    from clp_core_spark.plans.curation import curate
    from clp_core_spark.session import get_spark

    spark = get_spark(f"curate-resume-{label}", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(input_path)
    t0 = time.time()
    res = curate(
        df,
        quality_gate=True,
        exact=True,
        near_dup=True,
        excise_spans=True,
        splits={"train": 0.9, "val": 0.1},
        checkpoint_root=ckpt,
    )
    n = res.df.count()
    wall = time.time() - t0
    stages = [
        {
            "stage": s["stage"],
            "rows_out": s.get("rows_out"),
            "wall_sec": round(s.get("wall_sec", 0.0), 2),
        }
        for s in res.stages
    ]
    spark.stop()
    return {"label": label, "rows_out": n, "wall_sec": round(wall, 2),
            "resumed_stages": list(res.resumed), "stages": stages}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=250_000)
    args = ap.parse_args()

    from curation_scaling import synth_documents  # noqa: E402

    from clp_core_spark.session import get_spark

    path = f"{WORK}/curate_resume_docs_{args.docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        spark = get_spark("stage-curate-resume", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        synth_documents(spark, args.docs, alphabetic=True).repartition(
            64
        ).write.mode("overwrite").parquet(path)
        spark.stop()

    ckpt = f"{WORK}/curate_resume_ckpt_{args.docs}"
    shutil.rmtree(ckpt, ignore_errors=True)
    fresh = run_leg(path, ckpt, "fresh")
    resume = run_leg(path, ckpt, "resume")
    out = {
        "docs": args.docs,
        "fresh": fresh,
        "resume": resume,
        "resume_over_fresh": round(
            resume["wall_sec"] / fresh["wall_sec"], 3
        ),
        "identical_rows": fresh["rows_out"] == resume["rows_out"],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/curate_resume.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
