"""Extra benchmarks / profiling for the optimization rounds (guide §1).

NOT part of the frozen bench contract — bench.py is the driver's metric.
This harness isolates, per declared query:
  * build_s  — driver-side DataFrame construction (query compile: dict
    probes, collects, LUT builds) which bench.py's timed window includes
  * exec_s   — the .count() over the built DataFrame (noop-style: count
    on the final df, matching bench.py's methodology)
and writes .explain("formatted") for each query to plans/r06/.

Usage:
  python bench_extra.py [--queries q1,q2] [--plans-dir plans/r06] \
      [--tag before] [--reps 3]
Writes JSON to BENCH/extra_<tag>.json and plans to
plans/r06/<query>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clp_core_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans-dir", default="plans/r06")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "clp-bench-extra",
        shuffle_partitions=max(int(cpus), 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "400k",
            "spark.sql.files.openCostInBytes": "0",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    t0 = time.time()
    entry.warm_archives(spark, sf_dir)
    warm_s = time.time() - t0

    qs = entry.queries()
    picks = [q for q in args.queries.split(",") if q] or list(qs)
    os.makedirs(args.plans_dir, exist_ok=True)

    out: dict = {"warm_archives_s": round(warm_s, 2), "queries": {}}
    for name in picks:
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        samples = []
        df = None
        for _ in range(args.reps):
            tb = time.time()
            df = qs[name](spark, sf_dir)
            build_s = time.time() - tb
            te = time.time()
            n = df.count()
            exec_s = time.time() - te
            samples.append(
                {"build_s": round(build_s, 3), "exec_s": round(exec_s, 3)}
            )
        rec = {
            "n": n,
            "samples": samples,
            "build_min": min(s["build_s"] for s in samples),
            "exec_min": min(s["exec_s"] for s in samples),
            "total_min": min(
                s["build_s"] + s["exec_s"] for s in samples
            ),
        }
        out["queries"][name] = rec
        if not args.skip_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        print(
            f"{name}: build {rec['build_min']:.3f}s exec {rec['exec_min']:.3f}s"
            f" n={n}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)

    os.makedirs("BENCH", exist_ok=True)
    with open(f"BENCH/extra_{args.tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
