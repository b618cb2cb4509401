"""Multi-executor scaling evidence: the SAME job via ``spark-submit
--py-files`` on ``local-cluster[N,8,mem]`` at N and 4N EXECUTORS.

``local-cluster`` is Spark's bundled standalone-cluster simulator: each
executor is a real separate JVM with its own heap, GC, Python workers,
and block manager, and every shuffle/broadcast crosses process
boundaries through the shuffle service codepath — unlike ``local[k]``,
where "executors" are threads sharing one heap and shuffles are
in-process memory copies. It is therefore the closest in-sandbox analog
to the north rule's "N and 4N executors on a multi-executor cluster":
the 1->4 executor pair below scales real executor JVMs (8 cores each),
not threads.

What each leg runs (identical input, identical code, identical
partitioning): ``clp_core_spark.job`` — the resumable parse -> encode ->
enrich -> route pipeline with per-partition lineage — launched exactly
as a cluster user would:

    spark-submit --master local-cluster[N,8,M] \
        --py-files dist/clp_core_spark.zip job.py \
        --input <staged parquet> --work-root <fresh> \
        --num-partitions 4 --metrics-out leg.json

Throughput comes from the job's own metrics (the ledger's per-epoch
wall sum — epochs run sequentially, so the sum is the pipeline wall,
excluding JVM/executor startup, which a long-lived cluster amortizes
to zero). The harness also records end-to-end spark-submit wall and
per-leg loadavg so the JSON carries its own contention evidence.

Usage:
  python scripts/cluster_scaling.py [--low 1] [--high 4]
      [--cores 8] [--turns 16000000] [--exec-mem-mb 8192] [--repeat 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/clp_bench")


def _load() -> dict:
    la1, la5, la15 = os.getloadavg()
    return {"loadavg_1m": round(la1, 2), "loadavg_5m": round(la5, 2),
            "loadavg_15m": round(la15, 2)}


def stage(turns: int) -> str:
    """Generate the deterministic transcript corpus once (NOT timed)."""
    path = f"{WORK}/transcripts_cluster_{turns}"
    marker = f"{path}/_STAGED"
    if os.path.exists(marker):
        return path
    sys.path.insert(0, REPO)
    from clp_core_spark.session import get_spark
    from clp_core_spark.sources import transcripts

    spark = get_spark("stage-cluster-corpus", master="local[16]",
                      shuffle_partitions=32)
    df = transcripts.generate_transcripts(spark, num_turns=turns,
                                          partitions=64)
    df.write.mode("overwrite").parquet(path)
    spark.stop()
    open(marker, "w").close()
    return path


def build_zip() -> str:
    subprocess.run([sys.executable, "scripts/package_pyfiles.py"],
                   cwd=REPO, check=True, capture_output=True)
    return f"{REPO}/dist/clp_core_spark.zip"


def run_leg(n_exec: int, cores: int, mem_mb: int, input_path: str,
            zip_path: str, tag: str) -> dict:
    job_py = f"{REPO}/clp_core_spark/job.py"
    work_root = f"{WORK}/cluster_run_{tag}_{n_exec}x{cores}"
    subprocess.run(["rm", "-rf", work_root], check=True)
    metrics_out = f"{work_root}_metrics.json"
    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"  # rely on PATH
    cmd = [
        spark_submit,
        "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=8g",
        "--conf", f"spark.executor.memory={mem_mb // 1024}g",
        "--conf", "spark.sql.shuffle.partitions=32",
        job_py,
        "--input", input_path,
        "--work-root", work_root,
        "--num-partitions", "4",
        "--metrics-out", metrics_out,
    ]
    load0 = _load()
    t0 = time.monotonic()
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         cwd="/tmp")  # cwd OUTSIDE the repo: the zip must supply the package
    submit_wall = time.monotonic() - t0
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:])
        raise RuntimeError(f"leg {n_exec}x{cores} failed")
    m = json.loads(open(metrics_out).read())
    return {
        "executors": n_exec,
        "cores_per_executor": cores,
        "total_cores": n_exec * cores,
        "rows": m["rows"],
        "pipeline_wall_sec": m["wall_sec"],
        "turns_per_sec": m["turns_per_sec"],
        "spark_submit_wall_sec": round(submit_wall, 1),
        "load_start": load0,
        "load_end": _load(),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--turns", type=int, default=16_000_000)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    input_path = stage(args.turns)
    zip_path = build_zip()
    legs: list[dict] = []
    for r in range(args.repeat):
        for n in (args.low, args.high):
            leg = run_leg(n, args.cores, args.exec_mem_mb, input_path,
                          zip_path, tag=f"r{r}")
            print(json.dumps(leg), flush=True)
            legs.append(leg)

    lo = max((l for l in legs if l["executors"] == args.low),
             key=lambda l: l["turns_per_sec"])
    hi = max((l for l in legs if l["executors"] == args.high),
             key=lambda l: l["turns_per_sec"])
    ratio = hi["turns_per_sec"] / lo["turns_per_sec"]
    eff = ratio / (args.high / args.low)
    summary = {"pair": [lo, hi], "throughput_ratio": round(ratio, 2),
               "scaling_efficiency": round(eff, 3), "legs": legs}
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/cluster_scaling.json", "w") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps({"throughput_ratio": summary["throughput_ratio"],
                      "scaling_efficiency": summary["scaling_efficiency"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
