"""Multi-executor scaling evidence for the CURATION job: the SAME
``clp_core_spark.curate_job`` run via ``spark-submit --py-files`` on
``local-cluster[N,C,mem]`` at N and 4N real executor JVMs — the
curation-family counterpart of scripts/cluster_scaling.py (which covers
the ingest pipeline). Same method: identical deterministic input staged
once, throughput from the job's own total_wall_sec (curate() + the
curated-corpus write, executor startup excluded — note this INCLUDES
the output write, unlike cluster_scaling.py's ingest ledger walls),
loadavg recorded per leg so the JSON carries its own contention
evidence.

The corpus is scripts/curation_scaling.py's deterministic JVM-side
synthesis (hash-derived tokens; planted exact clones every
``clone_every`` docs), so both legs — and any rerun — see byte-identical
input with a known duplicate structure.

Usage:
  python scripts/curate_cluster_scaling.py [--low 1] [--high 4]
      [--cores 1] [--docs 2000000] [--exec-mem-mb 8192]
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


def stage(docs: int) -> str:
    path = f"{WORK}/curate_cluster_docs_{docs}"
    marker = f"{path}/_STAGED"
    if os.path.exists(marker):
        return path
    sys.path.insert(0, REPO)
    sys.path.insert(0, f"{REPO}/scripts")
    from curation_scaling import synth_documents

    from clp_core_spark.session import get_spark

    spark = get_spark("stage-curate-corpus", master="local[16]",
                      shuffle_partitions=32)
    synth_documents(spark, docs, alphabetic=True).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    open(marker, "w").close()
    return path


def build_zip() -> str:
    subprocess.run([sys.executable, "scripts/package_pyfiles.py"],
                   cwd=REPO, check=True, capture_output=True)
    return f"{REPO}/dist/clp_core_spark.zip"


def run_leg(n_exec: int, cores: int, mem_mb: int, input_path: str,
            zip_path: str, tag: str) -> dict:
    job_py = f"{REPO}/clp_core_spark/curate_job.py"
    out_root = f"{WORK}/curate_cluster_{tag}_{n_exec}x{cores}"
    subprocess.run(["rm", "-rf", out_root], check=True)
    metrics_out = f"{out_root}_metrics.json"
    spark_submit = os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit")
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"
    cmd = [
        spark_submit,
        "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=8g",
        "--conf", f"spark.executor.memory={mem_mb}m",
        job_py,
        "--input", input_path,
        "--output", f"{out_root}/curated",
        "--seq-len", "2048",
        # the job's own flag, not --conf: get_spark() sets the session
        # default for this key, which would override a submit-time conf
        "--shuffle-partitions", "32",
        "--metrics-out", metrics_out,
    ]
    load0 = _load()
    t0 = time.monotonic()
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=5400,
                         cwd="/tmp")  # cwd OUTSIDE the repo: the zip must supply the package
    submit_wall = time.monotonic() - t0
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:])
        raise RuntimeError(f"leg {n_exec}x{cores} failed")
    m = json.loads(open(metrics_out).read())
    # total_wall_sec = curate() + output write inside the job (startup
    # excluded); the stage-ledger sum alone misses the output write
    if "total_wall_sec" in m:
        pipeline_wall = m["total_wall_sec"]
    else:  # pre-total_wall_sec metrics format
        pipeline_wall = sum(s["wall_sec"] for s in m["stages"])
    n_docs = m["stages"][0]["rows_in"]
    return {
        "executors": n_exec,
        "cores_per_executor": cores,
        "total_cores": n_exec * cores,
        "docs": n_docs,
        "stages": {s["stage"]: s["wall_sec"] for s in m["stages"]},
        "pipeline_wall_sec": round(pipeline_wall, 3),
        "docs_per_sec": round(n_docs / pipeline_wall, 1),
        "rows_out": m["stages"][-1]["rows_out"],
        "spark_submit_wall_sec": round(submit_wall, 1),
        "load_start": load0,
        "load_end": _load(),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--cores", type=int, default=1)
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    args = ap.parse_args()

    input_path = stage(args.docs)
    zip_path = build_zip()
    legs: list[dict] = []
    for n in (args.low, args.high):
        leg = run_leg(n, args.cores, args.exec_mem_mb, input_path,
                      zip_path, tag="r0")
        print(json.dumps(leg), flush=True)
        legs.append(leg)

    lo, hi = legs[0], legs[1]
    # per-row determinism across cluster sizes: the curated output size
    # must be identical at N and 4N executors
    if lo["rows_out"] != hi["rows_out"]:
        raise RuntimeError(
            f"cluster-size-dependent output: {lo['rows_out']} != {hi['rows_out']}"
        )
    ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = ratio / (args.high / args.low)
    summary = {"pair": [lo, hi], "throughput_ratio": round(ratio, 2),
               "scaling_efficiency": round(eff, 3)}
    with open(f"{REPO}/BENCH/curate_cluster_scaling.json", "w") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps({"throughput_ratio": summary["throughput_ratio"],
                      "scaling_efficiency": summary["scaling_efficiency"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
