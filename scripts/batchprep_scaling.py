"""Two-parallelism scaling + determinism evidence for the
batch-construction family (operators/sampling.py, operators/packing.py).

Beyond throughput at N vs 4N cores (the sandbox form of the north
rule's two-cluster-size criterion), this also checks the family's
distinguishing CLAIM — that split assignment, sample membership, and
sequence packing are identical regardless of parallelism — by
comparing an order-insensitive xor-of-hashes checksum of each leg's
full output across the two core counts. df.sample/randomSplit fail
exactly this check.

The corpus is synthesized deterministically, entirely JVM-side: lang
and n_tokens derive from xxhash64(doc_id). No text column — these
operators route ids; text never moves (packing.py module doc).

Usage:
  python scripts/batchprep_scaling.py [--docs 2000000] [--low 8] [--high 32]

Writes BENCH/batchprep_scaling_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/batchprep_scaling_docs.parquet"
SEQ_LEN = 2048
LANG_MIX = {"en": 1.0, "de": 0.6, "es": 0.6, "fr": 0.6, "zh": 0.3}


def synth_docs(spark, n_docs: int):
    import pyspark.sql.functions as F

    langs = F.array(*[F.lit(x) for x in ("en", "de", "es", "fr", "zh")])
    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    return df.select(
        "doc_id",
        F.element_at(langs, (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(5)) + 1).cast("int")).alias("lang"),
        (F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(896)) + 5).alias("n_tokens"),
    )


def leg_main() -> None:
    cpus = int(os.environ["BATCHPREP_CPUS"])
    sys.path.insert(0, REPO)
    import pyspark.sql.functions as F

    from clp_core_spark.operators import packing, sampling
    from clp_core_spark.session import get_spark

    spark = get_spark(
        app_name=f"batchprep-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    docs = spark.read.parquet(CORPUS)
    n_docs = docs.count()
    res = {"cpus": cpus, "n_docs": n_docs}

    t0 = time.time()
    mixed = sampling.stratified_sample(docs, "doc_id", LANG_MIX, strata_col="lang")
    split = sampling.split_assign(mixed, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    row = split.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, split))").alias("chk"),
    ).collect()[0]
    res["split_sample_sec"] = round(time.time() - t0, 3)
    res["split_sample_rows"] = row["n"]
    res["split_sample_checksum"] = row["chk"]

    t0 = time.time()
    packed = packing.pack_sequences(
        docs, "doc_id", "n_tokens", SEQ_LEN, num_groups=max(256, n_docs // 2000)
    )
    prow = packed.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, seq_id))").alias("chk"),
        F.countDistinct("seq_id").alias("n_seqs"),
        (F.sum(F.when(~F.col("overlong"), F.col("n_tokens")).otherwise(F.lit(0)))
         / (F.countDistinct("seq_id") * F.lit(SEQ_LEN))).alias("fill"),
    ).collect()[0]
    res["pack_sec"] = round(time.time() - t0, 3)
    res["pack_rows"] = prow["n"]
    res["pack_checksum"] = prow["chk"]
    res["pack_n_sequences"] = prow["n_seqs"]
    res["pack_fill_ratio"] = round(float(prow["fill"]), 4)
    res["docs_per_sec_split"] = round(n_docs / res["split_sample_sec"], 1)
    res["docs_per_sec_pack"] = round(n_docs / res["pack_sec"], 1)
    res["loadavg"] = list(os.getloadavg())
    spark.stop()
    print("LEG_JSON " + json.dumps(res))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    if not os.path.exists(CORPUS):
        sys.path.insert(0, REPO)
        from clp_core_spark.session import get_spark

        spark = get_spark(
            app_name="batchprep-scaling-stage", master="local[32]",
            shuffle_partitions=32,
            extra_conf={"spark.driver.memory": "32g",
                        "spark.ui.showConsoleProgress": "false"},
        )
        synth_docs(spark, args.docs).repartition(64).write.parquet(CORPUS)
        spark.stop()

    raw = []
    for cpus in (args.low, args.high) * args.repeats:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg"],
            env=dict(os.environ, BATCHPREP_CPUS=str(cpus)),
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("LEG_JSON ")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise SystemExit(f"leg cpus={cpus} produced no result")
        raw.append(json.loads(line[-1][len("LEG_JSON "):]))
        print("leg:", json.dumps(raw[-1]), flush=True)

    # determinism across parallelism: every leg must agree exactly
    for field in ("split_sample_checksum", "split_sample_rows",
                  "pack_checksum", "pack_rows", "pack_n_sequences"):
        vals = {r[field] for r in raw}
        if len(vals) != 1:
            raise SystemExit(f"NON-DETERMINISTIC {field}: {vals}")

    legs = []
    for cpus in (args.low, args.high):
        mine = [r for r in raw if r["cpus"] == cpus]
        best = dict(mine[0])
        for op in ("split_sample", "pack"):
            best[f"{op}_sec"] = min(r[f"{op}_sec"] for r in mine)
            best[f"{op}_sec_all"] = [r[f"{op}_sec"] for r in mine]
        best["docs_per_sec_split"] = round(best["n_docs"] / best["split_sample_sec"], 1)
        best["docs_per_sec_pack"] = round(best["n_docs"] / best["pack_sec"], 1)
        legs.append(best)

    lo, hi = legs
    factor = hi["cpus"] / lo["cpus"]
    summary = {
        "legs": legs,
        "outputs_identical_across_parallelism": True,
        "scaling_efficiency_split_sample": round(
            (lo["split_sample_sec"] / hi["split_sample_sec"]) / factor, 3),
        "scaling_efficiency_pack": round(
            (lo["pack_sec"] / hi["pack_sec"]) / factor, 3),
    }
    path = os.path.join(REPO, "BENCH", "batchprep_scaling_r5.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    if "--leg" in sys.argv:
        leg_main()
    else:
        main()
