"""Two-parallelism scaling evidence for the corpus-curation family.

The north rule's two-cluster-size criterion is evidenced (as mandated
for this sandbox) by running the SAME job at two parallelism levels on
the SAME at-rest input. BENCH/scaling_r5.json covers the ingest
pipeline; this script covers the curation operators — duplicate_spans
(exact-substring dedup) and minhash_lsh_pairs — whose shuffle shapes
differ from ingest (window-hash groupBy + broadcast semi-join vs the
banded LSH self-join).

The corpus is synthesized DETERMINISTICALLY, entirely JVM-side (no
external data, no driver-side row loop): token j of document d is
'w' || (xxhash64(content_id, j) mod vocab). A 5000-word uniform vocab
makes random 8-gram collisions vanishingly rare, so the only duplicate
spans are the planted ones: every ``clone_every``-th doc clones its
predecessor verbatim, and every ``boiler_every``-th content id appends
a fixed 12-token boilerplate paragraph.

Usage:
  python scripts/curation_scaling.py [--docs 1000000] [--low 8] [--high 32]

Writes BENCH/curation_scaling_r5.json; paste the rendered table into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/curation_scaling_docs.parquet"

BOILER = " ".join(f"b{i}" for i in range(12))


def synth_documents(spark, n_docs: int, vocab: int = 5000, min_len: int = 60,
                    max_len: int = 180, clone_every: int = 50,
                    boiler_every: int = 97, alphabetic: bool = False):
    import pyspark.sql.functions as F

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    cid = F.when(
        (F.col("doc_id") % clone_every == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    df = df.withColumn("_cid", cid)
    ln = F.pmod(F.xxhash64(F.col("_cid"), F.lit(7)), F.lit(max_len - min_len)) + min_len

    def _tok(j):
        t = F.pmod(F.xxhash64(F.col("_cid"), j), F.lit(vocab)).cast("string")
        if alphabetic:
            # digits -> letters: tokens like 'wbcde' pass alpha-ratio
            # quality gates (plain 'w4231' is 20% alphabetic and fails
            # the Gopher >=40% rule), still deterministic and JVM-side
            t = F.translate(t, "0123456789", "abcdefghij")
        return F.concat(F.lit("w"), t)

    toks = F.transform(F.sequence(F.lit(1), ln), _tok)
    text = F.concat_ws(" ", toks)
    text = F.when(
        F.col("_cid") % boiler_every == 0, F.concat(text, F.lit(" " + BOILER))
    ).otherwise(text)
    return df.select("doc_id", text.alias("text"))


def leg_main() -> None:
    """Subprocess body: one (cpus) leg over the staged corpus."""
    cpus = int(os.environ["CURATION_CPUS"])
    sys.path.insert(0, REPO)
    from clp_core_spark.session import get_spark
    from clp_core_spark.operators import dedup

    spark = get_spark(
        app_name=f"curation-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    docs = spark.read.parquet(CORPUS)
    n_docs = docs.count()  # warm the file listing; tiny vs the ops below
    res = {"cpus": cpus, "n_docs": n_docs}
    t0 = time.time()
    res["duplicate_spans_rows"] = dedup.duplicate_spans(docs, k=8).count()
    res["duplicate_spans_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    res["minhash_lsh_rows"] = dedup.minhash_lsh_pairs(docs, threshold=0.5).count()
    res["minhash_lsh_sec"] = round(time.time() - t0, 3)
    res["docs_per_sec_spans"] = round(n_docs / res["duplicate_spans_sec"], 1)
    res["docs_per_sec_lsh"] = round(n_docs / res["minhash_lsh_sec"], 1)
    res["loadavg"] = list(os.getloadavg())
    spark.stop()
    print("LEG_JSON " + json.dumps(res))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2,
                    help="legs per parallelism level, interleaved "
                    "low/high/low/high; best (min sec) per op is kept — "
                    "the host is shared, single-shot readings carry "
                    "window noise (BENCH round-4 methodology note)")
    args = ap.parse_args()

    if not os.path.exists(CORPUS):
        sys.path.insert(0, REPO)
        from clp_core_spark.session import get_spark

        spark = get_spark(
            app_name="curation-scaling-stage", master="local[32]",
            shuffle_partitions=32,
            extra_conf={"spark.driver.memory": "32g",
                        "spark.ui.showConsoleProgress": "false"},
        )
        synth_documents(spark, args.docs).repartition(64).write.parquet(CORPUS)
        spark.stop()

    raw = []
    for cpus in (args.low, args.high) * args.repeats:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg"],
            env=dict(os.environ, CURATION_CPUS=str(cpus)),
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("LEG_JSON ")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
            raise SystemExit(f"leg cpus={cpus} produced no result")
        raw.append(json.loads(line[-1][len("LEG_JSON "):]))
        print("leg:", json.dumps(raw[-1]), flush=True)

    legs = []
    for cpus in (args.low, args.high):
        mine = [r for r in raw if r["cpus"] == cpus]
        best = dict(mine[0])
        for op in ("duplicate_spans", "minhash_lsh"):
            best[f"{op}_sec"] = min(r[f"{op}_sec"] for r in mine)
            best[f"{op}_sec_all"] = [r[f"{op}_sec"] for r in mine]
        best["docs_per_sec_spans"] = round(
            best["n_docs"] / best["duplicate_spans_sec"], 1)
        best["docs_per_sec_lsh"] = round(
            best["n_docs"] / best["minhash_lsh_sec"], 1)
        legs.append(best)

    lo, hi = legs
    factor = hi["cpus"] / lo["cpus"]
    summary = {
        "legs": legs,
        "scaling_efficiency_spans": round(
            (lo["duplicate_spans_sec"] / hi["duplicate_spans_sec"]) / factor, 3),
        "scaling_efficiency_lsh": round(
            (lo["minhash_lsh_sec"] / hi["minhash_lsh_sec"]) / factor, 3),
    }
    path = os.path.join(REPO, "BENCH", "curation_scaling_r5.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    if "--leg" in sys.argv:
        leg_main()
    else:
        main()
