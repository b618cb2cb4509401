"""Cluster job entry point for the curation pipeline — the
``spark-submit --py-files`` surface for plans/curation.py, the same
launch shape as clp_core_spark.job:

    python scripts/package_pyfiles.py                 # -> dist/clp_core_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/clp_core_spark.zip \
        $(python -c 'import clp_core_spark.curate_job as j; print(j.__file__)') \
        --input /data/documents --output /data/curated \
        --checkpoint-root /data/curate_ckpt \
        --redact --seq-len 2048 --shuffle --metrics-out metrics.json

The job reads one parquet table, runs the composed curation plan
(quality gate -> redact -> span excision -> exact dedup -> near-dup ->
decontaminate -> mixture -> split -> pack -> shuffle; every stage
toggleable), writes the curated corpus partitioned by split, and emits
the per-stage lineage ledger as JSON. ``--checkpoint-root`` makes the
run resumable: the expensive stages' decision tables commit to parquet
as they complete, and a crashed run picks up from the last committed
decision (plans/curation.py's decisions-not-data contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_weights(spec: str, flag: str) -> dict[str, float]:
    """'train=0.98,val=0.01,test=0.01' -> dict; fail loud on typos."""
    out: dict[str, float] = {}
    for part in spec.split(","):
        if "=" not in part:
            raise SystemExit(f"{flag}: expected name=weight, got {part!r}")
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    if not out:
        raise SystemExit(f"{flag}: empty spec")
    return out


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="clp_core_spark.curate_job",
        description="Resumable training-data curation pipeline",
    )
    p.add_argument("--input", required=True,
                   help="path of the documents table (parquet)")
    p.add_argument("--output", required=True,
                   help="output path for the curated corpus (parquet,"
                        " partitioned by split)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--checkpoint-root", default=None,
                   help="resumable-run state dir (decision tables +"
                        " completion ledger); omit for a one-shot run")
    p.add_argument("--no-gate", action="store_true",
                   help="skip the Gopher-rule quality gate")
    p.add_argument("--redact", action="store_true",
                   help="redact PII (email/ip/ssn/phone/card) in place")
    p.add_argument("--excise-spans", action="store_true",
                   help="strip duplicate token spans before dedup")
    p.add_argument("--span-k", type=int, default=8)
    p.add_argument("--no-exact", action="store_true",
                   help="skip exact (content-digest) dedup")
    p.add_argument("--no-near-dup", action="store_true",
                   help="skip MinHash-LSH near-dup dedup")
    p.add_argument("--minhash-threshold", type=float, default=0.5)
    p.add_argument("--benchmark", default=None,
                   help="parquet table of benchmark texts; documents"
                        " sharing any verbatim n-gram are dropped")
    p.add_argument("--benchmark-text-col", default="text")
    p.add_argument("--decontaminate-n", type=int, default=13)
    p.add_argument("--mixture", default=None,
                   help="target domain mixture, e.g. 'web=0.6,code=0.4'")
    p.add_argument("--domain-col", default=None)
    p.add_argument("--splits", default="train=0.98,val=0.01,test=0.01",
                   help="split weights, e.g. 'train=0.98,val=0.01,test=0.01'")
    p.add_argument("--seq-len", type=int, default=None,
                   help="pack documents into sequences of this token"
                        " capacity (adds pack_group/seq_id/overlong)")
    p.add_argument("--shuffle", action="store_true",
                   help="deterministic epoch-0 training-order shuffle")
    p.add_argument("--salt", default="curate")
    p.add_argument("--no-stage-counts", action="store_true",
                   help="skip per-stage counts (one lazy plan; ledger"
                        " rows carry no row counts)")
    p.add_argument("--metrics-out", default=None,
                   help="write the stage ledger JSON here (default: stdout)")
    p.add_argument("--master", default="",
                   help="Spark master override (default: inherit from launcher)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_arg_parser()
    args = parser.parse_args(argv)
    if args.mixture is not None and args.domain_col is None:
        parser.error("--mixture requires --domain-col")

    import pyspark.sql.functions as F

    from clp_core_spark.plans import curation
    from clp_core_spark.session import get_spark

    spark = get_spark(
        "clp-core-spark-curate",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    try:
        t_run = time.monotonic()
        df = spark.read.parquet(args.input)
        # select-alias, not rename: collision-free if the table already
        # has a 'text' column, and prunes every other column at the scan
        benchmark = (
            spark.read.parquet(args.benchmark).select(
                F.col(args.benchmark_text_col).alias("text")
            )
            if args.benchmark is not None
            else None
        )
        result = curation.curate(
            df,
            id_col=args.id_col,
            text_col=args.text_col,
            quality_gate=not args.no_gate,
            redact=args.redact,
            excise_spans=args.excise_spans,
            span_k=args.span_k,
            exact=not args.no_exact,
            near_dup=not args.no_near_dup,
            minhash_threshold=args.minhash_threshold,
            benchmark=benchmark,
            decontaminate_n=args.decontaminate_n,
            mixture=_parse_weights(args.mixture, "--mixture")
            if args.mixture
            else None,
            domain_col=args.domain_col,
            splits=_parse_weights(args.splits, "--splits"),
            seq_len=args.seq_len,
            shuffle=args.shuffle,
            salt=args.salt,
            count_stages=not args.no_stage_counts,
            checkpoint_root=args.checkpoint_root,
            # the path names WHICH benchmark the stored contamination
            # decision is valid against (curation.py refuses a resume
            # under a different one)
            benchmark_fingerprint=args.benchmark,
        )
        # the shuffle stage's global sort IS the training order — a
        # partitionBy(split) write keeps per-split files in that order
        t_write = time.monotonic()
        result.df.write.mode("overwrite").partitionBy("split").parquet(args.output)
        write_wall = time.monotonic() - t_write
        blob = json.dumps(
            {
                "stages": result.stages,
                "resumed": result.resumed,
                "output": args.output,
                "write_wall_sec": round(write_wall, 3),
                # curate() + output write, excluding session startup —
                # the number scaling harnesses should use
                "total_wall_sec": round(time.monotonic() - t_run, 3),
            }
        )
        if args.metrics_out:
            with open(args.metrics_out, "w") as fh:
                fh.write(blob + "\n")
        else:
            print(blob)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
