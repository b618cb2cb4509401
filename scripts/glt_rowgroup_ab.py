"""In-session A/B: GLT layout with default (128 MB) parquet row groups
vs bounded row groups (write_glt_layout(row_group_bytes=)), at rest.

The round-5 sf1 at-rest A/B showed the trade the default layout makes:
a query matching a HOT template is confined to ~4 of 32 files (good
pruning), but each file is one row group, so the scan runs ~4 tasks on
a 32-core box. Bounded row groups are the parquet analog of CLP's
bounded segment sizing (clp/streaming_archive/writer/Archive.hpp
m_target_segment_uncompressed_size): the same 4 files become dozens of
independently readable-and-skippable units, restoring parallelism
while min/max pruning gets finer.

Both layouts must return identical result counts; timings are
best-of-2 with compile (dictionary probes) untimed, mirroring
bench.at_rest_bench.

Usage: python scripts/glt_rowgroup_ab.py [--turns 16000000] [--cpus 32]
       [--rg-bytes 8388608]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=16_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rg-bytes", type=int, default=8 << 20)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from clp_core_spark.operators import encode_pipeline, route
    from clp_core_spark.operators import search as search_op
    from clp_core_spark.plans import dictstore
    from clp_core_spark.session import get_spark
    from clp_core_spark.sources.transcripts import generate_transcripts

    spark = get_spark(
        "glt-rowgroup-ab",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            # same split knobs as bench.py: let many row groups become
            # many tasks instead of coalescing back into 128 MB splits
            "spark.sql.files.maxPartitionBytes": "400k",
            "spark.sql.files.openCostInBytes": "0",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="glt_rg_ab_")
    t = generate_transcripts(spark, num_turns=args.turns, seed=17)
    enc, lt, vd = encode_pipeline.encode(t, key_cols=["conv_id", "turn_idx"])
    enc = enc.persist()
    enc.count()

    layouts = {
        "glt_default": dict(row_group_bytes=None),
        "glt_rg": dict(row_group_bytes=args.rg_bytes),
    }
    for name, kw in layouts.items():
        route.write_glt_layout(
            enc, f"{root}/{name}", partitions=args.partitions,
            order_cols=("conv_id", "turn_idx"), combine_threshold=0.001, **kw
        )
    # persist the dictionaries and RELOAD them: the live lt/vd carry the
    # whole encode pipeline as lineage, so after clearCache every
    # search action would silently re-parse the corpus to rebuild them
    # (measured: 62s vs ~2s for the same query) — at-rest search must
    # read dictionaries the way CLP does, from the archive on disk
    dictstore.save_dict(root, "logtype", lt)
    dictstore.save_dict(root, "var", vd)
    enc.unpersist()
    spark.catalog.clearCache()
    lt = dictstore.load_dict(spark, root, "logtype")
    vd = dictstore.load_dict(spark, root, "var")

    import pyarrow.parquet as pq

    queries = {
        "heap_broad": "*Heap used*",       # one hot template, ~10% of rows
        "int_var_verify": "*on node-7*",   # dict+encoded verify heavy
    }
    compiled = {k: search_op.compile_query(q, lt, vd)
                for k, q in queries.items()}

    out: dict = {"turns": args.turns, "cpus": args.cpus,
                 "rg_bytes": args.rg_bytes,
                 "loadavg_1m": round(os.getloadavg()[0], 2)}
    counts: dict = {}
    for name in layouts:
        path = f"{root}/{name}"
        files = [f"{path}/{f}" for f in os.listdir(path)
                 if f.endswith(".parquet")]
        n_rg = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
        # timed legs scan the bare relation — projecting
        # input_file_name() blocks parquet filter pushdown (DataFilters
        # empty), which is the min/max pruning under test
        df = spark.read.parquet(path)
        stats = {"files": len(files), "row_groups": n_rg}
        for qname in queries:
            hits = search_op.search(df, lt, vd, compiled[qname],
                                    ["conv_id", "turn_idx"],
                                    select_cols=["conv_id", "turn_idx"])
            best, n = None, 0
            for _ in range(2):
                t0 = time.time()
                n = hits.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            stats[f"{qname}_sec"] = round(best, 3)
            stats[f"{qname}_hits"] = n
            with_f = spark.read.parquet(path).withColumn(
                "_f", F.input_file_name())
            stats[f"{qname}_files_hit"] = (
                search_op.search(with_f, lt, vd, compiled[qname],
                                 ["conv_id", "turn_idx"],
                                 select_cols=["_f"])
                .select("_f").distinct().count())
            counts.setdefault(qname, set()).add(n)
        out[name] = stats
    for qname in queries:
        assert len(counts[qname]) == 1, f"layouts disagree on {qname}"
        d = out["glt_default"][f"{qname}_sec"]
        r = out["glt_rg"][f"{qname}_sec"]
        out[f"{qname}_default_over_rg"] = round(d / r, 2) if r > 0 else None
    print(json.dumps(out))
    # committed evidence artifact (round-5 verdict, Wrong #4 / next #5):
    # headline measurements live in BENCH/*.json, not prose from /tmp logs
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/glt_rowgroup_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
