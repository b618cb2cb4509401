"""In-session A/B: single-pass boolean-tree execution (round 5) vs the
round-4 OR-of-ANDs execution (one corpus scan per OR-group + union +
dedup), on an AT-REST (parquet, uncached) encoded corpus — the regime
the single-pass change targets; bench-scale cached corpora hide the
difference by construction.

The old execution is reproduced here from the round-4 shape (filter or
semi-join chain per DNF group, groups union + dropDuplicates) against
the SAME per-leaf plans the current code builds, so the A/B isolates
the execution strategy. Results must agree row-for-row.

Usage: python scripts/bool_tree_ab.py [--rows 2000000] [--cpus 16]
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


def _to_dnf(node):
    """The round-4 normalization (De Morgan + AND-over-OR distribution)."""
    kind = node[0]
    if kind == "leaf":
        return [[(False, node[1])]]
    if kind == "not":
        inner = node[1]
        if inner[0] == "leaf":
            return [[(True, inner[1])]]
        if inner[0] == "not":
            return _to_dnf(inner[1])
        flipped = "or" if inner[0] == "and" else "and"
        return _to_dnf((flipped, [("not", c) for c in inner[1]]))
    if kind == "or":
        out = []
        for c in node[1]:
            out.extend(_to_dnf(c))
        return out
    prod = [[]]
    for c in node[1]:
        sub = _to_dnf(c)
        prod = [g + h for g in prod for h in sub]
    return prod


def old_exec(encoded, kql, dicts, key_cols):
    """Round-4 execution: per-DNF-group filter/semi-join chains, groups
    union + dedup on the keys (clps_search.py@r4:584-613)."""
    from clp_core_spark.operators import clps_search
    from clp_core_spark.operators.kql import KqlCompiler

    groups = _to_dnf(clps_search._parse_bool_tree(kql))
    plain = clps_search._plain_view(encoded, dicts)
    plans = {}

    def plan(text):
        if text in plans:
            return plans[text]
        toks = clps_search._lex(text)
        hit = clps_search._clp_clause(toks, dicts)
        if hit is not None:
            col, value = hit
            keys = clps_search.search_clpstring_column(
                encoded, col, dicts, value, key_cols
            ).select(*key_cols)
            plans[text] = ("join", keys, F.col(f"{col}__present"))
        else:
            plans[text] = (
                "pred", KqlCompiler(plain).compile(text), None
            )
        return plans[text]

    results = []
    for group in groups:
        out = encoded
        preds, semis, antis = [], [], []
        for negated, text in group:
            kind, payload, present = plan(text)
            if kind == "pred":
                preds.append(~payload if negated else payload)
            elif negated:
                antis.append((payload, present))
            else:
                semis.append(payload)
        if preds:
            p = preds[0]
            for q in preds[1:]:
                p = p & q
            out = out.filter(p)
        for keys in semis:
            out = out.join(keys, key_cols, "leftsemi")
        for keys, present in antis:
            out = out.filter(present).join(keys, key_cols, "left_anti")
        results.append(out)
    if len(results) == 1:
        return results[0]
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.dropDuplicates(key_cols)


def timed(df, runs: int = 2) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(runs):
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from clp_core_spark.operators import clps_search, semistructured
    from clp_core_spark.plans import dictstore
    from clp_core_spark.session import get_spark

    spark = get_spark(
        "bool-tree-ab", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="bool_ab_")
    js = F.concat(
        F.lit('{"msg": "req num '), F.col("id").cast("string"),
        F.lit(' done", "note": "user '), (F.col("id") % 7).cast("string"),
        F.lit(' ok", "user": '), F.col("id").cast("string"), F.lit("}"),
    )
    src = spark.range(args.rows).select(F.col("id").alias("rid"), js.alias("js"))
    owned = []
    enc, tree, _ = semistructured.encode_semistructured(
        src, "js", key_cols=["rid"], clp_string_cols=["msg", "note"],
        infer_sample_rows=1000, owned_persists=owned,
    )
    enc2, dicts = clps_search.encode_clpstring_columns(
        enc, ["msg", "note"], key_cols=["rid"], owned_persists=owned
    )
    enc2.write.mode("overwrite").parquet(f"{root}/encoded")
    for c, (lt, vd) in dicts.items():
        dictstore.save_dict(root, f"lt_{c}", lt)
        dictstore.save_dict(root, f"vd_{c}", vd)
    for p in owned:
        p.unpersist()
    spark.catalog.clearCache()

    at_rest = spark.read.parquet(f"{root}/encoded")
    dicts2 = {
        c: (dictstore.load_dict(spark, root, f"lt_{c}"),
            dictstore.load_dict(spark, root, f"vd_{c}"))
        for c in dicts
    }

    queries = {
        "pure_or_8": " OR ".join(
            ["user: 3", "user: 7", "user: 11", "user: 13",
             "user: 17", "user: 19", "user: 23", "user: 29"]
        ),
        "mixed": '(msg: "*num 1234 *" OR note: "*user 3 *") AND user > 5',
    }
    out = {"rows": args.rows, "cpus": args.cpus}
    for name, q in queries.items():
        new_df = clps_search.kql_filter_clps(at_rest, q, dicts2, ["rid"])
        old_df = old_exec(at_rest, q, dicts2, ["rid"])
        new_t, new_n = timed(new_df)
        old_t, old_n = timed(old_df)
        assert new_n == old_n, (name, new_n, old_n)
        out[name] = {
            "new_single_pass_sec": new_t,
            "old_dnf_sec": old_t,
            "speedup": round(old_t / new_t, 2) if new_t else None,
            "hits": new_n,
        }
    print(json.dumps(out))
    # committed evidence artifact (round-5 verdict, Wrong #4 / next #5):
    # headline measurements live in BENCH/*.json, not prose from /tmp logs
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/bool_tree_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
