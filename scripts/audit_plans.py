"""Dump physical-plan evidence for the headline queries into PLANS.md:
PushedFilters reaching the parquet scan, ReadSchema pruning, broadcast
joins on dictionary/dim tables, and WholeStageCodegen coverage.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from clp_core_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# One-line plan verdicts (reviewed against the generated counts below;
# re-check when a query's counts move).
VERDICTS = {
    "clp_search_int": "clean — dict probes broadcast, scan pruned",
    "clp_search_time_range": "clean — ts-index file skip + broadcast probes",
    "clp_search_broad_dictvar": (
        "intended — >1k dict hits switch to semi-joins; the 2 SMJ are the "
        "id-resolve joins on the exploded var relation, keyed and "
        "AQE-coalesced"
    ),
    "clp_sink_counts_events": "clean — partial agg before the 1 shuffle",
    "curation_split_sample": (
        "clean — md5 bucket exprs fuse into the scan projection; one "
        "two-phase agg shuffle, no Python, partition-count independent"
    ),
    "agg_topk_latest": "clean — TakeOrderedAndProject, no global sort",
    "join_enrich_nation": "clean — dims broadcast, fact never shuffles",
    "kql_bool_range": "clean — whole predicate pushed to the scan",
    "dedup_minhash_lsh": (
        "intended — fused text->shingle-hash Arrow kernel (15.7x over the "
        "string HOF path, BENCH), banded (id,band,bucket) relation, one "
        "exchange shared by both self-join sides, hash sets re-attach to "
        "survivors only"
    ),
    "sim_bruteforce_topk": "clean — JVM dot product + TakeOrdered",
    "clp_search_float": "clean — encoded-float probe, broadcast verify",
    "clp_search_count_by_time": "clean — search semi-join then bucket agg",
    "clps_typed_search": "clean — typed leaf predicates on cached encode",
    "clps_clpstring_search": (
        "intended — one fused ArrowEvalPython parse (cached), dictionary "
        "probes broadcast, residual verify on candidates only"
    ),
    "clps_structured_array": "clean — exists() over array<struct>, no explode",
    "clp_rawtext_roundtrip": "clean — per-file window reassembly, 1 shuffle",
    "dedup_embedding_cosine": (
        "intended — Hamming-chunk blocking, linear shuffle, never all-pairs"
    ),
    "sim_ivf_topk": "clean — nprobe/nlist bounded scan then TakeOrdered",
    "kql_wildcard_key": "clean — descriptor resolved to typed leaf OR-chain",
    "clps_unstructured_array_search": (
        "clean — query-shaped from_json over the array column only"
    ),
    "clp_schema_search": (
        "intended — cost is the schema-DFA ingest inside the query; the "
        "search itself is 4 broadcast joins, no SMJ"
    ),
    "dedup_simhash_prod": (
        "fixed r4 — margin-clean corpus now cached, so the jaccard prep is "
        "no longer re-derived per union/self-join branch; remaining plan is "
        "the fused shingle-hash kernel + signature UDF + ONE chunk "
        "exchange reused by both sides + popcount"
    ),
    "sim_pq_topk": (
        "clean — one Arrow encode pass, ADC as literal-array lookups in "
        "codegen, TakeOrderedAndProject; at scale the code column is the "
        "at-rest search input and the embedding column never scans"
    ),
    "clp_search_token": "clean — logtype probe + broadcast semi-join",
    "clp_search_midstar": "clean — same probe pipeline, residual rlike verify",
    "clp_search_regex": "clean — regex compiles to the wildcard pipeline",
    "clp_logtype_counts": "clean — broadcast dict join, two-phase count",
    "dedup_exact_docs": "clean — digest-only shuffle, text never moves",
    "clps_multi_clpstring_search": (
        "intended — ONE fused parse feeds both columns' writers (cached); "
        "per-column dictionary searches chain as key semi-joins"
    ),
    "clps_bool_tree_search": (
        "intended — single-pass tree eval: dictionary hit-sets left-join "
        "in as boolean markers, one corpus-scan filter, no union/dedup"
    ),
    "clps_not_wildcard_search": (
        "intended — positive hit set (plain OR dict-search union) "
        "anti-joined from the present rows"
    ),
    "stream_count_by_time": (
        "intended — plan shown is the sink read-back agg; the encode runs "
        "in foreachBatch micro-batches (streaming/stream_pipeline.py)"
    ),
    "text_analysis": "clean — nine outputs incl. PII counts, one projection, one codegen pass",
    "clp_dict_stats": "clean — two scalar aggs cross-joined, broadcast",
    "clps_pure_or_search": (
        "clean — pure-predicate OR compiles to ONE disjunctive filter "
        "over one cached-corpus read: no join, no union, no dedup"
    ),
    "clps_schema_meta": (
        "clean — tree + schema-map projections union over the cached "
        "parse; both sides read metadata-scale relations"
    ),
    "dedup_duplicate_spans": (
        "clean — Arrow-batched window-hash kernel (numpy polynomial "
        "over per-token hashes; 21x over the HOF form, BENCH), 8-byte "
        "shuffle, skew-proof min!=max two-phase agg, dup-hash set "
        "broadcast into the left-semi probe (shuffle-free; expansion "
        "re-runs per side by design), one per-doc islands window"
    ),
    "clp_roundtrip_text": (
        "clean — three broadcast-dict decode legs union; coverage twin of "
        "the former docs+floats+events roundtrip rows"
    ),
    # round-5: the registry tail (everything queries() registers is now
    # audited, not just the bench picks)
    "clp_search_dictvar": "clean — single dict probe broadcast, scan pruned",
    "clp_search_ignorecase": (
        "clean — case-folded probes broadcast, same shape as the exact path"
    ),
    "clp_search_qmark": (
        "clean — broadcast probes + residual verify on candidates only"
    ),
    "clp_search_two_vars": (
        "intended — the SMJ + semi pair is the keyed id-resolve on the "
        "exploded var relation (ordered-subsequence match), AQE-coalesced; "
        "same shape as clp_search_broad_dictvar"
    ),
    "clp_schema_roundtrip": (
        "clean — schema-DFA ingest cached; decode is broadcast dict joins"
    ),
    "clps_schema_pruned_search": (
        "clean — SchemaMatch pruning cuts ReadSchema to the 3 touched columns"
    ),
    "dedup_ngram_jaccard": (
        "intended — the exact quadratic ORACLE baseline (max_rows-guarded, "
        "refuses corpora >100k rows); broadcast joins at test scale, never "
        "a production path — minhash_lsh is the scale twin"
    ),
    "dedup_cluster_canonical": (
        "clean — label-propagation rounds shuffle only (long,long) labels; "
        "every round localCheckpoints (lineage truncated to a leaf — "
        "persist alone grew plan descriptions 2^rounds), with auto-"
        "escalation to O(log n) star rounds on deep graphs; the shown "
        "plan is the final checkpointed-label select"
    ),
    "curation_decontaminate": (
        "clean — bench window-hash set broadcast into the corpus probe, "
        "per-doc hit counts broadcast back; text never shuffles"
    ),
    "kql_date_range": "clean — whole predicate pushed to the scan",
    "kql_wildcard_or": (
        "clean — wildcard descriptor resolves to a typed-leaf OR-chain, "
        "one codegen stage, no join"
    ),
    "sim_lsh_topk": (
        "clean — matmul signature kernel, bucket-bounded scan, TakeOrdered"
    ),
}


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _executed_tree(plan: str) -> str:
    """The executed plan TREE with cached (InMemoryRelation) subtrees
    removed. explainString textually re-expands a cached relation's
    build plan under EVERY InMemoryTableScan that reads it, so counting
    raw occurrences multiply-counts work that executes exactly once and
    then sits in the cache (round-3's '50 BroadcastHashJoins' in
    dedup_simhash_prod were this artifact). Join/codegen counts below
    are over this stripped tree: the operators that actually run per
    query invocation."""
    out: list[str] = []
    skip_depth: int | None = None
    for ln in plan.splitlines():
        if ln.strip() == "":
            break  # end of the tree section (details follow)
        m = re.search(r"[+:]- ", ln)
        depth = m.start() if m else None
        if skip_depth is not None:
            if depth is not None and depth <= skip_depth:
                skip_depth = None
            else:
                continue
        if "InMemoryRelation" in ln:
            skip_depth = depth if depth is not None else 0
        out.append(ln)
    return "\n".join(out)


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # Reviewed-first ordering; anything registered in queries() but not
    # listed here is appended automatically so the audit always covers
    # the FULL driver surface (50/50), not just the bench picks.
    picks = [
        "clp_search_int",
        "clp_search_time_range",
        "clp_search_broad_dictvar",
        "clp_sink_counts_events",
        "curation_split_sample",
        "agg_topk_latest",
        "join_enrich_nation",
        "kql_bool_range",
        "dedup_minhash_lsh",
        "sim_bruteforce_topk",
        "clp_search_float",
        "clp_search_count_by_time",
        "clps_typed_search",
        "clps_clpstring_search",
        "clps_structured_array",
        "clp_rawtext_roundtrip",
        "dedup_embedding_cosine",
        "sim_ivf_topk",
        "kql_wildcard_key",
        "clps_unstructured_array_search",
        "clp_schema_search",
        "dedup_simhash_prod",
        # every bench-timed query has an entry (VERDICT r3 item 5)
        "sim_pq_topk",
        "clp_search_token",
        "clp_search_midstar",
        "clp_search_regex",
        "clp_logtype_counts",
        "dedup_exact_docs",
        "clps_multi_clpstring_search",
        "clps_bool_tree_search",
        "clps_not_wildcard_search",
        "stream_count_by_time",
        "text_analysis",
        "clp_dict_stats",
        # round-5 single-pass boolean execution + consolidated metadata
        "clps_pure_or_search",
        "clps_schema_meta",
        # round-5 exact-substring dedup + consolidated roundtrip
        "dedup_duplicate_spans",
        "clp_roundtrip_text",
    ]
    picks.extend(name for name in qs if name not in picks)
    out = ["# PLANS — physical-plan audit of headline queries",
           "",
           f"Generated by scripts/audit_plans.py at sf dir `{SF_DIR}`.",
           "Checks per query: filter pushdown to the parquet scan, column",
           "pruning (ReadSchema), broadcast joins for dict/dim tables, and",
           "WholeStageCodegen coverage.",
           "",
           "Join/codegen counts are over the EXECUTED plan tree with",
           "cached (InMemoryRelation) subtrees excluded — explainString",
           "re-prints a cached relation's build plan under every scan that",
           "reads it, so raw-text counts multiply-count work that runs",
           "once (round-3's 50-BroadcastHashJoin dedup_simhash_prod reading",
           "was that artifact; the corpus prep now sits behind an explicit",
           "cache as well). `cached-relation reads: N` counts the",
           "InMemoryTableScan leaves standing in for those subtrees.", ""]
    for name in picks:
        try:
            df = qs[name](spark, SF_DIR)
            plan = _plan(df)
        except Exception as e:  # noqa: BLE001
            out.append(f"## {name}\n\nERROR: {e}\n")
            continue
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        schemas = re.findall(r"ReadSchema: [^\n]*", plan)
        tree = _executed_tree(plan)
        n_codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        n_bcast = len(re.findall(r"BroadcastHashJoin", tree))
        n_sortmerge = len(re.findall(r"SortMergeJoin", tree))
        n_semi = tree.count("LeftSemi")
        n_cached = len(re.findall(r"InMemoryTableScan", tree))
        take_ordered = "TakeOrderedAndProject" in tree
        out.append(f"## {name}\n")
        for p in dict.fromkeys(pushed):
            out.append(f"- `{p}`")
        for s in dict.fromkeys(schemas):
            out.append(f"- `{s[:160]}`")
        out.append(
            f"- WholeStageCodegen stages: {n_codegen}; BroadcastHashJoin: "
            f"{n_bcast}; SortMergeJoin: {n_sortmerge}; LeftSemi joins: {n_semi}"
            + (f"; cached-relation reads: {n_cached}" if n_cached else "")
            + ("; TakeOrderedAndProject: yes" if take_ordered else "")
        )
        if name in VERDICTS:
            out.append(f"- Verdict: {VERDICTS[name]}")
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
