"""End-to-end training-data curation plan: the pipeline a pretraining
data team actually runs, composed from this repo's curation-family
operators in the order that keeps every stage's input as small as the
previous stages can make it:

    quality gate (Gopher rules)          textstats.gopher_keep
 -> PII redaction                        textstats.redact_pii
 -> duplicate-span excision              dedup.duplicate_spans + remove_
 -> exact dedup (doc level)              dedup.exact_dedup
 -> near-dup dedup (MinHash-LSH ->       dedup.minhash_lsh_pairs +
    clusters -> canonical per cluster)   dedup.near_dup_clusters
 -> benchmark decontamination            dedup.decontaminate
 -> target-mixture domain reweighting    sampling.mixture_sample
 -> train/val/test split                 sampling.split_assign
 -> sequence packing (per split)         packing.pack_sequences
 -> deterministic epoch shuffle          sampling.deterministic_shuffle

Ordering rationale: the gate and redaction are pure Column projections
(cheapest first — they prune/clean before anything that shuffles); span
excision REWRITES text, so it must precede both dedup stages (a doc
whose boilerplate is stripped may become an exact duplicate of another);
dedup precedes decontamination and sampling so their work scales with
the kept set; the split comes after the mixture so target proportions
hold inside every split (hash buckets under distinct salts are
independent); packing runs per split — a training sequence must never
straddle splits — so sequence identity is the PAIR (split, seq_id).

Every stage decision derives from content hashes (sampling.py's md5
buckets, xxhash64 digests), so the whole pipeline is deterministic
across cluster sizes, partitionings, and re-runs — rerunning curation
on the same corpus reproduces the same training set byte-for-byte.

**Lineage**: like plans/pipeline.py's per-partition ledger, `curate`
returns a per-stage ledger (stage, rows_in, rows_out, wall_sec) when
``count_stages=True``: each enabled stage's output is persisted,
counted, and the previous stage's cache released — one extra count job
per stage, the price of an audited pipeline. With ``count_stages=False``
the stages compose into ONE lazy plan (rows_* are None) and nothing
materializes until the caller writes the result — the shape to use when
the pipeline feeds straight into a checkpointed table write at scale
(compose with plans/tablestore for stage-materialized resumability).
Exception: ``near_dup`` is iterative (label propagation runs jobs of
its own and localCheckpoints its label relation), so that one stage
always executes eagerly; with ``count_stages=False`` its un-persisted
input plan is recomputed per iteration input — audited mode persists
it, which is one more reason the default is True.

Reference analog: none — clp is a log store; this plan is the
training-data surface the graft adds ON TOP of the CLP operators
(brief: curation operators are first-class alongside SURVEY §2).
"""

from __future__ import annotations

import time
from collections.abc import Mapping
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from clp_core_spark.functions import textstats
from clp_core_spark.operators import dedup, packing, sampling


@dataclass
class CurationResult:
    """`curate` output: the curated corpus plus the per-stage ledger."""

    df: DataFrame
    stages: list[dict] = field(default_factory=list)

    def ledger(self) -> DataFrame:
        """The stage ledger as a DataFrame (mirrors pipeline.ledger())."""
        spark = self.df.sparkSession
        return spark.createDataFrame(
            [
                (
                    s["stage"],
                    s["rows_in"],
                    s["rows_out"],
                    float(s["wall_sec"]) if s["wall_sec"] is not None else None,
                )
                for s in self.stages
            ],
            "stage string, rows_in long, rows_out long, wall_sec double",
        )


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_gate: bool = True,
    redact: bool = False,
    excise_spans: bool = False,
    span_k: int = 8,
    exact: bool = True,
    near_dup: bool = True,
    minhash_threshold: float = 0.5,
    shingle_n: int = 3,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 13,
    mixture: Mapping[str, float] | None = None,
    domain_col: str | None = None,
    mixture_weight_col: str | None = None,
    splits: Mapping[str, float] | None = None,
    seq_len: int | None = None,
    shuffle: bool = False,
    salt: str = "curate",
    count_stages: bool = True,
) -> CurationResult:
    """Run the curation pipeline over ``df`` (any table with a unique
    ``id_col`` and a ``text_col``). Stages toggle independently; the
    defaults run gate + exact + near-dup + split — the minimum honest
    pretraining prep. Off-by-default stages either rewrite text
    (``redact``, ``excise_spans``), need caller inputs (``benchmark``,
    ``mixture`` + ``domain_col``), or change the output shape
    (``seq_len`` adds (pack_group, seq_id, overlong) via one slim join;
    ``shuffle`` adds the global training-order sort).

    Returns :class:`CurationResult`; ``result.df`` keeps every input
    column (text rewritten IN PLACE by redact/excise so downstream
    stages and the caller see one text column), plus ``split`` and the
    packing columns when enabled. Sequence identity is (split, seq_id).
    """
    if mixture is not None and domain_col is None:
        raise ValueError("mixture weights require domain_col")
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}

    stages: list[dict] = []
    cur = df
    prev_cached: DataFrame | None = None
    rows_in: int | None = cur.count() if count_stages else None

    def _stage(name: str, out: DataFrame) -> DataFrame:
        """Record one stage boundary; persist/count when auditing."""
        nonlocal cur, prev_cached, rows_in
        t0 = time.monotonic()
        rows_out: int | None = None
        if count_stages:
            out = out.persist()
            rows_out = out.count()
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = out
        stages.append(
            {
                "stage": name,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": round(time.monotonic() - t0, 3)
                if count_stages
                else None,
            }
        )
        rows_in = rows_out
        cur = out
        return out

    if quality_gate:
        _stage("quality_gate", cur.filter(textstats.gopher_keep(F.col(text_col))))
    if redact:
        _stage(
            "redact_pii",
            cur.withColumn(text_col, textstats.redact_pii(F.col(text_col))),
        )
    if excise_spans:
        spans = dedup.duplicate_spans(cur, text_col=text_col, id_col=id_col, k=span_k)
        rewritten = dedup.remove_duplicate_spans(
            cur, spans, text_col=text_col, id_col=id_col, out_col="_text_deduped"
        )
        _stage(
            "excise_spans",
            rewritten.withColumn(text_col, F.col("_text_deduped")).drop(
                "_text_deduped"
            ),
        )
    if exact:
        keep = dedup.exact_dedup(cur, text_col=text_col, id_col=id_col).select(id_col)
        _stage("exact_dedup", cur.join(keep, id_col, "left_semi"))
    if near_dup:
        pairs = dedup.minhash_lsh_pairs(
            cur,
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            threshold=minhash_threshold,
        )
        clusters = dedup.near_dup_clusters(cur, pairs, id_col=id_col)
        canon = clusters.filter(F.col(id_col) == F.col("canonical_id")).select(id_col)
        _stage("near_dup", cur.join(canon, id_col, "left_semi"))
    if benchmark is not None:
        flagged = dedup.decontaminate(
            cur,
            benchmark,
            text_col=text_col,
            id_col=id_col,
            n=decontaminate_n,
        )
        _stage(
            "decontaminate",
            flagged.filter(~F.col("contaminated")).drop(
                "contaminated", "n_contaminated_ngrams"
            ),
        )
    if mixture is not None:
        _stage(
            "mixture",
            sampling.mixture_sample(
                cur,
                id_col,
                mixture,
                strata_col=domain_col,
                salt=f"{salt}-mix",
                weight_col=mixture_weight_col,
            ),
        )
    _stage(
        "split",
        sampling.split_assign(cur, id_col, weights=splits, salt=f"{salt}-split"),
    )
    if seq_len is not None:
        # pack each split separately (hash groups under per-split salts
        # are independent, and no sequence may mix splits); the packed
        # routing table is slim (id, n_tokens, pack_group, seq_id,
        # overlong) so the per-split union + join-back moves no text
        with_tokens = cur.withColumn(
            "_n_tokens", textstats.token_count_ws(F.col(text_col))
        )
        packed_parts = [
            packing.pack_sequences(
                with_tokens.filter(F.col("split") == F.lit(name)),
                id_col,
                "_n_tokens",
                seq_len,
                salt=f"{salt}-pack-{name}",
            ).withColumn("split", F.lit(name))
            for name in splits
        ]
        packed = packed_parts[0]
        for p in packed_parts[1:]:
            packed = packed.unionByName(p)
        routed = cur.join(
            packed.select(id_col, "pack_group", "seq_id", "overlong"),
            id_col,
            "left",
        )
        _stage("pack", routed)
    if shuffle:
        _stage(
            "shuffle",
            sampling.deterministic_shuffle(cur, id_col, salt=f"{salt}-shuffle"),
        )
    if count_stages and prev_cached is not None:
        # ownership: hand the caller an unpinned plan — the final count
        # already materialized everything the ledger needed, and a
        # long-lived session must not accumulate corpus-sized caches
        # (same contract as clps_search's owned_persists)
        prev_cached.unpersist()
    return CurationResult(df=cur, stages=stages)
