"""End-to-end curation plan: stage composition, ordering semantics,
ledger accounting, and whole-pipeline determinism.

The individual operators are each pinned by their own suites
(test_dedup, test_sampling, test_packing, test_textstats); this file
tests the GLUE — that plans.curation.curate wires them in the right
order with the right keep-sets, and that the composed pipeline is a
pure function of the corpus content."""

import random

import pyspark.sql.functions as F
import pytest

from clp_core_spark.plans import curation

# 196-word vocabulary: 40-token documents drawn from it by a per-doc
# seeded RNG are mutually near-orthogonal in 3-shingle space (no
# accidental near-dup pairs), while constructed copies control the
# dedup stages exactly
_BASE = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]
VOCAB = [w + s for w in _BASE for s in (
    "", "ish", "ese", "oid", "ian", "ary", "ine", "ous", "ean", "al",
    "ic", "ive", "ful", "ate",
)]


def _doc(i: int, n: int = 40) -> str:
    rng = random.Random(1000 + i)
    return " ".join(rng.choice(VOCAB) for _ in range(n))


CONTAM_SPAN = " ".join(VOCAB[(j * 11) % len(VOCAB)] for j in range(20))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 0..119: unique, gate-passing documents across three domains
    for i in range(120):
        rows.append((i, _doc(i), ["en", "de", "fr"][i % 3]))
    # 200/201: exact duplicates of doc 0 (min id 0 must win)
    rows.append((200, _doc(0), "en"))
    rows.append((201, _doc(0), "en"))
    # 210: near-duplicate of doc 1 (one token swapped mid-document)
    toks = _doc(1).split()
    toks[20] = "zzznotaword"
    rows.append((210, " ".join(toks), "en"))
    # 220: contaminated — embeds a 20-token benchmark span verbatim
    rows.append((220, _doc(900, n=15) + " " + CONTAM_SPAN, "en"))
    # 230/231: fail the Gopher gate (too short / non-alphabetic)
    rows.append((230, "tiny", "en"))
    rows.append((231, "1234 5678 " * 20, "en"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"]).persist()


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(
        [(0, "prefix words here " + CONTAM_SPAN)], ["bench_id", "text"]
    )


@pytest.fixture(scope="module")
def curated(corpus, bench_df):
    return curation.curate(
        corpus,
        benchmark=bench_df,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        seq_len=128,
        shuffle=True,
        near_dup=True,
    )


def test_stage_ledger_shape(curated):
    names = [s["stage"] for s in curated.stages]
    assert names == [
        "quality_gate", "exact_dedup", "near_dup", "decontaminate",
        "split", "pack", "shuffle",
    ]
    # rows_in chains: each stage's input is the previous stage's output
    for prev, cur in zip(curated.stages, curated.stages[1:]):
        assert cur["rows_in"] == prev["rows_out"]
    # filters shrink, annotators preserve
    for s in curated.stages:
        if s["stage"] in ("split", "pack", "shuffle"):
            assert s["rows_out"] == s["rows_in"]
        else:
            assert s["rows_out"] <= s["rows_in"]
    assert curated.ledger().count() == 7


def test_keep_set_semantics(curated):
    ids = {r["doc_id"] for r in curated.df.select("doc_id").collect()}
    # gate: the short and non-alpha docs are gone
    assert 230 not in ids and 231 not in ids
    # exact dedup: doc 0 (min id) survives its copies
    assert 0 in ids and 200 not in ids and 201 not in ids
    # near dup: doc 1 (canonical min id) survives, its near-copy does not
    assert 1 in ids and 210 not in ids
    # decontamination: the benchmark-overlapping doc is gone
    assert 220 not in ids
    # every other base doc survives untouched
    assert set(range(120)) <= ids


def test_split_and_pack_contract(curated):
    out = curated.df
    rows = out.select("doc_id", "split", "seq_id", "overlong").collect()
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    # every kept doc packs (40-token docs, seq_len 128, none overlong)
    assert all(r["seq_id"] is not None and not r["overlong"] for r in rows)
    # no sequence overfills or straddles splits: per (split, seq_id)
    # token sums stay within capacity, and (split, seq_id) keying means
    # a straddle would show as the same pair under two splits
    fill = (
        out.groupBy("split", "seq_id")
        .agg(F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("toks"))
        .collect()
    )
    assert all(r["toks"] <= 128 for r in fill)
    pairs = [(r["split"], r["seq_id"]) for r in fill]
    assert len(pairs) == len(set(pairs))


def test_pipeline_is_deterministic(corpus, bench_df, curated):
    again = curation.curate(
        corpus.repartition(7),  # different partitioning, same content
        benchmark=bench_df,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        seq_len=128,
        shuffle=True,
        count_stages=False,  # also covers the single-lazy-plan mode
    )
    a = {(r["doc_id"], r["split"], r["seq_id"])
         for r in curated.df.collect()}
    b = {(r["doc_id"], r["split"], r["seq_id"])
         for r in again.df.collect()}
    assert a == b
    assert all(s["rows_out"] is None for s in again.stages)


def test_redact_precedes_dedup(spark):
    """Redaction rewrites text IN PLACE before dedup sees it: two docs
    that differ only in their PII token become exact duplicates and
    collapse to the min id."""
    base = _doc(500, n=30)
    df = spark.createDataFrame(
        [
            (1, f"{base} mail a@b.com end"),
            (2, f"{base} mail c@d.org end"),
            (3, _doc(501, n=30)),
        ],
        ["doc_id", "text"],
    )
    res = curation.curate(
        df,
        quality_gate=False,
        redact=True,
        near_dup=False,
        splits={"train": 1.0},
    )
    ids = sorted(r["doc_id"] for r in res.df.select("doc_id").collect())
    assert ids == [1, 3]
    texts = {r["doc_id"]: r["text"] for r in res.df.collect()}
    assert "<EMAIL>" in texts[1] and "a@b.com" not in texts[1]


def test_excision_precedes_dedup(spark):
    """Span excision strips a shared boilerplate footer from otherwise
    distinct docs BEFORE dedup, so two docs that differ only in which
    footer variant they carry (none vs footer) do not near-dup-collide,
    while the footer itself is gone from every survivor."""
    footer = " ".join(VOCAB[(5 * j + 2) % len(VOCAB)] for j in range(12))
    df = spark.createDataFrame(
        [
            (1, _doc(600, n=30) + " " + footer),
            (2, _doc(601, n=30) + " " + footer),
            (3, _doc(602, n=30) + " " + footer),
        ],
        ["doc_id", "text"],
    )
    res = curation.curate(
        df,
        quality_gate=False,
        excise_spans=True,
        span_k=8,
        near_dup=False,
        splits={"train": 1.0},
    )
    texts = {r["doc_id"]: r["text"] for r in res.df.collect()}
    assert sorted(texts) == [1, 2, 3]
    for t in texts.values():
        assert footer not in t
    # the distinct leading content is untouched
    assert texts[1].startswith(_doc(600, n=30).split()[0])


def test_mixture_stage(spark):
    df = spark.createDataFrame(
        [(i, _doc(i), "en" if i < 300 else "de") for i in range(400)],
        ["doc_id", "text", "lang"],
    )
    res = curation.curate(
        df,
        quality_gate=False,
        exact=False,
        near_dup=False,
        mixture={"en": 0.5, "de": 0.5},
        domain_col="lang",
        splits={"train": 1.0},
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in res.df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # de (100 rows at target 0.5) binds and keeps everything; en
    # downsamples toward 100 (md5-bucket granularity at n=300)
    assert by_lang["de"] == 100
    assert abs(by_lang["en"] - 100) <= 25


def test_checkpoint_resume(spark, corpus, bench_df, tmp_path):
    """Decisions-only checkpointing: a rerun loads every expensive
    stage's decision table instead of rebuilding, produces the
    identical corpus, and the stored decision — not a recompute — is
    what drives the output (proven by doctoring the keep-set).
    Changed parameters refuse to resume."""
    root = str(tmp_path / "ckpt")
    kw = dict(
        benchmark=bench_df,
        benchmark_fingerprint="bench-fixture-v1",
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        seq_len=128,
        checkpoint_root=root,
    )
    # a benchmark + checkpoint WITHOUT naming the benchmark is refused
    with pytest.raises(ValueError, match="benchmark_fingerprint"):
        curation.curate(
            corpus, benchmark=bench_df, checkpoint_root=root
        )
    r1 = curation.curate(corpus, **kw)
    assert r1.resumed == []  # fresh root: everything built
    ids1 = sorted(r[0] for r in r1.df.select("doc_id").collect())

    r2 = curation.curate(corpus, **kw)
    assert sorted(r2.resumed) == [
        "contaminated_ids", "exact_keep", "near_dup_keep", "pack_routing",
    ]
    assert sorted(r[0] for r in r2.df.select("doc_id").collect()) == ids1
    # ledger on disk: one committed row per decision, fingerprints equal
    led = spark.read.parquet(f"{root}/ledger").collect()
    assert sorted(led_r["stage"] for led_r in led) == [
        "contaminated_ids", "exact_keep", "near_dup_keep", "pack_routing",
    ]
    assert len({led_r["params_fp"] for led_r in led}) == 1

    # the checkpoint is authoritative: doctor exact_keep (drop doc 0)
    # and the rerun must obey the stored decision, not recompute it
    keep = spark.read.parquet(f"{root}/decisions/exact_keep")
    doctored = keep.filter(F.col("doc_id") != 0)
    doctored.write.mode("overwrite").parquet(f"{root}/decisions/exact_keep_tmp")
    spark.read.parquet(f"{root}/decisions/exact_keep_tmp").write.mode(
        "overwrite"
    ).parquet(f"{root}/decisions/exact_keep")
    r3 = curation.curate(corpus, **kw)
    ids3 = {r[0] for r in r3.df.select("doc_id").collect()}
    assert 0 not in ids3 and 1 in ids3

    # changed stage parameters -> stale decisions refused
    with pytest.raises(ValueError, match="different curation parameters"):
        curation.curate(corpus, **{**kw, "seq_len": 256})


def test_curate_cli_end_to_end_and_resume(spark, tmp_path):
    """The spark-submit surface (clp_core_spark.curate_job): reads a
    parquet documents table, writes the curated corpus partitioned by
    split, emits the stage ledger JSON; a second run against the same
    checkpoint root resumes every expensive decision."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = str(tmp_path / "docs")
    rows = [(i, _doc(i), ["web", "code"][i % 2]) for i in range(60)]
    rows.append((500, _doc(0), "web"))  # exact duplicate
    spark.createDataFrame(rows, ["doc_id", "text", "domain"]).write.parquet(docs)

    def run(out_name):
        metrics = str(tmp_path / f"{out_name}.json")
        proc = subprocess.run(
            [
                sys.executable, "-m", "clp_core_spark.curate_job",
                "--input", docs,
                "--output", str(tmp_path / out_name),
                "--checkpoint-root", str(tmp_path / "ckpt"),
                "--seq-len", "128",
                "--master", "local[4]",
                "--shuffle-partitions", "8",
                "--metrics-out", metrics,
            ],
            capture_output=True, text=True,
            env=dict(os.environ, PYTHONPATH=repo), timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(open(metrics).read())

    m1 = run("out1")
    assert m1["resumed"] == []
    by_stage = {s["stage"]: s for s in m1["stages"]}
    assert by_stage["exact_dedup"]["rows_out"] == by_stage["exact_dedup"]["rows_in"] - 1
    assert os.path.isdir(str(tmp_path / "out1" / "split=train"))

    m2 = run("out2")
    assert sorted(m2["resumed"]) == ["exact_keep", "near_dup_keep", "pack_routing"]
    assert [s["rows_out"] for s in m2["stages"]] == [
        s["rows_out"] for s in m1["stages"]
    ]
