"""Dedup operators over a planted corpus: exact copies, near-dups (one
word changed), and unrelated docs."""

import pyspark.sql.functions as F
import pytest

from clp_core_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the tall green trees"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit => jaccard ~ 0.9
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution kernels"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, OTHER)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["n_copies"] for r in dedup.exact_dedup(docs).collect()}
    assert out == {0: 2, 2: 1, 3: 1}


def test_ngram_jaccard_pairs(docs):
    rows = dedup.ngram_jaccard_all_pairs(docs, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_sim"] for r in rows}
    assert pairs[(0, 1)] == 1.0
    assert 0.7 < pairs[(0, 2)] < 1.0
    assert pairs[(0, 2)] == pairs[(1, 2)]
    assert len(pairs) == 3  # no pair involves doc 3


def test_minhash_lsh_finds_planted_pairs(docs):
    rows = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in rows}
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_minhash_agrees_with_exact_jaccard(docs):
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    exact = dedup.ngram_jaccard_all_pairs(docs, threshold=0.5)
    assert sorted(map(tuple, lsh.collect())) == sorted(map(tuple, exact.collect()))


def test_simhash_identical_and_near(docs, spark):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text -> identical signature
    ham_near = bin((sh[0] ^ sh[2]) & (2**64 - 1)).count("1")
    ham_far = bin((sh[0] ^ sh[3]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far


def test_simhash_near_pairs(docs):
    rows = dedup.simhash_near_pairs(docs, max_hamming=10).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_shingles_empty_and_short(spark):
    df = spark.createDataFrame([(0, ""), (1, "two words")], "doc_id long, text string")
    out = df.select(F.size(dedup.word_shingles(F.col("text"), 3)).alias("n")).collect()
    assert [r["n"] for r in out] == [0, 0]


def test_minhash_arbitrary_k(docs):
    """num_hashes is a real tunable again: coefficients generate on
    demand for any K (closed-form splitmix), and K=128 produces the
    same verified pair set as the default 64 on this corpus."""
    rows = dedup.minhash_lsh_pairs(
        docs, num_hashes=128, bands=32, threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, 1), (0, 2), (1, 2)}
    # K=64's signature is a prefix of K=128's (same k-indexed family)
    sig64 = docs.select(
        dedup.minhash_signature(dedup.word_shingles(F.col("text"), 3), 64
                                ).alias("s")).first()["s"]
    sig128 = docs.select(
        dedup.minhash_signature(dedup.word_shingles(F.col("text"), 3), 128
                                ).alias("s")).first()["s"]
    assert sig128[:64] == sig64


def test_near_dup_clusters_transitive(spark):
    """Cluster resolution must be TRANSITIVE: a~b and b~c put all three
    under canonical a even if (a, c) was never emitted as a pair —
    pairwise filtering cannot express this. Chains longer than one hop
    converge via repeated label propagation; singletons stay their own
    canonical."""
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10, 11, 20)], "doc_id long"
    )
    # one 5-chain (worst case for propagation: a path, not a star),
    # one 2-clique, one singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.near_dup_clusters(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_near_dup_clusters_empty_pairs(spark):
    docs = spark.createDataFrame([(7,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup.near_dup_clusters(docs, pairs).collect()}
    assert got == {7: 7, 9: 9}


def test_minhash_lsh_invalid_band_config(spark):
    """num_hashes must be a positive multiple of bands: rows_per_band==0
    would put every doc in one shared bucket per band (silent O(n^2)
    self-join), and a non-multiple would silently drop trailing hashes."""
    docs = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of bands"):
        dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=32)
    with pytest.raises(ValueError, match="multiple of bands"):
        dedup.minhash_lsh_pairs(docs, num_hashes=48, bands=32)


def test_near_dup_clusters_nonconvergence_raises(spark):
    """With algorithm='label', a component whose diameter exceeds
    max_iters must raise, not silently return a split cluster (several
    'canonical' copies of one duplicate group); the default 'auto'
    escalates the same case to the alternating-star algorithm and
    returns the correct single cluster."""
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.near_dup_clusters(docs, chain, max_iters=1, algorithm="label")
    # the same under-budgeted call escalates instead of failing
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup.near_dup_clusters(docs, chain, max_iters=1).collect()}
    assert got == {i: 1 for i in range(1, 6)}
    # and converges by propagation alone with an adequate budget
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup.near_dup_clusters(docs, chain, max_iters=10).collect()}
    assert set(got.values()) == {1}
    with pytest.raises(ValueError, match="algorithm"):
        dedup.near_dup_clusters(docs, chain, algorithm="bogus")


def _uf_oracle(n_nodes, edges):
    """Pure-python union-find ground truth: node -> component min."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def test_connected_components_star_deep_path(spark):
    """The alternating-star algorithm resolves a 120-node PATH — the
    diameter-adversarial shape where per-hop label propagation needs 119
    rounds — within its O(log n) budget."""
    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["label"]
           for r in dedup.connected_components(pairs, max_rounds=20).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_star_matches_union_find(spark):
    """Property: on random graphs (mixed stars, paths, cliques,
    singletons-in-pairs), star components equal a union-find oracle."""
    import random

    rng = random.Random(17)
    for trial in range(3):
        n = 60
        edges = set()
        while len(edges) < 45:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
        got = {r["id"]: r["label"]
               for r in dedup.connected_components(pairs).collect()}
        oracle = _uf_oracle(n, edges)
        touched = {x for e in edges for x in e}
        assert got == {x: oracle[x] for x in touched}, f"trial={trial}"


def test_connected_components_self_pair_only_node(spark):
    """Contract: every node appearing in `pairs` gets a row — including
    one whose only pair is reflexive (x, x), which owns no real edge."""
    pairs = spark.createDataFrame(
        [(1, 2), (7, 7)], "id_a long, id_b long"
    )
    got = {r["id"]: r["label"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


def test_simhash_excludes_shingleless_docs(spark):
    """Docs with fewer than shingle_n tokens carry no signal; they must
    be EXCLUDED, not given a shared degenerate signature — a common
    signature would bucket every short doc together (quadratic
    self-join) and report all of them as hamming-0 near-dups."""
    df = spark.createDataFrame(
        [(0, "foo bar"), (1, "hello world"), (2, ""), (3, None),
         (4, BASE), (5, BASE)],
        "doc_id long, text string",
    )
    sigs = dedup.simhash(df, shingle_n=3)
    assert {r["doc_id"] for r in sigs.collect()} == {4, 5}
    pairs = dedup.simhash_near_pairs(df, max_hamming=3, shingle_n=3)
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(4, 5)]


def test_duplicate_spans_whitespace_run_separators(spark):
    """A boilerplate paragraph pasted with newline / double-space
    separators in one doc and single spaces in another is the same
    token sequence — tokenization is whitespace-RUN based like the
    rest of the curation family, so the span is still found."""
    boiler = "all rights reserved contact the site administrator for terms"
    a = "unique preface words here " + boiler
    b = "other document text\n" + boiler.replace(" reserved ", "  reserved\t")
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    spans = dedup.duplicate_spans(df, k=9).collect()
    assert {r["doc_id"] for r in spans} == {0, 1}
    by_id = {r["doc_id"]: r for r in spans}
    assert by_id[0]["span_tokens"] == 9  # the 9-token boilerplate
    assert by_id[0]["span_start"] == 4  # after the 4 preface tokens


def test_remove_duplicate_spans_excises_boilerplate(spark):
    """The rewrite step: flagged spans vanish from every doc, untouched
    docs keep their text verbatim, and the excision offsets line up
    with duplicate_spans' own tokenization (whitespace runs)."""
    boiler = "copyright acme corp all rights reserved worldwide forever"
    a = "alpha beta gamma " + boiler + " delta"
    b = boiler + "  epsilon\tzeta eta theta iota kappa"
    c = "totally unrelated text with eight distinct tokens q w"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    spans = dedup.duplicate_spans(df, k=8)
    out = {r["doc_id"]: r["text_deduped"]
           for r in dedup.remove_duplicate_spans(df, spans).collect()}
    assert out[0] == "alpha beta gamma delta"
    assert out[1] == "epsilon zeta eta theta iota kappa"
    assert out[2] == c  # no spans -> byte-identical original


def test_near_dup_clusters_star_algorithm(spark):
    """algorithm='star' goes straight to the star components and keeps
    the output contract (every df row labeled; singletons themselves)."""
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], "doc_id long")
    pairs = spark.createDataFrame([(3, 2), (2, 1), (4, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup.near_dup_clusters(docs, pairs, algorithm="star").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}
    # empty pair set through the star path
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup.near_dup_clusters(docs, empty, algorithm="star").collect()}
    assert got == {i: i for i in (1, 2, 3, 4, 9)}


# ---------------------------------------------------------------------------
# duplicate_spans (exact-substring dedup, token-window formulation)


BOILER = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (0, "intro one two three " + BOILER + " outro four five six"),
        (1, "different start words here " + BOILER + " plus unrelated tail"),
        (2, "standalone doc with entirely unique token content herein"),
        (3, "standalone doc with entirely unique token content herein"),
        # within-doc repetition ONLY -- must produce no span (>=2 DISTINCT docs)
        (4, "loop turn loop turn loop turn loop turn loop turn loop turn"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_boilerplate(span_docs):
    out = dedup.duplicate_spans(span_docs, k=4)
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): (
            r["span_tokens"],
            r["n_windows"],
        )
        for r in out.collect()
    }
    # boilerplate occupies tokens 4..11 in docs 0 and 1 (4-token prefixes);
    # only windows fully inside it recur (context differs), so the maximal
    # span is exactly the 8-token paragraph: 5 windows (starts 4..8)
    assert spans[(0, 4, 11)] == (8, 5)
    assert spans[(1, 4, 11)] == (8, 5)
    # docs 2 and 3 are verbatim copies: the whole 8-token doc is one span
    assert spans[(2, 0, 7)] == (8, 5)
    assert spans[(3, 0, 7)] == (8, 5)
    # doc 4 repeats windows only WITHIN itself; doc 5 is shorter than k
    assert len(spans) == 4


def test_duplicate_spans_split_by_edit(spark):
    a = "zero one two three four five six seven eight nine ten eleven"
    b = a.replace("five", "FIVE")  # one-token edit mid-document
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    out = dedup.duplicate_spans(df, k=3)
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in out.collect()
    )
    # the edit at token 5 kills windows starting at 3,4,5; shared runs are
    # tokens 0..4 (windows 0..2) and 6..11 (windows 6..9) in BOTH docs
    assert spans == [(0, 0, 4), (0, 6, 11), (1, 0, 4), (1, 6, 11)]


def test_duplicate_spans_k_validation(span_docs):
    with pytest.raises(ValueError):
        dedup.duplicate_spans(span_docs, k=1)


def test_duplicate_spans_null_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(df, k=4).collect()
    )
    assert spans == [(1, 0, 3), (2, 0, 3)]


def test_minhash_whitespace_run_tokenization(spark):
    """The fused shingle-hash kernel tokenizes on whitespace RUNS
    (str.split() == the \\s+ regex the string shingler used), so tab /
    double-space separators yield the same shingle set."""
    df = spark.createDataFrame(
        [(0, "a b  c\td e f"), (1, "a b c d e f"), (2, "q r s t u v")],
        "doc_id long, text string",
    )
    rows = dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard_sim"]) for r in rows] == [(0, 1, 1.0)]


# ---------------------------------------------------------------------------
# decontamination (benchmark n-gram overlap)


def _ngram_set(text: str, n: int) -> set:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_exact_string_oracle(spark):
    # deterministic corpus: 40 docs x 30 tokens drawn from a small vocab,
    # plus planted contamination: docs 0-4 embed a verbatim 13-token
    # window of benchmark doc (i % 2); doc 5 is an exact benchmark copy.
    def words(seed, m, vocab):
        x = seed
        out = []
        for _ in range(m):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            out.append(f"w{x % vocab}")
        return out

    bench_rows = [(b, " ".join(words(1000 + b, 25, 50000))) for b in range(5)]
    doc_rows = []
    for d in range(40):
        toks = words(d, 30, 200)  # tiny vocab => docs share 1-grams, never 13-grams
        if d < 5:
            frag = bench_rows[d % 2][1].split()[3:16]  # 13 verbatim bench tokens
            toks = toks[:10] + frag + toks[10:]
        doc_rows.append((d, " ".join(toks)))
    doc_rows.append((40, bench_rows[3][1]))  # exact benchmark copy
    doc_rows.append((41, "short doc under n tokens"))

    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    out = {
        r["doc_id"]: (r["contaminated"], r["n_contaminated_ngrams"])
        for r in dedup.decontaminate(docs, bench, n=13).collect()
    }

    bench_grams = set().union(*(_ngram_set(t, 13) for _, t in bench_rows))
    for d, text in doc_rows:
        expect = len(_ngram_set(text, 13) & bench_grams)
        assert out[d] == (expect > 0, expect), f"doc {d}"
    assert out[40] == (True, 25 - 13 + 1)  # exact copy: every window hits
    assert [d for d, v in sorted(out.items()) if v[0]] == [0, 1, 2, 3, 4, 40]


def test_decontaminate_preserves_input_rows_and_rejects_bad_n(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    bench = spark.createDataFrame([(0, "x y z")], "bench_id long, text string")
    out = dedup.decontaminate(docs, bench, n=2)
    assert out.count() == 1 and out.columns[-2:] == [
        "n_contaminated_ngrams",
        "contaminated",
    ]
    with pytest.raises(ValueError):
        dedup.decontaminate(docs, bench, n=1)
