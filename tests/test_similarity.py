"""Similarity search: brute-force cosine correctness vs numpy, and LSH
recall of the exact top match."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from clp_core_spark.operators import similarity

DIM = 16
N = 200


def _vec(i: int) -> list[float]:
    rng = np.random.RandomState(i)
    v = rng.randn(DIM)
    return [float(x) for x in v]


@pytest.fixture(scope="module")
def embeddings(spark):
    rows = [(i, _vec(i)) for i in range(N)]
    # vec 199 is a near-copy of vec 0 (tiny perturbation)
    near = [x + 0.01 for x in _vec(0)]
    rows[199] = (199, near)
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_matches_numpy(embeddings):
    q = _vec(0)
    out = similarity.brute_force_topk(embeddings, q, k=5).collect()
    got = [(r["vec_id"], r["cosine_sim"]) for r in out]

    qa = np.array(q)
    sims = []
    for i in range(N):
        v = np.array(_vec(i) if i != 199 else [x + 0.01 for x in _vec(0)], dtype=np.float32)
        v = v.astype(np.float64)
        sims.append((i, float(qa @ v / (np.linalg.norm(qa) * np.linalg.norm(v)))))
    sims.sort(key=lambda t: (-round(t[1], 6), t[0]))
    expect = [(i, round(s, 6)) for i, s in sims[:5]]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[1] - e[1]) < 1e-6


def test_topk_is_query_and_near_copy_first(embeddings):
    out = similarity.brute_force_topk(embeddings, _vec(0), k=2).collect()
    assert [r["vec_id"] for r in out] == [0, 199]


def test_lsh_finds_near_copy(embeddings):
    out = similarity.lsh_topk(embeddings, _vec(0), k=5).collect()
    ids = [r["vec_id"] for r in out]
    # the query vector itself and its near-copy hash to the same bucket
    assert 0 in ids and 199 in ids
    assert ids[0] == 0 and ids[1] == 199


def test_lsh_subset_of_bruteforce_scores(embeddings):
    q = _vec(7)
    brute = {
        r["vec_id"]: r["cosine_sim"]
        for r in similarity.brute_force_topk(embeddings, q, k=N).collect()
    }
    for r in similarity.lsh_topk(embeddings, q, k=10).collect():
        assert abs(brute[r["vec_id"]] - r["cosine_sim"]) < 1e-9


def test_cosine_near_pairs_finds_planted_pair(embeddings):
    """The planted near-copy (0, 199) must survive Hamming blocking and
    the pairs' cosines must equal brute-force recomputation."""
    out = similarity.cosine_near_pairs(
        embeddings, threshold=0.9, num_planes=16, max_hamming=4, dim=DIM
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in out}
    assert (0, 199) in pairs and pairs[(0, 199)] > 0.99


def test_cosine_near_pairs_verify_is_exact(embeddings):
    """Every emitted pair really has cosine >= threshold AND signature
    hamming <= cutoff (no unverified candidates leak through)."""
    out = similarity.cosine_near_pairs(
        embeddings, threshold=0.3, num_planes=16, max_hamming=4, dim=DIM
    ).collect()
    assert out, "expected at least the planted pair"
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in embeddings.collect()}
    for r in out:
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cosine_sim"]) < 1e-6
        assert r["cosine_sim"] >= 0.3


def test_ivf_topk_contains_query_and_near_copy(embeddings):
    out = similarity.ivf_topk(embeddings, _vec(0), k=5, nlist=8, nprobe=3).collect()
    ids = [r["vec_id"] for r in out]
    # the near-copy shares the query's cell (cosine ~1 => same argmax
    # centroid), so IVF must surface both first
    assert ids[0] == 0 and ids[1] == 199


def test_ivf_scores_match_bruteforce(embeddings):
    q = _vec(3)
    brute = {
        r["vec_id"]: r["cosine_sim"]
        for r in similarity.brute_force_topk(embeddings, q, k=N).collect()
    }
    out = similarity.ivf_topk(embeddings, q, k=10, nlist=8, nprobe=3).collect()
    assert out
    for r in out:
        assert abs(brute[r["vec_id"]] - r["cosine_sim"]) < 1e-9


def test_null_embeddings_stay_null_and_pair_free(spark):
    """NULL embedding vectors must yield NULL signatures / NULL IVF
    cells (not the deterministic zero-vector artifacts that dropped
    every null row into one shared bucket) and never surface in
    near-pair output."""
    rows = [(i, _vec(i)) for i in range(20)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, f"vec_id long, embedding array<double>")
    sigs = {r["vec_id"]: r["s"] for r in df.select(
        "vec_id",
        similarity.hyperplane_signature(F.col("embedding"), DIM, 16).alias("s"),
    ).collect()}
    assert sigs[100] is None and sigs[101] is None
    assert sigs[0] is not None
    cells = {r["vec_id"]: r["c"] for r in df.select(
        "vec_id",
        similarity.ivf_assign(F.col("embedding"), DIM, 8).alias("c"),
    ).collect()}
    assert cells[100] is None and cells[101] is None
    out = similarity.cosine_near_pairs(
        df, threshold=0.3, num_planes=16, max_hamming=4, dim=DIM
    ).collect()
    ids = {x for r in out for x in (r["id_a"], r["id_b"])}
    assert 100 not in ids and 101 not in ids


def test_pq_encode_shape_and_determinism(embeddings):
    codes = {
        r["vec_id"]: r["c"]
        for r in embeddings.select(
            "vec_id",
            similarity.pq_encode(F.col("embedding"), DIM, m=4, ksub=8).alias("c"),
        ).collect()
    }
    assert all(len(c) == 4 for c in codes.values())
    assert all(0 <= x < 8 for c in codes.values() for x in c)
    codes2 = {
        r["vec_id"]: r["c"]
        for r in embeddings.select(
            "vec_id",
            similarity.pq_encode(F.col("embedding"), DIM, m=4, ksub=8).alias("c"),
        ).collect()
    }
    assert codes == codes2


def test_pq_exact_on_codebook_points(spark):
    """Vectors built exactly from codebook centroid combinations have
    zero quantization error, so the ADC distance IS the exact squared
    L2 distance and PQ top-k must equal brute-force squared-L2 top-k."""
    m, ksub = 4, 8
    dsub = DIM // m
    books = similarity.pq_codebooks(DIM, m=m, ksub=ksub)
    rng = np.random.RandomState(7)
    combos = [tuple(rng.randint(0, ksub, size=m)) for _ in range(60)]
    vecs = [
        [books[j][c[j]][d] for j in range(m) for d in range(dsub)]
        for c in combos
    ]
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    q = vecs[0]
    out = similarity.pq_topk(df, q, k=10, m=m, ksub=ksub).collect()
    got = [(r["vec_id"], r["adc_dist"]) for r in out]

    exact = sorted(
        (
            (i, round(float(sum((a - b) ** 2 for a, b in zip(v, q))), 6))
            for i, v in enumerate(vecs)
        ),
        key=lambda t: (t[1], t[0]),
    )[:10]
    assert got == exact
    assert got[0] == (0, 0.0)  # the query itself, zero distance


def test_pq_adc_correlates_with_true_distance(embeddings):
    """On arbitrary (non-codebook) data ADC is approximate; assert the
    ranking it induces is strongly rank-correlated with the true squared
    L2 distance (Spearman > 0.5 on 200 random 16-dim vectors)."""
    q = _vec(0)
    out = similarity.pq_topk(embeddings, q, k=N, m=4, ksub=16).collect()
    adc_rank = {r["vec_id"]: rank for rank, r in enumerate(out)}
    qa = np.array(q)
    true = []
    for i in range(N):
        v = np.array(
            _vec(i) if i != 199 else [x + 0.01 for x in _vec(0)],
            dtype=np.float32,
        ).astype(np.float64)
        true.append((i, float(((v - qa) ** 2).sum())))
    true.sort(key=lambda t: t[1])
    true_rank = {i: rank for rank, (i, _) in enumerate(true)}
    n = len(true_rank)
    d2 = sum((adc_rank[i] - true_rank[i]) ** 2 for i in adc_rank)
    spearman = 1 - 6 * d2 / (n * (n * n - 1))
    assert spearman > 0.5, spearman


def test_pq_null_vectors_never_rank(spark):
    rows = [(i, _vec(i)) for i in range(10)] + [(100, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id",
            similarity.pq_encode(F.col("embedding"), DIM, m=4, ksub=8).alias("c"),
        ).collect()
    }
    assert codes[100] is None and codes[0] is not None
    out = similarity.pq_topk(df, _vec(0), k=20, m=4, ksub=8).collect()
    assert 100 not in {r["vec_id"] for r in out}


def test_pq_train_reduces_quantization_error(spark):
    """Lloyd-trained codebooks must reconstruct the data better than the
    data-independent deterministic ones (lower mean squared quantization
    error), be deterministic across runs, and plug into pq_topk."""
    m, ksub = 4, 8
    dsub = DIM // m
    rng = np.random.RandomState(11)
    # clustered data: 5 gaussian blobs, where trained centroids win big
    centers = rng.randn(5, DIM) * 3
    vecs = [
        [float(x) for x in centers[i % 5] + rng.randn(DIM) * 0.3]
        for i in range(300)
    ]
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )

    trained = similarity.pq_train(df, DIM, m=m, ksub=ksub, sample=300, iters=8)
    trained2 = similarity.pq_train(df, DIM, m=m, ksub=ksub, sample=300, iters=8)
    assert trained == trained2  # deterministic
    base = similarity.pq_codebooks(DIM, m=m, ksub=ksub)

    def mse(books):
        b = np.array(books)
        x = np.array(vecs).reshape(len(vecs), m, dsub)
        d = ((x[:, :, None, :] - b[None, :, :, :]) ** 2).sum(axis=3)
        return float(d.min(axis=2).sum(axis=1).mean())

    assert mse(trained) < mse(base) * 0.5, (mse(trained), mse(base))

    out = similarity.pq_topk(
        df, vecs[0], k=5, m=m, ksub=ksub, books=trained
    ).collect()
    assert out[0]["vec_id"] == 0  # the query itself ranks first


def test_pq_topk_coded_matches_inline_and_prunes_scan(spark, tmp_path):
    """The at-rest path: materialize (id, pq_code) to parquet, search the
    code table directly — same results as the inline pq_topk, and the
    scan's ReadSchema must carry ONLY the id and code columns."""
    m, ksub = 4, 8
    rows = [(i, _vec(i)) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "codes")
    df.select(
        "vec_id",
        similarity.pq_encode(F.col("embedding"), DIM, m, ksub).alias("pq_code"),
        F.col("embedding"),  # at rest next to the codes, never scanned
    ).write.parquet(path)

    coded = spark.read.parquet(path)
    q = _vec(0)
    got = similarity.pq_topk_coded(coded, q, k=10, m=m, ksub=ksub).collect()
    want = similarity.pq_topk(df, q, k=10, m=m, ksub=ksub).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in got] == [
        (r["vec_id"], r["adc_dist"]) for r in want
    ]
    plan = similarity.pq_topk_coded(
        coded, q, k=10, m=m, ksub=ksub
    )._jdf.queryExecution().executedPlan().toString()
    import re
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert schemas and all("embedding" not in s for s in schemas), schemas


def test_pq_topk_coded_drops_incompatible_codes(spark):
    """Codes outside [0, ksub) — a table written with a larger ksub —
    must be dropped (try_element_at -> NULL dist -> filtered), not raise
    ANSI ArrayIndexOutOfBounds and not top the asc ranking as nulls."""
    m, ksub = 4, 8
    rows = [(i, _vec(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    coded = df.select(
        "vec_id",
        similarity.pq_encode(F.col("embedding"), DIM, m, ksub).alias("pq_code"),
    )
    # half the table carries out-of-range codes
    poisoned = coded.withColumn(
        "pq_code",
        F.when(
            F.col("vec_id") % 2 == 0,
            F.expr("transform(pq_code, x -> x + 100)"),
        ).otherwise(F.col("pq_code")),
    )
    got = similarity.pq_topk_coded(poisoned, _vec(1), k=20, m=m, ksub=ksub).collect()
    ids = [r["vec_id"] for r in got]
    assert ids and all(i % 2 == 1 for i in ids), ids
    assert all(r["adc_dist"] is not None for r in got)
