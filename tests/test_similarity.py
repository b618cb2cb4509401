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
