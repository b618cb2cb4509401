"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k — the exact baseline; dot product is a single
  JVM ``aggregate``/``zip_with`` expression, ranked by
  TakeOrderedAndProject (bounded per-partition heap + merge, no global
  sort — the same plan CLP's top-k OutputHandler implements by hand,
  clp/clo/OutputHandler.hpp:146-220).
- LSH-bucketed (random hyperplane signs) — the scale path: the corpus is
  scanned once to bucket signatures; queries probe only matching buckets
  (optionally with multi-probe on neighboring signs).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType


def _dot(a: Column, b: Column) -> Column:
    # Widen each element BEFORE multiplying so the arithmetic is pure
    # float64 (bit-identical to a double-precision reference).
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


@pandas_udf(DoubleType())
def _cosine_pair_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-batched cosine over vector PAIRS, numerically identical to
    :func:`cosine_sim`: the accumulation loops run over vector positions
    in ascending order with a float64 accumulator per pair — the exact
    addition order of the JVM ``aggregate`` chain — so results are
    bit-equal while replacing three interpreted per-element HOF walks
    per pair (the dominant cost of candidate verification: 2.2s for 90k
    pairs x 64 dims at bench scale, ~0.05s vectorized)."""
    import numpy as np

    n = len(va)
    out = np.empty(n, dtype=object)
    va_np, vb_np = va.to_numpy(), vb.to_numpy()
    la = np.fromiter(
        (len(x) if x is not None else -1 for x in va_np), dtype=np.int64,
        count=n,
    )
    lb = np.fromiter(
        (len(x) if x is not None else -2 for x in vb_np), dtype=np.int64,
        count=n,
    )
    # mismatched-length pairs: the JVM form's zip_with pads with null and
    # the null-poisoned denom falls through when().otherwise(0.0) — keep
    # that 0.0 instead of letting vstack raise on ragged input
    ragged = (la != lb) & (la >= 0) & (lb >= 0)
    for i in np.nonzero(ragged)[0]:
        out[i] = 0.0
    # vectorize per distinct (equal) vector length
    eq = la == lb
    for length in np.unique(la[eq]):
        if length < 0:
            continue  # null vector on either side -> stays None
        idx = np.nonzero(eq & (la == length))[0]
        if not len(idx):
            continue
        A = np.vstack(va_np[idx]).astype(np.float64)
        B = np.vstack(vb_np[idx]).astype(np.float64)
        dot = np.zeros(len(idx), dtype=np.float64)
        na = np.zeros(len(idx), dtype=np.float64)
        nb = np.zeros(len(idx), dtype=np.float64)
        for j in range(A.shape[1]):
            x, y = A[:, j], B[:, j]
            dot = dot + x * y
            na = na + x * x
            nb = nb + y * y
        denom = np.sqrt(na) * np.sqrt(nb)
        cos = np.where(denom > 0, dot / np.where(denom > 0, denom, 1.0), 0.0)
        for k, i in enumerate(idx):
            out[i] = float(cos[k])
    return pd.Series(out)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector. The query vector is a
    plan constant (no broadcast join needed); orderBy+limit compiles to
    TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)


def _hyperplane(dim: int, plane_ix: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component j is a
    signed value derived from a splitmix-style integer mix of
    (plane_ix, j). Reproducible across runs/executors with no RNG state."""
    comps = []
    for j in range(dim):
        z = (plane_ix * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z = (z ^ (z >> 31)) * 0x94D049BB133111EB & ((1 << 64) - 1)
        comps.append(((z >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return comps


def hyperplane_signature(vec_col: Column, dim: int, num_planes: int = 16) -> Column:
    """Bit i = sign(dot(vec, plane_i)); packed into a long. One Arrow
    batch matmul ``(n, dim) @ (dim, planes)`` per batch (BLAS). The
    earlier per-plane ``aggregate`` HOF form inlined planes*dim float
    literals into the plan — at bench scale its codegen/compile cost
    exceeded its runtime (measured 3.9s HOF vs 3.0s matmul on 2k rows,
    identical signatures), and interpreted HOF loses to matmul
    asymptotically as well. Query-side signatures (lsh_topk) already
    use the same float64 numpy dot."""
    import numpy as np

    planes = np.array(
        [_hyperplane(dim, i) for i in range(num_planes)], dtype=np.float64
    ).T
    bits = np.uint64(1) << np.arange(num_planes, dtype=np.uint64)

    @pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        # NULL vectors stay NULL (a zero substitute would give every
        # null row the deterministic all-ones signature and silently
        # land them all in one shared LSH bucket — spurious candidates);
        # null signatures fall out of the downstream equality joins.
        out = np.empty(len(vecs), dtype=object)
        idx = [i for i, v in enumerate(vecs) if v is not None]
        if idx:
            m = np.vstack(
                [np.asarray(vecs.iloc[i], dtype=np.float64) for i in idx]
            )
            signs = (m @ planes) >= 0
            sigs = (signs.astype(np.uint64) * bits).sum(axis=1).astype(np.int64)
            for j, i in enumerate(idx):
                out[i] = int(sigs[j])
        return pd.Series(out)

    # nondeterministic marking (guide §4.4): callers filter on the
    # signature column (bucket probes, null drops); without it the filter
    # pushes below the projection and the matmul kernel evaluates TWICE
    # per scan. The function is in fact deterministic — the marking only
    # pins one evaluation.
    return _sig.asNondeterministic()(vec_col)


def ivf_centroids(dim: int, nlist: int) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids (seeded splitmix
    directions, seed space disjoint from the LSH planes). Data-independent
    on purpose: both engines — and the SQL oracle — can reproduce them
    exactly; a k-means-trained codebook would plug into the same
    assignment expression."""
    return [_hyperplane(dim, 1000 + i) for i in range(nlist)]


def ivf_assign(vec_col: Column, dim: int, nlist: int) -> Column:
    """1-based IVF cell = argmax dot(vec, centroid_i) (spherical coarse
    quantization; first index wins ties — numpy argmax takes the first
    maximum, matching DuckDB's list_position for the oracle). One
    ``(n, dim) @ (dim, nlist)`` matmul per Arrow batch — the inlined
    per-centroid aggregate form carried nlist*dim float literals into
    the plan (see hyperplane_signature for the same trade measured)."""
    import numpy as np

    cents = np.array(ivf_centroids(dim, nlist), dtype=np.float64).T

    @pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        # NULL vectors get a NULL cell (zero substitution always argmaxed
        # to cell 1, silently mixing null rows into real probes); null
        # cells fail the probe isin() and never reach scoring.
        out = np.empty(len(vecs), dtype=object)
        idx = [i for i, v in enumerate(vecs) if v is not None]
        if idx:
            m = np.vstack(
                [np.asarray(vecs.iloc[i], dtype=np.float64) for i in idx]
            )
            cells = (m @ cents).argmax(axis=1) + 1
            for j, i in enumerate(idx):
                out[i] = int(cells[j])
        return pd.Series(out)

    # see hyperplane_signature: probes filter on the cell column —
    # without the marking the assign kernel evaluates twice per scan
    return _assign.asNondeterministic()(vec_col)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: rows are bucketed into ``nlist`` cells
    by nearest centroid; the query scores only the ``nprobe`` cells whose
    centroids best match it. At scale the cell column is precomputed and
    the table partitioned/bucketed by it, so a probe is a
    partition-pruned scan of nprobe/nlist of the data (the IVF inverted
    lists as table partitions)."""
    dim = len(query_vec)
    cents = ivf_centroids(dim, nlist)
    assigned = df.withColumn("_cell", ivf_assign(F.col(vec_col), dim, nlist))
    # query-side cell ranking, sequential double sums (same arithmetic as
    # the engine/oracle; ties break to the lower cell index)
    qd = [float(sum(q * c for q, c in zip(query_vec, cent))) for cent in cents]
    probe = [i + 1 for i in sorted(range(nlist), key=lambda i: (-qd[i], i))[:nprobe]]
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = assigned.filter(F.col("_cell").isin(probe))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), qarr), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    max_hamming: int = 4,
    chunks: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine(a, b) >= ``threshold``,
    with candidate generation by hyperplane-signature Hamming blocking
    (pigeonhole over ``chunks`` signature chunks guarantees recall up to
    ``max_hamming`` differing sign bits) and exact cosine verification on
    candidates only. Returns (id_a, id_b, cosine_sim), id_a < id_b.

    Random-hyperplane LSH bounds the collision angle: P[sign differs per
    plane] = angle/pi, so high-cosine pairs differ in few sign bits and a
    Hamming cutoff is a recall-complete pre-filter at the near-dup margin
    (same blocking shape as dedup.simhash_near_pairs — linear shuffle of
    (chunk, id), never all-pairs)."""
    from clp_core_spark.operators.dedup import fan_out

    if chunks is None:
        chunks = max_hamming + 1
    if dim is None:
        # the array type doesn't carry a length; the caller knows the
        # embedding width (a driver-side limit-1 probe here would be a
        # hidden job per call — at scale, one per pipeline stage)
        raise ValueError("pass dim= (embedding width) explicitly")
    # signature math is interpreted (HOF dot products); a small input left
    # in 1-4 scan splits would compute it single-threaded — fan out first
    # (no-op at scale, where the scan yields many splits)
    src = fan_out(df)
    # localCheckpoint: both self-join sides (and every AQE re-plan) read
    # the materialized (id, sig) relation, so the signature matmul kernel
    # runs ONCE — the former repartition-for-ReuseExchange did not
    # survive AQE's broadcast conversion at bench scale (runtime-plan
    # audit, round 6: the kernel re-ran per join side); see
    # dedup.minhash_lsh_pairs for the same fix.
    sig = src.select(
        F.col(id_col).alias("_id"),
        hyperplane_signature(F.col(vec_col), dim, num_planes).alias("_sig"),
    ).localCheckpoint(eager=False)
    width = -(-num_planes // chunks)  # ceil: chunk i covers bits [i*w, ...)
    # the banded relation carries (id, sig, chunk) only — ~28 B/row; the
    # Hamming cutoff runs BEFORE dedup so near-true-pair counts (not raw
    # bucket collisions) flow downstream, and vectors re-attach only to
    # survivors (same slimming as dedup.minhash_lsh_pairs)
    chunked = sig.select(
        "_id", "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_sig"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("_chunk_ix", "_chunk"),
    )
    left, right = chunked.alias("l"), chunked.alias("r")
    ham = F.bit_count(F.col("l._sig").bitwiseXOR(F.col("r._sig")))
    cand = (
        left.join(
            right,
            (F.col("l._chunk_ix") == F.col("r._chunk_ix"))
            & (F.col("l._chunk") == F.col("r._chunk"))
            & (F.col("l._id") < F.col("r._id"))
            & (ham <= max_hamming),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # explicit-N repartition: AQE's advisory size judges the pair set
        # by its slim (id, id) shuffle bytes and coalesces the verify
        # stage to ONE partition — but the stage then widens every row
        # with two embedding vectors and runs the cosine kernel, so the
        # whole verification serialized on one core (REST stage audit:
        # a single 2.1s task). A user-specified partition count is exempt
        # from AQE coalescing; defaultParallelism keeps it cluster-sized.
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col("id_a")
        )
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    v_a = vecs.select(F.col("_vid").alias("id_a"), F.col("_v").alias("v_a"))
    v_b = vecs.select(F.col("_vid").alias("id_b"), F.col("_v").alias("v_b"))
    scored = cand.join(v_a, "id_a").join(v_b, "id_b").withColumn(
        "cosine_sim",
        F.round(_cosine_pair_udf(F.col("v_a"), F.col("v_b")), 6),
    )
    return scored.filter(F.col("cosine_sim") >= threshold).select(
        "id_a", "id_b", "cosine_sim"
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    multiprobe_bits: int = 2,
) -> DataFrame:
    """Approximate cosine top-k: probe the query's hyperplane bucket plus
    all buckets within ``multiprobe_bits`` sign flips, score only those
    rows.

    At scale the signature column is precomputed/persisted and the probe
    becomes a partition-prunable equality filter."""
    dim = len(query_vec)
    sig_col = hyperplane_signature(F.col(vec_col), dim, num_planes)
    bucketed = df.withColumn("_sig", sig_col)

    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    qsig = 0
    for i in range(num_planes):
        plane = np.array(_hyperplane(dim, i))
        if float(q @ plane) >= 0:
            qsig |= 1 << i
    probes = {qsig}
    if multiprobe_bits >= 1:
        for i in range(num_planes):
            probes.add(qsig ^ (1 << i))
    if multiprobe_bits >= 2:
        for i in range(num_planes):
            for j in range(i + 1, num_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))

    cand = bucketed.filter(F.col("_sig").isin([int(p) for p in probes]))
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), qarr), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — asymmetric-distance top-k


def pq_codebooks(
    dim: int, m: int = 8, ksub: int = 16
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: ``m`` sub-quantizers, each with
    ``ksub`` centroids of width ``dim // m`` (seed space 20000+, disjoint
    from the LSH planes and IVF centroids). Data-independent for the same
    reason as ivf_centroids — both engines and the SQL oracle reproduce
    them exactly; a k-means-trained codebook (sample → driver-side Lloyd
    → broadcast, tiny either way: m*ksub*dsub floats) plugs into the same
    encode/score expressions unchanged."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return [
        [_hyperplane(dsub, 20000 + j * ksub + c) for c in range(ksub)]
        for j in range(m)
    ]


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    sample: int = 100_000,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Data-trained PQ codebooks: k-means (Lloyd) per subspace over a
    bounded DETERMINISTIC sample — the ``sample`` vectors with the
    smallest content hash (TakeOrderedAndProject: per-partition heap +
    merge, no global sort), so the trained books are identical across
    runs, partitionings, and cluster sizes, where a bare ``limit()``
    would return whatever partitions answered first. The collect is
    bounded regardless of corpus size (100k × dim float64 ≈ 50 MB for
    dim=64) and training is m independent tiny k-means runs in numpy
    (seconds). The trained books drop into pq_encode/pq_topk unchanged;
    centroids initialize from the deterministic pq_codebooks. Empty
    clusters keep their previous centroid (the standard Lloyd
    fallback)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(vec_col)), F.col(vec_col).cast("string"))
        .limit(sample)
        .collect()
    )
    if not rows:
        return pq_codebooks(dim, m, ksub)
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    books = np.array(pq_codebooks(dim, m, ksub), dtype=np.float64)
    sub = mat.reshape(mat.shape[0], m, dsub)
    for j in range(m):
        x = sub[:, j, :]  # (n, dsub)
        cents = books[j].copy()  # (ksub, dsub)
        for _ in range(iters):
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(ksub):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return [[[float(v) for v in c] for c in books[j]] for j in range(m)]


def pq_encode(
    vec_col: Column,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    books: list[list[list[float]]] | None = None,
) -> Column:
    """PQ codes: split the vector into ``m`` subvectors and store, per
    subvector, the index of the nearest codebook centroid by squared L2
    (Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011). Returns array<int> of length m; NULL vectors
    get a NULL code (same rationale as hyperplane_signature). One
    broadcasted ``(n, m, 1, dsub) - (m, ksub, dsub)`` numpy pass per
    Arrow batch; argmin takes the FIRST minimum, matching the oracle's
    list_position. ``books`` defaults to the deterministic pq_codebooks
    (SQL-reproducible); pass pq_train output for data-trained centroids.
    At 100 TB the code column is the at-rest format: m small ints per
    vector ≈ 16-32× smaller than the float32 array, and search never
    reads the raw vectors."""
    import numpy as np

    from pyspark.sql.types import ArrayType, IntegerType

    books = np.array(
        books if books is not None else pq_codebooks(dim, m, ksub),
        dtype=np.float64,
    )
    dsub = dim // m

    @pandas_udf(ArrayType(IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=object)
        idx = [i for i, v in enumerate(vecs) if v is not None]
        if idx:
            mat = np.vstack(
                [np.asarray(vecs.iloc[i], dtype=np.float64) for i in idx]
            )
            sub = mat.reshape(mat.shape[0], m, dsub)
            diff = sub[:, :, None, :] - books[None, :, :, :]
            codes = np.einsum("nmkd,nmkd->nmk", diff, diff).argmin(axis=2)
            for j, i in enumerate(idx):
                out[i] = [int(x) for x in codes[j]]
        return pd.Series(out)

    # see hyperplane_signature: pq_topk filters on the code column —
    # without the marking the encode kernel evaluates twice per scan
    return _enc.asNondeterministic()(vec_col)


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: the query builds an m × ksub
    lookup table of exact subspace squared distances driver-side (pure
    Python floats — tiny), and each row's approximate distance is m
    literal-array lookups summed JVM-side: ``element_at(lut_j,
    code[j]+1)`` chained with ``+`` — whole-stage codegen, no per-row
    Python in the scoring scan, and once codes are materialized the scan
    reads only (id, code), never the embedding column. Returns
    (id, adc_dist) ascending (smaller = nearer), ties broken by id.
    ADC ranks by L2 — equivalent to cosine order for unit-normalized
    embeddings."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    coded = df.select(
        F.col(id_col),
        pq_encode(F.col(vec_col), dim, m, ksub, books=books).alias("_code"),
    ).filter(F.col("_code").isNotNull())  # null vectors never rank
    return pq_topk_coded(
        coded, query_vec, k=k, id_col=id_col, code_col="_code",
        m=m, ksub=ksub, books=books,
    )


def pq_topk_coded(
    coded: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    m: int = 8,
    ksub: int = 16,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """ADC top-k over a PRE-MATERIALIZED code table — the at-rest shape:
    the corpus's (id, pq_code) table is written once (pq_encode at ingest)
    and every query scans only those two columns; the embedding column
    never loads. Scoring is m ``element_at`` lookups into the query's
    literal LUT arrays chained with ``+`` — pure whole-stage codegen, so
    a 100 TB corpus's ANN query is one slim columnar scan + a bounded
    per-partition top-k heap (TakeOrderedAndProject), no shuffle of
    anything but k rows per partition."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    if books is None:
        books = pq_codebooks(dim, m, ksub)
    q = [float(x) for x in query_vec]
    lut: list[list[float]] = []
    for j in range(m):
        row = []
        for c in range(ksub):
            acc = 0.0
            for d in range(dsub):
                t = q[j * dsub + d] - books[j][c][d]
                acc += t * t
            row.append(acc)
        lut.append(row)

    score = None
    for j in range(m):
        # try_element_at: a code outside [0, ksub) (e.g. a table written
        # with a larger ksub) yields NULL instead of ANSI
        # ArrayIndexOutOfBounds, and the null-dist filter below drops the
        # row — an incompatible table returns no rows rather than failing
        # the whole scan (or, worse, topping the asc ranking with nulls)
        term = F.try_element_at(
            F.array(*[F.lit(v) for v in lut[j]]),
            F.col(code_col)[j] + F.lit(1),
        )
        score = term if score is None else score + term
    out = coded.filter(F.col(code_col).isNotNull()).select(
        F.col(id_col), F.round(score, 6).alias("adc_dist")
    )
    out = out.filter(F.col("adc_dist").isNotNull())
    return out.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)
