"""Document deduplication family for large-scale corpus curation.

The reference dedups *dictionary entries* by exact string
(clp/VariableDictionaryWriter.cpp:7-37); corpus-level near-dup detection
generalizes that to documents. All candidate generation is JVM-side
(xxhash64, array ops, shuffle joins) — Python appears only in the
bit-packing of simhash (vectorized numpy over Arrow batches).

Scale notes (100 TB):
- exact: one hash-shuffle on a 64-bit digest, never on the full text.
- minhash-LSH: per-doc signature is K=64 ints computed map-side; the only
  shuffle is the (band, bucket) self-join, whose fan-out is controlled by
  band count; verification runs on candidate pairs only.
- simhash: 64-bit signature map-side; candidates via banded equality on
  16-bit chunks (Hamming-distance blocking), verified by popcount.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

def fan_out(df: DataFrame) -> DataFrame:
    """Spread a (possibly few-split) input across the cluster before an
    interpreted per-row stage. The split estimate comes from the plan's
    input FILES — a pure driver-side catalog lookup, no RDD lineage and
    no job. File-backed inputs with >= cores files are left alone (at
    scale the scan already yields thousands of splits — no shuffle);
    small or in-memory inputs repartition once. Few FILES can still mean
    many partitions (one multi-GB file scans as many block splits; an
    in-memory relation keeps its own partitioning), so the actual
    partition count is the deciding check — repartition only when it
    would RAISE parallelism, never shrink-and-shuffle."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) >= cores:
        return df
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores)


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content digest; keep the minimum ID as the canonical doc.

    Shuffles a 64-bit digest + id, not the text (two-phase agg: map-side
    partial min/count per digest)."""
    digest = F.xxhash64(F.col(text_col))
    return (
        df.groupBy(digest.alias("digest"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "n_copies")
    )


# ---------------------------------------------------------------------------
# shingling (shared by minhash / jaccard)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a BOUND token-array column:
    sliding window via transform(sequence) -> distinct. Callers must
    materialize the split into its own projection first — an inline
    ``F.split`` here would be re-evaluated per element reference inside
    the lambda (regex x O(n x shingles) per row, measured 15s vs <1s on
    5k documents)."""
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Convenience wrapper (splits inline). Hot paths should pre-split —
    see shingles_from_tokens."""
    return shingles_from_tokens(F.split(text_col, r"\s+"), n)


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(_id, _sh): tokenize + shingle, spread across the cluster.

    Shingle construction is interpreted (higher-order functions don't
    codegen), so per-row cost is real; a small input that the scan left in
    1-4 splits would run it single-threaded. Fan out ONLY when the input
    has fewer partitions than cores — at scale the scan already yields
    thousands of splits and this is a no-op (no shuffle).

    The empty-shingle filter runs BEFORE shingling, on the cheap
    equivalent ``n_tokens >= n``: filtering on ``size(_sh) > 0`` gets
    predicate-pushed below the fan-out exchange with the whole shingle
    expression inlined — one serial re-evaluation of everything in the
    scan task (measured: 8.5s -> sub-second on 5k docs)."""
    slim = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")).filter(
            F.size(F.split(F.col(text_col), r"\s+")) >= n
        )
    )
    return (
        slim.select(
            "_id",
            F.split(F.col("_text"), r"\s+").alias("_toks"),
        )
        .select("_id", shingles_from_tokens(F.col("_toks"), n).alias("_sh"))
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# MinHash + LSH


# universal-hash family for the K minhash permutations: fixed splitmix
# coefficients (odd multipliers), deterministic across runs/executors
# and closed-form in k — any K generates the same prefix
_MH_MASK = (1 << 64) - 1


def _mh_coeffs(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    a = np.array(
        [((k * 0x9E3779B97F4A7C15 + 0x517CC1B727220A95) | 1) & _MH_MASK
         for k in range(num_hashes)],
        dtype=np.uint64,
    )
    b = np.array(
        [(k * 0xBF58476D1CE4E5B9 + 0x2545F4914F6CDD1D) & _MH_MASK
         for k in range(num_hashes)],
        dtype=np.uint64,
    )
    return a, b


def _make_minhash_udf(num_hashes: int):
    """K min-hashes from per-shingle base hashes, vectorized over the
    Arrow batch: the ragged per-doc hash lists flatten once, each of the
    K universal-hash permutations is one multiply-add-shift pass, and
    np.minimum.reduceat takes the per-doc minima (the same
    flatten/reduceat layout as _simhash_udf)."""
    mh_a, mh_b = _mh_coeffs(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def _minhash_udf(hashes: pd.Series) -> pd.Series:
        import numpy as np

        n = len(hashes)
        lens = np.fromiter(
            (len(h) if h is not None else 0 for h in hashes), dtype=np.int64, count=n
        )
        nz = np.nonzero(lens)[0]
        out = np.zeros((n, num_hashes), dtype=np.int64)
        if len(nz):
            vals = hashes.to_numpy()
            flat = np.concatenate(
                [np.asarray(vals[i], dtype=np.int64) for i in nz]
            ).astype(np.uint64)
            starts = np.zeros(len(nz), dtype=np.int64)
            starts[1:] = np.cumsum(lens[nz])[:-1]
            mins = np.empty((len(nz), num_hashes), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for k in range(num_hashes):
                    # >> 3 keeps values int64-positive for the column
                    hk = (flat * mh_a[k] + mh_b[k]) >> np.uint64(3)
                    mins[:, k] = np.minimum.reduceat(hk, starts)
            out[nz] = mins.astype(np.int64)
        return pd.Series(list(out))

    return _minhash_udf


def _batch_window_hashes(
    texts, k: int, split_ws: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch rolling window hashes: ONE pd.util.hash_array call
    over every token of every doc (the per-doc call carried ~120µs of
    fixed overhead — it dominated the kernel at bench scale, 0.84s ->
    ~0.1s per 5k docs), then ONE k-step polynomial pass over the flat
    hash array; per-doc window slices are selected by offset (windows
    never cross doc boundaries because each doc's slice stops k-1 short
    of its end). Element-wise hashing is position-independent, so the
    values are bit-identical to the per-doc form. Returns
    (flat uint64 window hashes laid out doc-major, window counts per
    doc; count 0 for docs shorter than k tokens)."""
    n = len(texts)
    toks: list = []
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        tk = (t.split() if split_ws else t.split(" ")) if t is not None else []
        toks.append(tk)
        lens[i] = len(tk)
    total = int(lens.sum())
    wins = np.maximum(lens - k + 1, 0)
    if total < k:
        return np.zeros(0, dtype=np.uint64), wins
    flat = np.empty(total, dtype=object)
    pos = 0
    for tk in toks:
        m = len(tk)
        flat[pos:pos + m] = tk
        pos += m
    th = pd.util.hash_array(flat)
    nw = total - k + 1
    acc = np.zeros(nw, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _WINHASH_PRIME + th[j:j + nw]
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    valid = np.zeros(nw, dtype=bool)
    for i in range(n):
        if wins[i]:
            valid[offs[i]:offs[i] + wins[i]] = True
    return acc[valid], wins


def _make_text_minhash_udf(num_hashes: int, shingle_n: int):
    """Fused text -> MinHash signature in ONE Arrow pass: batch-wide
    tokenize + window hash (_batch_window_hashes), np.unique per doc,
    then the K universal-hash permutations over the flattened batch with
    np.minimum.reduceat. Chaining the shingle kernel UDF into the
    signature UDF instead costs a full JVM->Arrow->JVM round trip of
    the per-doc hash arrays between two Python runner pipes (~0.5 GB
    at 500k docs) plus a second worker chain — measured as the
    dominant wait in the 500k-doc stage audit (BENCH round-5)."""
    mh_a, mh_b = _mh_coeffs(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def _text_minhash_udf(texts: pd.Series) -> pd.Series:
        n = len(texts)
        res: list = [None] * n  # shingle-less docs stay NULL
        wh, wins = _batch_window_hashes(texts, shingle_n, split_ws=True)
        per_doc: list[np.ndarray] = []
        lens = np.zeros(n, dtype=np.int64)
        woffs = np.concatenate(([0], np.cumsum(wins)[:-1]))
        for i in range(n):
            if not wins[i]:
                continue
            u = np.unique(wh[woffs[i]:woffs[i] + wins[i]].view(np.int64))
            per_doc.append(u)
            lens[i] = len(u)
        nz = np.nonzero(lens)[0]
        if len(nz):
            flat = np.concatenate(per_doc).astype(np.uint64)
            starts = np.zeros(len(nz), dtype=np.int64)
            starts[1:] = np.cumsum(lens[nz])[:-1]
            mins = np.empty((len(nz), num_hashes), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for k in range(num_hashes):
                    hk = (flat * mh_a[k] + mh_b[k]) >> np.uint64(3)
                    mins[:, k] = np.minimum.reduceat(hk, starts)
            imins = mins.astype(np.int64)
            for row, idx in enumerate(nz):
                res[idx] = imins[row]
        return pd.Series(res)

    return _text_minhash_udf


_MINHASH_UDFS: dict[int, object] = {}
_TEXT_MINHASH_UDFS: dict[tuple[int, int], object] = {}


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """K independent min-hashes per document, for ANY K (coefficients
    are closed-form splitmix values generated on demand; UDFs cached per
    K). The base shingle hash is ONE JVM xxhash64 pass; the K
    permutations apply as a universal-hash family in one vectorized
    numpy pass per Arrow batch. (The previous form — K separate
    ``array_min(transform(...))`` expressions — cost ~4x more at K=64:
    interpreted HOF array walks plus the codegen of a 64-branch
    expression tree; measured 2.2s vs 0.5s warm on 5k docs.)"""
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    if num_hashes not in _MINHASH_UDFS:
        _MINHASH_UDFS[num_hashes] = _make_minhash_udf(num_hashes)
    return _MINHASH_UDFS[num_hashes](F.transform(shingles, lambda s: F.xxhash64(s)))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified with exact
    Jaccard >= ``threshold``. Returns (id_a, id_b, jaccard_sim), id_a < id_b.

    Default 32 bands x 2 rows: detection probability 1-(1-j^2)^32 is
    ~0.9999 at j=0.5, so at the default threshold the verified output
    equals the exact all-pairs result with near-certainty (the extra
    low-j candidates cost only verification time).

    rows-per-band = num_hashes/bands sets the S-curve. The banded relation
    carries only (id, band, bucket) — 24 bytes/row — through the self-join
    shuffle; shingle arrays are re-attached to the (small) candidate-pair
    set afterwards, so shuffle bytes are O(bands x ids), not
    O(bands x corpus shingles)."""
    rows_per_band, rem = divmod(num_hashes, bands)
    if rows_per_band < 1 or rem:
        # rows_per_band == 0 would hash zero signature elements per band
        # (every doc in one shared bucket -> O(n^2) self-join); a
        # non-multiple would silently drop the trailing hashes
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
    # ONE fused text -> signature Arrow pass (tokenize + shingle-hash +
    # K permutations in a single kernel, _make_text_minhash_udf): the
    # MinHash and the Jaccard verify both operate on the shingle-hash
    # SET, whose Jaccard equals the string-shingle Jaccard modulo 64-bit
    # collisions — the family's standing probabilistic contract.
    # Shingle-less docs get a NULL signature and are filtered BEFORE
    # banding — a shared degenerate signature would bucket every short
    # doc together (quadratic self-join on that bucket).
    ukey = (num_hashes, shingle_n)
    if ukey not in _TEXT_MINHASH_UDFS:
        _TEXT_MINHASH_UDFS[ukey] = _make_text_minhash_udf(num_hashes, shingle_n)
    slim = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    )
    # localCheckpoint: the signature relation is consumed by BOTH
    # self-join sides (and, transitively, by every verify branch). The
    # round-4/5 design relied on ReuseExchange deduplicating identical
    # exchange subtrees, but a runtime-plan audit (round 6) showed ZERO
    # reuse once AQE converts the self-join to broadcast at bench scale:
    # the final plan held 22 ArrowEvalPython nodes — the fused kernel ran
    # 22x per query. Materializing the (id, sig) relation once (64
    # longs/doc) makes the kernel count join-strategy-independent; blocks
    # are freed by the ContextCleaner when the plan is GC'd. The filter
    # runs AFTER the checkpoint so the null-signature filter cannot be
    # pushed below the projection and double-evaluate the UDF (guide
    # §4.4).
    sig = (
        slim.select(
            "_id", _TEXT_MINHASH_UDFS[ukey](F.col("_text")).alias("_sig")
        )
        .localCheckpoint(eager=False)
        .filter(F.col("_sig").isNotNull())
    )

    # Bucket = multi-arg xxhash64 over the band's signature slots —
    # hashing the longs directly; the previous concat_ws form built
    # bands x docs intermediate STRINGS and was the largest JVM cpu
    # line in the 500k-doc stage audit (BENCH round-5).
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("_sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bucket"),
    )

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bucket") == F.col("r._bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # consumed twice (id-set derivation + final verify join): pin the
        # deduped pair set instead of re-running the banded self-join
        .localCheckpoint(eager=False)
    )
    # Verify on candidates only — and run the shingle kernel over
    # candidate DOCS only. Candidates are a vanishing fraction of the
    # corpus at scale (near-dup rate percent-ish, never 100%), so
    # semi-joining the corpus down to candidate ids FIRST saves what
    # used to be the verify stage's whole cost: a second full-corpus
    # Python pass plus a corpus-scale shuffle of ~KB shingle-set rows
    # (measured 200k docs / local[32]: full op 24.8s -> 16.1s warm,
    # identical output).
    cand_ids = (
        cand.select(F.col("id_a").alias("_id"))
        .union(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    # The checkpointed shingle-set relation feeds both verify joins, so
    # the Arrow shingle kernel runs ONCE for verification regardless of
    # join strategy (the former repartition-for-ReuseExchange did not
    # survive AQE's broadcast conversion — see the sig note above).
    keyed = (
        slim.join(cand_ids, "_id", "left_semi")
        .select(
            "_id",
            _window_hash_udf(shingle_n, distinct=True, split_ws=True)(
                F.col("_text")
            ).alias("_sh"),
        )
        .localCheckpoint(eager=False)
    )
    sh_a = keyed.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = keyed.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    verified = cand.join(sh_a, "id_a").join(sh_b, "id_b").withColumn(
        "jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b"))
    )
    return verified.filter(F.col("jaccard_sim") >= threshold).select(
        "id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim")
    )


def ngram_jaccard_all_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs — the oracle-able (and
    quadratic) baseline LSH approximates. Pairs are generated by an
    inverted-index join on shared shingles (posting-list self-join), so
    disjoint pairs never materialize — but a hot shingle still blows up
    quadratically, so this refuses corpora above ``max_rows`` (pass None
    to override). Production near-dup paths are minhash_lsh_pairs /
    simhash_near_pairs."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"ngram_jaccard_all_pairs is the quadratic test-only baseline"
                f" ({n} rows > max_rows={max_rows}); use minhash_lsh_pairs"
                f" at scale or pass max_rows=None to force."
            )
    base = _shingled(df, id_col, text_col, shingle_n)
    posting = base.select("_id", F.explode("_sh").alias("_g"))
    pairs = (
        posting.alias("l")
        .join(posting.alias("r"), (F.col("l._g") == F.col("r._g")) & (F.col("l._id") < F.col("r._id")))
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    sizes = base.select("_id", F.size("_sh").alias("_n"))
    out = (
        pairs.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn("jaccard_sim", F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")))
    )
    return out.filter(F.col("jaccard_sim") >= threshold).select(
        "id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim")
    )


# ---------------------------------------------------------------------------
# SimHash

_SIMHASH_BITS = 64


@pandas_udf(LongType())
def _simhash_udf(token_hashes: pd.Series) -> pd.Series:
    """Pack per-token 64-bit hashes into a simhash: bit b of the result is
    the sign of sum over tokens of (+1 if token bit b else -1). Fully
    vectorized over the Arrow batch: the ragged per-doc hash lists are
    flattened once, then 64 reduceat passes (one per bit) produce the
    whole batch's vote matrix — no per-document Python loop."""
    import numpy as np

    n = len(token_hashes)
    # docs with NO shingles get a NULL signature, never a shared zero:
    # a common degenerate signature would put every short doc in one
    # blocking bucket (quadratic self-join) and report all of them as
    # mutual near-dups at hamming 0
    out = pd.array([None] * n, dtype="Int64")
    lens = np.fromiter(
        (len(h) if h is not None else 0 for h in token_hashes),
        dtype=np.int64, count=n,
    )
    nz = np.nonzero(lens)[0]
    if len(nz) == 0:
        return pd.Series(out)
    vals = token_hashes.to_numpy()
    flat = np.concatenate(
        [np.asarray(vals[i], dtype=np.int64) for i in nz]
    ).astype(np.uint64)
    starts = np.zeros(len(nz), dtype=np.int64)
    starts[1:] = np.cumsum(lens[nz])[:-1]
    votes = np.empty((len(nz), _SIMHASH_BITS), dtype=np.int64)
    for b in range(_SIMHASH_BITS):
        ones = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        votes[:, b] = np.add.reduceat(ones, starts)
    votes = votes * 2 - lens[nz, None]
    sigs = (
        (votes > 0).astype(np.uint64)
        << np.arange(_SIMHASH_BITS, dtype=np.uint64)
    ).sum(axis=1).astype(np.uint64)
    out[nz] = sigs.view(np.int64)
    return pd.Series(out)


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    checkpoint: bool = False,
) -> DataFrame:
    """64-bit SimHash per document over word n-gram shingles (n=1 for the
    classic token-level variant; n>=2 discriminates much better on
    small-vocabulary corpora). Shingle hashes come from the fused
    text -> distinct-shingle-hash Arrow kernel (_window_hash_udf) and
    feed _simhash_udf's reduceat vote matrix directly — no interpreted
    HOF shingle build, no JVM xxhash64 transform pass (the round-5
    kernel A/B in BENCH/BASELINE.md). Any deterministic uniform hash
    yields statistically equivalent signatures: clones collide under
    every hash, and the planted-margin corpora keep distinct docs far
    outside max_hamming w.h.p. (verified against the production-
    parameter oracle at sf0.01 after the switch)."""
    feats_df = fan_out(
        df.select(F.col(id_col), F.col(text_col).alias("_text"))
    ).select(
        F.col(id_col),
        _window_hash_udf(shingle_n, distinct=True, split_ws=True)(
            F.col("_text")
        ).alias("_shh"),
    )
    # shingle-less docs (fewer than shingle_n tokens) are excluded, the
    # same contract as the minhash path: there is nothing to compare.
    # ``checkpoint`` pins the signature relation BEFORE the null filter:
    # a filter on the UDF output column otherwise pushes below the
    # projection and evaluates both chained kernels twice (guide §4.4),
    # and downstream self-joins re-run them per side (see
    # minhash_lsh_pairs).
    sigs = feats_df.select(
        F.col(id_col), _simhash_udf(F.col("_shh")).alias("simhash")
    )
    if checkpoint:
        sigs = sigs.localCheckpoint(eager=False)
    return sigs.filter(F.col("simhash").isNotNull())


def _popcount64(c: Column) -> Column:
    return F.bit_count(c)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, blocked on
    16-bit chunks (pigeonhole: <= 3 differing bits means >= 1 of 4 chunks
    equal), verified by popcount(xor)."""
    sh = simhash(df, id_col, text_col, shingle_n, checkpoint=True)
    width = _SIMHASH_BITS // chunks
    chunked = sh.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("_chunk_ix", "_chunk"),
    )
    cand = (
        chunked.alias("l")
        .join(
            chunked.alias("r"),
            (F.col("l._chunk_ix") == F.col("r._chunk_ix"))
            & (F.col("l._chunk") == F.col("r._chunk"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = _popcount64(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# Cluster resolution: near-dup pairs -> connected components -> canonical doc


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 60,
) -> DataFrame:
    """Connected components of the pair graph via the alternating
    large-star / small-star algorithm (Kiveris et al. 2014, "Connected
    Components in MapReduce and Beyond") — O(log n) rounds regardless of
    component DIAMETER, vs. diameter rounds for min-label propagation.
    Returns (id, label) for every node that appears in ``pairs``, label
    = the component's minimum id.

    Per round, on the canonical undirected edge set (lo < hi):

    * **large-star**: every node u computes m = min over itself and its
      neighbors; each strictly-larger neighbor v re-attaches to m
      (edge {u,v}, u<v  ->  {m(u), v}). Long chains fold toward their
      minima from every node at once — this is what beats per-hop
      propagation.
    * **small-star**: every node u re-attaches its smaller neighbors
      (and itself) to their collective minimum, flattening the partial
      trees large-star built into stars.

    The fixed point is a star forest: every edge is (component-min,
    member). Each round is two groupBy-min + two joins on (long, long)
    pairs — 16-byte rows, skew-safe (hot hubs partial-aggregate
    map-side; their edges re-emit 1:1, never fan out). Each round's
    edge set is ``localCheckpoint``-ed: persist() alone keeps the full
    LOGICAL lineage, so by round k Catalyst would re-analyze k nested
    rounds of unions/joins — the classic iterative-plan explosion
    (measured: minutes of pure driver-side optimization on a 120-node
    test graph); checkpointing truncates the plan to a leaf each round.
    ``max_rounds`` (default 60 >> 2*log2(any realistic corpus)) guards
    a logic error from looping forever — exceeding it raises rather
    than returning split components."""
    # checkpoint BEFORE dropping self-loops: a node whose only pair is
    # (x, x) still owns a contract row, and the node set must come from
    # this materialization, not from re-running the pairs lineage
    e0 = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e0.select(F.col("lo").alias("id"))
        .unionByName(e0.select(F.col("hi").alias("id")))
        .distinct()
    )
    e = e0.filter(F.col("lo") != F.col("hi"))
    n_old = e.count()
    for _ in range(max_rounds):
        symm = e.select(
            F.col("lo").alias("u"), F.col("hi").alias("v")
        ).unionByName(e.select(F.col("hi").alias("u"), F.col("lo").alias("v")))
        # large-star: u<v edge -> (min(Γ+(u)), v)
        mins = (
            symm.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
        )
        large = (
            symm.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .distinct()
        )
        # small-star over large-star's output
        symm2 = large.select(
            F.col("lo").alias("u"), F.col("hi").alias("v")
        ).unionByName(
            large.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        smaller = symm2.filter(F.col("v") < F.col("u"))
        mins2 = smaller.groupBy("u").agg(F.min("v").alias("m"))
        j = smaller.join(mins2, "u")
        new_e = (
            j.filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .unionByName(
                mins2.select(F.col("m").alias("lo"), F.col("u").alias("hi"))
            )
            .distinct()
            .localCheckpoint()  # materializes AND truncates lineage
        )
        n_new = new_e.count()
        stable = n_new == n_old and new_e.join(
            e, ["lo", "hi"], "left_anti"
        ).isEmpty()
        e, n_old = new_e, n_new
        if stable:
            star = e.select(
                F.col("hi").alias("id"), F.col("lo").alias("label")
            ).unionByName(
                e.select(F.col("lo").alias("id"), F.col("lo").alias("label"))
            ).distinct()
            # left join back onto the FULL node set: self-pair-only
            # nodes have no star edge and label themselves
            return nodes.join(star, "id", "left").select(
                "id", F.coalesce(F.col("label"), F.col("id")).alias("label")
            )
    raise RuntimeError(
        f"connected_components did not stabilize in {max_rounds} "
        "alternating star rounds — this exceeds the algorithm's "
        "O(log n) bound and indicates a logic error or id overflow"
    )


def near_dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
    algorithm: str = "auto",
) -> DataFrame:
    """Resolve near-dup PAIRS into clusters and pick each cluster's
    canonical document: returns (id_col, canonical_id) for EVERY row of
    ``df``, where canonical_id is the minimum id reachable through the
    pair graph (docs in no pair are their own canonical) — the step a
    training-data pipeline runs after pair generation, since dedup
    keeps ONE representative per duplicate CLUSTER, not per pair
    (a~b, b~c must drop both b and c, which pairwise filtering misses).

    Distributed min-label propagation: labels start as each node's own
    id; each round every node takes the min of its label and its
    neighbors' labels (one shuffle per round on the edge key), stopping
    when a round changes nothing. Rounds needed = the pair graph's
    component diameter — near-dup graphs are shallow (stars/cliques
    around a popular document; LSH emits most intra-cluster edges, not
    a path), so 2-4 rounds is typical and label propagation is the
    cheaper plan (one join/round vs. the star rounds' two). Deep
    components escalate by ``algorithm``:

    * ``"auto"`` (default) — label propagation for ``max_iters`` rounds;
      if labels are still moving, rerun with the alternating
      large-star/small-star :func:`connected_components` (O(log n)
      rounds regardless of diameter) instead of failing.
    * ``"label"`` — propagation only; raise on non-convergence (the
      pre-round-5 contract).
    * ``"star"`` — go straight to :func:`connected_components` (the
      right call when the pair graph is known to be deep).

    Only (long, long) label pairs ever shuffle — document text never
    moves, under either algorithm."""
    if algorithm not in ("auto", "label", "star"):
        raise ValueError("algorithm must be 'auto', 'label', or 'star'")
    if algorithm == "star":
        return _star_canonical(df, pairs, id_col, a_col, b_col)
    # localCheckpoint, not persist: each round's plan references the
    # previous labels TWICE (the neighbor-min join and the left join
    # back), so with persist() alone the SQL plan DESCRIPTION — which
    # reprints every InMemoryRelation's build plan under every scan —
    # grows 2^rounds and was measured OOMing the driver on plan-string
    # generation under suite-level heap pressure. Checkpointing
    # truncates each round's lineage to a leaf.
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label"))
                .alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    if changed:
        # exhausting max_iters with labels still moving means some
        # component's diameter exceeds the round budget — returning
        # here would silently split one duplicate cluster into
        # several "canonical" groups
        if algorithm == "auto":
            # escalate FROM THE CHECKPOINTED EDGES, not the raw pairs:
            # pairs is typically a multi-stage LSH candidate+verify
            # pipeline, and re-deriving it inside connected_components
            # would run that whole job a second time
            return _star_canonical(
                df, edges, id_col, a_col="src", b_col="dst"
            )
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing); a pair-graph component "
            f"has diameter > max_iters — raise max_iters or use "
            f"algorithm='star'"
        )
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("canonical_id")
    )


def _star_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str, a_col: str, b_col: str
) -> DataFrame:
    """near_dup_clusters' output shape from the alternating-star
    components: nodes in no pair are their own canonical."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)
    return (
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("label"), F.col("id")).alias("canonical_id"),
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicate-SPAN detection (sub-document granularity)


_WINHASH_PRIME = np.uint64(1099511628211)  # FNV-1a 64-bit prime
_WINHASH_UDFS: dict[int, object] = {}


def _window_hash_udf(k: int, distinct: bool = False, split_ws: bool = False):
    """Arrow-batched window-hash kernel: per-token 64-bit hashes
    (pd.util.hash_array — fixed key, deterministic across runs and
    executors) combined into one hash per k-token window by a
    polynomial accumulate over k SHIFTED VIEWS of the token-hash array
    (k numpy passes per doc, never a per-window Python loop). Replaces
    the transform(sequence, slice+concat_ws+xxhash64) expression tree:
    higher-order functions don't codegen, and the interpreted per-window
    string build measured 296.4s vs 14.1s cold / 3.4s warm for this
    kernel on a 100k-doc (11.3M-window) corpus at local[32] — a 21x
    cold-scan win, the same HOF->numpy trade the minhash signatures
    took in round 4.

    ``distinct=True`` returns the np.unique'd hash SET (the shingle-set
    form MinHash consumes — positions dropped); ``split_ws=True``
    tokenizes on any whitespace run (str.split() semantics, matching
    the \\s+ regex the string shingler used) instead of single spaces."""
    key = (k, distinct, split_ws)
    if key not in _WINHASH_UDFS:

        @pandas_udf(ArrayType(LongType()))
        def win_hashes(texts: pd.Series) -> pd.Series:
            empty = np.array([], dtype=np.int64)
            wh, wins = _batch_window_hashes(texts, k, split_ws=split_ws)
            woffs = np.concatenate(([0], np.cumsum(wins)[:-1]))
            out = []
            for i in range(len(texts)):
                if not wins[i]:
                    out.append(empty)
                    continue
                iacc = wh[woffs[i]:woffs[i] + wins[i]].view(np.int64)
                out.append(np.unique(iacc) if distinct else iacc)
            return pd.Series(out)

        _WINHASH_UDFS[key] = win_hashes
    return _WINHASH_UDFS[key]


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Maximal token spans whose every length-``k`` window recurs
    verbatim in at least one OTHER document — the token-window
    formulation of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): the
    suffix-array pass their single-node tool runs is re-expressed as
    the shuffle-friendly window-hash relation, which is how the
    technique is actually distributed. Document-level exact dedup
    (the reference's analog: dictionary-entry dedup,
    clp/VariableDictionaryWriter.cpp:7-37) misses a boilerplate
    paragraph pasted into thousands of otherwise-distinct pages; this
    finds the paragraph itself.

    Returns (id_col, span_start, span_end, span_tokens, n_windows),
    0-based inclusive token offsets; a span is maximal — every one of
    its ``n_windows`` consecutive k-token windows appears in >= 2
    distinct documents, and the windows just outside it do not.

    Plan (100 TB): the (id, pos, window-hash) relation is built by the
    Arrow-batched numpy kernel above (one vectorized pass per doc; the
    hash is a polynomial over per-token hashes, so 8 bytes + id + pos
    shuffle — never text). Dup-hash build side: hash-shuffle groupBy marking
    hashes spanning >= 2 distinct docs (min(id) != max(id): two-phase
    agg with map-side partials, so a boilerplate window hot in millions
    of docs partial-aggregates map-side — skew-proof, where the
    single-shuffle Window.partitionBy(hash) alternative would funnel
    the hot key into one sort partition). Probe side left-semi joins
    the dup-hash set — AQE broadcasts it when small (the common case:
    distinct duplicated windows << corpus windows), which makes the
    probe shuffle-free; the window expansion then runs once per side,
    a deliberate CPU-for-shuffle trade (persisting a corpus-scale
    expansion is not an option at 100 TB). Finally ONE per-doc window
    pass (gaps-and-islands: pos - row_number) merges runs of
    consecutive duplicated windows into maximal spans; its fan-in is
    bounded by document length. Cross-doc equality is by 64-bit hash —
    the collision contract (~n^2 / 2^64) is the same probabilistic
    trade the minhash/simhash family already makes.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-token window is a token)")
    slim = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    )
    # split_ws: tokenize on whitespace RUNS like the rest of the
    # curation family — single-space splitting misses a boilerplate
    # paragraph re-pasted with newline/double-space separators and
    # emits empty-string tokens that corrupt the span offsets
    wins = slim.select(
        "_id",
        F.posexplode(
            _window_hash_udf(k, split_ws=True)(F.col("_text"))
        ).alias("_pos", "_wh"),
    )
    dup_hashes = (
        wins.groupBy("_wh")
        .agg(F.min("_id").alias("_mn"), F.max("_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("_wh")
        # Materialize the FILTERED set as its own query stage (one tiny
        # extra shuffle): AQE decides join strategy from the stage it
        # actually materialized, and without this hop that stage is the
        # PRE-agg window shuffle (corpus-sized), so runtime re-planning
        # never discovers the dup set is broadcast-sized — measured as
        # an SMJ that shuffled+sorted the 56M-row probe side (BENCH
        # round-5 curation notes).
        .repartition(F.col("_wh"))
    )
    hits = wins.join(dup_hashes, "_wh", "left_semi").select("_id", "_pos")
    win = W.partitionBy("_id").orderBy("_pos")
    islands = hits.withColumn(
        "_grp", F.col("_pos") - F.row_number().over(win)
    )
    return (
        islands.groupBy("_id", "_grp")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Excise the flagged duplicate spans from each document — the
    rewrite step after :func:`duplicate_spans` (Lee et al. 2022 strip
    the repeated substrings they find; this is the boilerplate-strip
    form: EVERY occurrence goes, which is what a training pipeline
    wants for navigation chrome / license footers. Keep-one-copy
    semantics would need a cross-document canonical choice — compose
    with near-dup clustering if that is the goal).

    Pure Column evaluation: the per-doc span list rides in on one
    left join (the spans relation covers only docs WITH duplicates, a
    vanishing fraction at scale, so AQE broadcasts it), and the token
    filter is a JVM higher-order function over the whitespace-run
    token array — no Python, no second corpus pass. Offsets index the
    SAME tokenization duplicate_spans used; the rewritten text is
    single-space joined (whitespace runs are already not boundaries
    for span semantics, so no information the span model sees is
    lost)."""
    per_doc = spans.groupBy(F.col(id_col).alias("_sid")).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("_spans")
    )
    joined = df.join(per_doc, df[id_col] == per_doc["_sid"], "left").drop("_sid")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])
        ),
    )
    return joined.withColumn(
        out_col,
        F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
            F.array_join(kept, " ")
        ),
    ).drop("_spans")


# ---------------------------------------------------------------------------
# Benchmark decontamination (test-set n-gram overlap)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Flag training documents that share any verbatim ``n``-token
    window with an evaluation benchmark — the standard pre-training
    decontamination step (13-gram overlap, Brown et al. 2020 appendix C;
    the same sub-document granularity as duplicate_spans, whose
    window-hash kernel this reuses). The reference's engine has no
    analog; this belongs to the training-data-curation family the graft
    adds on top of the CLP surface.

    Returns ``df`` with two appended columns:
      * ``n_contaminated_ngrams`` — distinct benchmark n-grams the doc
        contains (0 for clean docs),
      * ``contaminated`` — boolean, ``n_contaminated_ngrams > 0``.

    Tokenization is whitespace-run (str.split()), matching the rest of
    the curation family; cross-side equality is by 64-bit window hash —
    the family's standing collision contract.

    Plan (100 TB): the benchmark is eval-suite-sized — thousands of
    documents, i.e. vanishing vs the training corpus — so its distinct
    window-hash set is a slim 8-byte-key relation that AQE broadcasts.
    The corpus side is ONE Arrow kernel pass emitting distinct window
    hashes per doc; the broadcast inner join keeps only contaminated
    (doc, hash) rows, which aggregate per doc with map-side partials.
    The per-doc hit counts (16 bytes/row, bounded by contaminated docs)
    join back onto the corpus; AQE broadcasts that side in the expected
    case (contamination is rare) and downgrades the corpus exchange to
    map-local reads — and if contamination is genuinely corpus-wide the
    same plan degrades gracefully to a shuffle join instead of OOMing a
    forced broadcast. Text never leaves the corpus scan stage either
    way; only 8-byte hashes and counts move.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (a 1-token window is a token)")
    kernel = _window_hash_udf(n, distinct=True, split_ws=True)
    bench_hashes = (
        benchmark.select(
            F.explode(kernel(F.col(bench_text_col))).alias("_wh")
        ).distinct()
    )
    wins = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    ).select("_id", F.explode(kernel(F.col("_text"))).alias("_wh"))
    hits = (
        wins.join(bench_hashes, "_wh")
        .groupBy("_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
        .withColumnRenamed("_id", id_col)
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_ngrams",
            F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)),
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
    )
