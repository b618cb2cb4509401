"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
deterministic outputs) is real and tested. Codec coverage — all pure
numpy/stdlib, no external media library: BI_RGB 24/32-bit BMP
(:func:`decode_bmp`), full PNG — every legal bit depth 1/2/4/8/16,
gray/RGB/palette(+tRNS)/GA/RGBA, none + Adam7 interlace — via zlib
inflate + numpy unfiltering (:func:`decode_png`), baseline sequential AND
progressive JPEG with canonical Huffman + batched IDCT + 4:2:0
upsampling (:func:`decode_jpeg`, including table-less MJPEG streams
via the ITU T.81 Annex K.3 default
tables), PCM/float/G.711-mu-law/A-law/IMA-ADPCM WAV
(:func:`decode_wav`), and
RIFF/AVI video — both uncompressed 24-bit DIB and Motion-JPEG frames
(:func:`decode_avi`, real frame extraction in frame_features) — every
modality's ``fake=False`` path is exercised end-to-end on real bytes.
Remaining formats (MP3/AAC, inter-frame video
codecs, lossless/arithmetic JPEG) raise NotImplementedError
unless ``fake=True``, which substitutes a deterministic
content-hash-seeded decoder so downstream feature/resize/frame-sample
operators stay testable.

Scale notes: media bytes stay in executor-side Arrow buffers end-to-end;
``spark.sql.files.maxPartitionBytes`` (or an explicit repartition by
size) bounds per-task memory; feature vectors come back as compact
``array<float>`` columns suitable for the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

IMAGE_SCHEMA = (
    "id long, width int, height int, channels int, format string"
)
FEATURE_SCHEMA = "id long, feature array<float>"
FRAME_SCHEMA = "id long, frame_idx int, frame_ts_ms long"


def _fake_pixels(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in decoder: pixels derived from a rolling hash
    of the payload — stable across runs/executors, no media libs."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    n = width * height * channels
    idx = np.arange(n, dtype=np.uint64)
    vals = (idx * np.uint64(0x9E3779B97F4A7C15) + seed) >> np.uint64(56)
    return vals.astype(np.uint8).reshape(height, width, channels)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed (BI_RGB) 24/32-bit BMP:
    little-endian header fields, 4-byte-padded rows, bottom-up unless
    height is negative, BGR(A) byte order. Returns (h, w, ch) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")

    def u16(o: int) -> int:
        return int.from_bytes(payload[o : o + 2], "little")

    def u32(o: int) -> int:
        return int.from_bytes(payload[o : o + 4], "little")

    data_off = u32(10)
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp, compression = u16(28), u32(30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError("only uncompressed 24/32-bit BI_RGB BMP")
    nch = bpp // 8
    h, bottom_up = abs(height), height > 0
    stride = (width * nch + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, offset=data_off, count=stride * h)
    px = px.reshape(h, stride)[:, : width * nch].reshape(h, width, nch)
    if bottom_up:
        px = px[::-1]
    order = [2, 1, 0] + ([3] if nch == 4 else [])
    return np.ascontiguousarray(px[:, :, order])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 interlace pass grid: (x-origin, y-origin, x-step, y-step); each
# pass is an independently filtered sub-image scattered into the output
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering. ``rows`` is (h, rowbytes+1) uint8
    (filter-type byte + filtered bytes per row); ``bpp`` is the filter
    stride in BYTES (max(1, channels*bit_depth/8) — the spec's "bpp").
    Sub rows vectorize as per-lane cumulative sums; Average/Paeth rows
    are inherently sequential (rec[x] depends on rec[x-bpp] through a
    data-dependent predictor), so they run a per-byte loop — over
    PYTHON LISTS, not numpy scalars: list indexing + int arithmetic
    measured 2.8x faster than int(np_array[x]) per byte, and lane-wise
    small-vector numpy 4x SLOWER (per-call overhead dominates at
    width bpp). ~2s per fully-Paeth 1080p RGB frame is the pure-Python
    floor; photographic PNG corpora at scale want a real codec library,
    which this container doesn't have. Returns (h, rowbytes) uint8."""
    h, rowlen = rows.shape[0], rows.shape[1] - 1
    out = np.zeros((h, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.uint8)
    for y in range(h):
        ft, row = int(rows[y, 0]), rows[y, 1:].copy()
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: each bpp-strided lane is a cumulative sum
            rec = row
            for o in range(bpp):
                lane = rec[o::bpp].astype(np.uint32)
                rec[o::bpp] = np.cumsum(lane).astype(np.uint8)
        elif ft == 2:  # Up
            rec = (row.astype(np.uint16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            row_l, prev_l = row.tolist(), prev.tolist()
            rec_l = [0] * rowlen
            for x in range(rowlen):
                left = rec_l[x - bpp] if x >= bpp else 0
                rec_l[x] = (row_l[x] + (left + prev_l[x]) // 2) & 0xFF
            rec = np.asarray(rec_l, dtype=np.uint8)
        elif ft == 4:  # Paeth
            row_l, prev_l = row.tolist(), prev.tolist()
            rec_l = [0] * rowlen
            for x in range(rowlen):
                a = rec_l[x - bpp] if x >= bpp else 0
                b = prev_l[x]
                c = prev_l[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec_l[x] = (row_l[x] + pred) & 0xFF
            rec = np.asarray(rec_l, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def _png_samples(rec: np.ndarray, w: int, nch: int, depth: int) -> np.ndarray:
    """Unfiltered scanline bytes (h, rowbytes) -> per-pixel samples
    (h, w*nch): big-endian uint16 pairs at depth 16, bit-group unpack at
    depths 1/2/4 (samples packed MSB-first, rows padded to a byte
    boundary), pass-through at depth 8."""
    h = rec.shape[0]
    ns = w * nch
    if depth == 8:
        return rec[:, :ns]
    if depth == 16:
        # rowbytes is exactly 2 samples/byte-pair wide at depth 16
        return ((rec[:, 0::2].astype(np.uint16) << 8) | rec[:, 1::2])[:, :ns]
    bits = np.unpackbits(rec, axis=1)[:, : ns * depth].reshape(h, ns, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure stdlib-zlib + numpy PNG decoder: every legal bit depth
    (1/2/4/8/16), color types 0 gray / 2 RGB / 3 palette incl. tRNS /
    4 gray+alpha / 6 RGBA, and both interlace methods (none + Adam7 —
    seven independently filtered passes scattered into the output
    grid). Chunk walk, IDAT concatenation + zlib inflate, per-scanline
    unfiltering (:func:`_png_unfilter`). Sub-byte gray samples scale to
    the full 8-bit range (255/(2^d-1), the spec's presentation rule);
    palette indices stay raw. Returns (h, w, ch) uint8, or uint16 at
    bit depth 16 (no precision thrown away)."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = plte = trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + data + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width = int.from_bytes(ihdr[0:4], "big")
    height = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    # palette images carry 1 index sample/pixel through the filter stage
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if nch is None or interlace not in (0, 1):
        raise ValueError("bad PNG color type / interlace method")
    if bit_depth not in (1, 2, 4, 8, 16) or (
        bit_depth < 8 and color_type not in (0, 3)
    ) or (bit_depth == 16 and color_type == 3):
        raise ValueError("illegal PNG bit depth for color type")
    if color_type == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing/malformed PLTE")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    bpp = max(1, (nch * bit_depth) // 8)
    dtype = np.uint16 if bit_depth == 16 else np.uint8
    samples = np.zeros((height, width, nch), dtype=dtype)
    passes = _PNG_ADAM7 if interlace else ((0, 0, 1, 1),)
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # pass empty for this image size
        rowbytes = (pw * nch * bit_depth + 7) // 8
        need = ph * (rowbytes + 1)
        if off + need > len(raw):
            raise ValueError("PNG pixel data truncated")
        rec = _png_unfilter(raw[off : off + need].reshape(ph, rowbytes + 1), bpp)
        off += need
        sub = _png_samples(rec, pw, nch, bit_depth).reshape(ph, pw, nch)
        samples[y0::dy, x0::dx] = sub
    if color_type == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples.reshape(height, width)
        if idx.max() >= pal.shape[0]:
            raise ValueError("palette index out of range")
        rgb = pal[idx]  # (h, w, 3)
        if trns is not None:
            alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.concatenate([rgb, alpha[idx][..., None]], axis=2)
        return rgb
    if color_type == 0 and bit_depth < 8:
        samples = samples * np.uint8(255 // ((1 << bit_depth) - 1))
    return samples


# --- baseline JPEG (ITU-T T.81 sequential DCT) -------------------------------

# zigzag scan order: index i of the scan -> position in the 8x8 block
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II matrix (T @ block @ T.T == DCT; transpose
# pair inverts) — the convention T.81 Annex A defines
_DCT_T = np.array([
    [np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte unstuffing; `skip_restart` crosses FFD0-D7 restart boundaries
    (byte-align + consume) so the caller can reset DC predictors."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def skip_restart(self) -> None:
        """Cross a restart boundary: discard the partial byte (the
        encoder byte-aligns with 1-bit padding before every RSTn —
        ITU T.81 B.2.1.1 — so leftover bits are padding, not entropy
        data) and consume the expected FFD0-D7 marker."""
        self.bitbuf = self.nbits = 0
        if not (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker in JPEG entropy data")
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an n-bit magnitude to its signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


# ITU T.81 Annex K.3 "typical" Huffman tables, (class, id) -> (BITS
# counts for code lengths 1..16, HUFFVAL symbol bytes). Motion-JPEG
# streams conventionally omit DHT segments entirely and assume exactly
# these tables (id 0 = luminance, id 1 = chrominance) — the same
# convention libjpeg's std_huff_tables encodes.
_JPEG_STD_HUFF_SPEC: dict[tuple[int, int], tuple[list[int], bytes]] = {
    (0, 0): (  # DC luminance
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        bytes(range(12)),
    ),
    (0, 1): (  # DC chrominance
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        bytes(range(12)),
    ),
    (1, 0): (  # AC luminance
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
        bytes.fromhex(
            "01020300041105122131410613516107227114328191a1082342b1c115"
            "52d1f02433627282090a161718191a25262728292a3435363738393a43"
            "4445464748494a535455565758595a636465666768696a737475767778"
            "797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2"
            "b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3"
            "e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"
        ),
    ),
    (1, 1): (  # AC chrominance
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
        bytes.fromhex(
            "000102031104052131061241510761711322328108144291a1b1c10923"
            "3352f0156272d10a162434e125f11718191a262728292a35363738393a"
            "434445464748494a535455565758595a636465666768696a7374757677"
            "78797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9"
            "aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2"
            "e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"
        ),
    ),
}
_jpeg_std_huff_cache: dict[tuple[int, int], dict[tuple[int, int], int]] = {}


def _std_huff_table(cls: int, tid: int) -> dict[tuple[int, int], int]:
    """Canonical decode table for an Annex K.3 default Huffman table."""
    key = (cls, tid)
    cached = _jpeg_std_huff_cache.get(key)
    if cached is not None:
        return cached
    if key not in _JPEG_STD_HUFF_SPEC:
        raise ValueError(
            f"JPEG scan references undefined Huffman table {key} with no "
            "Annex-K default (ids 0/1 only)"
        )
    counts, syms = _JPEG_STD_HUFF_SPEC[key]
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    _jpeg_std_huff_cache[key] = table
    return table


def _jpeg_entropy_end(payload: bytes, start: int) -> int:
    """Index of the first real marker after ``start`` — 0xFF followed by
    anything other than a stuffed 0x00 or a restart RST0-7 ends the
    entropy-coded segment (T.81 B.1.1.5)."""
    i = start
    while True:
        j = payload.find(b"\xff", i)
        if j == -1 or j + 1 >= len(payload):
            return len(payload)
        nxt = payload[j + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            i = j + 2
            continue
        return j


def _jpeg_decode_block_full(reader, dc_tbl, ac_tbl, pred, zz):
    """Baseline block: DC diff + AC run/size with EOB/ZRL, into the
    zigzag-order coefficient vector. Returns the updated DC predictor."""
    s = _huff_decode(reader, dc_tbl)
    pred += _jpeg_extend(reader.receive(s), s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tbl)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _jpeg_extend(reader.receive(size), size)
        k += 1
    return pred


def _jpeg_ac_first(reader, ac_tbl, zz, ss, se, al, eobrun):
    """Progressive AC initial scan for one block (T.81 G.1.2.2):
    run/size within the [ss, se] spectral band, EOB runs spanning
    blocks, new coefficients scaled by the successive-approximation
    shift. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_tbl)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r < 15:  # EOBn: run of 2^r + receive(r) all-done blocks
                return (1 << r) - 1 + (reader.receive(r) if r else 0)
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC band overflow")
        zz[k] = _jpeg_extend(reader.receive(size), size) << al
        k += 1
    return 0


def _jpeg_ac_refine(reader, ac_tbl, zz, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.1.2.3): newly
    nonzero coefficients arrive as ±1<<al after a run of zero-HISTORY
    positions; every already-nonzero coefficient passed on the way (and
    the whole band tail during an EOB run) receives a correction bit.
    Returns the remaining EOB run."""
    bit = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tbl)
            r, size = rs >> 4, rs & 0x0F
            val = 0
            if size == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.receive(r) if r else 0)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("JPEG AC refinement size must be 1")
                val = bit if reader.read_bit() else -bit
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and not (zz[k] & bit):
                        zz[k] += bit if zz[k] > 0 else -bit
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit() and not (zz[k] & bit):
                    zz[k] += bit if zz[k] > 0 else -bit
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Pure-numpy JPEG decoder for baseline sequential (SOF0/1) AND
    progressive (SOF2) DCT, ITU-T T.81: marker walk, canonical Huffman
    tables, per-scan entropy decode into per-component coefficient
    arrays — baseline blocks in one pass; progressive as DC
    first/refinement plus per-band AC first/refinement scans with EOB
    runs and successive approximation — then one batched dequantize +
    un-zigzag + orthonormal IDCT over every block, nearest-neighbor
    chroma upsample, BT.601 YCbCr->RGB. Returns (h, w, 3) uint8 RGB
    (grayscale replicates to 3 channels). A scan referencing a Huffman
    table id 0/1 that no DHT segment defined falls back to the ITU
    T.81 Annex K.3 defaults — the Motion-JPEG convention, where
    streams carry no DHT at all. Lossless/arithmetic/hierarchical
    variants (SOF3/5-7/9-11) raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> code table
    comps: list[dict] = []
    h = w = 0
    hmax = vmax = mcux = mcuy = 0
    progressive = False
    restart_interval = 0
    coef: list[np.ndarray] = []  # per comp: (nby, nbx, 64) zigzag coeffs
    pos = 2
    saw_scan = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = body[i + 1 : i + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if prec else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                qt[tid] = vals
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                syms = body[i + 17 : i + 17 + sum(counts)]
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(cls, tid)] = table
                i += 17 + sum(counts)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            if body[0] != 8:
                # 12-bit precision decodes to garbage under the 8-bit
                # tables/level-shift — refuse rather than mis-decode
                raise NotImplementedError(
                    f"only 8-bit JPEG precision (got {body[0]})"
                )
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                # 4-component Adobe CMYK/YCCK would be silently read as
                # YCbCr + an ignored plane — corrupt RGB, not a decode
                raise NotImplementedError(
                    f"only gray/YCbCr JPEG ({ncomp} components)"
                )
            comps = [
                {
                    "id": body[6 + 3 * c],
                    "hs": body[7 + 3 * c] >> 4,
                    "vs": body[7 + 3 * c] & 0x0F,
                    "qt": body[8 + 3 * c],
                }
                for c in range(ncomp)
            ]
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # MCU-padded storage covers both interleaved and
                # single-component scan geometries
                coef.append(
                    np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int32)
                )
                # non-interleaved scans cover ceil(comp_samples/8) blocks
                c["nbx"] = -(-(-(-w * c["hs"] // hmax)) // 8)
                c["nby"] = -(-(-(-h * c["vs"] // vmax)) // 8)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "lossless/arithmetic/hierarchical JPEG does not decode here"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            saw_scan = True
            ns = body[0]
            sel = []
            for c in range(ns):
                cid = body[1 + 2 * c]
                ci = next(
                    i for i, cc in enumerate(comps) if cc["id"] == cid
                )
                dc_t, ac_t = body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F
                sel.append(
                    (
                        ci,
                        huff.get((0, dc_t)) or _std_huff_table(0, dc_t),
                        huff.get((1, ac_t)) or _std_huff_table(1, ac_t),
                    )
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            data_start = pos + 2 + seg_len
            data_end = _jpeg_entropy_end(payload, data_start)
            reader = _BitReader(payload[data_start:data_end])
            pred = {ci: 0 for ci, _, _ in sel}
            eobrun = 0
            unit = 0  # MCUs (interleaved) or blocks (single-component)

            def _restart_tick():
                nonlocal unit, eobrun
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.skip_restart()
                    for k_ in pred:
                        pred[k_] = 0
                    eobrun = 0
                unit += 1

            if len(sel) > 1 or (not progressive):
                if progressive and ss != 0:
                    raise ValueError("progressive AC scans must be single-component")
                n_units = (
                    mcuy * mcux
                    if len(sel) > 1
                    else comps[sel[0][0]]["nby"] * comps[sel[0][0]]["nbx"]
                )
                single = len(sel) == 1
                for u in range(n_units):
                    _restart_tick()
                    for ci, dc_tbl, ac_tbl in sel:
                        comp = comps[ci]
                        if single:
                            by, bx = divmod(u, comp["nbx"])
                            blocks = [(by, bx)]
                        else:
                            my, mx = divmod(u, mcux)
                            blocks = [
                                (my * comp["vs"] + byy, mx * comp["hs"] + bxx)
                                for byy in range(comp["vs"])
                                for bxx in range(comp["hs"])
                            ]
                        for by, bx in blocks:
                            zz = coef[ci][by, bx]
                            if not progressive:
                                pred[ci] = _jpeg_decode_block_full(
                                    reader, dc_tbl, ac_tbl, pred[ci], zz
                                )
                            elif ah == 0:  # DC first (interleaved allowed)
                                s = _huff_decode(reader, dc_tbl)
                                pred[ci] += _jpeg_extend(reader.receive(s), s)
                                zz[0] = pred[ci] << al
                            else:  # DC refinement
                                if reader.read_bit():
                                    zz[0] |= 1 << al
            else:
                ci, dc_tbl, ac_tbl = sel[0]
                comp = comps[ci]
                eobrun = 0
                for u in range(comp["nby"] * comp["nbx"]):
                    _restart_tick()
                    by, bx = divmod(u, comp["nbx"])
                    zz = coef[ci][by, bx]
                    if ss == 0:  # DC scan, single component
                        if ah == 0:
                            s = _huff_decode(reader, dc_tbl)
                            pred[ci] += _jpeg_extend(reader.receive(s), s)
                            zz[0] = pred[ci] << al
                        elif reader.read_bit():
                            zz[0] |= 1 << al
                    elif ah == 0:
                        eobrun = _jpeg_ac_first(
                            reader, ac_tbl, zz, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _jpeg_ac_refine(
                            reader, ac_tbl, zz, ss, se, al, eobrun
                        )
            pos = data_end
            continue
        pos += 2 + seg_len
    if not comps or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")

    # batched dequantize + un-zigzag + IDCT per component
    planes = []
    for ci, comp in enumerate(comps):
        nby, nbx, _ = coef[ci].shape
        deq = coef[ci].astype(np.float64) * qt[comp["qt"]]
        blocks = np.zeros((nby, nbx, 64), dtype=np.float64)
        blocks[:, :, _JPEG_ZIGZAG] = deq
        blocks = blocks.reshape(nby, nbx, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _DCT_T.T, blocks, _DCT_T) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))

    # upsample to full resolution and crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["vs"], axis=0),
                      hmax // comp["hs"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(payload: bytes, width: int, height: int, channels: int,
                 fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_pixels(payload, width, height, channels)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise NotImplementedError(
        "BMP, PNG, and baseline JPEG decode without "
        "a codec library (none in this container); pass fake=True for "
        "the deterministic stub"
    )


def _to_u8_scale(px: np.ndarray) -> np.ndarray:
    """Present samples on the 0-255 scale regardless of source depth.
    decode_png keeps uint16 for 16-bit images (no precision thrown
    away); stats/features over a mixed-depth corpus must still share
    one scale or the deep images dominate every distance/stat.
    65535/257 == 255 exactly, so 8-bit inputs are untouched."""
    if px.dtype == np.uint16:
        return px.astype(np.float32) / np.float32(257.0)
    return px.astype(np.float32)


def image_stats(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "data",
    meta_cols: tuple[str, str, str] = ("width", "height", "channels"),
    fake_decode: bool = True,
) -> DataFrame:
    """Decode -> per-image mean/std per channel. mapInPandas streams Arrow
    batches; nothing is collected to the driver."""
    w_col, h_col, c_col = meta_cols
    out_schema = (
        f"{id_col} long, mean array<float>, std array<float>"
    )

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, stds = [], [], []
            # zipped numpy column iteration: decode is per-image by nature
            # (variable-size payloads / real codecs), but row access isn't —
            # iterrows built a pandas Series per row
            for i, buf, w, h, c in zip(
                pdf[id_col].to_numpy(), pdf[bytes_col].to_numpy(),
                pdf[w_col].to_numpy(), pdf[h_col].to_numpy(),
                pdf[c_col].to_numpy(),
            ):
                px = _to_u8_scale(
                    decode_image(bytes(buf), int(w), int(h), int(c), fake=fake_decode)
                ).astype(np.float64)
                ids.append(int(i))
                means.append(px.mean(axis=(0, 1)).astype(np.float32).tolist())
                stds.append(px.std(axis=(0, 1)).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: ids, "mean": means, "std": stds})

    return df.mapInPandas(_kernel, schema=out_schema)


def image_resize_features(
    df: DataFrame,
    target: tuple[int, int] = (8, 8),
    id_col: str = "id",
    bytes_col: str = "data",
    meta_cols: tuple[str, str, str] = ("width", "height", "channels"),
    fake_decode: bool = True,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> flattened float feature
    (the embedding-ish output an ANN index would consume)."""
    w_col, h_col, c_col = meta_cols
    tw, th = target

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, buf, w, h, c in zip(
                pdf[id_col].to_numpy(), pdf[bytes_col].to_numpy(),
                pdf[w_col].to_numpy(), pdf[h_col].to_numpy(),
                pdf[c_col].to_numpy(),
            ):
                px = decode_image(bytes(buf), int(w), int(h), int(c), fake=fake_decode)
                ys = (np.arange(th) * px.shape[0] // th).astype(int)
                xs = (np.arange(tw) * px.shape[1] // tw).astype(int)
                small = _to_u8_scale(px[np.ix_(ys, xs)]) / np.float32(255.0)
                ids.append(int(i))
                feats.append(small.ravel().tolist())
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return df.mapInPandas(_kernel, schema=f"{id_col} long, feature array<float>")


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Pure-numpy decoder for RIFF/AVI video: walks the RIFF/LIST chunk
    tree, reads frame timing from ``avih``, the video stream format
    from the ``strf`` following a ``vids`` ``strh``, and every
    ``..db``/``..dc`` frame chunk from ``movi``. Two codecs decode:
    uncompressed BI_RGB 24-bit DIB (each frame is BMP-style pixel data
    — bottom-up, 4-byte row padding, BGR) and Motion-JPEG (``MJPG``/
    ``dmb1`` FOURCC; each frame chunk is an independent baseline JPEG,
    typically DHT-less per the MJPEG convention — :func:`decode_jpeg`
    supplies the Annex K.3 defaults). Inter-frame codecs raise
    NotImplementedError. Returns ``(frames (n, h, w, 3) uint8 RGB,
    fps)``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    info = {"w": None, "h": None, "bits": None, "comp": None,
            "uspf": None, "last_strh": b"", "n_strh": 0, "vid_stream": None}
    frame_spans: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid in (b"RIFF", b"LIST"):
                walk(body + 4, body + size)  # skip the 4cc list type
            elif cid == b"avih":
                info["uspf"] = int.from_bytes(payload[body : body + 4], "little")
            elif cid == b"strh":
                # streams number in strh declaration order; remember
                # which index is the (first) video stream
                info["last_strh"] = payload[body : body + 4]
                if info["last_strh"] == b"vids" and info["vid_stream"] is None:
                    info["vid_stream"] = info["n_strh"]
                info["n_strh"] += 1
            elif (cid == b"strf" and info["last_strh"] == b"vids"
                  and info["w"] is None):
                info["w"] = int.from_bytes(
                    payload[body + 4 : body + 8], "little", signed=True
                )
                info["h"] = int.from_bytes(
                    payload[body + 8 : body + 12], "little", signed=True
                )
                info["bits"] = int.from_bytes(payload[body + 14 : body + 16], "little")
                info["comp"] = int.from_bytes(payload[body + 16 : body + 20], "little")
            elif cid[2:4] in (b"db", b"dc"):
                # only the video stream's chunks: an audio or second
                # video stream's nndb/nndc records would otherwise
                # interleave foreign frames into the array
                if (info["vid_stream"] is not None
                        and cid[:2] == b"%02d" % info["vid_stream"]):
                    frame_spans.append((body, size))
            pos = body + size + (size & 1)  # chunks are 2-byte aligned

    walk(12, len(payload))
    w, h, bits, comp = info["w"], info["h"], info["bits"], info["comp"]
    if w is None or not frame_spans:
        raise ValueError("AVI missing video stream format / frames")
    fps = 1e6 / info["uspf"] if info["uspf"] else 25.0
    if int(comp).to_bytes(4, "little").upper() in (b"MJPG", b"DMB1"):
        decoded = []
        for i, (off, size) in enumerate(frame_spans):
            frame = decode_jpeg(bytes(payload[off : off + size]))
            if decoded and frame.shape != decoded[0].shape:
                raise ValueError(
                    f"MJPEG frame {i} shape {frame.shape} != frame 0 "
                    f"shape {decoded[0].shape}"
                )
            decoded.append(frame)
        frames = np.stack(decoded)
        if frames.shape[2] != w or frames.shape[1] != abs(h):
            raise ValueError(
                f"MJPEG frame size {frames.shape[2]}x{frames.shape[1]} "
                f"!= strf {w}x{abs(h)}"
            )
        return frames, fps
    if comp != 0 or bits != 24:
        raise NotImplementedError(
            "only uncompressed 24-bit BI_RGB and MJPG AVI decode"
        )
    hh, bottom_up = abs(h), h > 0
    stride = (w * 3 + 3) & ~3
    frames = np.empty((len(frame_spans), hh, w, 3), dtype=np.uint8)
    for i, (off, size) in enumerate(frame_spans):
        if size < stride * hh:
            # reading stride*hh bytes from a short chunk would pull the
            # next chunk's header in as pixel rows with no error
            raise ValueError(
                f"AVI frame chunk {i}: {size} bytes < expected "
                f"{stride * hh} (truncated or non-BI_RGB frame)"
            )
        px = np.frombuffer(payload, dtype=np.uint8, offset=off,
                           count=stride * hh)
        px = px.reshape(hh, stride)[:, : w * 3].reshape(hh, w, 3)
        if bottom_up:
            px = px[::-1]
        frames[i] = px[:, :, ::-1]  # BGR -> RGB
    return frames, fps


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp.
    Pure JVM (sequence+explode) — the actual frame extraction would hang
    off the (stubbed) decoder in a mapInPandas stage."""
    n_frames = (F.col(duration_col) / every_ms).cast("int")
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ).alias("frame_idx", "frame_ts_ms"),
    )


def frame_features(
    df: DataFrame,
    every_ms: int = 1000,
    target: tuple[int, int] = (4, 4),
    id_col: str = "id",
    bytes_col: str = "data",
    meta_cols: tuple[str, str, str] = ("width", "height", "channels"),
    fake_decode: bool = True,
) -> DataFrame:
    """Video path end-to-end: the frame-sampling plan (sequence+explode,
    JVM) joined back to the payload, then one mapInPandas decode+resize
    per sampled frame. With ``fake_decode=False`` and an uncompressed
    RIFF/AVI payload the REAL frame at each sampled timestamp is
    extracted (decode_avi runs once per video — rows are id-sorted so
    one decoded clip is held at a time; frames index by ``ts * fps``);
    otherwise each frame's 'decode' seeds the
    stub with (payload, frame_ts) so frames differ deterministically.
    Output: (id, frame_idx, frame_ts_ms, feature array<float>)."""
    w_col, h_col, c_col = meta_cols
    plan = sample_frames(df, every_ms=every_ms, id_col=id_col)
    # sort each partition by id so a video's sampled-frame rows are
    # CONTIGUOUS: the kernel then holds exactly ONE decoded video at a
    # time (evict-on-id-change). An unordered batch spanning V videos
    # would pin V full uncompressed frame arrays at once — gigabytes
    # for minutes-long clips — in a single Python worker.
    joined = plan.join(
        df.select(id_col, bytes_col, w_col, h_col, c_col), id_col
    ).sortWithinPartitions(id_col, "frame_idx")
    tw, th = target

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_id: int | None = None
        cur: tuple[np.ndarray, float] | None = None
        for pdf in batches:
            ids, fidx, fts, feats = [], [], [], []
            for i, fi, ts, buf, w, h, c in zip(
                pdf[id_col].to_numpy(), pdf["frame_idx"].to_numpy(),
                pdf["frame_ts_ms"].to_numpy(), pdf[bytes_col].to_numpy(),
                pdf[w_col].to_numpy(), pdf[h_col].to_numpy(),
                pdf[c_col].to_numpy(),
            ):
                raw = bytes(buf)
                if not fake_decode:
                    # real path: decode the container once per video —
                    # rows are id-contiguous (sortWithinPartitions
                    # above), so a single-entry cache carried across
                    # Arrow batches suffices and bounds worker memory
                    # to one decoded video
                    if cur_id != int(i):
                        cur = decode_avi(raw)
                        cur_id = int(i)
                    frames, fps = cur
                    k = min(int(int(ts) * fps / 1000.0), len(frames) - 1)
                    px = frames[k]
                else:
                    # stub: mix the frame timestamp into the 8-byte seed
                    # window (multiplicative spread so nearby timestamps
                    # give unrelated frames)
                    seed8 = raw.ljust(8, b"\0")
                    mask = (1 << 64) - 1
                    mixed = (
                        int.from_bytes(seed8[:8], "little")
                        ^ ((int(ts) + 1) * 0x9E3779B97F4A7C15 & mask)
                    )
                    seed = mixed.to_bytes(8, "little") + seed8[8:]
                    px = decode_image(seed, int(w), int(h), int(c), fake=True)
                ys = (np.arange(th) * px.shape[0] // th).astype(int)
                xs = (np.arange(tw) * px.shape[1] // tw).astype(int)
                small = _to_u8_scale(px[np.ix_(ys, xs)]) / np.float32(255.0)
                ids.append(int(i))
                fidx.append(int(fi))
                fts.append(int(ts))
                feats.append(small.ravel().tolist())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "frame_ts_ms": fts,
                 "feature": feats}
            )

    return joined.mapInPandas(
        _kernel,
        schema=f"{id_col} long, frame_idx int, frame_ts_ms long,"
               " feature array<float>",
    )


# IMA/DVI ADPCM tables (IMA "Recommended Practices for Enhancing
# Digital Audio Compatibility", the same tables every implementation
# ships): 89-entry step sizes + 8-entry step-index adaptation.
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)
_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _decode_ima_adpcm(
    data: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM (WAV format tag 0x11) to interleaved int16 frames.

    Blocks are independent — each starts with a per-channel 4-byte
    header (predictor int16, step index uint8) that resets the decoder
    state — so the sample-index recurrence is the ONLY sequential
    dimension: the loop below runs samples-per-block (~2k) iterations
    of numpy ops vectorized over every (block, channel) at once, the
    same batch shape the Arrow-batched kernels use elsewhere.
    """
    c = n_channels
    if block_align <= 4 * c or (block_align - 4 * c) % (4 * c):
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    n_full, rem = divmod(len(data), block_align)
    raw = np.frombuffer(data, dtype=np.uint8)
    # pad a trailing partial block (its undecodable tail trims below)
    if rem:
        raw = np.concatenate([
            raw, np.zeros(block_align - rem, dtype=np.uint8)])
    n_blocks = n_full + (1 if rem else 0)
    if n_blocks == 0:
        return np.zeros(0, dtype=np.int16)
    blocks = raw.reshape(n_blocks, block_align)

    hdr = blocks[:, : 4 * c].reshape(n_blocks, c, 4).astype(np.int64)
    pred = ((hdr[:, :, 0] | (hdr[:, :, 1] << 8)) ^ 0x8000) - 0x8000  # int16
    step_idx = np.clip(hdr[:, :, 2], 0, 88)

    # data area: 4-byte sub-blocks round-robin the channels; low nibble
    # of each byte is the earlier sample
    body = blocks[:, 4 * c :].reshape(n_blocks, -1, c, 4)
    nib = np.empty(body.shape[:2] + (c, 8), dtype=np.int64)
    nib[..., 0::2] = body & 0x0F
    nib[..., 1::2] = (body >> 4) & 0x0F
    # (blocks, channels, samples-after-header)
    nib = nib.transpose(0, 2, 1, 3).reshape(n_blocks, c, -1)

    spb = nib.shape[2] + 1  # samples per block per channel
    out = np.empty((n_blocks, c, spb), dtype=np.int64)
    out[:, :, 0] = pred
    for s in range(1, spb):
        delta = nib[:, :, s - 1]
        step = _IMA_STEP_TABLE[step_idx]
        vpdiff = step >> 3
        vpdiff += np.where(delta & 4, step, 0)
        vpdiff += np.where(delta & 2, step >> 1, 0)
        vpdiff += np.where(delta & 1, step >> 2, 0)
        pred = pred + np.where(delta & 8, -vpdiff, vpdiff)
        pred = np.clip(pred, -32768, 32767)
        step_idx = np.clip(step_idx + _IMA_INDEX_TABLE[delta & 7], 0, 88)
        out[:, :, s] = pred
    if rem:
        # the padded tail of the last block never existed on disk
        real = ((rem - 4 * c) * 2) // c + 1 if rem > 4 * c else 0
        full = out[:-1].transpose(0, 2, 1).reshape(-1, c)
        last = out[-1:, :, :real].transpose(0, 2, 1).reshape(-1, c)
        frames = np.concatenate([full, last])
    else:
        frames = out.transpose(0, 2, 1).reshape(-1, c)
    return frames.reshape(-1).astype(np.int16)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/WAVE decoder: walks the chunk list, reads the fmt
    chunk (PCM=1 at 8/16-bit, IEEE-float=3 at 32-bit, G.711=6/7, IMA
    ADPCM=0x11) and the data chunk; multi-channel audio downmixes by
    mean. Returns (float32 waveform in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = max(int.from_bytes(fmt[2:4], "little"), 1)
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 1 and bits == 16:
        wave = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        wave = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_format == 3 and bits == 32:
        wave = np.frombuffer(data, dtype="<f4").astype(np.float32)
    elif audio_format in (6, 7) and bits == 8:
        # G.711 A-law (6) / mu-law (7): closed-form companding inverse,
        # one vectorized table-free pass (ITU-T G.711 tables are exactly
        # this piecewise formula evaluated at the 256 code points)
        codes = np.frombuffer(data, dtype=np.uint8)
        if audio_format == 7:  # mu-law
            u = (~codes).astype(np.int64) & 0xFF
            sign = np.where(u & 0x80, -1.0, 1.0)
            exp = (u >> 4) & 0x07
            mant = (u & 0x0F).astype(np.int64)
            mag = ((mant << 3) + 0x84).astype(np.int64) << exp
            pcm = sign * (mag - 0x84)
        else:  # A-law (0x80 set means POSITIVE after the 0x55 toggle)
            a = (codes ^ 0x55).astype(np.int64)
            sign = np.where(a & 0x80, 1.0, -1.0)
            exp = (a >> 4) & 0x07
            mant = (a & 0x0F).astype(np.int64)
            shifted = ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
            mag = np.where(exp == 0, (mant << 4) + 8, shifted)
            pcm = sign * mag
        wave = (pcm / 32768.0).astype(np.float32)
    elif audio_format == 0x11 and bits == 4:
        block_align = int.from_bytes(fmt[12:14], "little")
        pcm16 = _decode_ima_adpcm(data, n_channels, block_align)
        wave = pcm16.astype(np.float32) / 32768.0
    else:
        raise NotImplementedError(f"unsupported WAV encoding {audio_format}/{bits}")
    if n_channels > 1:
        wave = wave[: len(wave) - len(wave) % n_channels]
        wave = wave.reshape(-1, n_channels).mean(axis=1).astype(np.float32)
    return wave, rate


def decode_audio(payload: bytes, num_samples: int, fake: bool = False) -> np.ndarray:
    """Codec boundary (same contract as decode_image): real PCM/float/
    G.711/IMA-ADPCM WAV decodes in pure numpy; perceptual codecs
    (MP3/AAC) need an audio library; ``fake=True`` derives a
    deterministic float32 waveform in [-1, 1] from the payload hash."""
    if not fake and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        wave, _rate = decode_wav(payload)
        return wave
    if fake:
        seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        idx = np.arange(num_samples, dtype=np.uint64)
        vals = (idx * np.uint64(0x9E3779B97F4A7C15) + seed) >> np.uint64(40)
        # 24-bit values -> [-1, 1)
        return (
            vals.astype(np.float32) / np.float32(1 << 24)
        ) * np.float32(2.0) - np.float32(1.0)
    raise NotImplementedError(
        "only PCM/float WAV decodes without a codec library (none in "
        "this container); pass fake=True for the deterministic stub"
    )


def audio_features(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "data",
    samples_col: str = "num_samples",
    rate_col: str = "sample_rate",
    fake_decode: bool = True,
) -> DataFrame:
    """Decode -> per-clip features: RMS level, zero-crossing rate, and the
    dominant frequency bin (numpy rfft — no audio libs in the feature
    math). Same mapInPandas shape as image_stats: media bytes never leave
    executor Arrow buffers."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, zcr, dom = [], [], [], []
            for i, buf, n, sr in zip(
                pdf[id_col].to_numpy(), pdf[bytes_col].to_numpy(),
                pdf[samples_col].to_numpy(), pdf[rate_col].to_numpy(),
            ):
                wave = decode_audio(bytes(buf), int(n), fake=fake_decode)
                ids.append(int(i))
                rms.append(float(np.sqrt(np.mean(wave * wave))))
                zcr.append(
                    float(np.mean(np.abs(np.diff(np.signbit(wave)))))
                )
                spec = np.abs(np.fft.rfft(wave.astype(np.float64)))
                k = int(np.argmax(spec[1:]) + 1) if len(spec) > 1 else 0
                dom.append(k * float(sr) / max(int(n), 1))
            yield pd.DataFrame(
                {id_col: ids, "rms": rms, "zero_cross_rate": zcr,
                 "dominant_hz": dom}
            )

    return df.mapInPandas(
        _kernel,
        schema=f"{id_col} long, rms double, zero_cross_rate double,"
               " dominant_hz double",
    )


def synthetic_audio_table(spark, n: int = 32, num_samples: int = 2048,
                          sample_rate: int = 16_000) -> DataFrame:
    """Deterministic audio fixture (payload = id-seeded bytes)."""
    return spark.range(n).select(
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("data"),
        F.lit(num_samples).alias("num_samples"),
        F.lit(sample_rate).alias("sample_rate"),
    )


def synthetic_media_table(spark, n: int = 64, width: int = 32, height: int = 24,
                          channels: int = 3) -> DataFrame:
    """Deterministic binary-column fixture (payload = id-seeded bytes)."""
    df = spark.range(n).select(
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("data"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.lit(channels).alias("channels"),
        (F.col("id") % 5 * 1500 + 500).cast("long").alias("duration_ms"),
    )
    return df
