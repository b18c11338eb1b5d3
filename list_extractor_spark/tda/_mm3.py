"""Vectorized (numpy) Murmur3_x86_32 matching Spark's ``F.hash`` bit-for-bit.

The scalar reference lives in fixtures/spark_hash.py (verified against
F.hash in tests/test_spark_hash.py); this module is the same algorithm in
array form so the fused minhash pass (tda/dedup.minhash_doc_stats) can hash
millions of shingles per Arrow batch without a per-string Python loop —
the same replica-vectorization pattern as textstats._xxh64_grams_ascii.

Spark specifics mirrored (see fixtures/spark_hash.py docstring): 4-byte
little-endian words, tail bytes mixed one SIGNED byte at a time through the
full mixK1/mixH1 round, multi-argument hash chains the previous hash as the
seed.  Verified against the scalar replica (and thereby F.hash) in
tests/test_spark_hash.py."""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_C1 = _U32(0xCC9E2D51)
_C2 = _U32(0x1B873593)

# strings longer than this fall back to the scalar replica (padding cost of
# the matrix form is n * maxlen; one pathological shingle must not inflate
# the whole batch)
LONG_STRING_CUTOFF = 512


def _rotl(x, r):
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _mix_k1(k1):
    return _rotl(k1 * _C1, 15) * _C2


def _mix_h1(h1, k1):
    # k1 must already be _mix_k1'd (same contract as the scalar replica)
    h1 = h1 ^ k1
    return _rotl(h1, 13) * _U32(5) + _U32(0xE6546B64)


def _fmix(h1, length):
    h1 = h1 ^ length
    h1 = h1 ^ (h1 >> _U32(16))
    h1 = h1 * _U32(0x85EBCA6B)
    h1 = h1 ^ (h1 >> _U32(13))
    h1 = h1 * _U32(0xC2B2AE35)
    return h1 ^ (h1 >> _U32(16))


def murmur3_bytes_vec(items: list, seed: int = 42) -> np.ndarray:
    """hash of each byte string (Spark string-column semantics), as int32.

    ``items``: list of ``bytes``.  Zero-copy-ish: one fixed-width 'S' array
    (C-level pad) viewed as a [n, maxlen] uint8 matrix; word mixing loops
    over BLOCK INDEX (maxlen/4 iterations of full-array ops), not strings."""
    n = len(items)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter(map(len, items), dtype=np.int64, count=n)
    out = np.empty(n, dtype=np.int32)
    long_mask = lens > LONG_STRING_CUTOFF
    if long_mask.any():
        from ..fixtures.spark_hash import hash_bytes

        idx = np.nonzero(long_mask)[0]
        for i in idx:
            out[i] = hash_bytes(items[i], seed)
        keep = np.nonzero(~long_mask)[0]
        if not len(keep):
            return out
        sub = murmur3_bytes_vec([items[i] for i in keep], seed)
        out[keep] = sub
        return out

    maxlen = int(lens.max(initial=0))
    pad = max(4, (maxlen + 3) // 4 * 4)
    # np.array over a bytes list builds a fixed-width zero-padded 'S' array
    # in C; itemsize must be forced (np.array trims to the longest item)
    arr = np.array(items, dtype=f"S{pad}")
    mat = arr.view(np.uint8).reshape(n, pad)
    return _hash_padded(mat, lens, seed)


def _hash_padded(mat: "np.ndarray", lens: "np.ndarray", seed: int) -> "np.ndarray":
    """Murmur3 over a zero-padded [n, pad] uint8 matrix with true byte
    lengths ``lens`` (pad must be a multiple of 4) — the shared core of the
    bytes-list and shared-buffer entry points."""
    n, pad = mat.shape
    words = mat.reshape(n, pad // 4, 4).astype(_U32)
    words = (
        words[:, :, 0]
        | (words[:, :, 1] << _U32(8))
        | (words[:, :, 2] << _U32(16))
        | (words[:, :, 3] << _U32(24))
    )
    nblocks = (lens // 4).astype(np.int64)
    h = np.full(n, _U32(seed & 0xFFFFFFFF), dtype=_U32)
    for j in range(int(nblocks.max(initial=0))):
        m = nblocks > j
        h[m] = _mix_h1(h[m], _mix_k1(words[m, j]))
    # tail: each remaining byte sign-extended (java byte) then full round
    rows = np.arange(n)
    for t in range(3):
        pos = nblocks * 4 + t
        m = pos < lens
        if not m.any():
            break
        b = mat[rows[m], pos[m]].astype(np.int8).astype(np.int64)
        h[m] = _mix_h1(h[m], _mix_k1((b & 0xFFFFFFFF).astype(_U32)))
    return _fmix(h, lens.astype(_U32)).astype(np.int32)


def murmur3_ranges_vec(
    buf: "np.ndarray", starts: "np.ndarray", ends: "np.ndarray", seed: int = 42
) -> np.ndarray:
    """hash of ``buf[starts[i]:ends[i]]`` for each i — the shared-buffer form
    (r7): callers that already hold one concatenated byte buffer (e.g. the
    batch-level normalized token stream in the shingle kernels) hash every
    range without materializing per-range bytes objects.  Bit-identical to
    murmur3_bytes_vec over the sliced bytes (same padded-matrix core).

    Ranges longer than LONG_STRING_CUTOFF fall back to the scalar replica so
    one pathological range cannot inflate the whole matrix."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = (ends - starts).astype(np.int64)
    out = np.empty(n, dtype=np.int32)
    long_mask = lens > LONG_STRING_CUTOFF
    keep = np.nonzero(~long_mask)[0]
    if long_mask.any():
        from ..fixtures.spark_hash import hash_bytes

        bb = buf.tobytes()
        for i in np.nonzero(long_mask)[0]:
            out[i] = hash_bytes(bb[starts[i] : ends[i]], seed)
        if not len(keep):
            return out
        starts, ends, lens = starts[keep], ends[keep], lens[keep]
    maxlen = int(lens.max(initial=0))
    pad = max(4, (maxlen + 3) // 4 * 4)
    # gather the padded matrix straight out of the shared buffer: index rows
    # run past short ranges' ends (clipped for safety), then zeroed by the
    # length mask so padding matches the 'S'-array form exactly
    idx = starts[:, None] + np.arange(pad, dtype=np.int64)[None, :]
    np.clip(idx, 0, len(buf) - 1, out=idx)
    mat = buf[idx]
    mat *= np.arange(pad, dtype=np.int64)[None, :] < lens[:, None]
    res = _hash_padded(mat, lens, seed)
    if long_mask.any():
        out[keep] = res
        return out
    return res


def hash_int_vec(value: int, seeds: np.ndarray) -> np.ndarray:
    """hashInt of a CONSTANT int over an array of seeds — the minhash
    permutation form F.hash(sh, lit(i)) = hashInt(i, seed=hash(sh))."""
    s = seeds.astype(np.int32).view(_U32) if seeds.dtype != _U32 else seeds
    # 1-element array, not a numpy scalar: scalar uint multiplies emit
    # overflow RuntimeWarnings even though they wrap correctly
    k1 = _mix_k1(np.array([value & 0xFFFFFFFF], dtype=_U32))
    return _fmix(_mix_h1(s, k1), _U32(4)).astype(np.int32)


def hash_int_chain_vec(columns: list[np.ndarray], seed: int = 42) -> np.ndarray:
    """Multi-int F.hash(c0, c1, ...) over parallel arrays: fold each column
    through hashInt with the running hash as seed — the LSH band-hash form."""
    h = None
    for col in columns:
        v = col.astype(np.int32).view(_U32)
        k1 = _mix_k1(v)
        if h is None:
            h = _fmix(_mix_h1(np.full(len(v), _U32(seed), dtype=_U32), k1), _U32(4))
        else:
            h = _fmix(_mix_h1(h.view(_U32) if h.dtype != _U32 else h, k1), _U32(4))
        h = h.astype(_U32)
    return h.astype(np.int32)