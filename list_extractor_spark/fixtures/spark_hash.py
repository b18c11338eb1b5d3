"""Pure-Python Murmur3_x86_32 matching Spark's ``F.hash`` exactly.

Spark's hash expression is the public Murmur3 x86 32-bit algorithm (Austin
Appleby, public domain; Spark's variant in
org.apache.spark.unsafe.hash.Murmur3_x86_32) with two Spark-specific
details mirrored here:

  * multi-argument hash chains the seed: h = 42; h = hash(col1, seed=h); ...
  * string bytes are consumed as little-endian 4-byte words, and the TAIL is
    mixed one SIGNED byte at a time (each tail byte goes through the full
    mixK1/mixH1 round — unlike canonical murmur3's single tail block).

Used by fixtures/contract_oracle.py to generate DuckDB oracles for the
minhash/simhash operators, whose outputs are deterministic functions of this
hash.  Verified against F.hash in tests/test_spark_hash.py.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * _C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _to_signed(x: int) -> int:
    return x - (1 << 32) if x & 0x80000000 else x


def hash_int(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashInt (Spark int/short/byte/boolean columns)."""
    h1 = _mix_h1(seed & _MASK, _mix_k1(value & _MASK))
    return _to_signed(_fmix(h1, 4))


def hash_long(value: int, seed: int) -> int:
    """Murmur3_x86_32.hashLong (Spark long columns)."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _MASK, _mix_k1(v & _MASK))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _MASK))
    return _to_signed(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int) -> int:
    """Murmur3_x86_32.hashUnsafeBytes (Spark string/binary columns)."""
    h1 = seed & _MASK
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:  # java byte is signed; sign-extend into the int
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _to_signed(_fmix(h1, n))


def hash_str(s: str, seed: int = 42) -> int:
    return hash_bytes(s.encode("utf-8"), seed)


# -- XxHash64 (Spark's F.xxhash64) --------------------------------------------
# Spark's XxHash64 expression is the public xxHash 64-bit algorithm (Yann
# Collet, BSD; Spark's port in org.apache.spark.sql.catalyst.expressions.XXH64)
# with the same Spark-specific seed chaining as F.hash and default seed 42.
# Tail bytes are consumed UNSIGNED (& 0xFF), unlike murmur3's signed tails.

_M64 = 0xFFFFFFFFFFFFFFFF
_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def _xxh_merge(h: int, v: int) -> int:
    h ^= _xxh_round(0, v)
    return (h * _P64_1 + _P64_4) & _M64


def _xxh_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x & (1 << 63) else x


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64.hashUnsafeBytes (Spark string/binary columns)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed
        v4 = (seed - _P64_1) & _M64
        while i + 32 <= n:
            v1 = _xxh_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _xxh_merge(h, v)
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xxh_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    return _to_signed64(_xxh_fmix(h))


def xxh64_long(value: int, seed: int) -> int:
    """XXH64.hashLong (Spark long columns)."""
    seed &= _M64
    h = (seed + _P64_5 + 8) & _M64
    h ^= (_rotl64((value & _M64) * _P64_2 & _M64, 31) * _P64_1) & _M64
    h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
    return _to_signed64(_xxh_fmix(h))


def xxh64_int(value: int, seed: int) -> int:
    """XXH64.hashInt (Spark int/short/byte/boolean columns)."""
    seed &= _M64
    h = (seed + _P64_5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P64_1) & _M64
    h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
    return _to_signed64(_xxh_fmix(h))


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64_bytes(s.encode("utf-8"), seed)


def spark_xxhash64(*values, seed: int = 42) -> int:
    """F.xxhash64(*cols) for str/int values: seed chains across arguments
    exactly like F.hash."""
    h = seed
    for v in values:
        if isinstance(v, str):
            h = xxh64_str(v, h)
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = xxh64_int(v, h)
            else:
                h = xxh64_long(v, h)
        else:
            raise TypeError(type(v))
    return h


def spark_hash(*values, seed: int = 42) -> int:
    """F.hash(*cols) for str/int values: seed chains across arguments.
    Python ints are hashed as Spark INT when they fit, else LONG — pass
    explicit widths via hash_int/hash_long when it matters."""
    h = seed
    for v in values:
        if isinstance(v, str):
            h = hash_str(v, h)
        elif isinstance(v, int):
            if -(1 << 31) <= v < (1 << 31):
                h = hash_int(v, h)
            else:
                h = hash_long(v, h)
        else:
            raise TypeError(type(v))
    return h
