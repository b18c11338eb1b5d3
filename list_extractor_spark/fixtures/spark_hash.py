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
