"""fixtures/spark_hash.py must equal Spark's F.hash AND F.xxhash64
bit-for-bit — the minhash/simhash contract oracles are generated from it."""

from pyspark.sql import functions as F

from list_extractor_spark.fixtures.spark_hash import (
    hash_int,
    hash_long,
    spark_hash,
    spark_xxhash64,
    xxh64_int,
    xxh64_long,
    xxh64_str,
)

STRINGS = ["hello", "", "a", "abcd", "abcde", "ünïcødé ©", "x" * 100, "a b\tc"]
INTS = [0, 1, -1, 2**31 - 1, -(2**31), 12345]
LONGS = [0, 2**40, -5, 2**63 - 1, -(2**63)]
# every xxh64 code path: empty, <4, 4..7 (one 4-byte word), 8..31 (8-byte
# words + tails), exactly 32 (one stripe), >32 with every tail size
XXH_STRINGS = STRINGS + ["abcdefgh", "abcdefghijk", "y" * 31, "y" * 32,
                         "y" * 33, "y" * 36, "y" * 40, "y" * 41, "日本語テスト🎸"]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r[0] for r in df.select(F.hash("s")).collect()]
    assert got == [spark_hash(s) for s in STRINGS]


def test_int_and_long_hash_match_spark(spark):
    di = spark.createDataFrame([(i,) for i in INTS], "i int")
    assert [r[0] for r in di.select(F.hash("i")).collect()] == [
        hash_int(i, 42) for i in INTS
    ]
    dl = spark.createDataFrame([(v,) for v in LONGS], "l long")
    assert [r[0] for r in dl.select(F.hash("l")).collect()] == [
        hash_long(v, 42) for v in LONGS
    ]


def test_xxhash64_string_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in XXH_STRINGS], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [xxh64_str(s) for s in XXH_STRINGS]


def test_xxhash64_int_long_and_chaining_match_spark(spark):
    di = spark.createDataFrame([(i,) for i in INTS], "i int")
    assert [r[0] for r in di.select(F.xxhash64("i")).collect()] == [
        xxh64_int(i, 42) for i in INTS
    ]
    dl = spark.createDataFrame([(v,) for v in LONGS], "l long")
    assert [r[0] for r in dl.select(F.xxhash64("l")).collect()] == [
        xxh64_long(v, 42) for v in LONGS
    ]
    df = spark.createDataFrame([("en", "foo", 7)], "a string, b string, c int")
    assert df.select(F.xxhash64("a", "b", "c")).first()[0] == spark_xxhash64(
        "en", "foo", 7
    )


def test_chained_multi_arg_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r[0] for r in df.select(F.hash("s", F.lit(7))).collect()]
    assert got == [spark_hash(s, 7) for s in STRINGS]
    d4 = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    assert d4.select(F.hash("a", "b", "c", "d")).first()[0] == spark_hash(1, 2, 3, 4)


def test_vectorized_xxh64_grams_matches_scalar_replica():
    """_xxh64_grams_ascii must be bit-exact with the scalar xxh64_str replica
    (itself bit-exact with F.xxhash64) for every sliding k-gram, across gram
    lengths hitting the 8-byte-round / 4-byte-chunk / tail-byte code paths."""
    import numpy as np

    from list_extractor_spark.fixtures.spark_hash import xxh64_str
    from list_extractor_spark.tda.textstats import _xxh64_grams_ascii

    rng = np.random.RandomState(3)
    s = "".join(chr(c) for c in rng.randint(32, 127, size=200))
    buf = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    for k in (4, 5, 7, 8, 9, 12, 16, 20, 31):
        got = _xxh64_grams_ascii(buf, k)
        want = [xxh64_str(s[i : i + k]) for i in range(len(s) - k + 1)]
        assert got.tolist() == want, f"k={k}"


def test_vectorized_xxh64_grams_property(spark):
    """Property gate: for arbitrary ASCII text and gram length, the
    vectorized hash must equal BOTH the scalar replica and Spark's own
    F.xxhash64 on the exploded substrings."""
    from hypothesis import given, settings, strategies as st
    import numpy as np

    from list_extractor_spark.fixtures.spark_hash import xxh64_str
    from list_extractor_spark.tda.textstats import _xxh64_grams_ascii

    @settings(max_examples=60, deadline=None)
    @given(
        s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                  min_size=8, max_size=120),
        k=st.integers(min_value=4, max_value=31),
    )
    def check(s, k):
        if len(s) < k:
            return
        buf = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
        got = _xxh64_grams_ascii(buf, k).tolist()
        assert got == [xxh64_str(s[i : i + k]) for i in range(len(s) - k + 1)]

    check()

    # one Spark-side anchor (the replica itself is F.hash-verified elsewhere,
    # but pin the vectorized path to the JVM directly too)
    from pyspark.sql import functions as F

    s = "anchor string for the spark-side xxhash64 cross-check!"
    k = 9
    rows = spark.createDataFrame(
        [(s[i : i + k],) for i in range(len(s) - k + 1)], "g string"
    ).select(F.xxhash64("g").alias("h")).collect()
    buf = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    assert [r["h"] for r in rows] == _xxh64_grams_ascii(buf, k).tolist()


def test_vectorized_murmur3_matches_scalar_replica_and_spark(spark):
    """tda/_mm3.py (the numpy murmur3 powering the fused minhash pass) must
    be bit-exact against the scalar replica on random byte strings — all
    tail lengths, unicode, empties, and past the long-string fallback — and
    anchored to F.hash on the JVM directly."""
    import random

    import numpy as np

    from list_extractor_spark.fixtures.spark_hash import hash_bytes, hash_int
    from list_extractor_spark.tda._mm3 import (
        hash_int_chain_vec,
        hash_int_vec,
        murmur3_bytes_vec,
    )

    rng = random.Random(3)
    items = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        for _ in range(400)
    ]
    items += [b"", b"abc", "häuser straße".encode(),
              "ünïcodé shingle ".encode() * 80]  # > LONG_STRING_CUTOFF
    got = murmur3_bytes_vec(items)
    assert list(got) == [hash_bytes(b, 42) for b in items]

    base = got[:64]
    for i in (0, 5, 15):
        assert list(hash_int_vec(i, np.array(base))) == [
            hash_int(i, int(b) & 0xFFFFFFFF) for b in base
        ]

    cols = [np.array(base[j * 16:(j + 1) * 16], dtype=np.int32) for j in range(4)]
    chain = hash_int_chain_vec(cols)
    for r in range(16):
        h = 42
        for j in range(4):
            h = hash_int(int(cols[j][r]), h & 0xFFFFFFFF)
        assert chain[r] == h

    # JVM anchor: F.hash(sh, lit(i)) == hash_int_vec(i, murmur3_bytes_vec)
    from pyspark.sql import functions as F

    shingles = ["one two three", "vier fünf sechs", "", "x"]
    rows = spark.createDataFrame([(s,) for s in shingles], "sh string").select(
        *[F.hash("sh", F.lit(i)).alias(f"h{i}") for i in (0, 7)]
    ).collect()
    b = murmur3_bytes_vec([s.encode("utf-8") for s in shingles])
    for col, i in enumerate((0, 7)):
        assert [r[f"h{i}"] for r in rows] == list(hash_int_vec(i, b))


def test_murmur3_ranges_matches_bytes_form():
    """r7 shared-buffer form: hashing buf[s:e] ranges must be bit-identical
    to murmur3_bytes_vec over the sliced bytes, across multi-byte utf-8,
    empty ranges, word-boundary lengths and the long-string fallback."""
    import numpy as np

    from list_extractor_spark.tda._mm3 import (
        LONG_STRING_CUTOFF,
        murmur3_bytes_vec,
        murmur3_ranges_vec,
    )

    pieces = [
        b"one two three",
        "vier fünf sechs".encode("utf-8"),
        b"",
        b"x",
        b"abcd",
        b"abcdefg",
        b"q" * (LONG_STRING_CUTOFF + 17),  # long fallback
        "☃☃ snow".encode("utf-8"),
    ]
    buf = np.frombuffer(b"".join(pieces), dtype=np.uint8)
    ends = np.cumsum([len(p) for p in pieces]).astype(np.int64)
    starts = np.concatenate([[0], ends[:-1]]).astype(np.int64)
    for seed in (42, 0x3C6EF372):
        got = murmur3_ranges_vec(buf, starts, ends, seed=seed)
        want = murmur3_bytes_vec(pieces, seed=seed)
        assert list(got) == list(want)


def test_shingle_ranges_bytes_match_join_form():
    """_shingle_ranges byte windows must equal the per-shingle
    ' '.join(toks[i:i+n]).encode() the old kernels hashed."""
    import pandas as pd

    from list_extractor_spark.tda.dedup import _WS_SPLIT, _shingle_ranges

    texts = [
        "One two three four five",
        "\talpha  beta gamma delta",  # leading tab -> empty token; nbsp kept
        "too short",
        None,
        "a b c",
        "x " * 400,
    ]
    pdf = pd.DataFrame({"doc_id": [str(i) for i in range(len(texts))], "text": texts})
    doc_ids, buf, starts, ends, counts = _shingle_ranges(pdf, 3)
    bb = buf.tobytes()
    got = [bb[s:e] for s, e in zip(starts, ends)]
    want_ids, want = [], []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if text is None:
            continue
        toks = _WS_SPLIT.split(text.strip(" ").lower())
        if len(toks) < 3:
            continue
        want_ids.append(doc_id)
        want.extend(" ".join(toks[i : i + 3]).encode("utf-8") for i in range(len(toks) - 2))
    assert doc_ids == want_ids
    assert got == want
    assert int(counts.sum()) == len(want)
