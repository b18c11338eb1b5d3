"""fixtures/spark_hash.py must equal Spark's F.hash bit-for-bit — the
minhash/simhash contract oracles are generated from it."""

from pyspark.sql import functions as F

from list_extractor_spark.fixtures.spark_hash import (
    hash_int,
    hash_long,
    spark_hash,
)

STRINGS = ["hello", "", "a", "abcd", "abcde", "ünïcødé ©", "x" * 100, "a b\tc"]
INTS = [0, 1, -1, 2**31 - 1, -(2**31), 12345]
LONGS = [0, 2**40, -5, 2**63 - 1, -(2**63)]


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


def test_chained_multi_arg_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r[0] for r in df.select(F.hash("s", F.lit(7))).collect()]
    assert got == [spark_hash(s, 7) for s in STRINGS]
    d4 = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    assert d4.select(F.hash("a", "b", "c", "d")).first()[0] == spark_hash(1, 2, 3, 4)
