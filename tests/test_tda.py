"""Behavioral tests for the training-data ops (beyond the DuckDB contract):
injected duplicates must be found, LSH must agree with the exact method on
high-similarity pairs, ANN must overlap the brute-force top-k."""

import pytest
from pyspark.sql import functions as F

from list_extractor_spark.tda import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "lang", "source"
    )
    # inject exact + near duplicates with known ids
    d0 = base.filter(F.col("doc_id") == "0").select("text").first()["text"]
    extra = spark.createDataFrame(
        [
            ("dup_exact", d0, "en", "synthetic"),
            ("dup_near", d0 + " trailing extra words here", "en", "synthetic"),
        ],
        schema="doc_id string, text string, lang string, source string",
    )
    return base.unionByName(extra)


def test_exact_dedup_finds_injected_duplicate(spark, docs):
    groups = dedup.exact_dedup(docs).filter(F.col("n_docs") > 1).collect()
    assert any(g["n_docs"] >= 2 for g in groups)
    kept = dedup.dedup_keep_first(docs)
    assert kept.count() == docs.count() - 1  # one exact dup collapsed


def test_shingle_jaccard_finds_near_duplicate(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs.filter(F.col("doc_id").isin("0", "dup_exact", "dup_near")), threshold=0.5
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert ("0", "dup_exact") in found
    assert ("0", "dup_near") in found


def test_minhash_lsh_agrees_with_exact_on_duplicates(spark, docs):
    sub = docs.filter(F.col("doc_id").isin("0", "dup_exact", "dup_near"))
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(sub, k=16, bands=8, threshold=0.5).collect()
    }
    assert ("0", "dup_exact") in lsh  # identical docs always collide


def test_simhash_identical_docs_same_fingerprint(spark, docs):
    fps = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(
            docs.filter(F.col("doc_id").isin("0", "dup_exact"))
        ).collect()
    }
    assert fps["0"] == fps["dup_exact"]


def test_fingerprint_ignores_punctuation(spark):
    df = spark.createDataFrame(
        [("a", "Hello, World!"), ("b", "hello world")], "doc_id string, text string"
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprints(df).collect()}
    assert fp["a"] == fp["b"]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("e", "the cat and the dog of the house"),
            ("d", "der Hund und die Katze und der Vogel"),
            ("u", "xyzzy plugh"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(df).collect()}
    assert out == {"e": "en", "d": "de", "u": "und"}


def test_ann_finds_planted_neighbor(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    # plant a positive-scaled copy: same hyperplane signs (guaranteed same
    # bucket) and cosine 1.0 (guaranteed brute-force top-1)
    planted = spark.createDataFrame(
        [(999999, [v * 0.5 for v in query], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rest = emb.filter(F.col("vec_id") != 0).unionByName(planted)
    brute = [r["vec_id"] for r in similarity.brute_force_topk(rest, query, k=1).collect()]
    assert brute == [999999]
    planes = similarity.make_planes(64, n_planes=4)
    ann = [r["vec_id"] for r in similarity.lsh_topk(rest, query, planes, k=1).collect()]
    assert ann == [999999]


def test_near_dup_pairs_detects_identical_embeddings(spark):
    rows = [(1, [1.0, 0.0, 0.0], 0), (2, [1.0, 0.0, 0.0], 0), (3, [0.0, 1.0, 0.0], 0),
            (4, [1.0, 0.0, 0.0], 1)]  # id 4 identical but different block
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"]
             for r in similarity.cosine_near_dup_pairs(df, threshold=0.99).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 4) not in pairs  # blocking bounds the comparison set


def test_media_features_shapes(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.media_from_documents(docs)
    feats = multimodal.extract_media_features(media, dim=4).collect()
    assert len(feats) == docs.count()
    assert all(len(r["feature"]) == 4 for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)


def test_decode_stub_raises(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG", "image")
