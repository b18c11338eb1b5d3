"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting (normalized hash + rolling-hash winnowing).  All
JVM-side expressions (regexp/length/split/window) so they stay inside
whole-stage codegen; every one has a DuckDB oracle (ANSI SQL or a generated
VALUES literal from the bit-exact python hash replicas)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# language -> marker words for the n-gram/stopword heuristic (deterministic
# CASE logic; SQL-expressible for the DuckDB oracle)
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
    "it": ["il", "che", "di"],
}


def _marker_count(lang: str):
    pat = r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), F.lit(0)))


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language ID: most marker hits wins, ties broken by the
    fixed language order en > de > es > it, 'und' (unknown) when zero hits."""
    counts = documents.select(
        "doc_id",
        *[_marker_count(lang).alias(f"n_{lang}") for lang in _LANG_MARKERS],
    )
    best = F.greatest(*[F.col(f"n_{lang}") for lang in _LANG_MARKERS])
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(F.col("n_en") == best, F.lit("en"))
        .when(F.col("n_de") == best, F.lit("de"))
        .when(F.col("n_es") == best, F.lit("es"))
        .otherwise(F.lit("it"))
    )
    return counts.select("doc_id", pred.alias("pred_lang"))


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword proxy (4 chars/token of the
    alphanumeric mass), both as integer columns."""
    return documents.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws_tokens"),
        F.ceil(
            F.length(F.regexp_replace("text", r"[^A-Za-z0-9]", "")) / F.lit(4)
        ).cast("bigint").alias("n_bpe_est"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio — the usual pre-training filters."""
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"\b(the|and|of|a|to|in|is|it)\b"), F.lit(0)
        )
    )
    n_upper = F.length(F.regexp_replace("text", r"[^A-Z]", ""))
    return documents.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round((n_chars - n_tokens + 1) / n_tokens, 4).alias("mean_word_len"),
        F.round(n_upper / n_chars, 4).alias("upper_ratio"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Normalized-content fingerprint: md5 over lowercased alphanumeric text —
    robust to whitespace/punctuation-only edits (near-exact dedup key)."""
    return documents.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"[^a-z0-9]", "")).alias("fingerprint"),
    )


# ASCII whitespace class shared with the python oracle replica (java \s)
_WS = "[ \\t\\n\\x0B\\f\\r]+"


def winnow_posting(documents: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, fp) rows: rolling-hash winnowing fingerprints (the MOSS
    algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03) — the partial-overlap
    dedup primitive exact hashing can't provide.

    Normalize (lower, collapse ASCII whitespace) -> character k-grams ->
    xxhash64 per gram -> minimum over each w-gram sliding window -> distinct
    selected hashes per document.  Guarantees any shared substring of length
    >= k + w - 1 contributes a shared fingerprint.

    Plan shape: explode(sequence) + substring + xxhash64 are whole-stage
    codegen; the only shuffle is the per-doc window (partitionBy doc_id),
    the same single-exchange shape as shingle_posting.  No interpreted HOFs:
    the k-gram transform is explode-then-substring, not transform()."""
    t = F.regexp_replace(F.lower("text"), _WS, " ")
    d = documents.select("doc_id", t.alias("t")).filter(F.length("t") >= k)
    grams = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t") - (k - 1))).alias("pos"),
        F.col("t"),
    ).select("doc_id", "pos", F.xxhash64(F.expr(f"substring(t, pos, {k})")).alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    return (
        grams.select("doc_id", "pos", F.min("h").over(win).alias("fp"))
        .filter(F.col("pos") >= w)  # full windows only (standard winnowing)
        .select("doc_id", "fp")
        .distinct()
    )


def winnow_signatures(documents: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """Compact per-document winnowing signature: fingerprint-set size and the
    xor-fold of the set (order-insensitive, collision-resistant enough for a
    change-detection key; the posting form above serves similarity joins)."""
    return (
        winnow_posting(documents, k, w)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fp"),
            F.bit_xor("fp").alias("fp_xor"),
        )
    )
