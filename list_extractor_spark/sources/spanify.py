"""Adapter: flat documents(text) -> span-structured documents (input_hint shape).

The driver testdata's documents table is flat text; the KG pipeline's input
contract is the span table.  This deterministic JVM-side transformation turns
each document into a one-section list page (sentences become italic-titled
list items), so the full pipeline can run — and be smoke-checked — over the
driver's parquet without any Python in the conversion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def spanify_documents(documents: DataFrame, res_class: str = "Writer") -> DataFrame:
    """documents(doc_id, text, lang, ...) -> (doc_id, lang, res_class, spans).

    Sentence split on '. ', each sentence's first 6 words wrapped as an italic
    list item with a deterministic year derived from the sentence index.
    """
    sentences = F.filter(
        F.split(F.col("text"), r"\.\s+"), lambda s: F.length(F.trim(s)) > 0
    )
    items = F.transform(
        sentences,
        lambda s, i: F.struct(
            F.lit("list_item:1").alias("kind"),
            F.concat(
                F.lit("''"),
                F.array_join(F.slice(F.split(F.trim(s), r"\s+"), 1, 6), " "),
                F.lit("'' ("),
                (F.lit(1900) + F.pmod(i * 7 + F.length(s), F.lit(120))).cast("string"),
                F.lit(")"),
            ).alias("text"),
            F.lit("").alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        ),
    )
    header = F.array(
        F.struct(
            F.lit("section:0").alias("kind"),
            F.lit("Works").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )
    )
    lang = F.when(F.col("lang").isin("en", "it", "de", "es"), F.col("lang")).otherwise(
        F.lit("en")
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        lang.alias("lang"),
        F.lit(res_class).alias("res_class"),
        F.concat(header, items).alias("spans"),
    )
