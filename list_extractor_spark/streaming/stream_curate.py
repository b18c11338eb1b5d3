"""Streaming corpus curation: the stateless prefix of the curate chain as a
Structured Streaming flow.

A production corpus arrives continuously; the document-level quality rules
(tda/textstats.quality_filter) are a narrow, stateless projection, so the
SAME plan streams unchanged — per-document verdicts land in the sink as
files arrive, and the heavier set-semantics stages (line reassembly is
per-doc and could stream too, but dedup/decontamination need global state)
remain batch post-passes over the accumulated sink, exactly like the KG
stream's dedup stance (stream_extract.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from ..tda.textstats import quality_filter

# the driver documents table shape (doc_id, text, lang, ts)
DOCS_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_document_texts(
    spark: SparkSession, input_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """File-source stream over a documents parquet dir."""
    return (
        spark.readStream.schema(schema or DOCS_TEXT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def stream_quality_filter(
    docs_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    rules: dict | None = None,
    trigger_available_now: bool = True,
):
    """Continuous quality verdicts: the batch quality_filter plan applied
    per micro-batch (stateless -> append mode, exactly-once via the
    streaming checkpoint).  Returns the started query."""
    verdicts = quality_filter(docs_stream.select("doc_id", "text"), rules)
    writer = (
        verdicts.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
