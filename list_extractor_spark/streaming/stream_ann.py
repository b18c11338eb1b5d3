"""Streaming ANN index maintenance: PQ-encode embedding batches as they
arrive.

The PQ serving state (tda/similarity: codebooks + per-vector codes) is the
index a 10^9-vector corpus actually keeps hot, and it decomposes exactly
along the streaming boundary: codebooks are trained ONCE on a bounded sample
(driver-side, tiny — at web scale they are versioned artifacts, retrained
out-of-band), while the per-vector encode is a narrow stateless mapInPandas
projection, so the SAME batch plan streams unchanged — arriving vectors land
in the code table micro-batch by micro-batch, exactly-once via the streaming
checkpoint, and an ADC probe sees every vector ingested so far without ever
touching raw embeddings.  Re-quantization after codebook drift is a batch
re-encode, the same stance every stateful stage in this engine takes
(stream_extract.py's dedup, stream_curate.py's decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from ..tda.similarity import pq_encode

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
    ]
)


def stream_embeddings(
    spark: SparkSession, input_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """File-source stream over an embeddings parquet dir."""
    return (
        spark.readStream.schema(schema or EMBEDDINGS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )


def stream_pq_encode(
    emb_stream: DataFrame,
    codebooks,
    output_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuous PQ code maintenance: the batch encode plan (one narrow
    Arrow pass, tda/similarity.pq_encode) applied per micro-batch —
    stateless, so append mode + the checkpoint give exactly-once code rows.
    Returns the started query."""
    codes = pq_encode(emb_stream, codebooks)
    writer = (
        codes.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
