"""Structured Streaming layer: continuous triple extraction over a document
stream, plus watermarked windowed aggregation for late-arriving events."""
