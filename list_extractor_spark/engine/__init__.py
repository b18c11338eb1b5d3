"""Spark execution layer: narrow extract stage, linking joins, canonicalization,
materialization, checkpoint/resume."""
