"""Scale extensions beyond the reference (SURVEY.md §7.1 M8): the operators a
large-scale training-data pipeline needs — dedup, similarity search, text
analysis, multimodal column plumbing — designed for 100TB (no collects,
broadcast-or-bucketed joins, AQE-friendly shuffles)."""

from thanos_parquet_gateway_spark.operators import (  # noqa: F401
    dedup,
    sampling,
    similarity,
    sketches,
    text,
)
