"""thanos_parquet_gateway_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of thanos-io/thanos-parquet-gateway.

This is NOT a port: the reference (a Go Prometheus-TSDB→Parquet gateway,
see /root/reference) tells us WHAT to compute — the PromQL operator surface,
the parquet-backed time-series data model, the metadata APIs, and the
conversion/ETL semantics.  HOW we compute it is idiomatic Spark:

- long-format ``samples`` table (one row per sample), Hive-partitioned by
  day/stream, sorted within files by (__name__, series_hash, ts) — Catalyst
  partition pruning + Parquet page pushdown replace the reference's custom
  row-range/bloom/dictionary machinery (reference: search/constraint.go,
  search/materialize.go).
- a PromQL → DataFrame compiler (promql/) replaces thanos-io/promql-engine.
- conversion (convert/) is a single declarative Spark job replacing the
  goroutine pipeline in convert/convert.go.
- scale extensions (operators/): dedup, similarity search, text analysis,
  multimodal plumbing for training-data pipelines at 100TB scale.
"""

__version__ = "0.1.0"

from thanos_parquet_gateway_spark.session import get_spark  # noqa: F401
