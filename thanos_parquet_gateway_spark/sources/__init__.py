from thanos_parquet_gateway_spark.sources.tables import (  # noqa: F401
    load_table,
    samples_from_events,
    SAMPLES_ORACLE_CTE,
)
