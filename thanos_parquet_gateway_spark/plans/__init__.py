from thanos_parquet_gateway_spark.plans.entry_queries import (  # noqa: F401
    ORACLES,
    QUERIES,
    flagship,
)
