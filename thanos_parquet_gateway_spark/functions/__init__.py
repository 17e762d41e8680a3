from thanos_parquet_gateway_spark.functions import folds  # noqa: F401
