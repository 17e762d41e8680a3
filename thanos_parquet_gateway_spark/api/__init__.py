from thanos_parquet_gateway_spark.api.http import PromHTTPServer  # noqa: F401
