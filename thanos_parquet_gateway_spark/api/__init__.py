from thanos_parquet_gateway_spark.api.http import PromHTTPServer  # noqa: F401
from thanos_parquet_gateway_spark.api.server import QueryServer  # noqa: F401
