from thanos_parquet_gateway_spark.promql.parser import parse  # noqa: F401
from thanos_parquet_gateway_spark.promql.engine import PromQLEngine  # noqa: F401
