from thanos_parquet_gateway_spark.convert.convert import convert_samples  # noqa: F401
from thanos_parquet_gateway_spark.convert.planner import plan_days  # noqa: F401
from thanos_parquet_gateway_spark.convert.retention import (  # noqa: F401
    apply_retention,
    mark_for_deletion,
)
