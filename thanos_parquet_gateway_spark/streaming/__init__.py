from thanos_parquet_gateway_spark.streaming.convert_stream import (  # noqa: F401
    batch_equivalent_rollup,
    stream_convert,
    stream_rollup,
)
