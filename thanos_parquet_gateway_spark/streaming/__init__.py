from thanos_parquet_gateway_spark.streaming.convert_stream import (  # noqa: F401
    batch_equivalent_rollup,
    stream_convert,
    stream_dedup,
    stream_rollup,
)
from thanos_parquet_gateway_spark.streaming.sessions import (  # noqa: F401
    batch_equivalent_sessions,
    stream_sessionize,
)
from thanos_parquet_gateway_spark.streaming.stateful import (  # noqa: F401
    batch_running_increase,
    stream_running_increase,
)
