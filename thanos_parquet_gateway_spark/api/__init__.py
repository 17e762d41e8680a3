from thanos_parquet_gateway_spark.api.http import PromHTTPServer  # noqa: F401
from thanos_parquet_gateway_spark.api.server import QueryServer  # noqa: F401


def __getattr__(name):  # lazy: the gRPC stack pulls in socket/threading
    if name == "ThanosGrpcServer":
        from thanos_parquet_gateway_spark.api.grpc_server import (
            ThanosGrpcServer,
        )
        return ThanosGrpcServer
    if name == "ThanosGrpcClient":
        from thanos_parquet_gateway_spark.api.grpc_client import (
            ThanosGrpcClient,
        )
        return ThanosGrpcClient
    raise AttributeError(name)
