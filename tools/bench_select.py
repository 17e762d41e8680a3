"""Select-latency benchmark mirroring the reference's BenchmarkSelect
(reference db/db_bench_test.go:69-141 — 10,000 idx × 8 status_code series,
5 matcher shapes; and the 1.5M-series "realistic" corpus of
db/db_bench_test.go:143-307, scaled down by --scale).

Usage: python tools/bench_select.py [--corpus simple|realistic] [--scale F]

Prints one JSON line {"metric": "select_bench", "corpus": ..., "queries":
{shape: steady_sec}} — the per-shape analogue of the reference harness so
select regressions are measurable against the same workload contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_simple(spark, n_idx: int):
    """10,000 idx × 8 status_code (80k series), 3 samples each."""
    from pyspark.sql import functions as F
    codes = ["200", "201", "301", "302", "404", "429", "500", "503"]
    base = spark.range(n_idx).select(F.col("id").alias("idx"))
    series = base.select(
        "idx", F.explode(F.array(*[F.lit(c) for c in codes])).alias("status_code"))
    samples = series.select(
        F.create_map(
            F.lit("__name__"), F.lit("http_requests_total"),
            F.lit("idx"), F.col("idx").cast("string"),
            F.lit("status_code"), F.col("status_code")).alias("labels"),
        F.explode(F.array(F.lit(0), F.lit(30_000), F.lit(60_000))).alias("ts"),
        (F.col("idx") * 8 + F.xxhash64("status_code") % 100).cast("double")
        .alias("value"))
    return samples


def build_realistic(spark, scale: float):
    """5 metrics × instances × regions × zones × services × envs (reference
    realistic corpus shape, scaled)."""
    from pyspark.sql import functions as F
    n_inst = max(2, int(100 * scale))
    n_svc = max(2, int(20 * scale))
    metrics = ["cpu_usage", "mem_usage", "disk_io", "net_rx", "net_tx"]
    df = (spark.range(n_inst).select(F.col("id").alias("inst"))
          .crossJoin(spark.range(5).select(F.col("id").alias("region")))
          .crossJoin(spark.range(10).select(F.col("id").alias("zone")))
          .crossJoin(spark.range(n_svc).select(F.col("id").alias("svc")))
          .crossJoin(spark.range(3).select(F.col("id").alias("env")))
          .crossJoin(spark.createDataFrame([(m,) for m in metrics], ["metric"])))
    return df.select(
        F.create_map(
            F.lit("__name__"), F.col("metric"),
            F.lit("instance"), F.concat(F.lit("inst-"), F.col("inst")),
            F.lit("region"), F.concat(F.lit("r"), F.col("region")),
            F.lit("zone"), F.concat(F.lit("z"), F.col("zone")),
            F.lit("service"), F.concat(F.lit("svc-"), F.col("svc")),
            F.lit("env"), F.element_at(F.array(F.lit("prod"), F.lit("staging"),
                                               F.lit("dev")),
                                       F.col("env").cast("int") + 1)).alias("labels"),
        F.lit(0).cast("long").alias("ts"),
        (F.col("inst") + F.col("svc")).cast("double").alias("value"))


SIMPLE_SHAPES = {  # name -> PromQL (reference matcher shapes, :69-141)
    "equality": 'http_requests_total{status_code="200"}',
    "regex_4xx": 'http_requests_total{status_code=~"4.."}',
    "regex_suffix": 'http_requests_total{status_code=~".*2"}',
    "all_series": 'http_requests_total',
    "single_series": 'http_requests_total{idx="5000", status_code="200"}',
}

REALISTIC_SHAPES = {  # analogue of :143-307's matcher list
    "eq_metric": 'cpu_usage',
    "eq_service": 'cpu_usage{service="svc-1"}',
    "neg_env": 'cpu_usage{env!="dev"}',
    "alt_region": 'cpu_usage{region=~"r1|r3"}',
    "multi": 'cpu_usage{region="r2", env="prod", service=~"svc-.*"}',
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="simple",
                    choices=["simple", "realistic"])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--n-idx", type=int, default=10_000)
    args = ap.parse_args()

    from thanos_parquet_gateway_spark import get_spark
    from thanos_parquet_gateway_spark.promql import PromQLEngine

    spark = get_spark("bench_select")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "samples")
        if args.corpus == "simple":
            df, shapes = build_simple(spark, args.n_idx), SIMPLE_SHAPES
        else:
            df, shapes = build_realistic(spark, args.scale), REALISTIC_SHAPES
        df.write.parquet(path)
        samples = spark.read.parquet(path)
        n = samples.count()
        eng = PromQLEngine(samples, lookback_ms=300_000)

        out = {}
        for name, promql in shapes.items():
            eng.query_instant(promql, 60_000).df.count()  # warm
            times = []
            for _ in range(3):
                t0 = time.monotonic()
                eng.query_instant(promql, 60_000).df.count()
                times.append(time.monotonic() - t0)
            out[name] = round(min(times), 4)
        print(json.dumps({"metric": "select_bench", "corpus": args.corpus,
                          "rows": n, "unit": "sec", "queries": out}))


if __name__ == "__main__":
    main()
