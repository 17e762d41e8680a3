"""Dump .explain('formatted') for every bench query — plus the r13-tracked
non-bench paths (subquery rate, native-histogram rate, production
over-time/irate) — to plans/r13/<name>_<tag>.txt.

Usage: python tools/dump_plans_r13.py <tag> [query ...]
Tag is e.g. 'before' or 'after'.  With no query names, dumps everything.
Bench entries use the same make_benches() DataFrames as bench.py so the
plans are exactly what the bench times.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def _hist_rate_df(spark, sf_dir):
    """rate() over native-histogram samples in PRODUCTION mode — the same
    per-user daily cumulative histograms the promql_native_rate registry
    entry builds, evaluated with deterministic=False so the dumped plan is
    the production histogram-window path."""
    from pyspark.sql import functions as F

    from thanos_parquet_gateway_spark.plans import entry_queries as EQ
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    from thanos_parquet_gateway_spark.promql import histograms as H
    from thanos_parquet_gateway_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    ev = (e.filter((F.col("event_type") == "click") & (F.col("value") > 0) &
                   (F.col("ts_ms") <= EQ._NR_T))
          .select(F.col("user_id"), F.col("value"), F.col("ts_ms")))
    days = spark.createDataFrame([(t,) for t in EQ._NR_DAYS], "sts long")
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(days))
    j = grid.join(ev.withColumnRenamed("user_id", "uid"),
                  (F.col("uid") == F.col("user_id")) &
                  (F.col("ts_ms") <= F.col("sts")), "left")
    cnt_if = lambda c: F.count(F.when(c, 1)).cast("double")  # noqa: E731
    stats = j.groupBy("user_id", "sts").agg(
        F.count("value").cast("double").alias("cnt"),
        F.coalesce(F.sum(F.col("value").cast(EQ._DEC)),
                   F.lit(0).cast(EQ._DEC)).cast("double").alias("total"),
        cnt_if(F.col("value") <= 5).alias("b5"),
        cnt_if((F.col("value") > 5) & (F.col("value") <= 10)).alias("b10"),
        cnt_if(F.col("value") > 10).alias("binf"))
    buckets = F.array(*[
        F.struct(F.lit(le).alias("le"), F.col(c).alias("count"))
        for le, c in [(5.0, "b5"), (10.0, "b10"), (float("inf"), "binf")]])
    samples = stats.select(
        F.lit("lat_hist").alias("__name__"),
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("user")),
            F.array(F.lit("lat_hist"),
                    F.col("user_id").cast("string"))).alias("labels"),
        F.col("sts").alias("ts"),
        F.lit(float("nan")).alias("value"),
        H.make_hist(F.col("cnt"), F.col("total"), buckets).alias("hist"))
    eng = PromQLEngine(samples, lookback_ms=60_000, deterministic=False)
    return eng.query_instant("rate(lat_hist[4d])", EQ._NR_T).df


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, here)
    from pyspark.sql import functions as F

    from thanos_parquet_gateway_spark import get_spark
    from thanos_parquet_gateway_spark.operators import dedup, similarity
    from thanos_parquet_gateway_spark.plans import entry_queries as EQ
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    from thanos_parquet_gateway_spark.sources import samples_from_events
    from thanos_parquet_gateway_spark.sources.tables import load_table

    spark = get_spark("dump-plans")
    eng = PromQLEngine(samples_from_events(spark, sf_dir),
                       lookback_ms=EQ.LOOKBACK, deterministic=False)

    dfs = {
        "promql_instant_sum": lambda: eng.query_instant(
            "sum by (shard) (click)", EQ.T).df,
        "promql_range_rate": lambda: eng.query_range(
            "rate(click[2d])", EQ.R_START, EQ.R_END, EQ.STEP).df,
        "promql_range_agg": lambda: eng.query_range(
            "sum by (shard) (count_over_time(click[1d]))",
            EQ.R_START, EQ.R_END, EQ.STEP).df,
        "promql_topk_binop": lambda: eng.query_instant(
            "topk(5, count_over_time(click[7d]) / on(user) "
            "count_over_time(view[7d]))", EQ.T).df,
        "tpch_q1": lambda: EQ.QUERIES["tpch_q1_pricing"](spark, sf_dir),
        "tpch_q3": lambda: EQ.QUERIES["tpch_q3_shipping"](spark, sf_dir),
        "tpch_q5": lambda: EQ.QUERIES["tpch_q5_region_revenue"](spark, sf_dir),
        "dedup_lsh": lambda: dedup.lsh_candidate_pairs(
            load_table(spark, sf_dir, "documents")),
        "sim_topk": lambda: similarity.brute_force_topk_vectorized(
            load_table(spark, sf_dir, "embeddings"),
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")), k=5),
        "sim_lsh_topk": lambda: EQ.QUERIES["sim_lsh_topk"](spark, sf_dir),
        "events_sessionize": lambda: EQ.QUERIES["events_sessionize"](spark, sf_dir),
        "events_hopping": lambda: EQ.QUERIES["events_hopping_window"](spark, sf_dir),
        # r13-tracked non-bench paths (production mode, like the bench engine)
        "promql_subquery_rate": lambda: eng.query_range(
            "rate(click[2d:2h])", EQ.R_START, EQ.R_END, EQ.STEP).df,
        "promql_hist_rate": lambda: _hist_rate_df(spark, sf_dir),
    }

    for name, mk in dfs.items():
        if only and name not in only:
            continue
        df = mk()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
