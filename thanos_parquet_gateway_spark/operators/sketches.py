"""Mergeable-sketch operators (SURVEY.md §7.1 M8 "novel sketch" slot).

At 100 TB you never recount distincts: each partition/day/shard folds its
rows into a SMALL sketch once, and every later question (rolling windows,
cross-shard totals, backfills) is answered by MERGING sketches — no second
pass over the raw data.  Spark ships the Apache DataSketches HLL family as
built-in aggregates (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole pattern stays JVM-side and
codegen'd; these helpers wrap it into the shapes a training-data pipeline
uses.

Determinism: an HLL register is a MAX over per-item hashes — insensitive
to row order and partitioning — so every estimate here is a stable,
reproducible number (asserted by tests), just not one an independent SQL
engine reproduces (DuckDB's approx_count_distinct is a different sketch).
Registry entries built on these are therefore rows-only checks; pytest
carries the accuracy (vs exact counts) and mergeability invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2 of the HLL register count: 12 → 4096 registers, ~1.6% relative
#: standard error, 2-4 KB per sketch — the classic monitoring trade-off
DEFAULT_LG_K = 12


def daily_sketches(df: DataFrame, key_col: str, *, by: tuple[str, ...] = (),
                   ts_ms_col: str = "ts_ms",
                   lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """One HLL sketch of ``key_col`` per (day, *by) group — the store-once
    layer.  Output: (day, *by, sketch, approx_distinct).  The groupBy is
    the only shuffle, with map-side partial sketches (sketch merge is the
    aggregation's combine step), so the exchange carries one small binary
    per group per map partition rather than raw keys."""
    day = (F.col(ts_ms_col) / F.lit(86_400_000)).cast("long").alias("day")
    g = df.groupBy(day, *[F.col(c) for c in by]).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"),
                         F.lit(lg_k)).alias("sketch"))
    return g.withColumn(
        "approx_distinct",
        F.hll_sketch_estimate("sketch").cast("double"))


def merge_sketches(daily: DataFrame, *, by: tuple[str, ...] = (),
                   sketch_col: str = "sketch") -> DataFrame:
    """The merge layer: union per-day sketches into one estimate per
    ``by`` group WITHOUT touching raw data — the reason sketches beat
    count(distinct) at scale.  Output: (*by, days_observed,
    approx_distinct)."""
    keys = [F.col(c) for c in by] if by else [F.lit(1).alias("__all")]
    out = (daily.groupBy(*keys)
           .agg(F.hll_union_agg(F.col(sketch_col)).alias("__merged"),
                F.count("*").alias("days_observed"))
           .withColumn("approx_distinct",
                       F.hll_sketch_estimate("__merged").cast("double"))
           .drop("__merged"))
    return out.drop("__all") if not by else out


def distinct_rollup(df: DataFrame, key_col: str, *,
                    by: tuple[str, ...] = (), ts_ms_col: str = "ts_ms",
                    lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """daily_sketches |> merge_sketches in one call: per-``by`` distinct
    ``key_col`` estimate over the whole frame, computed the mergeable way
    (so the daily layer is reusable/persistable).  Output: (*by,
    days_observed, approx_distinct)."""
    return merge_sketches(
        daily_sketches(df, key_col, by=by, ts_ms_col=ts_ms_col, lg_k=lg_k),
        by=by)
