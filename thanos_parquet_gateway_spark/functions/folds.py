"""Deterministic, order-stable aggregation builders.

IEEE-754 float addition is not associative, so a native parallel SUM over
doubles is run-to-run nondeterministic in its low bits.  The reference
sidesteps this by evaluating single-threaded per series (promql-engine
vectorized eval); we sidestep it by folding a *sorted* array sequentially
with Spark's higher-order functions (JVM-side, codegen'd — no Python):

    array_sort(collect_list(struct(order, value)))  →  aggregate(arr, 0.0, +)

Used in two places:
- per-(series, step) windows (rate family, *_over_time): arrays are bounded
  by samples-per-window, so this is also the *scalable* plan at 100TB.
- cross-series instant aggregations in ``deterministic=True`` mode (oracle
  comparisons); production mode uses native partial aggregation instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

D = "double"


def sorted_pairs(order_col: Column, value_col: Column) -> Column:
    """collect_list of (o, v) sorted by o — the base of every fold.
    Aggregate expression; order key must be unique within the group."""
    return F.array_sort(
        F.collect_list(F.struct(order_col.alias("o"), value_col.alias("v"))))


def fold_sum(arr: Column) -> Column:
    """Sequential left fold — 0.0 + v1 + v2 ... (0.0+x == x exactly)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["v"])


def values_of(arr: Column) -> Column:
    return F.transform(arr, lambda x: x["v"])


def fold_avg(arr: Column) -> Column:
    return fold_sum(arr) / F.size(arr).cast(D)


def fold_var_pop(arr: Column) -> Column:
    """Population variance, two-pass (mean first), sequential fold."""
    mean = fold_avg(arr)
    return F.aggregate(
        arr, F.lit(0.0),
        lambda acc, x: acc + (x["v"] - mean) * (x["v"] - mean)) / F.size(arr).cast(D)


def fold_stddev_pop(arr: Column) -> Column:
    return F.sqrt(fold_var_pop(arr))


def fold_mad(arr: Column) -> Column:
    """Median absolute deviation: median(|v - median(v)|) with the PromQL
    quantile interpolation at q=0.5 for both medians (upstream
    funcMadOverTime, promql/functions.go)."""
    med = fold_quantile(arr, F.lit(0.5))
    dev = F.transform(
        arr, lambda x: F.struct(x["o"].alias("o"),
                                F.abs(x["v"] - med).alias("v")))
    return fold_quantile(dev, F.lit(0.5))


def fold_quantile(arr: Column, q: Column) -> Column:
    """PromQL quantile: linear interpolation on sorted values
    (matches Prometheus quantile(); q<0 → -Inf, q>1 → +Inf).

    NaN sorts FIRST, matching vectorByValueHeap.Less (Go promql/value.go:
    IsNaN(i) → Less) — Spark's default array_sort would put NaN last."""
    vals = F.array_sort(
        values_of(arr),
        lambda l, r: (F.when(F.isnan(l) & F.isnan(r), 0)
                      .when(F.isnan(l), -1)
                      .when(F.isnan(r), 1)
                      .when(l < r, -1)
                      .when(l > r, 1)
                      .otherwise(0)))
    n = F.size(vals)
    rank = q * (n - F.lit(1)).cast(D)
    lo = F.floor(rank).cast("int")
    hi = F.ceil(rank).cast("int")
    lo_v = F.element_at(vals, lo + 1)
    hi_v = F.element_at(vals, hi + 1)
    interp = lo_v + (hi_v - lo_v) * (rank - lo.cast(D))
    # NaN φ first: Spark orders NaN above every double, so the q > 1 branch
    # would otherwise claim it — upstream quantile() returns NaN for NaN φ
    return (F.when(F.isnan(q), F.lit(float("nan")))
             .when(q < 0, F.lit(float("-inf")))
             .when(q > 1, F.lit(float("inf")))
             .when(n == 0, F.lit(float("nan")))
             .otherwise(interp))
