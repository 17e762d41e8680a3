"""PromQL function library: *_over_time, the rate family, histogram_quantile,
label manipulation, time functions (SURVEY.md §2.C).

The rate family implements Prometheus' published extrapolation algorithm
(counter-reset correction + boundary extrapolation) — the reference proves
these semantics via differential tests (reference db/db_test.go:616-659).
All window math folds *sorted* per-(series, step) arrays with Spark
higher-order functions: JVM-side, deterministic, bounded by samples-per-window
— the scalable shape at 100TB (no driver collects, no UDFs).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from thanos_parquet_gateway_spark.functions import folds
from thanos_parquet_gateway_spark.promql import ast as A
from thanos_parquet_gateway_spark.promql.compiler import (
    _MATH_FUNCS,
    _TIME_FUNCS,
    NAN,
    INF,
    NEG_INF,
    Compiler,
    PromQLCompileError,
)
from thanos_parquet_gateway_spark.promql.values import (
    InstantVector,
    RangeVector,
    ScalarV,
    StringV,
)
from thanos_parquet_gateway_spark.schema import cached_lit as _lit
from thanos_parquet_gateway_spark.schema import (
    canonical_sig,
    drop_labels,
    labels_from_sig,
)

D = "double"


def _drop_name(df):
    return (df.withColumn("labels", drop_labels("labels", ["__name__"]))
            .withColumn("sig", canonical_sig(F.col("labels"))))


def _iv(df) -> InstantVector:
    extra = ["hist"] if "hist" in df.columns else []
    return InstantVector(df.select("t", "sig", "labels", "sample_ts", "value",
                                   *extra))


def _finalize(g, val: Column, *, drop_name: bool = True,
              hist: Column | None = None) -> InstantVector:
    """ONE fused projection off an aggregated frame ``g``: labels (taken
    from the column when present, rebuilt from the canonical sig when the
    aggregation skipped the rebuild), the optional __name__ drop with its
    sig re-canonicalization, the NULL sample_ts and the value — replacing
    the select → _drop_name (2 withColumns) → _iv(select) chain.  Each
    chained DataFrame op is a JVM plan step with incremental re-analysis;
    fusing them is pure per-query compile-latency reduction (same plan
    after optimization)."""
    lbl = F.col("labels") if "labels" in g.columns else labels_from_sig("sig")
    sample_ts = _lit(None).cast("long").alias("sample_ts")
    extra = [hist.alias("hist")] if hist is not None else []
    if drop_name:
        nl = drop_labels(lbl, ["__name__"])
        return InstantVector(g.select(
            "t", canonical_sig(nl).alias("sig"), nl.alias("labels"),
            sample_ts, val.alias("value"), *extra))
    return InstantVector(g.select("t", "sig", lbl.alias("labels"),
                                  sample_ts, val.alias("value"), *extra))


def _range_arg(c: Compiler, call: A.Call, idx: int = 0) -> RangeVector:
    v = c.compile(call.args[idx])
    if not isinstance(v, RangeVector):
        raise PromQLCompileError(f"{call.func} expects a range vector")
    return v


def _vector_arg(c: Compiler, call: A.Call, idx: int = 0) -> InstantVector:
    """Strict instant-vector argument: upstream's parser-stage typecheck
    never coerces scalars into vectors (abs(1), scalar(scalar(x)) etc. are
    type errors; only the explicit vector() function converts)."""
    v = c.compile(call.args[idx])
    if isinstance(v, (float, ScalarV)):
        raise PromQLCompileError(
            "expected type instant vector in call to function "
            f"\"{call.func}\", got scalar")
    if isinstance(v, RangeVector):
        raise PromQLCompileError(
            "expected type instant vector in call to function "
            f"\"{call.func}\", got range vector")
    if not isinstance(v, InstantVector):
        raise PromQLCompileError(
            f"expected instant vector in call to {call.func}")
    return v


def _scalar_lit(c: Compiler, call: A.Call, idx: int) -> float:
    v = c.compile(call.args[idx])
    if not isinstance(v, float):
        raise PromQLCompileError(f"{call.func} arg {idx} must be a literal scalar")
    return v


# ---------------------------------------------------------------- over_time
def _collect_window(rv: RangeVector):
    """(t, sig) → sorted array of (ts, value) + labels (arrays bounded by
    samples-per-window).  Keyed on xxhash64(sig) — see compiler.hgroup."""
    from thanos_parquet_gateway_spark.promql.compiler import hgroup
    return hgroup(rv.df, "sig",
                  folds.sorted_pairs(F.col("ts"), F.col("value")).alias("arr"),
                  labels="labels")


# over_time/regression functions that IGNORE native-histogram samples:
# upstream computes over the window's floats only, emits NO sample for a
# histogram-only window, and adds
# annotations.NewHistogramIgnoredInMixedRangeInfo when a window carries
# both kinds (Prometheus 3.x functions.go funcMinOverTime / funcDeriv /
# funcPredictLinear / funcDoubleExponentialSmoothing / ...)
_HIST_IGNORE = frozenset((
    "min_over_time", "max_over_time", "stddev_over_time", "stdvar_over_time",
    "mad_over_time", "quantile_over_time",
    "ts_of_max_over_time", "ts_of_min_over_time"))


def _collect_window_floats(c: Compiler, rv: RangeVector, min_n: int = 1):
    """_collect_window for the histogram-IGNORING functions when the range
    vector carries a hist column: histogram samples drop from the fold
    array, windows with fewer than ``min_n`` float samples drop entirely
    (upstream emits no output row), and a window holding BOTH kinds
    registers the upstream mixed-range info annotation as a data probe
    (read only when annotations are requested — not on the query hot
    path)."""
    from thanos_parquet_gateway_spark.promql.compiler import hgroup
    g = hgroup(
        rv.df, "sig",
        F.array_sort(F.collect_list(F.when(
            F.col("hist").isNull(),
            F.struct(F.col("ts").alias("o"),
                     F.col("value").alias("v"))))).alias("arr"),
        F.count(F.col("hist")).alias("__nh"),  # count() skips NULLs
        labels="labels")
    g = g.filter(F.size("arr") >= min_n)
    c.add_data_probe(
        g.filter(F.col("__nh") > 0).limit(1).select(
            _lit("info").alias("kind"),
            F.concat(_lit("ignored histograms in a range containing both "
                           "floats and histograms for metric name \""),
                     F.coalesce(F.col("labels")["__name__"], _lit("")),
                     _lit("\"")).alias("msg")))
    return g.drop("__nh")


def _window_floats(c: Compiler, rv: RangeVector, min_n: int = 1):
    """Dispatch: float-only collection (+ mixed-range info probe) when the
    range vector can carry histograms, the plain collect otherwise."""
    if "hist" in rv.columns:
        return _collect_window_floats(c, rv, min_n)
    g = _collect_window(rv)
    return g.filter(F.size("arr") >= min_n) if min_n > 1 else g


_OVER_TIME = {
    "sum_over_time": lambda arr: folds.fold_sum(arr),
    "avg_over_time": lambda arr: folds.fold_avg(arr),
    "count_over_time": lambda arr: F.size(arr).cast(D),
    "min_over_time": lambda arr: F.coalesce(
        F.array_min(F.filter(folds.values_of(arr), lambda v: ~F.isnan(v))), NAN()),
    "max_over_time": lambda arr: F.coalesce(
        F.array_max(F.filter(folds.values_of(arr), lambda v: ~F.isnan(v))), NAN()),
    "last_over_time": lambda arr: F.element_at(arr, -1)["v"],
    "first_over_time": lambda arr: F.element_at(arr, 1)["v"],
    "stddev_over_time": lambda arr: folds.fold_stddev_pop(arr),
    "stdvar_over_time": lambda arr: folds.fold_var_pop(arr),
    "present_over_time": lambda arr: _lit(1.0),
    "mad_over_time": lambda arr: folds.fold_mad(arr),
    # experimental ts_of_* family (public Prometheus 3.x): the timestamp, in
    # SECONDS, of the last/extreme sample in the window.  Extremes update on
    # >= / <= like the upstream fold, so the LAST occurrence of a tied
    # extreme wins; a NaN current-extreme is always replaced (IsNaN(acc)
    # branch upstream), and NaN candidates never beat a real extreme (the
    # ~isnan(x) mask — Spark would otherwise order NaN above every double).
    "ts_of_last_over_time": lambda arr: F.element_at(arr, -1)["o"].cast(D) / 1000.0,
    "ts_of_first_over_time": lambda arr: F.element_at(arr, 1)["o"].cast(D) / 1000.0,
    "ts_of_max_over_time": lambda arr: _fold_ts_of(arr, "max"),
    "ts_of_min_over_time": lambda arr: _fold_ts_of(arr, "min"),
}


# Production-mode (deterministic=False) native-aggregation twins of the
# order-insensitive _OVER_TIME folds: each entry yields the .agg(...) list,
# with the result aliased "__v".  Range vectors exclude stale markers
# (value is never NULL) and the native path is only taken when the range
# vector carries no histogram column, so plain value aggregates see exactly
# the fold's float samples.  min/max skip NaN like the folds (NaN→NULL
# before min/max; all-NaN windows coalesce back to NaN); every window has
# ≥1 sample by construction (explode emits a (t, sig) group only for
# samples inside it).
def _nanf() -> Column:
    v = F.col("value")
    return F.when(~F.isnan(v), v)


_OVER_TIME_NATIVE = {
    "count_over_time": lambda: [F.count(_lit(1)).cast(D).alias("__v")],
    "sum_over_time": lambda: [F.sum("value").alias("__v")],
    "avg_over_time": lambda: [F.avg("value").alias("__v")],
    "min_over_time": lambda: [
        F.coalesce(F.min(_nanf()), F.first(NAN())).alias("__v")],
    "max_over_time": lambda: [
        F.coalesce(F.max(_nanf()), F.first(NAN())).alias("__v")],
    "last_over_time": lambda: [F.max_by("value", "ts").alias("__v")],
    "first_over_time": lambda: [F.min_by("value", "ts").alias("__v")],
    "present_over_time": lambda: [F.first(_lit(1.0)).alias("__v")],
    "stddev_over_time": lambda: [
        F.coalesce(F.stddev_pop("value"), F.first(NAN())).alias("__v")],
    "stdvar_over_time": lambda: [
        F.coalesce(F.var_pop("value"), F.first(NAN())).alias("__v")],
    "ts_of_last_over_time": lambda: [
        (F.max("ts").cast(D) / 1000.0).alias("__v")],
    "ts_of_first_over_time": lambda: [
        (F.min("ts").cast(D) / 1000.0).alias("__v")],
}


def _fold_ts_of(arr: Column, mode: str) -> Column:
    acc0 = F.struct(_lit(None).cast(D).alias("v"),
                    _lit(None).cast("long").alias("o"))

    def step(a, x):
        better = (x["v"] >= a["v"]) if mode == "max" else (x["v"] <= a["v"])
        upd = a["v"].isNull() | F.isnan(a["v"]) | (~F.isnan(x["v"]) & better)
        return F.when(upd, F.struct(x["v"].alias("v"), x["o"].alias("o"))) \
                .otherwise(a)

    return F.aggregate(arr, acc0, step)["o"].cast(D) / 1000.0


def _warn_quantile(c: Compiler, q: float) -> None:
    """upstream annotations.NewInvalidQuantileWarning: φ outside [0,1]."""
    from thanos_parquet_gateway_spark.promql.compiler import fmt_g
    if math.isnan(q) or q < 0 or q > 1:
        c.annotate("warn", "quantile value should be between 0 and 1, "
                           f"got {fmt_g(q)}")


def _selector_name(node: A.Node) -> str | None:
    """Metric name of a matrix/vector selector argument, if statically
    known (for the possible-non-counter info annotation)."""
    if isinstance(node, A.MatrixSelector):
        node = node.selector
    if isinstance(node, A.VectorSelector):
        if node.name:
            return node.name
        for m in node.matchers:
            if m.label == "__name__" and m.op == "=":
                return m.value
    return None


# over_time functions with a native-histogram result path (upstream
# functions.go: sum/avg fold histograms bucket-wise, last/first return the
# histogram sample itself; the REST ignore histogram samples)
_OVER_TIME_HIST = ("sum_over_time", "avg_over_time",
                   "last_over_time", "first_over_time")


def _over_time_hist(c: Compiler, rv: RangeVector, fn: str) -> InstantVector:
    """sum/avg/last/first_over_time over a range vector carrying native
    histograms.  Float-only windows keep the scalar folds; histogram-only
    windows fold bucket-wise (le-keyed union add; avg scales by 1/n);
    MIXED windows: sum/avg drop the element (Prometheus emits a warning
    and skips), last/first pick the overall latest/earliest sample of
    either kind (mixed is fine there upstream)."""
    from thanos_parquet_gateway_spark.promql import histograms as H
    from thanos_parquet_gateway_spark.promql.compiler import hgroup

    g = hgroup(
        rv.df, "sig",
        F.array_sort(F.collect_list(
            F.when(F.col("hist").isNull(),
                   F.struct(F.col("ts").alias("o"),
                            F.col("value").alias("v"))))).alias("arr"),
        F.array_sort(F.collect_list(
            F.when(F.col("hist").isNotNull(),
                   F.struct(F.col("ts").alias("o"),
                            F.col("hist").alias("h"))))).alias("harr"),
        labels="labels")
    arr, harr = F.col("arr"), F.col("harr")
    nf, nh = F.size(arr), F.size(harr)
    is_float = (nf >= 1) & (nh == 0)
    is_hist = (nh >= 1) & (nf == 0)

    # try_element_at everywhere: either array is empty on single-kind
    # windows, and plain element_at raises on out-of-bounds
    def hist_sum():
        first = F.try_element_at(harr, _lit(1))["h"]
        rest = F.slice(harr, 2, F.greatest(nh - 1, _lit(0)))
        return F.aggregate(rest, first, lambda acc, x: H.merge_two(acc, x["h"]))

    if fn in ("sum_over_time", "avg_over_time"):
        g = g.filter(is_float | is_hist)  # mixed window: skipped (upstream warns)
        hval = hist_sum()
        if fn == "avg_over_time":
            hval = H.scale_hist(hval, _lit(1.0) / nh.cast(D))
        fval = (folds.fold_sum(arr) if fn == "sum_over_time"
                else folds.fold_avg(arr))
    else:  # last/first_over_time: overall extreme sample of either kind
        pos = _lit(-1) if fn == "last_over_time" else _lit(1)
        f_ts = F.coalesce(F.try_element_at(arr, pos)["o"], _lit(-(2 ** 62)))
        h_ts = F.coalesce(F.try_element_at(harr, pos)["o"], _lit(-(2 ** 62)))
        pick_hist = ((h_ts >= f_ts) & (nh > 0) if fn == "last_over_time"
                     else (nf == 0) | ((nh > 0) & (h_ts <= f_ts)))
        is_hist = pick_hist
        is_float = ~pick_hist
        hval = F.try_element_at(harr, pos)["h"]
        fval = F.try_element_at(arr, pos)["v"]
    out = g.select(
        "t", "sig", "labels",
        _lit(None).cast("long").alias("sample_ts"),
        F.when(is_float, fval).otherwise(NAN()).alias("value"),
        F.when(is_hist, hval).otherwise(H.null_hist()).alias("hist"))
    if fn != "last_over_time":
        out = _drop_name(out)
    return _iv(out)


def _over_time(c: Compiler, call: A.Call) -> InstantVector:
    fn = call.func
    if fn == "quantile_over_time":
        q = _scalar_lit(c, call, 0)
        _warn_quantile(c, q)
        rv = _range_arg(c, call, 1)
        g = _window_floats(c, rv)
        val = folds.fold_quantile(F.col("arr"), _lit(q))
    else:
        rv = _range_arg(c, call, 0)
        if fn in _OVER_TIME_HIST and "hist" in rv.columns:
            return _over_time_hist(c, rv, fn)
        if (not c.p.deterministic and fn in _OVER_TIME_NATIVE
                and "hist" not in rv.columns):
            # production mode: the window fold is a plain aggregation —
            # compile it as native (mostly codegen HashAggregate) aggregate
            # functions with map-side partial aggregation, instead of
            # shipping every sample through a collect_list buffer to the
            # reducer and folding the sorted array there.  Exact for
            # count/min/max/first/last/ts_of_*/present; sum/avg/stddev/
            # stdvar trade the order-stable Kahan fold for float-addition
            # reassociation (run-to-run low-bit nondeterminism — the same
            # trade the cross-series production aggregations already make).
            from thanos_parquet_gateway_spark.promql.compiler import hgroup
            # labels are NOT rebuilt here: the fused projection below
            # (and _drop_name's successor) builds them once from sig —
            # one plan step instead of hgroup's extra withColumn
            g = hgroup(rv.df, "sig", *_OVER_TIME_NATIVE[fn]())
            val = F.col("__v")
        else:
            g = (_window_floats(c, rv) if fn in _HIST_IGNORE
                 else _collect_window(rv))
            val = _OVER_TIME[fn](F.col("arr"))
        if fn.startswith("ts_of_"):
            # window points live in the shifted evaluation frame (static
            # offset at the selector base + the per-step @ re-anchor in the
            # matrix/subquery paths); the exposed timestamp is the ORIGINAL
            # one (upstream matrix points keep their raw T)
            arg = call.args[0]
            sel = arg.selector if isinstance(arg, A.MatrixSelector) else arg
            off = getattr(sel, "offset_ms", 0) or 0
            if off:
                val = val - _lit(off / 1000.0)
            at_ms = getattr(sel, "at_ms", None)
            if at_ms is not None:
                at = c._resolve_at(at_ms)
                val = val - (F.col("t") - _lit(at)).cast(D) / 1000.0
    # ONE fused projection: labels (rebuilt from sig on the native path,
    # which skips hgroup's rebuild), the __name__ drop, the re-canonicalized
    # sig and the value — replacing the select → _drop_name (2 withColumns)
    # → _iv(select) chain.  Each chained step is a JVM plan op with its own
    # incremental re-analysis; this is pure per-query compile latency.
    lbl = F.col("labels") if "labels" in g.columns else labels_from_sig("sig")
    sample_ts = _lit(None).cast("long").alias("sample_ts")
    if fn == "last_over_time":  # last_over_time keeps the metric name
        out = g.select("t", "sig", lbl.alias("labels"), sample_ts,
                       val.alias("value"))
    else:
        nl = drop_labels(lbl, ["__name__"])
        out = g.select("t", canonical_sig(nl).alias("sig"),
                       nl.alias("labels"), sample_ts, val.alias("value"))
    return InstantVector(out)


# -------------------------------------------------------------- rate family
def _reset_correction(arr: Column) -> Column:
    """Sum of counter-reset corrections: whenever v[i] < v[i-1], add v[i-1]."""
    acc0 = F.struct(_lit(None).cast(D).alias("prev"), _lit(0.0).alias("corr"))
    acc = F.aggregate(
        arr, acc0,
        lambda a, x: F.struct(
            x["v"].alias("prev"),
            (a["corr"] + F.coalesce(
                # NaN mask: Spark orders NaN above all doubles, so
                # x < NaN would fire; Go's comparison is always false
                F.when(~F.isnan(x["v"]) & ~F.isnan(a["prev"])
                       & (x["v"] < a["prev"]), a["prev"]),
                _lit(0.0))).alias("corr")))
    return acc["corr"]


def _extrapolated(c: Compiler, rv: RangeVector, counter: bool,
                  is_rate: bool) -> InstantVector:
    """Prometheus extrapolatedRate: reset-corrected delta extrapolated to the
    window boundaries (threshold 1.1× avg sample spacing, half-interval credit
    beyond; counters also clamp extrapolation-to-zero).  Windows of native-
    histogram samples take the bucket-wise path (_extrapolated_hist); mixed
    float/histogram windows are dropped (Prometheus skips them with a
    warning)."""
    if "hist" in rv.columns:
        if not c.p.deterministic and rv.prev is not None:
            return _extrapolated_hist_native(c, rv, counter, is_rate)
        return _extrapolated_hist(c, rv, counter, is_rate)
    if not c.p.deterministic and rv.prev is not None:
        return _extrapolated_native(c, rv, counter, is_rate)
    g = _collect_window(rv).filter(F.size("arr") >= 2)
    arr = F.col("arr")
    n = F.size(arr).cast(D)
    first_t, last_t = F.element_at(arr, 1)["o"], F.element_at(arr, -1)["o"]
    first_v, last_v = F.element_at(arr, 1)["v"], F.element_at(arr, -1)["v"]
    delta = (last_v - first_v + _reset_correction(arr)) if counter else (last_v - first_v)
    g = g.withColumn("__delta", delta)
    delta = F.col("__delta")

    rng_s = _lit(rv.range_ms / 1000.0)
    dur_start = (first_t - (F.col("t") - _lit(rv.range_ms))).cast(D) / 1000.0
    dur_end = (F.col("t") - last_t).cast(D) / 1000.0
    sampled = (last_t - first_t).cast(D) / 1000.0
    avg_dur = sampled / (n - 1)
    threshold = avg_dur * 1.1
    # Prometheus extrapolatedRate order: clamp durationToStart to avgDur/2
    # FIRST, then compare durationToZero against the clamped value — the two
    # diverge when durationToZero lies between avgDur/2 and the raw
    # durationToStart.
    dur_start = F.when(dur_start >= threshold, avg_dur / 2).otherwise(dur_start)
    if counter:
        dur_to_zero = F.when(delta > 0, sampled * (first_v / delta)).otherwise(dur_start)
        dur_start = F.when((delta > 0) & (first_v >= 0) & (dur_to_zero < dur_start),
                           dur_to_zero).otherwise(dur_start)
    extrap = (sampled
              + dur_start
              + F.when(dur_end >= threshold, avg_dur / 2).otherwise(dur_end))
    factor = extrap / sampled
    val = delta * factor / rng_s if is_rate else delta * factor
    return _finalize(g, val)


def _extrapolated_native(c: Compiler, rv: RangeVector, counter: bool,
                         is_rate: bool) -> InstantVector:
    """Production-mode twin of _extrapolated's float path: with each
    sample's predecessor attached pre-explode (RangeVector.prev), the
    window statistics the extrapolation needs — n, first/last ts+value and
    the counter-reset correction — are plain aggregates, so the whole rate
    family runs as a native aggregation with map-side partials instead of
    shipping every (replicated) sample through a collect_list buffer.  The
    reset correction counts a (prev, cur) pair iff the predecessor is
    itself inside the window (__pts > t - range; every in-window adjacent
    pair's right element is in the window by construction).  Boundary math
    below mirrors _extrapolated line for line; the only semantic delta is
    float-sum reassociation in the reset correction (production trade,
    same as the cross-series aggregations)."""
    from thanos_parquet_gateway_spark.promql.compiler import hgroup
    rng = rv.range_ms
    in_win_pair = F.col("__pts") > (F.col("t") - _lit(rng))
    corr = F.when(in_win_pair
                  & ~F.isnan(F.col("value")) & ~F.isnan(F.col("__pv"))
                  & (F.col("value") < F.col("__pv")),
                  F.col("__pv")).otherwise(_lit(0.0))
    g = (hgroup(rv.prev, "sig",
                F.count(_lit(1)).alias("__wn"),
                F.min("ts").alias("__ft"),
                F.max("ts").alias("__lt"),
                F.min_by("value", "ts").alias("__fv"),
                F.max_by("value", "ts").alias("__lv"),
                F.sum(corr).alias("__rc"))
         .filter(F.col("__wn") >= 2))
    n = F.col("__wn").cast(D)
    first_t, last_t = F.col("__ft"), F.col("__lt")
    first_v, last_v = F.col("__fv"), F.col("__lv")
    delta = (last_v - first_v + F.col("__rc")) if counter \
        else (last_v - first_v)
    g = g.withColumn("__delta", delta)
    delta = F.col("__delta")

    rng_s = _lit(rng / 1000.0)
    dur_start = (first_t - (F.col("t") - _lit(rng))).cast(D) / 1000.0
    dur_end = (F.col("t") - last_t).cast(D) / 1000.0
    sampled = (last_t - first_t).cast(D) / 1000.0
    avg_dur = sampled / (n - 1)
    threshold = avg_dur * 1.1
    dur_start = F.when(dur_start >= threshold, avg_dur / 2).otherwise(dur_start)
    if counter:
        dur_to_zero = F.when(delta > 0, sampled * (first_v / delta)) \
                       .otherwise(dur_start)
        dur_start = F.when((delta > 0) & (first_v >= 0)
                           & (dur_to_zero < dur_start),
                           dur_to_zero).otherwise(dur_start)
    extrap = (sampled
              + dur_start
              + F.when(dur_end >= threshold, avg_dur / 2).otherwise(dur_end))
    factor = extrap / sampled
    val = delta * factor / rng_s if is_rate else delta * factor
    return _finalize(g, val)


def _extrapolated_hist(c: Compiler, rv: RangeVector, counter: bool,
                       is_rate: bool) -> InstantVector:
    """Rate family over a range vector that carries native-histogram samples
    (reference serves rate(native_histogram[..]) through promql-engine —
    float-histogram test db/db_test.go:344-351).

    One window aggregation collects the float samples and the histogram
    samples into separate sorted arrays; per (t, series) the window is then
    all-float (existing scalar math), all-histogram (bucket-wise delta +
    reset merge + the SAME boundary extrapolation, no counter-to-zero clamp
    — Prometheus gates that clamp on float samples), or mixed (dropped, as
    Prometheus does with a warning)."""
    from thanos_parquet_gateway_spark.promql import histograms as H
    from thanos_parquet_gateway_spark.promql.compiler import hgroup

    g = hgroup(
        rv.df, "sig",
        F.array_sort(F.collect_list(
            F.when(F.col("hist").isNull(),
                   F.struct(F.col("ts").alias("o"),
                            F.col("value").alias("v"))))).alias("arr"),
        F.array_sort(F.collect_list(
            F.when(F.col("hist").isNotNull(),
                   F.struct(F.col("ts").alias("o"),
                            F.col("hist").alias("h"))))).alias("harr"),
        labels="labels")
    is_float = (F.size("arr") >= 2) & (F.size("harr") == 0)
    is_hist = (F.size("harr") >= 2) & (F.size("arr") == 0)
    g = g.filter(is_float | is_hist)
    rng_s = _lit(rv.range_ms / 1000.0)

    def extrap_factor(parr, with_zero_clamp, delta, first_v):
        first_t, last_t = F.element_at(parr, 1)["o"], F.element_at(parr, -1)["o"]
        n = F.size(parr).cast(D)
        dur_start = (first_t - (F.col("t") - _lit(rv.range_ms))).cast(D) / 1000.0
        dur_end = (F.col("t") - last_t).cast(D) / 1000.0
        sampled = (last_t - first_t).cast(D) / 1000.0
        avg_dur = sampled / (n - 1)
        threshold = avg_dur * 1.1
        dur_start = F.when(dur_start >= threshold, avg_dur / 2).otherwise(dur_start)
        if with_zero_clamp:
            dur_to_zero = F.when(delta > 0, sampled * (first_v / delta)) \
                           .otherwise(dur_start)
            dur_start = F.when((delta > 0) & (first_v >= 0)
                               & (dur_to_zero < dur_start),
                               dur_to_zero).otherwise(dur_start)
        extrap = (sampled + dur_start
                  + F.when(dur_end >= threshold, avg_dur / 2).otherwise(dur_end))
        return extrap / sampled

    # float path (identical math to _extrapolated)
    arr = F.col("arr")
    fdelta_raw = (F.element_at(arr, -1)["v"] - F.element_at(arr, 1)["v"])
    fdelta = (fdelta_raw + _reset_correction(arr)) if counter else fdelta_raw
    g = g.withColumn("__delta", F.when(is_float, fdelta))
    ffactor = extrap_factor(arr, counter, F.col("__delta"),
                            F.element_at(arr, 1)["v"])
    fval = (F.col("__delta") * ffactor / rng_s if is_rate
            else F.col("__delta") * ffactor)

    # histogram path: delta = last - first (+ pre-reset histograms merged
    # back in for counters), then the same window-boundary factor
    harr = F.col("harr")
    first_h, last_h = F.element_at(harr, 1)["h"], F.element_at(harr, -1)["h"]
    hdelta = H.sub_two(last_h, first_h)
    if counter:
        hdelta = H.merge_two(hdelta, H.hist_reset_correction(harr))
    g = g.withColumn("__hdelta", F.when(is_hist, hdelta))
    hfactor = extrap_factor(harr, False, None, None)
    hscale = hfactor / rng_s if is_rate else hfactor
    hval = H.scale_hist(F.col("__hdelta"), hscale)

    return _finalize(g, F.when(is_float, fval).otherwise(NAN()),
                     hist=F.when(is_hist, hval).otherwise(H.null_hist()))


def _extrapolated_hist_native(c: Compiler, rv: RangeVector, counter: bool,
                              is_rate: bool) -> InstantVector:
    """Production-mode twin of _extrapolated_hist: with the predecessor
    (value, ts AND hist) attached pre-explode, the histogram rate's window
    statistics become native aggregations instead of one ObjectHashAggregate
    collecting every (ts, hist) struct of every (grid-replicated) window.

    Exactness model (mirrors the float production path):
    - first/last count/sum/ts and the float stats are EXACT selections
      (min_by/max_by on primitive buffers);
    - the reset corrections are native sums over lag pairs (a pair counts
      iff the predecessor is inside the window) — float reassociation
      across multiple resets, the documented production trade;
    - bucket deltas come from the first/last histograms' bucket arrays and
      the pre-reset predecessors', collected under per-row boundary flags —
      the buffers hold ≤ (2 + resets) small arrays, and the OUTPUT bucket
      set replicates the fold's union(last.les, first.les[, pre-reset
      prevs' les]) exactly (a zero-count le present only mid-window must
      NOT appear: it would shift histogram_quantile's interpolation
      anchors)."""
    from thanos_parquet_gateway_spark.promql import histograms as H
    from thanos_parquet_gateway_spark.promql.compiler import hgroup
    rng = rv.range_ms
    rows = rv.prev
    hist, ph = F.col("hist"), F.col("__ph")
    in_pair = F.col("__pts") > (F.col("t") - _lit(rng))
    hpair = in_pair & hist.isNotNull() & ph.isNotNull()
    hreset = (hpair & H.detect_reset(ph, hist)) if counter else _lit(False)
    fcorr = F.when(in_pair
                   & ~F.isnan(F.col("value")) & ~F.isnan(F.col("__pv"))
                   & (F.col("value") < F.col("__pv")),
                   F.col("__pv")).otherwise(_lit(0.0))
    # schema survives like the fold's coalesce chain: last sample's, else
    # first sample's, else (counter) the earliest pre-reset prev's non-null
    # schema.  NULL schema (custom bounds) is legitimate, and max_by skips
    # NULL values — encode it as a sentinel so "last row's schema IS null"
    # wins over an earlier non-null one, exactly like the fold.
    _SENT = -(2 ** 31)
    sch_enc = F.coalesce(hist["schema"], _lit(_SENT))

    def _dec(col: Column) -> Column:
        return F.when(col == _SENT, _lit(None).cast("int")).otherwise(col)

    # first/last-in-window membership per ROW off the series lag/lead —
    # collect_list skips the NULLed non-matching rows, so these buffers
    # hold exactly one bucket array each (plus one per reset for __rbk)
    at_first_row = F.col("__pts").isNull() \
        | (F.col("__pts") <= F.col("t") - _lit(rng))
    at_last_row = F.col("__nts").isNull() | (F.col("__nts") > F.col("t"))
    bk_aggs = [
        F.collect_list(F.when(at_first_row & hist.isNotNull(),
                              hist["buckets"])).alias("__fbk"),
        F.collect_list(F.when(at_last_row & hist.isNotNull(),
                              hist["buckets"])).alias("__lbk"),
    ] + ([F.collect_list(F.when(hreset, ph["buckets"])).alias("__rbk")]
         if counter else [])

    g = hgroup(
        rows, "sig",
        F.count(F.when(hist.isNull(), _lit(1))).alias("__nf"),
        F.count(hist).alias("__nh"),
        F.min("ts").alias("__ft"),
        F.max("ts").alias("__lt"),
        F.min_by("value", "ts").alias("__fv"),
        F.max_by("value", "ts").alias("__lv"),
        F.sum(fcorr).alias("__frc"),
        F.min_by(hist["count"], F.col("ts")).alias("__hfc"),
        F.max_by(hist["count"], F.col("ts")).alias("__hlc"),
        F.min_by(hist["sum"], F.col("ts")).alias("__hfs"),
        F.max_by(hist["sum"], F.col("ts")).alias("__hls"),
        F.sum(F.when(hreset, ph["count"]).otherwise(_lit(0.0))).alias("__hrc"),
        F.sum(F.when(hreset, ph["sum"]).otherwise(_lit(0.0))).alias("__hrs"),
        F.max_by(sch_enc, F.col("ts")).alias("__lsch"),
        F.min_by(sch_enc, F.col("ts")).alias("__fsch"),
        F.min_by(F.when(hreset, ph["schema"]),
                 F.when(hreset & ph["schema"].isNotNull(), F.col("ts")))
         .alias("__rsch"),
        *bk_aggs)
    is_float = (F.col("__nf") >= 2) & (F.col("__nh") == 0)
    is_hist = (F.col("__nh") >= 2) & (F.col("__nf") == 0)
    g = g.filter(is_float | is_hist)
    rng_s = _lit(rng / 1000.0)

    def factor(n, with_zero_clamp, delta, first_v):
        # mirrors _extrapolated_hist.extrap_factor line for line, off the
        # aggregated scalar columns (first/last ts are per-kind on kept
        # windows — single-kind by the filter above)
        dur_start = (F.col("__ft") - (F.col("t") - _lit(rng))).cast(D) / 1000.0
        dur_end = (F.col("t") - F.col("__lt")).cast(D) / 1000.0
        sampled = (F.col("__lt") - F.col("__ft")).cast(D) / 1000.0
        avg_dur = sampled / (n - 1)
        threshold = avg_dur * 1.1
        dur_start = F.when(dur_start >= threshold, avg_dur / 2) \
                     .otherwise(dur_start)
        if with_zero_clamp:
            dur_to_zero = F.when(delta > 0, sampled * (first_v / delta)) \
                           .otherwise(dur_start)
            dur_start = F.when((delta > 0) & (first_v >= 0)
                               & (dur_to_zero < dur_start),
                               dur_to_zero).otherwise(dur_start)
        extrap = (sampled + dur_start
                  + F.when(dur_end >= threshold, avg_dur / 2)
                     .otherwise(dur_end))
        return extrap / sampled

    # float path (identical math to _extrapolated_native)
    fdelta_raw = F.col("__lv") - F.col("__fv")
    fdelta = (fdelta_raw + F.col("__frc")) if counter else fdelta_raw
    g = g.withColumn("__delta", F.when(is_float, fdelta))
    ffactor = factor(F.col("__nf").cast(D), counter, F.col("__delta"),
                     F.col("__fv"))
    fval = (F.col("__delta") * ffactor / rng_s if is_rate
            else F.col("__delta") * ffactor)

    # histogram scalars: delta = last - first (+ pre-reset correction)
    hfactor = factor(F.col("__nh").cast(D), False, None, None)
    hscale = hfactor / rng_s if is_rate else hfactor
    hc = F.col("__hlc") - F.col("__hfc")
    hs = F.col("__hls") - F.col("__hfs")
    if counter:
        hc = hc + F.col("__hrc")
        hs = hs + F.col("__hrs")
    sch = F.coalesce(_dec(F.col("__lsch")), _dec(F.col("__fsch")),
                     *([F.col("__rsch")] if counter else []))

    # bucket deltas: the delta needs only the FIRST and LAST histograms'
    # bucket arrays plus the pre-reset predecessors' — ≤ (2 + resets) small
    # arrays per window, collected under flags decided PER ROW from the
    # series lag/lead (the first in-window sample's predecessor is outside
    # the window; the last one's successor is past t).  The math then runs
    # as per-row array expressions post-agg — exactly the fold's
    # sub_two/merge shape.  An exploded per-(t, series, le) aggregation was
    # built first and MEASURED SLOWER than the fold (2k series × 120
    # samples, 30× window replication: 21 s vs 11.6 s — the ×les explode
    # and the second pass over the base cost more than the object buffers
    # save), so the aggregation keeps the fold's single-pass shape and only
    # shrinks what the buffers hold: O(1 + resets) bucket arrays instead of
    # every (grid-replicated) window sample.
    bk_first = F.try_element_at(F.col("__fbk"), _lit(1))
    bk_last = F.try_element_at(F.col("__lbk"), _lit(1))
    _BK = "array<struct<le:double,count:double>>"
    neg_first = F.transform(
        F.coalesce(bk_first, F.array().cast(_BK)),
        lambda b: F.struct(b["le"].alias("le"), (-b["count"]).alias("count")))
    parts = [F.coalesce(bk_last, F.array().cast(_BK)), neg_first]
    if counter:
        parts.append(F.coalesce(F.flatten(F.col("__rbk")),
                                F.array().cast(_BK)))
    allb = F.concat(*parts)
    les = F.array_sort(F.array_distinct(
        F.transform(allb, lambda e: e["le"])))
    hval = H.make_hist(
        hc * hscale, hs * hscale,
        F.transform(les, lambda le: F.struct(
            le.alias("le"),
            (F.aggregate(F.filter(allb, lambda e: e["le"] == le), _lit(0.0),
                         lambda acc, e: acc + e["count"])
             * hscale).alias("count"))),
        sch)
    return _finalize(g, F.when(is_float, fval).otherwise(NAN()),
                     hist=F.when(is_hist, hval).otherwise(H.null_hist()))


def _instant_pair(c: Compiler, rv: RangeVector, kind: str) -> InstantVector:
    """irate/idelta from the last two samples of the window.  Histogram
    windows take the bucket-wise analogue (reset -> the last histogram
    stands alone, mirroring the float counter rule)."""
    if "hist" in rv.columns:
        return _instant_pair_hist(c, rv, kind)
    if not c.p.deterministic and rv.prev is not None:
        # production: the window's last TWO samples are the max_by(ts) row
        # plus the predecessor it carries (attached pre-explode) — one
        # native aggregation, no collect_list fold.  ≥2-samples filter ≡
        # "the last sample's predecessor is itself inside the window".
        from thanos_parquet_gateway_spark.promql.compiler import hgroup
        # three primitive max_by's, not one max_by(struct): a struct
        # aggregation BUFFER is not UnsafeRow-mutable and demotes the whole
        # aggregation to SortAggregate (caught by the r12 plan pin); the
        # primitive buffers stay on codegen HashAggregate.  All three are
        # keyed on the same ts, so they read the same sample row whenever
        # (sig, ts) is unique — tied timestamps pick per-column, the same
        # production-mode tie trade the latest-sample selection makes.
        g = (hgroup(rv.prev, "sig",
                    F.max("ts").alias("__lt"),
                    F.max_by("value", "ts").alias("__lv"),
                    F.max_by("__pv", "ts").alias("__lpv"),
                    F.max_by("__pts", "ts").alias("__lpt"))
             .filter(F.col("__lpt").isNotNull()
                     & (F.col("__lpt") > F.col("t") - _lit(rv.range_ms))))
        last_t, prev_t = F.col("__lt"), F.col("__lpt")
        last_v, prev_v = F.col("__lv"), F.col("__lpv")
        dt_s = (last_t - prev_t).cast(D) / 1000.0
        if kind == "irate":
            dv = F.when(last_v >= prev_v, last_v - prev_v).otherwise(last_v)
            val = dv / dt_s
        else:
            val = last_v - prev_v
        return _finalize(g, val)
    g = _collect_window(rv).filter(F.size("arr") >= 2)
    arr = F.col("arr")
    last_t, prev_t = F.element_at(arr, -1)["o"], F.element_at(arr, -2)["o"]
    last_v, prev_v = F.element_at(arr, -1)["v"], F.element_at(arr, -2)["v"]
    dt_s = (last_t - prev_t).cast(D) / 1000.0
    if kind == "irate":
        dv = F.when(last_v >= prev_v, last_v - prev_v).otherwise(last_v)
        val = dv / dt_s
    else:
        val = last_v - prev_v
    return _finalize(g, val)


def _instant_pair_hist(c: Compiler, rv: RangeVector, kind: str) -> InstantVector:
    from thanos_parquet_gateway_spark.promql import histograms as H
    from thanos_parquet_gateway_spark.promql.compiler import hgroup

    g = hgroup(
        rv.df, "sig",
        F.array_sort(F.collect_list(
            F.when(F.col("hist").isNull(),
                   F.struct(F.col("ts").alias("o"),
                            F.col("value").alias("v"))))).alias("arr"),
        F.array_sort(F.collect_list(
            F.when(F.col("hist").isNotNull(),
                   F.struct(F.col("ts").alias("o"),
                            F.col("hist").alias("h"))))).alias("harr"),
        labels="labels")
    is_float = (F.size("arr") >= 2) & (F.size("harr") == 0)
    is_hist = (F.size("harr") >= 2) & (F.size("arr") == 0)
    g = g.filter(is_float | is_hist)

    arr = F.col("arr")
    last_t, prev_t = F.element_at(arr, -1)["o"], F.element_at(arr, -2)["o"]
    last_v, prev_v = F.element_at(arr, -1)["v"], F.element_at(arr, -2)["v"]
    fdt = (last_t - prev_t).cast(D) / 1000.0
    if kind == "irate":
        fval = F.when(last_v >= prev_v, last_v - prev_v).otherwise(last_v) / fdt
    else:
        fval = last_v - prev_v

    harr = F.col("harr")
    lh, ph = F.element_at(harr, -1)["h"], F.element_at(harr, -2)["h"]
    hdt = (F.element_at(harr, -1)["o"] - F.element_at(harr, -2)["o"]) \
        .cast(D) / 1000.0
    if kind == "irate":
        dh = F.when(H.detect_reset(ph, lh), lh).otherwise(H.sub_two(lh, ph))
        hval = H.scale_hist(dh, _lit(1.0) / hdt)
    else:
        hval = H.sub_two(lh, ph)
    return _finalize(g, F.when(is_float, fval).otherwise(NAN()),
                     hist=F.when(is_hist, hval).otherwise(H.null_hist()))


def _double_exp_smoothing(c: Compiler, call: A.Call) -> InstantVector:
    """double_exponential_smoothing (holt_winters): level/trend recurrence
    folded sequentially over the window.  s0 = v[0], b0 = v[1] - v[0];
    s_i = sf*v_i + (1-sf)*(s+b); b_i = tf*(s_i - s) + (1-tf)*b."""
    rv = _range_arg(c, call, 0)
    sf = _scalar_lit(c, call, 1)
    tf = _scalar_lit(c, call, 2)
    # upstream funcDoubleExponentialSmoothing: factors strictly in (0, 1)
    if not 0 < sf < 1:
        raise PromQLCompileError(
            f"invalid smoothing factor. Expected: 0 < sf < 1, got: {sf:g}")
    if not 0 < tf < 1:
        raise PromQLCompileError(
            f"invalid trend factor. Expected: 0 < tf < 1, got: {tf:g}")
    g = _window_floats(c, rv, min_n=2)
    arr = F.col("arr")
    first_v = F.element_at(arr, 1)["v"]
    second_v = F.element_at(arr, 2)["v"]
    acc0 = F.struct(first_v.alias("s"), (second_v - first_v).alias("b"))
    sfL, tfL = _lit(float(sf)), _lit(float(tf))

    def step(a, e):
        s_new = sfL * e["v"] + (_lit(1.0) - sfL) * (a["s"] + a["b"])
        b_new = tfL * (s_new - a["s"]) + (_lit(1.0) - tfL) * a["b"]
        return F.struct(s_new.alias("s"), b_new.alias("b"))

    res = F.aggregate(F.slice(arr, 2, F.greatest(F.size(arr) - 1, _lit(0))),
                      acc0, step)
    return _finalize(g, res["s"])


def _counts_fold(arr: Column, mode: str) -> Column:
    """resets: count v[i] < v[i-1]; changes: count v[i] != v[i-1] (NaN→NaN is
    not a change).  The explicit ``init`` flag (same as _counts_hist) keeps
    the window's FIRST sample from ever counting — upstream funcChanges/
    funcResets iterate from the second sample, and without the flag a
    leading-NaN sample scored a phantom change (isnan(x) forced the hit
    while both_nan stayed NULL against the NULL accumulator; caught by the
    r12 det-vs-prod differential)."""
    acc0 = F.struct(_lit(False).alias("init"),
                    _lit(None).cast(D).alias("prev"), _lit(0.0).alias("n"))

    def merge(a, x):
        if mode == "resets":
            # Spark orders NaN above every double (so 5 < NaN is TRUE here),
            # but Go/IEEE comparisons with NaN are always false — mask NaN on
            # either side so NaN transitions never count as resets.
            hit = ~F.isnan(x["v"]) & ~F.isnan(a["prev"]) & (x["v"] < a["prev"])
        else:
            both_nan = F.isnan(x["v"]) & F.isnan(a["prev"])
            hit = (((x["v"] != a["prev"]) | F.isnan(x["v"])
                    | F.isnan(a["prev"])) & ~both_nan)
        inc = F.when(a["init"] & F.coalesce(hit, _lit(False)), 1.0) \
               .otherwise(0.0)
        return F.struct(_lit(True).alias("init"), x["v"].alias("prev"),
                        (a["n"] + inc).alias("n"))

    return F.aggregate(arr, acc0, merge)["n"]


def _counts_hist(c: Compiler, rv: RangeVector, mode: str) -> InstantVector:
    """resets/changes over windows that may carry native histograms
    (upstream funcResets/funcChanges): samples of both kinds iterate in
    one time-ordered sequence; a float→histogram or histogram→float type
    switch counts for BOTH functions; histogram pairs use DetectReset
    (resets) / Equals (changes); float pairs keep the scalar rules."""
    from thanos_parquet_gateway_spark.promql import histograms as H
    from thanos_parquet_gateway_spark.promql.compiler import hgroup

    g = hgroup(
        rv.df, "sig",
        F.array_sort(F.collect_list(F.struct(
            F.col("ts").alias("o"), F.col("value").alias("v"),
            F.col("hist").alias("h")))).alias("marr"),
        labels="labels")
    marr = F.col("marr")
    acc0 = F.struct(_lit(False).alias("init"),
                    _lit(None).cast(D).alias("pv"),
                    H.null_hist().alias("ph"),
                    _lit(0.0).alias("n"))

    def merge(a, x):
        bothf = a["ph"].isNull() & x["h"].isNull()
        bothh = a["ph"].isNotNull() & x["h"].isNotNull()
        flip = ~bothf & ~bothh
        if mode == "resets":
            hit_f = (~F.isnan(x["v"]) & ~F.isnan(a["pv"])
                     & (x["v"] < a["pv"]))
            hit_h = H.detect_reset(a["ph"], x["h"])
        else:
            both_nan = F.isnan(x["v"]) & F.isnan(a["pv"])
            hit_f = (((x["v"] != a["pv"]) | F.isnan(x["v"])
                      | F.isnan(a["pv"])) & ~both_nan)
            hit_h = ~a["ph"].eqNullSafe(x["h"])
        hit = a["init"] & (flip
                           | (bothf & F.coalesce(hit_f, _lit(False)))
                           | (bothh & F.coalesce(hit_h, _lit(False))))
        return F.struct(_lit(True).alias("init"),
                        x["v"].alias("pv"), x["h"].alias("ph"),
                        (a["n"] + F.when(hit, 1.0).otherwise(0.0)).alias("n"))

    val = F.aggregate(marr, acc0, merge)["n"]
    return _finalize(g, val)


def _linreg(arr: Column, intercept_t: Column):
    """Least-squares slope/intercept with x = (ts - intercept_t) seconds
    (Prometheus linearRegression), sequential folds."""
    x = lambda e: (e["o"] - intercept_t).cast(D) / 1000.0  # noqa: E731
    acc0 = F.struct(_lit(0.0).alias("sx"), _lit(0.0).alias("sy"),
                    _lit(0.0).alias("sxy"), _lit(0.0).alias("sx2"))
    s = F.aggregate(arr, acc0, lambda a, e: F.struct(
        (a["sx"] + x(e)).alias("sx"),
        (a["sy"] + e["v"]).alias("sy"),
        (a["sxy"] + x(e) * e["v"]).alias("sxy"),
        (a["sx2"] + x(e) * x(e)).alias("sx2")))
    n = F.size(arr).cast(D)
    cov = s["sxy"] - s["sx"] * s["sy"] / n
    var = s["sx2"] - s["sx"] * s["sx"] / n
    slope = cov / var
    intercept = s["sy"] / n - slope * s["sx"] / n
    return slope, intercept


def _linreg_native(rv: RangeVector):
    """Production-mode regression stats as NATIVE aggregates (map-side
    partials, codegen HashAggregate) instead of the collect_list fold:
    with x = (ts - t) seconds, slope = covar_pop(x, y) / var_pop(x) and
    intercept-at-t = avg(y) - slope * avg(x).  covar_pop/var_pop are
    Spark's central-moment aggregates (Welford-style co-moment updates),
    numerically MORE stable than the fold's normal equations — the
    cancellation concern that kept this on the fold (r12 "Not yet
    optimized") applies to n*Σxy - ΣxΣy, which this formulation never
    builds.  The slope is anchor-invariant, so anchoring x at t (instead
    of the fold's first-sample anchor for deriv) changes nothing.
    Returns (aggregated frame filtered to n >= 2, slope, intercept)."""
    from thanos_parquet_gateway_spark.promql.compiler import hgroup
    x = (F.col("ts") - F.col("t")).cast(D) / 1000.0
    g = (hgroup(rv.df, "sig",
                F.count(_lit(1)).alias("__wn"),
                F.covar_pop(x, F.col("value")).alias("__cxy"),
                F.var_pop(x).alias("__vx"),
                F.avg(x).alias("__mx"),
                F.avg("value").alias("__my"))
         .filter(F.col("__wn") >= 2))
    slope = F.col("__cxy") / F.col("__vx")
    intercept = F.col("__my") - slope * F.col("__mx")
    return g, slope, intercept


def _deriv(c: Compiler, call: A.Call) -> InstantVector:
    rv = _range_arg(c, call)
    if not c.p.deterministic and "hist" not in rv.columns:
        g, slope, _ = _linreg_native(rv)
        return _finalize(g, slope)
    g = _window_floats(c, rv, min_n=2)
    slope, _ = _linreg(F.col("arr"), F.element_at(F.col("arr"), 1)["o"])
    return _finalize(g, slope)


def _predict_linear(c: Compiler, call: A.Call) -> InstantVector:
    rv = _range_arg(c, call, 0)
    dur = _scalar_lit(c, call, 1)
    if not c.p.deterministic and "hist" not in rv.columns:
        g, slope, intercept = _linreg_native(rv)
        return _finalize(g, intercept + slope * _lit(float(dur)))
    g = _window_floats(c, rv, min_n=2)
    slope, intercept = _linreg(F.col("arr"), F.col("t"))
    val = intercept + slope * _lit(float(dur))
    return _finalize(g, val)


# --------------------------------------------------------- histogram_quantile
def _histogram_quantile_classic(q: float, df, c=None) -> "DataFrame":
    """Classic-bucket quantile: group bucket series by labels-minus-le, sort
    by le, enforce monotonicity, linearly interpolate (reference test evidence
    db/db_test.go:344-351; upstream algorithm bucketQuantile).  Takes the
    instant-vector rows (float samples carrying le labels) and returns the
    result rows.

    With a compiler ``c``, registers the upstream data-dependent annotations
    (bad-bucket-label warning, forced-monotonicity info) as deferred probe
    DataFrames — bounded side-aggregations collected only when a consumer
    reads annotations (QueryResult.all_annotations), never on the query hot
    path.  Message wording follows upstream util/annotations intent."""
    # Python-side NaN check: Spark's NaN ordering would route NaN phi into
    # the q > 1 → +Inf branch below; upstream returns NaN per series
    qnan = math.isnan(q)
    if qnan:
        q = 0.0  # placeholder — val short-circuits to NaN below
    df = df.withColumn(
        "__le",
        F.when(F.element_at(F.col("labels"), "le").isin("+Inf", "Inf", "inf"), INF())
         .otherwise(F.element_at(F.col("labels"), "le").try_cast(D)))
    if c is not None:
        # upstream annotations.NewBadBucketLabelWarning: float samples whose
        # ``le`` is missing or unparsable are dropped with a warning
        raw_le = F.coalesce(F.element_at(F.col("labels"), "le"), _lit(""))
        mname = F.coalesce(F.element_at(F.col("labels"), "__name__"),
                           _lit(""))
        c.add_data_probe(
            df.filter(F.col("__le").isNull())
              .groupBy(mname.alias("__n"))
              .agg(F.first(raw_le).alias("__v"))
              .select(_lit("warn").alias("kind"),
                      F.format_string(
                          'bucket label "le" is missing or has a malformed '
                          'value of "%s" for metric name "%s"',
                          F.col("__v"), F.col("__n")).alias("msg")))
    df = df.filter(F.col("__le").isNotNull())
    df = (df.withColumn("__mname",
                        F.coalesce(F.element_at(F.col("labels"), "__name__"),
                                   _lit("")))
          .withColumn("labels", drop_labels("labels", ["le", "__name__"]))
          .withColumn("sig", canonical_sig(F.col("labels"))))
    from thanos_parquet_gateway_spark.promql.compiler import hgroup
    g = hgroup(df, "sig",
               folds.sorted_pairs(F.col("__le"), F.col("value")).alias("arr"),
               F.first("__mname").alias("__mname"),
               labels="labels")
    arr = F.col("arr")
    les = F.transform(arr, lambda x: x["o"])
    # running-max monotonicity fix-up
    counts = F.aggregate(
        arr, F.array().cast("array<double>"),
        lambda acc, x: F.concat(acc, F.array(
            F.greatest(x["v"], F.try_element_at(acc, _lit(-1))))))
    if c is not None:
        # upstream annotations.HistogramQuantileForcedMonotonicityInfo: a
        # series whose raw bucket counts decrease somewhere needed the
        # running-max fix-up above
        vals = F.transform(arr, lambda x: x["v"])
        needs_fix = F.exists(F.zip_with(vals, counts, lambda v, m: v < m),
                             lambda b: b)
        c.add_data_probe(
            g.filter(needs_fix)
             .select(F.col("__mname").alias("__n")).distinct()
             .select(_lit("info").alias("kind"),
                     F.format_string(
                         "input to histogram_quantile needed to be fixed "
                         "for monotonicity (and may give inaccurate "
                         'results) for metric name "%s"',
                         F.col("__n")).alias("msg")))
    b = F.size(arr)
    has_inf = F.element_at(les, -1) == INF()
    total = F.element_at(counts, -1)
    rank = _lit(float(q)) * total
    idx = F.aggregate(
        F.sequence(_lit(1), b),
        _lit(-1),
        lambda acc, i: F.when((acc == -1) & (F.element_at(counts, i) >= rank), i)
                        .otherwise(acc))
    lower = F.when(idx == 1, F.when(F.element_at(les, 1) <= 0,
                                    F.element_at(les, 1)).otherwise(_lit(0.0))) \
             .otherwise(F.element_at(les, F.greatest(idx - 1, _lit(1))))
    upper = F.element_at(les, F.greatest(idx, _lit(1)))
    count_lo = F.when(idx == 1, _lit(0.0)).otherwise(
        F.element_at(counts, F.greatest(idx - 1, _lit(1))))
    count_hi = F.element_at(counts, F.greatest(idx, _lit(1)))
    # rank == count_lo == count_hi happens only for q=0 on an empty first
    # bucket; Go computes 0/0 = NaN there (bucketQuantile's rank/count) —
    # under Spark ANSI mode a literal division would throw instead
    ratio = F.when(count_hi != count_lo,
                   (rank - count_lo) / (count_hi - count_lo)).otherwise(NAN())
    interp = lower + (upper - lower) * ratio
    val = (F.when(_lit(qnan), NAN())
            .when(_lit(q) < 0, NEG_INF())
            .when(_lit(q) > 1, INF())
            .when(~has_inf | (b < 2) | (total == 0), NAN())
            .when(idx == b, F.element_at(les, -2))  # rank in the +Inf bucket
            .when((idx == 1) & (F.element_at(les, 1) <= 0), F.element_at(les, 1))
            .otherwise(interp))
    return g.select("t", "sig", "labels",
                    _lit(None).cast("long").alias("sample_ts"),
                    val.alias("value"))


# ----------------------------------------------------------- label functions
# Prometheus 3 default UTF-8 validation scheme (model.LabelName.IsValid):
# any non-empty string is a legal label name
def _valid_label_name(s: str) -> bool:
    return s != ""


def _label_replace(c: Compiler, call: A.Call) -> InstantVector:
    iv = _vector_arg(c, call, 0)
    dst = c.compile(call.args[1]).value
    repl = c.compile(call.args[2]).value
    src = c.compile(call.args[3]).value
    regex = c.compile(call.args[4]).value
    if not _valid_label_name(dst):
        # upstream funcLabelReplace eval error
        raise PromQLCompileError(
            f"invalid destination label name in label_replace(): {dst}")
    anchored = f"^(?:{regex})$"
    src_val = F.coalesce(F.element_at(F.col("labels"), src), _lit(""))
    matched = src_val.rlike(anchored)
    new_val = F.regexp_replace(src_val, anchored, repl)
    without_dst = F.map_filter(F.col("labels"), lambda k, _v: k != _lit(dst))
    with_dst = F.when(new_val == "", without_dst).otherwise(
        F.map_concat(without_dst, F.create_map(_lit(dst), new_val)))
    nl = F.when(matched, with_dst).otherwise(F.col("labels"))
    df = (iv.df.withColumn("labels", nl)
          .withColumn("sig", canonical_sig(F.col("labels"))))
    return _iv(df)


def _label_join(c: Compiler, call: A.Call) -> InstantVector:
    iv = _vector_arg(c, call, 0)
    dst = c.compile(call.args[1]).value
    sep = c.compile(call.args[2]).value
    srcs = [c.compile(a).value for a in call.args[3:]]
    if not _valid_label_name(dst):
        raise PromQLCompileError(
            f"invalid destination label name in label_join(): {dst}")
    for s in srcs:
        if not _valid_label_name(s):
            # upstream funcLabelJoin eval error
            raise PromQLCompileError(
                f"invalid source label name in label_join(): {s}")
    joined = F.concat_ws(
        sep, *[F.coalesce(F.element_at(F.col("labels"), s), _lit("")) for s in srcs])
    without_dst = F.map_filter(F.col("labels"), lambda k, _v: k != _lit(dst))
    nl = F.when(joined == "", without_dst).otherwise(
        F.map_concat(without_dst, F.create_map(_lit(dst), joined)))
    df = (iv.df.withColumn("labels", nl)
          .withColumn("sig", canonical_sig(F.col("labels"))))
    return _iv(df)


# ------------------------------------------------------------------- absent
def _absent_labels(node: A.Node) -> dict[str, str]:
    """Labels of an absent() result: equality matchers of the inner selector,
    metric name excluded (upstream createLabelsForAbsentFunction)."""
    sel = node
    if isinstance(sel, A.MatrixSelector):
        sel = sel.selector
    out: dict[str, str] = {}
    if isinstance(sel, A.VectorSelector):
        for m in sel.matchers:
            if m.op == "=" and m.label != "__name__":
                out[m.label] = m.value
    return out


def _absent(c: Compiler, call: A.Call, over_time: bool) -> InstantVector:
    inner = c.compile(call.args[0])
    if over_time:
        if not isinstance(inner, RangeVector):
            raise PromQLCompileError("absent_over_time expects a range vector")
        present = inner.df.select("t").distinct()
    else:
        if not isinstance(inner, InstantVector):
            raise PromQLCompileError("absent expects an instant vector")
        present = inner.df.select("t").distinct()
    lbls = _absent_labels(call.args[0])
    if lbls:
        lmap = F.create_map(*[_lit(x) for kv in sorted(lbls.items()) for x in kv])
    else:
        lmap = F.map_from_arrays(F.array().cast("array<string>"),
                                 F.array().cast("array<string>"))
    out = (c.grid_df().join(present, "t", "left_anti")
           .select("t", canonical_sig(lmap).alias("sig"), lmap.alias("labels"),
                   _lit(None).cast("long").alias("sample_ts"),
                   _lit(1.0).alias("value")))
    return InstantVector(out)


_INFO_IDENTIFYING = ("instance", "job")


def _info(c: Compiler, call: A.Call) -> InstantVector:
    """info() (public Prometheus 3.x experimental, promql/info.go): enrich
    each sample of v with DATA labels copied from info-metric series
    (default ``target_info``) that share the fixed identifying labels
    (instance, job) at the same evaluation step.

    Semantics implemented (per the public function docs):
    - the optional second argument is a brace-only selector; its
      ``__name__`` matchers choose which info metrics to consider, every
      other matcher both FILTERS the info series (missing label ≡ "") and
      RESTRICTS the copied data-label set to the matcher-named labels;
      matchers on identifying labels are rejected.
    - data labels are the info series' labels minus __name__ and the
      identifying labels; copied labels override same-named base labels.
    - base samples with no matching info series pass through unchanged;
      the metric name is kept (values are unmodified).
    - distinct surviving data-label sets for one (t, instance, job) group
      raise a conflicting-info-series error.
    Spark shape: the info side reduces to one row per (t, identifying
    labels) before an equi-join on (t, instance, job) — base cardinality is
    preserved and the join key is small; at scale the info side is tiny
    (one series per target) and broadcasts.
    """
    iv = _vector_arg(c, call, 0)
    if len(call.args) > 2:
        raise PromQLCompileError("info expects (vector[, selector])")
    name_matchers: list[A.Matcher] = []
    data_matchers: list[A.Matcher] = []
    if len(call.args) == 2:
        sel = call.args[1]
        if not isinstance(sel, A.VectorSelector) or sel.name is not None:
            raise PromQLCompileError(
                "info: second argument must be a label selector {...}")
        for m in sel.matchers:
            if m.label == "__name__":
                name_matchers.append(m)
            elif m.label in _INFO_IDENTIFYING:
                raise PromQLCompileError(
                    f"info: matcher on identifying label {m.label!r} "
                    "is not allowed")
            else:
                data_matchers.append(m)
    if not name_matchers:
        name_matchers = [A.Matcher("__name__", "=", "target_info")]

    info_iv = c.compile_vector(A.VectorSelector(None, list(name_matchers)))
    idf = info_iv.df

    def lbl(k):
        return F.coalesce(F.element_at(F.col("labels"), _lit(k)), _lit(""))

    for m in data_matchers:
        v = lbl(m.label)
        anchored = f"^(?:{m.value})$"
        cond = {"=": v == m.value, "!=": v != m.value,
                "=~": v.rlike(anchored), "!~": ~v.rlike(anchored)}[m.op]
        idf = idf.filter(cond)

    data = drop_labels("labels", ["__name__", *_INFO_IDENTIFYING])
    if data_matchers:
        names = F.array(*[_lit(n)
                          for n in sorted({m.label for m in data_matchers})])
        data = F.map_filter(data, lambda k, _v: F.array_contains(names, k))
    idf = idf.select("t", lbl("instance").alias("__inst"),
                     lbl("job").alias("__job"), data.alias("__data"))
    dsig = canonical_sig(F.col("__data"))
    g = (idf.withColumn("__dsig", dsig)
         .groupBy("t", "__inst", "__job")
         .agg(F.size(F.collect_set("__dsig")).alias("__nvar"),
              F.max_by(F.col("__data"), F.col("__dsig")).alias("__data")))
    # the guard must ride on a column the downstream plan actually reads —
    # a standalone flag column would be pruned by Catalyst and the
    # raise_error never evaluated
    guard = F.when(
        F.col("__nvar") > 1,
        F.raise_error(F.concat(
            _lit("info: conflicting info series for {instance="),
            F.col("__inst"), _lit(", job="), F.col("__job"), _lit("}")))
    ).otherwise(F.col("__data"))
    g = g.select("t", "__inst", "__job", guard.alias("__data"))

    b = (iv.df.withColumn("__inst", lbl("instance"))
         .withColumn("__job", lbl("job")))
    j = b.join(g, ["t", "__inst", "__job"], "left")
    merged = F.when(
        F.col("__data").isNotNull(),
        F.map_concat(
            F.map_filter(F.col("labels"),
                         lambda k, _v: F.element_at(F.col("__data"), k)
                         .isNull()),
            F.col("__data"))
    ).otherwise(F.col("labels"))
    out = (j.withColumn("labels", merged)
           .withColumn("sig", canonical_sig(F.col("labels")))
           .select("t", "sig", "labels", "sample_ts", "value"))
    return _iv(out)


# ---------------------------------------------------------------- dispatch
def dispatch(c: Compiler, call: A.Call):
    fn = call.func

    if fn in _MATH_FUNCS:
        iv = _vector_arg(c, call)
        df = iv.df.withColumn("value", _MATH_FUNCS[fn](F.col("value")).cast(D))
        return _iv(_drop_name(df))

    if fn in _OVER_TIME or fn == "quantile_over_time":
        return _over_time(c, call)

    if fn in ("rate", "increase"):
        rv = _range_arg(c, call)
        name = _selector_name(call.args[0])
        if (name and "hist" not in rv.columns and
                not re.search(r"_(total|sum|count|bucket)$", name)):
            # upstream annotations.NewPossibleNonCounterInfo (emitted on the
            # float path only — native-histogram series carry no suffix)
            c.annotate("info", "metric might not be a counter, name does "
                               "not end in _total/_sum/_count/_bucket: "
                               f'"{name}"')
        return _extrapolated(c, rv, counter=True, is_rate=(fn == "rate"))
    if fn == "delta":
        return _extrapolated(c, _range_arg(c, call), counter=False, is_rate=False)
    if fn in ("irate", "idelta"):
        return _instant_pair(c, _range_arg(c, call), fn)
    if fn in ("double_exponential_smoothing", "holt_winters"):
        return _double_exp_smoothing(c, call)
    if fn in ("resets", "changes"):
        rv = _range_arg(c, call)
        if "hist" in rv.columns:
            return _counts_hist(c, rv, fn)
        if not c.p.deterministic and rv.prev is not None:
            # production: a transition count is a plain aggregation over
            # (sample, predecessor) pairs — a pair counts iff the
            # predecessor is itself inside the window (__pts > t - range),
            # which is exactly the set of consecutive pairs _counts_fold
            # walks.  Native HashAggregate with map-side partials, and
            # integer-exact (sums of 0.0/1.0 — no float-reassociation
            # trade, unlike sum_over_time).  NaN rules mirror the fold
            # verbatim; a NULL predecessor (first sample of a series)
            # falls out via coalesce(hit, false).
            from thanos_parquet_gateway_spark.promql.compiler import hgroup
            v, pv = F.col("value"), F.col("__pv")
            in_win = F.col("__pts") > (F.col("t") - _lit(rv.range_ms))
            if fn == "resets":
                hit = ~F.isnan(v) & ~F.isnan(pv) & (v < pv)
            else:
                both_nan = F.isnan(v) & F.isnan(pv)
                hit = ((v != pv) | F.isnan(v) | F.isnan(pv)) & ~both_nan
            g = hgroup(
                rv.prev, "sig",
                F.sum(F.when(F.coalesce(in_win & hit, _lit(False)),
                             _lit(1.0)).otherwise(_lit(0.0))).alias("__v"))
            return _finalize(g, F.col("__v"))
        g = _collect_window(rv)
        val = _counts_fold(F.col("arr"), fn)
        return _finalize(g, val)
    if fn == "deriv":
        return _deriv(c, call)
    if fn == "predict_linear":
        return _predict_linear(c, call)

    if fn == "histogram_quantile":
        iv = _vector_arg(c, call, 1)
        q_ = _scalar_lit(c, call, 0)
        _warn_quantile(c, q_)
        if "hist" not in iv.df.columns:
            return _iv(_histogram_quantile_classic(q_, iv.df, c))
        # mixed vector: native-histogram samples take the bucket-struct
        # path; float samples carrying le labels take the classic path
        # (upstream evaluates both populations side by side)
        from thanos_parquet_gateway_spark.promql import histograms as H
        native = (iv.df.filter(F.col("hist").isNotNull())
                  .withColumn("value", H.hist_quantile(q_, F.col("hist")))
                  .drop("hist"))
        native = _drop_name(native).select(
            "t", "sig", "labels", "sample_ts", "value")
        classic = _histogram_quantile_classic(
            q_, iv.df.filter(F.col("hist").isNull()).drop("hist"), c)
        classic = classic.select("t", "sig", "labels", "sample_ts", "value")
        # upstream funcHistogramQuantile: when a classic bucket group and a
        # native histogram reduce to the SAME output labelset, the series is
        # skipped entirely (emitting both would be an invalid vector with a
        # duplicate labelset) and a mixed-histograms warning is raised
        coll = (native.select("t", "sig")
                .join(classic.select("t", "sig"), ["t", "sig"]))
        c.add_data_probe(
            coll.limit(1).select(
                _lit("warn").alias("kind"),
                _lit("vector contains a mix of classic and native "
                      "histograms").alias("msg")))
        out = (native.join(coll, ["t", "sig"], "left_anti")
               .unionByName(classic.join(coll, ["t", "sig"], "left_anti")))
        return _iv(out)

    if fn in ("histogram_count", "histogram_sum", "histogram_avg",
              "histogram_stddev", "histogram_stdvar"):
        from thanos_parquet_gateway_spark.promql import histograms as H
        iv = _vector_arg(c, call, 0)
        if "hist" not in iv.df.columns:
            raise PromQLCompileError(f"{fn} requires native-histogram samples")
        val = {"histogram_count": H.hist_count, "histogram_sum": H.hist_sum,
               "histogram_avg": H.hist_avg,
               "histogram_stddev": H.hist_stddev,
               "histogram_stdvar": H.hist_stdvar}[fn](F.col("hist"))
        df = (iv.df.filter(F.col("hist").isNotNull())
              .withColumn("value", val).drop("hist"))
        return _iv(_drop_name(df))

    if fn == "histogram_fraction":
        from thanos_parquet_gateway_spark.promql import histograms as H
        lo = _scalar_lit(c, call, 0)
        hi = _scalar_lit(c, call, 1)
        iv = _vector_arg(c, call, 2)
        if "hist" not in iv.df.columns:
            raise PromQLCompileError("histogram_fraction requires native histograms")
        df = (iv.df.filter(F.col("hist").isNotNull())
              .withColumn("value", H.hist_fraction(lo, hi, F.col("hist")))
              .drop("hist"))
        return _iv(_drop_name(df))
    if fn == "info":
        return _info(c, call)
    if fn == "label_replace":
        return _label_replace(c, call)
    if fn == "label_join":
        return _label_join(c, call)
    if fn == "absent":
        return _absent(c, call, over_time=False)
    if fn == "absent_over_time":
        return _absent(c, call, over_time=True)

    if fn == "round":
        iv = _vector_arg(c, call)
        to = _scalar_lit(c, call, 1) if len(call.args) > 1 else 1.0
        # PromQL round: nearest multiple of `to`, ties round up.  Upstream
        # funcRound works through the INVERSE multiplier
        # (floor(v*(1/to)+0.5)/(1/to), promql/functions.go funcRound) — the
        # direct v/to form can differ in the last ulp for non-power-of-two
        # `to` and flip a tie across the .5 boundary, so mirror it exactly.
        # Spark's floor returns LONG (NaN→0, ±Inf saturate); doubles with
        # |q| >= 2^52 are already integral (the +0.5 is absorbed), so pass
        # them — and NaN/±Inf — through as Go math.Floor would.
        # to == ±0.0: Go computes 1/±0 = ±Inf (funcRound) and every sample
        # rounds to NaN; Python raises ZeroDivisionError, so mirror the Go
        # float semantics explicitly (copysign keeps -0.0 → -Inf).
        inv = math.copysign(math.inf, to) if to == 0.0 else 1.0 / to
        q = F.col("value") * _lit(inv)
        val = (F.when(F.isnan(q) | (F.abs(q) >= _lit(2.0 ** 52)), q)
               .otherwise(F.floor(q + _lit(0.5)).cast(D))) / _lit(inv)
        df = iv.df.withColumn("value", val.cast(D))
        return _iv(_drop_name(df))

    if fn in ("clamp", "clamp_min", "clamp_max"):
        iv = _vector_arg(c, call)
        v = F.col("value")
        if fn == "clamp":
            mn, mx = _scalar_lit(c, call, 1), _scalar_lit(c, call, 2)
            if mx < mn:  # upstream funcClamp: empty vector (false for NaN)
                return InstantVector(iv.df.filter(_lit(False)))
            if math.isnan(mn) or math.isnan(mx):
                val = NAN()  # Go math.Min/Max propagate NaN bounds
            else:
                val = F.least(F.greatest(v, _lit(mn)), _lit(mx))
        elif fn == "clamp_min":
            b = _scalar_lit(c, call, 1)
            val = NAN() if math.isnan(b) else F.greatest(v, _lit(b))
        else:
            b = _scalar_lit(c, call, 1)
            # Spark least() picks the non-NaN side (NaN sorts greatest);
            # Go math.Min propagates NaN — constant-fold the divergence.
            val = NAN() if math.isnan(b) else F.least(v, _lit(b))
        df = iv.df.withColumn("value", F.when(F.isnan(v), v).otherwise(val))
        return _iv(_drop_name(df))

    if fn == "vector":
        v = c.compile(call.args[0])
        if isinstance(v, float):
            return c._scalar_to_vector(ScalarV(c._const_scalar_df(v)))
        if isinstance(v, ScalarV):
            return c._scalar_to_vector(v)
        raise PromQLCompileError("vector() expects a scalar")

    if fn == "scalar":
        iv = _vector_arg(c, call)
        per_t = (iv.df.groupBy("t")
                 .agg(F.count("*").alias("__n"), F.first("value").alias("__v")))
        out = (c.grid_df().join(per_t, "t", "left")
               .select("t", F.when(F.col("__n") == 1, F.col("__v"))
                             .otherwise(NAN()).alias("value")))
        return ScalarV(out)

    if fn == "time":
        return ScalarV(c.grid_df().select(
            "t", (F.col("t").cast(D) / 1000.0).alias("value")))

    if fn == "timestamp":
        iv = _vector_arg(c, call)
        df = iv.df.withColumn(
            "value",
            (F.coalesce(F.col("sample_ts"), F.col("t")).cast(D) / 1000.0))
        return _iv(_drop_name(df))

    if fn in _TIME_FUNCS:
        if call.args:
            iv = _vector_arg(c, call)
        else:
            iv = c._scalar_to_vector(ScalarV(c.grid_df().select(
                "t", (F.col("t").cast(D) / 1000.0).alias("value"))))
        ts_col = F.timestamp_seconds(F.col("value"))
        df = iv.df.withColumn("value", _TIME_FUNCS[fn](ts_col).cast(D))
        return _iv(_drop_name(df))

    if fn == "pi":
        return float(3.141592653589793)

    if fn in ("sort", "sort_desc"):
        # upstream sorts NaN to the BOTTOM in both directions (funcSort /
        # funcSortDesc reverse a NaN-first heap); Spark's desc() would
        # otherwise put NaN first (NaN orders greatest)
        iv = _vector_arg(c, call)
        order = ([F.isnan("value").asc(), F.col("value").desc()]
                 if fn == "sort_desc" else [F.col("value").asc()])
        return InstantVector(iv.df.orderBy("t", *order, F.col("sig")))

    if fn in ("sort_by_label", "sort_by_label_desc"):
        # Lexicographic (byte-wise) per-label compare, missing label ≡ "",
        # full labelset as final tiebreak — Prometheus 3.x semantics
        # (funcSortByLabel; 3.0 dropped the 2.x natural-sort behavior).
        iv = _vector_arg(c, call)
        desc = fn.endswith("_desc")
        keys = []
        for a in call.args[1:]:
            s = c.compile(a)
            if not isinstance(s, StringV):
                raise PromQLCompileError(f"{fn} label arguments must be strings")
            col = F.coalesce(F.element_at(F.col("labels"), s.value), _lit(""))
            keys.append(col.desc() if desc else col.asc())
        keys.append(F.col("sig").desc() if desc else F.col("sig").asc())
        return InstantVector(iv.df.orderBy("t", *keys))

    raise PromQLCompileError(f"unsupported function {fn}")
