"""Generate promqltest corpus slices (tests/promqltest/gen_*.test).

Expected values are computed by an INDEPENDENT pure-Python simulation of
the public PromQL semantics (upstream promql/functions.go + engine.go
algorithms, re-derived here from the public sources) — NOT by the engine
under test.  A divergence between a generated expectation and the engine
is therefore a real finding for one of the two sides.

Deterministic: re-running overwrites the gen_*.test files byte-for-byte.

Usage: python tools/gen_promqltest.py
"""

from __future__ import annotations

import math
import os

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "promqltest")

LOOKBACK_MS = 300_000  # runner default (upstream 5m lookback delta)


# ---------------------------------------------------------------------------
# independent semantics helpers


def fmt(v: float) -> str:
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if v == math.inf:
        return "Inf"
    if v == -math.inf:
        return "-Inf"
    if float(v) == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def series_id(labels: dict[str, str]) -> str:
    name = labels.get("__name__", "")
    rest = ", ".join(f'{k}="{v}"' for k, v in sorted(labels.items())
                     if k != "__name__")
    if name and rest:
        return f"{name}{{{rest}}}"
    if name:
        return name
    return f"{{{rest}}}"


def load_samples(start: float, delta: float, n: int,
                 interval_ms: int = 10_000) -> list[tuple[int, float]]:
    """``start+deltaxN`` notation → [(ts_ms, value)] (N+1 samples)."""
    return [(i * interval_ms, start + i * delta) for i in range(n + 1)]


def instant(samples: list[tuple[int, float]], t: int) -> float | None:
    """Newest sample in [t - lookback, t] (upstream instant selection)."""
    best = None
    for ts, v in samples:
        if t - LOOKBACK_MS <= ts <= t:
            best = v
    return best


def window(samples: list[tuple[int, float]], t: int,
           range_ms: int) -> list[tuple[int, float]]:
    """Range selection (t - range, t] (upstream matrix selection)."""
    return [(ts, v) for ts, v in samples if t - range_ms < ts <= t]


def extrapolated_rate(sams: list[tuple[int, float]], t: int, range_ms: int,
                      is_counter: bool, is_rate: bool) -> float | None:
    """Upstream extrapolatedRate (promql/functions.go, public): linear
    extrapolation to the window bounds, clamped at the average sample
    interval and (for counters) at the zero crossing."""
    if len(sams) < 2:
        return None
    range_start, range_end = t - range_ms, t
    first_t, first_v = sams[0]
    last_t, last_v = sams[-1]
    result = last_v - first_v
    if is_counter:
        prev = first_v
        for _, v in sams:
            if v < prev:
                result += prev
            prev = v
    sampled_interval = (last_t - first_t) / 1000.0
    duration_to_start = (first_t - range_start) / 1000.0
    duration_to_end = (range_end - last_t) / 1000.0
    avg_interval = sampled_interval / (len(sams) - 1)
    threshold = avg_interval * 1.1
    if duration_to_start >= threshold:
        duration_to_start = avg_interval / 2
    if is_counter and result > 0 and first_v >= 0:
        duration_to_zero = sampled_interval * (first_v / result)
        if duration_to_zero < duration_to_start:
            duration_to_start = duration_to_zero
    if duration_to_end >= threshold:
        duration_to_end = avg_interval / 2
    factor = (sampled_interval + duration_to_start + duration_to_end) \
        / sampled_interval
    result *= factor
    if is_rate:
        result /= range_ms / 1000.0
    return result


def linear_regression(sams: list[tuple[int, float]],
                      intercept_ms: int) -> tuple[float, float]:
    """Upstream linearRegression: least squares over x = seconds relative
    to ``intercept_ms``; returns (slope, intercept)."""
    n = float(len(sams))
    sx = sy = sxy = sx2 = 0.0
    const = all(v == sams[0][1] for _, v in sams)
    if const:
        return 0.0, sams[0][1]
    for ts, v in sams:
        x = (ts - intercept_ms) / 1000.0
        sx += x
        sy += v
        sxy += x * v
        sx2 += x * x
    cov = sxy - sx * sy / n
    var = sx2 - sx * sx / n
    slope = cov / var
    return slope, sy / n - slope * sx / n


def quantile(phi: float, vals: list[float]) -> float:
    """Upstream quantile: linear interpolation on the sorted values."""
    if not vals:
        return math.nan
    if phi < 0:
        return -math.inf
    if phi > 1:
        return math.inf
    s = sorted(vals)
    n = len(s)
    rank = phi * (n - 1)
    lo = int(math.floor(rank))
    hi = min(n - 1, lo + 1)
    w = rank - lo
    return s[lo] * (1 - w) + s[hi] * w


def stddev(vals: list[float]) -> float:
    m = sum(vals) / len(vals)
    return math.sqrt(sum((v - m) ** 2 for v in vals) / len(vals))


def mad(vals: list[float]) -> float:
    med = quantile(0.5, vals)
    return quantile(0.5, [abs(v - med) for v in vals])


# Go-math edge conventions (out-of-domain → NaN, poles → ±Inf)
def _ln(v):
    if v < 0:
        return math.nan
    if v == 0:
        return -math.inf
    return math.log(v)


def _safe(f):
    def g(v):
        try:
            return f(v)
        except (ValueError, OverflowError):
            return math.nan
    return g


def _atanh(v):
    if v == 1:
        return math.inf
    if v == -1:
        return -math.inf
    if abs(v) > 1:
        return math.nan
    return math.atanh(v)


MATH_FNS: dict[str, object] = {
    "abs": abs,
    "ceil": math.ceil,
    "floor": math.floor,
    "exp": _safe(math.exp),
    "ln": _ln,
    "log2": lambda v: _ln(v) / math.log(2),
    "log10": lambda v: _ln(v) / math.log(10),
    "sqrt": _safe(math.sqrt),
    "sgn": lambda v: float((v > 0) - (v < 0)),
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "asin": _safe(math.asin),
    "acos": _safe(math.acos),
    "atan": math.atan,
    "sinh": math.sinh,
    "cosh": math.cosh,
    "tanh": math.tanh,
    "asinh": math.asinh,
    "acosh": _safe(math.acosh),
    "atanh": _atanh,
    "deg": math.degrees,
    "rad": math.radians,
}


# ---------------------------------------------------------------------------
# file generators


def gen_functions() -> str:
    values = {
        "neg_big": -2.5, "neg_one": -1.0, "neg_half": -0.5, "zero": 0.0,
        "half": 0.5, "one": 1.0, "two_half": 2.5, "big": 100.75,
    }
    lines = ["# GENERATED by tools/gen_promqltest.py — math function edge",
             "# table; expected values from an independent Python port of",
             "# the public Go math conventions (out-of-domain -> NaN).",
             "", "load 10s"]
    for case, v in values.items():
        lines.append(f"\tm{{case=\"{case}\"}} {fmt(v)}+0x50")
    lines.append("")
    t = "500s"
    for fn, f in MATH_FNS.items():
        lines.append(f"eval instant at {t} {fn}(m)")
        for case, v in values.items():
            lines.append(f"\t{{case=\"{case}\"}} {fmt(f(v))}")
        lines.append("")
    # round with and without to_nearest
    for expr, f in [
        ("round(m)", lambda v: math.floor(v + 0.5)),
        ("round(m, 0.5)", lambda v: math.floor(v / 0.5 + 0.5) * 0.5),
        ("round(m, 2)", lambda v: math.floor(v / 2 + 0.5) * 2),
        ("clamp(m, -1, 1)", lambda v: max(-1.0, min(1.0, v))),
        ("clamp_min(m, 0)", lambda v: max(0.0, v)),
        ("clamp_max(m, 0)", lambda v: min(0.0, v)),
        ("clamp(m, 1, -1)", None),  # min > max -> drop all (empty result)
    ]:
        lines.append(f"eval instant at {t} {expr}")
        if f is not None:
            for case, v in values.items():
                lines.append(f"\t{{case=\"{case}\"}} {fmt(f(v))}")
        lines.append("")
    return "\n".join(lines)


def gen_binops() -> str:
    a_vals = {"p": 4.0, "q": -3.0, "r": 0.0, "s": 7.5}
    b_vals = {"p": 2.0, "q": 6.0, "r": -1.5}  # no "s": tests matching drops
    lines = ["# GENERATED by tools/gen_promqltest.py — binary operator",
             "# matrix over vector/scalar operand shapes.",
             "", "load 10s"]
    for g, v in a_vals.items():
        lines.append(f"\ta{{g=\"{g}\"}} {fmt(v)}+0x50")
    for g, v in b_vals.items():
        lines.append(f"\tb{{g=\"{g}\"}} {fmt(v)}+0x50")
    lines.append("")

    def emit(expr: str, rows: dict[str, float | None], name: str = ""):
        lines.append(f"eval instant at 500s {expr}")
        for g, v in rows.items():
            if v is None:
                continue
            sid = f"{name}{{g=\"{g}\"}}" if name else f"{{g=\"{g}\"}}"
            lines.append(f"\t{sid} {fmt(v)}")
        lines.append("")

    def div(x, y):
        if y == 0:
            return math.nan if x == 0 else math.copysign(math.inf, x)
        return x / y

    def powg(x, y):
        # Go math.Pow: Pow(±0, y<0) is ±Inf (odd-integer y keeps the sign)
        if x == 0 and y < 0:
            if y == int(y) and int(y) % 2 == 1:
                return math.copysign(math.inf, x)
            return math.inf
        try:
            return math.pow(x, y)
        except (ValueError, OverflowError):
            return math.nan

    ARITH = {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
             "*": lambda x, y: x * y, "/": div,
             "%": lambda x, y: math.fmod(x, y) if y != 0 else math.nan,
             "^": powg}
    for op, f in ARITH.items():
        emit(f"a {op} 2", {g: f(v, 2.0) for g, v in a_vals.items()})
        emit(f"2 {op} a", {g: f(2.0, v) for g, v in a_vals.items()})
        emit(f"a {op} on(g) b",
             {g: f(a_vals[g], b_vals[g]) for g in a_vals if g in b_vals})
    CMP = {"==": lambda x, y: x == y, "!=": lambda x, y: x != y,
           ">": lambda x, y: x > y, "<": lambda x, y: x < y,
           ">=": lambda x, y: x >= y, "<=": lambda x, y: x <= y}
    for op, f in CMP.items():
        # filter form keeps the metric name and original value
        emit(f"a {op} 2", {g: (v if f(v, 2.0) else None)
                           for g, v in a_vals.items()}, name="a")
        emit(f"a {op} bool 2", {g: float(f(v, 2.0))
                                for g, v in a_vals.items()})
        emit(f"a {op} bool on(g) b",
             {g: float(f(a_vals[g], b_vals[g]))
              for g in a_vals if g in b_vals})
    # set operations: full-labelset matching (different names never match
    # because on() is not given — __name__ differs, so match on g only)
    emit("a and on(g) b", {g: (v if g in b_vals else None)
                           for g, v in a_vals.items()}, name="a")
    emit("a unless on(g) b", {g: (v if g not in b_vals else None)
                              for g, v in a_vals.items()}, name="a")
    return "\n".join(lines)


def gen_agg() -> str:
    rows = ["1", "2", "3", "4"]
    cols = ["a", "b", "c"]
    val = {(r, c): 10.0 * int(r) + (ord(c) - ord("a")) * 3.5
           for r in rows for c in cols}
    lines = ["# GENERATED by tools/gen_promqltest.py — aggregation matrix",
             "# over a 4x3 labeled grid (value = 10*r + 3.5*col_index).",
             "", "load 10s"]
    for (r, c), v in val.items():
        lines.append(f"\tm{{r=\"{r}\", c=\"{c}\"}} {fmt(v)}+0x50")
    lines.append("")

    AGGS = {
        "sum": sum,
        "min": min,
        "max": max,
        "avg": lambda vs: sum(vs) / len(vs),
        "count": lambda vs: float(len(vs)),
        "group": lambda vs: 1.0,
        "stddev": stddev,
        "stdvar": lambda vs: stddev(vs) ** 2,
    }

    def emit(expr: str, groups: dict[tuple, float], keyname: str):
        lines.append(f"eval instant at 500s {expr}")
        for key, v in groups.items():
            lbls = ", ".join(f'{keyname}="{k}"' for k in key) if keyname \
                else ""
            lines.append(f"\t{{{lbls}}} {fmt(v)}")
        lines.append("")

    for op, f in AGGS.items():
        emit(f"{op}(m)", {(): f(list(val.values()))}, "")
        emit(f"{op} by (r) (m)",
             {(r,): f([val[(r, c)] for c in cols]) for r in rows}, "r")
        emit(f"{op} by (c) (m)",
             {(c,): f([val[(r, c)] for r in rows]) for c in cols}, "c")
        emit(f"{op} without (c) (m)",
             {(r,): f([val[(r, c)] for c in cols]) for r in rows}, "r")
    for phi in (0.0, 0.25, 0.5, 0.9, 1.0):
        emit(f"quantile({fmt(phi)}, m)",
             {(): quantile(phi, list(val.values()))}, "")
        emit(f"quantile({fmt(phi)}, m) by (r)" if False else
             f"quantile by (r) ({fmt(phi)}, m)",
             {(r,): quantile(phi, [val[(r, c)] for c in cols])
              for r in rows}, "r")
    # topk/bottomk keep full series identity
    for k in (1, 2):
        lines.append(f"eval instant at 500s topk({k}, m)")
        for (r, c), v in sorted(val.items(), key=lambda kv: -kv[1])[:k]:
            lines.append(f"\tm{{c=\"{c}\", r=\"{r}\"}} {fmt(v)}")
        lines.append("")
        lines.append(f"eval instant at 500s bottomk({k}, m)")
        for (r, c), v in sorted(val.items(), key=lambda kv: kv[1])[:k]:
            lines.append(f"\tm{{c=\"{c}\", r=\"{r}\"}} {fmt(v)}")
        lines.append("")
    return "\n".join(lines)


def gen_overtime() -> str:
    # non-monotone gauge: v(i) = i + 6*sin(i/3) sampled every 10s
    n = 60
    sams = [(i * 10_000, i + 6 * math.sin(i / 3)) for i in range(n + 1)]
    lines = ["# GENERATED by tools/gen_promqltest.py — *_over_time matrix",
             "# over a non-monotone gauge (v = i + 6*sin(i/3), 10s steps).",
             "", "load 10s",
             "\tg " + " ".join(fmt(v) for _, v in sams), ""]
    FNS = {
        "sum_over_time": sum,
        "avg_over_time": lambda vs: sum(vs) / len(vs),
        "min_over_time": min,
        "max_over_time": max,
        "count_over_time": lambda vs: float(len(vs)),
        "last_over_time": lambda vs: vs[-1],
        "stddev_over_time": stddev,
        "stdvar_over_time": lambda vs: stddev(vs) ** 2,
        "present_over_time": lambda vs: 1.0,
        "mad_over_time": mad,
    }
    times = [95_000, 300_000, 455_000, 600_000]
    windows = [(30_000, "30s"), (90_000, "90s"), (250_000, "250s")]
    for fn, f in FNS.items():
        for t in times:
            for w_ms, w_s in windows:
                vals = [v for _, v in window(sams, t, w_ms)]
                if not vals:
                    continue
                keep_name = fn == "last_over_time"
                sid = "g" if keep_name else "{}"
                lines.append(f"eval instant at {t // 1000}s {fn}(g[{w_s}])")
                lines.append(f"\t{sid} {fmt(f(vals))}")
                lines.append("")
    for phi in (0.1, 0.5, 0.95):
        for t in times[:2]:
            vals = [v for _, v in window(sams, t, 90_000)]
            lines.append(f"eval instant at {t // 1000}s "
                         f"quantile_over_time({fmt(phi)}, g[90s])")
            lines.append(f"\t{{}} {fmt(quantile(phi, vals))}")
            lines.append("")
    # ts_of_* return the sample timestamp in seconds
    for t in times[:2]:
        w = window(sams, t, 90_000)
        mx = max(w, key=lambda sv: (sv[1], sv[0]))
        mn = min(w, key=lambda sv: (sv[1], -sv[0]))
        lines.append(f"eval instant at {t // 1000}s ts_of_max_over_time(g[90s])")
        lines.append(f"\t{{}} {fmt(mx[0] / 1000)}")
        lines.append("")
        lines.append(f"eval instant at {t // 1000}s ts_of_min_over_time(g[90s])")
        lines.append(f"\t{{}} {fmt(mn[0] / 1000)}")
        lines.append("")
        lines.append(f"eval instant at {t // 1000}s ts_of_last_over_time(g[90s])")
        lines.append(f"\t{{}} {fmt(w[-1][0] / 1000)}")
        lines.append("")
    return "\n".join(lines)


def gen_rate() -> str:
    # counter with two resets: v grows 2/sample, resets at i=25 and i=43
    vals = []
    v = 0.0
    for i in range(61):
        if i in (25, 43):
            v = 1.0
        vals.append(v)
        v += 2.0
    sams = [(i * 10_000, vals[i]) for i in range(61)]
    # plain gauge for delta/deriv: v = 3*i + 10
    gs = [(i * 10_000, 3.0 * i + 10) for i in range(61)]
    lines = ["# GENERATED by tools/gen_promqltest.py — rate-family matrix:",
             "# counter with resets at samples 25 and 43 (2/sample slope),",
             "# linear gauge (3/sample).  Expected values from an",
             "# independent Python port of the public extrapolatedRate /",
             "# linearRegression algorithms.",
             "", "load 10s",
             "\tc " + " ".join(fmt(x) for x in vals),
             "\tg " + " ".join(fmt(v) for _, v in gs), ""]
    times = [100_000, 260_000, 440_000, 605_000]
    windows = [(50_000, "50s"), (130_000, "130s"), (300_000, "300s")]
    for t in times:
        for w_ms, w_s in windows:
            w = window(sams, t, w_ms)
            if len(w) < 2:
                continue
            ts = t // 1000
            for fn, is_counter, is_rate in [("rate", True, True),
                                            ("increase", True, False),
                                            ("delta", False, False)]:
                src = "c" if is_counter else "g"
                ww = w if is_counter else window(gs, t, w_ms)
                r = extrapolated_rate(ww, t, w_ms, is_counter, is_rate)
                lines.append(f"eval instant at {ts}s {fn}({src}[{w_s}])")
                lines.append(f"\t{{}} {fmt(r)}")
                lines.append("")
            # changes / resets over the counter window
            ch = sum(1 for i in range(1, len(w)) if w[i][1] != w[i - 1][1])
            rs = sum(1 for i in range(1, len(w)) if w[i][1] < w[i - 1][1])
            lines.append(f"eval instant at {ts}s changes(c[{w_s}])")
            lines.append(f"\t{{}} {fmt(float(ch))}")
            lines.append("")
            lines.append(f"eval instant at {ts}s resets(c[{w_s}])")
            lines.append(f"\t{{}} {fmt(float(rs))}")
            lines.append("")
    # irate/idelta from the last two samples
    for t in times:
        w = window(sams, t, 60_000)
        if len(w) < 2:
            continue
        (t1, v1), (t2, v2) = w[-2], w[-1]
        ts = t // 1000
        iv = (v2 if v2 < v1 else v2 - v1) / ((t2 - t1) / 1000)
        lines.append(f"eval instant at {ts}s irate(c[60s])")
        lines.append(f"\t{{}} {fmt(iv)}")
        lines.append("")
        lines.append(f"eval instant at {ts}s idelta(c[60s])")
        lines.append(f"\t{{}} {fmt(v2 - v1)}")
        lines.append("")
    # deriv / predict_linear on the gauge (exact slope 0.3/s)
    for t in times:
        w = window(gs, t, 130_000)
        if len(w) < 2:
            continue
        ts = t // 1000
        slope, intercept = linear_regression(w, t)
        lines.append(f"eval instant at {ts}s deriv(g[130s])")
        lines.append(f"\t{{}} {fmt(slope)}")
        lines.append("")
        for d in (60.0, 600.0):
            lines.append(f"eval instant at {ts}s predict_linear(g[130s], {fmt(d)})")
            lines.append(f"\t{{}} {fmt(slope * d + intercept)}")
            lines.append("")
    # range-query form: rate over the counter at a 60s step grid
    start, end, step = 200_000, 500_000, 60_000
    pts = []
    for t in range(start, end + 1, step):
        w = window(sams, t, 120_000)
        pts.append(extrapolated_rate(w, t, 120_000, True, True)
                   if len(w) >= 2 else None)
    lines.append("eval range from 200s to 500s step 60s rate(c[120s])")
    lines.append("\t{} " + " ".join("_" if p is None else fmt(p)
                                    for p in pts))
    lines.append("")
    pts = []
    for t in range(start, end + 1, step):
        vals_w = [v for _, v in window(gs, t, 120_000)]
        pts.append(sum(vals_w) if vals_w else None)
    lines.append("eval range from 200s to 500s step 60s sum_over_time(g[120s])")
    lines.append("\t{} " + " ".join("_" if p is None else fmt(p)
                                    for p in pts))
    lines.append("")
    return "\n".join(lines)


FILES = {
    "gen_functions.test": gen_functions,
    "gen_binops.test": gen_binops,
    "gen_agg.test": gen_agg,
    "gen_overtime.test": gen_overtime,
    "gen_rate.test": gen_rate,
}


def main():
    total = 0
    for name, g in FILES.items():
        text = g().rstrip() + "\n"
        n = text.count("\neval ") + text.startswith("eval ")
        with open(os.path.join(OUT_DIR, name), "w") as f:
            f.write(text)
        cases = text.count("eval instant") + text.count("eval range")
        total += cases
        print(f"{name}: {cases} eval cases")
    print(f"total: {total}")


if __name__ == "__main__":
    main()
