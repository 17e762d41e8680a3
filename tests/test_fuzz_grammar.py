"""Grammar-wide random-expression fuzz: generate type-correct PromQL from
(almost) the whole grammar and require that

1. evaluation never fails with anything but a *modeled* PromQL error
   (vector-matching cardinality violations surface as Spark raise_error;
   everything else — AttributeError, Py4J NPEs, analysis exceptions — is a
   bug), and
2. an instant evaluation at T returns exactly the rows a single-point range
   evaluation produces at the same T — the two serving code paths
   (lookback serving vs step-grid explode) must agree on every expression.

This is the crash-surface complement of the identity-based metamorphic
suite and the template-based DuckDB differential suite (reference analogue:
promqlsmith, db/db_test.go:1129-1205).
"""

from __future__ import annotations

import math
import random

import pytest

# heavy seeded-fuzz/property suite: excluded from the default pytest
# run (see pytest.ini); select with -m ""
pytestmark = pytest.mark.slow

from tests.conftest import make_samples

S = 1000
T = 200 * S  # eval instant, inside the sample range

METRICS = ("g0", "g1", "c0_total")
JOBS = ("a", "b")
INSTS = ("1", "2")

MATH_FNS = ("abs", "ceil", "floor", "sqrt", "exp", "ln", "sgn", "rad")
OVER_TIME = ("sum_over_time", "avg_over_time", "min_over_time",
             "max_over_time", "count_over_time", "last_over_time",
             "stddev_over_time", "present_over_time", "quantile_over_time")
RATE_FNS = ("rate", "increase", "delta", "irate", "idelta", "resets",
            "changes", "deriv")
AGGS = ("sum", "min", "max", "avg", "count", "group", "stddev", "stdvar")
PARAM_AGGS = ("topk", "bottomk", "quantile")
SET_OPS = ("and", "or", "unless")
ARITH = ("+", "-", "*", "/")
CMP = ("==", "!=", ">", "<", ">=", "<=")
WINDOWS = ("30s", "50s", "1m", "90s")


def _selector(rng: random.Random) -> str:
    m = rng.choice(METRICS)
    parts = []
    if rng.random() < 0.5:
        parts.append(f'job="{rng.choice(JOBS)}"')
    if rng.random() < 0.3:
        parts.append('inst=~"[12]"')
    if rng.random() < 0.2:
        parts.append('inst!="3"')
    sel = m + ("{%s}" % ", ".join(parts) if parts else "")
    if rng.random() < 0.2:
        sel += f" offset {rng.choice(('10s', '30s', '1m'))}"
    if rng.random() < 0.15:
        sel += f" @ {rng.randrange(60, 260)}"
    return sel


def _matrix(rng: random.Random, depth: int) -> str:
    if depth > 0 and rng.random() < 0.3:
        # subquery over an arbitrary vector expression
        return (f"({_vector(rng, depth - 1)})"
                f"[{rng.choice(WINDOWS)}:{rng.choice(('10s', '20s'))}]")
    return f"{_selector(rng)}[{rng.choice(WINDOWS)}]"


def _scalar(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if depth <= 0 or r < 0.4:
        return str(rng.choice((1, 2, 3, 0.5, 10)))
    if r < 0.6:
        return f"scalar({_vector(rng, 0)})"
    if r < 0.7:
        return "(time() / time())"
    a, b = _scalar(rng, depth - 1), _scalar(rng, depth - 1)
    return f"({a} {rng.choice(ARITH)} {b})"


def _grouping(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.4:
        return ""
    if r < 0.7:
        return f" by ({rng.choice(('job', 'inst'))})"
    return " without (inst)"


def _vector(rng: random.Random, depth: int) -> str:
    r = rng.random()
    if depth <= 0 or r < 0.18:
        return _selector(rng)
    if r < 0.28:
        return f"{rng.choice(MATH_FNS)}({_vector(rng, depth - 1)})"
    if r < 0.38:
        op = rng.choice(AGGS)
        return f"{op}{_grouping(rng)}({_vector(rng, depth - 1)})"
    if r < 0.44:
        op = rng.choice(PARAM_AGGS)
        p = (_scalar(rng, 1) if op != "quantile"
             else rng.choice(("0.1", "0.5", "0.9", "scalar(g0{job=\"a\"})")))
        return f"{op}({p}, {_vector(rng, depth - 1)})"
    if r < 0.56:
        fn = rng.choice(OVER_TIME)
        m = _matrix(rng, depth - 1)
        if fn == "quantile_over_time":
            return f"{fn}(0.5, {m})"
        return f"{fn}({m})"
    if r < 0.64:
        return f"{rng.choice(RATE_FNS)}({_matrix(rng, depth - 1)})"
    if r < 0.72:
        v, s = _vector(rng, depth - 1), _scalar(rng, depth - 1)
        op = rng.choice(ARITH)
        return f"({v} {op} {s})" if rng.random() < 0.5 else f"({s} {op} {v})"
    if r < 0.80:
        a, b = _vector(rng, depth - 1), _vector(rng, depth - 1)
        return f"({a} {rng.choice(SET_OPS)} {b})"
    if r < 0.86:
        v = _vector(rng, depth - 1)
        mod = "bool " if rng.random() < 0.5 else ""
        return f"({v} {rng.choice(CMP)} {mod}{_scalar(rng, 0)})"
    if r < 0.88:
        v = _vector(rng, depth - 1)
        return f'label_replace({v}, "dst", "$1", "job", "(.*)")'
    if r < 0.90:
        return f"clamp({_vector(rng, depth - 1)}, 0, 50)"
    if r < 0.96:
        # native-histogram shapes: float-returning probes over the hist
        # metric, hist arithmetic, hist scaling, mixed set ops
        hr = rng.random()
        hsel = 'h0' + ('{job="a"}' if rng.random() < 0.5 else "")
        if hr < 0.4:
            fn = rng.choice(("histogram_count", "histogram_sum",
                             "histogram_avg"))
            return f"{fn}({hsel})"
        if hr < 0.55:
            return f"histogram_quantile(0.5, {hsel})"
        if hr < 0.7:
            return (f"histogram_count(({hsel} "
                    f"{rng.choice(('+', '-'))} ignoring(__name__) h1))")
        if hr < 0.85:
            return f"histogram_sum(({hsel} * {rng.choice((2, 3))}))"
        return f"histogram_count(({hsel} or {_vector(rng, depth - 1)}))"
    return f"-{_vector(rng, depth - 1)}"


@pytest.fixture(scope="module")
def gcorpus(spark):
    rng = random.Random(515151)
    rows = []
    for metric in METRICS:
        counter = metric.endswith("_total")
        for job in JOBS:
            for inst in INSTS:
                v = rng.uniform(1, 10)
                for i in range(26):
                    if counter:
                        v += rng.uniform(0.1, 4)
                        if rng.random() < 0.05:
                            v = rng.uniform(0, 1)  # reset
                    else:
                        v = rng.uniform(-20, 80)
                    rows.append(({"__name__": metric, "job": job,
                                  "inst": inst}, i * 10 * S, round(v, 4)))
    # native-histogram series for the histogram grammar branches: h0 on the
    # same (job, inst) grid, h1 a single-label companion for h+h matching
    for job in JOBS:
        for inst in INSTS:
            for i in range(26):
                c1 = float(rng.randrange(1, 6))
                c2 = float(rng.randrange(0, 4))
                rows.append((
                    {"__name__": "h0", "job": job, "inst": inst}, i * 10 * S,
                    {"hist": (c1 + c2, rng.uniform(0, 20),
                              [(1.0, c1), (2.0, c2), (float("inf"), 0.0)])}))
                rows.append((
                    {"__name__": "h1", "job": job, "inst": inst}, i * 10 * S,
                    {"hist": (c2 + 1, rng.uniform(0, 5),
                              [(1.0, c2), (2.0, 1.0), (float("inf"), 0.0)])}))
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    return PromQLEngine(make_samples(spark, rows), lookback_ms=300_000,
                        deterministic=True)


def _rows(res):
    out = {}
    for r in res.df.collect():
        key = frozenset(dict(r["labels"]).items()) if "labels" in r else ()
        out[key] = r["value"]
    return out


def _same(a: float, b: float) -> bool:
    if math.isnan(a) and math.isnan(b):
        return True
    if math.isinf(a) or math.isinf(b):
        return a == b
    return a == b or abs(a - b) <= 1e-9 * max(abs(a), abs(b))


def test_grammar_fuzz_no_crashes_and_serving_consistency(gcorpus):
    from thanos_parquet_gateway_spark.promql.parser import PromQLSyntaxError
    from thanos_parquet_gateway_spark.promql.compiler import PromQLCompileError

    rng = random.Random(616161)
    failures, evaluated, modeled = [], 0, 0
    for i in range(160):
        q = _vector(rng, rng.randrange(1, 4))
        try:
            inst = _rows(gcorpus.query_instant(q, T))
            # single-point range evaluation must serve identical rows
            rng_res = _rows(gcorpus.query_range(q, T, T, 7 * S))
            evaluated += 1
        except (PromQLSyntaxError, PromQLCompileError):
            modeled += 1  # type/grammar guardrails — fine
            continue
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            # vector-matching cardinality violations are data-dependent
            # PromQL execution errors raised from the plan (raise_error)
            if ("duplicate series" in msg or "many-to-one" in msg
                    or "same labelset" in msg or "overflows int64" in msg):
                modeled += 1
                continue
            failures.append(f"[{i}] {q!r} CRASHED: {type(e).__name__}: "
                            f"{msg[:160]}")
            continue
        if set(inst) != set(rng_res):
            failures.append(
                f"[{i}] {q!r} instant/range labelsets differ: "
                f"{len(inst)} vs {len(rng_res)}")
            continue
        for k, v in inst.items():
            if not _same(v, rng_res[k]):
                failures.append(f"[{i}] {q!r} {dict(k)}: instant {v} != "
                                f"range {rng_res[k]}")
                break
    assert evaluated >= 100, \
        f"only {evaluated} exprs evaluated ({modeled} modeled errors)"
    assert not failures, (f"{len(failures)} failures "
                          f"({evaluated} evaluated):\n"
                          + "\n".join(failures[:10]))
