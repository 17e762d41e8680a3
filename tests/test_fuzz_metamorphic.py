"""Randomized differential/metamorphic checks — the analogue of the
reference's promqlsmith fuzzing (db/db_test.go:1129-1205): random queries
over a random corpus, verified via algebraic identities that PromQL
semantics guarantee, evaluated on the deterministic engine.
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


def _vec(result):
    return {frozenset(dict(r["labels"]).items()): r["value"]
            for r in result.df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    """Random-but-seeded corpus: 3 metrics × jobs × instances, 20 samples
    each at 10s spacing, values with resets and NaN-free."""
    rng = random.Random(42)
    rows = []
    for metric in ("m0", "m1", "m2"):
        for job in ("a", "b"):
            for inst in ("1", "2", "3"):
                v = 0.0
                for i in range(20):
                    v = rng.uniform(0, 100) if rng.random() < 0.1 else v + rng.uniform(0, 5)
                    rows.append(({"__name__": metric, "job": job, "inst": inst},
                                 i * 10 * S, round(v, 6)))
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    return PromQLEngine(make_samples(spark, rows), lookback_ms=300_000,
                        deterministic=True)


SELECTORS = ['m0', 'm1{job="a"}', 'm2{inst=~"[12]"}', 'm0{job!="b"}',
             'm1{inst!~"3"}']
T_EVAL = 195 * S


def test_sum_decomposes_by_label(corpus):
    """sum(x) == sum(sum by (job) (x)) — aggregation tree invariance."""
    for sel in SELECTORS:
        total = _vec(corpus.query_instant(f"sum({sel})", T_EVAL))
        nested = _vec(corpus.query_instant(f"sum(sum by (job) ({sel}))", T_EVAL))
        assert set(total) == set(nested)
        for k in total:
            assert total[k] == pytest.approx(nested[k], rel=1e-12)


def test_count_equals_bool_sum(corpus):
    """count(x) == sum(x >= bool -Inf) for NaN-free data."""
    for sel in SELECTORS:
        cnt = _vec(corpus.query_instant(f"count({sel})", T_EVAL))
        bsum = _vec(corpus.query_instant(f"sum({sel} >= bool -Inf)", T_EVAL))
        assert cnt == bsum


def test_minmax_envelope(corpus):
    """min(x) <= avg(x) <= max(x) per group."""
    for sel in SELECTORS:
        mn = _vec(corpus.query_instant(f"min by (job) ({sel})", T_EVAL))
        av = _vec(corpus.query_instant(f"avg by (job) ({sel})", T_EVAL))
        mx = _vec(corpus.query_instant(f"max by (job) ({sel})", T_EVAL))
        for k in av:
            assert mn[k] - 1e-9 <= av[k] <= mx[k] + 1e-9


def test_topk_is_prefix_of_sort_desc(corpus):
    """topk(k, x) values == first k values of sort_desc(x)."""
    for sel in SELECTORS:
        top = sorted(_vec(corpus.query_instant(f"topk(3, {sel})", T_EVAL)).values(),
                     reverse=True)
        everything = sorted(_vec(corpus.query_instant(sel, T_EVAL)).values(),
                            reverse=True)
        assert top == everything[:3]


def test_arithmetic_identity(corpus):
    """(x * 2) / 2 == x (exact: power-of-two scaling)."""
    for sel in SELECTORS:
        base = _vec(corpus.query_instant(sel, T_EVAL))
        scaled = _vec(corpus.query_instant(f"({sel} * 2) / 2", T_EVAL))
        # arithmetic drops __name__
        base_nameless = {frozenset(kv for kv in k if kv[0] != "__name__"): v
                         for k, v in base.items()}
        assert base_nameless == scaled


def test_set_op_partition(corpus):
    """x == (x and y) ∪ (x unless y) — and/unless partition the lhs."""
    x, y = 'm0{job="a"}', 'm1{inst="1"}'
    base = _vec(corpus.query_instant(x, T_EVAL))
    a = _vec(corpus.query_instant(f"{x} and on(inst) {y}", T_EVAL))
    u = _vec(corpus.query_instant(f"{x} unless on(inst) {y}", T_EVAL))
    assert set(a) | set(u) == set(base)
    assert not (set(a) & set(u))


def test_instant_matches_range_endpoint(corpus):
    """Range query at step==end point equals the instant query there."""
    for sel in SELECTORS:
        inst = _vec(corpus.query_instant(f"sum by (job) ({sel})", T_EVAL))
        rng_df = corpus.query_range(f"sum by (job) ({sel})",
                                    T_EVAL - 60 * S, T_EVAL, 30 * S).df
        endpoint = {frozenset(dict(r["labels"]).items()): r["value"]
                    for r in rng_df.collect() if r["t"] == T_EVAL}
        assert inst == endpoint


def test_rate_nonnegative_and_scales(corpus):
    """rate >= 0 on counter-like data; increase == rate * range_seconds."""
    r = _vec(corpus.query_instant("rate(m0[3m])", T_EVAL))
    inc = _vec(corpus.query_instant("increase(m0[3m])", T_EVAL))
    for k, v in r.items():
        assert v >= 0
        assert inc[k] == pytest.approx(v * 180.0, rel=1e-9)


def test_quantile_bounds(corpus):
    """quantile(0) == min, quantile(1) == max."""
    q0 = _vec(corpus.query_instant("quantile by (job) (0, m1)", T_EVAL))
    q1 = _vec(corpus.query_instant("quantile by (job) (1, m1)", T_EVAL))
    mn = _vec(corpus.query_instant("min by (job) (m1)", T_EVAL))
    mx = _vec(corpus.query_instant("max by (job) (m1)", T_EVAL))
    for k in q0:
        assert q0[k] == pytest.approx(mn[k], rel=1e-12)
        assert q1[k] == pytest.approx(mx[k], rel=1e-12)


def test_absent_complementarity(corpus):
    """absent(x) empty iff x non-empty."""
    present = _vec(corpus.query_instant("m0", T_EVAL))
    ab = _vec(corpus.query_instant("absent(m0)", T_EVAL))
    assert present and not ab
    ab2 = _vec(corpus.query_instant('absent(m0{job="zzz"})', T_EVAL))
    assert len(ab2) == 1
