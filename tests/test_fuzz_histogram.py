"""Differential fuzz for classic (le-label) histogram_quantile against an
independent Python oracle implementing the published Prometheus
bucketQuantile algorithm (promql/quantile.go: monotonicity enforcement,
+Inf-cap requirement, rank interpolation, negative-bound lower edges).

Random cumulative-bucket corpora — including deliberately broken ones
(missing +Inf, single bucket, zero observations, non-monotonic counts) —
must produce identical quantiles from the Spark engine and the oracle.
"""

from __future__ import annotations

import math
import random

import pytest

from tests.conftest import make_samples

INF = float("inf")


def bucket_quantile(q: float, buckets: list[tuple[float, float]]) -> float:
    """Reimplementation of Prometheus bucketQuantile (quantile.go) from its
    published semantics — deliberately written independently of the engine's
    Spark expression so a shared bias can't hide."""
    if math.isnan(q):
        return float("nan")
    if q < 0:
        return -INF
    if q > 1:
        return INF
    buckets = sorted(buckets, key=lambda b: b[0])
    if len(buckets) < 2:
        return float("nan")
    if buckets[-1][0] != INF:
        return float("nan")
    # ensureMonotonic: running max over cumulative counts
    mono = []
    run = 0.0
    for le, c in buckets:
        run = max(run, c)
        mono.append((le, run))
    observations = mono[-1][1]
    if observations == 0:
        return float("nan")
    rank = q * observations
    b = next(i for i, (_, c) in enumerate(mono) if c >= rank)
    if b == len(mono) - 1:
        return mono[-2][0]
    if b == 0 and mono[0][0] <= 0:
        return mono[0][0]
    bucket_start = 0.0 if b == 0 else mono[b - 1][0]
    bucket_end = mono[b][0]
    count = mono[b][1] - (mono[b - 1][1] if b > 0 else 0.0)
    rank -= mono[b - 1][1] if b > 0 else 0.0
    if count == 0:
        # only reachable as rank=0 on an empty first bucket; Go's
        # bucketQuantile computes 0/0 = NaN there
        return float("nan")
    return bucket_start + (bucket_end - bucket_start) * (rank / count)


BOUND_POOL = [0.005, 0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0]
T0 = 100_000


def _gen_histograms(rng: random.Random, n: int):
    """n random cumulative histograms keyed by job label; ~15% are broken
    in an interesting way."""
    hists = {}
    for i in range(n):
        job = f"j{i}"
        k = rng.randrange(2, 7)
        bounds = sorted(rng.sample(BOUND_POOL, k))
        if rng.random() < 0.3:
            bounds = [-rng.choice([0.5, 1.0])] + bounds  # negative lower edge
        cum = []
        run = 0.0
        for _ in bounds:
            run += rng.choice([0, 0, 1, 2, 5, 10])
            cum.append(run)
        buckets = list(zip(bounds, cum))
        kind = rng.random()
        if kind < 0.05:
            # non-monotonic glitch (scrape-race artifact upstream repairs)
            j = rng.randrange(len(buckets))
            buckets[j] = (buckets[j][0], buckets[j][1] + rng.choice([1, 3]))
            buckets.append((INF, run))
        elif kind < 0.12:
            pass  # missing +Inf cap → NaN
        elif kind < 0.17:
            buckets = [(INF, run + rng.choice([0, 2]))]  # single bucket → NaN
        else:
            buckets.append((INF, run + rng.choice([0.0, 0.0, 3.0])))
        hists[job] = buckets
    return hists


@pytest.fixture(scope="module")
def hist_corpus(spark):
    rng = random.Random(909090)
    hists = _gen_histograms(rng, 40)
    rows = []
    for job, buckets in hists.items():
        for le, c in buckets:
            le_str = "+Inf" if le == INF else repr(le)
            rows.append(({"__name__": "req_bucket", "job": job,
                          "le": le_str}, T0, c))
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    eng = PromQLEngine(make_samples(spark, rows), lookback_ms=300_000,
                       deterministic=True)
    return eng, hists


def _close(a, b):
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    if math.isinf(a) or math.isinf(b):
        return a == b
    return abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1e-30)


def test_histogram_quantile_differential(hist_corpus):
    eng, hists = hist_corpus
    failures = []
    for q in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0, float("nan")):
        q_expr = "(0/0)" if math.isnan(q) else str(q)
        res = eng.query_instant(f"histogram_quantile({q_expr}, req_bucket)",
                                T0 + 1000)
        got = {dict(r["labels"])["job"]: r["value"]
               for r in res.df.collect()}
        for job, buckets in hists.items():
            want = bucket_quantile(q, buckets)
            g = got.get(job)
            if g is None:
                # engine dropped the series entirely — only OK if the oracle
                # can't produce a value either? upstream emits NaN rows, so
                # a missing row is a divergence
                failures.append(f"phi={q} {job}: missing (want {want})")
            elif not _close(g, want):
                failures.append(f"phi={q} {job}: got {g}, want {want} "
                                f"(buckets {buckets})")
    assert not failures, (f"{len(failures)} divergences:\n"
                          + "\n".join(failures[:20]))
