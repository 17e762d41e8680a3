"""grouped_topk unit gates: exactness across sub-bucket counts, the
adaptive phase-0 sizing decision (operators/topk.py:_adaptive_buckets),
and the plan shape it buys (one fewer aggregation exchange when fused).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from thanos_parquet_gateway_spark.operators.topk import (
    _PHASE0_BUCKETS,
    _adaptive_buckets,
    grouped_topk,
)


def _mkdf(spark, n=500, groups=7, seed=5):
    rng = random.Random(seed)
    rows = [(f"g{rng.randrange(groups)}", rng.randrange(10_000),
             rng.random()) for _ in range(n)]
    return spark.createDataFrame(rows, "g string, tie int, v double")


def _oracle(rows, k):
    by_g: dict[str, list] = {}
    for g, tie, v in rows:
        by_g.setdefault(g, []).append((v, tie))
    out = set()
    for g, vals in by_g.items():
        for pos, (v, tie) in enumerate(sorted(vals)[:k]):
            out.add((g, pos, v, tie))
    return out


def test_grouped_topk_exact_across_bucket_counts(spark):
    df = _mkdf(spark).repartition(8)
    rows = [tuple(r) for r in df.collect()]
    key = F.struct(F.col("v"), F.col("tie"))
    want = _oracle(rows, 5)
    for buckets in (None, 1, 3, _PHASE0_BUCKETS):
        got = {(r["g"], r["__pos"], r["__x"]["v"], r["__x"]["tie"])
               for r in grouped_topk(df, ["g"], key, 5,
                                     buckets=buckets).collect()}
        assert got == want, f"buckets={buckets}"


def test_adaptive_buckets_fuses_on_tiny_input(spark, sf_dir):
    """A parquet-backed frame whose per-split estimate fits the 4 MiB
    buffer target must pick B=1 (phase 0 fuses away — the r7 sf0.1
    regression fix); in-memory frames carry NO catalog estimate
    (Long.MaxValue) and must fail closed to full sub-bucketing."""
    small = spark.read.parquet(f"{sf_dir}/region.parquet")
    assert _adaptive_buckets(small) == 1
    # projections/filters on top keep the leaf estimate visible
    assert _adaptive_buckets(
        small.filter(F.col("r_regionkey") > 0).select("r_name")) == 1
    # LogicalRDD leaf: stats unknown -> safe bound
    assert _adaptive_buckets(_mkdf(spark, n=100)) == _PHASE0_BUCKETS


def test_adaptive_buckets_scales_with_estimate(spark):
    """Large catalog estimates saturate to the full bound; mid-size ones
    land strictly between (bytes-per-split / 4 MiB, clamped)."""
    par = max(spark.sparkContext.defaultParallelism, 1)
    tiny = _mkdf(spark, n=100)

    class FakeStats:
        def __init__(self, n):
            self._n = n

        def sizeInBytes(self):
            return self._n

    class FakeLeaf:
        def __init__(self, n):
            self._s = FakeStats(n)

        def stats(self):
            return self._s

    class FakeLeaves:
        def __init__(self, sizes):
            self._leaves = [FakeLeaf(s) for s in sizes]

        def size(self):
            return len(self._leaves)

        def apply(self, i):
            return self._leaves[i]

    class FakeDF:
        def __init__(self, sizes, session):
            self.sparkSession = session
            self._sizes = sizes

        @property
        def _jdf(self):
            sizes = self._sizes

            class QE:
                def queryExecution(self):
                    return self

                def analyzed(self):
                    return self

                def collectLeaves(self):
                    return FakeLeaves(sizes)

            return QE()

    sess = tiny.sparkSession
    assert _adaptive_buckets(FakeDF([1024], sess)) == 1
    # per-split = 8 MiB -> 2 buckets
    assert _adaptive_buckets(
        FakeDF([par * (8 << 20)], sess)) == 2
    # 100 TB-scale estimate saturates at the bound
    assert _adaptive_buckets(
        FakeDF([100 * (1 << 40)], sess)) == _PHASE0_BUCKETS


def test_adaptive_buckets_private_api_still_works(spark, sf_dir):
    """Pin the private-API probe itself (operators/topk.py uses
    ``df._jdf.queryExecution().analyzed().collectLeaves()`` +
    ``stats().sizeInBytes()``).  The except-path fallback is SAFE but
    silently disables adaptive fusing; this test exercises the exact
    py4j chain directly so a Spark upgrade that changes any link fails
    LOUDLY here instead of degrading every top-k plan unnoticed."""
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    assert leaves.size() >= 1, "collectLeaves() shape changed"
    est = sum(int(str(leaves.apply(i).stats().sizeInBytes()))
              for i in range(leaves.size()))
    # a parquet scan always carries a finite positive catalog estimate
    assert 0 < est < (1 << 62), f"sizeInBytes() shape changed: {est}"


def test_adaptive_buckets_fails_closed_without_stats(spark):
    """If the JVM stats probe throws, keep the safe full sub-bucketing:
    wrong-but-safe beats unbounded collect_list buffers."""
    class Broken:
        sparkSession = spark

        @property
        def _jdf(self):
            raise RuntimeError("no JVM plan here")

    assert _adaptive_buckets(Broken()) == _PHASE0_BUCKETS


def _agg_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_fused_phase0_compiles_one_fewer_exchange(spark):
    """buckets=1 must compile exactly one fewer hash-partitioning exchange
    than buckets=32 on the same input — the stage the adaptive skip is
    there to elide."""
    df = _mkdf(spark).repartition(8)
    key = F.struct(F.col("v"), F.col("tie"))
    fused = _agg_exchanges(grouped_topk(df, ["g"], key, 5, buckets=1))
    bucketed = _agg_exchanges(grouped_topk(df, ["g"], key, 5, buckets=32))
    assert bucketed == fused + 1, (fused, bucketed)
