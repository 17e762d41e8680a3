"""Distributed two-phase grouped top-k (shared by similarity rankers and the
PromQL ``topk``/``bottomk``/``limitk`` aggregators).

Why not ``Window.partitionBy(group).orderBy(...)`` + ``row_number``: a window
ranking funnels EVERY row of a group into ONE reducer.  For PromQL
``topk(10, metric)`` over a 10M-series metric that is the whole series set
crossing one partition per step (the reference pushes 1.5M series through
Select with no single-partition stage — db/db_bench_test.go:143-307); for a
similarity ranker it is the whole corpus squeezing through one task per
query.  Here instead:

- phase 0 pre-cuts inside each scanning partition at sub-bucket grain:
  ``groupBy(*group, spark_partition_id(), xxhash64(key) % B)`` bounds every
  ``collect_list`` buffer — and every row crossing the first shuffle — to
  ~1/B of an input split (Spark has no bounded-heap *aggregate* function;
  higher-order ``aggregate`` folds only run over already-collected arrays,
  so deterministic sub-bucketing + per-bucket cut is the built-in way to cap
  the buffer; a global top-k element is by construction inside the top-k of
  whichever bucket it hashes into).  The per-bucket rank is a codegen'd
  ``array_sort`` + ``slice(…, k)``.
- phase 1 merges the ≤ B × k pre-cut survivors of each scanning partition
  back to one ≤ k list per (group, partition): parallelism stays at
  groups × partitions, buffers at B × k.
- phase 2 merges survivors: at most partitions × k rows per group reach the
  final ``groupBy(*group)`` — constant in input size.

The sort key is an ascending struct; callers encode their order (descending,
NaN placement, NULL placement, tie-breaks) as leading discriminator fields so
the two-phase result is bit-identical to the window ranking an independent
SQL oracle computes.

``k`` may be an int or a per-row Column (PromQL's per-step scalar parameter)
— it must be constant within each group; side-effecting guards in the k
expression (``raise_error`` on int64 overflow) still evaluate per input row,
exactly as they did under the window formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: max sub-buckets per scanning partition in phase 0 — caps any single
#: ``collect_list`` buffer (and any single shuffled row) at ~1/B of an
#: input split.  32 matches the local test parallelism; at cluster scale
#: the bound is maxPartitionBytes/B ≈ 4 MB of key structs per buffer.
_PHASE0_BUCKETS = 32

#: phase-0 buffer target: if Catalyst's size estimate says one input split
#: already fits in this, sub-bucketing is pure overhead (an extra shuffle
#: stage over tiny local groups — the r7 sf0.1 regression) and is skipped.
_TARGET_BUFFER_BYTES = 4 << 20


def _adaptive_buckets(df: DataFrame) -> int:
    """Size phase-0 sub-bucketing from the LEAF relations' catalog
    statistics (driver-side, no job, and — unlike probing
    ``optimizedPlan().stats()`` — no extra Catalyst optimization run per
    top-k compile).  Summing raw scan sizes over-estimates the aggregated
    input, which errs toward MORE sub-bucketing: the safe direction.
    Returns 1 (the extra aggregation stage fuses away) when an input split
    is estimated to fit the target buffer, scaling up to
    ``_PHASE0_BUCKETS`` as per-split bytes grow — at 100 TB the estimate
    saturates and full sub-bucketing is always on.  Estimation errors only
    trade shuffle-stage overhead against buffer size; the result set is
    exact either way."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        est = sum(int(str(leaves.apply(i).stats().sizeInBytes()))
                  for i in range(leaves.size()))
        par = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    except Exception:
        return _PHASE0_BUCKETS  # stats unavailable: keep the safe bound
    per_split = est // par
    return max(1, min(_PHASE0_BUCKETS,
                      -(-per_split // _TARGET_BUFFER_BYTES)))


def grouped_topk(df: DataFrame, group_cols: list[str], key: Column,
                 k: int | Column, buckets: int | None = None) -> DataFrame:
    """Return ``group_cols + (__pos, __x)`` where ``__x`` iterates the first
    ``k`` values of ``key`` (an orderable struct) in ascending order and
    ``__pos`` is the 0-based rank.  ``k <= 0`` yields no rows for the group.

    ``buckets`` overrides the adaptive phase-0 sub-bucket count (tests);
    ``buckets == 1`` fuses phase 0 into phase 1 — one fewer aggregation
    stage, buffer bounded by a whole input split instead of 1/B of one.
    """
    kcol = (F.lit(int(k)) if isinstance(k, int) else k).cast("long")
    staged = df.select("*", key.alias("__k"), kcol.alias("__kk"))
    n_buckets = _adaptive_buckets(df) if buckets is None else int(buckets)

    def _cut(arr: Column, kk: Column) -> Column:
        # slice() needs an int length; clamp to [0, size] first so an int64
        # k (PromQL allows up to 2^63-1) can't overflow the int cast.
        n = F.least(F.greatest(kk, F.lit(0)), F.size(arr).cast("long"))
        return F.slice(arr, 1, n.cast("int"))

    # phase 0: deterministic sub-buckets (xxhash64 of the full sort key, so
    # retries re-bucket identically) pre-cut to k before anything big is
    # collected or shuffled.  Correctness: every row lands in exactly one
    # bucket, and a global top-k element is always within the top-k of its
    # own bucket, so the union of per-bucket cuts is a superset of the
    # (group, partition) top-k that phase 1 extracts.  With one bucket the
    # stage is an exact no-op, so it is fused into phase 1 (adaptive skip).
    # Each phase's cut is FUSED into its .agg() result expressions (the
    # post-agg projection computed on the agg outputs inside one plan op):
    # a separate .select() per phase is a JVM Dataset op with a full eager
    # re-analysis of the accumulated plan — pure per-query compile latency.
    # Identical aggregate instances (the collect_list under both the cut
    # and the size clamp) are deduplicated by the physical planner.
    if n_buckets > 1:
        pre = (staged
               .groupBy(*group_cols, F.spark_partition_id().alias("__pid"),
                        F.pmod(F.xxhash64("__k"),
                               F.lit(n_buckets)).alias("__b"))
               .agg(_cut(F.array_sort(F.collect_list("__k")),
                         F.first("__kk")).alias("__t"),
                    F.first("__kk").alias("__kk")))
        partial = (pre
                   .groupBy(*group_cols, "__pid")
                   .agg(_cut(F.array_sort(F.flatten(F.collect_list("__t"))),
                             F.first("__kk")).alias("__t"),
                        F.first("__kk").alias("__kk")))
    else:
        partial = (staged
                   .groupBy(*group_cols,
                            F.spark_partition_id().alias("__pid"))
                   .agg(_cut(F.array_sort(F.collect_list("__k")),
                             F.first("__kk")).alias("__t"),
                        F.first("__kk").alias("__kk")))
    merged = (partial
              .groupBy(*group_cols)
              .agg(_cut(F.array_sort(F.flatten(F.collect_list("__t"))),
                        F.first("__kk")).alias("__t")))
    return merged.select(*group_cols,
                         F.posexplode("__t").alias("__pos", "__x"))
