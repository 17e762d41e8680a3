"""Deterministic sampling operators for training-data curation
(SURVEY.md §7.1 M8 companion: the selection step between dedup/quality
filtering and training).

All sampling is hash-based, never ``rand()``: a sample defined by
``hash(key) < threshold`` is reproducible across runs/retries/clusters,
stable under repartitioning, and — because the hash rides on a per-row key —
embarrassingly parallel with zero coordination.  ``rand()``-based sampling
breaks all of that (non-deterministic re-execution under task retry).

Two hash families, same structure (same dual-family pattern as
operators/dedup.py):
- ``xxhash`` (default, the 100 TB path): xxhash64 long, whole-stage codegen,
  no string allocation;
- ``md5`` (oracle mode): lowercase-hex md5 compared against a 32-digit hex
  threshold string — lexicographic compare on lowercase hex equals numeric
  compare, and an independent SQL engine (DuckDB) reproduces it
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MD5_SPACE = 16 ** 32
_LONG_SPACE = float(1 << 63)


def md5_threshold(rate: float) -> str:
    """32-digit lowercase-hex threshold t such that
    P[md5_hex < t] == rate (exactly, up to 1/16^32)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * _MD5_SPACE), _MD5_SPACE - 1), "032x")


def _hash_col(key: Column, seed: int, hash_family: str) -> Column:
    if hash_family == "md5":
        return F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.xxhash64(F.lit(seed), key)


def _keep(key: Column, rate: float, seed: int, hash_family: str) -> Column:
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    if hash_family == "md5":
        return _hash_col(key, seed, "md5") < F.lit(md5_threshold(rate))
    # shift to non-negative so the threshold arithmetic is exact
    h = F.shiftrightunsigned(_hash_col(key, seed, "xxhash"), 1)
    return h < F.lit(int(rate * _LONG_SPACE))


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                seed: int = 0, hash_family: str = "xxhash") -> DataFrame:
    """Bernoulli sample at ``rate``: keep rows whose keyed hash falls under
    the rate threshold.  Pure map-side filter — no shuffle, no state; at any
    scale the plan is scan → filter."""
    return df.filter(_keep(F.col(key_col), rate, seed, hash_family))


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, float],
                      default_rate: float = 1.0, key_col: str = "doc_id",
                      seed: int = 0, hash_family: str = "xxhash") -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. downsample dominant languages,
    keep the tail): ``rates`` maps stratum value → keep rate; anything else
    keeps ``default_rate``.  Still a single map-side filter — the rate choice
    is a CASE on the stratum column, not a join.  A NULL stratum never
    equals any configured value (SQL three-valued logic), so it falls in the
    ``others`` branch and keeps ``default_rate`` — the ``isin`` NULL is
    coalesced to true rather than silently rejecting the row."""
    cond = None
    for value, rate in sorted(rates.items()):
        k = _keep(F.col(key_col), rate, seed, hash_family)
        branch = (F.col(strata_col) == value) & k
        cond = branch if cond is None else cond | branch
    others = (F.coalesce(~F.col(strata_col).isin(*rates.keys()), F.lit(True))
              if rates else F.lit(True))
    cond = (cond | (others & _keep(F.col(key_col), default_rate, seed,
                                   hash_family))
            if cond is not None
            else _keep(F.col(key_col), default_rate, seed, hash_family))
    return df.filter(cond)


def hash_topk_sample(df: DataFrame, k: int, key_col: str = "doc_id",
                     seed: int = 0, hash_family: str = "xxhash") -> DataFrame:
    """Exactly-k uniform sample without replacement: rank every row by its
    keyed hash and keep the k smallest.  Plans as TakeOrderedAndProject — a
    distributed top-k (per-partition heads, tiny driver merge), NOT a global
    sort; this is the scale-safe way to get a fixed-size sample."""
    h = _hash_col(F.col(key_col), seed, hash_family)
    return (df.withColumn("__h", h)
            .orderBy("__h", key_col)
            .limit(k)
            .drop("__h"))


def mix_corpus(docs: DataFrame, budgets: dict[str, int], *,
               source_col: str = "source", id_col: str = "doc_id",
               text_col: str = "text", seed: int = 0,
               hash_family: str = "xxhash") -> DataFrame:
    """Deterministic corpus mixing by per-source TOKEN budget — the
    selection step that turns per-domain sampling weights into a concrete
    training mixture (the data-mixture recipe step of public pipelines like
    The Pile / Dolma).  Within each source, documents are ranked by keyed
    hash (reproducible shuffle order) and taken greedily until the source's
    cumulative whitespace-token count reaches its budget; the first
    document that crosses the budget is still INCLUDED (budgets are met,
    never silently undershot), and sources missing from ``budgets``
    contribute nothing.

    Scale shape (100 TB): one shuffle keyed on the source column; the
    cumulative sum is a per-source window over the hash order, so each
    source's rows land in one partition group — with many sources this
    parallelizes across them, and a pathological single-source corpus
    degrades to that source's partition (cap budgets or pre-split by a
    salted source key if one source dominates).

    Returns (doc_id, source, n_tokens, cum_tokens) for the selected rows.
    """
    from pyspark.sql import Window

    if not budgets:
        raise ValueError("mix_corpus: budgets must be non-empty")
    tokens = F.size(F.split(F.trim(F.regexp_replace(
        F.col(text_col), r"\s+", " ")), " "))
    budget_map = F.create_map(*[F.lit(x) for kv in sorted(budgets.items())
                                for x in kv])
    h = _hash_col(F.col(id_col), seed, hash_family)
    w = (Window.partitionBy(source_col)
         .orderBy(h.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (docs.withColumn("__budget", budget_map[F.col(source_col)])
         .filter(F.col("__budget").isNotNull())
         .withColumn("n_tokens", tokens.cast("long"))
         .withColumn("cum_tokens", F.sum("n_tokens").over(w)))
    keep = (F.col("cum_tokens") - F.col("n_tokens")) < F.col("__budget")
    return (d.filter(keep)
            .select(F.col(id_col).alias("doc_id"),
                    F.col(source_col).alias("source"),
                    "n_tokens", "cum_tokens"))


def split_dataset(df: DataFrame, splits: dict[str, float],
                  key_col: str = "doc_id", seed: int = 0,
                  hash_family: str = "xxhash") -> DataFrame:
    """Deterministic train/validation/test partitioning: the keyed hash is
    mapped to [0, 1) and each row labeled with the split whose cumulative
    fraction interval contains it.  Every row lands in exactly one split
    (fractions must sum to 1 within 1e-9); membership depends only on
    (key, seed), so re-runs, shard order, and cluster size never move a
    document between splits — the property training pipelines need to keep
    eval sets uncontaminated across dataset versions.

    Pure map-side CASE on the hash — no shuffle at any scale.  With
    ``hash_family='md5'`` an independent SQL oracle replicates the
    assignment exactly.  Returns the input plus a ``split`` column.
    """
    if not splits:
        raise ValueError("split_dataset: splits must be non-empty")
    if any(f < 0 for f in splits.values()):
        raise ValueError("split_dataset: fractions must be >= 0")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split_dataset: fractions sum to {total}, want 1")
    key = F.col(key_col)
    names = list(splits)
    # strictly-increasing cumulative upper bounds; the last split takes the
    # remainder so rounding never drops a row
    cum, bounds = 0.0, []
    for n in names[:-1]:
        cum += splits[n]
        bounds.append((n, cum))
    if hash_family == "md5":
        h = _hash_col(key, seed, "md5")
        expr = F.lit(names[-1])
        for n, b in reversed(bounds):
            expr = F.when(h < F.lit(md5_threshold(b)), F.lit(n)) \
                    .otherwise(expr)
    else:
        h = F.shiftrightunsigned(_hash_col(key, seed, "xxhash"), 1)
        expr = F.lit(names[-1])
        for n, b in reversed(bounds):
            expr = F.when(h < F.lit(int(b * _LONG_SPACE)), F.lit(n)) \
                    .otherwise(expr)
    return df.withColumn("split", expr)
