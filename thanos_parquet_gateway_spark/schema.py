"""Core data model: the long-format ``samples`` table and label utilities.

Reference physical model: twin labels/chunks parquet files per day-block with
one dictionary-encoded column per label name plus a labels-hash column
(reference: schema/schema.go:25-62, convert/convert.go:653-678).  Our
Spark-native redesign (SURVEY.md §1.4) is ONE long-format table:

    samples(series_hash long,        -- xxhash64 of canonical label set
            labels map<string,string>,  -- always contains __name__
            __name__ string,         -- promoted for parquet pushdown
            ts long,                 -- sample timestamp, epoch millis
            value double,
            date string,             -- partition: UTC day (block-per-day model,
                                     --   reference db/db.go:29-31)
            stream long)             -- partition: external-labels hash
                                     --   (reference schema/block.go:37-76)

Missing label ≡ empty string in matchers (reference search/constraint.go:130-138)
— encoded everywhere as coalesce(labels[k], '').
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical column names.
SERIES_HASH = "series_hash"
LABELS = "labels"
NAME = "__name__"
TS = "ts"
VALUE = "value"
DATE = "date"
STREAM = "stream"

LOOKBACK_MS = 5 * 60 * 1000  # PromQL default lookback (reference api/http/query.go:160)

# Prometheus staleness markers are NaNs with a reserved bit pattern
# (0x7ff0000000000002); Spark/Arrow canonicalize NaN payloads, so the bit
# trick is unrepresentable here.  The long format instead encodes a stale
# marker as value IS NULL (ordinary NaN samples stay NaN).  Conversion from
# Prometheus chunks maps staleNaN → NULL at write time.
def stale_marker() -> Column:
    return F.lit(None).cast("double")


def is_stale(value_col: Column | str) -> Column:
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return c.isNull()


def label(labels_col: Column | str, key: str) -> Column:
    """A label value; missing key decays to '' per reference semantics
    (search/constraint.go:130-138)."""
    c = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    return F.coalesce(F.element_at(c, key), F.lit(""))


def canonical_sig(labels_col: Column | str) -> Column:
    """Deterministic string identity of a label set.

    map_entries → array_sort sorts struct<key,value> lexicographically by key;
    to_json yields a canonical serialization.  Plays the role of the
    reference's ``___cf_meta_hash`` label-set hash (schema/schema.go:27,
    convert/tsdb.go:132) but is collision-free and order-independent.
    """
    c = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    return F.to_json(F.array_sort(F.map_entries(c)))


def labels_from_sig(sig_col: Column | str) -> Column:
    """Inverse of :func:`canonical_sig` — rebuild the label map from its
    canonical JSON serialization.  Lets orderable operators (two-phase
    top-k) carry the string ``sig`` through a sort key instead of the
    unorderable ``map`` column."""
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.map_from_entries(
        F.from_json(c, "array<struct<key:string,value:string>>"))


def series_hash(labels_col: Column | str) -> Column:
    """64-bit series identity = xxhash64 of the canonical label serialization
    (same dedup/join role as reference ___cf_meta_hash)."""
    return F.xxhash64(canonical_sig(labels_col))


def drop_labels(labels_col: Column | str, keys: list[str]) -> Column:
    """Remove label names (replica-label drop, reference db/db.go:124-128;
    ``without(...)`` grouping; __name__ drop on arithmetic)."""
    c = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    keys_arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(c, lambda k, _v: ~F.array_contains(keys_arr, k))


def keep_labels(labels_col: Column | str, keys: list[str]) -> Column:
    """Keep only the listed label names (``by(...)`` grouping / on(...) match)."""
    c = F.col(labels_col) if isinstance(labels_col, str) else labels_col
    keys_arr = F.array(*[F.lit(k) for k in keys])
    return F.map_filter(c, lambda k, _v: F.array_contains(keys_arr, k))
