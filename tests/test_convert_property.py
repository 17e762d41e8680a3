"""Property-based conversion invariants (hypothesis) — the analogue of the
reference's gopter properties on the k-way sorted series iterator and the
structural checks on written files (convert/convert_test.go:22-24,109-431):
for ANY input multiset of samples, the converted table must be exactly
deduplicated, per-file sorted, day-partitioned, and content-preserving.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

# heavy seeded-fuzz/property suite: excluded from the default pytest
# run (see pytest.ini); select with -m ""
pytestmark = pytest.mark.slow
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

DAY = 86_400_000

label_sets = st.sampled_from([
    {"__name__": "m0", "job": "a"},
    {"__name__": "m0", "job": "b"},
    {"__name__": "m1", "job": "a"},
    {"__name__": "m1", "job": "a", "extra": "x"},
    {"__name__": "m2"},
])

samples_strategy = st.lists(
    st.tuples(label_sets,
              st.integers(min_value=0, max_value=3 * DAY - 1),
              st.floats(min_value=-100, max_value=100,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=60)


@pytest.mark.parametrize("dummy", [0])  # keep one pytest node for the suite
@given(rows=samples_strategy)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_convert_invariants(spark, tmp_path_factory, rows, dummy):
    from tests.conftest import make_samples
    from thanos_parquet_gateway_spark.convert.convert import (
        convert_samples,
        prepare_samples,
    )

    out = str(tmp_path_factory.mktemp("conv"))
    raw = make_samples(spark, rows)
    manifest = convert_samples(raw, out, max_records_per_file=25)
    table = spark.read.parquet(out)

    # 1. exact dedup on (series_hash, ts); one row per key
    dup = (table.groupBy("series_hash", "ts").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0

    # 2. the key set equals the input's distinct key set
    want_keys = (prepare_samples(raw)
                 .select("series_hash", "ts").distinct().count())
    assert table.count() == want_keys

    # 3. every row landed in its UTC-day partition
    bad_day = (table.withColumn(
        "want_date", F.date_format(F.timestamp_millis(F.col("ts")),
                                   "yyyy-MM-dd"))
        .filter(F.col("date").cast("string") != F.col("want_date")).count())
    assert bad_day == 0

    # 4. rows inside every written file are sorted by
    #    (__name__, series_hash, ts) — the page-ordering contract the
    #    reference asserts on its own files
    for f in glob.glob(f"{out}/stream=*/date=*/*.parquet"):
        t = pq.read_table(f, columns=["__name__", "series_hash", "ts"])
        triples = list(zip(t.column("__name__").to_pylist(),
                           t.column("series_hash").to_pylist(),
                           t.column("ts").to_pylist()))
        assert triples == sorted(triples), f"unsorted rows in {f}"

    # 5. manifest covers exactly the written (stream, date) partitions with
    #    correct row counts
    mrows = {(r["stream"], str(r["date"])): r["n_samples"]
             for r in manifest.collect()}
    # partition-column inference reads stream back as int; the manifest
    # contract is strings
    prows = {}
    for r in table.groupBy("stream", "date").count().collect():
        prows[(str(r["stream"]), str(r["date"]))] = r["count"]
    assert mrows == prows
