"""Registry window invariants: the order exposed to the driver's first-50
CORRECTNESS gate must be the mechanical oldest-green rotation (sorted by the
round of each query's last fully-green driver row, never-proven first), not a
hand-curated list — round-3 advice."""

from thanos_parquet_gateway_spark.plans import entry_queries as eq


# entries with NO DuckDB oracle by construction (the driver records a
# rows-only check for these; everything else must stay oracle-gated)
ROWS_ONLY = {
    # HLL estimates: register max-folds no independent SQL engine replicates
    "events_hll_distinct_users",
}


def test_queries_and_oracles_aligned():
    rows_only = set(eq.QUERIES) - set(eq.ORACLES)
    assert rows_only == ROWS_ONLY, (
        "every registry query needs a DuckDB oracle unless it is in the "
        f"documented rows-only set; undocumented: {rows_only - ROWS_ONLY}, "
        f"stale: {ROWS_ONLY - rows_only}")
    # oracle iteration order mirrors the rotation order of QUERIES
    assert list(eq.ORACLES) == [n for n in eq.QUERIES if n in eq.ORACLES]


def test_window_order_is_oldest_green_first():
    last = eq._last_green_rounds()
    rounds = [last.get(n, 0) for n in eq.QUERIES]
    assert rounds == sorted(rounds), (
        "registry must be sorted by last-green round ascending")


def test_last_green_rounds_parses_artifacts():
    last = eq._last_green_rounds()
    # every green row ever recorded belongs to a registered query
    unknown = set(last) - set(eq.QUERIES)
    assert not unknown, f"green rows for unregistered queries: {unknown}"
    # at least the r1 window's worth of queries have some green row
    assert len(last) >= 48
