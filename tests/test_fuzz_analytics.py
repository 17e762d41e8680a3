"""Tie/duplicate-adversarial DIFFERENTIAL fuzz for the events-analytics
family (round-9 verdict #2).

The PromQL surface has 300 randomized differential cases; the one latent
bug round 9 found (funnel same-timestamp tie, entry_queries.py) lived in
the analytics family, which had none.  This suite generates seeded random
event streams that deliberately contain the hostile shapes real ms-scale
event data has:

  * timestamp COLLISIONS — many events per (user, ts), including
    view+click at the identical millisecond (the round-9 bug class);
  * duplicate event_ids across users;
  * single-event users and users whose events all share one timestamp;
  * events straddling day boundaries (window/cohort bucketing edges).

Each corpus is written as a real ``events.parquet`` and every events_*
registry query runs through the PRODUCTION path — ``__spark_entry__``
``queries()`` on the parquet dir vs its own ``oracle_sql()`` on DuckDB —
so this is the same gate the driver runs, pointed at adversarial data.

25 seeded corpora x 8 analytics shapes = 200 differential cases.
"""

from __future__ import annotations

import math
import os
import random

import pandas as pd
import pytest

# heavy seeded-fuzz/property suite: excluded from the default pytest
# run (see pytest.ini); select with -m ""
pytestmark = pytest.mark.slow

ANALYTICS = [
    "events_tumbling_window",
    "events_sessionize",
    "events_asof_join",
    "events_retention_cohorts",
    "events_funnel_conversion",
    "events_funnel3_steps",
    "events_trending_topk",
    "events_hopping_window",
]

TYPES = ("view", "click", "error", "purchase", "signup")
DAY = 86_400_000
HOUR = 3_600_000
BASE = 1_704_067_200_000  # 2024-01-01 UTC, matches the testdata epoch era

N_CORPORA = int(os.environ.get("FUZZ_N_CORPORA", "25"))


def _gen_corpus(seed: int) -> pd.DataFrame:
    """Random event stream with forced timestamp ties and duplicate ids.

    (user_id, ts, event_id) stays unique — two rows identical in all
    ordering keys have no defined order in EITHER engine, so that shape
    tests nothing.  Everything weaker collides on purpose.
    """
    rng = random.Random(seed)
    rows = []  # (event_id, ts_ms, user_id, event_type, value)
    used = set()  # (user, ts, eid) uniqueness guard

    def add(uid, ts, etype, eid=None):
        if eid is None:
            # small id range => heavy cross-user duplication
            eid = rng.randrange(0, 40)
        while (uid, ts, eid) in used:
            eid += 1
        used.add((uid, ts, eid))
        rows.append((eid, ts, uid, etype, round(rng.uniform(0, 200), 2)))

    n_users = rng.randint(5, 9)
    # a SMALL pool of candidate timestamps forces collisions within and
    # across users; spread over ~5 days incl. exact day boundaries
    ts_pool = sorted(
        rng.choice([
            BASE + rng.randrange(0, 5) * DAY,              # exact midnight
            BASE + rng.randrange(0, 5 * DAY),              # anywhere
            BASE + rng.randrange(0, 5) * DAY + HOUR - 1,   # window edge
        ])
        for _ in range(rng.randint(8, 20)))

    for uid in range(1, n_users + 1):
        style = rng.random()
        if style < 0.15:
            # single-event user
            add(uid, rng.choice(ts_pool), rng.choice(TYPES))
            continue
        if style < 0.30:
            # all events at ONE timestamp (total tie pile-up)
            ts = rng.choice(ts_pool)
            for _ in range(rng.randint(2, 5)):
                add(uid, ts, rng.choice(TYPES))
            continue
        for _ in range(rng.randint(3, 12)):
            add(uid, rng.choice(ts_pool), rng.choice(TYPES))
        # forced round-9 bug shape: view and click at the SAME ms, plus a
        # later click inside / outside the 1h funnel window
        if rng.random() < 0.7:
            t0 = rng.choice(ts_pool)
            add(uid, t0, "view")
            add(uid, t0, "click")
            later = t0 + (rng.randrange(1, HOUR) if rng.random() < 0.5
                          else HOUR + rng.randrange(1, DAY))
            add(uid, later, "click")
            # third funnel step: purchase at the click's same ms, exactly
            # on the 1d window edge, or past it (events_funnel3_steps
            # boundary semantics: strictly after, inclusive end)
            r = rng.random()
            if r < 0.3:
                add(uid, later, "purchase")          # same-ms tie
            elif r < 0.6:
                add(uid, later + DAY, "purchase")     # exactly on the edge
            elif r < 0.8:
                add(uid, later + DAY + 1, "purchase")  # one ms past it
            else:
                add(uid, later + rng.randrange(1, DAY), "purchase")

    df = pd.DataFrame(rows, columns=["event_id", "ts_ms", "user_id",
                                     "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts_ms"], unit="ms").astype("datetime64[us]")
    df["props"] = '{"k": 1}'
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """Write N_CORPORA adversarial events.parquet dirs; return their paths."""
    root = tmp_path_factory.mktemp("analytics_fuzz")
    dirs = []
    for i in range(N_CORPORA):
        d = root / f"c{i:02d}"
        d.mkdir()
        _gen_corpus(7_000 + i).to_parquet(d / "events.parquet", index=False)
        dirs.append(str(d))
    return dirs


def _norm(cols, rows):
    """Sort columns by name then rows — mirrors tools/diffcheck.py and the
    driver's compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def _cells_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-12 * max(abs(a), abs(b))
    return a == b


@pytest.mark.parametrize("name", ANALYTICS)
def test_analytics_differential(spark, corpora, name):
    import duckdb

    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles
    for sf_dir in corpora:
        sdf = qs[name](spark, sf_dir)
        scols, srows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
        res = con.execute(oracles[name])
        ocols, orows = _norm([d[0] for d in res.description], res.fetchall())
        con.close()
        assert scols == ocols, f"{name} @ {sf_dir}: columns {scols} != {ocols}"
        assert len(srows) == len(orows), \
            f"{name} @ {sf_dir}: {len(srows)} rows != oracle {len(orows)}"
        for sr, orow in zip(srows, orows):
            assert all(_cells_eq(a, b) for a, b in zip(sr, orow)), \
                f"{name} @ {sf_dir}: row {sr} != oracle {orow}"


def test_funnel_same_ts_tie_repro(spark, tmp_path):
    """The exact round-9 judge repro: view@1000 and click@1000 share a
    millisecond; a click@2000 is in-window.  The strict-inequality oracle
    counts it converted; the pre-fix ROWS-frame plan returned false
    (the same-ts click became the min and failed the > guard, masking the
    later click)."""
    import __spark_entry__ as entry

    df = pd.DataFrame(
        [(1, BASE + 1000, 7, "view", 1.0, "{}"),
         (2, BASE + 1000, 7, "click", 1.0, "{}"),
         (3, BASE + 2000, 7, "click", 1.0, "{}")],
        columns=["event_id", "ts_ms", "user_id", "event_type", "value",
                 "props"])
    df["ts"] = pd.to_datetime(df["ts_ms"], unit="ms").astype("datetime64[us]")
    d = tmp_path / "repro"
    d.mkdir()
    df[["event_id", "ts", "user_id", "event_type", "value",
        "props"]].to_parquet(d / "events.parquet", index=False)

    out = entry.queries()["events_funnel_conversion"](spark, str(d)).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["views"] == 1.0
    assert row["conversions"] == 1.0, \
        "same-ts click must not mask the later in-window click"
    assert row["conversion_rate"] == 1.0
