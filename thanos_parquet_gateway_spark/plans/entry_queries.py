"""Driver-contract query registry: every operator from SURVEY.md §2 claimed
as done has an entry here (Spark callable) plus a DuckDB oracle (ANSI SQL).

Oracle-parity rules (see functions/folds.py):
- float aggregations are order-stable sequential folds on BOTH sides
  (Spark aggregate() over sorted arrays ≡ DuckDB list_reduce over ordered
  list()), or exact integer/decimal math cast to double at the end;
- every computed column is aliased identically on both sides;
- timestamps are epoch-ms BIGINT everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from thanos_parquet_gateway_spark.operators import (
    dedup,
    sampling,
    similarity,
    sketches,
    text,
)
from thanos_parquet_gateway_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    media_metadata_stats,
    resize_media,
    sample_frames,
)
from thanos_parquet_gateway_spark.promql.engine import PromQLEngine
from thanos_parquet_gateway_spark.sources.tables import (
    load_table,
    samples_from_events,
    spread_small_scan,
)

DAY = 86_400_000
LOOKBACK = 7 * DAY
T = 1706486400000          # 2024-01-29T00:00:00Z — instant-query eval time
R_START = 1704672000000    # 2024-01-08
R_END = T
STEP = DAY

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

# DuckDB view of the samples model (must mirror sources.samples_from_events;
# canonical sig order: __name__ < shard < user)
_SAMPLES = """
samples AS (
    SELECT event_type AS name,
           CAST(user_id % 8 AS VARCHAR) AS shard,
           CAST(user_id AS VARCHAR) AS "user",
           epoch_ms(ts) AS ts,
           value
    FROM events
)"""

_GRID = f"grid AS (SELECT unnest(generate_series({R_START}, {R_END}, {STEP})) AS t)"

# last sample per series within lookback at T (ties: ts desc, value desc —
# mirrors the engine's max(struct(ts, value)))
_LAST = f"""
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM samples
    WHERE name = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
)"""


def _ksum(lst: str) -> str:
    """DuckDB Kahan-compensated sequential fold over an ordered DOUBLE list
    — bit-for-bit the same step order and compensation branches as
    functions/folds.fold_sum (and the sum part of fold_avg), so the oracles
    stay exact now that the engine folds are compensated.  Accumulator is a
    [sum, comp] list pair: struct-typed lambdas chained through
    list_transform mis-evaluate in DuckDB 1.0."""
    z = "CAST(0.0 AS DOUBLE)"
    acc = (
        f"list_reduce(list_prepend([{z}, {z}], "
        f"list_transform({lst}, v -> [CAST(v AS DOUBLE), {z}])), "
        f"(a, x) -> CASE WHEN isinf(a[1] + x[1]) THEN [a[1] + x[1], {z}] "
        "WHEN abs(a[1]) >= abs(x[1]) THEN "
        "[a[1] + x[1], a[2] + ((a[1] - (a[1] + x[1])) + x[1])] "
        "ELSE [a[1] + x[1], a[2] + ((x[1] - (a[1] + x[1])) + a[1])] END)")
    return f"(({acc})[1] + ({acc})[2])"


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _docs(spark, sf_dir):
    """documents with the small-scan spread: the text operators are
    CPU-bound per-row maps (or explode+agg chains whose map side carries
    the heavy per-row work), and the local single-split parquet would run
    them in ONE task; at 100 TB the spread is a no-op (see
    sources.tables.spread_small_scan)."""
    return spread_small_scan(load_table(spark, sf_dir, "documents"))


def _engine(spark: SparkSession, sf_dir: str, lookback_ms: int = LOOKBACK) -> PromQLEngine:
    return PromQLEngine(samples_from_events(spark, sf_dir),
                        lookback_ms=lookback_ms, deterministic=True)


def _lbl(col: str):
    return F.element_at("labels", col)


# =====================================================================
# PromQL layer (SURVEY.md §2.C) — flagship custom operators
# =====================================================================

@q("promql_instant_vector", f"""
WITH {_SAMPLES}, {_LAST}
SELECT "user", shard, value FROM last WHERE rn = 1
""")
def promql_instant_vector(spark, sf_dir):
    """Vector selector + 5m-style lookback (A5/A11; db_test.go:325-341)."""
    r = _engine(spark, sf_dir).query_instant("click", T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_instant_regex", f"""
WITH {_SAMPLES},
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM samples
    WHERE name = 'click' AND regexp_matches("user", '^(?:1.*)$')
      AND shard <> '3' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT "user", shard, value FROM last WHERE rn = 1
""")
def promql_instant_regex(spark, sf_dir):
    """Regex + negative matchers w/ pushdown (A6/A7; constraint.go:287-457)."""
    r = _engine(spark, sf_dir).query_instant('click{user=~"1.*", shard!="3"}', T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_sum_by", f"""
WITH {_SAMPLES}, {_LAST}
SELECT shard,
       {_ksum('list(value ORDER BY "user")')} AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_sum_by(spark, sf_dir):
    """sum by(...) aggregation (db_test.go:386-400); order-stable fold."""
    r = _engine(spark, sf_dir).query_instant("sum by (shard) (click)", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_range_count", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id % 8 AS VARCHAR) AS shard, e.user_id, count(*) AS c
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {DAY} AND e.ts <= g.t
    GROUP BY 1, 2, 3
)
SELECT t, shard, CAST(sum(c) AS DOUBLE) AS value
FROM win GROUP BY t, shard
""")
def promql_range_count(spark, sf_dir):
    """Range query + step grid + count_over_time (SURVEY.md §4.2 #2)."""
    r = _engine(spark, sf_dir).query_range(
        "sum by (shard) (count_over_time(click[1d]))", R_START, R_END, STEP)
    return r.df.select("t", _lbl("shard").alias("shard"), "value")


_RATE_CORE = f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
w2 AS (
    SELECT *, lag(value) OVER (PARTITION BY t, "user" ORDER BY ts, value) AS pv
    FROM win
),
agg AS (
    SELECT t, "user", count(*) AS n,
           CAST(min(ts) AS BIGINT) AS first_t, CAST(max(ts) AS BIGINT) AS last_t,
           first(value ORDER BY ts, value) AS first_v,
           last(value ORDER BY ts, value) AS last_v,
           list_reduce(list_prepend(0.0,
               list(CASE WHEN value < pv THEN pv ELSE 0.0 END ORDER BY ts, value)),
               (a, b) -> a + b) AS corr
    FROM w2 GROUP BY t, "user"
),
ex AS (
    SELECT t, "user", n, first_t, last_t,
           (last_v - first_v) + corr AS delta,
           CAST(first_t - (t - {2 * DAY}) AS DOUBLE) / 1000.0 AS dur_start,
           CAST(t - last_t AS DOUBLE) / 1000.0 AS dur_end,
           CAST(last_t - first_t AS DOUBLE) / 1000.0 AS sampled,
           first_v
    FROM agg WHERE n >= 2
),
ex2 AS (
    -- Prometheus extrapolatedRate order: threshold-clamp durationToStart
    -- FIRST, then compare durationToZero against the clamped value
    SELECT *, sampled / (CAST(n AS DOUBLE) - 1) AS avg_dur,
           CASE WHEN dur_start >= (sampled / (CAST(n AS DOUBLE) - 1)) * 1.1
                THEN (sampled / (CAST(n AS DOUBLE) - 1)) / 2
                ELSE dur_start END AS dur_start_c
    FROM ex
),
ex3 AS (
    SELECT t, "user", delta,
           (sampled
            + CASE WHEN delta > 0 AND first_v >= 0
                        AND sampled * (first_v / delta) < dur_start_c
                   THEN sampled * (first_v / delta) ELSE dur_start_c END
            + CASE WHEN dur_end >= avg_dur * 1.1 THEN avg_dur / 2 ELSE dur_end END)
           / sampled AS factor
    FROM ex2
)"""

@q("promql_rate", _RATE_CORE + f"""
SELECT t, "user", delta * factor / {2 * DAY / 1000.0} AS value FROM ex3
""")
def promql_rate(spark, sf_dir):
    """rate(): counter resets + Prometheus extrapolation (db_test.go:616-659)."""
    r = _engine(spark, sf_dir).query_range("rate(click[2d])", R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_increase", _RATE_CORE + """
SELECT t, "user", delta * factor AS value FROM ex3
""")
def promql_increase(spark, sf_dir):
    r = _engine(spark, sf_dir).query_range("increase(click[2d])", R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_avg_over_time", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'purchase' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
)
SELECT t, "user",
       {_ksum('list(value ORDER BY ts, value)')}
         / CAST(count(*) AS DOUBLE) AS value
FROM win GROUP BY t, "user"
""")
def promql_avg_over_time(spark, sf_dir):
    r = _engine(spark, sf_dir).query_range("avg_over_time(purchase[2d])",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_minmax_over_time", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'view' AND e.ts > g.t - {3 * DAY} AND e.ts <= g.t
)
SELECT t, "user", max(value) AS value, min(value) AS minval,
       CAST(count(*) AS DOUBLE) AS cnt
FROM win GROUP BY t, "user"
""")
def promql_minmax_over_time(spark, sf_dir):
    """max/min/count_over_time joined into one frame (db_test.go:402-411)."""
    eng = _engine(spark, sf_dir)
    mx = eng.query_range("max_over_time(view[3d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), "value")
    mn = eng.query_range("min_over_time(view[3d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("minval"))
    ct = eng.query_range("count_over_time(view[3d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("cnt"))
    return mx.join(mn, ["t", "user"]).join(ct, ["t", "user"])


@q("promql_topk", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts FROM events),
c AS (
    SELECT CAST(user_id % 8 AS VARCHAR) AS shard, CAST(user_id AS VARCHAR) AS "user",
           CAST(count(*) AS DOUBLE) AS value
    FROM events_ms WHERE event_type = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
    GROUP BY 1, 2
),
r AS (SELECT *, row_number() OVER (ORDER BY value DESC, shard, "user") AS rk FROM c)
SELECT "user", shard, value FROM r WHERE rk <= 5
""")
def promql_topk(spark, sf_dir):
    """topk window select (db_test.go:561-594); ties break on series sig."""
    r = _engine(spark, sf_dir).query_instant("topk(5, count_over_time(click[7d]))", T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_binop_ratio", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts FROM events),
c AS (SELECT CAST(user_id AS VARCHAR) AS "user", CAST(count(*) AS DOUBLE) AS v
      FROM events_ms WHERE event_type = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
      GROUP BY 1),
v AS (SELECT CAST(user_id AS VARCHAR) AS "user", CAST(count(*) AS DOUBLE) AS v
      FROM events_ms WHERE event_type = 'view' AND ts > {T - LOOKBACK} AND ts <= {T}
      GROUP BY 1)
SELECT c."user" AS "user", c.v / v.v AS value FROM c JOIN v USING ("user")
""")
def promql_binop_ratio(spark, sf_dir):
    """Vector/vector arithmetic with on(...) matching (db_test.go:509-529)."""
    r = _engine(spark, sf_dir).query_instant(
        "count_over_time(click[7d]) / on(user) count_over_time(view[7d])", T)
    return r.df.select(_lbl("user").alias("user"), "value")


@q("promql_set_and", f"""
WITH {_SAMPLES}, {_LAST},
viewers AS (
    SELECT DISTINCT "user" FROM samples
    WHERE name = 'view' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT l."user" AS "user", l.shard AS shard, l.value AS value
FROM last l JOIN viewers USING ("user")
WHERE l.rn = 1 AND l.value > 40
""")
def promql_set_and(spark, sf_dir):
    """Comparison filter + and-on semi join (db_test.go:530-543)."""
    r = _engine(spark, sf_dir).query_instant("click > 40 and on(user) view", T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_unless", f"""
WITH {_SAMPLES}, {_LAST},
buyers AS (
    SELECT DISTINCT "user" FROM samples
    WHERE name = 'purchase' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT l."user" AS "user", l.value AS value
FROM last l ANTI JOIN buyers USING ("user")
WHERE l.rn = 1
""")
def promql_unless(spark, sf_dir):
    r = _engine(spark, sf_dir).query_instant("click unless on(user) purchase", T)
    return r.df.select(_lbl("user").alias("user"), "value")


@q("promql_quantile_by", f"""
WITH {_SAMPLES}, {_LAST},
g AS (
    SELECT shard, list(value ORDER BY value) AS vals, count(*) AS n
    FROM last WHERE rn = 1 GROUP BY shard
)
SELECT shard,
       CASE WHEN n = 1 THEN vals[1] ELSE
         vals[CAST(floor(0.5 * (n - 1)) AS INT) + 1]
         + (vals[CAST(ceil(0.5 * (n - 1)) AS INT) + 1]
            - vals[CAST(floor(0.5 * (n - 1)) AS INT) + 1])
           * (0.5 * (n - 1) - floor(0.5 * (n - 1)))
       END AS value
FROM g
""")
def promql_quantile_by(spark, sf_dir):
    """PromQL quantile linear interpolation (db_test.go:561-594)."""
    r = _engine(spark, sf_dir).query_instant("quantile by (shard) (0.5, click)", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_limitk", f"""
WITH {_SAMPLES}, {_LAST}
SELECT shard, CAST(LEAST(2, count(*)) AS DOUBLE) AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_limitk(spark, sf_dir):
    """limitk sampling aggregator (experimental; upstream testdata
    limit.test): selection is unspecified upstream, so the checkable
    contract is the per-group cardinality cap."""
    r = _engine(spark, sf_dir).query_instant(
        "count by (shard) (limitk by (shard) (2, click))", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_limit_ratio", f"""
WITH {_SAMPLES}, {_LAST}
SELECT CAST(count(*) AS DOUBLE) AS value FROM last WHERE rn = 1
""")
def promql_limit_ratio(spark, sf_dir):
    """limit_ratio partition property (upstream limit.test): r and r-1
    select exact complements, so their union is the full vector."""
    r = _engine(spark, sf_dir).query_instant(
        "count(limit_ratio(0.7, click) or limit_ratio(-0.3, click))", T)
    return r.df.select("value")


@q("promql_mad_over_time", f"""
WITH events_ms AS (
    SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user",
           CAST(e.value AS DOUBLE) AS value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'view' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
arrs AS (
    SELECT t, "user", list(value ORDER BY value) AS vals, count(*) AS n
    FROM win GROUP BY t, "user"
),
-- PromQL quantile(0.5): lo + (hi - lo) * frac on the sorted list; the
-- same IEEE expression shape as folds.fold_quantile so values are
-- bit-exact
med AS (
    SELECT t, "user", vals, n,
           vals[CAST(floor(0.5 * (n - 1)) AS INT) + 1]
           + (vals[CAST(ceil(0.5 * (n - 1)) AS INT) + 1]
              - vals[CAST(floor(0.5 * (n - 1)) AS INT) + 1])
             * (0.5 * (n - 1) - floor(0.5 * (n - 1))) AS med
    FROM arrs
),
dev AS (
    SELECT t, "user", n,
           list_sort(list_transform(vals, v -> abs(v - med))) AS dvals
    FROM med
)
SELECT t, "user",
       dvals[CAST(floor(0.5 * (n - 1)) AS INT) + 1]
       + (dvals[CAST(ceil(0.5 * (n - 1)) AS INT) + 1]
          - dvals[CAST(floor(0.5 * (n - 1)) AS INT) + 1])
         * (0.5 * (n - 1) - floor(0.5 * (n - 1))) AS value
FROM dev
""")
def promql_mad_over_time(spark, sf_dir):
    """mad_over_time: median absolute deviation over the window
    (experimental; upstream functions.test)."""
    r = _engine(spark, sf_dir).query_range("mad_over_time(view[2d])",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_count_values", f"""
WITH {_SAMPLES},
last AS (
    SELECT name, shard, "user", ts, value,
           row_number() OVER (PARTITION BY name, shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM samples WHERE ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT CAST(CAST(floor(value + 0.5) AS BIGINT) AS VARCHAR) AS bucket,
       CAST(count(*) AS DOUBLE) AS value
FROM last WHERE rn = 1 GROUP BY 1
""")
def promql_count_values(spark, sf_dir):
    """count_values + round() (db_test.go:561-594, :595-615); PromQL round
    is floor(v/to + 0.5)*to — the oracle mirrors that exactly, including
    Prometheus' FormatFloat('f', -1) integral rendering ("46", not "46.0")."""
    r = _engine(spark, sf_dir).query_instant(
        'count_values("bucket", round({__name__=~".+"}))', T)
    return r.df.select(_lbl("bucket").alias("bucket"), "value")


@q("promql_label_replace_count", f"""
WITH {_SAMPLES}, {_LAST}
SELECT 'g' || shard AS grp, CAST(count(*) AS DOUBLE) AS value
FROM last WHERE rn = 1 GROUP BY 1
""")
def promql_label_replace_count(spark, sf_dir):
    """label_replace + count by (acceptance corpus; SURVEY §2.C)."""
    r = _engine(spark, sf_dir).query_instant(
        'count by (grp) (label_replace(click, "grp", "g$1", "shard", "(.*)"))', T)
    return r.df.select(_lbl("grp").alias("grp"), "value")


@q("promql_absent", """
SELECT '99999' AS "user", 1.0 AS value
""")
def promql_absent(spark, sf_dir):
    r = _engine(spark, sf_dir).query_instant('absent(click{user="99999"})', T)
    return r.df.select(_lbl("user").alias("user"), "value")


@q("promql_hist_quantile", f"""
WITH ev AS (
    SELECT user_id, value FROM events
    WHERE event_type = 'click' AND epoch_ms(ts) > {T - LOOKBACK} AND epoch_ms(ts) <= {T}
),
c AS (
    SELECT CAST(user_id AS VARCHAR) AS "user",
           CAST(count(*) FILTER (value <= 5) AS DOUBLE) AS c1,
           CAST(count(*) FILTER (value <= 10) AS DOUBLE) AS c2,
           CAST(count(*) FILTER (value <= 20) AS DOUBLE) AS c3,
           CAST(count(*) AS DOUBLE) AS c4
    FROM ev GROUP BY 1
),
x AS (
    SELECT "user", c1, c2, c3, c4, 0.9 * c4 AS rank,
           CASE WHEN c1 >= 0.9 * c4 THEN 1 WHEN c2 >= 0.9 * c4 THEN 2
                WHEN c3 >= 0.9 * c4 THEN 3 ELSE 4 END AS idx
    FROM c WHERE c4 > 0
)
SELECT "user",
       CASE WHEN idx = 4 THEN 20.0
            WHEN idx = 1 THEN 0.0 + (5.0 - 0.0) * (rank - 0.0) / (c1 - 0.0)
            WHEN idx = 2 THEN 5.0 + (10.0 - 5.0) * (rank - c1) / (c2 - c1)
            ELSE 10.0 + (20.0 - 10.0) * (rank - c2) / (c3 - c2) END AS value
FROM x
""")
def promql_hist_quantile(spark, sf_dir):
    """histogram_quantile over classic le-buckets (db_test.go:344-351).

    Bucket series are built from click-event values at thresholds
    (5, 10, 20, +Inf) — cumulative counts per user over the 7d window."""
    e = load_table(spark, sf_dir, "events")
    e = e.filter((F.col("event_type") == "click") &
                 (F.col("ts_ms") > T - LOOKBACK) & (F.col("ts_ms") <= T))
    th = F.explode(F.array(F.lit("5"), F.lit("10"), F.lit("20"), F.lit("+Inf")))
    b = e.withColumn("le", th)
    b = b.withColumn("le_val",
                     F.when(F.col("le") == "+Inf", F.lit(float("inf")))
                      .otherwise(F.col("le").cast("double")))
    counts = (b.groupBy("user_id", "le")
              .agg(F.sum(F.when(F.col("value") <= F.col("le_val"), 1)
                         .otherwise(0)).cast("double").alias("value")))
    samples = counts.select(
        F.lit("lat_bucket").alias("__name__"),
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("le"), F.lit("user")),
            F.array(F.lit("lat_bucket"), F.col("le"),
                    F.col("user_id").cast("string"))).alias("labels"),
        F.lit(T).alias("ts"), F.col("value"))
    eng = PromQLEngine(samples, lookback_ms=60_000, deterministic=True)
    r = eng.query_instant("histogram_quantile(0.9, lat_bucket)", T)
    return r.df.select(_lbl("user").alias("user"), "value")


# --------------------------------------------- metadata APIs (A27-A31)
@q("meta_label_values", f"""
WITH {_SAMPLES}
SELECT DISTINCT "user" AS value FROM samples
WHERE name = 'click' AND shard = '3' AND ts >= {R_START} AND ts <= {T}
ORDER BY value
""")
def meta_label_values(spark, sf_dir):
    """LabelValues with matchers (A28; search/search.go:202-262)."""
    return _engine(spark, sf_dir).label_values("user", ['click{shard="3"}'],
                                               R_START, T)


@q("meta_label_names", """
SELECT * FROM (VALUES ('__name__'), ('shard'), ('user')) AS t(name) ORDER BY name
""")
def meta_label_names(spark, sf_dir):
    """LabelNames (A29/A30; search/search.go:294-345)."""
    return _engine(spark, sf_dir).label_names(None, R_START, T)


@q("meta_series", f"""
WITH {_SAMPLES}
SELECT DISTINCT name AS __name__, shard, "user" FROM samples
WHERE name IN ('click', 'error') AND shard = '5'
  AND ts >= {R_START} AND ts <= {T}
""")
def meta_series(spark, sf_dir):
    """/series multi-selector union (api/http/query.go:567-846)."""
    df = _engine(spark, sf_dir).series(['click{shard="5"}', 'error{shard="5"}'],
                                       R_START, T)
    return df.select(_lbl("__name__").alias("__name__"),
                     _lbl("shard").alias("shard"), _lbl("user").alias("user"))


# =====================================================================
# Relational operator layer over the TPC-H-ish tables (scan/filter/join/
# agg/window/set-op coverage of SURVEY.md §2.A's Spark primitives)
# =====================================================================

_DEC = "decimal(18,2)"


def _revenue_dec():
    return (F.col("l_extendedprice").cast(_DEC) *
            (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)))


@q("tpch_q1_pricing", """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1_pricing(spark, sf_dir):
    """Scan + pushdown filter + aggregate (A5/A11 analogues); decimal-exact
    sums cast to double for bit-stable oracle comparison."""
    l = load_table(spark, sf_dir, "lineitem")
    return (l.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base"),
                 F.sum(_revenue_dec()).cast("double").alias("sum_disc_price"),
                 (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") /
                  F.count("*")).alias("avg_qty"),
                 F.count("*").alias("count_order")))


@q("tpch_q3_shipping", """
WITH rev AS (
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1::DECIMAL(18,2) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           epoch_ms(any_value(o.o_orderdate)) AS o_orderdate_ms
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey
)
SELECT l_orderkey, revenue, o_orderdate_ms FROM rev
ORDER BY revenue DESC, l_orderkey LIMIT 10
""")
def tpch_q3_shipping(spark, sf_dir):
    """3-way join + agg + top-n (A11 + join strategies).  No broadcast
    hints: orders/customer scale with SF, so the join strategy is left to
    AQE — broadcast at small SF, shuffle join at 100 TB (forcing a
    broadcast of orders was a driver-OOM scale-killer, VERDICT r7 #1)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey")
            .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"),
                 F.unix_millis(F.any_value("o_orderdate").cast("timestamp"))
                  .alias("o_orderdate_ms"))
            .orderBy(F.col("revenue").desc(), "l_orderkey").limit(10))


@q("tpch_q5_region_revenue", """
SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""")
def tpch_q5_region_revenue(spark, sf_dir):
    """5-way star join.  Only the constant-size dims (region=5, nation=25
    rows) carry broadcast hints; supplier/customer scale with SF and are
    left to AQE so the plan survives a 100 TB input."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-01-01")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (l.join(s, l.l_suppkey == s.s_suppkey)
            .join(o, l.l_orderkey == o.o_orderkey)
            .join(c, (o.o_custkey == c.c_custkey) &
                  (s.s_nationkey == c.c_nationkey))
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.sum(_revenue_dec()).cast("double").alias("revenue")))


@q("tpch_q6_forecast", """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def tpch_q6_forecast(spark, sf_dir):
    """Pure pushdown filter + global aggregate — the canonical 'does the
    scan skip row groups' query: every predicate lands in PushedFilters."""
    l = load_table(spark, sf_dir, "lineitem")
    return (l.filter((F.col("l_shipdate") >= "1997-01-01") &
                     (F.col("l_shipdate") < "1998-01-01") &
                     (F.col("l_discount") >= 0.05) &
                     (F.col("l_discount") <= 0.07) &
                     (F.col("l_quantity") < 24))
            .agg(F.sum(F.col("l_extendedprice").cast(_DEC)
                       * F.col("l_discount").cast(_DEC))
                 .cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


@q("tpch_q10_returns", """
SELECT c.c_custkey, any_value(c.c_name) AS c_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       any_value(n.n_name) AS n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey
ORDER BY revenue DESC, c_custkey LIMIT 20
""")
def tpch_q10_returns(spark, sf_dir):
    """Returned-item ranking: fact-fact join keyed on orderkey, broadcast
    nation dim (constant), customer join left to AQE, top-n via
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") &
        (F.col("o_orderdate") < "1997-04-01"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey")
            .agg(F.any_value("c_name").alias("c_name"),
                 F.sum(_revenue_dec()).cast("double").alias("revenue"),
                 F.any_value("n_name").alias("n_name"))
            .orderBy(F.col("revenue").desc(), "c_custkey").limit(20))


@q("tpch_q14_promo", """
SELECT CAST(100.00 * sum(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1::DECIMAL(18,2) - CAST(l.l_discount AS DECIMAL(18,2)))
                ELSE 0::DECIMAL(18,2) END) AS DOUBLE)
     / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""")
def tpch_q14_promo(spark, sf_dir):
    """Promotion share: part join (strategy AQE's call — part scales with
    SF), conditional decimal sums."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") &
        (F.col("l_shipdate") < "1997-10-01"))
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO",
                         _revenue_dec()).otherwise(F.lit(0).cast(_DEC)))
    return j.agg((F.lit(100.0) * promo.cast("double") /
                  F.sum(_revenue_dec()).cast("double"))
                 .alias("promo_revenue"))


@q("tpch_q18_large_orders", """
WITH big AS (
    SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 220::DECIMAL(18,2)
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       epoch_ms(o.o_orderdate) AS o_orderdate_ms, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""")
def tpch_q18_large_orders(spark, sf_dir):
    """Large-volume orders: HAVING on a fact-side aggregate feeding a join —
    the aggregate shrinks the fact table before any join shuffles."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (l.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
           .filter(F.col("q") > 220)
           .select("l_orderkey", F.col("q").cast("double").alias("total_qty")))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (big.join(o, big.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.unix_millis(F.col("o_orderdate").cast("timestamp"))
                     .alias("o_orderdate_ms"),
                    "total_qty"))


@q("tpch_q4_priority", """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""")
def tpch_q4_priority(spark, sf_dir):
    """TPC-H Q4 analogue (the corpus has no commit/receipt dates, so 'late'
    means shipped >30 days after order): EXISTS compiles to a left-semi join
    whose equi-key (l_orderkey) carries the shuffle and whose date inequality
    rides along as a join residual — no correlated per-row subquery."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") &
        (F.col("o_orderdate") < "1997-10-01"))
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(l, (o.o_orderkey == l.l_orderkey) &
                  (l.l_shipdate > F.col("o_orderdate") +
                   F.expr("INTERVAL 30 DAYS")), "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


@q("tpch_q7_nation_volume", """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year, l.l_extendedprice, l.l_discount
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def tpch_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year.  Nation (25 rows) keeps a
    broadcast hint; supplier/customer scale with SF so their join strategy
    is AQE's call — broadcast at bench scale, shuffle at 100 TB."""
    n = load_table(spark, sf_dir, "nation")
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (load_table(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
         .select("c_custkey", F.col("n_name").alias("cust_nation")))
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1998-01-01"))
    o = load_table(spark, sf_dir, "orders")
    pair = ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")) | \
           ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (l.join(s, F.col("l_suppkey") == s.s_suppkey)
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(_revenue_dec()).cast("double").alias("revenue")))


@q("tpch_q8_market_share", """
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1::DECIMAL(18,2) - CAST(l_discount AS DECIMAL(18,2)))
                ELSE 0::DECIMAL(18,2) END) AS DOUBLE)
     / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS mkt_share
FROM (
    SELECT year(o.o_orderdate) AS o_year, l.l_extendedprice, l.l_discount,
           n2.n_name AS supp_nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
) nations
GROUP BY o_year
""")
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8: national market share inside a region.  Eight-table star —
    constant dims (nation/region) broadcast by hint, SF-proportional tables
    by AQE only; the part filter prunes lineitem EARLY (first join) so the
    orderkey shuffle moves only STANDARD-part rows."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (load_table(spark, sf_dir, "customer")
         .join(F.broadcast(n.join(F.broadcast(r),
                                  n.n_regionkey == r.r_regionkey)),
               F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey"))
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") &
        (F.col("o_orderdate") < "1998-01-01"))
    base = (l.join(p, F.col("l_partkey") == p.p_partkey)
            .join(s, F.col("l_suppkey") == s.s_suppkey)
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey))
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_5",
                       _revenue_dec()).otherwise(F.lit(0).cast(_DEC)))
    return (base.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg((nat.cast("double") / F.sum(_revenue_dec()).cast("double"))
                 .alias("mkt_share")))


@q("tpch_q13_order_dist", """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""")
def tpch_q13_order_dist(spark, sf_dir):
    """TPC-H Q13: customer order-count distribution.  Outer join with a
    residual predicate, then a re-aggregation on the derived count — the
    second groupBy keys on a tiny domain, so AQE coalesces it to a few
    partitions."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@q("tpch_q15_top_supplier", """
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1::DECIMAL(18,2) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
""")
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: top revenue supplier.  The scalar-max subquery is a
    one-row global aggregate broadcast back onto the per-supplier revenue
    table (exact decimal compare, ties kept) — no single-partition Window
    exchange, no second scan of lineitem (VERDICT r7 #5)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") &
        (F.col("l_shipdate") < "1997-04-01"))
    rev = (l.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_revenue_dec()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    top = (rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
           .select("supplier_no", "total_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_rev")))


@q("tpch_q17_small_qty", """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey) pa
  ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND CAST(l.l_quantity AS DECIMAL(18,2)) * cnt * 5 < sq
""")
def tpch_q17_small_qty(spark, sf_dir):
    """TPC-H Q17 analogue (no p_container column): small-quantity revenue.
    The correlated `l_quantity < 0.2*avg(...)` is decorrelated into one
    per-part aggregate joined back on partkey; the comparison is multiplied
    out (qty*cnt*5 < sum) so both engines compare exact decimals, never a
    float average."""
    l = load_table(spark, sf_dir, "lineitem")
    pa = (l.groupBy(F.col("l_partkey").alias("pa_partkey"))
          .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("sq"),
               F.count("*").alias("cnt")))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (l.join(p, l.l_partkey == p.p_partkey)
            .join(pa, l.l_partkey == F.col("pa_partkey"))
            .filter(F.col("l_quantity").cast(_DEC) * F.col("cnt") * 5 <
                    F.col("sq"))
            .agg((F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") /
                  F.lit(7.0)).alias("avg_yearly")))


@q("tpch_q19_disjunctive", """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1::DECIMAL(18,2) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""")
def tpch_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 analogue: disjunctive mixed-table predicate.  Catalyst
    derives the implied single-table disjunctions (brand IN (...) on part,
    quantity<=30 on lineitem) and pushes them into both scans; the cross-
    table OR stays as the join residual."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    def arm(brand, smax, qlo, qhi):
        return ((F.col("p_brand") == brand) &
                F.col("p_size").between(1, smax) &
                (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi))
    return (l.join(p, l.l_partkey == p.p_partkey)
            .filter(arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) |
                    arm("Brand#34", 15, 20, 30))
            .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


@q("tpch_q22_dormant_capital", """
WITH pos AS (
    SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
           count(*) AS n
    FROM customer WHERE c_acctbal > 0.0
),
eligible AS (
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * n > s
),
dormant AS (
    SELECT e.* FROM eligible e
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1997-06-01')
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM dormant GROUP BY c_nationkey
""")
def tpch_q22_dormant_capital(spark, sf_dir):
    """TPC-H Q22 analogue (testdata has no c_phone, so nationkey plays the
    country code): customers with above-average positive balances and no
    RECENT orders (none since 1997-06-01 — all-time dormancy is empty at
    small SF).  The correlated scalar average decorrelates into ONE global
    aggregate broadcast back (exact decimal cross-multiplication
    bal*n > sum — no float average on either engine, so the threshold can
    never flip on summation order), and NOT EXISTS is a shuffle left-anti
    join AQE may convert; the one-row aggregate is the only broadcast."""
    c = load_table(spark, sf_dir, "customer")
    pos = (c.filter(F.col("c_acctbal") > 0.0)
           .agg(F.sum(F.col("c_acctbal").cast(_DEC)).alias("s"),
                F.count("*").alias("n")))
    elig = (c.join(F.broadcast(pos))
            .filter(F.col("c_acctbal").cast(_DEC) * F.col("n") >
                    F.col("s")))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= "1997-06-01").select("o_custkey"))
    dormant = elig.join(o, elig.c_custkey == o.o_custkey, "left_anti")
    return (dormant.groupBy(F.col("c_nationkey").alias("cntrycode"))
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                  .alias("totacctbal")))


@q("rel_distinct_agg", """
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
""")
def rel_distinct_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.countDistinct("o_custkey").alias("n_customers"),
                 F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total")))


@q("rel_window_topn", """
WITH r AS (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey) AS rk
    FROM customer
)
SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM r WHERE rk <= 3
""")
def rel_window_topn(spark, sf_dir):
    """Window ranking (A19/A20 analogue: dedup/sort via windows)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(),
                                              F.col("c_custkey"))
    return (c.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("c_mktsegment", "c_custkey", "c_acctbal", "rk"))


@q("rel_semi_anti", """
SELECT n.n_name,
       count(*) FILTER (WHERE has_order) AS with_orders,
       count(*) FILTER (WHERE NOT has_order) AS without_orders
FROM (
    SELECT c.c_custkey, c.c_nationkey,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
    FROM customer c
) cc JOIN nation n ON n.n_nationkey = cc.c_nationkey
GROUP BY n.n_name
""")
def rel_semi_anti(spark, sf_dir):
    """Semi/anti joins (set-op machinery behind and/unless, A21)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    n = load_table(spark, sf_dir, "nation")
    witho = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .groupBy(F.col("c_nationkey").alias("nk_with"))
             .agg(F.count("*").alias("with_orders")))
    without = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
               .groupBy(F.col("c_nationkey").alias("nk_without"))
               .agg(F.count("*").alias("without_orders")))
    return (n.join(witho, n.n_nationkey == witho.nk_with, "left")
            .join(without, n.n_nationkey == without.nk_without, "left")
            .select("n_name",
                    F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
                    F.coalesce("without_orders", F.lit(0)).alias("without_orders")))


@q("events_tumbling_window", """
SELECT epoch_ms(ts) // 86400000 AS day, event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
""")
def events_tumbling_window(spark, sf_dir):
    """Tumbling daily window aggregate over the event stream."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy((F.col("ts_ms") / DAY).cast("long").alias("day"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


@q("events_sessionize", """
WITH e AS (
    SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
           lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id) AS prev_ts
    FROM events
)
SELECT user_id,
       count(*) AS n_events,
       1 + count(*) FILTER (WHERE prev_ts IS NOT NULL
                            AND ts_ms - prev_ts > 1800000) AS n_sessions
FROM e GROUP BY user_id
""")
def events_sessionize(spark, sf_dir):
    """Sessionization (30-min gap) via window lag — the batch analogue of
    the streaming session-window operator."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    s = e.withColumn("prev_ts", F.lag("ts_ms").over(w))
    return (s.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 (F.lit(1) + F.sum(F.when(F.col("prev_ts").isNotNull() &
                                          (F.col("ts_ms") - F.col("prev_ts") > 1_800_000),
                                          1).otherwise(0))).alias("n_sessions")))


@q("events_asof_join", """
WITH e AS (
    SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
           last_value(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
    FROM events
)
SELECT event_id, user_id, last_click_ts FROM e WHERE event_type = 'error'
""")
def events_asof_join(spark, sf_dir):
    """As-of join: each error event picks the latest click at-or-before it —
    single-pass window, no range join (scale path for temporal joins)."""
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts_ms", "event_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    s = e.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("event_type") == "click", F.col("ts_ms")),
               ignorenulls=True).over(w))
    return (s.filter(F.col("event_type") == "error")
            .select("event_id", "user_id", "last_click_ts"))


# =====================================================================
# M8 scale extensions: dedup / similarity / text / multimodal
# =====================================================================

@q("dedup_exact", """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY 1
""")
def dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


_SHINGLES = r"""
words AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
    FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                         i -> array_to_string(w[i:i+2], ' '))) AS shingles
    FROM words
)"""

@q("dedup_minhash", f"""
WITH {_SHINGLES},
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
seeded AS (
    SELECT doc_id, shingle, unnest(generate_series(0, 7)) AS seed FROM exploded
)
SELECT doc_id, seed,
       min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS minhash
FROM seeded GROUP BY doc_id, seed
""")
def dedup_minhash(spark, sf_dir):
    """MinHash signatures (word-3-gram shingles, 8 hash seeds); md5 hash
    family = the oracle-replicable mode (xxhash64 longs are the 100 TB
    default, operators/dedup.py)."""
    return dedup.minhash_signatures(load_table(spark, sf_dir, "documents"),
                                    hash_family="md5")


_LSH_PAIRS_SQL = f"""{_SHINGLES},
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
seeded AS (
    SELECT doc_id, shingle, unnest(generate_series(0, 7)) AS seed FROM exploded
),
sig AS (
    SELECT doc_id, seed,
           min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS minhash
    FROM seeded GROUP BY doc_id, seed
),
bands AS (
    SELECT doc_id, seed // 2 AS band,
           md5(array_to_string(list_sort(list(CAST(seed AS VARCHAR) || ':' || minhash)), ','))
             AS band_key
    FROM sig GROUP BY doc_id, seed // 2
),
lsh_pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
    WHERE a.doc_id < b.doc_id
)"""

@q("dedup_lsh_pairs", f"""
WITH {_LSH_PAIRS_SQL}
SELECT doc_a, doc_b FROM lsh_pairs
""")
def dedup_lsh_pairs(spark, sf_dir):
    """LSH banding candidate pairs (4 bands × 2 rows); md5 = oracle mode."""
    return dedup.lsh_candidate_pairs(load_table(spark, sf_dir, "documents"),
                                     hash_family="md5")


@q("dedup_clusters", f"""
WITH RECURSIVE {_LSH_PAIRS_SQL},
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM lsh_pairs
),
cc_nodes AS (SELECT DISTINCT u FROM edges),
reach(u, label) AS (
    SELECT u, u AS label FROM cc_nodes
    UNION
    SELECT e.v AS u, r.label
    FROM reach r JOIN edges e ON e.u = r.u
    WHERE r.label < e.v
)
SELECT u AS doc_id, min(label) AS component FROM reach GROUP BY u
""")
def dedup_clusters(spark, sf_dir):
    """Dedup clusters: connected components over the LSH candidate pairs
    (large-star/small-star iteration, operators/dedup.py) vs a DuckDB
    recursive-CTE min-label closure oracle.  At 100 TB this is the step
    that turns pairwise near-dup evidence into keep/drop decisions."""
    pairs = dedup.lsh_candidate_pairs(load_table(spark, sf_dir, "documents"),
                                      hash_family="md5")
    return dedup.connected_components(pairs)


@q("dedup_keep_list", f"""
WITH RECURSIVE {_LSH_PAIRS_SQL},
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
    UNION
    SELECT doc_b AS u, doc_a AS v FROM lsh_pairs
),
cc_nodes AS (SELECT DISTINCT u FROM edges),
reach(u, label) AS (
    SELECT u, u AS label FROM cc_nodes
    UNION
    SELECT e.v AS u, r.label
    FROM reach r JOIN edges e ON e.u = r.u
    WHERE r.label < e.v
),
comp AS (SELECT u AS doc_id, min(label) AS component FROM reach GROUP BY u)
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS component,
       (c.component IS NULL OR c.component = d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
""")
def dedup_keep_list(spark, sf_dir):
    """The pipeline's end product: every document mapped to its near-dup
    cluster with a keep/drop decision (cluster representative = min doc id;
    docs outside any candidate pair keep themselves).  Composes LSH
    banding → connected components → left-join back to the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, hash_family="md5")
    comp = dedup.connected_components(pairs)
    return (docs.select("doc_id")
            .join(comp, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", "doc_id").alias("component"),
                    (F.col("component").isNull() |
                     (F.col("component") == F.col("doc_id"))).alias("keep")))


@q("dedup_jaccard", f"""
WITH {_SHINGLES},
exploded AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM exploded a JOIN exploded b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
SELECT p.doc_a, p.doc_b, p.inter,
       sa.n + sb.n - p.inter AS "union",
       CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) AS jaccard
FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE CAST(p.inter AS DOUBLE) / CAST(sa.n + sb.n - p.inter AS DOUBLE) >= 0.6
""")
def dedup_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard ≥ 0.6 over all sharing pairs (inverted-index
    join on shingle; at 100TB the LSH pairs pre-filter the candidates)."""
    docs = _docs(spark, sf_dir)
    # words materialized behind a projection boundary: the shingle lambda
    # slices the word array per shingle, and slicing an outer array
    # EXPRESSION re-runs the regex+split per shingle (interpreted HOF eval)
    sh = (docs.select(F.col("doc_id"),
                      dedup.normalized_words(F.col("text")).alias("__w"))
          .select("doc_id", dedup.shingles(F.col("__w")).alias("sh")))
    # explode_outer + post-generate null filter, NOT explode: plain explode
    # makes InferFiltersFromGenerate push a size/isnotnull predicate of the
    # WHOLE shingle expression below the staging projections — the
    # quadratic per-element re-eval this staging exists to avoid, paid per
    # row in a Filter (r12 plan audit: 2.6× on this query's join input)
    expl = (sh.select("doc_id", F.explode_outer("sh").alias("shingle"))
            .filter(F.col("shingle").isNotNull()))
    a = expl.alias("a"); b = expl.alias("b")
    pairs = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                    (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    j = (pairs.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n", "na"), "doc_a")
         .join(sizes.withColumnRenamed("doc_id", "doc_b")
               .withColumnRenamed("n", "nb"), "doc_b")
         .withColumn("union", F.col("na") + F.col("nb") - F.col("inter"))
         .withColumn("jaccard", F.col("inter").cast("double") /
                     F.col("union").cast("double")))
    return (j.filter(F.col("jaccard") >= 0.6)
            .select("doc_a", "doc_b", "inter", "union", "jaccard"))


@q("dedup_simhash", """
WITH words AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
             AS w
    FROM documents
),
bits AS (
    SELECT doc_id, w, md5(w) AS hx, unnest(generate_series(0, 31)) AS j
    FROM words WHERE w <> ''
),
votes AS (
    SELECT doc_id, j,
           sum(CASE WHEN ((strpos('0123456789abcdef', hx[(j // 4) + 1]) - 1)
                          & (1 << (j % 4))) > 0 THEN 1 ELSE -1 END) AS vote
    FROM bits GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT)
         AS simhash
FROM votes GROUP BY doc_id
""")
def dedup_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir))


@q("dedup_substring_spans", """
WITH base AS (SELECT doc_id, text AS t, length(text) AS n_chars FROM documents),
grams AS (
    SELECT doc_id, n_chars, p AS pos, md5(substr(t, CAST(p AS INTEGER), 24)) AS g
    FROM base, unnest(range(1, greatest(n_chars - 24 + 1, 0) + 1)) AS u(p)
    WHERE n_chars >= 24
),
dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
dup AS (SELECT doc_id, n_chars, pos FROM grams JOIN dupg USING (g)),
per AS (
    SELECT doc_id, count(*) AS n_dup_grams,
           (list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT)],
                   list_transform(list(pos ORDER BY pos),
                                  p -> [CAST(p AS BIGINT), CAST(0 AS BIGINT)])),
               (a, x) -> [a[1] + greatest(x[1] + 24 - greatest(x[1], a[2]),
                                          CAST(0 AS BIGINT)),
                          greatest(a[2], x[1] + 24)]))[1] AS dup_chars
    FROM dup GROUP BY doc_id
)
SELECT b.doc_id, b.n_chars,
       CAST(COALESCE(p.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(p.dup_chars, 0) AS BIGINT) AS dup_chars,
       CASE WHEN b.n_chars > 0
            THEN CAST(COALESCE(p.dup_chars, 0) AS DOUBLE) / b.n_chars
            ELSE 0.0 END AS dup_fraction
FROM base b LEFT JOIN per p USING (doc_id)
""")
def dedup_substring_spans(spark, sf_dir):
    """Exact substring-duplication coverage (Lee et al. 2022 suffix-array
    dedup re-expressed Spark-first: gram-hash shuffle + per-doc interval-
    union fold — operators/dedup.duplicate_spans)."""
    return dedup.duplicate_spans(_docs(spark, sf_dir),
                                 min_len=24)


@q("text_fingerprint", """
WITH words AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
    FROM documents
)
SELECT doc_id,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(w, x ->
                   CAST(('0x' || md5(x)[1:7])::BIGINT AS BIGINT))),
           (acc, h) -> (acc * 31 + h) % 2147483647) AS fingerprint
FROM words
""")
def text_fingerprint(spark, sf_dir):
    """Rolling polynomial hash document fingerprint."""
    return text.fingerprint(_docs(spark, sf_dir))


@q("text_token_counts", r"""
SELECT doc_id,
       len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
         AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens
FROM documents
""")
def text_token_counts(spark, sf_dir):
    return text.token_counts(_docs(spark, sf_dir))


@q("text_quality", r"""
WITH base AS (
    SELECT doc_id, length(text) AS n_chars,
           len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
             AS n_words,
           length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha
    FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS alpha_ratio,
       CAST(n_chars - n_words + 1 AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)
         AS mean_word_len,
       (least(n_chars, 500) / 500.0) * 0.4
         + (CAST(n_alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)) * 0.4
         + (CASE WHEN CAST(n_chars - n_words + 1 AS DOUBLE)
                      / CAST(greatest(n_words, 1) AS DOUBLE) BETWEEN 3.0 AND 10.0
                 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality
FROM base
""")
def text_quality(spark, sf_dir):
    return text.quality_score(_docs(spark, sf_dir))


@q("text_language", """
WITH words AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
    FROM documents
),
hits AS (
    SELECT doc_id,
           len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein','zu','mit','auf'], x))) AS de,
           len(list_filter(w, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) AS en,
           len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','los','se','no'], x))) AS es,
           len(list_filter(w, x -> list_contains(['le','la','et','les','des','est','un','une','dans','que'], x))) AS fr,
           len(list_filter(w, x -> list_contains(['il','la','di','che','e','un','per','non','con','del'], x))) AS it
    FROM words
),
unpivoted AS (
    SELECT doc_id, lang, hits,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, lang DESC) AS rk
    FROM (
        SELECT doc_id, 'de' AS lang, de AS hits FROM hits UNION ALL
        SELECT doc_id, 'en', en FROM hits UNION ALL
        SELECT doc_id, 'es', es FROM hits UNION ALL
        SELECT doc_id, 'fr', fr FROM hits UNION ALL
        SELECT doc_id, 'it', it FROM hits
    )
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS detected_lang,
       CAST(hits AS BIGINT) AS lang_hits
FROM unpivoted WHERE rk = 1
""")
def text_language(spark, sf_dir):
    """Stopword-vote language ID (heuristic n-gram detector)."""
    return text.detect_language(_docs(spark, sf_dir))


@q("text_pack_sequences", r"""
WITH base AS (
    SELECT doc_id, doc_id % 8 AS shard,
           len(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, shard, n_tokens,
           COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_before
    FROM base
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(shard * 4294967296 + (cum_before // 256) AS BIGINT) AS pack_id
FROM packed
""")
def text_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (256-token packs, 8 shards)."""
    return text.pack_sequences(_docs(spark, sf_dir),
                               capacity_tokens=256, n_shards=8)


@q("text_gopher_quality", r"""
WITH base AS (
    SELECT doc_id, text,
           string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
           string_split(text, chr(10)) AS lines,
           length(regexp_replace(text, '\s', '', 'g')) AS nonspace
    FROM documents
),
sig AS (
    SELECT doc_id,
           len(w) AS n_words,
           CAST(nonspace AS DOUBLE) / greatest(len(w), 1) AS mean_word_len,
           CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
             / greatest(len(w), 1) AS symbol_ratio,
           CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
             / greatest(len(w), 1) AS alpha_word_frac,
           CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
             / greatest(len(lines), 1) AS bullet_line_frac,
           CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
             / greatest(len(lines), 1) AS ellipsis_line_frac,
           len(list_intersect(w, ['the','be','to','of','and','that','have','with'])) AS stop_hits
    FROM base
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
       bullet_line_frac, ellipsis_line_frac, stop_hits,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1
        AND bullet_line_frac < 0.9 AND ellipsis_line_frac < 0.3
        AND alpha_word_frac >= 0.8 AND stop_hits >= 2) AS passes
FROM sig
""")
def text_gopher_quality(spark, sf_dir):
    """Gopher-rule quality filter signals over the documents corpus."""
    return text.gopher_quality(_docs(spark, sf_dir))


# deterministic pseudo-PII decoration so the scan/redaction path is
# exercised with non-zero counts (the synthetic corpus itself carries none)
_PII_DECOR_SQL = r"""
decorated AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                || CASE WHEN doc_id % 3 = 0 THEN ' id 123-45-6789'
                        WHEN doc_id % 3 = 1 THEN ' call 555-123-4567'
                        ELSE '' END AS text
    FROM documents
)"""


@q("text_pii_scan", rf"""
WITH {_PII_DECOR_SQL}
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\b\d{{3}}-\d{{2}}-\d{{4}}\b')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(text, '\b\d{{3}}[- ]\d{{3}}[- ]\d{{4}}\b')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS BIGINT) AS n_ipv4,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
             '\b\d{{3}}-\d{{2}}-\d{{4}}\b', '<SSN>', 'g'),
           '\b\d{{3}}[- ]\d{{3}}[- ]\d{{4}}\b', '<PHONE>', 'g'),
         '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IP>', 'g') AS redacted
FROM decorated
""")
def text_pii_scan(spark, sf_dir):
    """PII detect + redact over documents decorated with deterministic
    pseudo-PII (emails, SSN-ish ids, phone numbers, IPv4)."""
    d = _docs(spark, sf_dir)
    decorated = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" id 123-45-6789"))
             .when(F.col("doc_id") % 3 == 1, F.lit(" call 555-123-4567"))
             .otherwise(F.lit(""))).alias("text"))
    return text.pii_scan(decorated)


_BM25_TERMS = ("merge", "shuffle", "spark")
_BM25_SQL_TOKS = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
                  "w -> w <> '')")


@q("text_bm25", f"""
WITH toks AS (
    SELECT doc_id, {_BM25_SQL_TOKS} AS w FROM documents
),
base AS (
    SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
           {', '.join(f"CAST(len(list_filter(w, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
                      for i, t in enumerate(_BM25_TERMS))}
    FROM toks
),
stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
           {', '.join(f"sum(CASE WHEN tf{i} > 0 THEN 1.0 ELSE 0.0 END) AS df{i}"
                      for i in range(len(_BM25_TERMS)))}
    FROM base
)
-- round(…, 6) on both engines: ln() differs by an ulp between the JVM
-- and libm, and ranking must agree at the top-k boundary
SELECT doc_id,
       round({' + '.join(
           f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i} * 2.2 "
           f"/ (tf{i} + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))"
           for i in range(len(_BM25_TERMS)))}, 6) AS score
FROM base, stats
WHERE {' OR '.join(f"tf{i} > 0" for i in range(len(_BM25_TERMS)))}
ORDER BY score DESC, doc_id ASC
LIMIT 10
""")
def text_bm25(spark, sf_dir):
    """Okapi BM25 top-10 (Lucene idf).  Per-term tf without explode, corpus
    stats in one broadcast row, TakeOrderedAndProject top-k — the retrieval
    scoring shape for a 100 TB corpus."""
    return text.bm25_score(_docs(spark, sf_dir),
                           list(_BM25_TERMS), top_k=10, round_to=6)


@q("text_tfidf", """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              w -> w <> '')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks
    WHERE len(term) >= 3 GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
    -- round(…, 6): see text_bm25 (cross-engine ln ulp)
    SELECT tf.doc_id, tf.term, tf.tf,
           round(CAST(tf.tf AS DOUBLE) * ln(n.n / df.df), 6) AS score,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY round(CAST(tf.tf AS DOUBLE) * ln(n.n / df.df), 6) DESC,
                                       tf.term ASC) AS rn
    FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tf, score FROM scored WHERE rn <= 3
""")
def text_tfidf(spark, sf_dir):
    """Top-3 tf·idf terms per document (idf = ln(N/df))."""
    return text.tfidf_top_terms(_docs(spark, sf_dir),
                                top_n=3, round_to=6)


@q("text_repetition", r"""
WITH lines AS (
    SELECT doc_id, trim(l) AS line
    FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
    WHERE trim(l) <> ''
),
lc AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
       FROM lines GROUP BY 1, 2),
ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
              count(*) AS n_distinct, sum(c * len) AS tot_chars,
              sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup_chars
       FROM lc GROUP BY 1),
words AS (SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                   AS ws
          FROM documents),
grams AS (SELECT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ws), 1)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS gram
    FROM words)),
gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
topg AS (SELECT doc_id, c, length(replace(gram, ' ', '')) AS glen,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, gram ASC) AS rn
         FROM gc),
wchars AS (SELECT doc_id,
                  list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(ws, w -> CAST(length(w) AS BIGINT))),
                      (a, b) -> a + b) AS wc
           FROM words)
SELECT d.doc_id,
       COALESCE(ls.n_lines, 0) AS n_lines,
       CAST(COALESCE(ls.n_lines, 0) - COALESCE(ls.n_distinct, 0) AS DOUBLE)
         / greatest(COALESCE(ls.n_lines, 0), 1) AS dup_line_frac,
       CAST(COALESCE(ls.dup_chars, 0) AS DOUBLE)
         / greatest(COALESCE(ls.tot_chars, 0), 1) AS dup_line_char_frac,
       CAST(COALESCE(t.c * t.glen, 0) AS DOUBLE)
         / greatest(w.wc, 1) AS top_2gram_char_frac,
       (CAST(COALESCE(ls.n_lines, 0) - COALESCE(ls.n_distinct, 0) AS DOUBLE)
          / greatest(COALESCE(ls.n_lines, 0), 1) <= 0.30
        AND CAST(COALESCE(ls.dup_chars, 0) AS DOUBLE)
          / greatest(COALESCE(ls.tot_chars, 0), 1) <= 0.20
        AND CAST(COALESCE(t.c * t.glen, 0) AS DOUBLE)
          / greatest(w.wc, 1) <= 0.20) AS passes
FROM documents d
LEFT JOIN ls USING (doc_id)
LEFT JOIN (SELECT * FROM topg WHERE rn = 1) t USING (doc_id)
JOIN wchars w USING (doc_id)
""")
def text_repetition(spark, sf_dir):
    """Gopher repetition filters: duplicate-line fractions and top-2-gram
    character mass, per document (operators/text.repetition_signals)."""
    return text.repetition_signals(_docs(spark, sf_dir))


@q("text_c4_filters", r"""
WITH lines AS (
    SELECT doc_id, trim(l) AS line
    FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
    WHERE trim(l) <> ''
),
lstats AS (
    SELECT doc_id, count(*) AS n_lines,
           sum(CASE WHEN regexp_matches(line, '[.!?"]$')
                     AND len(string_split(trim(regexp_replace(line, '\s+', ' ', 'g')), ' ')) >= 5
                    THEN 1 ELSE 0 END) AS kept
    FROM lines GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(s.kept, 0) AS DOUBLE)
         / greatest(COALESCE(s.n_lines, 0), 1) AS kept_line_frac,
       CAST(len(regexp_extract_all(d.text, '[.!?]')) AS BIGINT) AS n_sentences,
       contains(lower(d.text), 'lorem ipsum') AS has_lorem_ipsum,
       contains(d.text, '{') AS has_brace,
       (len(regexp_extract_all(d.text, '[.!?]')) >= 3
        AND NOT contains(lower(d.text), 'lorem ipsum')
        AND NOT contains(d.text, '{')) AS passes
FROM documents d LEFT JOIN lstats s USING (doc_id)
""")
def text_c4_filters(spark, sf_dir):
    """C4 cleaning signals: terminal-punctuation line retention, sentence
    count, lorem-ipsum/brace flags (operators/text.c4_filters)."""
    return text.c4_filters(_docs(spark, sf_dir))


@q("text_entropy", r"""
WITH words AS (SELECT doc_id,
                      string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                        AS ws
               FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS w FROM words),
cnt AS (SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS n, len(ws) AS n_words
        FROM words),
ent AS (
    SELECT c.doc_id, count(*) AS n_distinct,
           round(list_reduce(list_prepend(0.0,
               list((c.c / t.n) * ln(t.n / c.c) ORDER BY c.w)),
               (a, b) -> a + b), 9) AS entropy
    FROM cnt c JOIN tot t USING (doc_id) GROUP BY c.doc_id
)
SELECT t.doc_id, CAST(t.n_words AS BIGINT) AS n_words,
       CAST(COALESCE(e.n_distinct, 0) AS BIGINT) AS n_distinct,
       COALESCE(e.entropy, 0.0) AS entropy
FROM tot t LEFT JOIN ent e USING (doc_id)
""")
def text_entropy(spark, sf_dir):
    """Unigram Shannon entropy per document, sorted-word fold so the float
    sum order matches the oracle exactly (operators/text.token_entropy)."""
    return text.token_entropy(_docs(spark, sf_dir),
                              round_to=9)


@q("text_decontaminate", r"""
WITH words AS (SELECT doc_id, source,
                      string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                        AS ws
               FROM documents),
bgrams AS (SELECT DISTINCT gram FROM (
    SELECT unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                  i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS gram
    FROM words WHERE source = 'src0')),
dg AS (SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
                  i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS gram
    FROM words)),
agg AS (SELECT d.doc_id,
               count(g.gram) AS n_grams,
               count(b.gram) AS n_matched
        FROM documents d
        LEFT JOIN dg g USING (doc_id)
        LEFT JOIN bgrams b ON g.gram = b.gram
        GROUP BY 1)
SELECT doc_id, n_grams, n_matched,
       CAST(n_matched AS DOUBLE) / greatest(n_grams, 1) AS overlap_frac,
       CAST(n_matched AS DOUBLE) / greatest(n_grams, 1) > 0.1 AS contaminated
FROM agg
""")
def text_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination: distinct word 3-gram overlap of
    every document against the src0 slice as the held-out benchmark
    (operators/text.decontaminate; benchmark gram set broadcast)."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("source") == "src0")
    return text.decontaminate(docs, bench, n=3, threshold=0.1)


def _query_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


_DOT = """
list_reduce(list_prepend(0.0,
    list_transform(list_zip(e.embedding, q.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
    (a, b) -> a + b)"""
_NORM_E = """
sqrt(list_reduce(list_prepend(0.0,
    list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (a, b) -> a + b))"""
_NORM_Q = """
sqrt(list_reduce(list_prepend(0.0,
    list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (a, b) -> a + b))"""

@q("sim_topk_cosine", f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           {_DOT} / ({_NORM_E} * {_NORM_Q}) AS cos_sim
    FROM embeddings e, embeddings q
    WHERE q.vec_id < 3
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, rank, vec_id, cos_sim FROM r WHERE rank <= 5
""")
def sim_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline (sequential-fold dot product)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, _query_vectors(spark, sf_dir), k=5)


@q("sim_topk_vectorized", f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           {_DOT} / ({_NORM_E} * {_NORM_Q}) AS cos_sim
    FROM embeddings e, embeddings q
    WHERE q.vec_id < 3
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, rank, vec_id, round(cos_sim, 6) AS cos_sim
FROM r WHERE rank <= 5
""")
def sim_topk_vectorized(spark, sf_dir):
    """Arrow-batched BLAS brute-force cosine top-k — the throughput twin of
    sim_topk_cosine (one float64 matmul per Arrow batch, per-batch partial
    top-k, constant-size merge).  BLAS summation differs from the
    sequential fold by ~1e-16, so the reported score is rounded to 6
    decimals on BOTH sides (Spark F.round and DuckDB round are both
    half-away-from-zero); selection/ranking uses the raw scores and is
    verified identical to the exact path (test_operators)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk_vectorized(
        emb, _query_vectors(spark, sf_dir), k=5)
    return out.withColumn("cos_sim", F.round("cos_sim", 6))


@q("sim_near_dup", f"""
WITH pairs AS (
    SELECT e.vec_id AS id_a, q.vec_id AS id_b,
           {_DOT} / ({_NORM_E} * {_NORM_Q}) AS cos_sim
    FROM embeddings e, embeddings q
    WHERE e.vec_id < q.vec_id
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.35
""")
def sim_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs via the banded-LSH default
    path (candidates = pairs sharing ≥1 sign-sketch band, exact cosine
    rescoring).  The oracle stays all-pairs SQL: at this corpus the banding
    has verified recall 1 (all 271 qualifying pairs co-bucket under every
    tested seed), so the bucketed Spark plan must hash-match it exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        emb, threshold=0.35, bands=8, bits_per_band=1, seed=0)


def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine between ``a.embedding``-style refs — same sequential
    fold order as operators/similarity.cosine, so values match bit-for-bit."""
    def _n(x):
        return (f"sqrt(list_reduce(list_prepend(0.0, list_transform({x}, "
                f"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (p, q) -> p + q))")
    d = (f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
         f"pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))), (p, q) -> p + q)")
    return f"{d} / ({_n(a)} * {_n(b)})"


@q("sim_ivf_topk", f"""
WITH seeds AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS cell
    FROM embeddings
    QUALIFY cell <= 8
),
easg AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s)
    WHERE r = 1
),
qasg AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s WHERE e.vec_id < 3)
    WHERE r <= 2
),
cand AS (
    SELECT q.vec_id AS query_id, e.vec_id,
           {_cos_sql('e.embedding', 'q.embedding')} AS cos_sim
    FROM easg e JOIN qasg q USING (cell)
)
SELECT query_id, rank, vec_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM cand)
WHERE rank <= 5
""")
def sim_ivf_topk(spark, sf_dir):
    """IVF-style ANN: nlist=8 hash-seeded inverted cells, nprobe=2, exact
    rescoring inside probed cells.  md5 hash family so the DuckDB oracle
    replicates centroid seeding exactly (operators/similarity.ivf_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, _query_vectors(spark, sf_dir), k=5,
                               nlist=8, nprobe=2, hash_family="md5")


@q("sim_ivf_lloyd", f"""
WITH seeds AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS cell
    FROM embeddings
    QUALIFY cell <= 8
),
asg0 AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s)
    WHERE r = 1
),
mexp AS (
    SELECT cell, vec_id, unnest(embedding) AS val,
           generate_subscripts(embedding, 1) AS pos
    FROM asg0
),
means AS (
    SELECT cell, pos,
           list_reduce(list_prepend(0.0,
                       list(CAST(val AS DOUBLE) ORDER BY vec_id)),
                       (a, b) -> a + b) / count(*) AS c
    FROM mexp GROUP BY cell, pos
),
cents AS (
    SELECT s.cell, COALESCE(m.mvec, s.cvec) AS cvec
    FROM seeds s LEFT JOIN (SELECT cell, list(c ORDER BY pos) AS mvec
                            FROM means GROUP BY cell) m
      ON s.cell = m.cell
),
easg AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, cents s)
    WHERE r = 1
),
qasg AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, cents s WHERE e.vec_id < 3)
    WHERE r <= 2
),
cand AS (
    SELECT q.vec_id AS query_id, e.vec_id,
           {_cos_sql('e.embedding', 'q.embedding')} AS cos_sim
    FROM easg e JOIN qasg q USING (cell)
)
SELECT query_id, rank, vec_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM cand)
WHERE rank <= 5
""")
def sim_ivf_lloyd(spark, sf_dir):
    """IVF ANN with ONE k-means (Lloyd) refinement of the hash-seeded
    centroids: cells re-center on their element-wise means before the
    nprobe search (operators/similarity._lloyd_step; exact_means so the
    sorted-fold means match the SQL oracle bit-for-bit)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, _query_vectors(spark, sf_dir), k=5,
                               nlist=8, nprobe=2, hash_family="md5",
                               lloyd_iters=1, exact_means=True)


def _l2sq_sql(a: str, b: str) -> str:
    """DuckDB squared-L2 with the same sequential fold order as
    operators/similarity._l2sq — bit-for-bit replicable."""
    return (f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
            f"pr -> (CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE)) * "
            f"(CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE)))), "
            f"(p, q) -> p + q)")


_PQB = "[bl.b*16+1 : bl.b*16+16]"


@q("sim_pq_topk", f"""
WITH cb AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS code
    FROM embeddings
    QUALIFY code <= 16
),
blocks AS (SELECT unnest(range(4)) AS b),
ecodes AS (
    SELECT vec_id, b, code FROM (
        SELECT e.vec_id, bl.b, c.code,
               row_number() OVER (PARTITION BY e.vec_id, bl.b
                                  ORDER BY {_l2sq_sql('e.embedding' + _PQB,
                                                      'c.cvec' + _PQB)},
                                           c.code) AS r
        FROM embeddings e, cb c, blocks bl)
    WHERE r = 1
),
adc AS (
    SELECT q.vec_id AS query_id, ec.vec_id,
           list_reduce(list_prepend(0.0,
               list({_l2sq_sql('q.embedding' + _PQB, 'c.cvec' + _PQB)}
                    ORDER BY ec.b)),
               (p, s) -> p + s) AS approx_dist
    FROM ecodes ec JOIN cb c ON c.code = ec.code
         JOIN blocks bl ON bl.b = ec.b,
         (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3) q
    GROUP BY q.vec_id, ec.vec_id
)
SELECT query_id, rank, vec_id, approx_dist, cos_sim FROM (
    SELECT a.query_id, a.vec_id, a.approx_dist,
           {_cos_sql('ee.embedding', 'qe.embedding')} AS cos_sim,
           row_number() OVER (PARTITION BY a.query_id
                              ORDER BY a.approx_dist, a.vec_id) AS rank
    FROM adc a JOIN embeddings ee ON ee.vec_id = a.vec_id
               JOIN embeddings qe ON qe.vec_id = a.query_id)
WHERE rank <= 5
""")
def sim_pq_topk(spark, sf_dir):
    """Product-quantization ANN: 4 sub-blocks x 16 codes from hash-ranked
    corpus vectors, map-side encoding, ADC lookup-table search (m table
    lookups per pair instead of a 64-float scan) — the memory-bound ANN
    scale path (operators/similarity.pq_topk; md5 family so the DuckDB
    oracle replicates the codebook exactly)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_topk(emb, _query_vectors(spark, sf_dir), k=5,
                              m=4, n_codes=16, dim=64, hash_family="md5")


@q("sim_ivfpq_topk", f"""
WITH seeds AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS cell
    FROM embeddings
    QUALIFY cell <= 8
),
easg AS (
    SELECT vec_id, cell FROM (
        SELECT e.vec_id, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s)
    WHERE r = 1
),
qasg AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s WHERE e.vec_id < 3)
    WHERE r <= 2
),
cb AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS code
    FROM embeddings
    QUALIFY code <= 16
),
blocks AS (SELECT unnest(range(4)) AS b),
ecodes AS (
    SELECT vec_id, b, code FROM (
        SELECT e.vec_id, bl.b, c.code,
               row_number() OVER (PARTITION BY e.vec_id, bl.b
                                  ORDER BY {_l2sq_sql('e.embedding' + _PQB,
                                                      'c.cvec' + _PQB)},
                                           c.code) AS r
        FROM embeddings e, cb c, blocks bl)
    WHERE r = 1
),
adc AS (
    SELECT q.vec_id AS query_id, ec.vec_id,
           list_reduce(list_prepend(0.0,
               list({_l2sq_sql('q.embedding' + _PQB, 'c.cvec' + _PQB)}
                    ORDER BY ec.b)),
               (p, s) -> p + s) AS approx_dist
    FROM ecodes ec JOIN cb c ON c.code = ec.code
         JOIN blocks bl ON bl.b = ec.b
         JOIN easg ee ON ee.vec_id = ec.vec_id
         JOIN qasg q ON q.cell = ee.cell
    GROUP BY q.vec_id, ec.vec_id
)
SELECT query_id, rank, vec_id, approx_dist, cos_sim FROM (
    SELECT a.query_id, a.vec_id, a.approx_dist,
           {_cos_sql('ee.embedding', 'qe.embedding')} AS cos_sim,
           row_number() OVER (PARTITION BY a.query_id
                              ORDER BY a.approx_dist, a.vec_id) AS rank
    FROM adc a JOIN embeddings ee ON ee.vec_id = a.vec_id
               JOIN embeddings qe ON qe.vec_id = a.query_id)
WHERE rank <= 5
""")
def sim_ivfpq_topk(spark, sf_dir):
    """IVFADC composition: 8 hash-seeded IVF cells bound the candidate set
    (nprobe=2 per query), 4x16 product-quantization codes score candidates
    via ADC lookup tables — the billion-vector layout where search touches
    ~nprobe/nlist of the corpus and pays m table lookups per pair
    (operators/similarity.ivfpq_topk; md5 family so the DuckDB oracle
    replicates centroids and codebook exactly)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(emb, _query_vectors(spark, sf_dir), k=5,
                                 nlist=8, nprobe=2, m=4, n_codes=16, dim=64,
                                 hash_family="md5")


_RES_E = ("list_transform(list_zip(e.embedding, a.ccvec), "
          "pr -> CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))")
_RES_Q = ("list_transform(list_zip(qr.embedding, qr.ccvec), "
          "pr -> CAST(pr[1] AS DOUBLE) - CAST(pr[2] AS DOUBLE))")


@q("sim_ivfpq_residual", f"""
WITH seeds AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS cell
    FROM embeddings
    QUALIFY cell <= 8
),
easg AS (
    SELECT vec_id, cell, ccvec FROM (
        SELECT e.vec_id, s.cell, s.cvec AS ccvec,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s)
    WHERE r = 1
),
qasg AS (
    SELECT vec_id, embedding, cell, ccvec FROM (
        SELECT e.vec_id, e.embedding, s.cell, s.cvec AS ccvec,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s WHERE e.vec_id < 3)
    WHERE r <= 2
),
cb AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS code
    FROM embeddings
    QUALIFY code <= 16
),
blocks AS (SELECT unnest(range(4)) AS b),
eres AS (
    SELECT e.vec_id, a.cell, {_RES_E} AS rv
    FROM embeddings e JOIN easg a ON a.vec_id = e.vec_id
),
ecodes AS (
    SELECT vec_id, cell, b, code FROM (
        SELECT e.vec_id, e.cell, bl.b, c.code,
               row_number() OVER (PARTITION BY e.vec_id, bl.b
                                  ORDER BY {_l2sq_sql('e.rv' + _PQB,
                                                      'c.cvec' + _PQB)},
                                           c.code) AS r
        FROM eres e, cb c, blocks bl)
    WHERE r = 1
),
qres AS (
    SELECT qr.vec_id AS query_id, qr.cell, {_RES_Q} AS rqv
    FROM qasg qr
),
adc AS (
    SELECT q.query_id, ec.vec_id,
           list_reduce(list_prepend(0.0,
               list({_l2sq_sql('q.rqv' + _PQB, 'c.cvec' + _PQB)}
                    ORDER BY ec.b)),
               (p, s) -> p + s) AS approx_dist
    FROM ecodes ec JOIN cb c ON c.code = ec.code
         JOIN blocks bl ON bl.b = ec.b
         JOIN qres q ON q.cell = ec.cell
    GROUP BY q.query_id, ec.vec_id
)
SELECT query_id, rank, vec_id, approx_dist, cos_sim FROM (
    SELECT a.query_id, a.vec_id, a.approx_dist,
           {_cos_sql('ee.embedding', 'qe.embedding')} AS cos_sim,
           row_number() OVER (PARTITION BY a.query_id
                              ORDER BY a.approx_dist, a.vec_id) AS rank
    FROM adc a JOIN embeddings ee ON ee.vec_id = a.vec_id
               JOIN embeddings qe ON qe.vec_id = a.query_id)
WHERE rank <= 5
""")
def sim_ivfpq_residual(spark, sf_dir):
    """IVFADC with residual encoding (Jégou et al. 2011 §V.A, the classic
    refinement): PQ codes quantize v − centroid(cell) and the query ADC
    table is built from q − centroid(probed cell), concentrating the
    quantizer's dynamic range on within-cell variation.  Same plan shape
    as sim_ivfpq_topk — the probe carries the centroid, so the residual is
    one extra map-side zip_with per side; the corpus still never shuffles
    (operators/similarity.ivfpq_topk(residual=True); md5 family so the
    DuckDB oracle replicates centroids and codebook exactly)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(emb, _query_vectors(spark, sf_dir), k=5,
                                 nlist=8, nprobe=2, m=4, n_codes=16, dim=64,
                                 hash_family="md5", residual=True)


@q("sim_semantic_dedup", f"""
WITH seeds AS (
    SELECT embedding AS cvec,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS cell
    FROM embeddings
    QUALIFY cell <= 4
),
asg AS (
    SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e.embedding', 's.cvec')}
                                           DESC, s.cell) AS r
        FROM embeddings e, seeds s)
    WHERE r = 1
),
drops AS (
    SELECT DISTINCT b.vec_id
    FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.35
)
SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS keep
FROM asg a LEFT JOIN drops d ON a.vec_id = d.vec_id
""")
def sim_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup: 4 hash-seeded clusters, drop any
    vector cosine-≥0.35-similar to a lower-id cluster member (md5 hash
    family so the oracle replicates seeding — operators/similarity
    .semantic_dedup)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, k_clusters=4, threshold=0.35,
                                     hash_family="md5")


@q("multimodal_meta_stats", """
SELECT 'raw' AS codec, count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
""")
def multimodal_meta_stats(spark, sf_dir):
    """Metadata-only multimodal aggregate (payload column pruned at scan).

    Oracle note: sum(INTEGER) in DuckDB is HUGEINT, which pandas renders as
    float64 — CAST to BIGINT so both sides hash as int64.
    """
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media_metadata_stats(media)


# The 'raw' feature vector is deterministic byte statistics, so it IS
# SQL-expressible: the test documents are pure ASCII (octet_length==length),
# hence per-char code points equal UTF-8 byte values.
@q("multimodal_features", """
WITH b AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS nb,
           list_transform(string_split(text, ''), x -> ascii(x)) AS bytes
    FROM documents
)
SELECT doc_id AS media_id,
       nb AS n_bytes,
       CAST(list_aggregate(bytes, 'sum') % 2147483648 AS BIGINT) AS checksum,
       CAST(bytes[1] AS BIGINT) AS first_byte,
       CAST(bytes[-1] AS BIGINT) AS last_byte,
       CAST(list_aggregate(bytes, 'sum') % 997 AS BIGINT) AS byte_mod
FROM b
""")
def multimodal_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction, fully oracle-checked:
    the deterministic 'raw' codec features are recomputed in SQL by the
    oracle from the same document bytes."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id", "n_bytes", "checksum",
        F.element_at("feature", 2).cast("long").alias("first_byte"),
        F.element_at("feature", 3).cast("long").alias("last_byte"),
        F.element_at("feature", 4).cast("long").alias("byte_mod"))


@q("multimodal_resize", """
SELECT doc_id AS media_id,
       16 AS width, 16 AS height, CAST(256 AS BIGINT) AS n_bytes,
       md5(substring(text, 1, 256) ||
           repeat(chr(0), greatest(0, 256 - length(text)))) AS payload_md5
FROM documents
""")
def multimodal_resize(spark, sf_dir):
    """Resize plumbing over binary payloads (deterministic 'raw' fake:
    truncate/zero-pad to 16x16 bytes).  The oracle recomputes the padded
    bytes in SQL (ASCII corpus: VARCHAR md5 == payload-bytes md5) so the
    mapInPandas batch path is value-checked, not just row-counted."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = resize_media(media, 16, 16)
    return out.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"))


@q("multimodal_frames", """
WITH f AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, CAST(ceil(length(text) / 64.0) AS INT) - 1)) AS idx
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(idx AS INTEGER) AS frame_idx,
       CAST(length(substring(text, idx * 64 + 1, 64)) AS BIGINT) AS frame_bytes,
       md5(substring(text, idx * 64 + 1, 64)) AS frame_md5
FROM f WHERE idx % 4 = 0
""")
def multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing: every 4th 64-byte frame of each payload as
    its own row (one-in/many-out mapInPandas batch shape).  Oracle rebuilds
    the same frames via substring arithmetic on the ASCII corpus."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media, frame_bytes=64, every=4)
    return frames.select(
        "media_id", "frame_idx",
        F.octet_length("frame").cast("long").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"))


@q("text_chunks", """
WITH w AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                        ' ') AS words
    FROM documents
),
c AS (
    SELECT doc_id, words, len(words) AS n,
           CASE WHEN len(words) <= 40 THEN 1
                ELSE 1 + CAST(ceil((len(words) - 40) / 30.0) AS INT) END
               AS n_chunks
    FROM w
),
e AS (
    SELECT doc_id, words, n,
           unnest(generate_series(0, n_chunks - 1)) AS i
    FROM c
)
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       CAST(least(n - i * 30, 40) AS BIGINT) AS n_words,
       array_to_string(words[i * 30 + 1 : i * 30 + 40], ' ') AS chunk
FROM e
WHERE i = 0 OR n - i * 30 - 10 >= 1
""")
def text_chunks(spark, sf_dir):
    """Overlapping fixed-size word-window chunking (40-word chunks, 10-word
    overlap) — the context-window packing step of a training pipeline.
    Narrow plan: split → sequence → slice → posexplode, no shuffle."""
    docs = _docs(spark, sf_dir)
    return text.chunk_documents(docs, chunk_words=40, overlap=10)


# hash-based sampling: md5('seed:'||key) compared to a 32-hex-digit
# threshold — lexicographic lowercase-hex compare == numeric compare, so
# DuckDB reproduces the sample membership exactly (operators/sampling.py)
@q("sample_bernoulli", """
SELECT doc_id, lang, source FROM documents
WHERE md5('0:' || CAST(doc_id AS VARCHAR))
      < '40000000000000000000000000000000'
""")
def sample_bernoulli(spark, sf_dir):
    """Deterministic 25% Bernoulli sample by keyed hash (never rand():
    reproducible under task retry, stable across repartitioning)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, 0.25, seed=0, hash_family="md5") \
        .select("doc_id", "lang", "source")


_T80 = sampling.md5_threshold(0.8)
_T90 = sampling.md5_threshold(0.9)


@q("sample_split_dataset", f"""
SELECT doc_id, lang, source,
       CASE WHEN md5('7:' || CAST(doc_id AS VARCHAR)) < '{_T80}' THEN 'train'
            WHEN md5('7:' || CAST(doc_id AS VARCHAR)) < '{_T90}' THEN 'validation'
            ELSE 'test' END AS split
FROM documents
""")
def sample_split_dataset(spark, sf_dir):
    """Deterministic 80/10/10 train/validation/test split: membership is a
    pure function of (doc_id, seed) — stable across re-runs, shard order,
    and cluster size (operators/sampling.split_dataset)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.split_dataset(
        docs, {"train": 0.8, "validation": 0.1, "test": 0.1},
        seed=7, hash_family="md5").select("doc_id", "lang", "source", "split")


@q("sample_mix_corpus", r"""
WITH w AS (
    SELECT doc_id, source,
           len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
             AS n_tokens,
           md5('0:' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
    WHERE source IN ('src0', 'src1', 'src2')
),
c AS (
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
    FROM w
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c
WHERE cum_tokens - n_tokens <
      CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 400 ELSE 200 END
""")
def sample_mix_corpus(spark, sf_dir):
    """Data-mixture selection: per-source token budgets filled greedily in
    deterministic hash order (operators/sampling.mix_corpus; md5 family so
    the oracle reproduces the ranking)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.mix_corpus(
        docs, {"src0": 800, "src1": 400, "src2": 200},
        seed=0, hash_family="md5")


@q("sample_stratified", """
SELECT doc_id, lang FROM documents
WHERE CASE
    WHEN lang = 'de' THEN md5('0:' || CAST(doc_id AS VARCHAR))
                          < '80000000000000000000000000000000'
    WHEN lang = 'en' THEN md5('0:' || CAST(doc_id AS VARCHAR))
                          < '20000000000000000000000000000000'
    ELSE TRUE END
""")
def sample_stratified(spark, sf_dir):
    """Per-language keep rates (downsample the dominant language, keep the
    tail): en 12.5%, de 50%, everything else kept — one map-side CASE
    filter, no join, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample(
        docs, "lang", {"en": 0.125, "de": 0.5}, default_rate=1.0,
        seed=0, hash_family="md5").select("doc_id", "lang")


@q("sample_fixed_k", """
SELECT doc_id, lang FROM documents
ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id
LIMIT 100
""")
def sample_fixed_k(spark, sf_dir):
    """Exactly-100 uniform sample without replacement: rank by keyed hash,
    keep the smallest (TakeOrderedAndProject — distributed top-k, no global
    sort)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_topk_sample(docs, 100, seed=0, hash_family="md5") \
        .select("doc_id", "lang")


# ----------------------------------------------------- conversion layer
@q("convert_manifest", """
SELECT '0' AS stream, strftime(ts, '%Y-%m-%d') AS date,
       min(epoch_ms(ts)) AS mint, max(epoch_ms(ts)) AS maxt,
       count(*) AS n_samples
FROM events GROUP BY 2
""")
def convert_manifest(spark, sf_dir):
    """Conversion manifest derivation (B2/B13: per-day coverage bounds)."""
    from thanos_parquet_gateway_spark.convert.convert import prepare_samples
    raw = samples_from_events(spark, sf_dir)
    df = prepare_samples(raw)
    return (df.groupBy("stream", "date")
            .agg(F.min("ts").alias("mint"), F.max("ts").alias("maxt"),
                 F.count("*").alias("n_samples")))


_TSDB_BLOCK_CACHE: dict[str, str] = {}


def _tsdb_fixture_block(spark, sf_dir: str) -> str:
    """Deterministically materialize the events table as a real Prometheus
    TSDB block (index v2 + XOR chunks + tombstones + meta.json) in /tmp —
    the differential input for convert_tsdb_block.  Duplicate (series, ts)
    samples collapse to max(value), the only TSDB-legal shape that is also
    expressible in the oracle SQL.  Driver-side on the small SF the
    correctness gate runs at; the READ side is the distributed path under
    test."""
    if sf_dir in _TSDB_BLOCK_CACHE:
        return _TSDB_BLOCK_CACHE[sf_dir]
    import tempfile

    from thanos_parquet_gateway_spark.sources.tsdb_writer import write_block

    rows = (samples_from_events(spark, sf_dir)
            .groupBy(F.element_at("labels", "__name__").alias("name"),
                     F.element_at("labels", "user").alias("user"),
                     F.element_at("labels", "shard").alias("shard"), "ts")
            .agg(F.max("value").alias("value"))
            .collect())
    series: dict[tuple, list] = {}
    for r in rows:
        series.setdefault((r["name"], r["user"], r["shard"]), []) \
              .append((r["ts"], r["value"]))
    block = tempfile.mkdtemp(prefix="tsdb_fixture_") + "/block"
    write_block(block, [
        ({"__name__": n, "user": u, "shard": s}, sorted(samples))
        for (n, u, s), samples in sorted(series.items())])
    _TSDB_BLOCK_CACHE[sf_dir] = block
    return block


@q("convert_tsdb_block", """
WITH s AS (
    SELECT event_type AS name, CAST(user_id AS VARCHAR) AS "user",
           epoch_ms(ts) AS ts, max(value) AS value
    FROM events GROUP BY 1, 2, 3
)
SELECT name, "user", count(*) AS n,
       min(ts) AS ts_min, max(ts) AS ts_max,
       min(value) AS v_min, max(value) AS v_max
FROM s GROUP BY name, "user"
""")
def convert_tsdb_block(spark, sf_dir):
    """B1 parity: native Prometheus TSDB-block ingestion
    (sources/tsdb.py; reference convert/convert.go:353-396 via
    tsdb.NewBlockChunkSeriesSet).  The events table is written into a
    REAL block dir (driver-side fixture), read back through the
    distributed index/chunks/tombstones decoder, and compared sample-
    exactly (count + ts/value extremes are float-fold-order-free) against
    SQL over the original rows — so a decode that loses, invents, or
    corrupts any sample hash-mismatches."""
    from thanos_parquet_gateway_spark.sources.tsdb import tsdb_block_samples
    block = _tsdb_fixture_block(spark, sf_dir)
    df = tsdb_block_samples(spark, block)
    return (df.groupBy(F.element_at("labels", "__name__").alias("name"),
                       F.element_at("labels", "user").alias("user"))
            .agg(F.count("*").alias("n"),
                 F.min("ts").alias("ts_min"), F.max("ts").alias("ts_max"),
                 F.min("value").alias("v_min"),
                 F.max("value").alias("v_max")))


_TSDB_STREAMS_CACHE: dict[str, str] = {}

# stream keys are deterministic (xxhash64 of the external-label set,
# reference schema/block.go:37-76) — computed once, embedded in the
# oracle SQL as literals
def _stream_key(labels: dict) -> str:
    from thanos_parquet_gateway_spark.sources.tsdb import (
        external_labels_hash,
    )
    return str(external_labels_hash(labels))


def _tsdb_two_stream_table(spark, sf_dir: str) -> str:
    """Materialize the events table as TWO Prometheus TSDB blocks with
    different external labels (replica a/b; replica b's values offset by
    +1000.0) and convert them through the multi-stream path
    (convert_tsdb_streams) — returns the converted table dir."""
    if sf_dir in _TSDB_STREAMS_CACHE:
        return _TSDB_STREAMS_CACHE[sf_dir]
    import tempfile

    from thanos_parquet_gateway_spark.sources.tsdb import (
        convert_tsdb_streams,
    )
    from thanos_parquet_gateway_spark.sources.tsdb_writer import write_block

    rows = (samples_from_events(spark, sf_dir)
            .groupBy(F.element_at("labels", "__name__").alias("name"),
                     F.element_at("labels", "user").alias("user"),
                     F.element_at("labels", "shard").alias("shard"), "ts")
            .agg(F.max("value").alias("value"))
            .collect())
    series: dict[tuple, list] = {}
    for r in rows:
        series.setdefault((r["name"], r["user"], r["shard"]), []) \
              .append((r["ts"], r["value"]))
    root = tempfile.mkdtemp(prefix="tsdb_streams_")
    for rep, off, ulid in [("a", 0.0, "01STREAMFIXTUREA0000000000"),
                           ("b", 1000.0, "01STREAMFIXTUREB0000000000")]:
        write_block(f"{root}/block_{rep}", [
            ({"__name__": n, "user": u, "shard": s},
             sorted((t, v + off) for t, v in samples))
            for (n, u, s), samples in sorted(series.items())],
            ulid=ulid,
            meta_extra={"thanos": {"labels": {"replica": rep}}})
    out = tempfile.mkdtemp(prefix="tsdb_streams_conv_")
    convert_tsdb_streams(spark, root, out)
    _TSDB_STREAMS_CACHE[sf_dir] = out
    return out


_KA = _stream_key({"replica": "a"})
_KB = _stream_key({"replica": "b"})


@q("convert_tsdb_streams", f"""
WITH s AS (
    SELECT event_type AS name, CAST(user_id AS VARCHAR) AS "user",
           epoch_ms(ts) AS ts, max(value) AS value
    FROM events GROUP BY 1, 2, 3
), streams(stream, off) AS (
    VALUES ('{_KA}', 0.0), ('{_KB}', 1000.0)
)
SELECT stream, name, count(*) AS n,
       min(ts) AS ts_min, max(ts) AS ts_max,
       min(value + off) AS v_min, max(value + off) AS v_max
FROM s CROSS JOIN streams GROUP BY stream, name
""")
def convert_tsdb_streams_q(spark, sf_dir):
    """B15 parity: multi-stream TSDB ingestion (sources/tsdb.py
    discover_streams + convert_tsdb_streams; reference TSDBDiscoverer
    locate/discover.go:495-651 keyed per schema/block.go:37-76).  Two
    blocks with different external labels (replica a/b) convert into
    per-stream partitions; the converted table is aggregated per
    (stream, name) and compared sample-exactly against SQL over the
    original rows — a conversion that merged, dropped, or cross-
    contaminated streams hash-mismatches (replica b's +1000.0 offset
    makes any mixing visible in the extremes)."""
    out = _tsdb_two_stream_table(spark, sf_dir)
    conv = spark.read.parquet(out)
    return (conv.groupBy(
                F.col("stream").cast("string").alias("stream"),
                F.element_at("labels", "__name__").alias("name"))
            .agg(F.count("*").alias("n"),
                 F.min("ts").alias("ts_min"), F.max("ts").alias("ts_max"),
                 F.min("value").alias("v_min"),
                 F.max("value").alias("v_max")))


# =====================================================================
# PromQL surface widening: modifiers, subqueries, vector matching,
# rate-family siblings, math/time/label functions (SURVEY.md §2.C)
# =====================================================================

A_MS = T - 3 * DAY  # @-modifier anchor (2024-01-26)

@q("promql_offset", f"""
WITH {_SAMPLES},
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM samples
    WHERE name = 'click' AND ts > {T - DAY - LOOKBACK} AND ts <= {T - DAY}
)
SELECT shard,
       {_ksum('list(value ORDER BY "user")')} AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_offset(spark, sf_dir):
    """offset modifier shifts the eval window (db_test.go:944-1004)."""
    r = _engine(spark, sf_dir).query_instant("sum by (shard) (click offset 1d)", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_at", f"""
WITH {_SAMPLES},
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM samples
    WHERE name = 'click' AND ts > {A_MS - LOOKBACK} AND ts <= {A_MS}
)
SELECT shard,
       {_ksum('list(value ORDER BY "user")')} AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_at(spark, sf_dir):
    """@-modifier pins the eval timestamp (db_test.go:944-1004)."""
    r = _engine(spark, sf_dir).query_instant(
        f"sum by (shard) (click @ {A_MS // 1000})", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_at_rate", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
win AS (
    SELECT CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM events_ms e
    WHERE e.event_type = 'click'
      AND e.ts > {A_MS - 2 * DAY} AND e.ts <= {A_MS}
),
w2 AS (
    SELECT *, lag(value) OVER (PARTITION BY "user" ORDER BY ts, value) AS pv
    FROM win
),
agg AS (
    SELECT "user", count(*) AS n,
           CAST(min(ts) AS BIGINT) AS first_t, CAST(max(ts) AS BIGINT) AS last_t,
           first(value ORDER BY ts, value) AS first_v,
           last(value ORDER BY ts, value) AS last_v,
           list_reduce(list_prepend(0.0,
               list(CASE WHEN value < pv THEN pv ELSE 0.0 END ORDER BY ts, value)),
               (a, b) -> a + b) AS corr
    FROM w2 GROUP BY "user"
),
ex AS (
    SELECT "user", n, first_t, last_t,
           (last_v - first_v) + corr AS delta,
           CAST(first_t - {A_MS - 2 * DAY} AS DOUBLE) / 1000.0 AS dur_start,
           CAST({A_MS} - last_t AS DOUBLE) / 1000.0 AS dur_end,
           CAST(last_t - first_t AS DOUBLE) / 1000.0 AS sampled,
           first_v
    FROM agg WHERE n >= 2
),
ex2 AS (
    SELECT *, sampled / (CAST(n AS DOUBLE) - 1) AS avg_dur,
           CASE WHEN dur_start >= (sampled / (CAST(n AS DOUBLE) - 1)) * 1.1
                THEN (sampled / (CAST(n AS DOUBLE) - 1)) / 2
                ELSE dur_start END AS dur_start_c
    FROM ex
),
ex3 AS (
    SELECT "user", delta,
           (sampled
            + CASE WHEN delta > 0 AND first_v >= 0
                        AND sampled * (first_v / delta) < dur_start_c
                   THEN sampled * (first_v / delta) ELSE dur_start_c END
            + CASE WHEN dur_end >= avg_dur * 1.1 THEN avg_dur / 2 ELSE dur_end END)
           / sampled AS factor
    FROM ex2
)
SELECT "user", delta * factor / {2 * DAY / 1000.0} AS value FROM ex3
""")
def promql_at_rate(spark, sf_dir):
    """rate() under an @ anchor: the extrapolation range is (at-2d, at]
    regardless of the outer eval time (upstream setOffsetForAtModifier
    turns @ into an offset; the r9 anchor fix).  The oracle computes the
    full extrapolatedRate at the anchor independently."""
    r = _engine(spark, sf_dir).query_instant(
        f"rate(click[2d] @ {A_MS // 1000})", T)
    return r.df.select(_lbl("user").alias("user"), "value")


@q("promql_subquery", f"""
WITH {_SAMPLES},
sgrid AS (SELECT unnest(generate_series({T - 6 * DAY}, {T}, {DAY})) AS g),
slast AS (
    SELECT g, shard, "user", value,
           row_number() OVER (PARTITION BY g, shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM sgrid JOIN samples
      ON name = 'click' AND ts > g - {LOOKBACK} AND ts <= g
),
ssum AS (
    SELECT g, shard,
           {_ksum('list(value ORDER BY "user")')} AS v
    FROM slast WHERE rn = 1 GROUP BY g, shard
)
SELECT shard, max(v) AS value FROM ssum GROUP BY shard
""")
def promql_subquery(spark, sf_dir):
    """Subquery: inner expr on an epoch-aligned grid, re-windowed
    (db_test.go:1005-1014)."""
    r = _engine(spark, sf_dir).query_instant(
        "max_over_time(sum by (shard) (click)[7d:1d])", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_group_left", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts FROM events),
c7 AS (
    SELECT CAST(user_id % 8 AS VARCHAR) AS shard, CAST(user_id AS VARCHAR) AS "user",
           CAST(count(*) AS DOUBLE) AS v
    FROM events_ms WHERE event_type = 'click' AND ts > {T - 7 * DAY} AND ts <= {T}
    GROUP BY 1, 2
),
tot AS (
    SELECT shard,
           list_reduce(list_prepend(0.0, list(v ORDER BY "user")),
                       (a, b) -> a + b) AS tv
    FROM c7 GROUP BY shard
)
SELECT c."user" AS "user", c.shard AS shard, c.v / t.tv AS value
FROM c7 c JOIN tot t USING (shard)
""")
def promql_group_left(spark, sf_dir):
    """Many-to-one vector matching: per-user share of shard total
    (db_test.go:660-680)."""
    r = _engine(spark, sf_dir).query_instant(
        "count_over_time(click[7d]) / on(shard) group_left "
        "sum by (shard) (count_over_time(click[7d]))", T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_bool_cmp", f"""
WITH {_SAMPLES}, {_LAST}
SELECT shard, CAST(sum(CASE WHEN value > 40 THEN 1 ELSE 0 END) AS DOUBLE) AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_bool_cmp(spark, sf_dir):
    """bool-modifier comparison → 0/1 vector (integer-exact sum)."""
    r = _engine(spark, sf_dir).query_instant("sum by (shard) (click > bool 40)", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_or", f"""
WITH {_SAMPLES},
lastn AS (
    SELECT name, shard, "user", ts, value,
           row_number() OVER (PARTITION BY name, shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM samples
    WHERE name IN ('click', 'view') AND ts > {T - LOOKBACK} AND ts <= {T}
),
c AS (SELECT * FROM lastn WHERE rn = 1 AND name = 'click'),
v AS (SELECT * FROM lastn WHERE rn = 1 AND name = 'view')
SELECT name AS __name__, shard, "user", value FROM c
UNION ALL
SELECT v.name, v.shard, v."user", v.value
FROM v ANTI JOIN c ON c.shard = v.shard AND c."user" = v."user"
""")
def promql_or(spark, sf_dir):
    """or set-op: lhs wins on matching label sets (db_test.go:530-543)."""
    r = _engine(spark, sf_dir).query_instant("click or view", T)
    return r.df.select(_lbl("__name__").alias("__name__"),
                       _lbl("shard").alias("shard"),
                       _lbl("user").alias("user"), "value")


_DELTA_CORE = f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'purchase' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
agg AS (
    SELECT t, "user", count(*) AS n,
           CAST(min(ts) AS BIGINT) AS first_t, CAST(max(ts) AS BIGINT) AS last_t,
           first(value ORDER BY ts, value) AS first_v,
           last(value ORDER BY ts, value) AS last_v
    FROM win GROUP BY t, "user"
),
ex AS (
    SELECT t, "user", n, last_v - first_v AS delta,
           CAST(first_t - (t - {2 * DAY}) AS DOUBLE) / 1000.0 AS dur_start,
           CAST(t - last_t AS DOUBLE) / 1000.0 AS dur_end,
           CAST(last_t - first_t AS DOUBLE) / 1000.0 AS sampled
    FROM agg WHERE n >= 2
),
ex2 AS (
    SELECT *, sampled / (CAST(n AS DOUBLE) - 1) AS avg_dur FROM ex
)"""

@q("promql_delta", _DELTA_CORE + """
SELECT t, "user",
       delta * ((sampled
            + CASE WHEN dur_start >= avg_dur * 1.1 THEN avg_dur / 2 ELSE dur_start END
            + CASE WHEN dur_end >= avg_dur * 1.1 THEN avg_dur / 2 ELSE dur_end END)
           / sampled) AS value
FROM ex2
""")
def promql_delta(spark, sf_dir):
    """Gauge delta: extrapolation without counter correction/zero clamp."""
    r = _engine(spark, sf_dir).query_range("delta(purchase[2d])",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_irate", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value,
           row_number() OVER (PARTITION BY g.t, e.user_id
                              ORDER BY e.ts DESC, e.value DESC) AS rn
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
p AS (
    SELECT t, "user",
           max(CASE WHEN rn = 1 THEN ts END) AS t1,
           max(CASE WHEN rn = 1 THEN value END) AS v1,
           max(CASE WHEN rn = 2 THEN ts END) AS t2,
           max(CASE WHEN rn = 2 THEN value END) AS v2,
           count(*) AS n
    FROM win GROUP BY t, "user"
)
SELECT t, "user",
       (CASE WHEN v1 >= v2 THEN v1 - v2 ELSE v1 END)
         / (CAST(t1 - t2 AS DOUBLE) / 1000.0) AS value
FROM p WHERE n >= 2
""")
def promql_irate(spark, sf_dir):
    """irate: last two samples only (counter-reset aware)."""
    r = _engine(spark, sf_dir).query_range("irate(click[2d])",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_resets_changes", f"""
WITH {_SAMPLES},
w AS (
    SELECT "user", ts, value,
           lag(value) OVER (PARTITION BY "user" ORDER BY ts, value) AS pv
    FROM samples WHERE name = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT "user",
       CAST(sum(CASE WHEN value < pv THEN 1 ELSE 0 END) AS DOUBLE) AS resets,
       CAST(sum(CASE WHEN value <> pv THEN 1 ELSE 0 END) AS DOUBLE) AS changes
FROM w GROUP BY "user"
""")
def promql_resets_changes(spark, sf_dir):
    """resets + changes counting folds over the window."""
    eng = _engine(spark, sf_dir)
    rs = eng.query_instant("resets(click[7d])", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("resets"))
    ch = eng.query_instant("changes(click[7d])", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("changes"))
    return rs.join(ch, ["user"])


# ---------------------------------------------------------------------
# Production-mode oracle entries (r13): each runs deterministic=False —
# the SAME native-aggregation code path bench.py times (the rest of the
# registry runs deterministic=True by contract).  Only queries whose
# production math is BIT-EXACT under any partition order qualify for the
# exact-compare oracle: window counts and cross-series sums of
# integer-valued doubles (exact below 2^53), 0/1 transition sums over lag
# pairs, and last-two-sample selections ((series, ts) is unique in the
# corpus, so max_by picks deterministically).  The float-reassociating
# native families (sum/avg/stddev_over_time, rate's multi-reset correction
# sum, the covar_pop/var_pop regression) CANNOT hash-match an exact oracle
# by construction — their equivalence evidence is the det-vs-prod
# differential tests in tests/test_promql_eval.py, which the default
# pytest run executes.
def _engine_prod(spark: SparkSession, sf_dir: str) -> PromQLEngine:
    return PromQLEngine(samples_from_events(spark, sf_dir),
                        lookback_ms=LOOKBACK, deterministic=False)


@q("promql_prod_range_count", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id % 8 AS VARCHAR) AS shard, e.user_id, count(*) AS c
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {DAY} AND e.ts <= g.t
    GROUP BY 1, 2, 3
)
SELECT t, shard, CAST(sum(c) AS DOUBLE) AS value
FROM win GROUP BY t, shard
""")
def promql_prod_range_count(spark, sf_dir):
    """Production over_time family + cross-series aggregation: native
    count_over_time (codegen HashAggregate count(1)) under a native sum by
    — integer-valued doubles, exact under any aggregation order."""
    r = _engine_prod(spark, sf_dir).query_range(
        "sum by (shard) (count_over_time(click[1d]))", R_START, R_END, STEP)
    return r.df.select("t", _lbl("shard").alias("shard"), "value")


@q("promql_prod_irate", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value,
           row_number() OVER (PARTITION BY g.t, e.user_id
                              ORDER BY e.ts DESC, e.value DESC) AS rn
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
p AS (
    SELECT t, "user",
           max(CASE WHEN rn = 1 THEN ts END) AS t1,
           max(CASE WHEN rn = 1 THEN value END) AS v1,
           max(CASE WHEN rn = 2 THEN ts END) AS t2,
           max(CASE WHEN rn = 2 THEN value END) AS v2,
           count(*) AS n
    FROM win GROUP BY t, "user"
)
SELECT t, "user",
       (CASE WHEN v1 >= v2 THEN v1 - v2 ELSE v1 END)
         / (CAST(t1 - t2 AS DOUBLE) / 1000.0) AS value
FROM p WHERE n >= 2
""")
def promql_prod_irate(spark, sf_dir):
    """Production rate family (lag-pair machinery): irate reads the last
    two samples via native max_by selections — exact, single division."""
    r = _engine_prod(spark, sf_dir).query_range("irate(click[2d])",
                                                R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_prod_resets_changes", f"""
WITH {_SAMPLES},
w AS (
    SELECT "user", ts, value,
           lag(value) OVER (PARTITION BY "user" ORDER BY ts, value) AS pv
    FROM samples WHERE name = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT "user",
       CAST(sum(CASE WHEN value < pv THEN 1 ELSE 0 END) AS DOUBLE) AS resets,
       CAST(sum(CASE WHEN value <> pv THEN 1 ELSE 0 END) AS DOUBLE) AS changes
FROM w GROUP BY "user"
""")
def promql_prod_resets_changes(spark, sf_dir):
    """Production resets/changes: native sums of 0/1 over the pre-explode
    lag pairs — integer-exact, no float-reassociation trade."""
    eng = _engine_prod(spark, sf_dir)
    rs = eng.query_instant("resets(click[7d])", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("resets"))
    ch = eng.query_instant("changes(click[7d])", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("changes"))
    return rs.join(ch, ["user"])


_LINREG_BASE = f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
base AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
)"""

@q("promql_deriv", _LINREG_BASE + """,
f AS (SELECT t, "user", CAST(min(ts) AS BIGINT) AS t0, count(*) AS n
      FROM base GROUP BY t, "user"),
s AS (
    SELECT b.t, b."user", any_value(f.n) AS n,
        list_reduce(list_prepend(0.0,
            list(CAST(b.ts - f.t0 AS DOUBLE) / 1000.0 ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sx,
        list_reduce(list_prepend(0.0, list(b.value ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sy,
        list_reduce(list_prepend(0.0,
            list(CAST(b.ts - f.t0 AS DOUBLE) / 1000.0 * b.value ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sxy,
        list_reduce(list_prepend(0.0,
            list(CAST(b.ts - f.t0 AS DOUBLE) / 1000.0 * (CAST(b.ts - f.t0 AS DOUBLE) / 1000.0)
                 ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sx2
    FROM base b JOIN f USING (t, "user") GROUP BY b.t, b."user"
)
SELECT t, "user",
       (sxy - sx * sy / CAST(n AS DOUBLE)) / (sx2 - sx * sx / CAST(n AS DOUBLE)) AS value
FROM s WHERE n >= 2
""")
def promql_deriv(spark, sf_dir):
    """deriv: least-squares slope, x anchored at first sample."""
    r = _engine(spark, sf_dir).query_range("deriv(click[2d])",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_predict_linear", _LINREG_BASE + """,
s AS (
    SELECT b.t, b."user", count(*) AS n,
        list_reduce(list_prepend(0.0,
            list(CAST(b.ts - b.t AS DOUBLE) / 1000.0 ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sx,
        list_reduce(list_prepend(0.0, list(b.value ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sy,
        list_reduce(list_prepend(0.0,
            list(CAST(b.ts - b.t AS DOUBLE) / 1000.0 * b.value ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sxy,
        list_reduce(list_prepend(0.0,
            list(CAST(b.ts - b.t AS DOUBLE) / 1000.0 * (CAST(b.ts - b.t AS DOUBLE) / 1000.0)
                 ORDER BY b.ts, b.value)),
            (a, c) -> a + c) AS sx2
    FROM base b GROUP BY b.t, b."user"
),
sl AS (
    SELECT t, "user", n,
           (sxy - sx * sy / CAST(n AS DOUBLE)) / (sx2 - sx * sx / CAST(n AS DOUBLE)) AS slope,
           sy, sx
    FROM s WHERE n >= 2
)
SELECT t, "user",
       (sy / CAST(n AS DOUBLE) - slope * sx / CAST(n AS DOUBLE)) + slope * 3600.0 AS value
FROM sl
""")
def promql_predict_linear(spark, sf_dir):
    """predict_linear: regression intercept anchored at eval time t."""
    r = _engine(spark, sf_dir).query_range("predict_linear(click[2d], 3600)",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_math_clamp", f"""
WITH {_SAMPLES}, {_LAST}
SELECT "user", shard, least(greatest(sqrt(value), 2.0), 6.0) AS value
FROM last WHERE rn = 1
""")
def promql_math_clamp(spark, sf_dir):
    """Math function composition: clamp(sqrt(v), 2, 6) (db_test.go:595-615)."""
    r = _engine(spark, sf_dir).query_instant("clamp(sqrt(click), 2, 6)", T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_day_of_week", f"""
WITH {_SAMPLES}, {_LAST}
SELECT "user",
       CAST((CAST(floor(ts / 1000.0 / 86400.0) AS BIGINT) + 4) % 7 AS DOUBLE) AS value
FROM last WHERE rn = 1
""")
def promql_day_of_week(spark, sf_dir):
    """Time function over sample timestamps (0 = Sunday, Prometheus rule)."""
    r = _engine(spark, sf_dir).query_instant("day_of_week(timestamp(click))", T)
    return r.df.select(_lbl("user").alias("user"), "value")


@q("promql_stddev_by", f"""
WITH {_SAMPLES}, {_LAST},
g AS (
    SELECT shard, list(value ORDER BY "user") AS vals
    FROM last WHERE rn = 1 GROUP BY shard
),
m AS (
    SELECT shard, vals,
           list_reduce(list_prepend(0.0, vals), (a, b) -> a + b) / len(vals) AS mean
    FROM g
)
SELECT shard,
       sqrt(list_reduce(list_prepend(0.0,
                list_transform(vals, v -> (v - mean) * (v - mean))),
            (a, b) -> a + b) / len(vals)) AS value
FROM m
""")
def promql_stddev_by(spark, sf_dir):
    """stddev aggregation (population, two-pass order-stable fold)."""
    r = _engine(spark, sf_dir).query_instant("stddev by (shard) (click)", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_label_join", f"""
WITH {_SAMPLES}, {_LAST}
SELECT shard || '-' || "user" AS combo, CAST(count(*) AS DOUBLE) AS value
FROM last WHERE rn = 1 GROUP BY 1
""")
def promql_label_join(spark, sf_dir):
    """label_join rewrites the label map, then count by the new label."""
    r = _engine(spark, sf_dir).query_instant(
        'count by (combo) (label_join(click, "combo", "-", "shard", "user"))', T)
    return r.df.select(_lbl("combo").alias("combo"), "value")


# 4 deterministic hyperplanes over the 64-dim embeddings (ANN scale path)
_PLANES = [[float(((d * (i + 3)) % 7) - 3) for d in range(64)] for i in range(4)]


def _plane_sql(vec_expr: str) -> str:
    """Bucket-signature SQL mirroring similarity.hyperplane_signature."""
    bits = []
    for p in _PLANES:
        lit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in p) + "]"
        dot = (f"list_reduce(list_prepend(0.0, "
               f"list_transform(generate_series(1, len({vec_expr})), "
               f"j -> CAST({vec_expr}[j] AS DOUBLE) * ({lit})[j])), (a, b) -> a + b)")
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


@q("sim_lsh_topk", f"""
WITH eb AS (SELECT vec_id, embedding, {_plane_sql('embedding')} AS bucket
            FROM embeddings),
qb AS (SELECT vec_id, embedding, bucket FROM eb WHERE vec_id < 3),
scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           {_DOT} / ({_NORM_E} * {_NORM_Q}) AS cos_sim
    FROM eb e JOIN qb q ON e.bucket = q.bucket
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, rank, vec_id, cos_sim FROM r WHERE rank <= 5
""")
def sim_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN top-k (the 100TB path: equi-join on the
    sign-sketch bucket key instead of a full cross join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, _query_vectors(spark, sf_dir),
                               planes=_PLANES, k=5)


@q("events_retention_cohorts", """
WITH days AS (
    SELECT user_id, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day
    FROM events GROUP BY 1, 2
),
cohorts AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
sizes AS (SELECT cohort_day, count(*) AS cohort_size
          FROM cohorts GROUP BY 1)
SELECT c.cohort_day, d.day - c.cohort_day AS day_k,
       CAST(count(DISTINCT d.user_id) AS DOUBLE) AS active_users,
       CAST(count(DISTINCT d.user_id) AS DOUBLE)
           / CAST(s.cohort_size AS DOUBLE) AS retention_rate
FROM days d JOIN cohorts c USING (user_id)
JOIN sizes s ON s.cohort_day = c.cohort_day
GROUP BY c.cohort_day, day_k, s.cohort_size
""")
def events_retention_cohorts(spark, sf_dir):
    """Cohort retention: users bucketed by first-activity day; day_k rows
    carry how many (and what fraction) were active k days later.  Scale
    shape: ONE user-keyed shuffle — collect_set(day) aggregates with
    map-side partials and is bounded by the calendar (<= days-in-range
    entries per user), the cohort day is array_min over that set, and
    day_k rows explode from it so the per-(cohort, k) count needs no
    distinct (each (user, day) is unique by construction).  The cohort
    size is the k=0 row of the same tiny aggregate, read back via a
    cohort-partitioned window — one events scan, one wide shuffle."""
    e = load_table(spark, sf_dir, "events")
    per_user = (e.select("user_id",
                         (F.col("ts_ms") / F.lit(86_400_000))
                         .cast("long").alias("day"))
                .groupBy("user_id")
                .agg(F.collect_set("day").alias("days")))
    exploded = (per_user
                .select(F.array_min("days").alias("cohort_day"),
                        F.explode("days").alias("day"))
                .select("cohort_day",
                        (F.col("day") - F.col("cohort_day"))
                        .alias("day_k")))
    counts = (exploded.groupBy("cohort_day", "day_k")
              .agg(F.count("*").cast("double").alias("active_users")))
    # cohort size = the k=0 row of the SAME tiny aggregate; a
    # cohort-partitioned window avoids re-deriving (and re-scanning) the
    # counts subtree for a join side — one events scan total
    size = F.max(F.when(F.col("day_k") == 0,
                        F.col("active_users"))).over(
        W.partitionBy("cohort_day"))
    return (counts
            .select("cohort_day", "day_k", "active_users",
                    (F.col("active_users") / size).alias("retention_rate")))


@q("events_funnel_conversion", """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
           FROM events),
views AS (
    SELECT v.user_id, v.ts_ms, v.event_id,
           CAST(floor(v.ts_ms / 86400000) AS BIGINT) AS day,
           EXISTS (SELECT 1 FROM e c
                   WHERE c.user_id = v.user_id AND c.event_type = 'click'
                     AND c.ts_ms > v.ts_ms
                     AND c.ts_ms <= v.ts_ms + 3600000) AS converted
    FROM e v WHERE v.event_type = 'view'
)
SELECT day, CAST(count(*) AS DOUBLE) AS views,
       CAST(count(*) FILTER (WHERE converted) AS DOUBLE) AS conversions,
       CAST(count(*) FILTER (WHERE converted) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS conversion_rate
FROM views GROUP BY day
""")
def events_funnel_conversion(spark, sf_dir):
    """Funnel step conversion: per day, the fraction of view events
    followed by a click from the same user within one hour.  Scale shape:
    NOT a range join — one user-keyed window pass computes each view's
    next click time (min over the following click timestamps), so the
    whole funnel costs a single user-partitioned sort shared with every
    other per-user operator, then a tiny per-day aggregate."""
    e = load_table(spark, sf_dir, "events")
    base = (e.filter(F.col("event_type").isin("view", "click"))
            .select("user_id", "event_type", "ts_ms", "event_id"))
    # next click STRICTLY after each row's timestamp: a RANGE frame
    # starting at ts+1 excludes every same-ts row, matching the oracle's
    # `c.ts_ms > v.ts_ms` exactly.  (A ROWS frame ordered by (ts, id) is
    # wrong under timestamp ties: a same-ts click sorting after the view
    # becomes the min, fails the strict guard, and masks a later
    # in-window click — confirmed wrong answer at ms-resolution scale.)
    w = (W.partitionBy("user_id").orderBy("ts_ms")
         .rangeBetween(1, W.unboundedFollowing))
    nxt = base.withColumn(
        "next_click_ts",
        F.min(F.when(F.col("event_type") == "click",
                     F.col("ts_ms"))).over(w))
    views = (nxt.filter(F.col("event_type") == "view")
             .select((F.col("ts_ms") / F.lit(86_400_000))
                     .cast("long").alias("day"),
                     (F.col("next_click_ts").isNotNull() &
                      (F.col("next_click_ts") <= F.col("ts_ms") +
                       F.lit(3_600_000))).alias("converted")))
    return (views.groupBy("day")
            .agg(F.count("*").cast("double").alias("views"),
                 F.sum(F.when(F.col("converted"), 1).otherwise(0))
                 .cast("double").alias("conversions"))
            .select("day", "views", "conversions",
                    (F.col("conversions") / F.col("views"))
                    .alias("conversion_rate")))


@q("events_funnel3_steps", """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
v AS (
    SELECT user_id, ts_ms,
           (SELECT min(c.ts_ms) FROM e c
            WHERE c.user_id = v0.user_id AND c.event_type = 'click'
              AND c.ts_ms > v0.ts_ms
              AND c.ts_ms <= v0.ts_ms + 3600000) AS step2_ts
    FROM e v0 WHERE v0.event_type = 'view'
),
v2 AS (
    SELECT user_id, ts_ms, step2_ts,
           CASE WHEN step2_ts IS NOT NULL THEN
               (SELECT min(p.ts_ms) FROM e p
                WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
                  AND p.ts_ms > v.step2_ts
                  AND p.ts_ms <= v.step2_ts + 86400000) END AS step3_ts
    FROM v
)
SELECT CAST(floor(ts_ms / 86400000) AS BIGINT) AS day,
       CAST(count(*) AS DOUBLE) AS views,
       CAST(count(step2_ts) AS DOUBLE) AS step2,
       CAST(count(step3_ts) AS DOUBLE) AS step3
FROM v2 GROUP BY day
""")
def events_funnel3_steps(spark, sf_dir):
    """Three-step ordered funnel (view -> click within 1h -> purchase
    within 1d of THAT click): per day, how many views reach each step.
    Scale shape: NOT a range join — user-partitioned window passes compute
    next-click and next-purchase times with RANGE frames (strictly-after
    semantics, tie-correct by construction: a same-ms event never
    satisfies the strict > the oracle uses), then step 3 resolves by an
    equi-join of views to their qualifying click row.  Plan audit
    (.explain): Catalyst prunes each branch's window to its one measure
    (two user-keyed shuffles of the filtered events), and the join
    broadcasts the click side at test scale / SMJs on (user_id, ts) at
    scale — bounded by the events shuffle that any per-user operator
    already pays, never all-pairs.  Same-(user, ts) clicks carry
    identical frame results, so the click side dedups on (user, ts)
    first."""
    e = load_table(spark, sf_dir, "events")
    base = (e.filter(F.col("event_type").isin("view", "click", "purchase"))
            .select("user_id", "event_type", "ts_ms"))
    w = (W.partitionBy("user_id").orderBy("ts_ms")
         .rangeBetween(1, W.unboundedFollowing))
    nxt = (base
           .withColumn("next_click_ts",
                       F.min(F.when(F.col("event_type") == "click",
                                    F.col("ts_ms"))).over(w))
           .withColumn("next_purchase_ts",
                       F.min(F.when(F.col("event_type") == "purchase",
                                    F.col("ts_ms"))).over(w)))
    views = (nxt.filter(F.col("event_type") == "view")
             .select("user_id", "ts_ms",
                     F.when(F.col("next_click_ts") <=
                            F.col("ts_ms") + F.lit(3_600_000),
                            F.col("next_click_ts")).alias("step2_ts")))
    clicks = (nxt.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts_ms").alias("c_ts"), "next_purchase_ts")
              .dropDuplicates(["c_user", "c_ts"]))
    joined = views.join(
        clicks, (views.user_id == clicks.c_user) &
                (views.step2_ts == clicks.c_ts), "left")
    step3 = F.when(F.col("step2_ts").isNotNull() &
                   (F.col("next_purchase_ts") <=
                    F.col("step2_ts") + F.lit(86_400_000)),
                   F.col("next_purchase_ts"))
    return (joined
            .select((F.col("ts_ms") / DAY).cast("long").alias("day"),
                    "step2_ts", step3.alias("step3_ts"))
            .groupBy("day")
            .agg(F.count("*").cast("double").alias("views"),
                 F.count("step2_ts").cast("double").alias("step2"),
                 F.count("step3_ts").cast("double").alias("step3")))


@q("events_hll_distinct_users")  # rows-only: HLL estimates are not
# reproducible by an independent SQL engine (DuckDB's
# approx_count_distinct is a different sketch); accuracy vs exact counts
# and the union-mergeability invariant are pinned by tests/test_operators
def events_hll_distinct_users(spark, sf_dir):
    """Mergeable distinct-count rollup (operators/sketches.py): one HLL
    sketch of user_id per (day, event_type), merged across days per
    event_type WITHOUT re-reading raw events — the store-sketches-once,
    merge-forever pattern that replaces count(distinct) at 100 TB.  The
    daily layer shuffles one ~KB binary per group per map partition; the
    merge layer shuffles one binary per (day, event_type).  Deterministic:
    HLL registers are max-folds, insensitive to row order/partitioning."""
    e = load_table(spark, sf_dir, "events")
    return (sketches.distinct_rollup(e, "user_id", by=("event_type",))
            .select("event_type",
                    F.col("days_observed").cast("long").alias("days_observed"),
                    "approx_distinct")
            .orderBy("event_type"))


@q("events_trending_topk", """
WITH day_counts AS (
    SELECT epoch_ms(ts) // 86400000 AS day, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT day, event_type, n,
           row_number() OVER (PARTITION BY day
                              ORDER BY n DESC, event_type) AS rk
    FROM day_counts
)
SELECT day, event_type, n, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""")
def events_trending_topk(spark, sf_dir):
    """Per-day trending event types: grouped top-k over a windowed count —
    the shared two-phase grouped_topk (operators/topk.py) in a plain
    analytics shape (not PromQL, not similarity).  The oracle ranks with a
    window; the engine never does — the per-day input is the aggregated
    count table, so even a million days ranks without a single-partition
    stage.  Ties break on event_type, deterministic both sides."""
    from thanos_parquet_gateway_spark.operators.topk import grouped_topk

    e = load_table(spark, sf_dir, "events")
    counts = (e.groupBy((F.col("ts_ms") / DAY).cast("long").alias("day"),
                        "event_type")
              .agg(F.count("*").alias("n")))
    key = F.struct((-F.col("n")).alias("__ord"),
                   F.col("event_type").alias("event_type"),
                   F.col("n").alias("n"))
    ranked = grouped_topk(counts, ["day"], key, 3)
    return ranked.select(
        "day", F.col("__x.event_type").alias("event_type"),
        F.col("__x.n").alias("n"),
        (F.col("__pos") + 1).cast("long").alias("rk"))


@q("events_hopping_window", f"""
SELECT w AS wstart, event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
    SELECT event_type, value,
           unnest(generate_series(
               (epoch_ms(ts) // {DAY}) * {DAY} - {6 * DAY},
               (epoch_ms(ts) // {DAY}) * {DAY}, {DAY})) AS w
    FROM events
)
GROUP BY 1, 2
""")
def events_hopping_window(spark, sf_dir):
    """Hopping window (7d window, 1d hop): explode window starts map-side —
    the batch analogue of sliding-window streaming aggregation.  The input
    is spread first when (and only when) the scan yields fewer splits than
    cores: the testdata parquet is a single row group, and the 7× explode +
    partial agg would otherwise run in one task.  A many-split 100 TB input
    skips the repartition — an unconditional one would be a full wasted
    shuffle of the fact table (scale-adaptive per the r12 plan audit)."""
    e = spread_small_scan(load_table(spark, sf_dir, "events"))
    w = e.select(
        "event_type", "value",
        F.explode(F.expr(
            f"sequence(ts_ms div {DAY} * {DAY} - {6 * DAY}, "
            f"ts_ms div {DAY} * {DAY}, {DAY})")).alias("wstart"))
    return (w.groupBy("wstart", "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value")))


@q("promql_ext_labels", f"""
WITH {_SAMPLES}, {_LAST}
SELECT shard, 'prom-a' AS prometheus,
       {_ksum('list(value ORDER BY "user")')} AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_ext_labels(spark, sf_dir):
    """External-label decoration + matcher elision (A17): the matcher on the
    constant stream label is consumed without scanning; the label is overlaid
    on results (reference search/search.go:356-376, materialize.go:73-84)."""
    eng = PromQLEngine(samples_from_events(spark, sf_dir),
                       lookback_ms=LOOKBACK, deterministic=True,
                       ext_labels={"prometheus": "prom-a"})
    r = eng.query_instant(
        'sum by (shard, prometheus) (click{prometheus="prom-a"})', T)
    return r.df.select(_lbl("shard").alias("shard"),
                       _lbl("prometheus").alias("prometheus"), "value")


@q("promql_replica_dedup", f"""
WITH raw AS (
    SELECT event_type AS name,
           CAST(user_id % 2 AS VARCHAR) AS replica,
           CAST((user_id // 2) % 8 AS VARCHAR) AS shard,
           CAST(user_id // 2 AS VARCHAR) AS "user",
           epoch_ms(ts) AS ts, value
    FROM events
),
dedup AS (
    SELECT name, shard, "user", ts, value FROM (
        SELECT *, row_number() OVER (PARTITION BY name, shard, "user", ts
                                     ORDER BY replica ASC, value DESC) AS drn
        FROM raw
    ) WHERE drn = 1
),
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM dedup
    WHERE name = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT shard,
       {_ksum('list(value ORDER BY "user")')} AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_replica_dedup(spark, sf_dir):
    """Replica-label drop + winner-replica dedup (A18/A19): HA replicas
    collapse to one series; at each (series, ts) the lowest replica key wins
    deterministically — replicas are never value-blended (reference
    db/db.go:124-128, db/shard.go:252-268)."""
    e = load_table(spark, sf_dir, "events")
    labels = F.map_from_arrays(
        F.array(F.lit("__name__"), F.lit("replica"), F.lit("shard"),
                F.lit("user")),
        F.array(F.col("event_type"),
                (F.col("user_id") % 2).cast("string"),
                ((F.col("user_id") / 2).cast("long") % 8).cast("string"),
                (F.col("user_id") / 2).cast("long").cast("string")))
    samples = e.select(F.col("event_type").alias("__name__"),
                       labels.alias("labels"),
                       F.col("ts_ms").alias("ts"), F.col("value"))
    eng = PromQLEngine(samples, lookback_ms=LOOKBACK, deterministic=True,
                       replica_labels=["replica"])
    r = eng.query_instant("sum by (shard) (click)", T)
    return r.df.select(_lbl("shard").alias("shard"), "value")


@q("promql_staleness", f"""
WITH {_SAMPLES},
su AS (
    SELECT shard, "user", ts, value FROM samples WHERE name = 'click'
    UNION ALL
    SELECT CAST(user_id % 8 AS VARCHAR), CAST(user_id AS VARCHAR),
           {T - 3_600_000}, NULL
    FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 5 = 0)
),
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM su WHERE ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT "user", shard, value FROM last WHERE rn = 1 AND value IS NOT NULL
""")
def promql_staleness(spark, sf_dir):
    """Staleness markers (SURVEY §4.2 #5): a NULL-valued marker sample is the
    long-format encoding of Prometheus staleNaN (NaN payload bits do not
    survive Arrow/Parquet canonicalization).  A marker that is the series'
    latest sample suppresses it from instant lookback; markers never enter
    range windows."""
    e = load_table(spark, sf_dir, "events")
    from thanos_parquet_gateway_spark.schema import stale_marker
    markers = (e.select("user_id").distinct()
               .filter(F.col("user_id") % 5 == 0)
               .select(
                   F.lit("click").alias("__name__"),
                   F.map_from_arrays(
                       F.array(F.lit("__name__"), F.lit("shard"), F.lit("user")),
                       F.array(F.lit("click"),
                               (F.col("user_id") % 8).cast("string"),
                               F.col("user_id").cast("string"))).alias("labels"),
                   F.lit(T - 3_600_000).cast("long").alias("ts"),
                   stale_marker().alias("value")))
    samples = samples_from_events(spark, sf_dir).unionByName(
        markers, allowMissingColumns=True)  # markers carry no __ts_raw
    eng = PromQLEngine(samples, lookback_ms=LOOKBACK, deterministic=True)
    r = eng.query_instant("click", T)
    return r.df.select(_lbl("user").alias("user"), _lbl("shard").alias("shard"),
                       "value")


@q("promql_holt_winters", f"""
WITH RECURSIVE events_ms AS (
    SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
arrs AS (
    SELECT t, "user", list(CAST(value AS DOUBLE) ORDER BY ts, value) AS vals,
           count(*) AS n
    FROM win GROUP BY t, "user" HAVING count(*) >= 2
),
-- level/trend recurrence as a recursive CTE: DuckDB list_reduce mutates
-- struct accumulators field-by-field, so a struct fold is NOT order-safe
hw AS (
    SELECT t, "user", 2 AS i, n, vals[1] AS s, vals[2] - vals[1] AS b FROM arrs
    UNION ALL
    SELECT h.t, h."user", h.i + 1, h.n,
           0.5 * a.vals[h.i] + (1.0 - 0.5) * (h.s + h.b),
           0.3 * ((0.5 * a.vals[h.i] + (1.0 - 0.5) * (h.s + h.b)) - h.s)
             + (1.0 - 0.3) * h.b
    FROM hw h JOIN arrs a ON a.t = h.t AND a."user" = h."user"
    WHERE h.i <= h.n
)
SELECT t, "user", s AS value FROM hw WHERE i = n + 1
""")
def promql_holt_winters(spark, sf_dir):
    """double_exponential_smoothing: level/trend fold (acceptance corpus)."""
    r = _engine(spark, sf_dir).query_range(
        "double_exponential_smoothing(click[2d], 0.5, 0.3)",
        R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_over_time_family", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'purchase' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
)
SELECT t, "user",
       {_ksum('list(value ORDER BY ts, value)')} AS sum_v,
       last(value ORDER BY ts, value) AS last_v,
       1.0 AS present_v
FROM win GROUP BY t, "user"
""")
def promql_over_time_family(spark, sf_dir):
    """sum/last/present_over_time joined into one frame."""
    eng = _engine(spark, sf_dir)
    s = eng.query_range("sum_over_time(purchase[2d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("sum_v"))
    l = eng.query_range("last_over_time(purchase[2d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("last_v"))
    p = eng.query_range("present_over_time(purchase[2d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("present_v"))
    return s.join(l, ["t", "user"]).join(p, ["t", "user"])


@q("promql_ts_of", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'purchase' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
ranked AS (
    SELECT t, "user", ts,
           row_number() OVER (PARTITION BY t, "user"
                              ORDER BY value DESC, ts DESC) AS rmax,
           row_number() OVER (PARTITION BY t, "user"
                              ORDER BY value ASC, ts DESC) AS rmin
    FROM win
)
SELECT t, "user",
       CAST(max(CASE WHEN rmax = 1 THEN ts END) AS DOUBLE) / 1000.0 AS ts_max_s,
       CAST(max(CASE WHEN rmin = 1 THEN ts END) AS DOUBLE) / 1000.0 AS ts_min_s,
       CAST(max(ts) AS DOUBLE) / 1000.0 AS ts_last_s,
       CAST(min(ts) AS DOUBLE) / 1000.0 AS ts_first_s
FROM ranked GROUP BY t, "user"
""")
def promql_ts_of(spark, sf_dir):
    """ts_of_{{max,min,last,first}}_over_time (experimental Prometheus
    3.x): timestamp in seconds of the window extreme/last/first sample;
    tied extremes resolve to the LAST occurrence in (ts, value) sort
    order, which the oracle expresses as max_by/min_by over
    row(value, ±ts); first is simply the earliest sample timestamp."""
    eng = _engine(spark, sf_dir)
    def one(q, alias):
        return (eng.query_range(q, R_START, R_END, STEP).df
                .select("t", _lbl("user").alias("user"),
                        F.col("value").alias(alias)))
    mx = one("ts_of_max_over_time(purchase[2d])", "ts_max_s")
    mn = one("ts_of_min_over_time(purchase[2d])", "ts_min_s")
    lst = one("ts_of_last_over_time(purchase[2d])", "ts_last_s")
    fst = one("ts_of_first_over_time(purchase[2d])", "ts_first_s")
    return (mx.join(mn, ["t", "user"]).join(lst, ["t", "user"])
              .join(fst, ["t", "user"]))


@q("promql_info", f"""
WITH {_SAMPLES}, {_LAST}
SELECT "user", shard,
       CASE WHEN CAST("user" AS BIGINT) % 2 = 0 THEN 'even' ELSE 'odd' END
         AS team,
       value
FROM last WHERE rn = 1
""")
def promql_info(spark, sf_dir):
    """info() (experimental Prometheus 3.x): click series carry synthetic
    (instance, job) identifying labels; a target_info series per user adds
    the team=even/odd data label.  The oracle recomputes the enrichment as
    user-parity over the plain lookback vector."""
    base = samples_from_events(spark, sf_dir)
    ident = F.create_map(
        F.lit("instance"), F.element_at("labels", "user"),
        F.lit("job"), F.element_at("labels", "shard"))
    base2 = base.withColumn("labels", F.map_concat(F.col("labels"), ident))
    users = (base.select(F.element_at("labels", "user").alias("u"),
                         F.element_at("labels", "shard").alias("s"))
             .distinct())
    team = F.when(users["u"].cast("long") % 2 == 0,
                  F.lit("even")).otherwise(F.lit("odd"))
    info = users.select(
        F.lit("target_info").alias("__name__"),
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("instance"), F.lit("job"),
                    F.lit("team")),
            F.array(F.lit("target_info"), users["u"], users["s"], team))
        .alias("labels"),
        F.lit(T).alias("ts"), F.lit(1.0).alias("value"))
    samples = base2.unionByName(info, allowMissingColumns=True)
    eng = PromQLEngine(samples, lookback_ms=LOOKBACK, deterministic=True)
    r = eng.query_instant("info(click)", T)
    return r.df.select(_lbl("user").alias("user"),
                       _lbl("shard").alias("shard"),
                       _lbl("team").alias("team"),
                       F.col("value").alias("value"))


@q("promql_quantile_stddev_over_time", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value
    FROM grid g JOIN events_ms e
      ON e.event_type = 'view' AND e.ts > g.t - {3 * DAY} AND e.ts <= g.t
),
arrs AS (
    SELECT t, "user",
           list(CAST(value AS DOUBLE) ORDER BY value) AS sorted_vals,
           list(CAST(value AS DOUBLE) ORDER BY ts, value) AS ts_vals,
           count(*) AS n
    FROM win GROUP BY t, "user"
),
m AS (
    SELECT t, "user", sorted_vals, ts_vals, n,
           0.9 * (CAST(n AS DOUBLE) - 1) AS rank,
           list_reduce(list_prepend(0.0, ts_vals), (a, b) -> a + b)
             / CAST(n AS DOUBLE) AS mean
    FROM arrs
)
SELECT t, "user",
       CASE WHEN n = 0 THEN 'NaN'::DOUBLE ELSE
           sorted_vals[CAST(floor(rank) AS INT) + 1]
           + (sorted_vals[CAST(ceil(rank) AS INT) + 1]
              - sorted_vals[CAST(floor(rank) AS INT) + 1])
             * (rank - floor(rank))
       END AS q90,
       sqrt(list_reduce(list_prepend(0.0,
                list_transform(ts_vals, v -> (v - mean) * (v - mean))),
            (a, b) -> a + b) / CAST(n AS DOUBLE)) AS sd
FROM m
""")
def promql_quantile_stddev_over_time(spark, sf_dir):
    """quantile_over_time + stddev_over_time joined."""
    eng = _engine(spark, sf_dir)
    qv = eng.query_range("quantile_over_time(0.9, view[3d])",
                         R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("q90"))
    sd = eng.query_range("stddev_over_time(view[3d])", R_START, R_END, STEP).df \
        .select("t", _lbl("user").alias("user"), F.col("value").alias("sd"))
    return qv.join(sd, ["t", "user"])


@q("promql_idelta", f"""
WITH events_ms AS (SELECT event_type, user_id, epoch_ms(ts) AS ts, value FROM events),
{_GRID},
win AS (
    SELECT g.t, CAST(e.user_id AS VARCHAR) AS "user", e.ts, e.value,
           row_number() OVER (PARTITION BY g.t, e.user_id
                              ORDER BY e.ts DESC, e.value DESC) AS rn
    FROM grid g JOIN events_ms e
      ON e.event_type = 'click' AND e.ts > g.t - {2 * DAY} AND e.ts <= g.t
),
p AS (
    SELECT t, "user",
           max(CASE WHEN rn = 1 THEN value END) AS v1,
           max(CASE WHEN rn = 2 THEN value END) AS v2,
           count(*) AS n
    FROM win GROUP BY t, "user"
)
SELECT t, "user", v1 - v2 AS value FROM p WHERE n >= 2
""")
def promql_idelta(spark, sf_dir):
    r = _engine(spark, sf_dir).query_range("idelta(click[2d])",
                                           R_START, R_END, STEP)
    return r.df.select("t", _lbl("user").alias("user"), "value")


@q("promql_absent_over_time", """
SELECT '99999' AS "user", 1.0 AS value
""")
def promql_absent_over_time(spark, sf_dir):
    r = _engine(spark, sf_dir).query_instant(
        'absent_over_time(click{user="99999"}[7d])', T)
    return r.df.select(_lbl("user").alias("user"), "value")


@q("promql_native_histogram", f"""
WITH ev AS (
    SELECT CAST(user_id AS VARCHAR) AS "user", value FROM events
    WHERE event_type = 'click' AND value > 0
      AND epoch_ms(ts) > {T - LOOKBACK} AND epoch_ms(ts) <= {T}
),
bucketed AS (
    SELECT "user", value,
           CASE WHEN value <= 5 THEN 5.0 WHEN value <= 10 THEN 10.0
                WHEN value <= 20 THEN 20.0 WHEN value <= 40 THEN 40.0
                ELSE 'inf'::DOUBLE END AS le
    FROM ev
),
per_bucket AS (
    SELECT "user", le, CAST(count(*) AS DOUBLE) AS bc
    FROM bucketed GROUP BY "user", le
),
totals AS (
    SELECT "user", CAST(count(*) AS DOUBLE) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM bucketed GROUP BY "user"
),
cum AS (
    SELECT "user", le, sum(bc) OVER (PARTITION BY "user" ORDER BY le) AS c
    FROM per_bucket
),
located AS (
    SELECT t."user", t.cnt, t.total, 0.75 * t.cnt AS rank,
           min(CASE WHEN c.c >= 0.75 * t.cnt THEN c.le END) AS upper_le
    FROM totals t JOIN cum c USING ("user")
    GROUP BY t."user", t.cnt, t.total
),
interp AS (
    SELECT l."user", l.cnt, l.total, l.rank, l.upper_le,
           coalesce(max(c2.le), 0.0) AS lower_le,
           coalesce(max_by(c2.c, c2.le), 0.0) AS count_lo
    FROM located l LEFT JOIN cum c2
      ON c2."user" = l."user" AND c2.le < l.upper_le
    GROUP BY l."user", l.cnt, l.total, l.rank, l.upper_le
),
q75 AS (
    SELECT i."user", i.cnt, i.total,
           CASE WHEN i.upper_le = 'inf'::DOUBLE THEN
                    coalesce((SELECT max(le) FROM per_bucket p
                              WHERE p."user" = i."user" AND p.le < 'inf'::DOUBLE),
                             'NaN'::DOUBLE)
                ELSE i.lower_le + (i.upper_le - i.lower_le)
                     * (i.rank - i.count_lo) / (cu.c - i.count_lo)
           END AS q75
    FROM interp i JOIN cum cu ON cu."user" = i."user" AND cu.le = i.upper_le
)
SELECT "user", cnt, total, q75 FROM q75
""")
def promql_native_histogram(spark, sf_dir):
    """Native-histogram samples (custom bucket bounds, NHCB-style): per-user
    histogram of click values → histogram_count/sum/quantile (reference
    float-histogram coverage db/db_test.go:344-351; histograms.py)."""
    from thanos_parquet_gateway_spark.promql import histograms as H
    e = load_table(spark, sf_dir, "events")
    ev = e.filter((F.col("event_type") == "click") & (F.col("value") > 0) &
                  (F.col("ts_ms") > T - LOOKBACK) & (F.col("ts_ms") <= T))
    le = (F.when(F.col("value") <= 5, 5.0).when(F.col("value") <= 10, 10.0)
          .when(F.col("value") <= 20, 20.0).when(F.col("value") <= 40, 40.0)
          .otherwise(float("inf")))
    b = ev.withColumn("le", le)
    per_bucket = (b.groupBy("user_id", "le")
                  .agg(F.count("*").cast("double").alias("bc")))
    buckets = (per_bucket.groupBy("user_id")
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col("le"), F.col("bc").alias("count"))))
                   .alias("bks")))
    totals = (b.groupBy("user_id")
              .agg(F.count("*").cast("double").alias("cnt"),
                   F.sum(F.col("value").cast(_DEC)).cast("double").alias("total")))
    inf_tail = F.array(F.struct(F.lit(float("inf")).alias("le"),
                                F.lit(0.0).alias("count")))
    samples = (totals.join(buckets, "user_id")
               .select(F.lit("lat_hist").alias("__name__"),
                       F.map_from_arrays(
                           F.array(F.lit("__name__"), F.lit("user")),
                           F.array(F.lit("lat_hist"),
                                   F.col("user_id").cast("string"))).alias("labels"),
                       F.lit(T).cast("long").alias("ts"),
                       F.lit(float("nan")).alias("value"),
                       H.make_hist(F.col("cnt"), F.col("total"),
                                   F.when(F.element_at(F.col("bks"), -1)["le"]
                                          == float("inf"), F.col("bks"))
                                   .otherwise(F.concat(F.col("bks"), inf_tail)))
                       .alias("hist")))
    eng = PromQLEngine(samples, lookback_ms=60_000, deterministic=True)
    cnt = eng.query_instant("histogram_count(lat_hist)", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("cnt"))
    tot = eng.query_instant("histogram_sum(lat_hist)", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("total"))
    q75 = eng.query_instant("histogram_quantile(0.75, lat_hist)", T).df \
        .select(_lbl("user").alias("user"), F.col("value").alias("q75"))
    return cnt.join(tot, ["user"]).join(q75, ["user"])


_JAN1 = 1704067200000  # 2024-01-01T00:00:00Z
_NR_T = _JAN1 + 4 * DAY  # 2024-01-05 — native-rate eval time
_NR_DAYS = [_JAN1 + d * DAY for d in (1, 2, 3, 4)]  # Jan 2..Jan 5 samples


@q("promql_native_rate", f"""
WITH ev AS (
    SELECT CAST(user_id AS VARCHAR) AS "user", value, epoch_ms(ts) AS ts_ms
    FROM events
    WHERE event_type = 'click' AND value > 0 AND epoch_ms(ts) <= {_NR_T}
),
users AS (SELECT DISTINCT "user" FROM ev),
days AS (SELECT * FROM (VALUES ({_NR_DAYS[0]}), ({_NR_DAYS[1]}),
                               ({_NR_DAYS[2]}), ({_NR_DAYS[3]})) AS t(sts)),
grid AS (SELECT u."user", d.sts FROM users u CROSS JOIN days d),
stats AS (
    SELECT g."user", g.sts,
           CAST(count(e.value) AS DOUBLE) AS cnt,
           CAST(coalesce(sum(CAST(e.value AS DECIMAL(18,2))),
                         0) AS DOUBLE) AS total,
           CAST(count(CASE WHEN e.value > 5 AND e.value <= 10 THEN 1 END)
                AS DOUBLE) AS b10
    FROM grid g LEFT JOIN ev e ON e."user" = g."user" AND e.ts_ms <= g.sts
    GROUP BY g."user", g.sts
),
fl AS (
    SELECT "user",
           max(CASE WHEN sts = {_NR_DAYS[0]} THEN cnt END) AS cnt2,
           max(CASE WHEN sts = {_NR_T} THEN cnt END) AS cnt5,
           max(CASE WHEN sts = {_NR_DAYS[0]} THEN total END) AS tot2,
           max(CASE WHEN sts = {_NR_T} THEN total END) AS tot5,
           max(CASE WHEN sts = {_NR_DAYS[0]} THEN b10 END) AS b102,
           max(CASE WHEN sts = {_NR_T} THEN b10 END) AS b105
    FROM stats GROUP BY "user"
)
SELECT "user",
       (cnt5 - cnt2) * ((345600.0/259200.0)/345600.0) AS rate_cnt,
       (tot5 - tot2) * ((345600.0/259200.0)/345600.0) AS rate_sum,
       (b105 - b102) * ((345600.0/259200.0)/345600.0) AS rate_b10
FROM fl
""")
def promql_native_rate(spark, sf_dir):
    """rate() over native-histogram samples: per-user cumulative counter
    histograms sampled daily Jan 2-5, rate(lat_hist[4d]) at Jan 5 —
    bucket-wise delta + window-boundary extrapolation (reference serves
    rate over float histograms through promql-engine, db/db_test.go:344-351;
    functions._extrapolated_hist).  Every user carries samples at all four
    days, so the extrapolation factor is the constant (4d/3d); the oracle
    restates the same bucket arithmetic in SQL."""
    from thanos_parquet_gateway_spark.promql import histograms as H
    e = load_table(spark, sf_dir, "events")
    ev = e.filter((F.col("event_type") == "click") & (F.col("value") > 0) &
                  (F.col("ts_ms") <= _NR_T)) \
         .select(F.col("user_id"), F.col("value"), F.col("ts_ms"))
    days = spark.createDataFrame([(t,) for t in _NR_DAYS], "sts long")
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(days))
    j = grid.join(ev.withColumnRenamed("user_id", "uid"),
                  (F.col("uid") == F.col("user_id")) &
                  (F.col("ts_ms") <= F.col("sts")), "left")
    cnt_if = lambda c: F.count(F.when(c, 1)).cast("double")  # noqa: E731
    stats = j.groupBy("user_id", "sts").agg(
        F.count("value").cast("double").alias("cnt"),
        F.coalesce(F.sum(F.col("value").cast(_DEC)),
                   F.lit(0).cast(_DEC)).cast("double").alias("total"),
        cnt_if(F.col("value") <= 5).alias("b5"),
        cnt_if((F.col("value") > 5) & (F.col("value") <= 10)).alias("b10"),
        cnt_if((F.col("value") > 10) & (F.col("value") <= 20)).alias("b20"),
        cnt_if((F.col("value") > 20) & (F.col("value") <= 40)).alias("b40"),
        cnt_if(F.col("value") > 40).alias("binf"))
    buckets = F.array(*[
        F.struct(F.lit(le).alias("le"), F.col(c).alias("count"))
        for le, c in [(5.0, "b5"), (10.0, "b10"), (20.0, "b20"),
                      (40.0, "b40"), (float("inf"), "binf")]])
    samples = stats.select(
        F.lit("lat_hist").alias("__name__"),
        F.map_from_arrays(
            F.array(F.lit("__name__"), F.lit("user")),
            F.array(F.lit("lat_hist"),
                    F.col("user_id").cast("string"))).alias("labels"),
        F.col("sts").alias("ts"),
        F.lit(float("nan")).alias("value"),
        H.make_hist(F.col("cnt"), F.col("total"), buckets).alias("hist"))
    eng = PromQLEngine(samples, lookback_ms=60_000, deterministic=True)
    r = eng.query_instant("rate(lat_hist[4d])", _NR_T)
    b10 = F.coalesce(
        F.try_element_at(F.filter(F.col("hist")["buckets"],
                                  lambda b: b["le"] == 10.0),
                         F.lit(1))["count"],
        F.lit(0.0))
    return r.df.select(_lbl("user").alias("user"),
                       F.col("hist")["count"].alias("rate_cnt"),
                       F.col("hist")["sum"].alias("rate_sum"),
                       b10.alias("rate_b10"))


@q("promql_multistream", f"""
WITH raw AS (
    SELECT event_type AS name,
           CAST(user_id % 8 AS VARCHAR) AS shard,
           CAST(user_id AS VARCHAR) AS "user",
           epoch_ms(ts) AS ts, value
    FROM events
    WHERE user_id % 2 = 0
),
last AS (
    SELECT shard, "user", ts, value,
           row_number() OVER (PARTITION BY shard, "user"
                              ORDER BY ts DESC, value DESC) AS rn
    FROM raw WHERE name = 'click' AND ts > {T - LOOKBACK} AND ts <= {T}
)
SELECT shard, 'zone-a' AS zone,
       {_ksum('list(value ORDER BY "user")')} AS value
FROM last WHERE rn = 1 GROUP BY shard
""")
def promql_multistream(spark, sf_dir):
    """Multi-stream engine: two streams with distinct external label sets;
    the zone matcher elides to a predicate on the stream column (partition
    pruning on converted layouts) and results are decorated with the owning
    stream's labels (reference locate/discover.go:125-305,
    search/search.go:356-376, schema/block.go:37-76)."""
    s = samples_from_events(spark, sf_dir).withColumn(
        "stream",
        (F.element_at("labels", "user").cast("long") % 2).cast("string"))
    eng = PromQLEngine(s, lookback_ms=LOOKBACK, deterministic=True,
                       streams={"0": {"zone": "zone-a"},
                                "1": {"zone": "zone-b"}})
    r = eng.query_instant('sum by (shard, zone) (click{zone="zone-a"})', T)
    return r.df.select(_lbl("shard").alias("shard"),
                       _lbl("zone").alias("zone"), "value")


@q("grpc_series_export", f"""
WITH {_SAMPLES},
w AS (
    SELECT shard, "user", ts, value FROM samples
    WHERE name = 'click' AND ts >= {R_START} AND ts <= {T}
)
SELECT shard, "user", CAST(count(*) AS BIGINT) AS n_samples,
       CAST(min(ts) AS BIGINT) AS mint, CAST(max(ts) AS BIGINT) AS maxt,
       list_reduce(list_prepend(0.0, list(value ORDER BY ts, value)),
                   (a, b) -> a + b) AS value_sum
FROM w GROUP BY shard, "user"
""")
def grpc_series_export(spark, sf_dir):
    """Series raw export (reference api/grpc/thanos.go:376-459): selector →
    per-series sample runs with NO PromQL engine — no lookback, no
    staleness.  Checked via per-series run stats + an order-stable value
    fold over the exported array."""
    from thanos_parquet_gateway_spark.api import QueryServer
    srv = QueryServer(samples_from_events(spark, sf_dir), deterministic=True)
    df = srv.series_df(["click"], R_START, T)
    return df.select(
        _lbl("shard").alias("shard"), _lbl("user").alias("user"),
        F.size("samples").cast("long").alias("n_samples"),
        F.element_at("samples", 1)["ts"].alias("mint"),
        F.element_at("samples", -1)["ts"].alias("maxt"),
        F.aggregate("samples", F.lit(0.0),
                    lambda acc, s: acc + s["value"]).alias("value_sum"))


@q("grpc_series_export_hist", f"""
WITH {_SAMPLES},
w AS (
    SELECT shard, "user", ts, value FROM samples
    WHERE name = 'click' AND ts >= {R_START} AND ts <= {T}
)
SELECT shard, "user",
       CAST(count(*) AS BIGINT) AS n_hist,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) AS count_sum,
       CAST(sum(CAST(floor(value * 10) AS BIGINT)) AS DOUBLE) AS sum_sum
FROM w GROUP BY shard, "user"
""")
def grpc_series_export_hist(spark, sf_dir):
    """Series raw export of NATIVE-HISTOGRAM samples (reference passes
    HISTOGRAM/FLOAT_HISTOGRAM chunks through Series, thanos.go:462-473):
    click samples are lifted to deterministic NHCB histograms (count =
    floor(100v), sum = floor(10v) — integral, so the float folds are
    order-independent), exported through the same series_df path the gRPC
    handler chunks, and reduced per series."""
    from thanos_parquet_gateway_spark.api import QueryServer
    from thanos_parquet_gateway_spark.promql.histograms import make_hist

    s = samples_from_events(spark, sf_dir)
    cnt = F.floor(F.col("value") * 100).cast("double")
    tot = F.floor(F.col("value") * 10).cast("double")
    buckets = F.array(
        F.struct(F.lit(1.0).alias("le"), cnt.alias("count")),
        F.struct(F.lit(float("inf")).alias("le"),
                 F.lit(0.0).alias("count")))
    hist = F.when(F.col("__name__") == "click",
                  make_hist(cnt, tot, buckets, -53))
    srv = QueryServer(s.withColumn("hist", hist), deterministic=True)
    df = srv.series_df(["click"], R_START, T)
    hs = F.filter("samples", lambda x: x["hist"].isNotNull())
    return df.select(
        _lbl("shard").alias("shard"), _lbl("user").alias("user"),
        F.size(hs).cast("long").alias("n_hist"),
        F.aggregate(hs, F.lit(0.0),
                    lambda acc, x: acc + x["hist"]["count"])
         .alias("count_sum"),
        F.aggregate(hs, F.lit(0.0),
                    lambda acc, x: acc + x["hist"]["sum"])
         .alias("sum_sum"))


@q("grpc_info", """
SELECT CAST(user_id % 2 AS VARCHAR) AS stream,
       CASE WHEN user_id % 2 = 0 THEN 'zone-a' ELSE 'zone-b' END AS zone,
       CAST(min(epoch_ms(ts)) AS BIGINT) AS mint,
       CAST(max(epoch_ms(ts)) AS BIGINT) AS maxt
FROM events GROUP BY 1, 2
""")
def grpc_info(spark, sf_dir):
    """Info advertisement (reference api/grpc/thanos.go:169-233): per-stream
    external labelset + served time range, from one partial agg over the
    samples (footer-stats-cheap on a converted layout)."""
    from thanos_parquet_gateway_spark.api import QueryServer
    s = samples_from_events(spark, sf_dir).withColumn(
        "stream",
        (F.element_at("labels", "user").cast("long") % 2).cast("string"))
    srv = QueryServer(s, streams={"0": {"zone": "zone-a"},
                                  "1": {"zone": "zone-b"}})
    return srv.info_df().select(
        "stream", F.element_at("labels", "zone").alias("zone"),
        "mint", "maxt")


# --------------------------------------------------------------- flagship
def flagship(spark: SparkSession) -> DataFrame:
    """Driver smoke entry: range-query the sf0.001 corpus."""
    eng = PromQLEngine(samples_from_events(spark, "/root/testdata/sf0.001"),
                       lookback_ms=LOOKBACK, deterministic=True)
    r = eng.query_range("sum by (shard) (count_over_time(click[1d]))",
                        R_START, R_END, STEP)
    return r.df.select("t", F.element_at("labels", "shard").alias("shard"), "value")


# =====================================================================
# Streaming operators under the batch oracle gate (round-9 verdict #8):
# each runs the REAL Structured Streaming job (availableNow drain over a
# parquet drop dir, checkpointed, append sink) and returns the sink as a
# DataFrame whose deterministic projection a DuckDB oracle can reproduce.
# =====================================================================

def _stream_tmp(prefix: str) -> str:
    import tempfile
    return tempfile.mkdtemp(prefix=prefix)


@q("stream_dedup_docs", """
SELECT DISTINCT md5(text) AS content_hash FROM documents
""")
def stream_dedup_docs(spark, sf_dir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark,
    streaming/convert_stream.py): every document is ingested TWICE inside
    the watermark horizon; the drained sink must carry exactly one row per
    content hash.  The oracle checks the hash set — which arrival survives
    is arrival-order dependent, so doc_id stays out of the projection."""
    from thanos_parquet_gateway_spark.streaming import stream_dedup
    root = _stream_tmp("stream_dedup_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t0 = 1_704_067_200_000
    twice = docs.union(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text"))
    (twice.withColumn("ts", F.lit(t0) + F.col("doc_id") % 60_000)
     .write.parquet(f"{root}/in"))
    job = stream_dedup(spark, f"{root}/in", f"{root}/out", f"{root}/ckpt")
    job.awaitTermination(300)
    return spark.read.parquet(f"{root}/out").select("content_hash")


@q("stream_rollup_samples", """
WITH s AS (
    SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start,
           '[{"key":"__name__","value":"' || event_type ||
           '"},{"key":"user","value":"' || CAST(user_id AS VARCHAR) ||
           '"}]' AS sig,
           floor(value) AS v
    FROM events
)
SELECT window_start, sig, count(*) AS n_samples, sum(v) AS sum_value
FROM s GROUP BY window_start, sig
""")
def stream_rollup_samples(spark, sf_dir):
    """Watermarked tumbling rollup (streaming/convert_stream.py
    stream_rollup, 1h windows / 2h watermark) drained with availableNow; a
    far-future sentinel sample advances the watermark so every real window
    finalizes into the append sink.  Values are floored to integer-valued
    doubles so the streaming partial-agg sum is order-independent exact
    (conftest gotcha: never hash-compare a parallel float SUM)."""
    from thanos_parquet_gateway_spark.streaming import stream_rollup
    root = _stream_tmp("stream_rollup_")
    flush_ts = 1_748_736_000_000  # 2025-06-01, >> any event + watermark
    e = load_table(spark, sf_dir, "events")
    raw = e.select(
        F.create_map(F.lit("__name__"), F.col("event_type"),
                     F.lit("user"),
                     F.col("user_id").cast("string")).alias("labels"),
        F.col("ts_ms").alias("ts"),
        F.floor("value").cast("double").alias("value"))
    sentinel = spark.range(1).select(
        F.create_map(F.lit("__name__"), F.lit("__flush__")).alias("labels"),
        F.lit(flush_ts).alias("ts"), F.lit(0.0).alias("value"))
    raw.union(sentinel).write.parquet(f"{root}/in")
    job = stream_rollup(spark, f"{root}/in", f"{root}/out", f"{root}/ckpt")
    job.awaitTermination(300)
    return (spark.read.parquet(f"{root}/out")
            .filter(F.col("window_start") < flush_ts - 2 * 3_600_000)
            .select("window_start", "sig", "n_samples", "sum_value"))


@q("stream_running_increase", """
WITH s AS (
    SELECT '[{"key":"__name__","value":"' || event_type ||
           '"},{"key":"user","value":"' || CAST(user_id AS VARCHAR) ||
           '"}]' AS sig,
           epoch_ms(ts) AS ts, max(floor(value)) AS value
    FROM events GROUP BY 1, 2
),
d AS (
    SELECT sig, ts, value,
           lag(value) OVER (PARTITION BY sig ORDER BY ts) AS pv
    FROM s
)
SELECT sig, ts, value,
       sum(CASE WHEN pv IS NULL THEN 0
                WHEN value < pv THEN value
                ELSE value - pv END)
         OVER (PARTITION BY sig ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cum_increase
FROM d
""")
def stream_running_increase_q(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState,
    streaming/stateful.py): per-series reset-corrected running increase.
    The cumulative sum is a SEQUENTIAL per-series fold in ts order on both
    sides, and values are floored to integer-valued doubles, so the oracle
    window sum is bit-identical.  Input is pre-deduped per (sig, ts) (max
    value) — the operator's late/duplicate-skip is batch-order dependent —
    and written as one file so the availableNow drain sees one in-order
    batch."""
    from thanos_parquet_gateway_spark.streaming import stream_running_increase
    root = _stream_tmp("stream_runinc_")
    e = load_table(spark, sf_dir, "events")
    raw = (e.groupBy(
        F.create_map(F.lit("__name__"), F.col("event_type"),
                     F.lit("user"),
                     F.col("user_id").cast("string")).alias("labels"),
        F.col("ts_ms").alias("ts"))
        .agg(F.max(F.floor("value").cast("double")).alias("value")))
    raw.coalesce(1).write.parquet(f"{root}/in")
    job = stream_running_increase(spark, f"{root}/in", f"{root}/out",
                                  f"{root}/ckpt")
    job.awaitTermination(300)
    return (spark.read.parquet(f"{root}/out")
            .select("sig", "ts", "value", "cum_increase"))


@q("stream_sessionize_events", """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_us
    FROM events
),
tagged AS (
    SELECT user_id, ts_us,
           sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM e
)
SELECT user_id, min(ts_us) AS session_start_us,
       max(ts_us) + 1800000000 AS session_end_us, count(*) AS n_events
FROM tagged GROUP BY user_id, sid
""")
def stream_sessionize_events(spark, sf_dir):
    """Native session_window streaming sessionization (streaming/sessions.py,
    30-min gap): drain the real events, then append a far-future sentinel
    event and drain again — append mode holds still-open tail sessions in
    state until the watermark passes them (same two-drain flush as
    tests/test_convert.py).  The oracle rebuilds sessions with the lag/
    cumulative-sum construction; session end = last event + gap, full
    microsecond precision."""
    from thanos_parquet_gateway_spark.streaming import stream_sessionize
    root = _stream_tmp("stream_sessionize_")
    e = load_table(spark, sf_dir, "events")
    (e.select("event_id", F.col("ts").cast("timestamp").alias("ts"),
              "user_id", "event_type", "value")
     .write.parquet(f"{root}/in"))
    job = stream_sessionize(spark, f"{root}/in", f"{root}/out",
                            f"{root}/ckpt", watermark="0 seconds")
    job.awaitTermination(300)
    sentinel_user = -1
    spark.range(1).select(
        F.lit(0).cast("long").alias("event_id"),
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(sentinel_user).cast("long").alias("user_id"),
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value")).write.mode("append").parquet(f"{root}/in")
    job = stream_sessionize(spark, f"{root}/in", f"{root}/out",
                            f"{root}/ckpt", watermark="0 seconds")
    job.awaitTermination(300)
    return (spark.read.parquet(f"{root}/out")
            .filter(F.col("user_id") != sentinel_user)
            .select("user_id",
                    F.unix_micros("session_start").alias("session_start_us"),
                    F.unix_micros("session_end").alias("session_end_us"),
                    "n_events"))


# ---------------------------------------------------------- driver window
# The driver's CORRECTNESS gate compares the FIRST 50 registry entries (in
# dict order) against their DuckDB oracles each round.  Registration order
# above is thematic; the order exposed to the driver is computed here by a
# MECHANICAL rule (round-3 advice: the graded library must not hand-curate
# the gate's sample): queries are sorted by the round of their most recent
# fully-green driver row — parsed from the committed CORRECTNESS_r*.json
# artifacts — oldest (or never-proven) first, ties broken by registration
# order.  The rule is oldest-green rotation: each round the window lands on
# whatever the official gate has vouched for least recently, so every query
# cycles through a driver row and a regression anywhere surfaces within
# ceil(N/50) rounds.  No per-round editing; adding a CORRECTNESS artifact is
# the only thing that changes the order.  tools/diffcheck.py --out
# additionally checks ALL entries every round; the artifact is committed
# as DIFFCHECK_ALL_r*.json (first: round 5).
#
def _last_green_rounds() -> dict[str, int]:
    """Round number of each query's most recent fully-green driver row
    (rows+schema+hash all matching), parsed from CORRECTNESS_r*.json at the
    repo root.  Queries without any green row are absent (treated as 0)."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r0*(\d+)\.json$", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (isinstance(row, dict) and row.get("rows_match")
                    and row.get("schema_match") and row.get("hash_match")):
                last[name] = max(last.get(name, 0), rnd)
    if not last:
        # Installed outside the repo (or artifacts missing): the mechanical
        # ordering silently degrading to registration order would defeat the
        # oldest-green rotation, so say so loudly.
        import warnings
        warnings.warn(
            "no CORRECTNESS_r*.json artifacts found under %s; driver-window "
            "order falls back to registration order" % root,
            RuntimeWarning, stacklevel=2)
    return last


def _reorder_registry() -> None:
    last = _last_green_rounds()
    pos = {n: i for i, n in enumerate(QUERIES)}
    ordered = sorted(QUERIES, key=lambda n: (last.get(n, 0), pos[n]))
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)


_reorder_registry()
