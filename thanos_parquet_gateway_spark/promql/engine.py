"""Query engine facade: the Spark-native replacement for the reference's
``serve`` path (reference cmd/serve.go:201-222 + api/http/query.go).

Entry points mirror the Prometheus HTTP API surface the reference exposes
(api/http/query.go:175-179): instant query, range query, series, label names,
label values — each returning a DataFrame (never collecting on its own).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thanos_parquet_gateway_spark.promql import parser as P
from thanos_parquet_gateway_spark.promql.compiler import Compiler
from thanos_parquet_gateway_spark.promql.values import (
    EvalParams,
    InstantVector,
    RangeVector,
    ScalarV,
    StringV,
)
from thanos_parquet_gateway_spark.schema import (
    canonical_sig,
    drop_labels,
    label,
    series_hash,
)


@dataclass
class QueryResult:
    df: DataFrame
    result_type: str  # 'vector' | 'matrix' | 'scalar'
    # PromQL annotations (upstream util/annotations, served as the API's
    # top-level warnings/infos): list of ("warn" | "info", message).
    # Statically-determinable annotations only — data-dependent ones
    # (e.g. histogram_quantile forced monotonicity) live in ``probes``.
    annotations: list = None
    # Deferred data-dependent annotation probes: tiny DataFrames of
    # (kind, msg) rows.  Upstream's row-at-a-time evaluator computes these
    # inline for free; a declarative plan cannot know data-dependent facts
    # until an action runs, so they are bounded side-aggregations collected
    # ONLY when a consumer asks for annotations (all_annotations) — the
    # query hot path (df) never pays for them.
    probes: list = None

    def all_annotations(self) -> list:
        """Static annotations plus collected data-dependent probes.
        Collection happens once; results are folded into ``annotations``."""
        ann = list(self.annotations or [])
        for p in self.probes or []:
            for r in p.collect():
                item = (r["kind"], r["msg"])
                if item not in ann:
                    ann.append(item)
        self.annotations = ann
        self.probes = []
        return ann


class PromQLEngine:
    def __init__(self, samples: DataFrame, *,
                 lookback_ms: int = 300_000,
                 deterministic: bool = False,
                 subquery_step_ms: int = 60_000,
                 replica_labels: list[str] | None = None,
                 ext_labels: dict[str, str] | None = None,
                 streams: dict[str, dict[str, str]] | None = None,
                 complete_streams: bool = True,
                 label_stats: DataFrame | None = None):
        """``samples``: long-format samples table (schema.py).  ``replica_labels``
        are dropped and the data deduplicated by (series, ts) — the Spark
        equivalent of the reference's replica-label drop + hash dedup
        (reference db/db.go:124-128, db/shard.go:252-268).  ``streams`` maps
        the ``stream`` partition-column value to that stream's external label
        set (multi-stream mode, reference locate/discover.go:125-305):
        matchers on stream labels prune stream partitions, results are
        decorated per stream."""
        if "__name__" not in samples.columns:
            samples = samples.withColumn("__name__", label("labels", "__name__"))
        ext_rep = grp_of_stream = None
        if replica_labels and streams:
            # Replica labels usually live in the stream EXTERNAL label
            # sets (two Prometheis uploading replica="a"/"b" blocks —
            # reference TSDBDiscoverer keys them into separate streams,
            # locate/discover.go:495-516).  Thanos semantics: the replica
            # labels are dropped from each stream's decoration, and
            # series dedup crosses exactly the streams whose REMAINING
            # external labels coincide (db/db.go:124-128) — streams that
            # differ in a non-replica label (cluster=...) never merge.
            ext_rep = {s: "\x1f".join(ls.get(r, "") for r in replica_labels)
                       for s, ls in streams.items()}
            streams = {s: {k: v for k, v in ls.items()
                           if k not in replica_labels}
                       for s, ls in streams.items()}
            grp_of_stream = {
                s: "\x1f".join(f"{k}\x1e{v}" for k, v in sorted(ls.items()))
                for s, ls in streams.items()}
        if replica_labels:
            # Winner-replica dedup (reference db/shard.go:252-268 keeps ONE
            # series per post-drop labelset; Thanos penalty dedup never mixes
            # replicas at a timestamp).  Deterministic pick per (sig, ts):
            # lowest replica key wins, ties broken by highest value.  The
            # whole row rides along via min_by, so `hist` (native histograms)
            # and any extra columns survive; `date` stays a grouping key so
            # time filters still push through to partition pruning.
            rep = F.concat_ws("\x1f",
                              *[label("labels", r) for r in replica_labels])
            if ext_rep is not None and "stream" in samples.columns:
                # the stream's external replica values join the winner
                # key (lowest replica wins across streams too)
                rep_ext = F.coalesce(
                    F.element_at(
                        F.create_map(*[F.lit(x)
                                       for kv in sorted(ext_rep.items())
                                       for x in kv]),
                        F.col("stream").cast("string")),
                    F.lit(""))
                rep = F.concat_ws("\x1f", rep, rep_ext)
            samples = (samples
                       .withColumn("__rep", rep)
                       .withColumn("labels",
                                   drop_labels("labels", replica_labels)))
            if grp_of_stream is not None and "stream" in samples.columns:
                # dedup group = the stream's post-drop external label
                # set: identical sets dedup across streams, different
                # ones stay separate series
                samples = samples.withColumn(
                    "__extgrp",
                    F.coalesce(
                        F.element_at(
                            F.create_map(*[F.lit(x) for kv in
                                           sorted(grp_of_stream.items())
                                           for x in kv]),
                            F.col("stream").cast("string")),
                        F.lit("")))
            if "series_hash" in samples.columns:
                samples = samples.withColumn("series_hash",
                                             series_hash("labels"))
            keys = ["__sig", "ts"] + (["date"] if "date" in samples.columns
                                      else []) \
                + (["__extgrp"] if "__extgrp" in samples.columns else [])
            payload = [c for c in samples.columns
                       if c not in ("ts", "date", "__rep", "__extgrp")]
            # NULL value = staleness marker; an EXPLICIT stale flag (not a
            # -inf sentinel, which a genuine -inf sample would tie with)
            # makes any real sample — including -inf — beat a stale marker
            # at the same replica rank, deterministically.
            order_key = F.struct(
                F.col("__rep").alias("r"),
                F.col("value").isNull().cast("int").alias("s"),
                (-F.coalesce(F.col("value"),
                             F.lit(float("-inf")))).alias("v"))
            # 8-byte dedup key (xxhash64 of the canonical sig) — the
            # reference dedups by the same 64-bit hash (convert/tsdb.go:132)
            samples = (samples
                       .withColumn("__sig", series_hash("labels"))
                       .groupBy(*keys)
                       .agg(F.min_by(F.struct(*payload), order_key)
                            .alias("__row"))
                       .select(*[k for k in keys
                                 if k not in ("__sig", "__extgrp")],
                               "__row.*"))
        self.samples = samples
        self.lookback_ms = lookback_ms
        self.deterministic = deterministic
        self.subquery_step_ms = subquery_step_ms
        self.ext_labels = ext_labels
        self.streams = streams
        self.complete_streams = complete_streams
        # Compiled-plan cache (r13): a serving gateway re-compiles the SAME
        # query text at the same parameters constantly (dashboard refresh,
        # retried panels), and compile — parse + eagerly-analyzed plan
        # construction, ~0.1-0.5 s/query — is pure driver latency.  The
        # cache memoizes the QueryResult's UNEXECUTED DataFrame plan keyed
        # on (kind, query text, time parameters); no data and no results
        # are stored (the same contract as the session table handle in
        # sources/tables.py — every action re-scans parquet), it is bounded
        # (LRU, 256 entries), engine-scoped (dies with the engine; engine
        # config is fixed per instance), and each hit returns a fresh
        # QueryResult wrapper so all_annotations' fold-in never mutates the
        # cached entry.  SPARK_GRAFT_NO_PLAN_CACHE=1 disables it.
        import os as _os
        import threading as _th
        from collections import OrderedDict as _OD
        self._plan_cache: "dict" = _OD()
        self._plan_cache_cap = (0 if _os.environ.get("SPARK_GRAFT_NO_PLAN_CACHE")
                                else 256)
        # the API server serves concurrent requests on ONE engine
        # (api/server.py engine LRU + max_concurrent): guard the LRU's
        # read-move/insert/evict sequences; plan BUILDS stay outside the
        # lock (driver-heavy — a concurrent builder of the same key just
        # loses the insert race, same policy as the server's engine LRU)
        self._plan_lock = _th.Lock()
        # convert-time sidecar (convert.write_label_stats): the reference's
        # dictionary-shortcut LabelValues analogue — unconstrained metadata
        # queries read it instead of scanning samples
        self.label_stats = label_stats

    # ------------------------------------------------------------- queries
    def _compile(self, q: str, start_ms: int, end_ms: int, step_ms: int):
        node = P.parse(q)
        params = EvalParams(start_ms, end_ms, max(step_ms, 1),
                            self.lookback_ms, self.deterministic,
                            self.subquery_step_ms)
        comp = Compiler(self.samples, params, self.ext_labels, self.streams,
                        self.complete_streams)
        return comp, comp.compile(node)

    def _plan_cached(self, key: tuple, build) -> QueryResult:
        """LRU-memoized QueryResult plans (see __init__).  Hits hand back a
        fresh QueryResult over the same immutable DataFrame plan with
        copied annotation/probe lists."""
        if not self._plan_cache_cap:
            return build()
        with self._plan_lock:
            hit = self._plan_cache.get(key)
            if hit is not None:
                self._plan_cache.move_to_end(key)
        if hit is None:
            hit = build()  # outside the lock: plan construction is slow
            with self._plan_lock:
                self._plan_cache[key] = hit
                while len(self._plan_cache) > self._plan_cache_cap:
                    self._plan_cache.pop(next(iter(self._plan_cache)))
        return QueryResult(hit.df, hit.result_type,
                           list(hit.annotations or []),
                           list(hit.probes or []))

    def query_range(self, q: str, start_ms: int, end_ms: int,
                    step_ms: int) -> QueryResult:
        return self._plan_cached(
            ("range", q, start_ms, end_ms, step_ms),
            lambda: self._query_range_uncached(q, start_ms, end_ms, step_ms))

    def _query_range_uncached(self, q: str, start_ms: int, end_ms: int,
                              step_ms: int) -> QueryResult:
        comp, v = self._compile(q, start_ms, end_ms, step_ms)
        ann = comp.annotations
        probes = comp.data_probes
        if isinstance(v, StringV):
            # upstream: "invalid expression type \"string\" for range query"
            raise ValueError(
                'invalid expression type "string" for range query')
        if isinstance(v, float):
            v = ScalarV(comp._const_scalar_df(v))
        if isinstance(v, ScalarV):
            return QueryResult(v.df.select("t", "value"), "scalar", ann, probes)
        if isinstance(v, RangeVector):
            raise ValueError("range query must evaluate to an instant vector/scalar")
        if isinstance(v, InstantVector):
            extra = ["hist"] if "hist" in v.df.columns else []
            df = v.df.select("t", "sig", "labels", "value", *extra)
            return QueryResult(df, "matrix", ann, probes)
        raise ValueError(f"unexpected result {type(v).__name__}")

    def query_instant(self, q: str, t_ms: int) -> QueryResult:
        return self._plan_cached(
            ("instant", q, t_ms),
            lambda: self._query_instant_uncached(q, t_ms))

    def _query_instant_uncached(self, q: str, t_ms: int) -> QueryResult:
        comp, v = self._compile(q, t_ms, t_ms, 1)
        ann = comp.annotations
        probes = comp.data_probes
        if isinstance(v, StringV):
            # string literal result (API resultType "string")
            df = self.samples.sparkSession.createDataFrame(
                [(t_ms, v.value)], "t long, value string")
            return QueryResult(df, "string", ann, probes)
        if isinstance(v, float):
            v = ScalarV(comp._const_scalar_df(v))
        if isinstance(v, ScalarV):
            return QueryResult(v.df.select("t", "value"), "scalar", ann, probes)
        if isinstance(v, RangeVector):
            return QueryResult(v.df.select("t", "sig", "labels", "ts", "value"),
                               "matrix", ann, probes)
        extra = ["hist"] if "hist" in v.df.columns else []
        return QueryResult(v.df.select("t", "sig", "labels", "value", *extra),
                           "vector", ann, probes)

    # ------------------------------------------- metadata APIs (A27-A31)
    def _matched(self, match: list[str], start_ms: int, end_ms: int) -> DataFrame:
        """Union of per-selector filtered samples within [start, end]
        (reference /series multi-matcher union, api/http/query.go:567-846)."""
        dfs = []
        params = EvalParams(start_ms, end_ms, 1, self.lookback_ms)
        comp = Compiler(self.samples, params, self.ext_labels, self.streams,
                        self.complete_streams)
        base = self.samples.filter(
            (F.col("ts") >= start_ms) & (F.col("ts") <= end_ms))
        from thanos_parquet_gateway_spark.sources.tables import (
            pushable_ts_window,
        )
        raw_win = pushable_ts_window(base, start_ms, end_ms)
        if raw_win is not None:  # raw-layout stats pruning for /series etc.
            base = base.filter(raw_win)
        for q in match or ["{__name__=~\".+\"}"]:
            node = P.parse(q)
            sel = node
            from thanos_parquet_gateway_spark.promql import ast as A
            if isinstance(sel, A.MatrixSelector):
                sel = sel.selector
            if not isinstance(sel, A.VectorSelector):
                raise ValueError("series match[] must be a selector")
            df = base
            if sel.name:
                df = df.filter(F.col("__name__") == sel.name)
            for m in sel.matchers:
                cond = comp._matcher_cond(m)
                if cond is not None:
                    df = df.filter(cond)
            dfs.append(df)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        if self.streams:
            from thanos_parquet_gateway_spark.promql.compiler import (
                stream_decoration,
            )
            out = out.withColumn("labels", stream_decoration(self.streams))
        elif self.ext_labels:
            from thanos_parquet_gateway_spark.schema import drop_labels
            ext = F.create_map(*[F.lit(x) for kv in self.ext_labels.items()
                                 for x in kv])
            out = out.withColumn(
                "labels",
                F.map_concat(drop_labels("labels", list(self.ext_labels)),
                             ext))
        return out

    def series(self, match: list[str], start_ms: int, end_ms: int,
               limit: int = 0) -> DataFrame:
        out = (self._matched(match, start_ms, end_ms)
               .select(canonical_sig("labels").alias("sig"), "labels")
               .dropDuplicates(["sig"])
               .orderBy("sig"))
        return out.limit(limit) if limit else out

    def _stats_fast_path(self, match) -> DataFrame | None:
        """The sidecar answers only unconstrained metadata queries (the
        reference's dictionary shortcut is likewise matcher-free,
        search/search.go:153-201); matchers, stream decoration, and
        external labels fall back to the filtered scan."""
        if match or self.streams or self.ext_labels or \
                self.label_stats is None:
            return None
        return self.label_stats

    def _stats_in_range(self, start_ms: int, end_ms: int) -> DataFrame:
        import datetime as _dt

        def day(ms):
            return _dt.datetime.fromtimestamp(
                max(ms, 0) / 1000, _dt.timezone.utc).strftime("%Y-%m-%d")

        return self.label_stats.filter(
            (F.col("date") >= day(start_ms)) & (F.col("date") <= day(end_ms)))

    def label_names(self, match: list[str] | None, start_ms: int, end_ms: int,
                    limit: int = 0) -> DataFrame:
        """Reference: schema-level when unconstrained, filtered scan otherwise
        (search/search.go:294-345).  With a converted table's label-stats
        sidecar the unconstrained case never touches the samples."""
        if self._stats_fast_path(match) is not None:
            out = (self._stats_in_range(start_ms, end_ms)
                   .select(F.col("label").alias("name"))
                   .distinct().orderBy("name"))
            return out.limit(limit) if limit else out
        out = (self._matched(match or [], start_ms, end_ms)
               .select(F.explode(F.map_keys("labels")).alias("name"))
               .distinct().orderBy("name"))
        return out.limit(limit) if limit else out

    def label_values(self, name: str, match: list[str] | None,
                     start_ms: int, end_ms: int, limit: int = 0) -> DataFrame:
        """Reference: dictionary shortcut without matchers, filtered distinct
        with matchers (search/search.go:153-262).  The sidecar (when the
        engine was built from a converted table) IS the dictionary: distinct
        (label, value) per stream/day, no samples scan."""
        if self._stats_fast_path(match) is not None:
            out = (self._stats_in_range(start_ms, end_ms)
                   .filter(F.col("label") == name)
                   .select("value").filter(F.col("value") != "")
                   .distinct().orderBy("value"))
            return out.limit(limit) if limit else out
        out = (self._matched(match or [], start_ms, end_ms)
               .select(label("labels", name).alias("value"))
               .filter(F.col("value") != "")
               .distinct().orderBy("value"))
        return out.limit(limit) if limit else out
