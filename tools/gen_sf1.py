"""Generate the sf1 scale rung: a 10x replication of the driver's sf0.1
tables, written to .bench/sf1 (gitignored), used by bench.py's optional
scale block to test the 100x-design claims empirically (the reference
benches a 1.5M-series "realistic" corpus the same way,
db/db_bench_test.go:143-307).

Replication is key-shifted so workloads scale LINEARLY, not
quadratically:

- events: 10x the user population (user_id offset per replica) → 10x the
  series set over the same 30-day window; event_id reshifted.
- documents: doc_id offset; replica text deterministically word-shuffled
  (per-replica hash sort) so replicas are NOT near-duplicates of the
  source — otherwise LSH bucket sizes would grow 10x with all-pairs
  inside, turning the dedup bench quadratic instead of scaling the
  corpus.
- embeddings: vec_id offset; first component nudged by replica*1e-3 so
  vectors are distinct (queries stay the vec_id<3 originals).
- lineitem/orders: 10x facts with o_orderkey/l_orderkey co-shifted so the
  join keys still line up; dimension tables (customer/supplier/part/
  nation/region) copied as-is — the realistic big-facts/small-dims shape.

Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

COPY_TABLES = ("region", "nation", "customer", "supplier", "part")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES + ("events", "documents", "embeddings",
                            "lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{src}/{t}.parquet'")
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({factor})) AS r")

    def copy(sql: str, name: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for t in COPY_TABLES:
        copy(f"SELECT * FROM {t}", t)

    copy("""
        SELECT e.event_id + r.r * (SELECT max(event_id)+1 FROM events)
                   AS event_id,
               e.ts,
               e.user_id + r.r * (SELECT max(user_id)+1 FROM events)
                   AS user_id,
               e.event_type, e.value, e.props
        FROM events e, reps r
    """, "events")

    # replica text: per-replica word SUFFIX + deterministic permutation
    # keyed on (word, position, replica) — replicas are fresh documents,
    # not near-duplicates of the source.  The suffix is what guarantees
    # freshness: a permutation alone leaves REPETITIVE docs ("a a a a")
    # byte-identical across replicas, and those collisions grow the LSH
    # candidate-pair count QUADRATICALLY in the replication factor
    # (observed: 48.6k pairs at 10x vs 4.7M at 100x ≈ C(100,2)/C(10,2))
    # — a rung generated that way measures the data artifact, not the
    # engine.  Suffixing every word remaps the whole shingle vocabulary
    # per replica (zero cross-replica overlap) while preserving each
    # replica's INTERNAL dup structure (both members of a planted dup
    # pair get the same transformation), so the corpus scales linearly
    # like a real one.  The position in the permutation key still
    # matters: hashing the word alone would sort duplicate words into
    # runs shared by every shuffled doc.
    shuf = """array_to_string(list_transform(list_sort(
        list_transform(
            list_zip(string_split(d.text, ' '),
                     range(1, len(string_split(d.text, ' ')) + 1)),
            p -> {'h': hash(p[1] || '#' || CAST(p[2] AS VARCHAR) ||
                            '#' || CAST(r.r AS VARCHAR)),
                  'w': p[1] || '~' || CAST(r.r AS VARCHAR)})),
        s -> s.w), ' ')"""
    copy(f"""
        SELECT d.doc_id + r.r * (SELECT max(doc_id)+1 FROM documents)
                   AS doc_id,
               CASE WHEN r.r = 0 THEN d.text ELSE {shuf} END AS text,
               d.lang, d.source,
               CASE WHEN r.r = 0 THEN d.n_chars
                    ELSE length({shuf}) END AS n_chars
        FROM documents d, reps r
    """, "documents")

    copy("""
        SELECT e.vec_id + r.r * (SELECT max(vec_id)+1 FROM embeddings)
                   AS vec_id,
               CAST(list_prepend(e.embedding[1] + r.r * 0.001,
                                 e.embedding[2:]) AS FLOAT[]) AS embedding,
               e.label
        FROM embeddings e, reps r
    """, "embeddings")

    copy("""
        SELECT l.l_orderkey + r.r * (SELECT max(o_orderkey)+1 FROM orders)
                   AS l_orderkey,
               l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity,
               l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
               l.l_linestatus, l.l_shipdate
        FROM lineitem l, reps r
    """, "lineitem")

    copy("""
        SELECT o.o_orderkey + r.r * (SELECT max(o_orderkey)+1 FROM orders)
                   AS o_orderkey,
               o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
               o.o_orderpriority
        FROM orders o, reps r
    """, "orders")
    print(f"wrote sf1 rung to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
