"""Differential check: run every __spark_entry__ query against its DuckDB
oracle and compare exactly (the local preview of the driver's t2 gate).

Usage: python tools/diffcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    """Sort columns by name, then rows — mirrors the driver's compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import duckdb
    import __spark_entry__ as entry
    from thanos_parquet_gateway_spark import get_spark

    spark = get_spark("diffcheck")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    names = [n for n in sorted(qs) if not only or n in only]
    passed = failed = skipped = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(srows)} rows)")
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            failed += 1
        elif len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(orr)}")
            print(f"   spark: {sr[:3]}")
            print(f"   duck : {orr[:3]}")
            failed += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
            print(f"FAIL  {name}: {len(diffs)}/{len(sr)} rows differ; first:")
            for a, b in diffs[:3]:
                print(f"   spark: {a}")
                print(f"   duck : {b}")
            failed += 1
        else:
            print(f"OK    {name} ({len(sr)} rows)")
            passed += 1
    print(f"\n{passed} ok, {failed} fail, {skipped} skipped (rows-only)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
