"""Differential check: run every __spark_entry__ query against its DuckDB
oracle and compare exactly (the local preview of the driver's t2 gate).

Usage: python tools/diffcheck.py [sf_dir] [--out FILE] [query_name ...]

--out writes a JSON artifact (name -> {ok, rows, detail}) — committed as
DIFFCHECK_ALL_r<N>.json each round so the all-query proof is on record
(round-4 verdict item #2).
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
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
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
    record: dict[str, dict] = {}
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            record[name] = {"ok": False, "rows": None,
                            "detail": f"spark error: {type(e).__name__}: {e}"}
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(srows)} rows)")
            record[name] = {"ok": None, "rows": len(srows),
                            "detail": "no oracle (rows-only)"}
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            record[name] = {"ok": False, "rows": len(srows),
                            "detail": f"duckdb error: {e}"}
            failed += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            detail = f"columns {sc} vs {oc}"
            failed += 1
        elif len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(orr)}")
            print(f"   spark: {sr[:3]}")
            print(f"   duck : {orr[:3]}")
            detail = f"rowcount {len(sr)} vs {len(orr)}"
            failed += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
            print(f"FAIL  {name}: {len(diffs)}/{len(sr)} rows differ; first:")
            for a, b in diffs[:3]:
                print(f"   spark: {a}")
                print(f"   duck : {b}")
            detail = f"{len(diffs)}/{len(sr)} rows differ"
            failed += 1
        else:
            print(f"OK    {name} ({len(sr)} rows)")
            detail = None
            passed += 1
        record[name] = {"ok": detail is None, "rows": len(sr),
                        "detail": detail}
    print(f"\n{passed} ok, {failed} fail, {skipped} skipped (rows-only)")
    if out_path:
        import json
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "passed": passed, "failed": failed,
                       "skipped": skipped, "queries": record}, f, indent=1)
        print(f"wrote {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
