"""Time EVERY registry query at a given sf dir (default sf0.1): build + noop
drain, min over reps.  The optimization-round coverage sweep — finds slow
non-headline operators that diffcheck (correctness-only) doesn't surface.

Usage: python tools/sweep_registry.py [sf_dir] [--reps N] [--out FILE]
Prints one JSON line {"queries": {name: {"compile": s, "exec": s}}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    args = sys.argv[1:]
    out_path = None
    reps = 2
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from thanos_parquet_gateway_spark import get_spark

    spark = get_spark("sweep")
    qs = entry.queries()
    res = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        try:
            cmin = emin = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                cmin = min(cmin, t1 - t0)
                emin = min(emin, t2 - t1)
            res[name] = {"compile": round(cmin, 3), "exec": round(emin, 3)}
        except Exception as e:  # streaming entries need a sink, etc.
            res[name] = {"err": str(e).split("\n")[0][:200]}
        spark.sparkContext.setJobDescription(None)
    out = {"sf_dir": sf_dir, "queries": res,
           "loadavg": os.getloadavg()[0]}
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
