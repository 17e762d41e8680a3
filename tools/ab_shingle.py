"""A/B probe: window-based shingling (current) vs arrays_zip slicing
(no sort/window) feeding the LSH minhash aggregation.

Usage: python tools/ab_shingle.py [sf_dir]
Prints min-of-5 timings for dedup_lsh with each shingle implementation and
verifies both produce identical candidate pairs.
"""
from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def shingle_rows_zip(docs: DataFrame, text_col="text", id_col="doc_id",
                     shingle_n=3, parallelism=None, distinct=True):
    from thanos_parquet_gateway_spark.operators.dedup import (
        _hash_parallelism, normalized_words)
    d = docs.repartition(parallelism or _hash_parallelism(docs),
                         F.col(id_col))
    w = normalized_words(F.col(text_col))
    n = F.greatest(F.size(w) - (shingle_n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(w, i + 1, n).alias(f"w{i}")
                            for i in range(shingle_n)])
    out = (d.select(F.col(id_col).alias("doc_id"),
                    F.explode(zipped).alias("z"))
           .select("doc_id",
                   F.concat_ws(" ", *[F.col(f"z.w{i}")
                                      for i in range(shingle_n)])
                   .alias("shingle")))
    return out.dropDuplicates(["doc_id", "shingle"]) if distinct else out


def lsh_pairs_with(shingler, docs, num_hashes=8, bands=4):
    """lsh_candidate_pairs clone parameterized by the shingle source."""
    rows_per_band = num_hashes // bands
    band_seeds = [list(range(b * rows_per_band, (b + 1) * rows_per_band))
                  for b in range(bands)]
    sh = shingler(docs, distinct=False)
    mins = sh.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(s), "shingle")).alias(f"h{s}")
        for s in range(num_hashes)])
    band_keys = mins.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col(f"h{s}") for s in seeds])
                 .alias("band_key"))
        for b, seeds in enumerate(band_seeds)])).alias("bk")
    ).select("doc_id", "bk.band", "bk.band_key")
    buckets = (band_keys.groupBy("band", "band_key")
               .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
               .filter((F.size("ids") > 1) & (F.size("ids") <= 1000)))
    pairs = buckets.select(F.explode(F.flatten(F.transform(
        F.col("ids"),
        lambda a, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")))))).alias("p"))
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from thanos_parquet_gateway_spark import get_spark
    from thanos_parquet_gateway_spark.operators.dedup import shingle_rows
    from thanos_parquet_gateway_spark.sources.tables import load_table

    spark = get_spark("ab-shingle")
    docs = load_table(spark, sf_dir, "documents")

    a = lsh_pairs_with(shingle_rows, docs)
    b = lsh_pairs_with(shingle_rows_zip, docs)
    ra = {(r[0], r[1]) for r in a.collect()}
    rb = {(r[0], r[1]) for r in b.collect()}
    print("pairs equal:", ra == rb, len(ra), len(rb))

    def t(df):
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    print("window:", t(a), "zip:", t(b), "window2:", t(a), "zip2:", t(b))


if __name__ == "__main__":
    main()
