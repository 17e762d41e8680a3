"""Deduplication operators over document corpora (SURVEY.md §7.1 M8).

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard.  All hashing is built from md5 (hex string) so an
independent SQL oracle can replicate results bit-for-bit; all set/fold math is
integer or string min/max — fully deterministic under any execution order.

Scale design: no collects, no UDFs.  MinHash+LSH candidate generation is a
self-equi-join on (band, band_key) — a shuffle join on a high-cardinality key
that AQE handles well; bucket sizes are bounded by near-duplicate cluster
sizes, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE = (1 << 31) - 1


def normalized_words(text_col) -> "F.Column":
    """Lowercased whitespace-tokenized words."""
    return F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")


def shingles(words_col, n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles: slice windows out of the token array."""
    k = F.greatest(F.size(words_col) - (n - 1), F.lit(0))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.array_join(F.slice(words_col, i, n), " ")))


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per md5(text) group.
    Returns (content_hash, keep_id, n_copies)."""
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """MinHash signature per doc: h_i(doc) = min over shingles of
    md5(i || '|' || shingle) (string min ≡ min over a uniform hash family).
    Returns (doc_id, seed, minhash)."""
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     shingles(normalized_words(F.col(text_col)), shingle_n)
                     .alias("sh"))
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    seeds = exploded.select(
        "doc_id", "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"))
    return (seeds
            .groupBy("doc_id", "seed")
            .agg(F.min(F.md5(F.concat(F.col("seed").cast("string"),
                                      F.lit("|"), F.col("shingle"))))
                 .alias("minhash")))


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 8,
                        bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """LSH banding: split the signature into `bands` bands of num_hashes/bands
    rows; docs sharing any band bucket become candidate pairs (a < b).
    Returns (doc_a, doc_b) distinct."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    band_keys = (sig
                 .withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
                 .groupBy("doc_id", "band")
                 .agg(F.md5(F.concat_ws(",", F.array_sort(
                     F.collect_list(F.concat(F.col("seed").cast("string"),
                                             F.lit(":"), F.col("minhash"))))))
                      .alias("band_key")))
    a = band_keys.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = band_keys.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (a.join(b, ["band", "band_key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.8,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (from LSH by
    default): |A∩B| / |A∪B| over distinct shingle sets.
    Returns (doc_a, doc_b, inter, union, jaccard ≥ threshold)."""
    if candidates is None:
        candidates = lsh_candidate_pairs(docs, text_col, id_col,
                                         shingle_n=shingle_n)
    sh = docs.select(F.col(id_col).alias("doc_id"),
                     shingles(normalized_words(F.col(text_col)), shingle_n)
                     .alias("sh"),
                     )
    sh = sh.select("doc_id", "sh", F.size("sh").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"),
                  F.col("n_sh").alias("n_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"),
                  F.col("n_sh").alias("n_b"))
    j = (candidates.join(a, "doc_a").join(b, "doc_b")
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("union", F.col("n_a") + F.col("n_b") - F.col("inter"))
         .withColumn("jaccard",
                     F.col("inter").cast("double") / F.col("union").cast("double")))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "inter", "union", "jaccard"))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """32-bit SimHash over word tokens (with multiplicity): bit j of
    md5(word)'s first 8 hex digits votes ±1; sign of the vote sum sets the
    output bit.  Integer math only — order-independent, oracle-replicable.
    Returns (doc_id, simhash long)."""
    assert bits <= 32
    words = docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(normalized_words(F.col(text_col)))
                        .alias("w")).filter(F.col("w") != "")
    h = words.withColumn("hx", F.md5(F.col("w")))
    # contribution vector: for j in 0..bits-1, ±1 from hex digit bit
    def bit_mask(j):
        jm = j % 4
        return (F.when(jm == 0, 1).when(jm == 1, 2)
                 .when(jm == 2, 4).otherwise(8))

    contrib = h.withColumn(
        "vec",
        F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda j: (F.conv(
                F.col("hx").substr((j / 4).cast("int") + 1, F.lit(1)),
                16, 10).cast("int")
                .bitwiseAND(bit_mask(j)) > 0).cast("int") * 2 - 1))
    summed = (contrib.groupBy("doc_id")
              .agg(F.aggregate(
                  F.collect_list("vec"),
                  F.array_repeat(F.lit(0), bits),
                  lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y))
                  .alias("votes")))
    sim = summed.withColumn(
        "simhash",
        F.aggregate(F.sequence(F.lit(0), F.lit(bits - 1)), F.lit(0).cast("long"),
                    lambda acc, j: acc + F.when(
                        F.element_at(F.col("votes"), j + 1) > 0,
                        F.pow(F.lit(2.0), j).cast("long"))
                        .otherwise(F.lit(0).cast("long"))))
    return sim.select("doc_id", "simhash")
