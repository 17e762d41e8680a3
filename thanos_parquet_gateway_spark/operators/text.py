"""Text-analysis operators for training-data pipelines (SURVEY.md §7.1 M8):
language ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting (rolling hash).

Everything is built from integer counts and fixed-order folds so results are
deterministic and replicable by an independent SQL oracle; all expressions
are JVM-side built-ins (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thanos_parquet_gateway_spark.operators.dedup import MERSENNE, normalized_words

# tiny per-language stopword lists for the heuristic language detector
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non", "con", "del"],
}

# a BPE-ish pre-tokenization: letter runs | single digits | single symbols
TOKEN_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def stopword_hits(words: Column, stopwords: list[str]) -> Column:
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def detect_language(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID; ties break by language code order.
    Returns (doc_id, detected_lang, lang_hits)."""
    words = normalized_words(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), words.alias("__w"))
    hits = [F.struct(stopword_hits(F.col("__w"), sws).alias("hits"),
                     F.lit(lang).alias("lang"))
            for lang, sws in sorted(LANG_STOPWORDS.items())]
    # max over (hits, lang): highest hit count, tie → lexicographically
    # last language; deterministic.  'und' (undetermined) when zero hits.
    best = F.greatest(*hits) if len(hits) > 1 else hits[0]
    return (d.withColumn("__best", best)
            .select("doc_id",
                    F.when(F.col("__best.hits") > 0, F.col("__best.lang"))
                     .otherwise(F.lit("und")).alias("detected_lang"),
                    F.col("__best.hits").cast("long").alias("lang_hits")))


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation, alpha ratio,
    mean word length sanity.  Pure integer-ratio math (deterministic).
    Returns (doc_id, n_chars, n_words, alpha_ratio, mean_word_len, quality)."""
    t = F.col(text_col)
    words = normalized_words(t)
    n_chars = F.length(t)
    n_words = F.size(words)
    n_alpha = n_chars - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    mean_wl = (n_chars - n_words + 1).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    len_score = F.least(n_chars, F.lit(500)).cast("double") / 500.0
    wl_score = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    quality = (len_score * 0.4 + alpha_ratio * 0.4 + wl_score * 0.2)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        alpha_ratio.alias("alpha_ratio"),
        mean_wl.alias("mean_word_len"),
        quality.alias("quality"))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count.
    Returns (doc_id, ws_tokens, bpe_tokens)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(normalized_words(t)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).cast("long")
         .alias("bpe_tokens"))


def chunk_documents(docs: DataFrame, chunk_words: int = 100,
                    overlap: int = 20, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_tail: int = 1) -> DataFrame:
    """Split documents into overlapping fixed-size word windows — the
    sequence-chunking step of a training pipeline (context-window packing,
    embedding-corpus prep).  Chunk i covers words [i*stride, i*stride +
    chunk_words) with stride = chunk_words - overlap; the final partial
    chunk is kept when it has ≥ ``min_tail`` NEW words beyond the previous
    chunk's coverage.

    Pure narrow plan: split → sequence → transform → posexplode, all
    JVM-side per row, no shuffle at any scale.  Returns
    (doc_id, chunk_idx, n_words, chunk)."""
    if overlap >= chunk_words:
        raise ValueError("overlap must be smaller than chunk_words")
    stride = chunk_words - overlap
    # words materialized first: the chunk lambda slices the word array per
    # chunk, and slicing an outer array EXPRESSION re-runs the regex+split
    # per chunk under interpreted HOF eval
    docs = docs.select(F.col(id_col).alias(id_col),
                       normalized_words(F.col(text_col)).alias("__w"))
    words = F.col("__w")
    n = F.size(words)
    # number of chunks: 1 + ceil(max(0, n - chunk_words) / stride), with the
    # tail chunk dropped again if it adds < min_tail new words
    n_chunks = F.when(n <= chunk_words, F.lit(1)).otherwise(
        1 + F.ceil((n - chunk_words) / F.lit(float(stride))).cast("int"))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    keep = F.filter(
        starts,
        lambda s: (s == 0) | (n - s - overlap >= F.lit(min_tail)))
    chunks = F.transform(
        keep, lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.least(n - s, F.lit(chunk_words)).cast("long").alias("n_words"),
            F.array_join(F.slice(words, s + 1, chunk_words), " ")
            .alias("chunk")))
    ex = docs.select(F.col(id_col).alias("doc_id"),
                     F.explode(chunks).alias("c"))
    return ex.select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"),
                     F.col("c.n_words").alias("n_words"),
                     F.col("c.chunk").alias("chunk"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", base: int = 31) -> DataFrame:
    """Rolling polynomial hash over word tokens mod 2^31-1; word hash =
    first 7 hex digits of md5 (fits 28 bits, products fit int64).
    Returns (doc_id, fingerprint long)."""
    words = normalized_words(F.col(text_col))
    word_hashes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long"))
    fp = F.aggregate(word_hashes, F.lit(0).cast("long"),
                     lambda acc, h: (acc * base + h) % MERSENNE)
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def pack_sequences(docs: DataFrame, *, capacity_tokens: int = 2048,
                   n_shards: int = 64, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Context-window packing: assign whole documents to token-budget packs
    of ≈``capacity_tokens`` (documents are never split; a pack may overrun
    by at most one document's tokens — the standard budget-shard
    formulation of greedy packing).

    Scale shape (100 TB): a GLOBAL ordered cumulative sum would funnel the
    corpus through one partition, so packing is sharded — docs hash to
    ``n_shards`` independent shards and the running token sum is a window
    partitioned BY SHARD (parallel across executors, each shard's window
    is a single sort+scan).  pack_id = shard·2³² + local pack ordinal is
    globally unique.  Returns (doc_id, shard, n_tokens, pack_id).
    """
    if capacity_tokens < 1 or n_shards < 1:
        raise ValueError("capacity_tokens and n_shards must be >= 1")
    from pyspark.sql import Window
    toks = F.size(normalized_words(F.col(text_col))).cast("long")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
                        .alias("shard"),
                       toks.alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    pack_local = F.floor(cum_before / F.lit(capacity_tokens))
    return base.select(
        "doc_id", "shard", "n_tokens",
        (F.col("shard") * F.lit(1 << 32) + pack_local).alias("pack_id"))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(docs: DataFrame, *, min_words: int = 50,
                   max_words: int = 100_000,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-rule document quality signals (Rae et al. 2021 §A1.1, public):
    word-count bounds, mean word length in [3,10], symbol-to-word ratio
    ≤ 0.1, <90% bullet lines, <30% ellipsis lines, ≥80% words with an
    alphabetic character, ≥2 distinct required stop words.  Every signal is
    an integer count or an exact ratio of integers — cross-engine
    reproducible — and the whole computation is a narrow per-row JVM plan
    (no shuffle at any scale).

    Returns (doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
    bullet_line_frac, ellipsis_line_frac, stop_hits, passes).
    """
    t = F.col(text_col)
    words = normalized_words(t)
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wl = nonspace.cast("double") / nw
    symbols = F.regexp_count(t, F.lit(r"#|\.\.\.")).cast("double")
    symbol_ratio = symbols / nw
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_frac = alpha_words.cast("double") / nw
    lines = F.split(t, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.size(F.filter(
        lines, lambda l: l.rlike(r"^\s*[-*•]"))).cast("double") / n_lines
    ellipsis_frac = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))).cast("double") / n_lines
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(F.array_intersect(words, stop_arr))
    passes = ((n_words >= min_words) & (n_words <= max_words) &
              (mean_wl >= 3.0) & (mean_wl <= 10.0) &
              (symbol_ratio <= 0.1) &
              (bullet_frac < 0.9) & (ellipsis_frac < 0.3) &
              (alpha_frac >= 0.8) & (stop_hits >= 2))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        passes.alias("passes"))


# (name, pattern, replacement) in fixed application order; patterns restricted
# to the Java∩RE2 regex subset so an independent engine reproduces them
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scan(docs: DataFrame, *, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """PII detection + redaction for training-data hygiene: per-document
    match counts for each pattern class and a redacted text column with
    matches replaced by typed placeholders (applied in fixed PII_PATTERNS
    order, so overlapping classes — SSN before the looser phone pattern —
    resolve deterministically).  regexp_count/regexp_replace are JVM
    built-ins; the plan is narrow and shuffle-free at any scale.

    Returns (doc_id, n_email, n_ssn, n_phone, n_ipv4, redacted).
    """
    t = F.col(text_col)
    counts = [F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
              for name, pat, _ in PII_PATTERNS]
    red = t
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return docs.select(F.col(id_col).alias("doc_id"), *counts,
                       red.alias("redacted"))


def repetition_signals(docs: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_dup_line_frac: float = 0.30,
                       max_dup_line_char_frac: float = 0.20,
                       max_top_2gram_char_frac: float = 0.20) -> DataFrame:
    """Within-document repetition signals (Gopher repetition rules, Rae et
    al. 2021 §A1.1 "repetitious" filters, public): fraction of duplicate
    lines, fraction of characters inside duplicate lines, and the fraction
    of word characters covered by the single most frequent word 2-gram.

    Definitions (fixed so an independent SQL oracle reproduces them):
    - lines = trimmed non-empty '\\n' splits; a line is *duplicate* when its
      exact text occurs more than once in the document, and every
      occurrence counts toward the duplicate-character numerator.
    - the top 2-gram is chosen by (occurrences DESC, gram ASC); its
      character mass is occurrences × len(gram without the joining space),
      over total word characters.
    All signals are integer counts or ratios of integers, computed with
    per-row array folds — a narrow, shuffle-free JVM plan at any scale
    (no explode, no groupBy; document length bounds per-row work).

    Returns (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac, passes).
    """
    t = F.col(text_col)

    # Occurrence counts come from ONE O(n log n) sort + ONE linear
    # run-length fold per array — NOT from a nested filter-count per
    # distinct element.  The nested form re-evaluates the whole array
    # expression (regex + split + gram build) on every lambda invocation
    # under interpreted HOF eval and is O(n²) per document on top of that:
    # measured 17+ CPU-minutes for ONE task over 5 000 ~300-char docs at
    # sf0.1, vs well under a second for this formulation (r12 plan audit).
    # Values are integer counts either way — bit-identical results.
    #
    # The word/line arrays are materialized behind a projection boundary
    # FIRST: a lambda that indexes an outer array EXPRESSION (get(words,i))
    # re-evaluates the regex+split per element under interpreted eval;
    # indexing a bound attribute is O(1) (CollapseProject keeps non-cheap
    # multi-use expressions un-inlined, SPARK-36718).
    arrs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
                 lambda l: l != "").alias("__lines"),
        normalized_words(t).alias("__words"))
    lines = F.col("__lines")
    long0 = F.lit(0).cast("long")

    # run-length stats over sorted lines: runs = distinct count; every
    # occurrence of a line seen more than once contributes its length to
    # the duplicate-character numerator.
    line_stats = F.aggregate(
        F.array_sort(lines),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 long0.alias("run"), long0.alias("runs"),
                 long0.alias("dup")),
        lambda a, l: F.when(
            a["prev"].isNull() | (a["prev"] != l),
            F.struct(l.alias("prev"), F.lit(1).cast("long").alias("run"),
                     (a["runs"] + 1).alias("runs"),
                     (a["dup"] + F.when(a["run"] > 1,
                                        a["run"] * F.length(a["prev"]))
                      .otherwise(long0)).alias("dup"))
        ).otherwise(F.struct(a["prev"].alias("prev"),
                             (a["run"] + 1).alias("run"),
                             a["runs"].alias("runs"),
                             a["dup"].alias("dup"))),
        lambda a: F.struct(
            a["runs"].alias("runs"),
            (a["dup"] + F.when(a["run"] > 1, a["run"] * F.length(a["prev"]))
             .otherwise(long0)).alias("dup")))

    words = F.col("__words")
    n_words = F.size(words)
    grams = F.when(
        n_words >= 2,
        F.transform(F.sequence(F.lit(0), n_words - 2),
                    lambda i: F.concat(F.get(words, i), F.lit(" "),
                                       F.get(words, i + 1)))
    ).otherwise(F.array().cast("array<string>"))

    # top 2-gram by (occurrences DESC, gram ASC): walking runs of the
    # SORTED grams with a strictly-greater update keeps the first (i.e.
    # lexicographically smallest) gram among the tied maxima — the same
    # total order as ranking structs of (-count, gram).
    gram_stats = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 long0.alias("run"), long0.alias("bestc"),
                 F.lit(None).cast("string").alias("bestg")),
        lambda a, g: F.when(
            a["prev"].isNull() | (a["prev"] != g),
            F.struct(g.alias("prev"), F.lit(1).cast("long").alias("run"),
                     F.when(a["run"] > a["bestc"], a["run"])
                      .otherwise(a["bestc"]).alias("bestc"),
                     F.when(a["run"] > a["bestc"], a["prev"])
                      .otherwise(a["bestg"]).alias("bestg"))
        ).otherwise(F.struct(a["prev"].alias("prev"),
                             (a["run"] + 1).alias("run"),
                             a["bestc"].alias("bestc"),
                             a["bestg"].alias("bestg"))),
        lambda a: F.struct(
            F.when(a["run"] > a["bestc"], a["run"])
             .otherwise(a["bestc"]).alias("bestc"),
            F.when(a["run"] > a["bestc"], a["prev"])
             .otherwise(a["bestg"]).alias("bestg")))

    line_chars = F.aggregate(lines, long0, lambda a, l: a + F.length(l))
    word_chars = F.aggregate(words, long0, lambda a, w: a + F.length(w))

    # materialize the folds across a second projection boundary so each is
    # evaluated once per row
    staged = arrs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        line_stats.alias("__ls"), gram_stats.alias("__gs"),
        line_chars.alias("__lc"), word_chars.alias("__wc"))
    n_lines = F.col("n_lines")
    dup_line_frac = (n_lines - F.col("__ls")["runs"]).cast("double") / \
        F.greatest(n_lines, F.lit(1)).cast("double")
    dup_char_frac = (F.col("__ls")["dup"].cast("double") /
                     F.greatest(F.col("__lc"), F.lit(1)).cast("double"))
    top_chars = F.when(
        F.col("__gs")["bestc"] > 0,
        F.col("__gs")["bestc"] *
        F.length(F.regexp_replace(F.col("__gs")["bestg"], " ", ""))
    ).otherwise(long0)
    top_frac = (top_chars.cast("double") /
                F.greatest(F.col("__wc"), F.lit(1)).cast("double"))

    passes = ((dup_line_frac <= max_dup_line_frac) &
              (dup_char_frac <= max_dup_line_char_frac) &
              (top_frac <= max_top_2gram_char_frac))
    return staged.select(
        "doc_id",
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"),
        top_frac.alias("top_2gram_char_frac"),
        passes.alias("passes"))


def c4_filters(docs: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id", min_sentences: int = 3,
               min_line_words: int = 5) -> DataFrame:
    """C4-style document cleaning signals (Raffel et al. 2020 §2.2,
    public): a line is RETAINED when it ends in terminal punctuation
    (. ! ? ") and has at least ``min_line_words`` words; documents with
    fewer than ``min_sentences`` sentences, a '{' (code), or the phrase
    'lorem ipsum' fail.  All signals are integer counts / exact ratios over
    trimmed non-empty '\\n' lines — a narrow shuffle-free JVM plan.

    Returns (doc_id, n_lines, kept_line_frac, n_sentences,
    has_lorem_ipsum, has_brace, passes).
    """
    t = F.col(text_col)
    lines = F.filter(F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
                     lambda l: l != "")
    n_lines = F.size(lines)

    def _kept(l):
        words = F.size(F.split(F.trim(F.regexp_replace(l, r"\s+", " ")), " "))
        return l.rlike('[.!?"]$') & (words >= min_line_words)

    kept = F.size(F.filter(lines, _kept))
    kept_frac = (kept.cast("double") /
                 F.greatest(n_lines, F.lit(1)).cast("double"))
    n_sent = F.regexp_count(t, F.lit(r"[.!?]"))
    lorem = F.lower(t).contains("lorem ipsum")
    brace = t.contains("{")
    passes = (n_sent >= min_sentences) & ~lorem & ~brace
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.cast("long").alias("n_lines"),
        kept_frac.alias("kept_line_frac"),
        n_sent.cast("long").alias("n_sentences"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_brace"),
        passes.alias("passes"))


def token_entropy(docs: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  round_to: int | None = None) -> DataFrame:
    """Per-document unigram (word) Shannon entropy in nats:
    H = Σ_w (c_w/N)·ln(N/c_w) — a repetition/diversity signal used by
    training-data quality pipelines (low entropy ≈ templated/repetitive
    text).  The fold runs over the SORTED distinct-word array so the float
    sum order is fixed and an independent SQL oracle (list(... ORDER BY
    word) fold) matches bit-for-bit.  Narrow per-row plan, no shuffle.

    Returns (doc_id, n_words, n_distinct, entropy).
    """
    t = F.col(text_col)
    words = normalized_words(t)
    n = F.size(words)
    dw = F.array_sort(F.array_distinct(words))
    nd = F.greatest(n, F.lit(1)).cast("double")

    def _cnt(w):
        return F.size(F.filter(words, lambda x: x == w)).cast("double")

    ent = F.aggregate(
        dw, F.lit(0.0),
        lambda a, w: a + (_cnt(w) / nd) * F.log(nd / _cnt(w)))
    if round_to is not None:
        # see bm25_score: ln differs by an ulp across engines
        ent = F.round(ent, round_to)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_words"),
        F.size(dw).cast("long").alias("n_distinct"),
        ent.alias("entropy"))


def decontaminate(docs: DataFrame, benchmark: DataFrame, *, n: int = 13,
                  threshold: float = 0.0, text_col: str = "text",
                  id_col: str = "doc_id",
                  bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination for training corpora (the n-gram overlap
    scan of Brown et al. 2020 appendix C, public): mark a training document
    contaminated when the fraction of its distinct word ``n``-grams that
    also appear anywhere in the benchmark set exceeds ``threshold``
    (strictly; threshold=0.0 flags any single colliding n-gram).

    Scale shape (100 TB corpus vs a benchmark of at most a few hundred MB):
    the benchmark side reduces to a DISTINCT n-gram set that is hash-joined
    as the BROADCAST side, so the corpus is scanned once, exploded linearly
    (≤ one row per word), and aggregated back per document with map-side
    partial counts — no corpus shuffle keyed on gram text.  Grams join on
    the exact string (not a hash), so matches are collision-free.

    Returns (doc_id, n_grams, n_matched, overlap_frac, contaminated) for
    every document (zero-gram documents report 0/0/0.0/false).
    """
    if n < 1:
        raise ValueError("decontaminate: n must be >= 1")
    def _distinct_grams(words):
        # sequence(1, 0) steps DOWNWARD in Spark, so k < 1 needs an
        # explicit empty-gram branch rather than relying on the bound
        k = F.size(words) - (n - 1)
        return F.when(k >= 1, F.array_distinct(
            F.transform(F.sequence(F.lit(1), k),
                        lambda i: F.array_join(F.slice(words, i, n), " ")))
        ).otherwise(F.array().cast("array<string>"))

    # words materialized behind a projection boundary first: the gram
    # lambda slices the word array per element, and slicing an outer array
    # EXPRESSION re-runs the regex+split per gram under interpreted HOF
    # eval — per-document cost O(words × text_len) instead of O(text_len)
    bench_set = (benchmark
                 .select(normalized_words(F.col(bench_text_col))
                         .alias("__w"))
                 .select(F.explode(_distinct_grams(F.col("__w")))
                         .alias("gram"))
                 .distinct())

    ex = (docs.select(F.col(id_col).alias("doc_id"),
                      normalized_words(F.col(text_col)).alias("__w"))
          .select("doc_id",
                  F.explode_outer(_distinct_grams(F.col("__w")))
                  .alias("gram")))
    joined = ex.join(F.broadcast(bench_set.withColumn("__hit", F.lit(1))),
                     "gram", "left")
    agg = joined.groupBy("doc_id").agg(
        F.count("gram").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_matched"))
    frac = (F.col("n_matched").cast("double") /
            F.greatest(F.col("n_grams"), F.lit(1)).cast("double"))
    return agg.select(
        "doc_id", "n_grams", "n_matched", frac.alias("overlap_frac"),
        (frac > threshold).alias("contaminated"))


def search_tokens(text_col: Column) -> Column:
    """Lowercased alphanumeric tokens (split on any non-[a-z0-9] run) for
    retrieval scoring — unlike normalized_words this strips punctuation so
    'world!' and 'world' agree."""
    return F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"),
                    lambda w: w != "")


def bm25_score(docs: DataFrame, query_terms: list[str], *,
               k1: float = 1.2, b: float = 0.75, top_k: int = 10,
               round_to: int | None = None,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 top-k with the Lucene idf: ln(1 + (N-df+0.5)/(df+0.5)).

    Scale shape (100 TB): per-term tf is an array-filter count per row (no
    explode, no shuffle); corpus stats (N, Σdl, per-term df) reduce in ONE
    map-side-partial aggregation to a single broadcast row; every stat is
    an integer count so the double sums are exact and order-independent.
    The score sums ≤|query| contributions in sorted term order (fixed
    float order), and top-k lowers to TakeOrderedAndProject — the only
    shuffles are the 1-row stats agg and the k-row result.
    Returns (doc_id, score), score > 0 (docs matching no term drop).
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_score: query_terms must be non-empty")
    toks = search_tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
    base = base.withColumn("__dl", F.size("__toks").cast("double"))
    def _tf_count(term: str) -> Column:
        return F.size(F.filter(F.col("__toks"),
                               lambda w: w == F.lit(term))).cast("double")

    for i, t in enumerate(terms):
        base = base.withColumn(f"__tf{i}", _tf_count(t))
    stats = base.agg(
        F.count("*").cast("double").alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("double")).alias(f"__df{i}")
          for i in range(len(terms))])
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl") / F.col("__n")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl)
    contribs = []
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}")
        idf = F.log(F.lit(1.0) + (F.col("__n") - F.col(f"__df{i}") + 0.5)
                    / (F.col(f"__df{i}") + 0.5))
        contribs.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
    score = contribs[0]
    for c in contribs[1:]:  # fixed sorted-term order: deterministic floats
        score = score + c
    matched = None
    for i in range(len(terms)):
        hit = F.col(f"__tf{i}") > 0
        matched = hit if matched is None else (matched | hit)
    if round_to is not None:
        # rank on the rounded score: transcendental ops (ln) differ by an
        # ulp across engines, and an ulp at the top-k boundary would make
        # independent oracles pick different rows
        score = F.round(score, round_to)
    return (scored.filter(matched)
            .select("doc_id", score.alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(top_k))


def tfidf_top_terms(docs: DataFrame, *, top_n: int = 3,
                    round_to: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    min_term_len: int = 3) -> DataFrame:
    """Top-n terms per document by tf·idf (idf = ln(N/df), df = docs
    containing the term).

    Scale shape: explode → (doc, term) count (shuffle bounded by token
    count), df by a vocab-bounded term aggregation, broadcast-size N from
    a 1-row agg, per-doc top-n via window row_number.  Integer tf/df and a
    single ln keep scores bit-reproducible.  Ties break by term ascending.
    Returns (doc_id, term, tf, score).
    """
    from pyspark.sql import Window
    toks = search_tokens(F.col(text_col))
    ex = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(toks).alias("term"))
          .filter(F.length("term") >= min_term_len))
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n"))
    score = F.col("tf").cast("double") * F.log(F.col("n") / F.col("df"))
    if round_to is not None:
        score = F.round(score, round_to)  # see bm25_score: cross-engine ulp
    scored = (tf.join(df_, "term").crossJoin(F.broadcast(n))
              .withColumn("score", score))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("score").desc(), F.col("term").asc()))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_n)
            .select("doc_id", "term", "tf", "score"))
