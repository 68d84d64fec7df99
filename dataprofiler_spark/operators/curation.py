"""Corpus-curation operators for LLM training-data pipelines:
Gopher-style repetition signals, corpus-wide cross-document n-gram
duplication, and PII redaction.

These extend the reference's profiling surface (capitalone/DataProfiler
has no corpus-curation layer) with the filters a 100 TB web-corpus
pipeline applies before training — the repetition thresholds follow the
published Gopher/MassiveText rules (Rae et al. 2021, table A1 shape:
duplicate-word fraction, top-2-gram fraction) re-expressed as Spark
aggregations.

Scale notes
-----------
- ``repetition_signals``: per-document map-side expressions plus ONE
  explode→groupBy keyed by (doc, bigram) then (doc). The shuffle key is
  the document id — cardinality n_docs, uniformly distributed, no skew;
  at 100 TB this is a standard two-stage partial→final aggregate.
- ``crossdoc_ngram_dup_summary``: per-doc DISTINCT n-grams (map-side
  dedup shrinks the shuffle), one groupBy on the n-gram itself —
  exactly the shape of the MinHash shingle pass in operators/dedup.py,
  and like it the hot key risk is bounded because n-grams are hashed
  64-bit before the shuffle (fixed-width rows, no giant strings).
- ``pii_redact``: pure per-row regexp expressions — zero shuffle,
  whole-stage codegen, filter-pushdown friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataprofiler_spark.operators.dedup import \
    DEFAULT_MAX_BUCKET_SIZE as _DEF_BUCKET

from dataprofiler_spark.operators.textanalysis import tokens_expr


def _bigrams_expr(toks: Column) -> Column:
    """``toks`` MUST be a materialized column attribute, not an inline
    expression: higher-order-function lambdas are interpreted with no
    common-subexpression reuse, so an inline ``regexp_extract_all`` here
    would re-tokenize the document once per element — O(tokens²)."""
    # sequence(1, 0) would count DOWN in Spark — guard short docs first.
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                               F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _ngrams_expr(toks: Column, n: int) -> Column:
    """Word n-grams; same materialized-column requirement as
    :func:`_bigrams_expr`."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, F.lit(n)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       round_digits: int = 6) -> DataFrame:
    """Per-document repetition features (Gopher/MassiveText shape):

    (id, n_tokens, dup_word_fraction, top_bigram_count,
    top_bigram_fraction)

    - dup_word_fraction: 1 − distinct_tokens / tokens (map-side array
      expression, no shuffle).
    - top_bigram_fraction: occurrences of the most frequent word bigram
      over all bigram slots — high values flag boilerplate/spam docs.
    """
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)
    # Tokenize ONCE into a column *after* the exchange; the follow-up
    # projection references the column attribute, which Catalyst keeps as
    # a separate Project (multi-referenced non-cheap aliases don't
    # collapse), so the regexp runs once per row — not once per bigram.
    tokd = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("toks"))
    tcol = F.col("toks")
    base = tokd.select(
        "id",
        F.size(tcol).alias("n_tokens"),
        F.size(F.array_distinct(tcol)).alias("n_distinct"),
        _bigrams_expr(tcol).alias("bigrams"),
    )
    big = (
        explode_no_prefilter(base, "bigrams", "bigram", "id")
        .groupBy("id", "bigram").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id").agg(F.max("c").alias("top_bigram_count"),
                           F.sum("c").alias("n_bigrams"))
    )
    out = base.drop("bigrams").join(big, "id", "left")
    dup_frac = F.when(
        F.col("n_tokens") > 0,
        1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
        F.col("top_bigram_count").cast("double") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "id", "n_tokens",
        F.round(dup_frac, round_digits).alias("dup_word_fraction"),
        F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("long")
         .alias("top_bigram_count"),
        F.round(top_frac, round_digits).alias("top_bigram_fraction"),
    )


def oracle_repetition_signals_sql(table: str, id_col: str, text_col: str,
                                  round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table}
), big AS (
  SELECT id, unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM base
), bagg AS (
  SELECT id, MAX(c) AS top_bigram_count, CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM (SELECT id, bigram, COUNT(*) AS c FROM big GROUP BY id, bigram)
  GROUP BY id
)
SELECT b.id,
       len(toks) AS n_tokens,
       ROUND(CASE WHEN len(toks) > 0
             THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END, {round_digits}) AS dup_word_fraction,
       COALESCE(top_bigram_count, 0) AS top_bigram_count,
       ROUND(CASE WHEN COALESCE(n_bigrams, 0) > 0
             THEN CAST(top_bigram_count AS DOUBLE) / n_bigrams
             ELSE 0.0 END, {round_digits}) AS top_bigram_fraction
FROM base b LEFT JOIN bagg USING (id)
"""


def crossdoc_ngram_dup_summary(df: DataFrame, id_col: str, text_col: str,
                               n: int = 5, round_digits: int = 6
                               ) -> DataFrame:
    """Corpus-wide n-gram duplication: how much n-gram mass is shared
    across documents (the signal behind suffix-array / exact-substring
    dedup decisions).

    One row: (ngram_n, n_distinct_ngrams, n_shared_ngrams,
    shared_ngram_fraction, max_docs_per_ngram).

    Per-doc DISTINCT n-grams are hashed 64-bit map-side, so the single
    shuffle moves fixed-width (hash, doc) rows, not strings.
    """
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)
    # Same two-step tokenize-to-column structure as repetition_signals —
    # see _bigrams_expr docstring for why inline tokens would be O(T²).
    tokd = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("toks"))
    gramd = tokd.select(
        "id", F.array_distinct(_ngrams_expr(F.col("toks"), n)).alias("grams"))
    grams = (
        explode_no_prefilter(gramd, "grams", "gram", "id")
        .select("id", F.xxhash64("gram").alias("gram_h"))
    )
    per_gram = grams.groupBy("gram_h").agg(
        F.count(F.lit(1)).alias("n_docs_with"))
    n_distinct = F.count(F.lit(1))
    n_shared = F.coalesce(
        F.sum(F.when(F.col("n_docs_with") >= 2, 1).otherwise(0)), F.lit(0))
    return per_gram.agg(
        F.lit(n).cast("int").alias("ngram_n"),
        n_distinct.alias("n_distinct_ngrams"),
        n_shared.alias("n_shared_ngrams"),
        F.round(F.when(n_distinct > 0,
                       n_shared.cast("double") / n_distinct)
                 .otherwise(F.lit(0.0)),
                round_digits).alias("shared_ngram_fraction"),
        F.coalesce(F.max("n_docs_with"), F.lit(0).cast("long"))
         .alias("max_docs_per_ngram"),
    )


def oracle_crossdoc_ngram_dup_sql(table: str, id_col: str, text_col: str,
                                  n: int = 5, round_digits: int = 6) -> str:
    # DuckDB list slices are 1-based inclusive: t[i:i+n-1] is n tokens.
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH grams AS (
  SELECT DISTINCT {id_col} AS id,
         unnest(list_transform(range(1, len(toks) - {n} + 2),
                i -> array_to_string(toks[i:i + {n} - 1], ' '))) AS gram
  FROM (SELECT {id_col}, {toks} AS toks FROM {table})
), per_gram AS (
  SELECT gram, COUNT(*) AS n_docs_with FROM grams GROUP BY gram
)
SELECT CAST({n} AS INTEGER) AS ngram_n,
       COUNT(*) AS n_distinct_ngrams,
       CAST(COALESCE(SUM(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_shared_ngrams,
       ROUND(CASE WHEN COUNT(*) > 0 THEN
               CAST(COALESCE(SUM(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0
                             END), 0) AS DOUBLE) / COUNT(*)
             ELSE 0.0 END, {round_digits}) AS shared_ngram_fraction,
       CAST(COALESCE(MAX(n_docs_with), 0) AS BIGINT) AS max_docs_per_ngram
FROM per_gram
"""


def substring_dup_signals(df: DataFrame, id_col: str, text_col: str,
                          window: int = 10, round_digits: int = 6
                          ) -> DataFrame:
    """Per-document exact-substring duplication (the signal behind
    suffix-array dedup à la "Deduplicating Training Data Makes Language
    Models Better", re-expressed as fixed-width token windows):

    (id, n_windows, n_dup_windows, dup_window_fraction)

    A window = ``window`` consecutive tokens, stride 1. A window slot is
    *duplicated* when its content occurs ≥2 times corpus-wide (counting
    multiplicity — a within-doc repeat also counts, exactly like a
    suffix-array match would). Docs shorter than ``window`` tokens have 0
    windows and fraction 0.

    Scale shape: windows are xxhash64'd map-side, so the two shuffles
    (groupBy hash for corpus counts; groupBy id for the per-doc rollup)
    move fixed-width rows. The corpus-count join is hash-to-hash —
    uniform key, no skew. Identical shape to the MinHash shingle pass.
    """
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)
    tokd = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), tokens_expr(text_col).alias("toks"))
    # NOT array_distinct: multiplicity matters for within-doc repeats.
    wind = tokd.select("id", _ngrams_expr(F.col("toks"), window).alias("ws"))
    occ = (explode_no_prefilter(wind, "ws", "w", "id")
           .select("id", F.xxhash64("w").alias("h")))
    counts = occ.groupBy("h").agg(F.count(F.lit(1)).alias("corpus_c"))
    per_doc = (occ.join(counts, "h")
               .groupBy("id").agg(
                   F.count(F.lit(1)).alias("n_windows"),
                   F.sum(F.when(F.col("corpus_c") >= 2, 1).otherwise(0))
                    .alias("n_dup_windows")))
    all_docs = df.select(F.col(id_col).alias("id"))
    out = all_docs.join(per_doc, "id", "left")
    nw = F.coalesce(F.col("n_windows"), F.lit(0)).cast("long")
    nd = F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long")
    return out.select(
        "id", nw.alias("n_windows"), nd.alias("n_dup_windows"),
        F.round(F.when(nw > 0, nd.cast("double") / nw).otherwise(F.lit(0.0)),
                round_digits).alias("dup_window_fraction"))


def oracle_substring_dup_sql(table: str, id_col: str, text_col: str,
                             window: int = 10, round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table}
), occ AS (
  SELECT id, unnest(list_transform(range(1, len(toks) - {window} + 2),
                    i -> array_to_string(toks[i:i + {window} - 1], ' '))) AS w
  FROM base
), counts AS (
  SELECT w, COUNT(*) AS corpus_c FROM occ GROUP BY w
), per_doc AS (
  SELECT id, COUNT(*) AS n_windows,
         SUM(CASE WHEN corpus_c >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
  FROM occ JOIN counts USING (w) GROUP BY id
)
SELECT b.id,
       CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       ROUND(CASE WHEN COALESCE(n_windows, 0) > 0
             THEN CAST(n_dup_windows AS DOUBLE) / n_windows
             ELSE 0.0 END, {round_digits}) AS dup_window_fraction
FROM base b LEFT JOIN per_doc p USING (id)
"""


def decontaminate(df: DataFrame, id_col: str, text_col: str,
                  benchmark: DataFrame, bench_id_col: str,
                  bench_text_col: str, n: int = 8,
                  min_overlap: int = 1) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥
    ``min_overlap`` distinct word ``n``-grams with an evaluation set
    (the standard GPT-3/PaLM-style contamination check).

    Output: (id, n_overlap_ngrams, contaminated) for every df doc.

    Scale shape: the benchmark's distinct n-gram hash set is tiny
    relative to a 100 TB corpus — the overlap join broadcasts it
    (explicit ``F.broadcast``), so the corpus side never shuffles: scan →
    explode → broadcast-hash-join → per-doc groupBy (one shuffle keyed
    by doc id)."""
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    def gram_hashes(frame, idc, txtc):
        tokd = frame.select(F.col(idc).alias("id"),
                            tokens_expr(txtc).alias("toks"))
        gram = tokd.select(
            "id", F.array_distinct(_ngrams_expr(F.col("toks"), n)).alias("gs"))
        return (explode_no_prefilter(gram, "gs", "g", "id")
                .select("id", F.xxhash64("g").alias("h")))

    bench_set = (gram_hashes(benchmark, bench_id_col, bench_text_col)
                 .select("h").distinct())
    doc_grams = gram_hashes(ensure_parallelism(df), id_col, text_col)
    overlap = (doc_grams.join(F.broadcast(bench_set), "h", "left_semi")
               .groupBy("id").agg(
                   F.count(F.lit(1)).alias("n_overlap_ngrams")))
    out = df.select(F.col(id_col).alias("id")).join(overlap, "id", "left")
    n_over = F.coalesce(F.col("n_overlap_ngrams"), F.lit(0)).cast("long")
    return out.select(
        "id", n_over.alias("n_overlap_ngrams"),
        (n_over >= min_overlap).alias("contaminated"))


def oracle_decontaminate_sql(table: str, id_col: str, text_col: str,
                             bench_filter: str, n: int = 8,
                             min_overlap: int = 1) -> str:
    """Oracle with the benchmark defined as ``table WHERE bench_filter``
    (the query-side fixture uses a deterministic id-hash subset)."""
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    grams = (f"SELECT {id_col} AS id, unnest(list_distinct(list_transform("
             f"range(1, len(toks) - {n} + 2), "
             f"i -> array_to_string(toks[i:i + {n} - 1], ' ')))) AS g "
             f"FROM (SELECT {id_col}, {toks} AS toks FROM {table})")
    return f"""
WITH grams AS ({grams}),
bench AS (
  SELECT DISTINCT g FROM grams
  WHERE id IN (SELECT {id_col} FROM {table} WHERE {bench_filter})
),
overlap AS (
  SELECT id, COUNT(*) AS n_overlap_ngrams
  FROM grams WHERE g IN (SELECT g FROM bench)
  GROUP BY id
)
SELECT t.{id_col} AS id,
       CAST(COALESCE(o.n_overlap_ngrams, 0) AS BIGINT) AS n_overlap_ngrams,
       COALESCE(o.n_overlap_ngrams, 0) >= {min_overlap} AS contaminated
FROM {table} t LEFT JOIN overlap o ON o.id = t.{id_col}
"""


def decontaminate_by_benchmark(df: DataFrame, id_col: str, text_col: str,
                               benchmark: DataFrame, bench_id_col: str,
                               bench_text_col: str, bench_label_col: str,
                               n: int = 8, min_overlap: int = 1
                               ) -> DataFrame:
    """Per-benchmark contamination report for a benchmark SUITE: which
    training documents overlap which eval set (MMLU vs GSM8K vs ...),
    not just whether they overlap any. Output is one row per
    contaminated (doc, benchmark) pair: (id, benchmark,
    n_overlap_ngrams) — bounded by actual contamination, never
    |docs| × |benchmarks|.

    Scale shape matches ``decontaminate``: the suite's (label, gram)
    set is still tiny vs a 100 TB corpus and broadcasts into the
    explode stream; the only corpus-keyed shuffle is the final
    (id, benchmark) groupBy. A gram shared by B benchmarks fans each
    matching doc gram out B ways — bounded by the suite, not the
    corpus."""
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    def gram_hashes(frame, idc, txtc, extra=None):
        cols = [F.col(idc).alias("id"), tokens_expr(txtc).alias("toks")]
        if extra:
            cols.append(F.col(extra).alias("benchmark"))
        tokd = frame.select(*cols)
        keep = ["id"] + (["benchmark"] if extra else [])
        gram = tokd.select(
            *keep, F.array_distinct(_ngrams_expr(F.col("toks"), n)).alias("gs"))
        return (explode_no_prefilter(gram, "gs", "g", *keep)
                .select(*keep, F.xxhash64("g").alias("h")))

    bench_set = (gram_hashes(benchmark, bench_id_col, bench_text_col,
                             extra=bench_label_col)
                 .select("benchmark", "h").distinct())
    doc_grams = gram_hashes(ensure_parallelism(df), id_col, text_col)
    return (doc_grams.join(F.broadcast(bench_set), "h")
            .groupBy("id", "benchmark")
            .agg(F.count(F.lit(1)).alias("n_overlap_ngrams"))
            .where(F.col("n_overlap_ngrams") >= min_overlap))


def oracle_decontaminate_by_benchmark_sql(table: str, id_col: str,
                                          text_col: str, bench_filter: str,
                                          bench_label_col: str, n: int = 8,
                                          min_overlap: int = 1) -> str:
    """Oracle with the benchmark suite defined as ``table WHERE
    bench_filter`` labeled by ``bench_label_col``."""
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    grams = (f"SELECT {id_col} AS id, unnest(list_distinct(list_transform("
             f"range(1, len(toks) - {n} + 2), "
             f"i -> array_to_string(toks[i:i + {n} - 1], ' ')))) AS g "
             f"FROM (SELECT {id_col}, {toks} AS toks FROM {table})")
    return f"""
WITH grams AS ({grams}),
bench AS (
  SELECT DISTINCT t.{bench_label_col} AS benchmark, g.g
  FROM grams g JOIN {table} t ON g.id = t.{id_col}
  WHERE {bench_filter}
)
SELECT g.id, b.benchmark,
       CAST(COUNT(*) AS BIGINT) AS n_overlap_ngrams
FROM grams g JOIN bench b ON g.g = b.g
GROUP BY g.id, b.benchmark
HAVING COUNT(*) >= {min_overlap}
"""


# RE2-safe and Java-regex-safe patterns (no lookarounds), identical
# semantics across Spark and DuckDB. Order matters: phone before generic
# digit runs would, so keep patterns non-overlapping by construction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "[SSN]"),
)


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII redaction: (id, redacted, n_email, n_phone, n_ssn).

    Counts are measured BEFORE replacement; replacement is applied in
    PII_PATTERNS order so e.g. a phone inside an already-redacted email
    span cannot double-fire. Pure regexp expressions — scan-speed."""
    text = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(
        F.col(id_col).alias("id"),
        red.alias("redacted"),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
    )


def oracle_pii_redact_sql(table: str, id_col: str, text_col: str) -> str:
    red = text_col
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    count_cols = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    return (f"SELECT {id_col} AS id, {red} AS redacted, {count_cols} "
            f"FROM {table}")


def split_leakage(df: DataFrame, id_col: str, text_col: str,
                  fractions: dict[str, float] | None = None,
                  seed: str = "dps-split-v1", k: int = 3,
                  num_hashes: int = 12, bands: int = 6,
                  threshold: float = 0.5,
                  max_bucket_size: int | None = _DEF_BUCKET) -> DataFrame:
    """Cross-split near-duplicate leakage audit: (split_a, split_b,
    n_pairs) over the MinHash-LSH near-dup pairs, with splits assigned
    by the same deterministic md5 carve as ``mixture.split_manifest``
    (same seed ⇒ same assignment). A (train, test) row with n_pairs > 0
    means held-out documents have near-duplicates in training data —
    the eval-integrity check every pretraining split needs. Within-
    split pairs are reported too (they are the dedup workload), with
    (split_a, split_b) canonically ordered.

    Scale shape: pair generation is the banded LSH plan of
    ``dedup.minhash_lsh_pairs`` (skew-guardable); split assignment is a
    pure projection of md5(id); the rest is two id-keyed joins of the
    (small) pair set + one tiny groupBy."""
    from dataprofiler_spark.operators.dedup import minhash_lsh_pairs
    from dataprofiler_spark.operators.mixture import \
        _validate_split_fractions
    from dataprofiler_spark.operators.sampling import hash_fraction_expr

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    _validate_split_fractions(fractions)
    h = hash_fraction_expr(F.col(id_col), seed)
    split = F.lit("_rest")
    hi, branches = 0.0, []
    for name, frac in fractions.items():
        hi += frac
        branches.append((name, hi))
    for name, bound in reversed(branches):
        split = F.when(h < F.lit(bound), F.lit(name)).otherwise(split)

    pairs = minhash_lsh_pairs(df, id_col, text_col, k=k,
                              num_hashes=num_hashes, bands=bands,
                              threshold=threshold,
                              max_bucket_size=max_bucket_size)
    s = df.select(F.col(id_col).alias("sid"), split.alias("split"))
    lab = (pairs
           .join(s.select(F.col("sid").alias("id1"),
                          F.col("split").alias("sp1")), "id1")
           .join(s.select(F.col("sid").alias("id2"),
                          F.col("split").alias("sp2")), "id2"))
    return (lab.select(F.least("sp1", "sp2").alias("split_a"),
                       F.greatest("sp1", "sp2").alias("split_b"))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("split_a", "split_b"))


def oracle_split_leakage_sql(table: str, id_col: str, text_col: str,
                             fractions: dict[str, float] | None = None,
                             seed: str = "dps-split-v1", k: int = 3,
                             num_hashes: int = 12, bands: int = 6,
                             threshold: float = 0.5,
                             max_bucket_size: int | None = _DEF_BUCKET
                             ) -> str:
    from dataprofiler_spark.operators.dedup import _lsh_oracle_ctes
    from dataprofiler_spark.operators.mixture import \
        _validate_split_fractions
    from dataprofiler_spark.operators.sampling import _duck_hash_fraction

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    _validate_split_fractions(fractions)
    h = _duck_hash_fraction(id_col, seed)
    cases, hi = [], 0.0
    for name, frac in fractions.items():
        hi += frac
        cases.append(f"WHEN {h} < {hi!r} THEN '{name}'")
    split = "CASE " + " ".join(cases) + " ELSE '_rest' END"
    ctes = _lsh_oracle_ctes(table, id_col, text_col, k, num_hashes, bands,
                            threshold, 6, max_bucket_size=max_bucket_size)
    return f"""
WITH {ctes},
s AS (SELECT {id_col} AS sid, {split} AS split FROM {table})
SELECT LEAST(a.split, b.split) AS split_a,
       GREATEST(a.split, b.split) AS split_b,
       COUNT(*) AS n_pairs
FROM vpairs p
JOIN s a ON p.id1 = a.sid
JOIN s b ON p.id2 = b.sid
GROUP BY 1, 2
ORDER BY split_a, split_b
"""


def paragraph_dup_signals(df: DataFrame, id_col: str, text_col: str,
                          min_chars: int = 20,
                          round_digits: int = 6) -> DataFrame:
    """(id, n_paras, n_dup_paras, dup_para_ratio, dup_char_ratio):
    paragraph-level boilerplate detection (the Gopher/MassiveText
    paragraph-dedup signal): a paragraph (blank-line-delimited block,
    whitespace-normalized, ≥ ``min_chars`` chars — shorter blocks are
    headers/bullets, not boilerplate evidence) counts as duplicated when
    the SAME normalized paragraph appears in any other document (or
    twice in this one, corpus-wide count > 1). dup_char_ratio weighs by
    paragraph length — a doc whose one duplicated paragraph is 90% of
    its text scores high even though n_dup_paras is 1. Docs with no
    qualifying paragraph report zero ratios (never NULL).

    Scale shape: one paragraph explode (bounded by text size), ONE
    md5-keyed aggregation for corpus counts (uniform hash keys), one
    join back on the hash, one groupBy(id) — no self-join, no pair
    blowup; boilerplate hubs are md5-key hot groups for a COUNT, which
    partial aggregation absorbs."""
    from dataprofiler_spark.session import ensure_parallelism

    # explicit whitespace class, NOT \s: Java's \s includes U+000B,
    # RE2's (DuckDB) does not (ADVICE r6) — identical class both engines
    ws = r"[ \t\n\x0B\f\r]"
    paras = (ensure_parallelism(df)
             .select(F.col(id_col).alias("id"),
                     F.split(F.col(text_col),
                             r"\n" + ws + r"*\n").alias("__ps"))
             .select("id", F.explode("__ps").alias("__p")))
    norm = F.trim(F.regexp_replace(F.col("__p"), ws + "+", " "))
    base = (paras.select("id", norm.alias("p"))
            .where(F.length("p") >= min_chars)
            .select("id", F.md5("p").alias("h"),
                    F.length("p").alias("len")))
    counts = base.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (base.join(counts, "h")
               .groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_paras"),
                    F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
                     .alias("n_dup_paras"),
                    F.sum("len").alias("__tot"),
                    F.sum(F.when(F.col("c") > 1, F.col("len"))
                          .otherwise(0)).alias("__dup")))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(per_doc, "id", "left")
            .select("id",
                    F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
                    F.coalesce("n_dup_paras", F.lit(0))
                     .alias("n_dup_paras"),
                    F.round(F.coalesce(
                        F.col("n_dup_paras").cast("double")
                        / F.col("n_paras"), F.lit(0.0)),
                        round_digits).alias("dup_para_ratio"),
                    F.round(F.coalesce(
                        F.col("__dup").cast("double") / F.col("__tot"),
                        F.lit(0.0)), round_digits).alias("dup_char_ratio")))


def oracle_paragraph_dup_sql(table: str, id_col: str, text_col: str,
                             min_chars: int = 20,
                             round_digits: int = 6) -> str:
    return f"""
WITH paras AS (
  SELECT {id_col} AS id,
         TRIM(regexp_replace(p.p, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS p
  FROM {table}, UNNEST(string_split_regex(
       {text_col}, '\\n[ \\t\\n\\x0b\\f\\r]*\\n')) p(p)
),
base AS (
  SELECT id, md5(p) AS h, LENGTH(p) AS len
  FROM paras WHERE LENGTH(p) >= {min_chars}
),
counts AS (SELECT h, COUNT(*) AS c FROM base GROUP BY h),
per_doc AS (
  SELECT id, COUNT(*) AS n_paras,
         SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_dup_paras,
         SUM(len) AS tot,
         SUM(CASE WHEN c > 1 THEN len ELSE 0 END) AS dup
  FROM base JOIN counts USING (h) GROUP BY id
)
SELECT t.{id_col} AS id,
       CAST(COALESCE(p.n_paras, 0) AS BIGINT) AS n_paras,
       CAST(COALESCE(p.n_dup_paras, 0) AS BIGINT) AS n_dup_paras,
       ROUND(COALESCE(CAST(p.n_dup_paras AS DOUBLE) / p.n_paras, 0.0),
             {round_digits}) AS dup_para_ratio,
       ROUND(COALESCE(CAST(p.dup AS DOUBLE) / p.tot, 0.0),
             {round_digits}) AS dup_char_ratio
FROM {table} t LEFT JOIN per_doc p ON p.id = t.{id_col}
"""
