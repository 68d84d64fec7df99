"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All four are single-scan, expression-only operators (regexp + list
arithmetic — no UDFs), so at 100 TB they run at parquet-scan speed and
fuse into one stage with any downstream filter (e.g. "drop docs with
quality < 0.5" pushes the whole thing into the scan stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataprofiler_spark.operators.textstats import STOP_WORDS

# Tiny per-language marker vocabularies for the n-gram/stopword-overlap
# language-ID heuristic. (A production list would be larger; the operator
# shape — score per language, argmax with deterministic tie-break — is
# what matters.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "dans", "pour", "une"),
    "es": ("el", "la", "los", "las", "es", "y", "en", "por"),
}


# GPT-2-style pre-tokenizer approximation, RE2-safe (no lookarounds):
# letter runs | single digits | punctuation runs. Splits "abc123!?" into
# ["abc", "1", "2", "3", "!?"] — the shape BPE vocabularies expect.
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def tokens_expr(text_col: str) -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[^ \t\n\x0B\f\r]+"), 0)


def bpe_tokens_expr(text_col: str) -> Column:
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_REGEX), 0)


def token_count_expr(text_col: str) -> Column:
    """NULL-safe whitespace token count: NULL text counts 0 tokens.
    On Spark 3+/4, raw ``F.size(NULL)`` yields NULL (-1 only under the
    legacy ``spark.sql.legacy.sizeOfNull`` flag), so SUM over it
    silently SKIPS NULL-text docs while COUNT(*) still counts them —
    token totals and doc counts disagree, and comparisons like
    ``tc > context_len`` go NULL. Pinning NULL to 0 keeps per-row
    counts aligned with the DuckDB mirror ``TOKEN_COUNT_SQL``'s
    ``COALESCE(..., 0)``."""
    return F.when(F.col(text_col).isNull(), F.lit(0)
                  ).otherwise(F.size(tokens_expr(text_col)))


TOKEN_COUNT_SQL = "COALESCE(len(regexp_extract_all(LOWER({col}), '[^ \\t\\n\\x0b\\f\\r]+')), 0)"


def bpe_token_count_summary(df: DataFrame, id_col: str, text_col: str
                            ) -> DataFrame:
    """(n_docs, total_tokens, min_tokens, max_tokens, avg_tokens) under
    the BPE-ish tokenizer — the token-budget estimator for LLM training
    pipelines (whitespace counts undercount punctuation-heavy text)."""
    tc = F.size(bpe_tokens_expr(text_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        F.min(tc).alias("min_tokens"),
        F.max(tc).alias("max_tokens"),
        F.round(F.avg(tc), 6).alias("avg_tokens"),
    )


def oracle_bpe_token_count_sql(table: str, id_col: str, text_col: str) -> str:
    tc = f"len(regexp_extract_all({text_col}, '{BPE_ISH_REGEX}'))"
    return f"""
SELECT COUNT(*) AS n_docs, CAST(SUM({tc}) AS BIGINT) AS total_tokens,
       MIN({tc}) AS min_tokens, MAX({tc}) AS max_tokens,
       ROUND(AVG({tc}), 6) AS avg_tokens
FROM {table}
"""


def token_count_summary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(n_docs, total_tokens, min_tokens, max_tokens, avg_tokens) —
    whitespace tokenization; the BPE-ish variant swaps the regex."""
    tc = F.size(tokens_expr(text_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        F.min(tc).alias("min_tokens"),
        F.max(tc).alias("max_tokens"),
        F.round(F.avg(tc), 6).alias("avg_tokens"),
    )


def oracle_token_count_sql(table: str, id_col: str, text_col: str) -> str:
    tc = f"len(regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+'))"
    return f"""
SELECT COUNT(*) AS n_docs, CAST(SUM({tc}) AS BIGINT) AS total_tokens,
       MIN({tc}) AS min_tokens, MAX({tc}) AS max_tokens,
       ROUND(AVG({tc}), 6) AS avg_tokens
FROM {table}
"""


def _quality_raw_exprs(text_col: str) -> dict[str, Column]:
    """Unrounded per-row quality expressions (shared by the per-doc view
    and the grouped rollup; both engines compute bit-identical doubles)."""
    toks = tokens_expr(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOP_WORDS)))
    avg_tok = F.when(n_tokens > 0,
                     (n_chars - (n_tokens - 1)).cast("double") / n_tokens
                     ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars
                         ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens
                        ).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3
    )
    # NULL text must score 0.0, not 0.7: least() IGNORES NULL args on
    # both engines, so the NULL token term silently collapses to
    # 1.0*0.4 + 0.3 — a quality filter would then PREFER degenerate
    # NULL-text rows over empty-string rows (score 0.3). Guarded by an
    # arithmetic mask, not when(score-subtree): a conditional wrapping
    # the whole blend blocks codegen subexpression sharing of the token
    # array with the other per-row features (measured 2× on the rollup);
    # x * 1.0 is an IEEE identity so non-null scores are bit-unchanged.
    score = score * F.when(F.col(text_col).isNull(), F.lit(0.0)) \
                     .otherwise(F.lit(1.0))
    return {"n_chars": n_chars, "n_tokens": n_tokens, "avg_tok": avg_tok,
            "punct_ratio": punct_ratio, "stop_ratio": stop_ratio,
            "score": score}


def quality_features(df: DataFrame, id_col: str, text_col: str,
                     round_digits: int = 6) -> DataFrame:
    """Per-document quality features:
    (id, n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
     quality_score). quality_score is a transparent deterministic blend —
    the filterable scalar a corpus pipeline thresholds on."""
    e = _quality_raw_exprs(text_col)
    n_chars, n_tokens = e["n_chars"], e["n_tokens"]
    avg_tok, punct_ratio = e["avg_tok"], e["punct_ratio"]
    stop_ratio, score = e["stop_ratio"], e["score"]
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok, round_digits).alias("avg_token_len"),
        F.round(punct_ratio, round_digits).alias("punct_ratio"),
        F.round(stop_ratio, round_digits).alias("stopword_ratio"),
        F.round(score, round_digits).alias("quality_score"),
    )


def _quality_raw_sql(text_col: str) -> dict[str, str]:
    """DuckDB mirror of ``_quality_raw_exprs`` — same ops, same order,
    so the doubles agree bit-for-bit (shared by the features oracle and
    mixture.quality_weighted_sample's oracle)."""
    stop = ", ".join("'" + w.replace("'", "''") + "'" for w in STOP_WORDS)
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    nc = f"LENGTH({text_col})"
    nt = f"len({toks})"
    np_ = f"len(regexp_extract_all({text_col}, '[^\\w\\s]'))"
    ns = f"len(list_filter({toks}, t -> t IN ({stop})))"
    avg_tok = f"CASE WHEN {nt} > 0 THEN CAST({nc} - ({nt} - 1) AS DOUBLE) / {nt} ELSE 0.0 END"
    pr = f"CASE WHEN {nc} > 0 THEN CAST({np_} AS DOUBLE) / {nc} ELSE 0.0 END"
    sr = f"CASE WHEN {nt} > 0 THEN CAST({ns} AS DOUBLE) / {nt} ELSE 0.0 END"
    score = (f"LEAST(CAST({nt} AS DOUBLE) / 100.0, 1.0) * 0.4"
             f" + (1.0 - LEAST(({pr}) * 5.0, 1.0)) * 0.3"
             f" + LEAST(({sr}) * 4.0, 1.0) * 0.3")
    # NULL-text guard — mirrors _quality_raw_exprs (see comment there).
    score = f"CASE WHEN {text_col} IS NULL THEN 0.0 ELSE {score} END"
    return {"n_chars": nc, "n_tokens": nt, "avg_tok": avg_tok,
            "punct_ratio": pr, "stop_ratio": sr, "score": score}


def oracle_quality_features_sql(table: str, id_col: str, text_col: str,
                                round_digits: int = 6) -> str:
    e = _quality_raw_sql(text_col)
    nc, nt = e["n_chars"], e["n_tokens"]
    avg_tok, pr = e["avg_tok"], e["punct_ratio"]
    sr, score = e["stop_ratio"], e["score"]
    return f"""
SELECT {id_col} AS id, {nc} AS n_chars, {nt} AS n_tokens,
       ROUND({avg_tok}, {round_digits}) AS avg_token_len,
       ROUND({pr}, {round_digits}) AS punct_ratio,
       ROUND({sr}, {round_digits}) AS stopword_ratio,
       ROUND({score}, {round_digits}) AS quality_score
FROM {table}
"""


def quality_rollup(df: DataFrame, text_col: str, group_col: str,
                   low_quality_threshold: float = 0.5,
                   round_digits: int = 6) -> DataFrame:
    """Per-source corpus health rollup with a grand-total row:
    (group, n_docs, total_tokens, avg_quality, n_low_quality).

    ``rollup(group)`` emits each group plus the all-corpus total in ONE
    aggregation (Spark expands grouping sets before the shuffle — still
    a single pass over the data). The per-doc score is summed as
    DECIMAL(28,12) so the average is independent of partition/summation
    order — bit-identical across engines (plain double sums would drift
    in the last ulp under reordering).

    The grand-total row reports group = '(all)'; a real NULL group value
    reports '(null)' — distinguished via GROUPING(), not COALESCE, so the
    two can never collide."""
    e = _quality_raw_exprs(text_col)
    n = F.count(F.lit(1))
    # Pre-project the per-row score/token count BEFORE the rollup: the
    # rollup's Expand duplicates every row once per grouping set, so any
    # expression left inside the agg (regexp token/punct extraction,
    # stop-word filter) would run grouping-sets× per row and the Expand
    # would carry the full text column. Projected first, the heavy work
    # runs once per row and Expand carries three narrow columns.
    # (grouping() must reference a real grouping column anyway — the
    # cast is pre-projected for the same reason.)
    base = df.select(F.col(group_col).cast("string").alias("grp"),
                     e["n_tokens"].alias("__nt"),
                     e["score"].alias("__score"))
    sdec = F.sum(F.col("__score").cast("decimal(28,12)"))
    agg = base.rollup("grp").agg(
        F.grouping("grp").alias("__is_total"),
        n.alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.round(sdec.cast("double") / n, round_digits).alias("avg_quality"),
        F.sum(F.when(F.col("__score") < low_quality_threshold, 1)
              .otherwise(0)).alias("n_low_quality"),
    )
    return agg.select(
        F.when(F.col("__is_total") == 1, F.lit("(all)"))
         .otherwise(F.coalesce(F.col("grp"), F.lit("(null)")))
         .alias(group_col),
        "n_docs", "total_tokens", "avg_quality", "n_low_quality")


def oracle_quality_rollup_sql(table: str, text_col: str, group_col: str,
                              low_quality_threshold: float = 0.5,
                              round_digits: int = 6) -> str:
    stop = ", ".join("'" + w.replace("'", "''") + "'" for w in STOP_WORDS)
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    nc = f"LENGTH({text_col})"
    nt = f"len({toks})"
    np_ = f"len(regexp_extract_all({text_col}, '[^\\w\\s]'))"
    ns = f"len(list_filter({toks}, t -> t IN ({stop})))"
    pr = f"CASE WHEN {nc} > 0 THEN CAST({np_} AS DOUBLE) / {nc} ELSE 0.0 END"
    sr = f"CASE WHEN {nt} > 0 THEN CAST({ns} AS DOUBLE) / {nt} ELSE 0.0 END"
    score = (f"LEAST(CAST({nt} AS DOUBLE) / 100.0, 1.0) * 0.4"
             f" + (1.0 - LEAST(({pr}) * 5.0, 1.0)) * 0.3"
             f" + LEAST(({sr}) * 4.0, 1.0) * 0.3")
    # NULL-text guard — mirrors _quality_raw_exprs (see comment there).
    score = f"CASE WHEN {text_col} IS NULL THEN 0.0 ELSE {score} END"
    return f"""
SELECT CASE WHEN is_total = 1 THEN '(all)'
            ELSE COALESCE(grp, '(null)') END AS {group_col},
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       ROUND(CAST(sdec AS DOUBLE) / n_docs, {round_digits}) AS avg_quality,
       CAST(n_low_quality AS BIGINT) AS n_low_quality
FROM (
  SELECT CAST({group_col} AS VARCHAR) AS grp,
         GROUPING(grp) AS is_total,
         COUNT(*) AS n_docs,
         SUM({nt}) AS total_tokens,
         SUM(CAST(({score}) AS DECIMAL(28,12))) AS sdec,
         SUM(CASE WHEN ({score}) < {low_quality_threshold} THEN 1 ELSE 0 END)
           AS n_low_quality
  FROM {table}
  GROUP BY ROLLUP (grp)
  HAVING COUNT(*) > 0
)
"""


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, predicted_lang): argmax of marker-token hit counts with
    deterministic tie-break (count desc, lang asc); 'und' when no marker
    hits at all."""
    toks = tokens_expr(text_col)

    # NB: higher-order-function lambdas must take exactly the lambda's
    # variables — a `m=markers` default would be parsed as a second lambda
    # argument by Spark. Bind via closure instead.
    def _in_markers(markers):
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, _in_markers(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    pred = None
    for lang in sorted(LANG_MARKERS):  # asc lang order ⇒ first max wins ties
        cond = scores[lang] > 0
        for other in sorted(LANG_MARKERS):
            if other < lang:
                cond = cond & (scores[lang] > scores[other])
            elif other > lang:
                cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return df.select(F.col(id_col).alias("id"), pred.alias("predicted_lang"))


def oracle_language_id_sql(table: str, id_col: str, text_col: str) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    score_exprs = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    cases = []
    for lang in sorted(LANG_MARKERS):
        conds = [f"{score_exprs[lang]} > 0"]
        for other in sorted(LANG_MARKERS):
            if other < lang:
                conds.append(f"{score_exprs[lang]} > {score_exprs[other]}")
            elif other > lang:
                conds.append(f"{score_exprs[lang]} >= {score_exprs[other]}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"SELECT {id_col} AS id, {case_sql} AS predicted_lang FROM {table}"


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint): md5 of whitespace-normalized lowercase text —
    the exact-dup fingerprint; MinHash/SimHash (operators/dedup.py) are
    the near-dup fingerprints."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col).alias("id"), F.md5(norm).alias("fingerprint"))


def oracle_fingerprints_sql(table: str, id_col: str, text_col: str) -> str:
    return (f"SELECT {id_col} AS id, "
            f"md5(regexp_replace(TRIM(LOWER({text_col})), '\\s+', ' ', 'g'))"
            f" AS fingerprint FROM {table}")


def unigram_logprob_scores(df: DataFrame, id_col: str, text_col: str,
                           round_digits: int = 6) -> DataFrame:
    """(id, n_tokens, avg_logprob): per-doc mean natural-log probability
    of its tokens under the corpus unigram distribution — the classic
    LM-based quality signal (gibberish / boilerplate scores low, typical
    prose high). Rare-token smoothing is unnecessary: every scored token
    exists in the corpus by construction.

    Shape: one corpus scan -> (doc, term) tf aggregation; per-term
    corpus counts ride a term-partitioned window over the SAME tf table
    (no second scan — the tfidf lesson). The identity
    ``mean ln(ct/N) = mean ln(ct) − ln(N)`` defers the corpus total to
    AFTER the per-doc reduction, so N needs only the corpus token
    count — computed as a SEPARATE one-column map-side aggregate
    (sum of per-row token counts) rather than a second pass through the
    tf/window lineage, so nothing has to be persisted: the whole
    operator is stateless (no cache to leak across calls — the
    embedding_neardup lesson) at the cost of one extra column-pruned
    scan, the cheaper trade at scale. Per-doc sums go through scaled-
    decimal accumulation so the mean is independent of summation order.
    """
    from pyspark.sql.window import Window

    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"),
                  tokens_expr(text_col).alias("toks")))
    terms = explode_no_prefilter(base, "toks", "term", "id")
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    with_ct = tf.withColumn(
        "ct", F.sum("tf").over(Window.partitionBy("term")))
    per_doc = (with_ct
               .withColumn("lp", F.round(
                   F.col("tf") * F.log("ct"), 9))
               .groupBy("id")
               .agg(F.sum("tf").alias("n_tokens"),
                    F.sum(F.col("lp").cast("decimal(28,12)"))
                     .alias("__s")))
    # corpus token total == sum(tf): every exploded term is counted once.
    # Guarded size() so NULL texts contribute 0 under both legacy
    # (size(NULL) = -1) and ANSI (NULL) semantics.
    totals = base.agg(
        F.sum(F.when(F.col("toks").isNull(), F.lit(0))
              .otherwise(F.size("toks"))).alias("n_total"))
    return (per_doc.crossJoin(F.broadcast(totals))
            .select("id", "n_tokens",
                    F.round(F.col("__s").cast("double")
                            / F.col("n_tokens")
                            - F.log("n_total"),
                            round_digits).alias("avg_logprob")))


def bigram_logprob_scores(df: DataFrame, id_col: str, text_col: str,
                          round_digits: int = 6) -> DataFrame:
    """(id, n_bigrams, avg_logprob): per-doc mean natural-log CONDITIONAL
    probability ln P(w_i | w_{i-1}) under the corpus bigram model — the
    CCNet-style LM quality filter one order up from
    ``unigram_logprob_scores`` (word-salad text keeps plausible unigrams
    but implausible transitions, so it separates where the unigram score
    can't). P(w2|w1) = c(w1,w2) / c(w1,·); no smoothing is needed
    because every scored bigram exists in the corpus by construction.

    Shape: bigrams assemble JVM-side as ``zip_with`` over two token-array
    slices (no positional self-join), then one (doc, w1, w2) tf
    aggregation; BOTH corpus counts ride windows over that tf table —
    the w1-partitioned window runs FIRST so the (w1,w2) window reuses its
    exchange (hash(w1) clusters (w1,w2) too): one shuffle for both.
    Hot first-words skew the w1 partitioning the same way hot terms skew
    the unigram window — the tf table is already collapsed per doc, which
    bounds the hot partition by the DISTINCT follower count, not the
    token stream. Docs with fewer than two tokens (incl. NULL text) have
    no bigrams and don't appear — same contract as the unigram scorer.
    """
    from pyspark.sql.window import Window

    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"),
                  tokens_expr(text_col).alias("toks"))
        .where(F.size("toks") >= 2)
        .select("id", F.expr(
            "zip_with(slice(toks, 1, size(toks) - 1),"
            "         slice(toks, 2, size(toks) - 1),"
            "         (a, b) -> struct(a AS w1, b AS w2))").alias("bi")))
    pairs = (explode_no_prefilter(base, "bi", "z", "id")
             .select("id", F.col("z.w1").alias("w1"),
                     F.col("z.w2").alias("w2")))
    tf = pairs.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    with_ct = (tf
               .withColumn("cl", F.sum("tf").over(Window.partitionBy("w1")))
               .withColumn("cb", F.sum("tf").over(
                   Window.partitionBy("w1", "w2"))))
    lp = F.round(F.col("tf") * (F.log("cb") - F.log("cl")), 9)
    return (with_ct
            .groupBy("id")
            .agg(F.sum("tf").alias("n_bigrams"),
                 F.round(F.sum(lp.cast("decimal(28,12)")).cast("double")
                         / F.sum("tf"), round_digits).alias("avg_logprob")))


def collocations_pmi(df: DataFrame, text_col: str, k: int = 20,
                     min_count: int = 5, round_digits: int = 6
                     ) -> DataFrame:
    """(w1, w2, pair_count, c1, c2, pmi, rank): top-k collocations by
    pointwise mutual information PMI = ln(P(w1,w2)/(P(w1)P(w2))) —
    the standard phrase/boilerplate miner (Church & Hanks 1990).
    P(w1,w2) uses the bigram total, P(w) the token total.

    Scale shape: the ``min_count`` filter runs on the aggregated bigram
    table BEFORE the unigram joins, so only surviving candidates (a set
    that SHRINKS as the corpus grows, for fixed ``min_count`` share) ever
    join against the vocabulary counts; the two totals are broadcast
    1-row aggregates. PMI sums ln terms in a fixed order (engine-exact);
    ties (pmi desc, w1 asc, w2 asc)."""
    from dataprofiler_spark.operators.topk import ranked_topk
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    base = ensure_parallelism(
        df.select(tokens_expr(text_col).alias("toks")))
    terms = explode_no_prefilter(base, "toks", "w")
    uni = terms.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_total = uni.agg(F.sum("c").alias("n_total"))
    bi_base = (base.where(F.size("toks") >= 2)
               .select(F.expr(
                   "zip_with(slice(toks, 1, size(toks) - 1),"
                   "         slice(toks, 2, size(toks) - 1),"
                   "         (a, b) -> struct(a AS w1, b AS w2))")
                   .alias("bi")))
    pairs = (explode_no_prefilter(bi_base, "bi", "z")
             .select(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2")))
    cb = (pairs.groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).alias("pair_count"))
          .where(F.col("pair_count") >= min_count))
    nb_total = pairs.groupBy().agg(F.count(F.lit(1)).alias("nb_total"))
    joined = (cb
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("c").alias("c1")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("c").alias("c2")), "w2")
              .crossJoin(F.broadcast(n_total))
              .crossJoin(F.broadcast(nb_total)))
    pmi = F.round(F.log("pair_count") - F.log("nb_total")
                  - F.log("c1") - F.log("c2")
                  + F.lit(2.0) * F.log("n_total"), round_digits)
    scored = joined.select("w1", "w2", "pair_count", "c1", "c2",
                           pmi.alias("pmi"))
    return (ranked_topk(scored,
                        [F.desc("pmi"), F.asc("w1"), F.asc("w2")], k)
            .select("w1", "w2", "pair_count", "c1", "c2", "pmi", "rank"))


def oracle_collocations_pmi_sql(table: str, text_col: str, k: int = 20,
                                min_count: int = 5,
                                round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH base AS (SELECT {toks} AS tk FROM {table}),
terms AS (SELECT UNNEST(tk) AS w FROM base),
uni AS (SELECT w, COUNT(*) AS c FROM terms GROUP BY w),
n_total AS (SELECT SUM(c) AS n_total FROM uni),
bi AS (
  SELECT z[1] AS w1, z[2] AS w2
  FROM (SELECT UNNEST(list_zip(tk[1:LEN(tk)-1], tk[2:LEN(tk)])) AS z
        FROM base)
),
nb_total AS (SELECT COUNT(*) AS nb_total FROM bi),
cb AS (
  SELECT w1, w2, COUNT(*) AS pair_count
  FROM bi GROUP BY w1, w2 HAVING COUNT(*) >= {min_count}
),
scored AS (
  SELECT cb.w1, cb.w2, cb.pair_count, u1.c AS c1, u2.c AS c2,
         ROUND(LN(CAST(pair_count AS DOUBLE))
               - LN(CAST(nb_total AS DOUBLE))
               - LN(CAST(u1.c AS DOUBLE)) - LN(CAST(u2.c AS DOUBLE))
               + 2.0 * LN(CAST(n_total AS DOUBLE)),
               {round_digits}) AS pmi
  FROM cb JOIN uni u1 ON cb.w1 = u1.w
          JOIN uni u2 ON cb.w2 = u2.w
  CROSS JOIN n_total CROSS JOIN nb_total
)
SELECT w1, w2, pair_count, c1, c2, pmi,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC)
            AS BIGINT) AS rank
FROM scored
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {k}
"""


def oracle_bigram_logprob_sql(table: str, id_col: str, text_col: str,
                              round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH bi AS (
  SELECT id, z[1] AS w1, z[2] AS w2
  FROM (SELECT {id_col} AS id,
               UNNEST(list_zip(t.tk[1:LEN(t.tk)-1], t.tk[2:LEN(t.tk)])) AS z
        FROM (SELECT {id_col}, {toks} AS tk FROM {table}) t)
),
tf AS (
  SELECT id, w1, w2, COUNT(*) AS tf FROM bi GROUP BY id, w1, w2
),
cl AS (SELECT w1, SUM(tf) AS cl FROM tf GROUP BY w1),
cb AS (SELECT w1, w2, SUM(tf) AS cb FROM tf GROUP BY w1, w2)
SELECT tf.id AS id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(CAST(ROUND(tf.tf * (LN(CAST(cb.cb AS DOUBLE))
                                          - LN(CAST(cl.cl AS DOUBLE))), 9)
                           AS DECIMAL(28,12))) AS DOUBLE)
             / SUM(tf.tf),
             {round_digits}) AS avg_logprob
FROM tf JOIN cl USING (w1) JOIN cb USING (w1, w2)
GROUP BY tf.id
"""


def oracle_unigram_logprob_sql(table: str, id_col: str, text_col: str,
                               round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH terms AS (
  SELECT {id_col} AS id, UNNEST({toks}) AS term FROM {table}
),
tf AS (
  SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY id, term
),
ct AS (
  SELECT term, SUM(tf) AS ct FROM tf GROUP BY term
),
totals AS (SELECT SUM(ct) AS n_total FROM ct)
SELECT tf.id AS id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(CAST(ROUND(tf.tf * LN(CAST(ct.ct AS DOUBLE)), 9)
                           AS DECIMAL(28,12))) AS DOUBLE)
             / SUM(tf.tf)
             - LN(CAST(ANY_VALUE(totals.n_total) AS DOUBLE)),
             {round_digits}) AS avg_logprob
FROM tf JOIN ct USING (term) CROSS JOIN totals
GROUP BY tf.id
"""


def hashed_doc_vectors(df: DataFrame, id_col: str, text_col: str,
                       dim: int = 32, seed: str = "dps-hashvec-v1"
                       ) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors: each token
    hashes to a dimension and a ±1 sign (Weinberger et al. 2009), so a
    document becomes a ``dim``-length integer vector with NO vocabulary,
    NO model and NO driver state — the deterministic text→vector bridge
    that lets the embedding stack (cosine top-k, LSH banding, k-means,
    IVF in operators/similarity.py / clustering.py) run on corpora that
    ship no embedding column.

    md5 drives both the dimension and the sign, so any engine (or
    language) reproduces the exact vectors; values are INTEGER signed
    term counts — cross-engine comparison is exact, and downstream
    cosine folds cast to double only at use.

    Output is the EXPLODED dense form (id, dpos, value) — one row per
    (doc, dimension), zero rows nowhere (absent dims emit 0): the
    merge/compare-friendly shape (arrays don't hash-compare across
    engines). Plan: explode tokens → one (id, dpos) groupBy → dense
    fill via a dim-length sequence explode (bounded ×dim fan-out of the
    doc-count-sized frame, not the token stream).
    """
    from dataprofiler_spark.session import explode_no_prefilter

    toks = df.select(F.col(id_col).alias("id"),
                     tokens_expr(text_col).alias("toks"))
    tok = explode_no_prefilter(toks, "toks", "t", "id")
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col("t")))
    dpos = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
            % dim).cast("int")
    sign = F.when(F.conv(F.substring(h, 5, 1), 16, 10).cast("long") % 2 == 0,
                  F.lit(1)).otherwise(F.lit(-1))
    sparse = (tok.select("id", dpos.alias("dpos"), sign.alias("s"))
              .groupBy("id", "dpos")
              .agg(F.sum("s").cast("long").alias("value")))
    dense_idx = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("dpos"))
    return (dense_idx.join(sparse, ["id", "dpos"], "left")
            .select(F.col("id").alias(id_col), "dpos",
                    F.coalesce(F.col("value"), F.lit(0)).alias("value")))


def oracle_hashed_doc_vectors_sql(table: str, id_col: str, text_col: str,
                                  dim: int = 32,
                                  seed: str = "dps-hashvec-v1") -> str:
    h = f"md5('{seed}' || '|' || t)"
    return f"""
WITH tok AS (
  SELECT {id_col} AS id, unnest(regexp_extract_all(LOWER({text_col}),
                                                   '[^ \\t\\n\\x0b\\f\\r]+')) AS t
  FROM {table}
),
sparse AS (
  SELECT id,
         CAST(('0x' || substr({h}, 1, 4))::BIGINT % {dim} AS INT) AS dpos,
         CAST(SUM(CASE WHEN ('0x' || substr({h}, 5, 1))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS value
  FROM tok GROUP BY 1, 2
),
dense AS (
  SELECT t.{id_col} AS id, g.d AS dpos
  FROM {table} t CROSS JOIN generate_series(0, {dim - 1}) AS g(d)
)
SELECT dense.id AS {id_col}, dense.dpos,
       COALESCE(sparse.value, 0) AS value
FROM dense LEFT JOIN sparse
  ON sparse.id = dense.id AND sparse.dpos = dense.dpos
"""


def hashed_cosine_topk(df: DataFrame, id_col: str, text_col: str,
                       query_id: int, k: int = 10, dim: int = 32,
                       seed: str = "dps-hashvec-v1",
                       round_digits: int = 6) -> DataFrame:
    """Similarity search over a TEXT corpus with no embedding column:
    cosine top-k between hashing-trick document vectors, computed
    sparsely — the dot product is a join on the hashed dimension, never
    an assembled array, so the plan is explode → two bounded groupBys →
    one broadcast of the query's ``dim`` rows. Integer dots/norms make
    the ranking engine-exact; ties break (cosine desc, id asc), self
    excluded.

    Output: (rank, doc_id-named id column, cosine)."""
    from dataprofiler_spark.operators.topk import ranked_topk

    vecs = hashed_doc_vectors(df, id_col, text_col, dim=dim, seed=seed)
    vecs = vecs.where(F.col("value") != 0).select(
        F.col(id_col).alias("id"), "dpos", "value")
    norms = vecs.groupBy("id").agg(
        F.sum(F.col("value") * F.col("value")).alias("nrm2"))
    q = vecs.where(F.col("id") == query_id).select(
        "dpos", F.col("value").alias("qv"))
    qn = norms.where(F.col("id") == query_id).select(
        F.col("nrm2").alias("qnrm2"))
    dots = (vecs.join(F.broadcast(q), "dpos")
            .where(F.col("id") != query_id)
            .groupBy("id")
            .agg(F.sum(F.col("value") * F.col("qv")).alias("dot")))
    scored = (dots.join(norms, "id").crossJoin(F.broadcast(qn))
              .where((F.col("nrm2") > 0) & (F.col("qnrm2") > 0))
              .select(
                  "id",
                  F.round(F.col("dot").cast("double")
                          / (F.sqrt(F.col("nrm2").cast("double"))
                             * F.sqrt(F.col("qnrm2").cast("double"))),
                          round_digits).alias("cosine")))
    return ranked_topk(scored, [F.desc("cosine"), F.asc("id")], k) \
        .select("rank", F.col("id").alias(id_col), "cosine")


def oracle_hashed_cosine_topk_sql(table: str, id_col: str, text_col: str,
                                  query_id: int, k: int = 10, dim: int = 32,
                                  seed: str = "dps-hashvec-v1",
                                  round_digits: int = 6) -> str:
    h = f"md5('{seed}' || '|' || t)"
    return f"""
WITH tok AS (
  SELECT {id_col} AS id, unnest(regexp_extract_all(LOWER({text_col}),
                                                   '[^ \\t\\n\\x0b\\f\\r]+')) AS t
  FROM {table}
),
vecs AS (
  SELECT id,
         CAST(('0x' || substr({h}, 1, 4))::BIGINT % {dim} AS INT) AS dpos,
         CAST(SUM(CASE WHEN ('0x' || substr({h}, 5, 1))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS value
  FROM tok GROUP BY 1, 2
  HAVING SUM(CASE WHEN ('0x' || substr({h}, 5, 1))::BIGINT % 2 = 0
             THEN 1 ELSE -1 END) <> 0
),
norms AS (SELECT id, SUM(value * value) AS nrm2 FROM vecs GROUP BY id),
q AS (SELECT dpos, value AS qv FROM vecs WHERE id = {query_id}),
qn AS (SELECT nrm2 AS qnrm2 FROM norms WHERE id = {query_id}),
dots AS (
  SELECT v.id, SUM(v.value * q.qv) AS dot
  FROM vecs v JOIN q USING (dpos)
  WHERE v.id <> {query_id}
  GROUP BY v.id
),
scored AS (
  SELECT d.id,
         ROUND(CAST(d.dot AS DOUBLE)
               / (SQRT(CAST(n.nrm2 AS DOUBLE))
                  * SQRT(CAST(qn.qnrm2 AS DOUBLE))), {round_digits}) AS cosine
  FROM dots d JOIN norms n USING (id) CROSS JOIN qn
  WHERE n.nrm2 > 0 AND qn.qnrm2 > 0
)
SELECT CAST(rank AS INT) AS rank, id AS {id_col}, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, id ASC) AS rank
  FROM scored)
WHERE rank <= {k}
"""


def zipf_vocab_stats(df: DataFrame, text_col: str, max_rank: int = 1000,
                     round_digits: int = 6) -> DataFrame:
    """One-row corpus vocabulary summary: (n_tokens, vocab_size,
    type_token_ratio, hapax_count, hapax_ratio, zipf_slope, top_freq).

    zipf_slope is the OLS slope of ln(freq) on ln(rank) over the top
    ``max_rank`` terms — natural text sits near −1 (Zipf's law); a
    slope far shallower flags templated/machine text, far steeper flags
    a degenerate vocabulary. hapax_ratio (share of vocabulary seen
    exactly once) is the companion Heaps-law-style richness signal.

    Scale shape: ONE token explode + groupBy(term) collapses the corpus
    to vocabulary size; the regression runs over max_rank rows selected
    by distributed TakeOrderedAndProject (count desc, term asc — fully
    deterministic), never a global sort of the vocabulary. Engine-exact:
    per-term ln values are rounded to 9 digits, then summed as
    DECIMAL(38,18) (order-independent); the slope divides the identical
    decimal sums on both engines."""
    from dataprofiler_spark.operators.topk import ranked_topk
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    base = ensure_parallelism(
        df.select(tokens_expr(text_col).alias("toks")))
    terms = (explode_no_prefilter(base, "toks", "term")
             .groupBy("term").agg(F.count(F.lit(1)).alias("ct")))
    totals = terms.agg(
        F.sum("ct").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("ct") == 1, 1).otherwise(0)).alias("hapax_count"),
        F.max("ct").alias("top_freq"))
    top = ranked_topk(terms, [F.desc("ct"), F.asc("term")], max_rank)
    # fixed-point: ln values scaled to integers (1e9) so every sum and
    # the num/den products are exact decimals on both engines; the 1e18
    # scale cancels in the division.
    x = (F.round(F.log(F.col("rank").cast("double")) * 1e9, 0)
         .cast("decimal(19,0)"))
    y = (F.round(F.log(F.col("ct").cast("double")) * 1e9, 0)
         .cast("decimal(19,0)"))
    d = "decimal(38,0)"
    reg = top.agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum(x.cast(d)).alias("sx"),
        F.sum(y.cast(d)).alias("sy"),
        F.sum((x * y).cast(d)).alias("sxy"),
        F.sum((x * x).cast(d)).alias("sxx"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
           ).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
           ).cast("double")
    slope = F.when(den > 0, F.round(num / den, round_digits))
    return totals.crossJoin(F.broadcast(reg)).select(
        "n_tokens", "vocab_size",
        F.round(F.col("vocab_size").cast("double") / F.col("n_tokens"),
                round_digits).alias("type_token_ratio"),
        "hapax_count",
        F.round(F.col("hapax_count").cast("double") / F.col("vocab_size"),
                round_digits).alias("hapax_ratio"),
        slope.alias("zipf_slope"),
        "top_freq")


def oracle_zipf_vocab_stats_sql(table: str, text_col: str,
                                max_rank: int = 1000,
                                round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH terms AS (
  SELECT t.term, COUNT(*) AS ct
  FROM {table}, UNNEST({toks}) t(term)
  GROUP BY t.term
),
totals AS (
  SELECT SUM(ct) AS n_tokens, COUNT(*) AS vocab_size,
         SUM(CASE WHEN ct = 1 THEN 1 ELSE 0 END) AS hapax_count,
         MAX(ct) AS top_freq
  FROM terms
),
top AS (
  SELECT ct, ROW_NUMBER() OVER (ORDER BY ct DESC, term ASC) AS rank
  FROM terms ORDER BY ct DESC, term ASC LIMIT {max_rank}
),
xy AS (
  SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1e9, 0) AS HUGEINT) AS x,
         CAST(ROUND(ln(CAST(ct AS DOUBLE)) * 1e9, 0) AS HUGEINT) AS y
  FROM top
),
reg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM xy
)
SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab_size AS BIGINT) AS vocab_size,
       ROUND(CAST(vocab_size AS DOUBLE) / n_tokens, {round_digits})
         AS type_token_ratio,
       CAST(hapax_count AS BIGINT) AS hapax_count,
       ROUND(CAST(hapax_count AS DOUBLE) / vocab_size, {round_digits})
         AS hapax_ratio,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
         ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE), {round_digits}) END
         AS zipf_slope,
       CAST(top_freq AS BIGINT) AS top_freq
FROM totals CROSS JOIN reg
"""


def markup_signals(df: DataFrame, id_col: str, text_col: str,
                   round_digits: int = 6) -> DataFrame:
    """(id, n_chars, tag_count, entity_count, control_char_count,
    replacement_count, markup_density, is_markupy): HTML-extraction /
    encoding-damage signals per document — the C4/RefinedWeb cleaning
    inputs (a doc with leftover tags means the extractor failed; U+FFFD
    replacement chars mean the bytes were decoded with the wrong
    charset; raw C0 control chars mean binary contamination).

    * tag_count: ``<tag ...>`` / ``</tag>`` shapes
    * entity_count: ``&amp;``-style named/numeric entities
    * control_char_count: C0 controls except tab/newline/CR
    * replacement_count: U+FFFD
    * markup_density: (tags + entities) per 100 chars
    * is_markupy: density > 1 per 100 chars — the drop-candidate flag

    Pure per-row regexps — fuses into the scan, no shuffle; NULL text
    yields zero counts and no flag (same contract as quality_features).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    tags = F.size(F.regexp_extract_all(
        t, F.lit(r"<[a-zA-Z/][^<>]*>"), 0))
    ents = F.size(F.regexp_extract_all(
        t, F.lit(r"&(?:[a-zA-Z]{2,10}|#[0-9]{1,7}|#x[0-9a-fA-F]{1,6});"),
        0))
    ctrl = F.size(F.regexp_extract_all(
        t, F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"), 0))
    repl = F.size(F.regexp_extract_all(t, F.lit("�"), 0))
    dens = F.when(n_chars > 0,
                  F.round((tags + ents) * 100.0 / n_chars, round_digits)
                  ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        tags.alias("tag_count"),
        ents.alias("entity_count"),
        ctrl.alias("control_char_count"),
        repl.alias("replacement_count"),
        dens.alias("markup_density"),
        (dens > 1.0).alias("is_markupy"))


def oracle_markup_signals_sql(table: str, id_col: str, text_col: str,
                              round_digits: int = 6) -> str:
    t = f"COALESCE({text_col}, '')"
    nc = f"LENGTH({t})"
    tags = f"len(regexp_extract_all({t}, '<[a-zA-Z/][^<>]*>'))"
    ents = (f"len(regexp_extract_all({t}, "
            "'&([a-zA-Z]{2,10}|#[0-9]{1,7}|#x[0-9a-fA-F]{1,6});'))")
    ctrl = (f"len(regexp_extract_all({t}, "
            "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]'))")
    repl = f"len(regexp_extract_all({t}, '\\x{{FFFD}}'))"
    dens = (f"CASE WHEN {nc} > 0 THEN "
            f"ROUND(({tags} + {ents}) * 100.0 / {nc}, {round_digits}) "
            "ELSE 0.0 END")
    return f"""
SELECT {id_col} AS id, CAST({nc} AS INT) AS n_chars,
       CAST({tags} AS INT) AS tag_count,
       CAST({ents} AS INT) AS entity_count,
       CAST({ctrl} AS INT) AS control_char_count,
       CAST({repl} AS INT) AS replacement_count,
       {dens} AS markup_density,
       ({dens}) > 1.0 AS is_markupy
FROM {table}
"""


def lm_divergence(df_a: DataFrame, df_b: DataFrame, text_col: str,
                  round_digits: int = 6) -> DataFrame:
    """One-row (vocab, n_tokens_a, n_tokens_b, kl_ab, kl_ba, js):
    unigram-distribution divergence between two corpora — the
    mixture-tuning / domain-shift number ("how different is this source
    from my training mix?") that per-doc quality scores can't express.
    0.5-additive smoothing over the UNION vocabulary keeps both KLs
    finite; JS is the symmetric bounded [0, ln 2] variant to report on
    dashboards. Identical corpora score exactly 0 on every column.

    Plan: one tf aggregation per corpus (map-side combined, keyed on
    the term — uniform), FULL OUTER join on term (vocabulary-sized),
    round-then-decimal term folds (12 dp — the mutual_info discipline:
    vocabulary-sized sums are partition-order-dependent as plain double
    sums). Token totals ride the same tf frames."""
    from dataprofiler_spark.functions.rounding import duckdb_round
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    def tf(df):
        base = ensure_parallelism(
            df.select(tokens_expr(text_col).alias("toks")))
        return (explode_no_prefilter(base, "toks", "term")
                .groupBy("term").agg(F.count(F.lit(1)).alias("c")))

    ca = tf(df_a).select("term", F.col("c").alias("ca"))
    cb = tf(df_b).select("term", F.col("c").alias("cb"))
    v = (ca.join(cb, "term", "full_outer")
         .select("term", F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    tot = v.agg(F.count(F.lit(1)).alias("k"),
                F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = v.crossJoin(F.broadcast(tot))
    pa = ((F.col("ca").cast("double") + 0.5)
          / (F.col("na").cast("double") + 0.5 * F.col("k")))
    pb = ((F.col("cb").cast("double") + 0.5)
          / (F.col("nb").cast("double") + 0.5 * F.col("k")))
    m = (pa + pb) / 2
    d12 = "decimal(38,12)"

    def fold(term):
        return F.sum(F.round(term, 12).cast(d12)).cast("double")

    agg = j.agg(
        F.max("k").alias("vocab"),
        F.max("na").alias("n_tokens_a"),
        F.max("nb").alias("n_tokens_b"),
        fold(pa * F.log(pa / pb)).alias("__kl_ab"),
        fold(pb * F.log(pb / pa)).alias("__kl_ba"),
        fold(0.5 * pa * F.log(pa / m)
             + 0.5 * pb * F.log(pb / m)).alias("__js"))
    return agg.select(
        F.col("vocab").cast("long").alias("vocab"),
        F.col("n_tokens_a").cast("long").alias("n_tokens_a"),
        F.col("n_tokens_b").cast("long").alias("n_tokens_b"),
        duckdb_round(F.col("__kl_ab"), round_digits).alias("kl_ab"),
        duckdb_round(F.col("__kl_ba"), round_digits).alias("kl_ba"),
        duckdb_round(F.col("__js"), round_digits).alias("js"))


def oracle_lm_divergence_sql(table_a: str, table_b: str, text_col: str,
                             round_digits: int = 6) -> str:
    toks = "regexp_extract_all(LOWER({c}), '[^ \\t\\n\\x0b\\f\\r]+')"
    pa = ("((CAST(ca AS DOUBLE) + 0.5)"
          " / (CAST(na AS DOUBLE) + 0.5 * k))")
    pb = ("((CAST(cb AS DOUBLE) + 0.5)"
          " / (CAST(nb AS DOUBLE) + 0.5 * k))")
    m = f"(({pa} + {pb}) / 2)"

    def fold(term):
        return (f"CAST(SUM(CAST(ROUND({term}, 12) AS DECIMAL(38,12)))"
                f" AS DOUBLE)")

    return f"""
WITH ta AS (
  SELECT UNNEST({toks.format(c=text_col)}) AS term FROM {table_a}
),
tb AS (
  SELECT UNNEST({toks.format(c=text_col)}) AS term FROM {table_b}
),
ca AS (SELECT term, COUNT(*) AS ca FROM ta GROUP BY 1),
cb AS (SELECT term, COUNT(*) AS cb FROM tb GROUP BY 1),
v AS (
  SELECT COALESCE(ca.term, cb.term) AS term,
         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
),
tot AS (SELECT COUNT(*) AS k, SUM(ca) AS na, SUM(cb) AS nb FROM v)
SELECT CAST(MAX(k) AS BIGINT) AS vocab,
       CAST(MAX(na) AS BIGINT) AS n_tokens_a,
       CAST(MAX(nb) AS BIGINT) AS n_tokens_b,
       ROUND({fold(f"{pa} * LN({pa} / {pb})")}, {round_digits}) AS kl_ab,
       ROUND({fold(f"{pb} * LN({pb} / {pa})")}, {round_digits}) AS kl_ba,
       ROUND({fold(f"0.5 * {pa} * LN({pa} / {m})"
                   f" + 0.5 * {pb} * LN({pb} / {m})")}, {round_digits})
         AS js
FROM v, tot
"""


def top_terms_by_group(df: DataFrame, group_col: str, text_col: str,
                       k: int = 10,
                       round_digits: int = 6) -> DataFrame:
    """(group, rank, term, tf, share): each group's top-k tokens by
    frequency with the within-group share — the quick vocabulary
    fingerprint of a source/language/domain slice (tfidf_top_terms is
    per-DOCUMENT; this is the per-SEGMENT rollup you eyeball when
    deciding whether a new source is news, code, or spam). NULL group
    values are their own '(null)' segment; ties rank by (tf desc,
    term asc) — deterministic on both engines.

    Plan: ONE (group, term) tf aggregation (map-side combined), a
    per-group totals rollup joined back broadcast-sized, then top-k via
    a window PARTITIONED BY group — bounded by per-group vocabulary,
    never a global sort."""
    from pyspark.sql.window import Window

    from dataprofiler_spark.functions.rounding import duckdb_round
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    g = F.coalesce(F.col(group_col).cast("string"), F.lit("(null)"))
    base = ensure_parallelism(
        df.select(g.alias("g"), tokens_expr(text_col).alias("toks")))
    tf = (explode_no_prefilter(base, "toks", "term", "g")
          .groupBy("g", "term").agg(F.count(F.lit(1)).alias("tf")))
    tot = tf.groupBy("g").agg(F.sum("tf").alias("__tot"))
    w = Window.partitionBy("g").orderBy(F.desc("tf"), F.asc("term"))
    return (tf.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .join(F.broadcast(tot), "g")
            .select(F.col("g").alias("group"), "rank", "term", "tf",
                    duckdb_round(F.col("tf").cast("double")
                                 / F.col("__tot"),
                                 round_digits).alias("share")))


def oracle_top_terms_by_group_sql(table: str, group_col: str,
                                  text_col: str, k: int = 10,
                                  round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH terms AS (
  SELECT COALESCE(CAST({group_col} AS VARCHAR), '(null)') AS g,
         UNNEST({toks}) AS term
  FROM {table}
),
tf AS (SELECT g, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
tot AS (SELECT g, SUM(tf) AS tot FROM tf GROUP BY 1),
ranked AS (
  SELECT g, term, tf,
         ROW_NUMBER() OVER (PARTITION BY g
                            ORDER BY tf DESC, term ASC) AS rank
  FROM tf
)
SELECT r.g AS "group", CAST(r.rank AS INT) AS rank, r.term,
       CAST(r.tf AS BIGINT) AS tf,
       ROUND(CAST(r.tf AS DOUBLE) / tot.tot, {round_digits}) AS share
FROM ranked r JOIN tot USING (g)
WHERE r.rank <= {k}
"""
