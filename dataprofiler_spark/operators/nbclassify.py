"""Distributed multinomial Naive-Bayes DOCUMENT classifier — the
closed-form stand-in for the fastText-style domain/quality classifiers
web-corpus pipelines train (CCNet / GPT-3 data work, public knowledge):
label a corpus by source/domain/quality from examples, then score every
document at scale to drive filtering and mixture decisions.

Why NB and not logistic regression: the fit is ONE groupBy (no
iterative solve), the state is O(labels × vocab) under explicit caps,
and every score is a sum of logs of rational numbers — which makes the
whole classifier reproducible in a SQL engine (the DuckDB oracle
re-derives fit AND predictions bit-for-bat via 1e6 fixed-point log
likelihoods; integer sums are order-independent, so Spark's partial
aggregation cannot drift from a sequential engine).

Companion to labeler/trainable.py (char-n-gram NB over CELL values for
column-type labeling); this one is word-level over DOCUMENTS.

Plan shape (fit + score, two corpus scans total):
  fit:   explode tokens → ONE groupBy (label, token) [capped vocab]
         + one tiny label-prior aggregate; state collects to the
         driver bounded by MAX_LABELS × vocab_cap.
  score: explode tokens → broadcast-join the (token → per-label lp6)
         table → ONE groupBy(id) summing per-label fixed-point logs →
         argmax via array_min over (-score, label) structs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LABELS = 200
# collected model cells (labels × vocab_cap) allowed on the driver
MAX_STATE_CELLS = 2_000_000
_S = 1_000_000

# vocabulary = top-N tokens by corpus count (ties → token asc): the
# standard frequency cutoff; deterministic on both engines.
DEFAULT_VOCAB_CAP = 20_000


def nb_fit(df: DataFrame, text_col: str, label_col: str,
           vocab_cap: int = DEFAULT_VOCAB_CAP,
           alpha: float = 1.0) -> dict:
    """Fit state: {labels, priors6, vocab, lp6, oov6} — all log terms
    pre-rounded to 1e6 fixed-point ints.

    lp6[token][label_index] = round(ln((c + alpha) / (total_label +
    alpha * (V + 1))) * 1e6); the +1 in the denominator's vocabulary
    size reserves one pseudo-slot for out-of-vocabulary tokens, whose
    shared likelihood is oov6[label_index] (c = 0). NULL labels and
    NULL texts are excluded (unlabeled rows cannot teach)."""
    from dataprofiler_spark.operators.textanalysis import tokens_expr
    from dataprofiler_spark.session import ensure_parallelism

    # single-file local inputs would tokenize+explode the whole corpus
    # on ONE core (no-op at real scale — the scan is already wide)
    df = ensure_parallelism(df)
    base = (df.select(F.col(label_col).cast("string").alias("lbl"),
                      tokens_expr(text_col).alias("toks"))
            .where(F.col("lbl").isNotNull()))
    # priors from document counts; the collect doubles as the label
    # guard (limit MAX_LABELS+1 bounds the collect even on a degenerate
    # label column — the trainable.py guard pattern). One corpus scan
    # where the r11 shape spent two (a countDistinct pass + this one).
    prior_rows = (base.groupBy("lbl").agg(F.count(F.lit(1)).alias("n"))
                  .limit(MAX_LABELS + 1).collect())
    n_labels = len(prior_rows)
    if n_labels == 0:
        raise ValueError("nb_fit: no labeled rows")
    if n_labels > MAX_LABELS:
        raise ValueError(f"nb_fit: more than {MAX_LABELS} labels "
                         f"exceeds MAX_LABELS={MAX_LABELS}")
    if n_labels * vocab_cap > MAX_STATE_CELLS:
        # the collected model is O(labels × vocab): keep the driver
        # honest instead of silently materializing gigabytes
        raise ValueError(
            f"nb_fit: labels × vocab_cap = {n_labels * vocab_cap} "
            f"exceeds MAX_STATE_CELLS={MAX_STATE_CELLS}; lower "
            "vocab_cap or coarsen the label column")
    labels = sorted(r["lbl"] for r in prior_rows)
    lidx = {lb: i for i, lb in enumerate(labels)}
    n_docs = sum(r["n"] for r in prior_rows)
    priors6 = [0] * len(labels)
    for r in prior_rows:
        priors6[lidx[r["lbl"]]] = int(round(
            math.log(r["n"] / n_docs) * _S))

    terms = base.select("lbl", F.explode("toks").alias("tok"))
    # (lbl, tok) counts feed the vocabulary cutoff, the kept-cell
    # collect AND the per-label totals — persist the aggregate (bounded
    # by labels × distinct tokens, far smaller than the token stream)
    # so the corpus is tokenized ONCE, not three times (guide §1.2/§5:
    # the r11 shape re-scanned + re-exploded the corpus per consumer).
    counts = (terms.groupBy("lbl", "tok")
              .agg(F.count(F.lit(1)).alias("c"))).persist()
    try:
        # deterministic frequency-cutoff vocabulary
        vocab_rows = (counts.groupBy("tok")
                      .agg(F.sum("c").alias("ct"))
                      .orderBy(F.desc("ct"), F.asc("tok"))
                      .limit(vocab_cap).collect())
        vocab = {r["tok"] for r in vocab_rows}
        # broadcast semi-join, NOT an isin literal list: vocab_cap can
        # be 20k+ and a literal IN-list that long is a degenerate
        # expression
        spark = df.sparkSession
        if vocab:
            vocab_df = spark.createDataFrame(
                [(t,) for t in sorted(vocab)], "tok string")
            in_vocab = counts.join(F.broadcast(vocab_df), "tok",
                                   "left_semi")
        else:
            in_vocab = counts.where(F.lit(False))
        count_rows = in_vocab.collect()
        # per-label token totals over the FULL stream (OOV mass
        # included — the denominator is the label's true token count):
        # Σ_tok c per label over the persisted aggregate, no re-scan
        total_rows = (counts.groupBy("lbl")
                      .agg(F.sum("c").alias("t")).collect())
    finally:
        counts.unpersist()
    totals = {r["lbl"]: r["t"] for r in total_rows}
    V1 = len(vocab) + 1

    def lp(c: int, lbl: str) -> int:
        return int(round(math.log(
            (c + alpha) / (totals.get(lbl, 0) + alpha * V1)) * _S))

    lp6: dict[str, list[int]] = {}
    by_tok: dict[str, dict[str, int]] = {}
    for r in count_rows:
        by_tok.setdefault(r["tok"], {})[r["lbl"]] = r["c"]
    for tok, per in by_tok.items():
        lp6[tok] = [lp(per.get(lb, 0), lb) for lb in labels]
    oov6 = [lp(0, lb) for lb in labels]
    return {"labels": labels, "priors6": priors6, "vocab": sorted(vocab),
            "lp6": lp6, "oov6": oov6, "alpha": alpha}


def nb_predict(df: DataFrame, id_col: str, text_col: str,
               model: dict) -> DataFrame:
    """(id, pred_label): argmax label per document (ties → the
    lexicographically smallest label). Empty/NULL texts score on priors
    alone. The lp table broadcasts; one explode + one groupBy(id)."""
    from dataprofiler_spark.operators.textanalysis import tokens_expr
    from dataprofiler_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    spark = df.sparkSession
    labels = model["labels"]
    L = len(labels)
    lp_rows = [(tok, v) for tok, v in sorted(model["lp6"].items())]
    lp_df = spark.createDataFrame(lp_rows, "tok string, lp array<bigint>") \
        if lp_rows else spark.createDataFrame([], "tok string, lp array<bigint>")
    oov = F.array(*[F.lit(v) for v in model["oov6"]])
    prior = F.array(*[F.lit(v) for v in model["priors6"]])

    base = df.select(F.col(id_col).alias("id"),
                     tokens_expr(text_col).alias("toks"))
    terms = base.select("id", F.explode_outer("toks").alias("tok"))
    scored = (terms.join(F.broadcast(lp_df), "tok", "left")
              .select("id",
                      F.when(F.col("tok").isNull(),
                             F.array(*[F.lit(0)] * L))
                      .otherwise(F.coalesce(F.col("lp"), oov))
                      .alias("lp")))
    sums = (scored.groupBy("id")
            .agg(*[F.sum(F.element_at("lp", i + 1)).alias(f"s{i}")
                   for i in range(L)]))
    structs = [
        F.struct((-(F.col(f"s{i}") + F.lit(model["priors6"][i])))
                 .alias("neg"), F.lit(labels[i]).alias("lb"))
        for i in range(L)
    ]
    return (sums.select("id",
                        F.array_min(F.array(*structs))["lb"]
                        .alias("pred_label")))


def nb_confusion(df: DataFrame, id_col: str, text_col: str,
                 label_col: str,
                 vocab_cap: int = DEFAULT_VOCAB_CAP,
                 alpha: float = 1.0) -> DataFrame:
    """Self-train + self-score confusion matrix (label, pred_label, n)
    — the separability audit before trusting source/domain labels as
    mixture strata. NULL-label rows are excluded from BOTH fit and
    scoring (matching nb_fit)."""
    model = nb_fit(df, text_col, label_col, vocab_cap, alpha)
    labeled = df.where(F.col(label_col).cast("string").isNotNull())
    preds = nb_predict(labeled, id_col, text_col, model)
    truth = labeled.select(F.col(id_col).alias("id"),
                           F.col(label_col).cast("string").alias("label"))
    return (preds.join(truth, "id")
            .groupBy("label", "pred_label")
            .agg(F.count(F.lit(1)).alias("n")))


def oracle_nb_confusion_sql(table: str, id_col: str, text_col: str,
                            label_col: str,
                            vocab_cap: int = DEFAULT_VOCAB_CAP,
                            alpha: float = 1.0) -> str:
    """Re-derives fit AND prediction: the same frequency-cutoff
    vocabulary, the same fixed-point log table, the same argmax."""
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    a = repr(float(alpha))
    return f"""
WITH base AS (
  SELECT {id_col} AS id, CAST({label_col} AS VARCHAR) AS lbl,
         {toks} AS toks
  FROM {table}
  WHERE CAST({label_col} AS VARCHAR) IS NOT NULL
),
labels AS (SELECT lbl, COUNT(*) AS n FROM base GROUP BY lbl),
ndocs AS (SELECT SUM(n) AS nd FROM labels),
priors AS (
  SELECT lbl, CAST(ROUND(LN(CAST(n AS DOUBLE) / nd) * {_S}) AS BIGINT)
         AS p6
  FROM labels CROSS JOIN ndocs
),
terms AS (SELECT id, lbl, UNNEST(toks) AS tok FROM base),
counts AS (SELECT lbl, tok, COUNT(*) AS c FROM terms GROUP BY lbl, tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, SUM(c) AS ct FROM counts GROUP BY tok
    ORDER BY ct DESC, tok ASC LIMIT {vocab_cap})
),
vsize AS (SELECT COUNT(*) + 1 AS v1 FROM vocab),
totals AS (SELECT lbl, COUNT(*) AS t FROM terms GROUP BY lbl),
-- dense (tok, lbl) log-likelihood table incl. zero counts
lp AS (
  SELECT v.tok, l.lbl,
         CAST(ROUND(LN((COALESCE(c.c, 0) + {a})
                       / (t.t + {a} * s.v1)) * {_S}) AS BIGINT) AS lp6
  FROM vocab v CROSS JOIN labels l
  JOIN totals t ON t.lbl = l.lbl CROSS JOIN vsize s
  LEFT JOIN counts c ON c.tok = v.tok AND c.lbl = l.lbl
),
oov AS (
  SELECT l.lbl,
         CAST(ROUND(LN({a} / (t.t + {a} * s.v1)) * {_S}) AS BIGINT)
         AS lp6
  FROM labels l JOIN totals t ON t.lbl = l.lbl CROSS JOIN vsize s
),
-- score every (doc, candidate label): vocab hits + OOV fallbacks
doc_terms AS (SELECT id, tok FROM terms),
contrib AS (
  SELECT dt.id, o.lbl, SUM(COALESCE(lp.lp6, o.lp6)) AS s6
  FROM doc_terms dt
  CROSS JOIN oov o
  LEFT JOIN lp ON lp.tok = dt.tok AND lp.lbl = o.lbl
  GROUP BY dt.id, o.lbl
),
scores AS (
  SELECT b.id, p.lbl,
         COALESCE(c.s6, 0) + p.p6 AS score6
  FROM (SELECT DISTINCT id FROM base) b
  CROSS JOIN priors p
  LEFT JOIN contrib c ON c.id = b.id AND c.lbl = p.lbl
),
pred AS (
  SELECT id, lbl AS pred_label FROM (
    SELECT id, lbl,
           ROW_NUMBER() OVER (PARTITION BY id
                              ORDER BY score6 DESC, lbl ASC) AS rn
    FROM scores)
  WHERE rn = 1
)
SELECT b.lbl AS label, p.pred_label, COUNT(*) AS n
FROM pred p JOIN (SELECT DISTINCT id, lbl FROM base) b ON b.id = p.id
GROUP BY b.lbl, p.pred_label
"""
