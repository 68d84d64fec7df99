"""Text column statistics (structured) and unstructured word/vocab counts.

Reference semantics:
- Text column profile: vocab char set + full numeric battery over string
  lengths (dataprofiler/profilers/text_column_profile.py:134-171); text vs
  string split at max length 255 (:170-171).
- Unstructured text: char Counter, word Counter with stop-word and
  punctuation stripping, top-k (unstructured_text_profile.py:668-722,
  stop-words :52-458).

Spark design: lengths feed the same wide-agg numeric battery; vocab is a
distinct over exploded characters (one melted job for all text columns);
word counts are the classic explode→filter→groupBy pipeline — a single
shuffle on the word key, map-side partial aggregation for free. All
expressions are built-ins (regexp_extract_all / explode / lower), so the
whole pipeline stays in whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Standard English stop-word list in the spirit of the reference's
# (unstructured_text_profile.py:52-458 ships ~400 entries; this covers the
# high-frequency core — the list is data, swap freely).
STOP_WORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "could",
    "did", "do", "does", "doing", "down", "during", "each", "few", "for",
    "from", "further", "had", "has", "have", "having", "he", "her", "here",
    "hers", "him", "his", "how", "i", "if", "in", "into", "is", "it",
    "its", "itself", "just", "me", "more", "most", "my", "myself", "no",
    "nor", "not", "now", "of", "off", "on", "once", "only", "or", "other",
    "our", "ours", "out", "over", "own", "same", "she", "should", "so",
    "some", "such", "than", "that", "the", "their", "theirs", "them",
    "then", "there", "these", "they", "this", "those", "through", "to",
    "too", "under", "until", "up", "very", "was", "we", "were", "what",
    "when", "where", "which", "while", "who", "whom", "why", "will",
    "with", "you", "your", "yours",
)

STRING_MAX_LEN = 255  # text_column_profile.py:170-171 string/text split


def text_length_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, sample_size, null_count, min_len, max_len, avg_len,
    vocab_size, is_text) — lengths + per-column distinct-char vocab in two
    jobs total for any number of columns."""
    exprs = []
    for c in cols:
        col = F.col(c)
        ln = F.length(col)
        exprs.extend([
            F.count(F.lit(1)).alias(f"{c}__sample_size"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null_count"),
            F.min(ln).alias(f"{c}__min_len"),
            F.max(ln).alias(f"{c}__max_len"),
            F.round(F.avg(ln), 6).alias(f"{c}__avg_len"),
        ])
    row = df.agg(*exprs)

    # vocab: one melted explode job for all columns
    pairs = []
    for c in cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    vocab = (
        df.select(F.explode(F.create_map(*pairs)).alias("column", "value"))
        .where(F.col("value").isNotNull())
        .select("column", F.explode(F.regexp_extract_all(F.col("value"), F.lit("."), 0)).alias("ch"))
        .groupBy("column")
        .agg(F.count_distinct("ch").alias("vocab_size"))
    )

    fields = ["sample_size", "null_count", "min_len", "max_len", "avg_len"]
    structs = [
        F.struct(F.lit(c).alias("column"),
                 *[F.col(f"{c}__{f}").alias(f) for f in fields])
        for c in cols
    ]
    melted = row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    return (
        melted.join(vocab, "column", "left")
        .withColumn("is_text", F.col("max_len") > STRING_MAX_LEN)
    )


def oracle_text_length_stats_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"""
SELECT '{c}' AS "column", s.sample_size, CAST(s.null_count AS BIGINT) AS null_count, s.min_len, s.max_len,
       s.avg_len, v.vocab_size, s.max_len > {STRING_MAX_LEN} AS is_text
FROM (
  SELECT COUNT(*) AS sample_size,
         SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS null_count,
         MIN(LENGTH({c})) AS min_len, MAX(LENGTH({c})) AS max_len,
         ROUND(AVG(LENGTH({c})), 6) AS avg_len
  FROM {table}
) s CROSS JOIN (
  SELECT COUNT(DISTINCT ch) AS vocab_size
  FROM (SELECT UNNEST(regexp_extract_all({c}, '.')) AS ch
        FROM {table} WHERE {c} IS NOT NULL)
) v"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)


def word_counts(df: DataFrame, text_col: str, top_k: int = 20,
                strip_stop_words: bool = True) -> DataFrame:
    """Top-k words: lower → tokenize on non-space runs → strip edge
    punctuation → drop stop words → count. Deterministic tie-break
    (count desc, word asc). Classic one-shuffle word count."""
    from pyspark.sql.window import Window

    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), 0)
    ).alias("word")
    words = (
        df.where(F.col(text_col).isNotNull())
        .select(toks)
        .select(F.regexp_replace(F.col("word"), r"^[^0-9a-z]+|[^0-9a-z]+$", "").alias("word"))
        .where(F.col("word") != "")
    )
    if strip_stop_words:
        words = words.where(~F.col("word").isin(*STOP_WORDS))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    w = Window.orderBy(F.desc("count"), F.asc("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("rank", "word", "count")
    )


def oracle_word_counts_sql(table: str, text_col: str, top_k: int = 20,
                           strip_stop_words: bool = True) -> str:
    stop = ", ".join(f"'{wd}'" for wd in STOP_WORDS)
    stop_filter = f"AND word NOT IN ({stop})" if strip_stop_words else ""
    return f"""
WITH toks AS (
  SELECT regexp_replace(UNNEST(regexp_extract_all(LOWER({text_col}), '\\S+')),
                        '^[^0-9a-z]+|[^0-9a-z]+$', '', 'g') AS word
  FROM {table} WHERE {text_col} IS NOT NULL
), counts AS (
  SELECT word, COUNT(*) AS count FROM toks
  WHERE word <> '' {stop_filter}
  GROUP BY word
), ranked AS (
  SELECT word, count,
         ROW_NUMBER() OVER (ORDER BY count DESC, word ASC) AS rank
  FROM counts
)
SELECT rank, word, count FROM ranked WHERE rank <= {top_k}
"""
