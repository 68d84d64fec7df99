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

# Standard extended English stop-word list in the spirit of the
# reference's (unstructured_text_profile.py:52-458 ships ~400 entries):
# the classic core set plus contractions (the tokenizer keeps interior
# apostrophes), auxiliaries, and high-frequency function words. The list
# is data — swap freely per corpus.
STOP_WORDS: tuple[str, ...] = (
    "a", "about", "above", "across", "after", "afterwards", "again",
    "against", "all", "almost", "alone", "along", "already", "also",
    "although", "always", "am", "among", "amongst", "an", "and",
    "another", "any", "anyhow", "anyone", "anything", "anyway",
    "anywhere", "are", "aren't", "around", "as", "at", "back", "be",
    "became", "because", "become", "becomes", "becoming", "been",
    "before", "beforehand", "behind", "being", "below", "beside",
    "besides", "between", "beyond", "both", "bottom", "but", "by",
    "can", "can't", "cannot", "could", "couldn't", "did", "didn't",
    "do", "does", "doesn't", "doing", "don't", "done", "down", "due",
    "during", "each", "eight", "either", "eleven", "else", "elsewhere",
    "empty", "enough", "even", "ever", "every", "everyone",
    "everything", "everywhere", "except", "few", "fifteen", "fifty",
    "first", "five", "for", "former", "formerly", "forty", "four",
    "from", "front", "full", "further", "get", "give", "go", "had",
    "hadn't", "has", "hasn't", "have", "haven't", "having", "he",
    "hence", "her", "here", "hereafter", "hereby", "herein",
    "hereupon", "hers", "herself", "him", "himself", "his", "how",
    "however", "hundred", "i", "i'd", "i'll", "i'm", "i've", "if",
    "in", "indeed", "into", "is", "isn't", "it", "it's", "its",
    "itself", "just", "keep", "last", "latter", "latterly", "least",
    "less", "made", "many", "may", "me", "meanwhile", "might",
    "mightn't", "mine", "more", "moreover", "most", "mostly", "move",
    "much", "must", "mustn't", "my", "myself", "name", "namely",
    "neither", "never", "nevertheless", "next", "nine", "no", "nobody",
    "none", "noone", "nor", "not", "nothing", "now", "nowhere", "of",
    "off", "often", "on", "once", "one", "only", "onto", "or", "other",
    "others", "otherwise", "our", "ours", "ourselves", "out", "over",
    "own", "part", "per", "perhaps", "please", "put", "quite",
    "rather", "re", "really", "regarding", "same", "say", "see",
    "seem", "seemed", "seeming", "seems", "serious", "several",
    "shan't", "she", "she'd", "she'll", "she's", "should", "shouldn't",
    "show", "side", "since", "six", "sixty", "so", "some", "somehow",
    "someone", "something", "sometime", "sometimes", "somewhere",
    "still", "such", "take", "ten", "than", "that", "that's", "the",
    "their", "theirs", "them", "themselves", "then", "thence", "there",
    "thereafter", "thereby", "therefore", "therein", "thereupon",
    "these", "they", "they'd", "they'll", "they're", "they've",
    "third", "this", "those", "though", "three", "through",
    "throughout", "thus", "to", "together", "too", "top", "toward",
    "towards", "twelve", "twenty", "two", "under", "unless", "until",
    "up", "upon", "us", "used", "using", "various", "very", "via",
    "was", "wasn't", "we", "we'd", "we'll", "we're", "we've", "well",
    "were", "weren't", "what", "whatever", "when", "whence",
    "whenever", "where", "whereafter", "whereas", "whereby", "wherein",
    "whereupon", "wherever", "whether", "which", "while", "whither",
    "who", "who's", "whoever", "whole", "whom", "whose", "why", "will",
    "with", "within", "without", "won't", "would", "wouldn't", "yet",
    "you", "you'd", "you'll", "you're", "you've", "your", "yours",
    "yourself", "yourselves",
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
    from dataprofiler_spark.session import explode_no_prefilter
    vocab = (
        explode_no_prefilter(
            df.select(F.explode(F.create_map(*pairs)).alias("column", "value"))
            .where(F.col("value").isNotNull())
            .select("column", F.regexp_extract_all(
                F.col("value"), F.lit("."), 0).alias("chars")),
            "chars", "ch", "column")
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
        # a column with ZERO non-null values has vocab 0, not NULL —
        # DuckDB's COUNT(DISTINCT) over empty is 0 and the left join
        # here would otherwise say NULL (empty-tables audit, r7)
        .withColumn("vocab_size",
                    F.coalesce(F.col("vocab_size"), F.lit(0)))
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
    (count desc, word asc). Classic one-shuffle word count; top-k via
    distributed TakeOrderedAndProject (operators/topk.ranked_topk)."""
    from dataprofiler_spark.operators.topk import ranked_topk
    from dataprofiler_spark.session import explode_no_prefilter

    words = (
        explode_no_prefilter(
            df.where(F.col(text_col).isNotNull())
            .select(F.regexp_extract_all(F.lower(F.col(text_col)),
                                         F.lit(r"[^ \t\n\x0B\f\r]+"), 0).alias("toks")),
            "toks", "word")
        .select(F.regexp_replace(F.col("word"), r"^[^0-9a-z]+|[^0-9a-z]+$", "").alias("word"))
        .where(F.col("word") != "")
    )
    if strip_stop_words:
        words = words.where(~F.col("word").isin(*STOP_WORDS))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    return ranked_topk(
        counts, [F.desc("count"), F.asc("word")], top_k
    ).select("rank", "word", "count")


def oracle_word_counts_sql(table: str, text_col: str, top_k: int = 20,
                           strip_stop_words: bool = True) -> str:
    stop = ", ".join("'" + wd.replace("'", "''") + "'" for wd in STOP_WORDS)
    stop_filter = f"AND word NOT IN ({stop})" if strip_stop_words else ""
    return f"""
WITH toks AS (
  SELECT regexp_replace(UNNEST(regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')),
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
