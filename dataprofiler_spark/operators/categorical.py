"""Categorical column statistics.

Reference semantics: dataprofiler/profilers/categorical_column_profile.py —
full value→count dict (via ``_update_categories``), categorical detection
(unique ≤ 10 or unique_ratio ≤ 0.2, :29-34 / :422-438), gini impurity
(:197-218), unalikeability (:220-243), top-k report (:376-381), and a
stop condition that abandons high-cardinality columns (:457-476); optional
Count-Min-Sketch heavy-hitter mode (:62-133).

Spark design: ONE melted job for every candidate column — the columns are
exploded into (column, value) pairs and grouped once, instead of one
groupBy job per column. At 100 TB the melt multiplies scan width by the
candidate-column count, so candidates are pre-gated with a single
``approx_count_distinct`` pass (the Spark analog of the reference's
stop-condition) and the exact counts job only runs on columns that can
actually be categorical. Count-Min-Sketch mode maps to the built-in
``count_min_sketch`` aggregate (mergeable state, bounded memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference defaults (categorical_column_profile.py:29-34).
CATEGORICAL_MAX_UNIQUE = 10
CATEGORICAL_MAX_UNIQUE_RATIO = 0.2
# Stop-condition defaults (:457-476): abandon tracking when sample is large
# and unique ratio is high.
STOP_CONDITION_UNIQUE_VALUE_RATIO = 0.5
STOP_CONDITION_SAMPLE_SIZE = 10_000


def candidate_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    max_unique_ratio: float = STOP_CONDITION_UNIQUE_VALUE_RATIO,
    max_unique: int | None = None,
) -> list[str]:
    """Cheap approx-distinct gate before the exact counts job.

    Mirrors the reference's stop condition, but as a *pre*-filter: one
    ``approx_count_distinct`` aggregate over all columns decides which
    columns are worth exact category tracking, so the expensive melted
    groupBy never sees unbounded-cardinality columns.
    """
    cols = cols or df.columns
    aggs = [F.approx_count_distinct(c, 0.05).alias(c) for c in cols]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs).collect()[0]
    n = max(row["__n"], 1)
    out = []
    for c in cols:
        approx = row[c]
        if max_unique is not None and approx > max_unique * 1.2:
            continue
        if approx / n <= max_unique_ratio or approx <= CATEGORICAL_MAX_UNIQUE:
            out.append(c)
    return out


def category_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, value, count) for every candidate column in ONE job.

    Values are stringified (the reference profiles category labels as
    strings). NULLs are kept out — null accounting lives in the null
    profile, matching ``clean_data_and_get_base_stats`` splitting nulls
    before category counting (profile_builder.py:536-676).
    """
    from dataprofiler_spark.session import ensure_parallelism

    pairs = []
    for c in cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    # the explode fans every row out |cols|-fold — make sure a single
    # small parquet split doesn't serialize that CPU on one core
    melted = ensure_parallelism(df).select(
        F.explode(F.create_map(*pairs)).alias("column", "value"))
    return (
        melted.where(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def categorical_stats(counts: DataFrame) -> DataFrame:
    """Per-column stats derived from the counts DF (second-level agg,
    input is already tiny).

    gini = Σ p(1-p)  (categorical_column_profile.py:197-218)
    unalikeability = Σ_{v} c_v (n - c_v) / (n² - n)  (:220-243)
    """
    n = F.sum("count")
    sum_sq = F.sum(F.col("count") * F.col("count"))
    return counts.groupBy("column").agg(
        F.count(F.lit(1)).alias("unique_count"),
        n.alias("sample_count"),
        (F.count(F.lit(1)) / n).alias("unique_ratio"),
        (F.lit(1.0) - sum_sq / (n * n)).alias("gini_impurity"),
        F.when(n > 1, (n * n - sum_sq) / (n * n - n)).otherwise(F.lit(None))
            .alias("unalikeability"),
    )


def top_k_categories(counts: DataFrame, k: int = 5) -> DataFrame:
    """Deterministic top-k per column: count desc, value asc tie-break
    (reference reports top_k_categories, categorical_column_profile.py:376-381).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("column").orderBy(F.desc("count"), F.asc("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("column", "rank")
    )


def category_counts_cms(df: DataFrame, cols: list[str], eps: float = 0.001,
                        confidence: float = 0.99, seed: int = 42) -> DataFrame:
    """Count-Min-Sketch mode for heavy hitters at unbounded cardinality
    (reference: datasketches CMS, categorical_column_profile.py:62-133).
    Returns one binary sketch per column; sketches are mergeable state.
    """
    aggs = [
        F.count_min_sketch(F.col(c).cast("string"), F.lit(eps),
                           F.lit(confidence), F.lit(seed)).alias(c)
        for c in cols
    ]
    return df.agg(*aggs)


def column_entropy(df: DataFrame, cols: list[str],
                   round_digits: int = 6) -> DataFrame:
    """(column, n, k, entropy, normalized_entropy): Shannon entropy (in
    nats) of each column's value distribution plus the ln(k)-normalized
    variant in [0, 1] — the concentration measure gini/unalikeability
    don't give you (entropy distinguishes "one dominant value + a long
    tail" from "a few equal values" at the same gini). NULL is a
    category (the categorical-stats contract: a 50%-NULL column IS
    concentrated). k = 1 yields normalized_entropy NULL (undefined, not
    0 — a constant column has no spread to normalize).

    Engine-exactness: H = ln(n) − Σ c·ln(c)/n over the count table —
    per-category c·ln(c) values are doubles rounded to 9 digits and
    summed as DECIMAL (order-independent; the same ln-sum discipline as
    the LM scorers). One groupBy per column over a union'd melt — a
    single shuffle keyed by (column, value)."""
    melted = None
    for c in cols:
        part = df.select(F.lit(c).alias("column"),
                         F.col(c).cast("string").alias("value"))
        melted = part if melted is None else melted.unionAll(part)
    counts = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("c"))
    clnc = F.round(F.col("c").cast("double")
                   * F.log(F.col("c").cast("double")), 9)
    agg = counts.groupBy("column").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(clnc.cast("decimal(38,9)")).alias("s"))
    h = (F.log(F.col("n").cast("double"))
         - F.col("s").cast("double") / F.col("n"))
    return agg.select(
        "column", "n", "k",
        F.round(h, round_digits).alias("entropy"),
        F.round(F.when(F.col("k") > 1,
                       h / F.log(F.col("k").cast("double"))),
                round_digits).alias("normalized_entropy"))


def oracle_column_entropy_sql(table: str, cols: list[str],
                              round_digits: int = 6) -> str:
    selects = []
    for c in cols:
        selects.append(
            f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS value "
            f"FROM {table}")
    base = "\nUNION ALL\n".join(selects)
    return f"""
WITH melted AS ({base}),
counts AS (
  SELECT "column", value, COUNT(*) AS c FROM melted GROUP BY 1, 2
),
agg AS (
  SELECT "column", SUM(c) AS n, COUNT(*) AS k,
         SUM(CAST(ROUND(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)
                  AS DECIMAL(38,9))) AS s
  FROM counts GROUP BY 1
)
SELECT "column", CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       ROUND(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n,
             {round_digits}) AS entropy,
       ROUND(CASE WHEN k > 1 THEN
         (ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n)
         / ln(CAST(k AS DOUBLE)) END, {round_digits})
         AS normalized_entropy
FROM agg
"""


def pattern_profile(df: DataFrame, cols: list[str], k: int = 5,
                    round_digits: int = 6) -> DataFrame:
    """(column, rank, pattern, collapsed, count, share): top-k value
    SHAPE patterns per column — the classic profiler format screen
    (phone/id/date columns show one dominant shape; a second shape is
    dirty data). Characters map to classes: upper → 'A', lower → 'a',
    digit → '9', whitespace → '_'; punctuation stays itself;
    ``collapsed`` additionally collapses runs of each class
    ('AAA-9999' → 'A-9'; punctuation runs stay literal — RE2 has no
    backreferences, so the collapse is a per-class A+/a+/9+/_+ chain
    identical on both engines). NULL values report as '(null)'.

    Plan: the shape is a map-side regexp chain; one groupBy
    (column, pattern) over the melted columns, then per-column top-k by
    (count desc, pattern asc) via a window PARTITIONED BY column —
    bounded by distinct shapes per column (shapes collapse hard:
    a million order ids are one pattern), never a global sort."""
    from pyspark.sql.window import Window

    def shape(c):
        s = F.col(c).cast("string")
        s = F.regexp_replace(s, r"[A-Z]", "A")
        s = F.regexp_replace(s, r"[a-z]", "a")
        s = F.regexp_replace(s, r"[0-9]", "9")
        # explicit class, NOT \s: Java's \s includes U+000B but RE2's
        # (DuckDB) does not — the one whitespace-class divergence
        # between the engines (ADVICE r6)
        s = F.regexp_replace(s, r"[ \t\n\x0B\f\r]", "_")
        return F.coalesce(s, F.lit("(null)"))

    melted = None
    for c in cols:
        part = df.select(F.lit(c).alias("column"),
                         shape(c).alias("pattern"))
        melted = part if melted is None else melted.unionAll(part)
    counts = melted.groupBy("column", "pattern").agg(
        F.count(F.lit(1)).alias("count"))
    tot = counts.groupBy("column").agg(F.sum("count").alias("__n"))
    w = Window.partitionBy("column").orderBy(
        F.desc("count"), F.asc("pattern"))
    collapsed = F.col("pattern")
    for cls in ("A", "a", "9", "_"):
        collapsed = F.regexp_replace(collapsed, cls + "{2,}", cls)
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .join(tot, "column")
            .select("column", "rank", "pattern",
                    collapsed.alias("collapsed"), "count",
                    F.round(F.col("count").cast("double") / F.col("__n"),
                            round_digits).alias("share")))


def oracle_pattern_profile_sql(table: str, cols: list[str], k: int = 5,
                               round_digits: int = 6) -> str:
    selects = []
    for c in cols:
        shape = f"CAST({c} AS VARCHAR)"
        for pat, rep in ((r"[A-Z]", "A"), (r"[a-z]", "a"),
                         (r"[0-9]", "9"), (r"[ \t\n\x0b\f\r]", "_")):
            shape = f"regexp_replace({shape}, '{pat}', '{rep}', 'g')"
        selects.append(
            f"SELECT '{c}' AS \"column\", COALESCE({shape}, '(null)')"
            f" AS pattern FROM {table}")
    base = "\nUNION ALL\n".join(selects)
    return f"""
WITH melted AS ({base}),
counts AS (
  SELECT "column", pattern, COUNT(*) AS count FROM melted GROUP BY 1, 2
),
tot AS (SELECT "column", SUM(count) AS n FROM counts GROUP BY 1),
ranked AS (
  SELECT "column", pattern, count,
         ROW_NUMBER() OVER (PARTITION BY "column"
                            ORDER BY count DESC, pattern ASC) AS rank
  FROM counts
)
SELECT r."column", CAST(r.rank AS INT) AS rank, r.pattern,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         r.pattern, 'A{{2,}}', 'A', 'g'), 'a{{2,}}', 'a', 'g'),
         '9{{2,}}', '9', 'g'), '_{{2,}}', '_', 'g') AS collapsed,
       CAST(r.count AS BIGINT) AS count,
       ROUND(CAST(r.count AS DOUBLE) / tot.n, {round_digits}) AS share
FROM ranked r JOIN tot USING ("column")
WHERE r.rank <= {k}
"""
