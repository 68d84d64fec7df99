"""Regex entity labeler — the default, CI-testable labeler.

Reference: labelers/regex_model.py:20-267 (per-label regex pattern lists →
per-char confidence; patterns shipped in resources/labelers/regex_model/
model_parameters.json), structured column aggregation in
data_labeler_column_profile.py (≤1000 samples, rank vote :395-440; final
label joins labels within 0.2 of top, "could not determine" when top conf
< 0.35 — :241-297). Label set follows the reference's structured model
(resources/labelers/structured_model/label_mapping.json).

Spark design: cell-level vote = anchored full-cell regex per label; ALL
(column × label) vote counts come from ONE wide df.agg() of
sum(when(rlike)) expressions — JVM-side regex, no Python. The CNN labeler
(labelers/character_level_cnn_model.py) would slot in as a mapInPandas
over the same sampled input; its aggregation (rank vote) is shared.
Patterns are RE2-compatible (no backrefs/lookahead) so the identical
pattern strings run in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Label → anchored pattern. Order matters for the priority tie-break
# (first match wins when ratios tie).
LABEL_PATTERNS: dict[str, str] = {
    "UUID": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    # common digest widths: md5/sha1/sha256/sha512
    "HASH_OR_KEY": r"^([0-9a-fA-F]{32}|[0-9a-fA-F]{40}|[0-9a-fA-F]{64}|[0-9a-fA-F]{128})$",
    "EMAIL_ADDRESS": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+$",
    "URL": r"^(https?|ftp)://[^\s/$.?#].[^\s]*$",
    "IPV4": r"^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$",
    "IPV6": r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$",
    "MAC_ADDRESS": r"^([0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}$",
    "SSN": r"^[0-9]{3}-[0-9]{2}-[0-9]{4}$",
    "CREDIT_CARD": r"^[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}$",
    "PHONE_NUMBER": r"^(\+?1[ .-]?)?(\([0-9]{3}\)|[0-9]{3})[ .-]?[0-9]{3}[ .-]?[0-9]{4}$",
    "DATETIME": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[ T][0-9]{2}:[0-9]{2}(:[0-9]{2})?$",
    "DATE": r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$",
    "TIME": r"^[0-9]{2}:[0-9]{2}(:[0-9]{2})?$",
    "US_STATE": (r"^(AL|AK|AZ|AR|CA|CO|CT|DE|FL|GA|HI|ID|IL|IN|IA|KS|KY|LA"
                 r"|ME|MD|MA|MI|MN|MS|MO|MT|NE|NV|NH|NJ|NM|NY|NC|ND|OH|OK"
                 r"|OR|PA|RI|SC|SD|TN|TX|UT|VT|VA|WA|WV|WI|WY)$"),
    "ADDRESS": (r"^[0-9]{1,6} [A-Za-z0-9 .']{2,40} "
                r"(St|Street|Ave|Avenue|Rd|Road|Blvd|Boulevard|Dr|Drive"
                r"|Ln|Lane|Ct|Court|Way|Pl|Place|Ter|Terrace)\.?$"),
    # common US state formats: 1-2 letters + 5-8 digits
    "DRIVERS_LICENSE": r"^[A-Z]{1,2}[0-9]{5,8}$",
    "ORDINAL": r"^[0-9]*(1st|2nd|3rd|[04-9]th|11th|12th|13th)$",
    # bank account number heuristic: 8-17 digits (overlaps INTEGER by
    # design — the rank-vote reports both, reference regex model ditto)
    "BAN": r"^[0-9]{8,17}$",
    "QUANTITY": (r"^[+-]?[0-9]+(\.[0-9]+)? ?(kg|g|mg|lb|lbs|oz|km|m|cm|mm"
                 r"|mi|ft|in|l|ml|gal|%)$"),
    "INTEGER": r"^[+-]?[0-9]+$",
    "FLOAT": r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+)$",
}

# data_labeler_column_profile.py:59-69 thresholds
MIN_TOP_RATIO = 0.35
JOIN_WITHIN = 0.2
MAX_SAMPLE = 1000  # :33 — per-column labeler sample bound


def label_votes(df: DataFrame, cols: list[str],
                round_digits: int = 6) -> DataFrame:
    """(column, label, votes, ratio) for every label with ≥1 vote —
    one wide agg for all columns × labels."""
    exprs = []
    for c in cols:
        s = F.col(c).cast("string")
        exprs.append(F.count(s).alias(f"{c}__n"))
        for lbl, pat in LABEL_PATTERNS.items():
            exprs.append(
                F.sum(F.when(s.rlike(pat), 1).otherwise(0)).alias(f"{c}__{lbl}"))
    row = df.agg(*exprs)
    structs = []
    for c in cols:
        for lbl in LABEL_PATTERNS:
            structs.append(F.struct(
                F.lit(c).alias("column"), F.lit(lbl).alias("label"),
                F.col(f"{c}__{lbl}").alias("votes"),
                F.round(F.col(f"{c}__{lbl}") / F.greatest(F.col(f"{c}__n"), F.lit(1)),
                        round_digits).alias("ratio"),
            ))
    melted = row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    return melted.where(F.col("votes") > 0)


def oracle_label_votes_sql(table: str, cols: list[str],
                           round_digits: int = 6) -> str:
    selects = []
    for c in cols:
        for lbl, pat in LABEL_PATTERNS.items():
            esc = pat.replace("'", "''")
            selects.append(f"""
SELECT '{c}' AS "column", '{lbl}' AS label,
       CAST(SUM(CASE WHEN regexp_matches(CAST({c} AS VARCHAR), '{esc}') THEN 1 ELSE 0 END) AS BIGINT) AS votes,
       ROUND(CAST(SUM(CASE WHEN regexp_matches(CAST({c} AS VARCHAR), '{esc}') THEN 1 ELSE 0 END) AS DOUBLE)
             / GREATEST(COUNT({c}), 1), {round_digits}) AS ratio
FROM {table}""")
    return ("SELECT * FROM (\n" + "\nUNION ALL\n".join(selects)
            + "\n) WHERE votes > 0")


def unstructured_entity_counts(df: DataFrame, text_col: str,
                               round_digits: int = 6) -> DataFrame:
    """(label, entity_count, percentage) over free text — span-level
    entity extraction (reference: unstructured_labeler_profile.py:262-330
    entity_counts + _get_percentages:221-246). Patterns are applied
    unanchored via regexp_extract_all; one scan, counts aggregate
    map-side."""
    exprs = []
    for lbl, pat in LABEL_PATTERNS.items():
        span_pat = pat.strip("^$")
        exprs.append(F.sum(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(span_pat), 0))
        ).alias(lbl))
    row = df.where(F.col(text_col).isNotNull()).agg(*exprs)
    structs = [
        F.struct(F.lit(lbl).alias("label"),
                 F.col(lbl).alias("entity_count"))
        for lbl in LABEL_PATTERNS
    ]
    melted = row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    total = melted.agg(F.sum("entity_count").alias("t"))
    return (melted.crossJoin(F.broadcast(total))
            .where(F.col("entity_count") > 0)
            .select("label", "entity_count",
                    F.round(F.col("entity_count") / F.col("t"), round_digits)
                    .alias("percentage")))


def oracle_unstructured_entity_counts_sql(table: str, text_col: str,
                                          round_digits: int = 6) -> str:
    sub = []
    for lbl, pat in LABEL_PATTERNS.items():
        span_pat = pat.strip("^$").replace("'", "''")
        sub.append(
            f"SELECT '{lbl}' AS label, "
            f"CAST(SUM(len(regexp_extract_all({text_col}, '{span_pat}'))) AS BIGINT) AS entity_count "
            f"FROM {table} WHERE {text_col} IS NOT NULL")
    return f"""
WITH melted AS ({" UNION ALL ".join(sub)}),
tot AS (SELECT SUM(entity_count) AS t FROM melted)
SELECT label, CAST(entity_count AS BIGINT) AS entity_count,
       ROUND(CAST(entity_count AS DOUBLE) / t, {round_digits}) AS percentage
FROM melted, tot WHERE entity_count > 0
"""


def cell_label_expr(col, default: str = "UNKNOWN"):
    """Per-CELL label: the first matching pattern in priority order wins
    (the declaration order of LABEL_PATTERNS — the same tie-break the
    column vote uses). The reference's per-sample argmax analog
    (regex_model.py:20-267 predicts per-char label confidences; the
    anchored full-cell match is the structured-cell specialization).
    Pure JVM expression — one F.when chain of rlike, no Python."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    expr = None
    for lbl, pat in LABEL_PATTERNS.items():
        branch = F.when(c.rlike(pat), F.lit(lbl))
        expr = branch if expr is None else expr.when(c.rlike(pat),
                                                     F.lit(lbl))
    return expr.otherwise(F.lit(default))


def oracle_cell_label_case(expr: str, default: str = "UNKNOWN") -> str:
    """DuckDB CASE mirror of cell_label_expr over a VARCHAR SQL
    expression (patterns are RE2-safe in both engines)."""
    branches = "\n".join(
        f"WHEN regexp_matches({expr}, '{pat.replace(chr(39), chr(39) * 2)}') "
        f"THEN '{lbl}'"
        for lbl, pat in LABEL_PATTERNS.items())
    return f"CASE {branches} ELSE '{default}' END"


def column_labels(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, label): reference vote semantics — top-ratio label; labels
    within 0.2 of the top joined by '|'; 'could not determine' when the
    top ratio is below 0.35; 'UNKNOWN' when nothing matches.

    Assembled driver-side from the tiny votes result (k × labels rows) —
    the distributed part is the single wide agg in label_votes.
    """
    votes = label_votes(df, cols).collect()
    by_col: dict[str, list] = {}
    for r in votes:
        by_col.setdefault(r["column"], []).append(r)
    out = []
    for c in cols:
        rs = by_col.get(c, [])
        if not rs:
            out.append((c, "UNKNOWN"))
            continue
        order = {lbl: i for i, lbl in enumerate(LABEL_PATTERNS)}
        rs.sort(key=lambda r: (-r["ratio"], order[r["label"]]))
        top = rs[0]["ratio"]
        if top < MIN_TOP_RATIO:
            out.append((c, "could not determine"))
            continue
        joined = [r["label"] for r in rs if top - r["ratio"] <= JOIN_WITHIN]
        out.append((c, "|".join(joined)))
    return df.sparkSession.createDataFrame(out, "column string, label string")
