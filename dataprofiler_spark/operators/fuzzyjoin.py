"""Edit-distance (fuzzy) joins via pigeonhole segment blocking.

The operator Spark lacks: find all string pairs within Levenshtein
distance ``max_dist`` WITHOUT the quadratic cross join. The blocking is
the PassJoin partition scheme (Li, Deng, Feng — VLDB 2011, public
literature): split every indexed string into ``max_dist + 1`` contiguous
segments; if ``ed(r, s) <= max_dist`` then at least one of s's segments
survives untouched by the <= max_dist edits, so it occurs VERBATIM in r,
and (because earlier edits shift positions by at most max_dist) it
occurs within ``max_dist`` positions of where it sits in s. Candidate
generation is therefore an equi-join on (segment text, segment index,
indexed length) between exploded segments and exploded probe substrings
— complete by the pigeonhole argument, so the exact ``levenshtein``
verify afterwards yields EXACTLY the true result set (parity with a
brute-force oracle, not approximately).

Scale shape: each side explodes to a bounded factor of itself —
``max_dist + 1`` segment rows per indexed string, at most
``(2·max_dist + 1)² · (max_dist + 1)`` probe rows per probe string
(length delta × segment × position offset, invalid combinations
filtered before the explode) — then ONE shuffle on the compound segment
key. No window, no driver state; the verify is Spark's built-in
(codegen) ``levenshtein``. Segment keys distribute like the underlying
text: a constant run ANYWHERE in the key (the "Customer#0000…" prefix,
a zero-padding suffix) makes the segment that falls inside it one hot
bucket holding most of the table, and the candidate join goes quadratic
(measured: zero-padded ids OOM at sf0.1 where the unpadded form runs in
seconds) — strip constant affixes in the key expression first.

Cross-engine caveat: DuckDB's ``levenshtein`` counts BYTES while
Spark's counts CHARACTERS ('héllo'→'hello' is 2 vs 1), so SQL oracles
are only exact over single-byte text — oracle-checked queries project
an ASCII key; the operator itself is character-correct for any unicode
(tests pin it against a pure-Python DP).

NULL text has no identity (excluded from both sides), mirroring the
asof/categorical NULL-key contract elsewhere in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_start_len(l: Column, k: int, i: int) -> tuple[Column, Column]:
    """1-based start and length of segment ``i`` (0-based) of a string of
    length ``l`` split into ``k`` contiguous segments: the first
    ``k - (l % k)`` segments get ``l // k`` chars, the rest one more."""
    base = F.floor(l / k).cast("int")
    rem = (l % k).cast("int")
    seglen = base + F.when(F.lit(i) >= F.lit(k) - rem, 1).otherwise(0)
    start = (F.lit(1) + F.lit(i) * base
             + F.greatest(F.lit(0), F.lit(i) - (F.lit(k) - rem)))
    return start, seglen


def _index_side(df: DataFrame, id_col: str, text_col: str,
                max_dist: int) -> DataFrame:
    """(id, s, l, seg, key): one row per segment of each indexed string."""
    k = max_dist + 1
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("s"))
            .where(F.col("s").isNotNull())
            .withColumn("l", F.length("s")))
    structs = []
    for i in range(k):
        start, seglen = _seg_start_len(F.col("l"), k, i)
        structs.append(F.struct(
            F.lit(i).alias("seg"),
            F.substr(F.col("s"), start, seglen).alias("key")))
    return (base.select("id", "s", "l",
                        F.explode(F.array(*structs)).alias("g"))
            .select("id", "s", "l", F.col("g.seg").alias("seg"),
                    F.col("g.key").alias("key")))


def _probe_side(df: DataFrame, id_col: str, text_col: str,
                max_dist: int) -> DataFrame:
    """(id, s, ls, seg, key): every substring of each probe string that
    could equal a segment of an indexed string within distance
    ``max_dist`` — lengths within ±max_dist, positions within ±max_dist
    of the segment's home position (the pigeonhole shift bound)."""
    t, k = max_dist, max_dist + 1
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("s"))
            .where(F.col("s").isNotNull())
            .withColumn("l", F.length("s")))
    l = F.col("l")
    structs = []
    for delta in range(-t, t + 1):
        ls = l + delta
        for i in range(k):
            start0, seglen = _seg_start_len(ls, k, i)
            for off in range(-t, t + 1):
                p = start0 + F.lit(off)
                valid = ((ls >= 0) & (p >= 1) & (p + seglen - 1 <= l))
                structs.append(F.when(valid, F.struct(
                    ls.cast("int").alias("ls"),
                    F.lit(i).alias("seg"),
                    F.substr(F.col("s"), p, seglen).alias("key")))
                    .otherwise(F.lit(None)))
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    return (base.select("id", "s", "l", F.explode(arr).alias("g"))
            .select("id", "s", F.col("g.ls").alias("ls"),
                    F.col("g.seg").alias("seg"),
                    F.col("g.key").alias("key"))
            .dropDuplicates(["id", "ls", "seg", "key"]))


def fuzzy_join(left: DataFrame, left_id: str, left_text: str,
               right: DataFrame, right_id: str, right_text: str,
               max_dist: int = 1) -> DataFrame:
    """All (id1 from left, id2 from right, dist) with
    ``levenshtein(left_text, right_text) <= max_dist`` — the
    record-linkage join (dirty records against a master table). Exact:
    segment blocking prunes, the verify decides."""
    probes = _probe_side(left, left_id, left_text, max_dist)
    idx = _index_side(right, right_id, right_text, max_dist)
    cand = (probes.alias("p")
            .join(idx.alias("x"),
                  (F.col("p.ls") == F.col("x.l"))
                  & (F.col("p.seg") == F.col("x.seg"))
                  & (F.col("p.key") == F.col("x.key")))
            .select(F.col("p.id").alias("id1"), F.col("p.s").alias("s1"),
                    F.col("x.id").alias("id2"), F.col("x.s").alias("s2"))
            .dropDuplicates(["id1", "id2"]))
    return (cand.withColumn("dist", F.levenshtein("s1", "s2"))
            .where(F.col("dist") <= max_dist)
            .select("id1", "id2", "dist"))


def fuzzy_self_pairs(df: DataFrame, id_col: str, text_col: str,
                     max_dist: int = 1,
                     key_expr: Column | None = None) -> DataFrame:
    """All unordered pairs (id1 < id2, dist) within ``max_dist`` edits —
    fuzzy dedup over one column. ``key_expr`` optionally replaces the
    raw column as the join key (e.g. strip/reverse a constant prefix so
    segment buckets stay balanced — see module docstring)."""
    src = df
    text = text_col
    if key_expr is not None:
        src = df.select(F.col(id_col), key_expr.alias("__fuzzy_key"))
        text = "__fuzzy_key"
    probes = _probe_side(src, id_col, text, max_dist)
    idx = _index_side(src, id_col, text, max_dist)
    # one direction suffices for completeness (the pigeonhole argument
    # applies per indexed side), so id< both halves the join output and
    # dedupes the symmetric candidate
    cand = (probes.alias("p")
            .join(idx.alias("x"),
                  (F.col("p.ls") == F.col("x.l"))
                  & (F.col("p.seg") == F.col("x.seg"))
                  & (F.col("p.key") == F.col("x.key"))
                  & (F.col("p.id") < F.col("x.id")))
            .select(F.col("p.id").alias("id1"), F.col("p.s").alias("s1"),
                    F.col("x.id").alias("id2"), F.col("x.s").alias("s2"))
            .dropDuplicates(["id1", "id2"]))
    return (cand.withColumn("dist", F.levenshtein("s1", "s2"))
            .where(F.col("dist") <= max_dist)
            .select("id1", "id2", "dist"))


def oracle_fuzzy_self_pairs_sql(table: str, id_col: str, key_sql: str,
                                max_dist: int = 1) -> str:
    """Brute-force verify join (quadratic — oracle scale only). Only
    byte==char text is exact cross-engine (module docstring); ``key_sql``
    should project ASCII."""
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {key_sql} AS s FROM {table}
  WHERE {key_sql} IS NOT NULL
)
SELECT a.id AS id1, b.id AS id2,
       CAST(levenshtein(a.s, b.s) AS INT) AS dist
FROM t a JOIN t b
  ON a.id < b.id
 AND abs(length(a.s) - length(b.s)) <= {max_dist}
WHERE levenshtein(a.s, b.s) <= {max_dist}
"""


def oracle_fuzzy_join_sql(left: str, left_id: str, left_key_sql: str,
                          right: str, right_id: str, right_key_sql: str,
                          max_dist: int = 1) -> str:
    return f"""
WITH a AS (
  SELECT {left_id} AS id, {left_key_sql} AS s FROM {left}
  WHERE {left_key_sql} IS NOT NULL
), b AS (
  SELECT {right_id} AS id, {right_key_sql} AS s FROM {right}
  WHERE {right_key_sql} IS NOT NULL
)
SELECT a.id AS id1, b.id AS id2,
       CAST(levenshtein(a.s, b.s) AS INT) AS dist
FROM a JOIN b
  ON abs(length(a.s) - length(b.s)) <= {max_dist}
WHERE levenshtein(a.s, b.s) <= {max_dist}
"""
