"""Per-domain curation rollup — the standard web-corpus weighting
signal (CCNet, Wenzek et al. LREC'20; Gopher/RefinedWeb-style per-domain
filtering): extract the registrable domain from a URL column, then roll
up quality / token / duplication stats per domain so a mixture can
up-weight, down-weight, or drop whole domains.

Beyond the reference (capitalone/DataProfiler has no URL analytics);
built on the engine's existing quality machinery
(textanalysis._quality_raw_exprs) and exact-dup signal.

Design notes:

* Registrable-domain extraction is a pure map-side expression chain
  (regexp host parse → label split → two-level-public-suffix
  heuristic) — no UDF, no shuffle, stays in whole-stage codegen. The
  suffix list is a deliberately small built-in heuristic (the common
  ccTLD second-level registries), NOT the full Public Suffix List; it
  is documented, deterministic, and identical in the DuckDB oracle. A
  production pipeline that needs PSL exactness can broadcast-join a
  PSL table against the same host column.
* The rollup is ONE groupBy(domain) over pre-projected narrow columns
  (quality exprs computed once per row, before the shuffle) plus ONE
  md5-keyed aggregation for the corpus-wide exact-dup signal — both
  shuffles are keyed on uniform hashes / bounded-cardinality domains.
  At 100 TB: shuffle volume is O(domains) + O(distinct texts), never
  quadratic; a skewed mega-domain is one hot reducer for a SUM —
  AQE-splittable, not a correctness risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common two-level "effective TLD" registries (heuristic subset of the
# Public Suffix List — see module docstring).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "org.nz", "net.nz", "govt.nz", "ac.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "co.za", "org.za", "net.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr",
    "co.id", "or.id", "web.id", "ac.id", "go.id",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua",
)

# Host = authority minus userinfo/port; scheme optional (a bare
# "example.com/path" treats the leading run as the host).
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*://)?(?:[^/?#@]*@)?([^/:?#]+)"


def host_expr(url_col: str | Column) -> Column:
    """Lowercased host of a URL (map-side regexp; '' for NULL/garbage)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(F.trim(c), _HOST_RE, 1))


def registrable_domain_expr(url_col: str | Column) -> Column:
    """Registrable domain ("example.co.uk" from
    "https://www.news.example.co.uk:8080/p?q"): last two host labels,
    or last three when the last two form a known two-level suffix
    (TWO_LEVEL_SUFFIXES). IPv4 hosts and single-label hosts pass
    through whole; unparseable/NULL URLs yield NULL. Pure expressions —
    fuses into the scan stage."""
    host = host_expr(url_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.concat_ws(".", F.element_at(labels, -2), last1)
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    is_ip = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    dom = (F.when(host.isNull() | (host == ""),
                  F.lit(None).cast("string"))
           .when(is_ip, host)
           .when(n <= 2, host)
           .when(last2.isin(*TWO_LEVEL_SUFFIXES), last3)
           .otherwise(last2))
    return dom


def domain_extract(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """(id, host, domain) — the parse, exposed for joining back."""
    return df.select(
        F.col(id_col).alias("id"),
        host_expr(url_col).alias("host"),
        registrable_domain_expr(url_col).alias("domain"))


def domain_rollup(df: DataFrame, url_col: str, text_col: str,
                  low_quality_threshold: float = 0.5,
                  round_digits: int = 6) -> DataFrame:
    """(domain, n_docs, total_tokens, avg_quality, n_low_quality,
    n_dup_docs, dup_ratio) per registrable domain — the per-domain
    weighting table a CCNet-style pipeline thresholds on.

    * quality: the engine's standard per-doc score
      (textanalysis._quality_raw_exprs), summed as DECIMAL(28,12) so the
      average is partition-order-independent (engine-exact).
    * n_dup_docs: docs whose EXACT text (md5) occurs more than once
      CORPUS-WIDE (not just within the domain) — a domain full of
      cross-domain boilerplate scores high here even if each copy
      appears once per domain.
    * NULL/unparseable URLs roll up under domain '(invalid)'.

    Plan: quality exprs pre-projected map-side → one groupBy(domain);
    dup flags from one md5-keyed agg joined back on md5 (both shuffle
    keys are hashes/bounded — see module docstring)."""
    from dataprofiler_spark.operators.textanalysis import _quality_raw_exprs

    e = _quality_raw_exprs(text_col)
    base = df.select(
        F.coalesce(registrable_domain_expr(url_col),
                   F.lit("(invalid)")).alias("domain"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__h"),
        e["n_tokens"].alias("__nt"),
        e["score"].alias("__score"))
    dups = (base.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") > 1).select("__h"))
    flagged = (base.join(dups, "__h", "left_semi")
               .groupBy("domain")
               .agg(F.count(F.lit(1)).alias("n_dup_docs")))
    n = F.count(F.lit(1))
    sdec = F.sum(F.col("__score").cast("decimal(28,12)"))
    agg = base.groupBy("domain").agg(
        n.alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.round(sdec.cast("double") / n, round_digits).alias("avg_quality"),
        F.sum(F.when(F.col("__score") < low_quality_threshold, 1)
              .otherwise(0)).alias("n_low_quality"))
    return (agg.join(flagged, "domain", "left")
            .select("domain", "n_docs", "total_tokens", "avg_quality",
                    "n_low_quality",
                    F.coalesce("n_dup_docs", F.lit(0)).alias("n_dup_docs"),
                    F.round(F.coalesce("n_dup_docs", F.lit(0))
                            .cast("double") / F.col("n_docs"),
                            round_digits).alias("dup_ratio")))


# --------------------------------------------------------------------------
# DuckDB oracle mirrors
# --------------------------------------------------------------------------

def _duck_domain(url: str) -> str:
    """DuckDB expression computing registrable_domain_expr(url)."""
    host = (f"LOWER(regexp_extract(TRIM({url}), "
            f"'{_HOST_RE}', 1))")
    labels = f"string_split({host}, '.')"
    n = f"len({labels})"
    last1 = f"list_extract({labels}, -1)"
    last2 = f"(list_extract({labels}, -2) || '.' || {last1})"
    last3 = f"(list_extract({labels}, -3) || '.' || {last2})"
    sufs = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    ip = (f"regexp_matches({host}, "
          "'^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$')")
    return (f"CASE WHEN {host} = '' THEN NULL "
            f"WHEN {ip} THEN {host} "
            f"WHEN {n} <= 2 THEN {host} "
            f"WHEN {last2} IN ({sufs}) THEN {last3} "
            f"ELSE {last2} END")


def oracle_domain_rollup_sql(table: str, url_expr: str, text_col: str,
                             low_quality_threshold: float = 0.5,
                             round_digits: int = 6) -> str:
    """Oracle for domain_rollup; ``url_expr`` is any SQL expression
    yielding the URL (valid in both engines if the registered query
    derives it with F.expr of the same string)."""
    from dataprofiler_spark.operators.textanalysis import (STOP_WORDS)

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
    score = f"CASE WHEN {text_col} IS NULL THEN 0.0 ELSE {score} END"
    dom = _duck_domain(url_expr)
    return f"""
WITH base AS (
  SELECT COALESCE({dom}, '(invalid)') AS domain,
         md5(COALESCE({text_col}, '')) AS h,
         {nt} AS nt,
         ({score}) AS score
  FROM {table}
),
dups AS (SELECT h FROM base GROUP BY h HAVING COUNT(*) > 1),
flagged AS (
  SELECT domain, COUNT(*) AS n_dup_docs
  FROM base WHERE h IN (SELECT h FROM dups) GROUP BY domain
),
agg AS (
  SELECT domain, COUNT(*) AS n_docs, SUM(nt) AS total_tokens,
         ROUND(CAST(SUM(CAST(score AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*), {round_digits}) AS avg_quality,
         SUM(CASE WHEN score < {low_quality_threshold} THEN 1 ELSE 0 END)
           AS n_low_quality
  FROM base GROUP BY domain
)
SELECT a.domain, CAST(a.n_docs AS BIGINT) AS n_docs,
       CAST(a.total_tokens AS BIGINT) AS total_tokens,
       a.avg_quality,
       CAST(a.n_low_quality AS BIGINT) AS n_low_quality,
       CAST(COALESCE(f.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
       ROUND(CAST(COALESCE(f.n_dup_docs, 0) AS DOUBLE) / a.n_docs,
             {round_digits}) AS dup_ratio
FROM agg a LEFT JOIN flagged f ON a.domain = f.domain
"""
