"""Graph profile over edge-list DataFrames.

Reference: graph_profiler.py:333-460 — num_nodes, num_edges, average
degree, max connected component size, categorical/continuous edge-attr
split, best-fit continuous distribution. Graph data arrives as a CSV edge
list whose source/destination columns are detected by name substring
(graph_data.py:84-143).

Spark design: degree stats are one union + groupBy (GraphFrames' degree
pattern without the dependency). Connected components use iterative
min-label propagation — each round is one join + groupBy, converging in
O(diameter) rounds; this is the standard large-graph pattern
(GraphFrames' connectedComponents does the same with alternating large/
small-star optimizations). Distribution fitting samples attribute values
to the driver (bounded) — same as the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRC_KEYWORDS = ("source", "src", "from", "node_id_1", "start")
DST_KEYWORDS = ("target", "destination", "dst", "to", "node_id_2", "end")


def _persistent_rdd_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _checkpoint_tracking(df: DataFrame, eager: bool = True
                         ) -> tuple[DataFrame, set[int]]:
    """localCheckpoint ``df``; also return the ids of the RDDs
    the checkpoint persisted, so the caller can release them once the
    snapshot is superseded. ``eager=False`` defers materialization to
    the caller's NEXT action over the frame (the persistent-RDD id
    registers at persist time, so the tracking works either way) — use
    it when the loop already runs an action per round that reads the
    frame, saving one full job per iteration (r13,
    connected_components' convergence check).

    localCheckpoint persists its materialized RDD and nothing ever
    unpersists it — in an iterative loop that leaks one MEMORY_AND_DISK
    snapshot of the full label frame PER ROUND until the JVM
    ContextCleaner happens to collect them. On a long-lived session at
    scale that is an unbounded storage-memory leak, so each round frees
    the snapshot it supersedes (AFTER the last job that reads it — a
    localCheckpoint's lineage is truncated, so unpersisting it while
    still referenced loses the data, it cannot be recomputed); only the
    FINAL checkpoint (which backs the returned frame) is left to the
    ContextCleaner."""
    sc = df.sparkSession.sparkContext
    before = _persistent_rdd_ids(sc)
    out = df.localCheckpoint(eager=eager)
    added = _persistent_rdd_ids(sc) - before
    return out, added


def _release_rdds(sc, ids: set[int]) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def detect_edge_columns(columns: list[str]) -> tuple[str, str] | None:
    """Name-substring detection (graph_data.py:84-143), driver-side."""
    src = next((c for c in columns
                if any(k in c.lower() for k in SRC_KEYWORDS)), None)
    dst = next((c for c in columns
                if any(k in c.lower() for k in DST_KEYWORDS)), None)
    return (src, dst) if src and dst else None


def degree_stats(edges: DataFrame, src: str, dst: str,
                 round_digits: int = 6) -> DataFrame:
    """(num_nodes, num_edges, avg_degree, max_degree) — undirected degree
    over the union of endpoints; one shuffle."""
    nodes = edges.select(F.col(src).alias("node")).unionAll(
        edges.select(F.col(dst).alias("node")))
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.agg(
        F.count(F.lit(1)).alias("num_nodes"),
        (F.sum("degree") / 2).cast("long").alias("num_edges"),
        F.round(F.avg("degree"), round_digits).alias("avg_degree"),
        F.max("degree").alias("max_degree"),
    )


def oracle_degree_stats_sql(table: str, src: str, dst: str,
                            round_digits: int = 6) -> str:
    return f"""
WITH nodes AS (
  SELECT {src} AS node FROM {table}
  UNION ALL
  SELECT {dst} AS node FROM {table}
), deg AS (
  SELECT node, COUNT(*) AS degree FROM nodes GROUP BY node
)
SELECT COUNT(*) AS num_nodes,
       CAST(SUM(degree) / 2 AS BIGINT) AS num_edges,
       ROUND(AVG(degree), {round_digits}) AS avg_degree,
       MAX(degree) AS max_degree
FROM deg
"""


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iter: int = 20) -> DataFrame:
    """(node, component) with component = min node id reachable.

    Iterative min-label propagation: labels flow across edges until no
    label changes. Each iteration is two joins + one groupBy; the loop
    runs on the driver but all data stays distributed. localCheckpoint
    truncates the growing lineage (essential at scale — without it the
    plan doubles every round).

    NULL is not a node: an edge with a NULL endpoint contributes its
    non-NULL side as an isolated node and no edge — otherwise the NULL
    "node" becomes its own phantom component and, worse, equality joins
    silently stop propagating through it, so the two engines disagree
    on the component count (found by the adversarial parity suite)."""
    raw_nodes = (edges.select(F.col(src).alias("node"))
                 .unionAll(edges.select(F.col(dst).alias("node")))
                 .where(F.col("node").isNotNull()).distinct())
    both = edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    e = (both.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .unionAll(both.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
         .distinct().persist())
    labels = raw_nodes.withColumn("component", F.col("node"))
    ckpt_ids: set[int] = set()
    # try/finally so a failed iteration can't leak e's MEMORY_AND_DISK
    # state into the session (the returned labels frame is a
    # localCheckpoint and no longer depends on e).
    try:
        for _ in range(max_iter):
            prop = (e.join(labels, e.a == labels.node)
                    .select(F.col("b").alias("node"),
                            F.col("component").alias("cand")))
            new_labels = (labels.select("node",
                                        F.col("component").alias("cand"))
                          .unionAll(prop)
                          .groupBy("node")
                          .agg(F.min("cand").alias("component")))
            # LAZY checkpoint (r13): the convergence check below is the
            # materializing action — an eager checkpoint spent a whole
            # extra job per round storing blocks the very next job
            # re-read. Lineage is truncated either way.
            new_labels, added = _checkpoint_tracking(new_labels,
                                                     eager=False)
            changed = (new_labels.alias("n")
                       .join(labels.alias("o"), "node")
                       .where(F.col("n.component") != F.col("o.component"))
                       .limit(1).count())
            _release_rdds(new_labels.sparkSession.sparkContext, ckpt_ids)
            ckpt_ids = added
            labels = new_labels
            if changed == 0:
                break
    finally:
        e.unpersist()
    return labels


def component_summary(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(num_components, max_component_size) — the reference's 'max
    connected component' stat (graph_profiler.py:333-366)."""
    comps = connected_components(edges, src, dst)
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("num_components"),
        F.max("size").alias("max_component_size"),
    )


def pagerank(edges: DataFrame, src: str, dst: str, iters: int = 3,
             damp_num: int = 85, damp_den: int = 100,
             round_digits: int = 9) -> DataFrame:
    """PageRank over a directed edge list (Brin & Page '98 — public
    knowledge) — the node-importance signal a data-curation pipeline
    uses to weight web-graph domains, extended beyond the reference's
    degree/component stats.

    Each iteration is ONE join (ranks onto out-edges) + ONE groupBy(dst)
    of integer partial sums + a LEFT join back onto the node set —
    the standard distributed PageRank plan; the loop runs driver-side
    with O(1) state.

    Cross-engine exactness: ranks live in 1e9 fixed-point integers;
    every step is integer arithmetic — init = 1e9 // N, per-edge share
    = rank // out_degree (truncating div), update = base +
    (damp_num · Σ shares) // damp_den with base = (1e9 ·
    (damp_den − damp_num)) // (damp_den · N). Integer sums are
    order-independent, so Spark's partial aggregation and a sequential
    SQL engine produce the SAME rank at every iteration. Truncation
    mass loss (the classic integer-PageRank trade) is identical on
    both engines, and dangling-node mass is dropped (documented).

    Output: (node, rank) with rank = rank9 / 1e9, rounded."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    r0 = 10**9 // n
    base = (10**9 * (damp_den - damp_num)) // (damp_den * n)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.withColumn("r", F.lit(r0).cast("long"))
    ckpt_ids: set[int] = set()
    for _ in range(iters):
        shares = (e.join(ranks, e.src == ranks.node)
                  .join(outdeg, "src")
                  .select(F.col("dst").alias("node"),
                          F.expr("r div od").alias("share")))
        contrib = shares.groupBy("node").agg(F.sum("share").alias("s"))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({damp_num} * coalesce(s, 0))"
                                   f" div {damp_den}"))
                         .cast("long").alias("r")))
        # truncate growing lineage; the eager checkpoint is the last job
        # that reads the previous round's snapshot, so it can be freed
        ranks, added = _checkpoint_tracking(ranks)
        _release_rdds(ranks.sparkSession.sparkContext, ckpt_ids)
        ckpt_ids = added
    return ranks.select("node",
                        F.round(F.col("r") / F.lit(1e9), round_digits)
                        .alias("rank"))


def oracle_pagerank_sql(table: str, src: str, dst: str, iters: int = 3,
                        damp_num: int = 85, damp_den: int = 100,
                        round_digits: int = 9) -> str:
    """Unrolled iterations as CTEs — same integer algebra."""
    ctes = [f"""e AS (
  SELECT {src} AS src, {dst} AS dst FROM {table}
  WHERE {src} IS NOT NULL AND {dst} IS NOT NULL)""",
            """nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
            "nn AS (SELECT COUNT(*) AS n FROM nodes)",
            "outdeg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src)",
            """r0 AS (
  SELECT node, CAST(1000000000::BIGINT // n AS BIGINT) AS r
  FROM nodes CROSS JOIN nn)"""]
    base = (f"CAST(1000000000::BIGINT * {damp_den - damp_num} "
            f"// ({damp_den} * n) AS BIGINT)")
    for t in range(1, iters + 1):
        ctes.append(f"""r{t} AS (
  SELECT n.node,
         {base} + CAST({damp_num} * COALESCE(c.s, 0) // {damp_den}
                       AS BIGINT) AS r
  FROM nodes n CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS node, SUM(r.r // d.od) AS s
    FROM e JOIN r{t - 1} r ON r.node = e.src
    JOIN outdeg d ON d.src = e.src
    GROUP BY e.dst) c ON c.node = n.node)""")
    return f"""
WITH {",".join(ctes)}
SELECT node, ROUND(CAST(r AS DOUBLE) / 1e9, {round_digits}) AS rank
FROM r{iters}
"""


def edge_attribute_profile(edges: DataFrame, attr_cols: list[str],
                           categorical_threshold: float = 0.05,
                           max_categories: int = 10_000) -> dict:
    """Categorical/continuous split of edge attributes + best-fit
    continuous distribution by MLE over a driver-side sample
    (graph_profiler.py:371-460). scipy optional.

    The categorical histogram collect is bounded in ABSOLUTE terms: at
    most ``max_categories`` rows ship to the driver, selected as the
    top-K by count via ``ranked_topk`` (TakeOrderedAndProject — per-
    partition heaps, no full sort). A ratio gate alone is no cap: 5% of
    10^12 edges is 5·10^10 rows. When truncated, the profile records
    ``truncated=True`` and the exact overflow count so downstream totals
    stay exact."""
    from dataprofiler_spark.operators.topk import ranked_topk

    n = edges.count()
    out: dict = {}
    for c in attr_cols:
        distinct = edges.agg(F.approx_count_distinct(c)).collect()[0][0]
        if n and distinct / n <= categorical_threshold:
            grouped = edges.groupBy(c).agg(F.count(F.lit(1)).alias("count"))
            top = ranked_topk(
                grouped, [F.desc("count"), F.asc(c)], max_categories)
            counts = dict((r[0], r["count"]) for r in top.collect())
            kept = sum(counts.values())
            prof = {"kind": "categorical", "histogram": counts}
            # exact truncation signal: the collect hit the cap AND rows
            # are missing (an approx-distinct heuristic could undershoot
            # and silently omit the flag)
            if len(counts) == max_categories and n > kept:
                prof["truncated"] = True
                prof["overflow_count"] = n - kept
            out[c] = prof
        else:
            sample = [r[0] for r in
                      edges.select(c).where(F.col(c).isNotNull())
                      .limit(10_000).collect()]
            out[c] = {"kind": "continuous",
                      "best_fit": _best_fit_distribution(sample)}
    return out


def _best_fit_distribution(values: list[float]) -> str | None:
    try:
        from scipy import stats
    except ImportError:
        return None
    import numpy as np

    arr = np.asarray(values, dtype=float)
    if arr.size < 10:
        return None
    best, best_ll = None, -float("inf")
    for name in ("norm", "uniform", "expon", "logistic", "lognorm", "gamma"):
        dist = getattr(stats, name)
        try:
            params = dist.fit(arr)
            ll = float(np.sum(dist.logpdf(arr, *params)))
        except Exception:
            continue
        if ll > best_ll:
            best, best_ll = name, ll
    return best
