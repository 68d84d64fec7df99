"""Driver-facing query registry (pure wiring).

Every implemented operator from SURVEY.md §2 registers as a
(spark_callable, oracle_sql) pair in one of the family modules below;
``__spark_entry__.py`` re-exports the registry. Oracle SQL is
DuckDB-dialect ANSI SQL computing the same result with the same column
names; numeric formulations are chosen so double-precision results are
bit-identical across engines (see operators/numeric.py docstring).

This package holds NO query logic: ``_registry`` owns the dicts and the
``T`` loader, each ``q_*`` family module owns its registrations (living
next to the operators they wrap), and this file fixes the import order
and the driver window. Import order mirrors the original single-file
registry so registration order (and therefore everything past the
explicit 50-slot window) is unchanged.
"""

from __future__ import annotations

from dataprofiler_spark.queries._registry import (ORACLE_SQL,  # noqa: F401
                                                  SPARK_QUERIES, T, register)

# family modules: imported for their @register side effects, in the
# original registration order
from dataprofiler_spark.queries import q_profile_stats  # noqa: E402,F401
from dataprofiler_spark.queries import q_dedup  # noqa: E402,F401
from dataprofiler_spark.queries import q_embeddings  # noqa: E402,F401
from dataprofiler_spark.queries import q_textanalysis  # noqa: E402,F401
from dataprofiler_spark.queries import q_drift_types  # noqa: E402,F401
from dataprofiler_spark.queries import q_flagship  # noqa: E402,F401
from dataprofiler_spark.queries import q_labeling  # noqa: E402,F401
from dataprofiler_spark.queries import q_validation  # noqa: E402,F401
from dataprofiler_spark.queries import q_cnn  # noqa: E402,F401
from dataprofiler_spark.queries import q_events  # noqa: E402,F401
from dataprofiler_spark.queries import q_curation  # noqa: E402,F401
from dataprofiler_spark.queries import q_reports  # noqa: E402,F401
from dataprofiler_spark.queries import q_round7  # noqa: E402,F401

# names test/bench consumers import from this package
from dataprofiler_spark.queries.q_textanalysis import _DOC_URL_EXPR  # noqa: E402,F401
from dataprofiler_spark.queries.q_cnn import _cnn_vote_counts  # noqa: E402,F401
from dataprofiler_spark.queries.q_events import (_ner_redact_rows,  # noqa: E402,F401
                                                 _ner_span_counts)
from dataprofiler_spark.queries.q_labeling import _trained_labeler_votes  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registry ordering. The driver oracle-checks the FIRST 50 entries in
# insertion order — treat those slots as the scarce resource they are
# (VERDICT r2): every SURVEY §2 / LLM-pipeline family gets a
# representative inside the window, never-driver-checked operators are
# promoted over near-duplicate siblings, and every entry in the window
# has an oracle (no structural no_oracle rows). Everything past slot 50
# stays registered and is hash-checked by tests/test_oracle_parity.py.
# ---------------------------------------------------------------------------

# Round-10 rotation (VERDICT r9 item 1: drain the SLA-due r6 cohort):
# (a) ALL 35 rows whose latest driver check is r6 — the freshness-SLA
# test (tests/test_oracle_parity.py) derives this set from the
# cumulative CORRECTNESS_r0*.json history and was RED on the r9
# hand-over tree until this rotation; after this window lands green,
# no oracled row's evidence predates r7. (b) new r10 queries, never
# driver-checked. (c) the flagship end-to-end re-check (every round).
# (d) remaining slots: a cross-family spread of the next-due cohort
# (r7, 46 rows due at r11) so the r11 window doesn't have to absorb
# all 46 at once.
_DRIVER_WINDOW = [
    # ---- (a) the full r6-stale cohort: 35 ----
    "active_users_events",
    "bigram_logprob_documents",
    "bm25_topk_documents",
    "bpe_token_summary_documents",
    "canonical_sample_documents",
    "chunk_summary_documents",
    "cohens_kappa_lineitem",
    "collocations_pmi_documents",
    "cross_source_dup_matrix_documents",
    "crossdoc_ngram_dup_documents",
    "crosstab_lineitem",
    "data_mixture_documents",
    "decontaminate_documents",
    "domain_rollup_documents",
    "embedding_shift_embeddings",
    "entity_counts_events_props",
    "funnel_events",
    "funnel_gap_events",
    "hash_sample_orders",
    "hybrid_rrf_topk_documents",
    "interval_join_events",
    "ivf_pq_residual_topk_embeddings",
    "json_props_events",
    "markup_signals_documents",
    "numeric_profile_by_returnflag",
    "query_cosine_topk_documents",
    "repetition_signals_documents",
    "rollup_events_type_day",
    "spearman_lineitem",
    "split_manifest_documents",
    "substring_dup_documents",
    "tfidf_top_terms_documents",
    "topk_events_per_user",
    "winnow_fingerprints_documents",
    "zipf_vocab_documents",
    # ---- (b) new r10 queries (swapped in as they land; r7 fillers
    # hold the slots so the window stays exactly 50 and all-oracled) ----
    "nullspec_per_column_customer",   # per-column null-value overrides
    "imported_profile_diff_lineitem",  # reference-format profile import
    "minhash_lsh_autocap_documents",   # auto-cap LSH (suggested cap)
    "ann_index_pq_query_embeddings",   # persisted IVF-PQ serving path
    "semantic_dedup_embeddings",       # SemDeDup (new r10 operator)
    # ---- (c) flagship end-to-end re-check (every round) ----
    "full_profile_lineitem",
    # ---- (d) next-due cohort (r7), cross-family spread: 9 ----
    "benford_lineitem",
    "cnn_labeler_customer",
    "corpus_semantic_curation_documents",  # composed funnel (new r10)
    "graph_components_nation",
    "grouped_quantiles_lineitem",
    "kmeans_assign_embeddings",
    "language_id_documents",
    "media_profile_documents",
    "skew_join_lineitem_orders",
]


def _apply_driver_window() -> None:
    # Self-healing, never fatal: an ImportError here would turn EVERY
    # driver row red. Unknown names are ignored; a window entry that
    # lost its oracle (e.g. a missing golden fixture) is demoted past
    # the window instead of occupying a slot it would fail in.
    # tests/test_oracle_parity.py::test_driver_window_all_oracled keeps
    # the strict check where failure is cheap.
    window = [n for n in _DRIVER_WINDOW
              if n in SPARK_QUERIES and n in ORACLE_SQL]
    ordered = window + [n for n in SPARK_QUERIES if n not in set(window)]
    for d in (SPARK_QUERIES, ORACLE_SQL):
        items = [(n, d[n]) for n in ordered if n in d]
        d.clear()
        d.update(items)


_apply_driver_window()

