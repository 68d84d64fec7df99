"""Char-span NER over free text — the CNN-backed unstructured labeler.

Reference surface: ``DataLabeler.predict`` on unstructured text returns
char/word-level entity spans through CharPostprocessor
(labelers/data_processing.py:884-1311 — word-level argmax :1030-1126,
NER conversion :1128-1193) and the unstructured labeler profile
aggregates them into entity counts
(profilers/unstructured_labeler_profile.py:262-330; it calls predict
with use_word_level_argmax=True, output_format="NER", :173).

Re-expressed Spark-first: the char forward pass + span postprocess run
per text blob inside an Arrow-batched ``mapInPandas`` (the same adapter
shape as labeler/cnn_adapter.py — weights load once per python worker),
emitting one row per span; all aggregation (entity counts, char-level
accounting) is ordinary DataFrame groupBy on the span rows, so a 100 TB
corpus labels map-side and shuffles only (entity, count) partials.

Semantics (re-implemented, not translated):

* span = maximal run of one non-PAD/non-default char label; [start, end)
  character offsets into the text (reference convert_to_NER_format).
* optional word-level argmax first: each separator-delimited word is
  relabeled to its dominant char label when that label covers >=
  ``word_level_min_percent`` of the word's chars with at least 2 chars
  (reference _word_level_argmax; its separator back-propagation quirk —
  relabeling the preceding separator on label changes — is NOT
  reproduced: it can only widen a span by one separator char and is
  acknowledged in the reference as background handling, documented
  deviation).
* texts longer than the model's max_length are labeled in consecutive
  max_length windows whose char labels are concatenated before span
  merging (the reference's is_separate_at_max_len=True splits the same
  way, data_processing.py CharPreprocessor; unlike the reference, a
  span crossing the window boundary merges back together here since
  the merge runs over the full concatenated label sequence).

When the trained weights are unreadable the regex stand-in produces
spans from pattern matches (same output contract).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEPARATORS = (" ", ",", ";", "'", '"', ":", "\n", "\t", ".")
WORD_LEVEL_MIN_PERCENT = 0.75

SPAN_SCHEMA = ("id long, start int, end int, entity string, "
               "token string")

# env var first; the reference-checkout fallback is dev-sandbox-only
# (skipped when the checkout is absent — see np_cnn.DEFAULT_MODEL_PATHS)
UNSTRUCTURED_MODEL_PATHS = tuple(p for p in (
    os.environ.get("DATAPROFILER_SPARK_CNN_UNSTRUCTURED_WEIGHTS", ""),
    "/root/reference/resources/labelers/unstructured_model/model.keras",
) if not p.startswith("/root/reference/") or os.path.exists(p))


@lru_cache(maxsize=1)
def load_unstructured_model():
    """The reference's trained *unstructured* char CNN (same architecture
    as the structured one — 4×Conv1D(48,k=13)+BN, 2×Dense(96), 24
    labels — different weights); falls back to the structured weights,
    then to None (regex stand-in)."""
    from dataprofiler_spark.labeler.np_cnn import (NumpyCharCNN,
                                                   load_default_model)

    for path in UNSTRUCTURED_MODEL_PATHS:
        if path and os.path.exists(path):
            try:
                return NumpyCharCNN.from_keras_zip(path)
            except Exception:
                continue
    return load_default_model()


def word_level_relabel(text: str, labels: list[int], default_ind: int,
                       separators: tuple[str, ...] = SEPARATORS,
                       min_percent: float = WORD_LEVEL_MIN_PERCENT
                       ) -> list[int]:
    """Relabel each separator-delimited word to its dominant char label
    (dominant = covers >= min_percent of the word's non-separator chars
    AND at least 2 chars; otherwise the word goes to the default
    label). Separator chars keep their own labels."""
    out = list(labels)
    seps = set(separators)
    n = len(text)
    i = 0
    while i < n:
        if text[i] in seps:
            i += 1
            continue
        j = i
        counts: dict[int, int] = {}
        while j < n and text[j] not in seps:
            if j < len(labels):
                counts[labels[j]] = counts.get(labels[j], 0) + 1
            j += 1
        total = sum(counts.values())
        dominant, dom_count = default_ind, 1
        for lab, c in counts.items():
            if total and c / total >= min_percent and c > dom_count:
                dominant, dom_count = lab, c
        for p in range(i, min(j, len(labels))):
            out[p] = dominant
        i = j
    return out


def char_spans(labels: list[int], pad_ind: int, default_ind: int
               ) -> list[tuple[int, int, int]]:
    """Maximal runs of one non-PAD/non-default label →
    [(start, end, label_ind)] with [start, end) offsets."""
    spans: list[tuple[int, int, int]] = []
    start = -1
    for i, lab in enumerate(labels):
        if start != -1 and lab != labels[start]:
            spans.append((start, i, labels[start]))
            start = -1
        if start == -1 and lab not in (pad_ind, default_ind):
            start = i
    if start != -1:
        spans.append((start, len(labels), labels[start]))
    return spans


def _regex_spans(text: str) -> list[tuple[int, int, str]]:
    """Regex stand-in: pattern matches as spans (first pattern wins on
    overlap, scanning in LABEL_PATTERNS order)."""
    import re

    from dataprofiler_spark.labeler.regex_labeler import LABEL_PATTERNS

    taken: list[tuple[int, int]] = []
    spans: list[tuple[int, int, str]] = []
    for lbl, pat in LABEL_PATTERNS.items():
        rx = re.compile(pat.lstrip("^").rstrip("$"))
        for m in rx.finditer(text):
            s, e = m.start(), m.end()
            if s == e or any(s < te and e > ts for ts, te in taken):
                continue
            taken.append((s, e))
            spans.append((s, e, lbl))
    return sorted(spans)


def text_spans(texts: list[str], use_word_level_argmax: bool = True
               ) -> list[list[tuple[int, int, str]]]:
    """Driver/worker-side span extraction for a list of texts:
    [(start, end, entity_label), ...] per text."""
    model = load_unstructured_model()
    if model is None:
        return [_regex_spans(str(t)) for t in texts]
    str_texts = [str(t) for t in texts]
    # window long texts at max_length and stitch the char labels back:
    # the flattened batch keeps windows adjacent so per-window results
    # reassemble by simple slicing.
    L = model.max_length
    windows: list[str] = []
    counts: list[int] = []
    for t in str_texts:
        parts = [t[i:i + L] for i in range(0, len(t), L)] or [""]
        windows.extend(parts)
        counts.append(len(parts))
    win_labels = model.predict_char_labels(windows)
    char_labels: list[list[int]] = []
    pos = 0
    for c in counts:
        stitched: list[int] = []
        for part in win_labels[pos:pos + c]:
            stitched.extend(part)
        char_labels.append(stitched)
        pos += c
    out = []
    for text, labels in zip(str_texts, char_labels):
        if use_word_level_argmax:
            labels = word_level_relabel(text, labels, model.default_ind)
        out.append([(s, e, model.inv_labels[lab])
                    for s, e, lab in char_spans(labels, model.pad_ind,
                                                model.default_ind)])
    return out


def predict_text_spans(df: DataFrame, id_col: str, text_col: str,
                       use_word_level_argmax: bool = True,
                       max_sample: int | None = None) -> DataFrame:
    """(id, start, end, entity, token) — one row per entity span found
    in each document's text. ``mapInPandas``: per-batch CNN inference,
    no driver traffic; spans explode worker-side so the output shuffle
    carries only span rows."""
    import pandas as pd

    from dataprofiler_spark.session import ensure_parallelism

    src = df.select(F.col(id_col).cast("long").alias("id"),
                    F.col(text_col).cast("string").alias("text"))
    if max_sample is not None:
        src = src.where(F.col("id") <= max_sample)
    src = src.where(F.col("text").isNotNull())
    # CNN inference is compute-bound per row — one small parquet split
    # must not serialize the whole batch onto a single python worker
    src = ensure_parallelism(src)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = list(pdf["text"])
            all_spans = text_spans(texts, use_word_level_argmax)
            ids, starts, ends, ents, toks = [], [], [], [], []
            for rid, text, spans in zip(pdf["id"], texts, all_spans):
                for s, e, lbl in spans:
                    ids.append(rid)
                    starts.append(s)
                    ends.append(e)
                    ents.append(lbl)
                    toks.append(text[s:e])
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "start": pd.Series(starts, dtype="int32"),
                                "end": pd.Series(ends, dtype="int32"),
                                "entity": ents, "token": toks})

    return src.mapInPandas(infer, schema=SPAN_SCHEMA)


REDACT_SCHEMA = "id long, redacted string, n_redactions int"


def redact_text_spans(df: DataFrame, id_col: str, text_col: str,
                      entities: list[str] | None = None,
                      use_word_level_argmax: bool = True) -> DataFrame:
    """(id, redacted, n_redactions): every CNN-detected entity span is
    replaced with ``[LABEL]`` — model-backed PII scrubbing for free
    text, complementing the regex ``curation.pii_redact`` (which only
    sees pattern-expressible entities; the CNN also catches learned
    classes like ADDRESS/PERSON). ``entities`` restricts which labels
    are scrubbed (default: all non-background spans). Single
    ``mapInPandas`` pass — spans never leave the worker."""
    import pandas as pd

    from dataprofiler_spark.session import ensure_parallelism

    keep = set(entities) if entities is not None else None
    src = ensure_parallelism(
        df.select(F.col(id_col).cast("long").alias("id"),
                  F.col(text_col).cast("string").alias("text"))
        .where(F.col("text").isNotNull()))

    def scrub(batches):
        for pdf in batches:
            texts = list(pdf["text"])
            all_spans = text_spans(texts, use_word_level_argmax)
            reds, counts = [], []
            for text, spans in zip(texts, all_spans):
                n = 0
                # replace right-to-left so earlier offsets stay valid
                for s, e, lbl in sorted(spans, reverse=True):
                    if keep is not None and lbl not in keep:
                        continue
                    text = text[:s] + f"[{lbl}]" + text[e:]
                    n += 1
                reds.append(text)
                counts.append(n)
            yield pd.DataFrame({
                "id": pdf["id"].astype("int64"),
                "redacted": reds,
                "n_redactions": pd.Series(counts, dtype="int32")})

    return src.mapInPandas(scrub, schema=REDACT_SCHEMA)


def entity_span_counts(spans: DataFrame) -> DataFrame:
    """(entity, n_spans, n_chars) — the span-level half of the
    reference's entity_counts dict (word_level ≈ spans after word-level
    argmax; postprocess_char_level = n_chars). Plain groupBy — partial
    aggregation map-side."""
    return (spans.groupBy("entity")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum(F.col("end") - F.col("start")).alias("n_chars"))
            .orderBy("entity"))
