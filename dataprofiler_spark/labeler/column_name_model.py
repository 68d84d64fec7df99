"""Column-name labeler — fuzzy match on column NAMES, not data.

Reference: labelers/column_name_model.py:27-310 (rapidfuzz similarity of
column names against per-label keyword lists, with include/exclude rules
and a confidence threshold). Driver-side only (operates on the schema) —
no Spark jobs at all. rapidfuzz is unavailable here, so its ``fuzz.ratio``
is re-derived from first principles: ratio = normalized InDel similarity
= 2·LCS(a, b) / (len(a) + len(b)) — the exact formula rapidfuzz computes
(scaled 0-100 there, 0-1 here). difflib's SequenceMatcher is NOT
equivalent (its junk heuristics and longest-match recursion give
different mid-range scores), so a small LCS DP is used instead.
"""

from __future__ import annotations

LABEL_KEYWORDS: dict[str, tuple[str, ...]] = {
    "ADDRESS": ("address", "addr", "street", "city", "zip", "postal"),
    "EMAIL_ADDRESS": ("email", "e_mail", "mail"),
    "PHONE_NUMBER": ("phone", "tel", "mobile", "fax"),
    "PERSON": ("name", "first_name", "last_name", "fullname"),
    "SSN": ("ssn", "social_security"),
    "CREDIT_CARD": ("credit_card", "card_number", "cc_num"),
    "DATE": ("date", "dob", "birth", "day"),
    "DATETIME": ("timestamp", "datetime", "created_at", "updated_at", "ts"),
    "INTEGER": ("id", "key", "count", "num", "qty", "quantity"),
    "FLOAT": ("price", "amount", "balance", "total", "rate", "discount", "tax"),
    "URL": ("url", "link", "website"),
    "US_STATE": ("state", "province"),
}

DEFAULT_THRESHOLD = 0.55


def _lcs_len(a: str, b: str) -> int:
    """Longest common subsequence length — one-row DP, O(len(a)·len(b))
    (column names are short)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb
                       else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def _score(a: str, b: str) -> float:
    a, b = a.lower(), b.lower()
    if b in a or a in b:
        return 1.0
    tot = len(a) + len(b)
    return (2.0 * _lcs_len(a, b) / tot) if tot else 1.0


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz.fuzz.token_sort_ratio with the reference's lowercase
    processor (column_name_model.py:147-149 ``_make_lower_case``,
    applied at :158-163 and :243-249): lowercase, split on whitespace,
    sort tokens, join with single spaces, then the normalized InDel
    similarity × 100 — ratio = 100·2·LCS/(len(a)+len(b)). Exact
    arithmetic parity with rapidfuzz (its scorer is the Indel distance
    |a|+|b|−2·LCS normalized over |a|+|b|), so the reference's 50/85
    threshold configs transfer unchanged."""
    a = " ".join(sorted(a.lower().split()))
    b = " ".join(sorted(b.lower().split()))
    tot = len(a) + len(b)
    if not tot:
        return 100.0
    return 200.0 * _lcs_len(a, b) / tot


class ColumnNameModel:
    """Reference-parity ColumnNameModel (labelers/column_name_model.py:
    27-310): fuzzy-match column NAMES against a true-positive attribute
    list (and optionally filter names that resemble a false-positive
    list first). Driver-side only — operates on schema strings, no
    Spark jobs. Scores are 0-100 token_sort_ratio values, so the
    reference's serialized parameter dicts load unchanged.

    Parameters mirror the reference: ``true_positive_dict`` (list of
    {"attribute", "label"}), ``false_positive_dict`` (list of
    {"attribute", ...} or None), ``negative_threshold_config``,
    ``positive_threshold_config``, ``include_label``.
    """

    def __init__(self, label_mapping: dict[str, int],
                 parameters: dict | None = None):
        p = dict(parameters or {})
        p.setdefault("false_positive_dict", None)
        p.setdefault("true_positive_dict", None)
        p.setdefault("include_label", True)
        p.setdefault("negative_threshold_config", None)
        p.setdefault("positive_threshold_config", None)
        tp = p["true_positive_dict"]
        if not tp or not isinstance(tp, list) or \
                not all(isinstance(d, dict) and "attribute" in d
                        and "label" in d for d in tp):
            raise ValueError(
                "`true_positive_dict` is a required parameter: a list of "
                "dicts with 'attribute' and 'label' keys")
        if label_mapping and \
                {d["label"] for d in tp} > set(label_mapping):
            raise ValueError("`true_positive_dict` labels must be a "
                             "subset of label_mapping")
        if p["positive_threshold_config"] is None or \
                not isinstance(p["positive_threshold_config"], (int, float)):
            raise ValueError("`positive_threshold_config` is required")
        if p["false_positive_dict"] is not None and \
                p["negative_threshold_config"] is None:
            raise ValueError("`negative_threshold_config` is required "
                             "with a false_positive_dict")
        self.label_mapping = dict(label_mapping or {})
        self._parameters = p

    @staticmethod
    def _scores(names: list[str], check: list[dict]) -> list[tuple]:
        """[(max_score, argmax_index)] per name — the reference's
        ``_model`` (cdist max + argmax, :185-210)."""
        attrs = [d["attribute"] for d in check]
        out = []
        for n in names:
            best, best_i = -1.0, 0
            for i, a in enumerate(attrs):
                s = token_sort_ratio(n, a)
                if s > best:
                    best, best_i = s, i
            out.append((best, best_i))
        return out

    def predict(self, data: list[str]) -> dict:
        """{"pred": [...], "conf": [...]} over the names that survive
        the negative filter and clear the positive threshold —
        reference ``predict`` (:211-281)."""
        p = self._parameters
        names = list(data)
        if p["false_positive_dict"]:
            neg = self._scores(names, p["false_positive_dict"])
            names = [n for n, (s, _) in zip(names, neg)
                     if s < p["negative_threshold_config"]]
        pos = self._scores(names, p["true_positive_dict"])
        preds, confs = [], []
        for (s, i) in pos:
            if s > p["positive_threshold_config"]:
                preds.append(p["true_positive_dict"][i]["label"])
                confs.append(s)
        out = {"pred": preds}
        if confs or preds:
            out["conf"] = confs
        return out


def label_columns_by_name(columns: list[str],
                          threshold: float = DEFAULT_THRESHOLD
                          ) -> dict[str, tuple[str, float]]:
    """column → (label, confidence); 'UNKNOWN' below threshold.
    Deterministic tie-break: higher score, then label name."""
    out = {}
    for col in columns:
        # ignore table prefixes like "l_", "o_", "c_"
        base = col.split("_", 1)[1] if "_" in col and len(col.split("_", 1)[0]) <= 2 \
            else col
        best_label, best_score = "UNKNOWN", 0.0
        for label in sorted(LABEL_KEYWORDS):
            for kw in LABEL_KEYWORDS[label]:
                s = _score(base, kw)
                if s > best_score:
                    best_label, best_score = label, s
        if best_score < threshold:
            best_label = "UNKNOWN"
        out[col] = (best_label, round(best_score, 4))
    return out
