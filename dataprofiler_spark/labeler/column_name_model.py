"""Column-name labeler — fuzzy match on column NAMES, not data.

Reference: labelers/column_name_model.py:27-310 (rapidfuzz similarity of
column names against per-label keyword lists, with include/exclude rules
and a confidence threshold). Driver-side only (operates on the schema) —
no Spark jobs at all. rapidfuzz is unavailable here; difflib's ratio is
the stdlib equivalent scorer.
"""

from __future__ import annotations

from difflib import SequenceMatcher

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


def _score(a: str, b: str) -> float:
    a, b = a.lower(), b.lower()
    if b in a or a in b:
        return 1.0
    return SequenceMatcher(None, a, b).ratio()


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
