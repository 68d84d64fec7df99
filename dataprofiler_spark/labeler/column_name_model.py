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
