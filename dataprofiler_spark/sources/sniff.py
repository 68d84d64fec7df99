"""Format sniffing → spark.read dispatch.

Reference: the Data() factory probes JSON → Graph → CSV → Parquet → AVRO →
Text in order (data_readers/data.py:18-87, per-format is_match methods);
CSV delimiter/quotechar/header guessing at csv_data.py:184-542; encoding
detection at data_utils.py:590-678.

Spark design: sniffing is driver-side over the file HEAD ONLY (bounded
bytes — never the whole file; a 100 TB input is dispatched after reading
a few KiB), then the matching ``spark.read`` builds a lazy scan. Options
discovered during sniffing (delimiter, header, encoding) are written into
the reader options, mirroring the reference's write-back behavior
(csv_data.py:737-739).
"""

from __future__ import annotations

import json
import os
from collections import Counter
from dataclasses import dataclass, field

HEAD_BYTES = 64 * 1024
CANDIDATE_DELIMS = [",", "\t", ";", "|"]  # space splits prose — not a candidate


@dataclass
class SniffResult:
    format: str          # parquet | orc | avro | json | csv | graph_csv | text
    options: dict = field(default_factory=dict)


def _read_head(path: str, n: int = HEAD_BYTES) -> bytes:
    with open(path, "rb") as f:
        return f.read(n)


def detect_encoding(head: bytes) -> str:
    """Deterministic encoding sniff (reference data_utils.py:590-678
    runs chardet's UniversalDetector + charset_normalizer; this
    re-derives the decisive signals as explicit rules so the result is
    reproducible): BOMs, NUL-cadence UTF-16/32 without a BOM, UTF-8
    validation, script-validated east-asian codepages (kana → Shift-JIS
    / EUC-JP, hangul syllables → EUC-KR, CJK tally → Big5),
    lowercase-dominant cyrillic → KOI8-R, cp1252 punctuation in the
    latin1 C1 control range, latin1 fallback."""
    # UTF-32 BOMs first: the UTF-32 LE BOM ff fe 00 00 starts with the
    # UTF-16 LE BOM ff fe, so the longer prefix must win (ADVICE r1).
    if head.startswith(b"\xff\xfe\x00\x00") or head.startswith(b"\x00\x00\xfe\xff"):
        return "UTF-32"
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        return "UTF-16"
    if head.startswith(b"\xef\xbb\xbf"):
        return "UTF-8"
    # BOM-less UTF-32/16: mostly-Latin text has a fixed NUL cadence
    # (3-of-4, or every other byte). Explicit LE/BE names — the plain
    # "UTF-16"/"UTF-32" codecs expect the BOM these files lack.
    if len(head) >= 16:
        n4 = len(head) - len(head) % 4
        quads = [head[i:i + 4] for i in range(0, n4, 4)]
        if sum(q[1:4] == b"\x00\x00\x00" for q in quads) / len(quads) > 0.7:
            return "UTF-32LE"
        if sum(q[0:3] == b"\x00\x00\x00" for q in quads) / len(quads) > 0.7:
            return "UTF-32BE"
        n2 = len(head) - len(head) % 2
        odd_nul = sum(head[i + 1] == 0 for i in range(0, n2, 2))
        even_nul = sum(head[i] == 0 for i in range(0, n2, 2))
        if odd_nul / (n2 // 2) > 0.7 and even_nul / (n2 // 2) < 0.2:
            return "UTF-16LE"
        if even_nul / (n2 // 2) > 0.7 and odd_nul / (n2 // 2) < 0.2:
            return "UTF-16BE"
    # ISO-2022-JP/KR announce themselves with ESC designation sequences
    # (chardet's escprober, reference data_utils.py:590-678) — fully
    # deterministic: the escape bytes never appear in plain text. Check
    # before the UTF-8 pass: ISO-2022 bodies are pure 7-bit ASCII, so
    # strict utf-8 "succeeds" on them and would mislabel.
    # Both branches require a strict decode, not just byte containment:
    # a binary file happening to contain the 4-byte designation run
    # must not be labeled ISO-2022 (ADVICE r11 — the KR branch used to
    # skip the validation the JP branch had).
    if b"\x1b$)C" in head and _decodes(head, "iso2022_kr"):
        return "ISO-2022-KR"
    if (b"\x1b$B" in head or b"\x1b$@" in head) and _decodes(
            head, "iso2022_jp"):
        return "ISO-2022-JP"
    if _decodes(head, "utf-8"):
        return "UTF-8"
    # East-Asian multibyte before the codepage fallbacks: require (a) a
    # real high-byte density (CJK text heads are >20% high bytes;
    # accented latin text is a few %), (b) the STRICT decode to succeed
    # over the whole head (one isolated latin accent before a space
    # breaks both decoders — the structural guard against latin
    # misfires), and (c) script evidence: kana is Shift-JIS-specific;
    # Big5 carries no kana, so CJK count decides.
    n_high = sum(b >= 0x80 for b in head)
    high_frac = n_high / max(len(head), 1)
    if high_frac > 0.05:
        sjis = _decoded_or_none(head, "shift_jis")
        big5 = _decoded_or_none(head, "big5")
        eucjp = _decoded_or_none(head, "euc_jp")
        euckr = _decoded_or_none(head, "euc_kr")

        def _count(txt, lo, hi):
            return 0 if txt is None else sum(lo <= ord(c) <= hi
                                             for c in txt)

        # script evidence per candidate decode. Order matters:
        # hangul SYLLABLES (0xAC00+) are EUC-KR-specific and must win
        # before the CJK tally — Korean bytes mis-decoded as EUC-JP
        # land on random kanji, so a cjk-first rule would misfire.
        # EUC-JP text can't fake syllables: its kana rows decode in
        # EUC-KR to compatibility JAMO (0x3131+), not syllables.
        hangul = _count(euckr, 0xAC00, 0xD7A3)
        kana_s = _count(sjis, 0x3040, 0x30FF)
        kana_e = _count(eucjp, 0x3040, 0x30FF)
        cjk_s = _count(sjis, 0x4E00, 0x9FFF)
        cjk_b = _count(big5, 0x4E00, 0x9FFF)
        cjk_e = _count(eucjp, 0x4E00, 0x9FFF)
        if hangul >= 3 and hangul >= max(kana_s, kana_e):
            return "EUC-KR"
        # kana decides Japanese; the encoding is whichever decode
        # yields MORE of it (the wrong one mangles kana into kanji)
        if kana_e >= 3 and kana_e > kana_s:
            return "EUC-JP"
        if kana_s >= 3:
            return "SHIFT_JIS"
        if max(cjk_s, cjk_b, cjk_e) >= 3:
            # all-kanji heads (no kana): most CJK hits wins
            if cjk_e > max(cjk_s, cjk_b):
                return "EUC-JP"
            # ties → Big5: Shift-JIS text without ANY kana is rare
            return "SHIFT_JIS" if cjk_s > cjk_b else "BIG5"
        # KOI8-R (reference data_utils.py:590-678 via chardet's
        # cyrillic prober): every byte maps, so the decode test is
        # vacuous — the evidence is that nearly all high bytes land on
        # cyrillic LETTERS and, decisively, that running text is
        # lowercase-dominant. KOI8-R puts lowercase а-я at 0xC0–0xDF
        # (uppercase above); cp1251/latin texts read as koi8_r come
        # out uppercase-heavy and fall through.
        koi = head.decode("koi8_r")
        cyr = [c for c in koi if 0x0400 <= ord(c) <= 0x04FF]
        if n_high and len(cyr) / n_high > 0.8:
            lower = sum(0x0430 <= ord(c) <= 0x044F for c in cyr)
            if lower / len(cyr) > 0.6:
                return "KOI8-R"
    # cp1252 vs latin1: 0x80–0x9F are C1 CONTROL characters in latin1 —
    # never intentional in tabular text — but printable punctuation in
    # cp1252 (€ ‘ ’ “ ” – — … ™). Any such byte means cp1252.
    if any(0x80 <= b <= 0x9F for b in head):
        return "WINDOWS-1252"
    return "ISO-8859-1"


def _decodes(head: bytes, codec: str) -> bool:
    return _decoded_or_none(head, codec) is not None


def _decoded_or_none(head: bytes, codec: str):
    """Strict decode tolerant of the sniff head cutting a multi-byte
    sequence at the END of the buffer (not a real decode error)."""
    try:
        return head.decode(codec)
    except UnicodeDecodeError as e:
        if e.start >= len(head) - 4 and e.reason.startswith(
                ("unexpected end of data", "truncated")):
            try:
                return head[:e.start].decode(codec)
            except UnicodeDecodeError:
                return None
        return None


def is_parquet(head: bytes) -> bool:
    return head[:4] == b"PAR1"


def is_orc(head: bytes) -> bool:
    # ORC files open with the 3-byte magic "ORC" (ORC spec, postscript
    # magic mirrored at file start). Beyond the reference's format set —
    # native in Spark, so the engine reads it for free.
    return head[:3] == b"ORC"


def is_avro(head: bytes) -> bool:
    return head[:4] == b"Obj\x01"


def is_json_lines(lines: list[str]) -> bool:
    """≥50% of nonempty probe lines parse individually as json
    CONTAINERS (dict/list) — the one-record-per-line shape Spark's
    default json scan reads. Bare scalars don't count: a single-column
    CSV of integers ('NUM', 123, 234, ...) is valid JSON line-by-line
    but is tabular data (reference json_data.py requires record
    shapes; its small-num.csv fixture is ground truth)."""
    ok = 0
    for ln in lines:
        ln = ln.strip()
        if not ln:
            continue
        try:
            if isinstance(json.loads(ln), (dict, list)):
                ok += 1
        except json.JSONDecodeError:
            pass
    nonempty = sum(1 for ln in lines if ln.strip())
    return nonempty > 0 and ok / nonempty >= 0.5


def is_json(lines: list[str]) -> bool:
    """≥50% of probe lines parse as JSON containers, or the head parses
    whole to a container (json_data.py:368-423)."""
    if not lines:
        return False
    joined = "\n".join(lines)
    try:
        if isinstance(json.loads(joined), (dict, list)):
            return True
    except json.JSONDecodeError:
        pass
    return is_json_lines(lines)


def looks_like_json_document(text: str) -> bool:
    """Pretty-printed JSON DOCUMENT whose head sample may be TRUNCATED
    mid-document (so neither the joined head nor single lines parse):
    first non-whitespace char is a JSON opener and the head is
    string-key shaped. Without this, a pretty document with trailing
    commas on every line sniffs as single-column CSV (math.json did)."""
    stripped = text.lstrip()
    if not stripped or stripped[0] not in "{[":
        return False
    # The opener must stand ALONE on the first line (pretty-printers
    # always emit it that way) — a timestamped log line like
    # '[2024-01-01 12:00] msg="x"' also starts with '[' and contains
    # quotes/colons, and misreading it as JSON would feed the profile a
    # _corrupt_record column. Single-line documents parse whole and
    # never reach this fallback.
    first_line = stripped.splitlines()[0].strip()
    if first_line not in ("{", "["):
        return False
    probe = stripped[:4000]
    return '"' in probe and ":" in probe


def _strip_quoted(ln: str) -> str:
    """Remove quoted spans so embedded delimiters don't skew counts
    (the reference counts delimiters outside quotes, csv_data.py:184-346)."""
    import re
    return re.sub(r"'[^']*'", "", re.sub(r'"[^"]*"', "", ln))


_EXTRA_DELIM_CHARS = set("@#~^&")  # csv_data.py:184-346 tries the
# top-frequency vocab chars as candidates; we admit only the
# punctuation subset that cannot collide with common in-band syntax:
# ':' splits timestamps, '=' splits key=value logs, '/' dates and
# paths, '%'/'+'/'*' arithmetic, '-'/'.' numbers, '_' identifiers,
# ' ' prose. Files delimited by those dispatch to the unstructured
# text profiler instead (documented divergence from the reference's
# anything-goes vocab scan, which relies on cell-type safety checks).


def guess_delimiter(lines: list[str]) -> str | None:
    """Most consistent per-line count wins (csv_data.py:184-346
    simplified: consistency beats raw frequency). Candidates are the
    preferred delimiters plus the sample's most frequent punctuation
    characters (the reference's ordered-vocab scan) — so an
    `@`-delimited sheet sniffs as CSV — with preferred delimiters
    weighted (reference: 5× count weight) so a consistent exotic char
    only wins when no preferred delimiter fits."""
    freq = Counter()
    for ln in lines:
        freq.update(ch for ch in _strip_quoted(ln)
                    if ch in _EXTRA_DELIM_CHARS)
    extras = [ch for ch, _ in freq.most_common(5)]
    best, best_score = None, 0.0
    for d in CANDIDATE_DELIMS + extras:
        counts = [_strip_quoted(ln).count(d) for ln in lines if ln]
        if not counts or max(counts) == 0:
            continue
        c = Counter(counts)
        mode_count, freq_n = c.most_common(1)[0]
        if mode_count == 0:
            continue
        consistency = freq_n / len(counts)
        if consistency < 0.75:
            continue
        score = consistency * (1 + min(mode_count, 5) / 10)
        if d in CANDIDATE_DELIMS:
            score *= 2.0
        if score > best_score:
            best, best_score = d, score
    return best


def guess_quotechar(lines: list[str], delim: str) -> str:
    """Quote character guess (csv_data.py:184-346 guesses quotechar with
    the delimiter): the candidate that actually wraps cells wins;
    double-quote is the default."""
    for q in ('"', "'"):
        wrapped = 0
        for ln in lines[:20]:
            for cell in ln.split(delim):
                cell = cell.strip()
                if len(cell) >= 2 and cell.startswith(q) and cell.endswith(q):
                    wrapped += 1
        if wrapped >= 2:
            return q
    return '"'


def _split_outside_quotes(line: str, delim: str, quote: str) -> list[str]:
    """Split on the delimiter only where an EVEN number of quotechars
    follows to end-of-line (the delimiter is outside any quoted span) —
    the reference's delimiter regex (data_utils.py get_delimiter_regex:
    712-740)."""
    import re
    q = re.escape(quote)
    pat = (re.escape(delim)
           + f"(?=(?:[^{q}]*{q}[^{q}]*{q})*[^{q}]*$)")
    return re.split(pat, line)


def _cell_type(cell: str) -> str:
    """Cell type for the header heuristic — mirrors the reference's
    detect_cell_type (data_utils.py:679-709): none for empty, date when
    dateutil accepts it, int/float override date, ALL-CAPS overrides
    everything ('upstr')."""
    if len(cell) == 0:
        return "none"
    t = "str"
    try:
        import dateutil.parser
        if dateutil.parser.parse(cell, fuzzy=False):
            t = "date"
    except Exception:
        pass
    try:
        t = "int" if float(cell).is_integer() else "float"
    except ValueError:
        pass
    if cell.isupper():
        t = "upstr"
    return t


def guess_header_row(lines: list[str], delim: str | None,
                     quote: str = '"', diff_thresh: float = 0.1,
                     none_thresh: float = 0.5,
                     str_thresh: float = 0.9) -> int | None:
    """Index of the LAST plausible header row, or None for headerless —
    reference semantics (csv_data.py:347-542 _guess_header_row): a
    header row is string-dominated (≥str_thresh of cells str/upstr/
    none), mostly non-empty (<none_thresh), type-consistent with the
    row above it (<diff_thresh differing cell types), and its
    non-empty width must be non-decreasing; the search stops at the
    first row whose types CHANGE from its predecessor (the first data
    row), and a file where no such change ever occurs has no header.
    For all-string tables a second pass keys on per-column word-count
    variance and the row where most columns first become non-empty.
    Handles a header at ANY index — title banners, author lines and
    stacked double headers all land above the detected row."""
    if not lines:
        return None
    d = delim or ","
    types = [[_cell_type(c.strip()) for c in
              _split_outside_quotes(row, d, quote)] for row in lines]
    only_strings = all(t in ("str", "none") for row in types for t in row)

    # per-row type-difference flags vs the previous row that had data
    prev = types[0]
    diffs: list[list[bool]] = []
    for row in types:
        n_val = len(row) - row.count("none")
        if n_val > len(prev) or n_val == 0:
            diffs.append([False] * len(row))   # wider or empty: skip
        else:
            diffs.append([j >= len(prev) or row[j] != prev[j]
                          for j in range(len(row))])
        if n_val > 0:
            prev = row

    header_at: int | None = None
    prior_width = 0
    changed = False
    for i, row in enumerate(types):
        if not row:
            continue
        none_ratio = row.count("none") / len(row)
        diff_ratio = diffs[i].count(True) / len(diffs[i])
        strish = (row.count("str") + row.count("upstr")
                  + row.count("none")) / len(row)
        n_val = len(row) - row.count("none")
        widening = False
        if n_val >= prior_width and n_val > 0:
            prior_width = n_val
            widening = True
        if strish > str_thresh and none_ratio < none_thresh \
                and diff_ratio < diff_thresh:
            if widening and not changed:
                header_at = i
        if diff_ratio > 0 and n_val > 0:
            changed = True
    if not changed:
        header_at = None

    if only_strings:
        # word-count variance pass (csv_data.py:487-539): columns whose
        # cell word counts vary by >1 mark a real table; the header is
        # the row where most columns first become non-empty
        col_stats: dict[int, dict] = {}
        for i, row in enumerate(lines):
            for j, cell in enumerate(
                    _split_outside_quotes(row, d, quote)):
                wc = len(cell.strip().split(" ")) if cell.strip() else 0
                st = col_stats.setdefault(j, {"max": wc, "min": wc})
                st["max"] = max(st["max"], wc)
                st["min"] = min(st["min"], wc)
                if "first" not in st and wc > 0:
                    st["first"] = i
        variance = [st["max"] - st["min"] > 1
                    for st in col_stats.values()]
        last_first, last_first_n = 0, 0
        for st in col_stats.values():
            if "first" in st:
                if st["first"] > last_first:
                    last_first, last_first_n = st["first"], 1
                elif st["first"] == last_first:
                    last_first_n += 1
        if variance.count(True) > 0 and \
                last_first_n > (len(variance) // 2):
            header_at = last_first

    # Repo extension beyond the reference heuristic (kept from r8): a
    # SHORT all-string table with no word-count variance ('name\tcity'
    # over two name rows) still has a header when the first row's cells
    # are distinct identifier-shaped names. Applies only when both
    # reference passes said None, needs >1 column, and requires every
    # probed row non-numeric — so it cannot fire on any numeric or
    # reference-matrix fixture (verified against the full has_header
    # matrix in tests/test_reference_fixtures.py).
    no_numeric = all(t in ("str", "upstr", "none")
                     for row in types for t in row)
    if header_at is None and no_numeric and len(types) >= 2 \
            and len(types[0]) > 1:
        import re
        cells = [c.strip().strip("\"'") for c in
                 _split_outside_quotes(lines[0], d, quote)]
        ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_ .-]*$")
        if len(set(cells)) == len(cells) \
                and all(c and ident.match(c) for c in cells):
            header_at = 0
    return header_at


def no_delim_table(lines: list[str], header: int | None,
                   quote: str = '"') -> bool:
    """Whether a file with NO consistent delimiter is still a
    single-column table (reference CSVData.is_match tail,
    csv_data.py:563-640): more than 3 non-empty data lines whose
    outside-quote SPACE counts are consistent — the modal count must
    cover all but 2^(digits(n)-1) lines. Short prose fails the line
    minimum; long prose fails consistency; uniform columns (names,
    ids, log lines) pass, matching the reference's dispatch of its
    names-col/sentence-4x fixtures to CSV."""
    body = lines[header:] if header is not None else lines
    counts: Counter = Counter()
    n_lines = n_empty = 0
    for ln in body:
        n_lines += 1
        if len(ln) <= 1:
            n_empty += 1
            continue
        counts[len(_split_outside_quotes(ln.rstrip(), " ", quote)) - 1] += 1
        if n_lines >= 1000:
            break
    active = n_lines - n_empty
    if active <= 3:
        return False
    max_dev = 2 ** (len(str(n_lines)) - 1)
    min_consistency = (active - max_dev) / active
    top = counts.most_common(1)[0][1]
    return top / sum(counts.values()) >= min_consistency


def looks_like_graph(header_cells: list[str]) -> bool:
    """Graph CSV detection by column-name keywords (graph_data.py:84-192)."""
    from dataprofiler_spark.operators.graph import detect_edge_columns
    return detect_edge_columns(header_cells) is not None


_EXT_FORMATS = {
    ".parquet": "parquet", ".orc": "orc", ".avro": "avro",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
    ".csv": "csv", ".tsv": "csv", ".txt": "text", ".log": "text",
}


def sniff_extension(path: str) -> SniffResult:
    """Extension-based dispatch for distributed URIs (s3a://, hdfs://,
    ...): their bytes live executor-side, so content sniffing would
    mean a driver-side remote read — exactly what those connectors
    exist to avoid. Unknown extensions raise with guidance instead of
    guessing."""
    import os as _os
    ext = _os.path.splitext(path.rstrip("/"))[1].lower()
    fmt = _EXT_FORMATS.get(ext)
    if fmt is None and ext == "":
        fmt = "parquet"  # directory datasets default to parquet
    if fmt is None:
        raise ValueError(
            f"cannot content-sniff distributed URI {path!r} and extension "
            f"{ext!r} is unknown; pass fmt= explicitly")
    opts: dict = {}
    if fmt == "csv":
        opts = {"sep": "\t" if ext == ".tsv" else ",", "header": True}
    return SniffResult(fmt, opts)


def sniff(path: str) -> SniffResult:
    from dataprofiler_spark.sources.url import (is_distributed_uri, is_url,
                                                url_to_local)
    if is_distributed_uri(path):
        return sniff_extension(path)
    if is_url(path):
        path = url_to_local(path)  # cached: read_data re-resolves free
    import os as _os
    if _os.path.isdir(path):
        # Spark-written datasets are DIRECTORIES of part files:
        # content-sniff the first data file (Spark's readers all accept
        # the directory path itself downstream)
        parts = sorted(
            f for f in _os.listdir(path)
            if not f.startswith((".", "_")) and
            _os.path.isfile(_os.path.join(path, f)))
        if not parts:
            raise ValueError(
                f"empty dataset directory: {path!r} — no data files to "
                f"sniff; pass fmt= explicitly to read an empty dataset")
        res = sniff(_os.path.join(path, parts[0]))
        if len(parts) > 1:
            # Multi-file dataset: positional banner/header drops are
            # single-file assumptions — every part file repeats its own
            # header, and Spark orders splits by size (not file order),
            # so a global leading-row drop can land on the wrong file's
            # rows. Clear them and mark the result so read_data routes
            # header handling to the native per-file reader.
            res.options.pop("skiprows", None)
            res.options.pop("banner_lines", None)
            res.options["multifile"] = True
        return res
    head = _read_head(path)
    if is_parquet(head):
        return SniffResult("parquet")
    if is_orc(head):
        return SniffResult("orc")
    if is_avro(head):
        return SniffResult("avro")
    enc = detect_encoding(head)
    text = head.decode(enc.lower().replace("-", "_"), errors="replace")
    lines = text.splitlines()[:100]
    if lines and not text.endswith("\n"):
        lines = lines[:-1] or lines  # drop possibly-truncated tail line
    if is_json(lines):
        opts = {"encoding": enc}
        if len(lines) > 1 and not is_json_lines(lines):
            opts["multiline"] = True  # one document spanning lines
        return SniffResult("json", opts)
    if looks_like_json_document(text):
        return SniffResult("json", {"encoding": enc, "multiline": True})
    delim = guess_delimiter(lines)
    if delim is not None:
        # Header may sit at ANY row index (csv_data.py:347-542 — title
        # banners, author lines, stacked double headers all land above
        # it): guess_header_row returns the last plausible header row;
        # everything above is skipped at read. Headerless files fall
        # back to the modal-delimiter-count banner scan.
        counts = [_strip_quoted(ln).count(delim) for ln in lines if ln]
        mode = Counter(counts).most_common(1)[0][0]
        quote = guess_quotechar(lines, delim)
        hdr = guess_header_row(lines, delim, quote)
        if hdr is not None:
            data_start = hdr
            header = True
        else:
            header = False
            data_start = 0
            for i, ln in enumerate(lines[:10]):
                if ln and _strip_quoted(ln).count(delim) == mode:
                    data_start = i
                    break
        body = lines[data_start:]
        opts = {"sep": delim, "header": header, "quote": quote,
                "encoding": enc}
        if header:
            # parse the header line with csv semantics (the guessed
            # quotechar): a quoted header cell containing the delimiter
            # must stay ONE name, and header_names must never widen the
            # schema beyond the modal field count (ADVICE r8)
            import csv as _csv
            try:
                parsed_hdr = next(_csv.reader(
                    [body[0]], delimiter=delim, quotechar=quote))
            except (StopIteration, _csv.Error):
                parsed_hdr = body[0].split(delim)
            opts["header_names"] = [c.strip() for c in parsed_hdr]
        # table width: Spark csv fixes the column count from the FIRST
        # physical record, so the keep-blank and banner re-read paths
        # need it carried explicitly (a headerless whitespace-delimited
        # file would otherwise collapse to one column)
        opts["ncols"] = mode + 1
        if data_start:
            # the read paths drop leading rows POSITIONALLY on a frame
            # that has already had blank lines filtered (Spark's csv
            # source trims whitespace-only lines; the keep-blank path
            # drops empty lines like pandas skip_blank_lines) — so the
            # banner lines themselves are recorded and each path counts
            # how many survive ITS OWN blank filter (a blank line
            # inside the banner would otherwise shift the drop onto
            # real data rows)
            opts["skiprows"] = data_start
            opts["banner_lines"] = lines[:data_start]
        if header and looks_like_graph(opts["header_names"]):
            return SniffResult("graph_csv", opts)
        return SniffResult("csv", opts)
    # No consistent delimiter: still a SINGLE-COLUMN table when the
    # line shapes are consistent (reference CSVData.is_match accepts
    # delimiter-None files — names-col.txt, small-num.csv — by space-
    # count consistency; csv_data.py:563-640). Prose and code fail the
    # consistency bar and stay text.
    # loose quote guess: with no delimiter, quoted spans cross token
    # boundaries, so cell-wrapping detection can't see them — the
    # character that PAIRS on the most lines wins (quote-test fixtures)
    quote, best_n = '"', 0
    for q in ('"', "'"):
        n = sum(1 for ln in lines[:20] if ln.count(q) >= 2)
        if n > best_n:
            quote, best_n = q, n
    hdr = guess_header_row(lines, None, quote)
    if lines and no_delim_table(lines, hdr, quote):
        opts = {"sep": None, "header": hdr is not None,
                "encoding": enc, "ncols": 1}
        if hdr is not None:
            opts["header_names"] = [lines[hdr].strip()]
            if hdr:
                opts["skiprows"] = hdr
                opts["banner_lines"] = lines[:hdr]
        return SniffResult("csv", opts)
    return SniffResult("text", {"encoding": enc})


def _read_csv_keep_blank(spark, path: str, o: dict):
    """CSV parse that PRESERVES whitespace-only data rows: text scan →
    strip the line terminator's \\r → from_csv per line. Used for
    whitespace delimiters, where the native csv source's blank-line
    filter (CSVUtils.filterCommentAndEmpty) would drop all-empty rows
    the reference counts. Header/banner rows are dropped positionally
    (ids are sequential within partition 0 = the file head)."""
    from pyspark.sql import functions as F

    sep = o.get("sep", ",")
    names = o.get("header_names")
    # header_names never widen the schema: the modal field count is the
    # table width; an over-split header (ADVICE r8) would otherwise
    # manufacture phantom all-null columns
    ncols = o.get("ncols") or 0
    if not ncols:
        # caller-forced path (fmt='csv' with a whitespace sep, no
        # sniff): probe the head for the modal field count
        head_lines = [ln for ln in
                      _read_head(path).decode("utf-8", "replace")
                      .splitlines()[:50] if ln.strip()]
        counts = Counter(ln.count(sep) for ln in head_lines)
        ncols = (counts.most_common(1)[0][0] + 1) if counts else 1
    txt = spark.read.text(path)
    txt = txt.select(
        F.regexp_replace("value", "\r$", "").alias("value"))
    txt = txt.where(F.length("value") > 0)  # pandas skip_blank_lines
    # count only the banner lines THIS path's blank filter keeps —
    # a fully blank line inside the banner is already gone before the
    # positional drop, and counting it would drop a real data row
    banner = o.get("banner_lines", [])
    n_drop = (sum(1 for ln in banner if ln.rstrip("\r"))
              + (1 if o.get("header") else 0))
    txt = _drop_leading_rows(txt, n_drop)
    if names and len(names) == ncols:
        uniq = _uniquify(names)
    else:
        uniq = [f"_c{i}" for i in range(ncols)]
    ddl = ", ".join(f"`{n}` STRING" for n in uniq)
    parsed = txt.select(F.from_csv(
        F.col("value"), ddl,
        {"sep": sep, "quote": o.get("quote", '"'),
         "mode": "PERMISSIVE"}).alias("r"))
    return parsed.select("r.*")


def _uniquify(names: list[str]) -> list[str]:
    seen: dict = {}
    out = []
    for n in names:
        k = seen.get(n, 0)
        seen[n] = k + 1
        out.append(n if k == 0 else f"{n}.{k}")
    return out


def _drop_leading_rows(df, n: int):
    """Drop the first n physical rows: monotonically_increasing_id is
    sequential WITHIN a partition and partition 0 is the file head, so
    ids 0..n-1 are exactly the first n surviving rows — an O(n) filter,
    scale-independent (the banner sits at the file head regardless of
    file size; verified under multi-split scans in test_sources)."""
    if not n:
        return df
    from pyspark.sql import functions as F
    return (df.withColumn("__rid", F.monotonically_increasing_id())
            .where(F.col("__rid") >= n).drop("__rid"))


def _head_lines(path: str, o: dict) -> list[str]:
    head = _read_head(path)
    enc = o.get("encoding") or detect_encoding(head)
    return head.decode(enc.lower().replace("-", "_"),
                       "replace").splitlines()


def _set_header_names_from_head(o: dict, path: str, idx: int) -> None:
    """Derive header_names from head line ``idx`` with the active
    delimiter/quote (user-given header indexes and forced-format auto
    guesses can't reuse the sniffed names)."""
    lines = _head_lines(path, o)
    if idx >= len(lines):
        return
    sep = o.get("sep", ",")
    if sep and len(sep) == 1:
        import csv as _csv
        try:
            o["header_names"] = [c.strip() for c in next(
                _csv.reader([lines[idx]], delimiter=sep,
                            quotechar=o.get("quote", '"')))]
        except (StopIteration, _csv.Error):
            pass
    else:
        o["header_names"] = [lines[idx].strip()]


def read_data(spark, path: str, fmt: str | None = None, **options):
    """Data() equivalent: sniff (unless format given) and build the lazy
    scan. Returns (DataFrame, SniffResult). http(s)/file/s3 URLs are
    fetched to a cached local temp file first (sources/url.py) — the
    reference's url_to_bytes path (data_utils.py:863-1050)."""
    from dataprofiler_spark.sources.url import is_url, url_to_local
    if is_url(path):
        path = url_to_local(path)
    res = sniff(path) if fmt is None else SniffResult(fmt, dict(options))
    o = {**res.options, **options}
    # Reference option-name compatibility (csv_data.py options dict):
    # delimiter/quotechar are the reference's spellings, and header
    # takes a ROW INDEX (rows above it are skipped) or "auto" (keep
    # the sniffed guess).
    if "delimiter" in o:
        o["sep"] = o.pop("delimiter")
    if "quotechar" in o:
        o["quote"] = o.pop("quotechar")
    hdr = o.get("header")
    if hdr == "auto":
        if fmt is None:
            o["header"] = res.options.get("header", False)
            o["skiprows"] = res.options.get("skiprows", 0)
        else:
            # forced format, auto header: run the head guess now (the
            # reference's header='auto' default always guesses)
            idx = None
            if res.format in ("csv", "graph_csv") and os.path.isfile(path):
                lines = _head_lines(path, o)
                idx = guess_header_row(lines, o.get("sep", ","),
                                       o.get("quote", '"'))
            o["header"] = idx is not None
            o["skiprows"] = idx or 0
            if idx is not None:
                _set_header_names_from_head(o, path, idx)
    elif isinstance(hdr, int) and not isinstance(hdr, bool):
        o["header"] = True
        o["skiprows"] = hdr
        o.pop("banner_lines", None)  # sniffed banner no longer applies
        # column names come from the REQUESTED line, not the sniffed one
        o.pop("header_names", None)
        if hdr > 0 and res.format in ("csv", "graph_csv") \
                and os.path.isfile(path):
            _set_header_names_from_head(o, path, hdr)
    # selected_columns (reference csv_data.py:85 / json selected_keys):
    # a post-scan projection — Catalyst pushes it into the scan
    # (column pruning), so only the selected columns are read from
    # columnar sources. Applied uniformly to every format.
    sel_cols = o.pop("selected_columns", None)
    sel_keys = o.pop("selected_keys", None)  # pop BOTH unconditionally
    selected = sel_cols if sel_cols is not None else sel_keys
    if selected is not None and len(selected) == 0:
        raise ValueError(
            "selected_columns is empty — pass None (or omit it) to read "
            "all columns")
    if selected:
        inner_df, inner_res = read_data(spark, path, fmt=res.format, **o)
        missing = [c for c in selected if c not in inner_df.columns]
        if missing:
            raise ValueError(
                f"selected_columns not in data: {missing}; "
                f"available: {inner_df.columns[:20]}")
        return inner_df.select(*selected), inner_res
    if res.format == "parquet":
        return spark.read.parquet(path), res
    if res.format == "orc":
        return spark.read.orc(path), res
    if res.format == "avro":
        # native spark-avro connector when its jar is on the classpath
        # (vectorized, block-splittable); else the in-repo pure-Python
        # container decoder (sources/avro_reader.py, per-file parallel)
        try:
            df = spark.read.format("avro").load(path)
            df.schema  # force datasource resolution
            return df, res
        except Exception:
            from dataprofiler_spark.sources.avro_reader import read_avro
            return read_avro(spark, path), res
    if res.format == "json":
        if o.get("multiline") or o.get("payload_keys") is not None:
            # whole-document JSON (or caller-forced payload extraction):
            # payload rows become the data, the rest one metadata row
            from dataprofiler_spark.sources.json_doc import \
                read_json_document
            df, meta = read_json_document(
                spark, path, payload_keys=o.get("payload_keys"),
                encoding=o.get("encoding"))
            res.metadata_df = meta  # exposed as Data(...).metadata
            return df, res
        enc = o.get("encoding", "UTF-8")
        if enc and enc.upper() not in ("UTF-8", "UTF8"):
            # Spark's json scan denies UTF-16/32 in line mode outright
            # (byte-level line splitting is unsafe under multi-byte
            # charsets). These legacy files are whole-file reads by
            # nature, so: binaryFiles (per-file parallel, the
            # avro_reader pattern) -> BOM-aware decode -> json lines.
            codec = enc.lower().replace("-", "_")
            rdd = (spark.sparkContext.binaryFiles(path)
                   .flatMap(lambda kv: kv[1].decode(codec).splitlines()))
            df = spark.read.json(rdd)
        else:
            df = spark.read.json(path)
        return df, res
    if res.format in ("csv", "graph_csv"):
        skip = o.get("skiprows", 0)
        enc = o.get("encoding", "UTF-8")
        # Multi-byte encodings break Hadoop's byte-level line splitting
        # (a UTF-16 '\n' is 0a00); multiLine=true decodes whole files
        # with the JVM charset instead. Whole-file reads don't split —
        # fine for these legacy inputs, convert to UTF-8 for scale.
        multi = enc.upper().startswith(("UTF-16", "UTF-32"))
        if enc.upper() not in ("UTF-8", "UTF8", "US-ASCII", "ISO-8859-1",
                               "UTF-16", "UTF-16LE", "UTF-16BE", "UTF-32"):
            # Spark 4 whitelists csv charsets; windows-125x/Shift_JIS/
            # Big5 (all real JVM charsets) need the legacy switch —
            # a runtime SQL conf, scoped to this session.
            spark.conf.set("spark.sql.legacy.javaCharsets", "true")
        sep = o.get("sep", ",")
        if sep is None:
            # single-column table (no delimiter — reference CSVData
            # accepts these): \x01 never occurs in text data, so the
            # native csv reader yields exactly one column and its
            # per-file header handling still works for directories
            sep = "\x01"
        if sep.isspace() and not multi \
                and enc.upper() in ("UTF-8", "UTF8") \
                and not o.get("multifile"):
            # single-file only: the keep-blank path drops header/banner
            # rows POSITIONALLY, which for a multi-file dataset would
            # leave every other part file's header line as a data row
            # (ADVICE r8 high). Directories route to the native csv
            # reader below, whose header=True strips the header PER
            # FILE; blank-row preservation is a single-legacy-file
            # parity feature Spark-written datasets don't need.
            # Spark's csv source silently DROPS whitespace-only lines
            # (CSVUtils.filterCommentAndEmpty trims each line), so a
            # tab-delimited all-empty row — which the reference counts,
            # and which feeds rows_all_null — vanishes. Parse those
            # files as a text scan + JVM-side from_csv instead: still
            # whole-stage-codegen, still splittable, no blank filter.
            # Truly empty physical lines are skipped like pandas
            # skip_blank_lines; quoted newlines are the documented
            # tradeoff (use fmt='csv' to force native). UTF-8 only —
            # spark.read.text has no charset option, so legacy-encoded
            # whitespace-delimited files take the native path and lose
            # all-empty rows (documented).
            return _read_csv_keep_blank(spark, path, o), res
        if not skip:
            df = spark.read.csv(
                path, sep=sep, header=o.get("header", False),
                quote=o.get("quote", '"'), multiLine=multi,
                encoding=enc, inferSchema=False)
            return df, res
        # Leading banner lines: Spark csv has no skiprows, so read
        # headerless with an explicit width (Spark csv fixes the column
        # count from the first record — the banner) and drop the
        # leading rows positionally (_drop_leading_rows). The drop
        # count includes only banner lines the csv source's blank
        # filter KEEPS (it trims whitespace-only lines) — counting a
        # blank banner line would drop a real data row.
        ncols = o.get("ncols") or len(o.get("header_names") or []) or 1
        schema = ", ".join(f"`_c{i}` string" for i in range(ncols))
        df = spark.read.csv(
            path, sep=sep, header=False, schema=schema,
            quote=o.get("quote", '"'), mode="PERMISSIVE",
            multiLine=multi, encoding=enc, inferSchema=False)
        banner = o.get("banner_lines")
        n_banner = (sum(1 for ln in banner if ln.strip())
                    if banner is not None else skip)
        df = _drop_leading_rows(
            df, n_banner + (1 if o.get("header") else 0))
        names = o.get("header_names")
        if names and len(names) == len(df.columns):
            df = df.toDF(*_uniquify(names))
        return df, res
    if res.format == "text":
        def _glob_local(p: str) -> list[str]:
            # local filesystem members of a read path (file, dir, or
            # glob); non-local schemes (s3a://, hdfs://) yield nothing
            # — the size guard is best-effort and driver-side only
            import glob as _g
            p = p[7:] if p.startswith("file://") else p
            if "://" in p:
                return []
            if os.path.isdir(p):
                return [os.path.join(p, n) for n in os.listdir(p)
                        if os.path.isfile(os.path.join(p, n))]
            return [f for f in _g.glob(p) if os.path.isfile(f)]

        spl = o.get("samples_per_line")
        if spl is None:
            return spark.read.text(path), res
        # reference text_data.py:62,86-101: the file's text (newlines
        # included) re-chunks into fixed-size character samples of
        # min(max(len,1), samples_per_line) chars; an empty file yields
        # zero samples. Chunking needs each file's chars in order, so
        # this is a per-FILE parallel read (the avro_reader pattern) —
        # chunk boundaries never cross files, matching the reference's
        # one-file-at-a-time reader.
        spl = int(spl)
        if spl <= 0:
            raise ValueError("samples_per_line must be a positive int")
        codec = (o.get("encoding") or "UTF-8").lower().replace("-", "_")
        # binaryFiles materializes each whole file on one executor —
        # correct for the per-file chunk semantics, but a multi-GB
        # single text file would OOM a task. Refuse loudly up front
        # (driver-side stat, no data read) instead of dying mid-job;
        # max_file_bytes is overridable for bigger executors.
        max_bytes = int(o.get("max_file_bytes", 512 * 1024 * 1024))
        for fs_path in _glob_local(path):
            sz = os.path.getsize(fs_path)
            if sz > max_bytes:
                raise ValueError(
                    f"samples_per_line reads whole files per task; "
                    f"{fs_path!r} is {sz} bytes > max_file_bytes="
                    f"{max_bytes}. Split the file or raise the "
                    f"'max_file_bytes' option.")

        def _chunks(kv):
            # strict: a wrong 'encoding' option must surface as an
            # error, not silently mangle bytes into U+FFFD samples
            try:
                text = kv[1].decode(codec)
            except UnicodeDecodeError as e:
                raise ValueError(
                    f"{kv[0]!r} does not decode as {codec!r} "
                    f"(samples_per_line uses the 'encoding' option "
                    f"strictly): {e}") from None
            n = min(max(len(text), 1), spl)
            return [(text[i * n:(i + 1) * n],)
                    for i in range((len(text) + n - 1) // n)]

        rdd = spark.sparkContext.binaryFiles(path).flatMap(_chunks)
        return spark.createDataFrame(rdd, schema="value string"), res
    raise ValueError(f"unknown format {res.format!r}")


def flatten_struct_columns(df):
    """JSON nested records → dotted column names (json_data.py:172-238);
    lazy select, no data movement."""
    from pyspark.sql.types import StructType

    cols: list[list[str]] = []

    def walk(path: list[str], schema: StructType):
        for f in schema.fields:
            p = path + [f.name]
            if isinstance(f.dataType, StructType):
                walk(p, f.dataType)
            else:
                cols.append(p)

    walk([], df.schema)
    from pyspark.sql import functions as F
    # quote each PATH SEGMENT individually: a field name may itself
    # contain a literal dot (payload-extracted frames name columns
    # "payload.Lion.name"), and splitting the joined name would
    # misread it as nesting
    return df.select(*[
        F.col("`" + "`.`".join(p) + "`").alias(".".join(p))
        for p in cols])
