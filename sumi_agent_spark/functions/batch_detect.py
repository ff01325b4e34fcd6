"""Batch-screened detection: one scan per pattern per Arrow batch.

The per-row detectors (oracle.py) are semantically exact but pay 33 regex
scans + a gazetteer walk per row.  At Arrow-batch granularity we can invert
that: concatenate the batch's normalized texts with a separator no pattern
can match across, scan each pattern ONCE over the whole batch, and then run
the verbatim per-row detector only on the (rule, row) pairs the scan proved
can match.  The per-row code path executes unchanged, so output is
byte-identical by construction (asserted by tests/test_batch_parity.py);
screening is conservative -- a false candidate only costs a redundant
per-row scan.

Separator choice: alternating "\\n、" (32 chars).  Every unbounded regex
class in the catalog excludes at least one of the two characters (``\\s``
classes stop at 、; negated-newline classes stop at \\n; kanji/kana/latin
classes match neither), and 、 after a single \\n blocks the ``\\s*`` label
separators, so no catalog pattern can bridge two rows.

Row-subset screening (second level): rules screened by ``"digit"`` share
one scan restricted to the rows containing a digit; rules screened by
literal tuples scan only the rows containing one of their literals (the
row subsets are joined with the same unbridgeable separator).  Soundness
needs no margin analysis: every match of a screened rule contains its
marker and no match crosses rows, so marker-free rows cannot match --
whole-row windows keep unbounded pattern extents and lookbehind context
fully visible.  Stress-tested (boundary spacing, lowercase length drift,
long \\s* gaps, hypothesis-random batches) in tests/test_batch_parity.py.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Optional, Sequence

import re

from .dictionaries import SURNAME_FIRST_CHARS, SURNAMES
from .oracle import (
    Detection,
    detect_custom_keywords,
    detect_japanese_names,
    detect_regex,
    normalize_text,
)
from .rules import DEFAULT_CURRENT_YEAR, NAME_LABEL_SCAN, REGEX_RULES, RULE_SCREENS

SEP = "\n、" * 16

_FIRST_CHAR_RE = re.compile("[" + re.escape("".join(sorted(SURNAME_FIRST_CHARS))) + "]")
_SURNAMES_BY_FIRST: dict[str, list[tuple[int, str]]] = {}
for _i, _sn in enumerate(SURNAMES):
    _SURNAMES_BY_FIRST.setdefault(_sn[0], []).append((_i, _sn))

# Row-subset scanning: a screened rule is scanned only over the rows that
# contain at least one of its screen markers (digit, or literal
# substring).  This is sound with NO margin analysis: every match of a
# screened rule contains a marker, and no match crosses rows (the
# separator is unbridgeable), so a row without a marker cannot contain a
# match.  Whole rows are scanned, so unbounded pattern extents (email
# domains, \s* gaps to a label) and lookbehind context inside the row are
# fully visible; screening stays conservative and the per-row detectors
# re-verify verbatim.
_DIGIT_RUN_RE = re.compile(r"[0-9]")


def _row_of(starts: list[int], lens: list[int], pos: int) -> int:
    """Map a concat offset to its row (or the preceding row if inside SEP)."""
    i = bisect_right(starts, pos) - 1
    return i


def _rows_with_literals(markers: tuple[str, ...], big_l: str,
                        starts_l: list[int], lens_l: list[int]) -> list[int]:
    """Sorted row ids whose text contains any marker.

    Searches ONE concat built from the per-row lowercased texts with its
    own offset table (lowercasing can change string lengths -- e.g. U+0130
    -> 2 chars -- so offsets into a lowercase of the original concat would
    misalign).  After a hit the search jumps to the end of that row: later
    occurrences inside the same row add nothing, and marker-dense rows
    would otherwise cost one bisect per occurrence."""
    rows: set[int] = set()
    for mk in markers:
        p = big_l.find(mk)
        while p != -1:
            i = bisect_right(starts_l, p) - 1
            rows.add(i)
            p = big_l.find(mk, max(p + 1, starts_l[i] + lens_l[i]))
    return sorted(rows)


class _RowSubsetScanner:
    """Scan regexes over a SEP-joined subset of rows, yielding row ids."""

    def __init__(self, rows_text: list[str], row_ids: list[int]):
        self.row_ids = row_ids
        pieces = [rows_text[i] for i in row_ids]
        self.win = SEP.join(pieces)
        self.w_starts: list[int] = []
        off = 0
        for p in pieces:
            self.w_starts.append(off)
            off += len(p) + len(SEP)

    @classmethod
    def from_prebuilt(cls, win: str, w_starts: list[int],
                      row_ids: list[int]) -> "_RowSubsetScanner":
        """Zero-copy constructor for an already-joined concat (the
        full-batch scanner reuses ``big`` + its offset table)."""
        self = cls.__new__(cls)
        self.win = win
        self.w_starts = w_starts
        self.row_ids = row_ids
        return self

    def match_rows(self, regex) -> set[int]:
        """Rows with at least one match.  After a hit the search resumes at
        the NEXT row's start: later matches in the same row add nothing,
        and match-dense rules would otherwise pay one bisect per match.
        ``pattern.search(s, pos)`` cannot see matches starting before
        ``pos`` and matches never bridge rows (unbridgeable SEP), so the
        hit set is identical to a full finditer pass."""
        out: set[int] = set()
        win, w_starts, row_ids = self.win, self.w_starts, self.row_ids
        n, end = len(w_starts), len(win)
        pos = 0
        while pos <= end:
            m = regex.search(win, pos)
            if m is None:
                break
            i = bisect_right(w_starts, m.start()) - 1
            out.add(row_ids[i])
            nxt = w_starts[i + 1] if i + 1 < n else end + 1
            pos = max(nxt, m.start() + 1)
        return out


def detect_all_batch(
    texts: Sequence[str],
    custom_keywords: Optional[list[str]] = None,
    current_year: int = DEFAULT_CURRENT_YEAR,
) -> list[list[Detection]]:
    """Per-row ``detect_all`` results for a whole batch (byte-identical)."""
    n = len(texts)
    normed = [normalize_text(t or "") for t in texts]
    big = SEP.join(normed)
    lower_rows = [t.lower() for t in normed]
    big_l = SEP.join(lower_rows)
    starts: list[int] = []
    pos = 0
    for t in normed:
        starts.append(pos)
        pos += len(t) + len(SEP)
    lens = [len(t) for t in normed]
    starts_l: list[int] = []
    pos = 0
    for t in lower_rows:
        starts_l.append(pos)
        pos += len(t) + len(SEP)

    # ── regex rules: one scan per rule over its marker-bearing rows ──
    # "digit"-screened rules share one row subset; tuple-screened rules
    # each get the rows containing their literals; unscreened rules scan
    # the full concat
    digit_scanner: Optional[_RowSubsetScanner] = None
    if any(RULE_SCREENS.get(r.id) == "digit" for r in REGEX_RULES):
        # per-row early-exit search beats one finditer over every digit
        # occurrence of the concat (digit-dense batches pay per occurrence)
        digit_rows = [i for i, t in enumerate(normed)
                      if _DIGIT_RUN_RE.search(t)]
        digit_scanner = _RowSubsetScanner(normed, digit_rows)

    lens_l = [len(t) for t in lower_rows]
    # full-batch scanner for unscreened rules (reuses the existing concat)
    full_scanner = _RowSubsetScanner.from_prebuilt(big, starts, list(range(n)))
    rule_rows: list[list[int]] = []  # parallel to REGEX_RULES: candidate rows
    for rule in REGEX_RULES:
        screen = RULE_SCREENS.get(rule.id)
        if screen == "digit":
            rows = digit_scanner.match_rows(rule.regex)
        elif isinstance(screen, tuple):
            cand = _rows_with_literals(screen, big_l, starts_l, lens_l)
            if not cand:
                rule_rows.append([])
                continue
            rows = _RowSubsetScanner(normed, cand).match_rows(rule.regex)
        else:
            rows = full_scanner.match_rows(rule.regex)
        rule_rows.append(sorted(rows))

    rules_per_row: list[list] = [[] for _ in range(n)]
    for rule, rows in zip(REGEX_RULES, rule_rows):
        for r in rows:
            rules_per_row[r].append(rule)

    # ── gazetteer surnames: one first-char-class pass over the batch, then
    # startswith checks against the ~1.3 surnames sharing that first char.
    # Row-local occurrence POSITIONS are carried to the per-row detector so
    # it never rescans with str.find (first-char enumeration is
    # overlap-inclusive, exactly what find-with-p+1 restarts yield, and a
    # surname can never extend into SEP: no kanji there) ──
    row_surname_pos: list[dict[int, list[int]]] = [{} for _ in range(n)]
    for m in _FIRST_CHAR_RE.finditer(big):
        p = m.start()
        for idx, sn in _SURNAMES_BY_FIRST[m.group(0)]:
            if big.startswith(sn, p):
                r = _row_of(starts, lens, p)
                row_surname_pos[r].setdefault(idx, []).append(p - starts[r])
    surnames_per_row = [[SURNAMES[i] for i in sorted(d)]
                        for d in row_surname_pos]
    positions_per_row = [{SURNAMES[i]: v for i, v in d.items()}
                         for d in row_surname_pos]

    # ── pass-2 label screen ──
    label_rows: set[int] = set()
    for m in NAME_LABEL_SCAN.finditer(big):
        label_rows.add(_row_of(starts, lens, m.start()))

    # ── run the verbatim per-row detectors on screened candidates ──
    out: list[list[Detection]] = []
    for i, nt in enumerate(normed):
        dets: list[Detection] = []
        if rules_per_row[i]:
            dets.extend(detect_regex(nt, current_year,
                                     rules=rules_per_row[i],
                                     prescreened=True))
        if surnames_per_row[i] or i in label_rows:
            dets.extend(detect_japanese_names(
                nt, surnames=surnames_per_row[i],
                scan_labels=(i in label_rows),
                surname_positions=positions_per_row[i]))
        if custom_keywords:
            dets.extend(detect_custom_keywords(nt, custom_keywords))
        seen: set[str] = set()
        merged: list[Detection] = []
        for d in dets:
            k = f"{d.category}:{d.value}"
            if k not in seen:
                seen.add(k)
                merged.append(d)
        out.append(merged)
    return out
