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

Windowed screening (second level): rules screened by ``"digit"`` share one
scan restricted to margin-padded windows around digit runs; rules screened
by literal tuples scan only windows around their literal occurrences (the
windows are joined with the same unbridgeable separator).  See the margin
safety argument at ``_WIN_LEFT``/``_WIN_RIGHT``; edge spacing is
stress-tested in tests/test_batch_parity.py.
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

# Windowed scanning margins.  A screened rule is scanned only inside
# [occurrence-LEFT, occurrence+RIGHT] windows around its screen markers
# (digit runs, or literal substrings).  Safe because in the catalog no
# match extends more than a few chars left of its first marker (postal 〒,
# era names, label literals at match start) nor ~64 chars right of it
# (addresses cap at ~48, usernames at ~40), and all lookbehinds are <=2
# chars; margins are set several times wider.  Windows around markers of
# ONE match always overlap (intra-match marker gaps are tiny), so a match
# is never split across windows.  Screening stays conservative: window
# edges can only ADD candidate rows (a lookbehind that would reject on
# out-of-window context), never hide a real match -- and candidates are
# re-verified verbatim per row.
_WIN_LEFT, _WIN_RIGHT = 16, 96
_DIGIT_RUN_RE = re.compile(r"[0-9]+")


def _row_of(starts: list[int], lens: list[int], pos: int) -> int:
    """Map a concat offset to its row (or the preceding row if inside SEP)."""
    i = bisect_right(starts, pos) - 1
    return i


def _marker_spans(n: int, intervals: list[tuple[int, int]]) -> list[list[int]]:
    """Margin-padded, merged [a, b) windows around sorted marker intervals
    (vectorized: a new span starts wherever the padded start exceeds the
    running max of previous padded ends)."""
    if not intervals:
        return []
    import numpy as np

    iv = np.asarray(intervals, dtype=np.int64)
    a = np.maximum(iv[:, 0] - _WIN_LEFT, 0)
    b = np.minimum(iv[:, 1] + _WIN_RIGHT, n)
    b_run = np.maximum.accumulate(b)
    new_span = np.concatenate([[True], a[1:] > b_run[:-1]])
    starts = a[new_span]
    # each span ends at the running max just before the next span starts
    idx = np.nonzero(new_span)[0]
    ends = np.concatenate([b_run[idx[1:] - 1], [b_run[-1]]])
    return [[int(s), int(e)] for s, e in zip(starts, ends)]


def _literal_intervals(big_l: str, markers: tuple[str, ...]) -> list[tuple[int, int]]:
    """Sorted occurrence intervals of any marker (lowercased text)."""
    out: list[tuple[int, int]] = []
    for mk in markers:
        p = big_l.find(mk)
        while p != -1:
            out.append((p, p + len(mk)))
            p = big_l.find(mk, p + 1)
    out.sort()
    return out


class _WindowScanner:
    """Scan regexes over marker windows of the batch instead of the whole
    batch, mapping match positions back to concat space."""

    def __init__(self, big: str, spans: list[list[int]]):
        self.spans = spans
        pieces = [big[a:b] for a, b in spans]
        self.win = SEP.join(pieces)
        self.w_starts: list[int] = []
        off = 0
        for p in pieces:
            self.w_starts.append(off)
            off += len(p) + len(SEP)

    def finditer_starts(self, regex) -> list[int]:
        out = []
        for m in regex.finditer(self.win):
            i = bisect_right(self.w_starts, m.start()) - 1
            out.append(self.spans[i][0] + (m.start() - self.w_starts[i]))
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
    big_l = big.lower()
    starts: list[int] = []
    pos = 0
    for t in normed:
        starts.append(pos)
        pos += len(t) + len(SEP)
    lens = [len(t) for t in normed]

    # ── regex rules: one scan per rule, windowed where a screen exists ──
    # "digit"-screened rules share one window set around digit runs; tuple-
    # screened rules get windows around their literal occurrences; rules
    # with no screen scan the full concat
    digit_scanner: Optional[_WindowScanner] = None
    if any(RULE_SCREENS.get(r.id) == "digit" for r in REGEX_RULES):
        runs = [(m.start(), m.end()) for m in _DIGIT_RUN_RE.finditer(big)]
        digit_scanner = _WindowScanner(big, _marker_spans(len(big), runs))

    rule_rows: list[list[int]] = []  # parallel to REGEX_RULES: candidate rows
    for rule in REGEX_RULES:
        screen = RULE_SCREENS.get(rule.id)
        if screen == "digit":
            starts_at = digit_scanner.finditer_starts(rule.regex)
        elif isinstance(screen, tuple):
            iv = _literal_intervals(big_l, screen)
            if not iv:
                rule_rows.append([])
                continue
            scanner = _WindowScanner(big, _marker_spans(len(big), iv))
            starts_at = scanner.finditer_starts(rule.regex)
        else:
            starts_at = [m.start() for m in rule.regex.finditer(big)]
        rows = {_row_of(starts, lens, p) for p in starts_at}
        rule_rows.append(sorted(rows))

    rules_per_row: list[list] = [[] for _ in range(n)]
    for rule, rows in zip(REGEX_RULES, rule_rows):
        for r in rows:
            rules_per_row[r].append(rule)

    # ── gazetteer surnames: one first-char-class pass over the batch, then
    # startswith checks against the ~1.3 surnames sharing that first char ──
    row_surname_idx: list[set[int]] = [set() for _ in range(n)]
    for m in _FIRST_CHAR_RE.finditer(big):
        p = m.start()
        for idx, sn in _SURNAMES_BY_FIRST[m.group(0)]:
            if big.startswith(sn, p):
                row_surname_idx[_row_of(starts, lens, p)].add(idx)
    surnames_per_row = [[SURNAMES[i] for i in sorted(s)] for s in row_surname_idx]

    # ── pass-2 label screen ──
    label_rows: set[int] = set()
    for m in NAME_LABEL_SCAN.finditer(big):
        label_rows.add(_row_of(starts, lens, m.start()))

    # ── run the verbatim per-row detectors on screened candidates ──
    out: list[list[Detection]] = []
    for i, nt in enumerate(normed):
        dets: list[Detection] = []
        if rules_per_row[i]:
            dets.extend(detect_regex(nt, current_year, rules=rules_per_row[i]))
        if surnames_per_row[i] or i in label_rows:
            dets.extend(detect_japanese_names(
                nt, surnames=surnames_per_row[i],
                scan_labels=(i in label_rows)))
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
