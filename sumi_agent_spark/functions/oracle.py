"""Pure-Python PII detection + masking oracle.

Implements, with byte-exact output semantics, the deterministic core of the
reference engine: normalization (detection.ts:15-23), regex detection with
false-positive filters (:400-492), dictionary/context name detection
(:1155-1281), custom keywords (:1284-1311), combined dedup (:1314-1338),
reading maps / initials (:363-397), and masking (redaction.ts:41-67).

This module is the correctness anchor: the Spark pipeline's pandas UDFs call
these same functions per Arrow batch, so Spark output equals oracle output
by construction, and the oracle itself is pinned by tests transliterated
from the reference's vitest suites.

Determinism notes:
* ``current_year`` replaces the reference's ``new Date()`` (detection.ts:473).
* Emission order is load-bearing everywhere: regex rules run in catalog
  order, surnames/given-names in gazetteer order, and ``detect_all`` dedups
  first-wins on ``category:value``.  ``apply_redaction`` sorts by value
  length descending with a stable sort, so ties keep ``detect_all`` order
  (JS ``Array.prototype.sort`` is stable; so is Python ``sorted``).
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

from .dictionaries import GIVEN_NAMES, NON_NAME_WORDS, SURNAMES, SURNAME_FIRST_CHARS
from .rules import (
    ADDRESS_DETAIL_PLACEHOLDER,
    BIRTHDAY_LABEL_BEFORE,
    HAS_DIGIT_RE,
    RULE_SCREENS,
    DEFAULT_CURRENT_YEAR,
    DEFAULT_KEEP_PREFECTURE,
    DEFAULT_MASK_CONFIG,
    DEFAULT_NAME_INITIAL,
    DEFAULT_PLACEHOLDER,
    DOC_DATE_LABEL_BEFORE,
    DOTTED_WORD_AFTER,
    EMAIL_LOCALPART_BEFORE,
    ERA_BASE_YEAR,
    ERA_YEAR_PREFIX,
    KANA_INITIAL_MAP,
    LABEL_ENDS,
    LINE_LEADING_YEAR,
    MULTI_SPACE_RE,
    NAME_BEF_OK,
    NAME_LABEL_SCAN,
    NAME_ROLE_LABEL_BEFORE,
    NORMALIZE_TABLE,
    PII_LABEL_BEFORE,
    PLACEHOLDERS,
    PREFECTURE_RE,
    READING_KANA_LINE,
    READING_NAME_LINE,
    REGEX_RULES,
    URL_BEFORE,
    WESTERN_YEAR_PREFIX,
    YEAR_RANGE_CONTEXT,
)


class Detection(NamedTuple):
    id: str
    type: str
    label: str
    category: str
    value: str
    source: str  # 'regex' | 'dict' | 'ai' | 'heuristic'
    confidence: float
    enabled: bool


# ─── Normalization (detection.ts:15-23) ───

_NORMALIZE_HIT_RE = re.compile(
    "[" + "".join(re.escape(chr(k)) for k in NORMALIZE_TABLE) + "]")


def normalize_text(text: str) -> str:
    """Fullwidth digits/letters -> ASCII, ；-> ;, collapse space/tab runs.

    The dict-table ``str.translate`` costs a dict probe per character; a
    C-level class scan gates it so the (typical) row with no fullwidth
    chars pays one early-exit search instead -- byte-identical output."""
    if _NORMALIZE_HIT_RE.search(text):
        text = text.translate(NORMALIZE_TABLE)
    return MULTI_SPACE_RE.sub(" ", text)


# ─── Prefecture / kana helpers (detection.ts:273-397) ───

def extract_prefecture(addr: str) -> str:
    m = PREFECTURE_RE.match(addr)
    return m.group(1) if m else ""


def _hira_to_kata(c: str) -> str:
    cp = ord(c)
    return chr(cp + 0x60) if 0x3041 <= cp <= 0x3096 else c


def _char_to_initial(c: str) -> Optional[str]:
    return KANA_INITIAL_MAP.get(c) or KANA_INITIAL_MAP.get(_hira_to_kata(c))


_KANA_ONLY = re.compile(r"^[゠-ヿ぀-ゟー\s　]+$")
_PART_SPLIT = re.compile(r"[\s　]+")


def build_reading_map(text: str) -> dict[str, str]:
    """Kanji name -> katakana reading, scanning ≤3 lines past a name label."""
    out: dict[str, str] = {}
    lines = text.split("\n")
    for i, line in enumerate(lines):
        m = READING_NAME_LINE.search(line)
        if not m:
            continue
        kanji = m.group(1).strip()
        for j in range(i + 1, min(i + 4, len(lines))):
            km = READING_KANA_LINE.search(lines[j])
            if km:
                out[kanji] = km.group(1).strip()
                break
    return out


def name_to_initial(name: str, reading_map: Optional[dict[str, str]] = None) -> str:
    if not name:
        return ""
    reading = name if _KANA_ONLY.match(name) else (reading_map or {}).get(name, "")
    if reading:
        parts = [p for p in _PART_SPLIT.split(reading) if p]
        initials = ".".join(_char_to_initial(p[0]) or p[0] for p in parts)
        return initials + "." if initials else ""
    parts = [p for p in _PART_SPLIT.split(name) if p]
    if len(parts) >= 2:
        return ".".join(p[0] for p in parts) + "."
    if len(name) >= 2:
        return name[0] + "." + name[1] + "."
    return name[0] + "."


# ─── Regex detection with false-positive filters (detection.ts:400-492) ───

_RULES_WITH_SCREENS = [(r, RULE_SCREENS.get(r.id)) for r in REGEX_RULES]

def detect_regex(
    text: str,
    current_year: int = DEFAULT_CURRENT_YEAR,
    rules: Optional[list] = None,
    prescreened: bool = False,
) -> list[Detection]:
    """``rules`` restricts the catalog (batch screening, batch_detect.py);
    emission semantics are unchanged -- callers pass rules in catalog order.
    ``prescreened=True`` (batch layer only) skips the per-rule marker
    checks: sound because the batch screen ran each rule's ACTUAL regex
    over this row, so re-checking that the row contains the rule's marker
    can never veto -- every match of a screened rule contains its marker."""
    out: list[Detection] = []
    seen: set[str] = set()
    if prescreened and rules is not None:
        pairs = [(r, None) for r in rules]
    else:
        tl = text.lower()
        has_digit = bool(HAS_DIGIT_RE.search(text))
        pairs = (_RULES_WITH_SCREENS if rules is None
                 else [(r, RULE_SCREENS.get(r.id)) for r in rules])

    for rule, screen in pairs:
        if screen == "digit":
            if not has_digit:
                continue
        elif screen is not None:
            for mk in screen:
                if mk in tl:
                    break
            else:
                continue
        for m in rule.regex.finditer(text):
            v = (m.group(rule.group) if rule.group else m.group(0)).strip()
            key = f"{rule.id}:{v}"
            if key in seen or len(v) < 2:
                continue
            m_start, m_end = m.start(), m.end()

            if rule.id in ("phone", "postal", "mynumber"):
                tight = (text[max(0, m_start - 8):m_start] + m.group(0)
                         + text[m_end:m_end + 8])
                if YEAR_RANGE_CONTEXT.search(tight):
                    continue
                line_start = text.rfind("\n", 0, m_start) + 1
                nl = text.find("\n", m_end)
                line = text[line_start:nl if nl != -1 else len(text)]
                has_pii_label = bool(
                    PII_LABEL_BEFORE.search(text[max(0, m_start - 20):m_start]))
                if not has_pii_label and LINE_LEADING_YEAR.search(line):
                    continue
                if rule.id == "postal" and not v.startswith("〒"):
                    if m_start > 0 and text[m_start - 1] in "0123456789":
                        continue
                if rule.id == "phone" and text[m_end:m_end + 1] in ("年", "月"):
                    continue

            if rule.id.startswith("sns_"):
                before = text[max(0, m_start - 20):m_start]
                if (EMAIL_LOCALPART_BEFORE.search(before)
                        and DOTTED_WORD_AFTER.search(text[m_end:m_end + 10])):
                    continue
                if URL_BEFORE.search(before):
                    continue

            if rule.id == "birthday":
                before30 = text[max(0, m_start - 30):m_start]
                if DOC_DATE_LABEL_BEFORE.search(before30):
                    continue
                if not BIRTHDAY_LABEL_BEFORE.search(before30):
                    year: Optional[int] = None
                    wm = WESTERN_YEAR_PREFIX.match(v)
                    if wm:
                        year = int(wm.group(1))
                    em = ERA_YEAR_PREFIX.match(v)
                    if em:
                        year = ERA_BASE_YEAR[em.group(1)] + int(em.group(2))
                    if year and year > current_year - 20:
                        continue

            seen.add(key)
            out.append(Detection(
                id=f"re_{rule.id}_{m_start}", type=rule.id, label=rule.label,
                category=rule.category, value=v, source="regex",
                confidence=0.95, enabled=True))
    return out


# ─── Dictionary / context name detection (detection.ts:1145-1281) ───

_HAS_KANJI = re.compile(r"[一-鿿]")
# prefix lookup structures: replace the 211-name startswith scan with <=6 set
# probes while preserving gazetteer emission order (sort by catalog index)
_GIVEN_SET = frozenset(GIVEN_NAMES)
_GIVEN_IDX = {gn: i for i, gn in enumerate(GIVEN_NAMES)}
_GIVEN_MAXLEN = max(len(g) for g in GIVEN_NAMES)
_GIVEN_FIRST = frozenset(g[0] for g in GIVEN_NAMES)
# literal alternation heads of NAME_ROLE_LABEL_BEFORE: a match must contain
# one of these, so a row without any can skip the per-occurrence search
_ROLE_LABEL_LITS = ("氏名", "名前", "担当", "著者", "記入者", "申請者",
                    "連絡先", "責任者", "作成者", "報告者", "代表者", "上司",
                    "部長", "課長", "主任", "対応者")
_SURNAMES_BY_FIRST: dict[str, list[tuple[int, str]]] = {}
for _i, _sn in enumerate(SURNAMES):
    _SURNAMES_BY_FIRST.setdefault(_sn[0], []).append((_i, _sn))
_PURE_KATAKANA = re.compile(r"^[゠-ヿ\s　]+$")
_WS_ONLY = re.compile(r"[\s　]")
_LEADING_WS = re.compile(r"^[\s　]*")
_GIVEN_AFTER_LABEL = re.compile(r"^[\s　]*([一-鿿]{1,4})")
_NAME_AFTER_SURNAME = re.compile(r"^[\s　]*([一-鿿぀-ゟ゠-ヿ]{1,4})")
_NAME_GUESS = re.compile(r"^([一-鿿]{2,4}[\s　]?[一-鿿]{1,4})")


def _is_likely_name(s: str) -> bool:
    if not s or len(s) < 2 or len(s) > 10:
        return False
    clean = _WS_ONLY.sub("", s)
    if clean in NON_NAME_WORDS:
        return False
    if not _HAS_KANJI.search(clean):
        return False
    if _PURE_KATAKANA.match(clean):
        return False
    return True


def _surname_occurrences(text: str, sn: str):
    """Left-to-right (overlap-inclusive) occurrence positions of ``sn``."""
    p = text.find(sn)
    while p != -1:
        yield p
        p = text.find(sn, p + 1)


def detect_japanese_names(
    text: str,
    surnames: Optional[list[str]] = None,
    scan_labels: bool = True,
    surname_positions: Optional[dict] = None,
) -> list[Detection]:
    """``surnames``/``scan_labels`` restrict the scan (batch screening);
    callers pass surnames in catalog order, semantics unchanged.
    ``surname_positions`` (batch layer) supplies each surname's
    left-to-right occurrence positions so the per-row ``str.find`` rescans
    are skipped -- the batch scan already proved every occurrence via
    first-char + startswith, which enumerates exactly what ``find`` with
    ``p + 1`` restarts would (overlap-inclusive)."""
    out: list[Detection] = []
    seen: set[str] = set()
    if surnames is None:
        hit_chars = set(text) & SURNAME_FIRST_CHARS
        if hit_chars:
            idx_sn = sorted(p for c in hit_chars for p in _SURNAMES_BY_FIRST[c])
            surnames = [sn for _, sn in idx_sn]
        else:
            surnames = []

    # Pass 1: surname scan + given-name prefix / role-label fallback
    has_role_label: Optional[bool] = None  # lazily computed once per call
    for sn in surnames:
        occ = (surname_positions.get(sn, ()) if surname_positions is not None
               else _surname_occurrences(text, sn))
        for p in occ:
            a = p + len(sn)
            ws = _LEADING_WS.match(text[a:a + 10])
            ns = a + (ws.end() if ws else 0)
            nr = text[ns:ns + 6]
            matched = False
            # all gazetteer given-names that prefix nr, in catalog order
            # (equivalent to scanning GIVEN_NAMES with startswith); skip
            # outright when nr cannot start any gazetteer given name
            if nr and nr[0] in _GIVEN_FIRST:
                cand = [g for g in (nr[:j]
                                    for j in range(1, min(_GIVEN_MAXLEN,
                                                          len(nr)) + 1))
                        if g in _GIVEN_SET]
                cand.sort(key=_GIVEN_IDX.__getitem__)
            else:
                cand = []
            for gn in cand:
                full = text[p:ns + len(gn)]
                k = f"name:{full}"
                if k not in seen and _is_likely_name(full):
                    bef = text[p - 1] if p > 0 else " "
                    if p == 0 or NAME_BEF_OK.match(bef) or LABEL_ENDS.match(bef):
                        seen.add(k)
                        out.append(Detection(
                            id=f"nd_{p}", type="name_dict", label="氏名（辞書）",
                            category="name", value=full, source="dict",
                            confidence=0.92, enabled=True))
                        matched = True
            if not matched:
                if has_role_label is None:
                    has_role_label = any(lit in text
                                         for lit in _ROLE_LABEL_LITS)
                before30 = text[max(0, p - 30):p]
                if has_role_label and NAME_ROLE_LABEL_BEFORE.search(before30):
                    gm = _GIVEN_AFTER_LABEL.match(text[a:a + 8])
                    full_name = (text[p:a + gm.end()].strip() if gm else sn)
                    if _is_likely_name(full_name):
                        k = f"nc2:{full_name}:{p}"
                        if k not in seen:
                            seen.add(k)
                            out.append(Detection(
                                id=f"nc2_{p}", type="name_context",
                                label="氏名（文脈）", category="name",
                                value=full_name, source="dict",
                                confidence=0.88, enabled=True))

    # Pass 2: label-scan detection
    label_iter = NAME_LABEL_SCAN.finditer(text) if scan_labels else ()
    for lm in label_iter:
        after = text[lm.end():lm.end() + 16]
        found = False
        for sn in SURNAMES:
            if after.startswith(sn):
                k = f"nc:{sn}:{lm.start()}"
                if k not in seen:
                    nm = _NAME_AFTER_SURNAME.match(after[len(sn):])
                    fv = after[:len(sn) + nm.end()] if nm else sn
                    if _is_likely_name(fv.strip()):
                        seen.add(k)
                        out.append(Detection(
                            id=f"nc_{lm.start()}", type="name_context",
                            label="氏名（文脈）", category="name",
                            value=fv.strip(), source="dict",
                            confidence=0.9, enabled=True))
                        found = True
                break
        if not found:
            ng = _NAME_GUESS.match(after)
            if ng and _is_likely_name(ng.group(1).strip()):
                val = ng.group(1).strip()
                k = f"ng:{val}:{lm.start()}"
                if k not in seen:
                    seen.add(k)
                    out.append(Detection(
                        id=f"ng_{lm.start()}", type="name_context",
                        label="氏名（推定）", category="name", value=val,
                        source="heuristic", confidence=0.75, enabled=True))
    return out


# ─── Custom keywords (detection.ts:1284-1311) ───

def detect_custom_keywords(text: str, keywords: list[str]) -> list[Detection]:
    out: list[Detection] = []
    seen: set[str] = set()
    for kw in keywords:
        if not kw or len(kw) < 1:
            continue
        idx = 0
        while True:
            p = text.find(kw, idx)
            if p == -1:
                break
            k = f"custom:{kw}"
            if k not in seen:
                seen.add(k)
                out.append(Detection(
                    id=f"ck_{p}", type="custom_keyword", label="カスタム指定",
                    category="custom", value=kw, source="regex",
                    confidence=1.0, enabled=True))
            idx = p + len(kw)
    return out


# ─── Combined detection + merge (detection.ts:1314-1338) ───

def detect_all(
    text: str,
    custom_keywords: Optional[list[str]] = None,
    current_year: int = DEFAULT_CURRENT_YEAR,
) -> list[Detection]:
    """normalize -> regex + names + custom, first-wins dedup on category:value."""
    nt = normalize_text(text)
    ckw = detect_custom_keywords(nt, custom_keywords) if custom_keywords else []
    all_dets = [*detect_regex(nt, current_year), *detect_japanese_names(nt), *ckw]
    seen: set[str] = set()
    out: list[Detection] = []
    for d in all_dets:
        k = f"{d.category}:{d.value}"
        if k not in seen:
            seen.add(k)
            out.append(d)
    return out


def merge_detections(base: list[Detection], extra: list[Detection]) -> list[Detection]:
    seen = {f"{d.category}:{d.value}" for d in base}
    merged = list(base)
    for d in extra:
        k = f"{d.category}:{d.value}"
        if k not in seen:
            seen.add(k)
            merged.append(d)
    return merged


def apply_mask_config(
    dets: list[Detection], mask_config: Optional[dict[str, bool]] = None
) -> list[Detection]:
    """Per-category enable flags (RedactPro.tsx:1727): enabled unless False."""
    cfg = DEFAULT_MASK_CONFIG if mask_config is None else mask_config
    return [d._replace(enabled=cfg.get(d.category, True) is not False) for d in dets]


# ─── Masking (redaction.ts:41-67) ───

def apply_redaction(
    text: str,
    dets: list[Detection],
    keep_prefecture: bool = False,
    name_initial: bool = False,
    reading_map: Optional[dict[str, str]] = None,
) -> str:
    """Sequential literal replacement, longest value first (stable on ties).

    ``reading_map`` overrides the per-document reading map -- used by the
    conversation-scoped grouped variant; the default (None) matches the
    reference's per-document scope exactly."""
    # only detections that will actually replace something participate;
    # filtering before the sort is equivalent to the reference's in-loop
    # skip, and a row with none returns untouched without paying the
    # reading-map scan or the sort
    live = [d for d in dets if d.enabled and d.value and len(d.value) >= 2]
    if not live:
        return text
    if name_initial and reading_map is None and \
            any(d.category == "name" for d in live):
        reading_map = build_reading_map(text)
    r = text
    for d in sorted(live, key=lambda d: -len(d.value)):
        if d.category == "name" and name_initial:
            replacement = (name_to_initial(d.value, reading_map)
                           or PLACEHOLDERS.get(d.type) or DEFAULT_PLACEHOLDER)
        elif d.type == "address" and keep_prefecture:
            pref = extract_prefecture(d.value)
            replacement = (pref + ADDRESS_DETAIL_PLACEHOLDER if pref
                           else PLACEHOLDERS["address"])
        else:
            replacement = PLACEHOLDERS.get(d.type) or DEFAULT_PLACEHOLDER
        r = r.replace(d.value, replacement)
    return r


def ensure_unique_detection_ids(dets: list[Detection]) -> list[Detection]:
    """Suffix ``__n`` on duplicate ids (RedactPro.tsx:478-489)."""
    seen: dict[str, int] = {}
    out: list[Detection] = []
    for d in dets:
        if d.id in seen:
            seen[d.id] += 1
            out.append(d._replace(id=f"{d.id}__{seen[d.id]}"))
        else:
            seen[d.id] = 0
            out.append(d)
    return out


def annotation_spans(
    text: str, dets: list[Detection]
) -> list[tuple[int, int, str, bool]]:
    """Greedy non-overlapping span selection for annotation output
    (buildAnnotations, RedactPro.tsx:725-796): NON-overlapping literal
    occurrences of every detection value (the reference steps the search
    index by the value length, :749), sorted by start asc then length desc
    with a STABLE sort so full ties keep detection order exactly like the
    reference's stable JS sort.  Returns (start, end, type, enabled)."""
    matches: list[tuple[int, int, str, bool]] = []
    for d in dets:
        if not d.value or len(d.value) < 2:
            continue
        p = text.find(d.value)
        while p != -1:
            matches.append((p, p + len(d.value), d.type, d.enabled))
            p = text.find(d.value, p + len(d.value))
    matches.sort(key=lambda m: (m[0], -(m[1] - m[0])))
    out: list[tuple[int, int, str, bool]] = []
    last_end = -1
    for m in matches:
        if m[0] >= last_end:
            out.append(m)
            last_end = m[1]
    return out


_PII_VALUE_RE = re.compile(r"^\s*(\[[^\]]*非公開[^\]]*\]\s*)+$")


def is_pii_value(value: str) -> bool:
    """True when the value is nothing but redaction placeholders.

    Exact reference semantics (RedactPro.tsx:3076): any bracketed token
    CONTAINING 非公開 counts -- including ad-hoc ones like [当日非公開扱い]
    -- while bracketed tokens without it ([顔写真削除]) do not, so this is
    deliberately NOT the closed PLACEHOLDER_RE list."""
    return bool(_PII_VALUE_RE.match(value or ""))


# ─── One-call scrub (the §3.2 pure path: detect_all -> apply_redaction) ───

def scrub_text(
    text: str,
    custom_keywords: Optional[list[str]] = None,
    mask_config: Optional[dict[str, bool]] = None,
    keep_prefecture: bool = DEFAULT_KEEP_PREFECTURE,
    name_initial: bool = DEFAULT_NAME_INITIAL,
    current_year: int = DEFAULT_CURRENT_YEAR,
) -> tuple[str, list[Detection]]:
    """Detect on raw text, apply mask config, mask raw text.

    Matches the reference's pure path (integration.test.ts:8-9,245-246):
    detections are computed over the normalized text while the replacement
    runs over the original text.
    """
    dets = apply_mask_config(
        detect_all(text, custom_keywords, current_year), mask_config)
    return apply_redaction(text, dets, keep_prefecture, name_initial), dets
