r"""PII rule catalog: regex patterns, placeholders, kana tables.

Re-expression (not a port) of the rule *data* that drives the reference
engine -- pattern semantics per /root/reference/src/lib/detection.ts:34-266
(REGEX_PATTERNS), :269-270 (YEAR_RANGE_CONTEXT), :273 (PREFECTURE_RE),
:280-352 (KANA_INITIAL_MAP) and /root/reference/src/lib/redaction.ts:7-34
(PLACEHOLDERS / PLACEHOLDER_RE).  The regexes are translated from
JS RegExp to Python ``re`` with these documented deltas:

* JS ``.`` excludes ``\n \r    `` -- translated to the explicit
  class ``[^\n\r  ]`` where it appears (address pattern).
* JS ``\s`` and Python ``\s`` both cover U+3000; JS additionally matches
  U+FEFF, which never occurs in transcript fixtures.
* All lookbehinds are fixed-width, valid in Python ``re``.

Everything here is plain data + compiled patterns: importable by both the
pure-Python oracle and the executor-side pandas UDFs with zero Spark deps.
"""

from __future__ import annotations

import re
from typing import NamedTuple


class RegexRule(NamedTuple):
    id: str
    label: str
    category: str
    regex: "re.Pattern[str]"
    group: int  # 0 = whole match


def _ascii_shorthands(pat: str) -> str:
    r"""Rewrite ``\d``/``\w`` to explicit ASCII classes.

    JS ``\d``/``\w`` match ASCII only; Python's unicode mode matches every
    Unicode digit/word char, so e.g. ``(?<!\d)`` would wrongly treat
    Arabic-Indic digits as digits (suppressing a phone match the reference
    finds) and ``\.\w+`` would match kanji after a dot.  ``\s`` is NOT
    rewritten: JS ``\s`` is Unicode-aware (it must keep matching U+3000,
    which survives normalization) and Python's unicode ``\s`` differs only
    on exotica (U+001C-1F/U+0085 extra, U+FEFF missing) -- the documented
    deltas above.  Character-class context gets class-body fragments."""
    out: list[str] = []
    i, in_class = 0, False
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt == "d":
                out.append("0-9" if in_class else "[0-9]")
            elif nxt == "w":
                out.append("A-Za-z0-9_" if in_class else "[A-Za-z0-9_]")
            else:
                out.append(pat[i:i + 2])
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)


def _r(pat: str, flags: int = 0) -> "re.Pattern[str]":
    return re.compile(_ascii_shorthands(pat), flags)


_I = re.IGNORECASE

# Character-class shorthands (kept as raw source fragments)
_KANJI = "一-鿿"
_HIRA = "぀-ゟ"
_KATA = "゠-ヿ"
_SEP = "\\s*[：:・\\s]\\s*"  # label separator used by name/SNS rules

REGEX_RULES: list[RegexRule] = [
    RegexRule(
        "email", "メールアドレス", "contact",
        _r(r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"), 0),
    RegexRule(
        "url", "URL", "web",
        _r(r"https?://[^\s　、。，．<>\"')\]）」』】]{4,}"), 0),
    RegexRule(
        "phone", "電話番号", "contact",
        _r(r"(?<!\d)(?:0\d{1,4}[-\s]?\d{1,4}[-\s]?\d{3,4}"
           r"|\(0\d{1,4}\)\s?\d{1,4}[-\s]?\d{3,4}"
           r"|0\d{9,10})(?!\d)"), 0),
    RegexRule(
        "postal", "郵便番号", "address",
        _r(r"(?:〒\s?\d{3}[-ー]\d{4}"
           r"|(?<!\d)(?<![-ー])\d{3}[-ー]\d{4}(?![-ー]\d)(?!\d))"), 0),
    RegexRule(
        "birthday", "年月日", "personal",
        _r(r"(?:(?:19|20)\d{2}\s?[年/\-.]\s?\d{1,2}\s?[月/\-.]\s?\d{1,2}\s?日?"
           r"|(?:昭和|平成|令和)\s?\d{1,2}\s?年\s?\d{1,2}\s?月\s?\d{1,2}\s?日)"), 0),
    RegexRule(
        "address", "住所", "address",
        _r(r"(?:北海道|(?:東京|京都|大阪)(?:都|府)|[^\n\r  ]{2,3}県)"
           r"[^\n\r,、。]{3,40}?"
           r"(?:\d+[-ー]\d+(?:[-ー]\d+)?|丁目|番地|号)"
           r"(?:[ \t　]+[^\n\r,、。]{1,30}?\d+(?:号(?:室)?|階))?"), 0),
    RegexRule(
        "name_label", "氏名（ラベル近傍）", "name",
        _r(r"(?:氏\s?名|フリガナ|ふりがな|名\s?前)" + _SEP +
           rf"([{_KANJI}][{_KANJI}{_HIRA}{_KATA}]*"
           rf"(?:[\s　][{_KANJI}{_HIRA}{_KATA}]{{1,4}})?)"), 1),
    RegexRule(
        "mynumber", "マイナンバー候補", "personal",
        _r(r"(?<!\d)\d{4}\s?\d{4}\s?\d{4}(?!\d)"), 0),
    RegexRule(
        "name_kana", "フリガナ", "name",
        _r(r"(?:フリガナ|ふりがな|カナ)" + _SEP +
           rf"([{_KATA}ー]+(?:[\s　][{_KATA}ー]+)?)"), 1),
    # --- SNS label-proximity rules (all capture group 1) ---
    RegexRule("sns_twitter", "Twitter/Xアカウント", "contact",
              _r(r"(?:Twitter|X|ツイッター)" + _SEP + r"@([a-zA-Z0-9_]{1,15})", _I), 1),
    RegexRule("sns_github", "GitHubアカウント", "contact",
              _r(r"(?:GitHub|Github|github|ギットハブ)" + _SEP +
                 r"@?([a-zA-Z0-9](?:[a-zA-Z0-9]|-(?=[a-zA-Z0-9])){0,38})", _I), 1),
    RegexRule("sns_linkedin", "LinkedInアカウント", "contact",
              _r(r"(?:LinkedIn|linkedin|リンクトイン)" + _SEP +
                 r"(?:/in/)?([a-zA-Z0-9-]{3,100})", _I), 1),
    RegexRule("sns_instagram", "Instagramアカウント", "contact",
              _r(r"(?:Instagram|instagram|インスタグラム)" + _SEP +
                 r"@([a-zA-Z0-9_](?:[a-zA-Z0-9_.]{0,28}[a-zA-Z0-9_])?)", _I), 1),
    RegexRule("sns_facebook", "Facebookアカウント", "contact",
              _r(r"(?:Facebook|facebook|フェイスブック)" + _SEP +
                 r"@?([a-zA-Z0-9.]{3,50})", _I), 1),
    RegexRule("sns_qiita", "Qiitaアカウント", "contact",
              _r(r"(?:Qiita|qiita|キータ)" + _SEP + r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_zenn", "Zennアカウント", "contact",
              _r(r"(?:Zenn|zenn)" + _SEP + r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_note", "noteアカウント", "contact",
              _r(r"(?:note\.com|noteアカウント|noteプロフィール)" + _SEP +
                 r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_dribbble", "Dribbbleアカウント", "contact",
              _r(r"(?:Dribbble|dribbble|Dribble|ドリブル)" + _SEP +
                 r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_behance", "Behanceアカウント", "contact",
              _r(r"(?:Behance|behance|ビハンス)" + _SEP + r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_youtube", "YouTubeアカウント", "contact",
              _r(r"(?:YouTube|Youtube|youtube|ユーチューブ)" + _SEP +
                 r"@?([a-zA-Z0-9_.-]{1,50})", _I), 1),
    RegexRule("sns_tiktok", "TikTokアカウント", "contact",
              _r(r"(?:TikTok|tiktok|ティックトック)" + _SEP + r"@([a-zA-Z0-9_.]{1,24})", _I), 1),
    RegexRule("sns_threads", "Threadsアカウント", "contact",
              _r(r"(?:Threads|threads|スレッズ)" + _SEP + r"@([a-zA-Z0-9_.]{1,30})", _I), 1),
    RegexRule("sns_bluesky", "Blueskyアカウント", "contact",
              _r(r"(?:Bluesky|bluesky|bsky|ブルースカイ)" + _SEP +
                 r"@?([a-zA-Z0-9_.-]{1,50})", _I), 1),
    RegexRule("sns_mastodon", "Mastodonアカウント", "contact",
              _r(r"(?:Mastodon|mastodon|マストドン)" + _SEP +
                 r"@?([a-zA-Z0-9_]+(?:@[a-zA-Z0-9.-]+)?)", _I), 1),
    RegexRule("sns_pinterest", "Pinterestアカウント", "contact",
              _r(r"(?:Pinterest|pinterest|ピンタレスト)" + _SEP +
                 r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_wantedly", "Wantedlyアカウント", "contact",
              _r(r"(?:Wantedly|wantedly|ウォンテッドリー)" + _SEP +
                 r"@?([a-zA-Z0-9_-]{1,50})", _I), 1),
    RegexRule("sns_connpass", "connpassアカウント", "contact",
              _r(r"(?:connpass|Connpass)" + _SEP + r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
    RegexRule("sns_line", "LINE ID", "contact",
              _r(r"(?:LINE|Line|ライン)\s*ID" + _SEP + r"@?([a-zA-Z0-9_.-]{1,20})", _I), 1),
    RegexRule("sns_discord", "Discordアカウント", "contact",
              _r(r"(?:Discord|discord|ディスコード)" + _SEP + r"@?([a-zA-Z0-9_.#]{2,37})", _I), 1),
    RegexRule("sns_slack", "Slackアカウント", "contact",
              _r(r"(?:Slack|slack|スラック)" + _SEP + r"@?([a-zA-Z0-9_.-]{1,30})", _I), 1),
    RegexRule("sns_medium", "Mediumアカウント", "contact",
              _r(r"(?:Medium|medium)" + _SEP + r"@([a-zA-Z0-9_.-]{1,30})", _I), 1),
    RegexRule("sns_stackoverflow", "Stack Overflowアカウント", "contact",
              _r(r"(?:Stack\s*Overflow|stackoverflow)" + _SEP +
                 r"@?([a-zA-Z0-9_.-]{1,50})", _I), 1),
    RegexRule("sns_speakerdeck", "Speaker Deckアカウント", "contact",
              _r(r"(?:Speaker\s*Deck|speakerdeck)" + _SEP + r"@?([a-zA-Z0-9_-]{1,30})", _I), 1),
]

# Cheap literal prescreens: a rule can only match if one of its markers is
# present ("digit" = any ASCII digit; tuples are lowercase substrings checked
# against text.lower()).  Purely an optimization -- conservative by
# construction, so detection output is byte-identical with or without them.
RULE_SCREENS: dict[str, object] = {
    "email": ("@",),
    "url": ("http",),
    "phone": "digit", "postal": "digit", "birthday": "digit",
    "mynumber": "digit",
    "address": ("道", "都", "府", "県"),
    "name_label": ("氏", "名", "フリガナ", "ふりがな"),
    "name_kana": ("フリガナ", "ふりがな", "カナ"),
    "sns_twitter": ("twitter", "x", "ツイッター"),
    "sns_github": ("github", "ギットハブ"),
    "sns_linkedin": ("linkedin", "リンクトイン"),
    "sns_instagram": ("instagram", "インスタグラム"),
    "sns_facebook": ("facebook", "フェイスブック"),
    "sns_qiita": ("qiita", "キータ"),
    "sns_zenn": ("zenn",),
    "sns_note": ("note",),
    "sns_dribbble": ("dribb", "ドリブル"),
    "sns_behance": ("behance", "ビハンス"),
    "sns_youtube": ("youtube", "ユーチューブ"),
    "sns_tiktok": ("tiktok", "ティックトック"),
    "sns_threads": ("threads", "スレッズ"),
    "sns_bluesky": ("bluesky", "bsky", "ブルースカイ"),
    "sns_mastodon": ("mastodon", "マストドン"),
    "sns_pinterest": ("pinterest", "ピンタレスト"),
    "sns_wantedly": ("wantedly", "ウォンテッドリー"),
    "sns_connpass": ("connpass",),
    "sns_line": ("line", "ライン"),
    "sns_discord": ("discord", "ディスコード"),
    "sns_slack": ("slack", "スラック"),
    "sns_medium": ("medium",),
    "sns_stackoverflow": ("stack",),
    "sns_speakerdeck": ("speaker",),
}
HAS_DIGIT_RE = _r(r"\d")

# Context predicates used by the false-positive filters
# (cf. detection.ts:269-270, :413-476)
YEAR_RANGE_CONTEXT = _r(
    r"(?:19|20)\d{2}\s*(?:年\s*\d{0,2}\s*月?\s*)?[-–—~〜～]\s*"
    r"(?:(?:19|20)\d{2}|現在|至|present)", _I)
PII_LABEL_BEFORE = _r(r"(?:電話|TEL|tel|Tel|携帯|FAX|fax|連絡先|〒|郵便)\s*[：:・]?\s*$")
LINE_LEADING_YEAR = _r(r"^\s*(?:(?:19|20)\d{2}|(?:昭和|平成|令和)\s?\d{1,2})\s*[年/.\-]")
EMAIL_LOCALPART_BEFORE = _r(r"[a-zA-Z0-9._%+\-]@")
DOTTED_WORD_AFTER = _r(r"\.\w+")
# \Z, not $: Python $ also matches before a trailing newline, which would
# wrongly suppress an SNS handle on the line AFTER a URL (JS $ = end only)
URL_BEFORE = _r(r"https?://\S*\Z")
BIRTHDAY_LABEL_BEFORE = _r(r"(?:生年月日|誕生日|生まれ|DOB|Date of Birth)\s*[：:・]?\s*$", _I)
DOC_DATE_LABEL_BEFORE = _r(
    r"(?:作成日|提出日|更新日|記入日|発行日|印刷日|出力日|日付|現在|応募日|送付日|記載日)"
    r"\s*[：:・]?\s*$", _I)
WESTERN_YEAR_PREFIX = _r(r"^((?:19|20)\d{2})")
ERA_YEAR_PREFIX = _r(r"^(昭和|平成|令和)\s?(\d{1,2})")
ERA_BASE_YEAR = {"昭和": 1925, "平成": 1988, "令和": 2018}

# Prefecture extraction (detection.ts:273)
PREFECTURE_RE = _r(r"^(北海道|東京都|京都府|大阪府|[^\n\r  ]{2,3}県)")

# Name-boundary character classes (detection.ts:979-980)
NAME_BEF_OK = _r(r"[：:・、。，．\s　\n\r\t|｜/／()（）「」『』【】\-–—~\d.,;!?'\"]")
LABEL_ENDS = _r(r"[名者当員長任師生客様方人]")

# Name-context label predicates (detection.ts:1196, :1229)
NAME_ROLE_LABEL_BEFORE = _r(
    r"(?:氏名|名前|担当|著者|記入者|申請者|連絡先|責任者|作成者|報告者|代表者"
    r"|上司|部長|課長|主任|対応者)[：:・\s　/]*$")
NAME_LABEL_SCAN = _r(
    r"(?:氏名|名前|担当者?|著者|記入者|申請者|連絡先|責任者|作成者|報告者|代表者"
    r"|上司|所属長|管理者|承認者)\s*[：:・\s　/\t]\s*")

# Reading-map line rules (detection.ts:367, :371-373)
READING_NAME_LINE = _r(r"(?:氏\s?名|名\s?前)\s*[：:・]\s*(.+)")
READING_KANA_LINE = _r(rf"(?:フリガナ|ふりがな|カナ)\s*[：:・]\s*([{_KATA}ー{_HIRA}\s　]+)")

# Masking placeholders (redaction.ts:7-30)
PLACEHOLDERS: dict[str, str] = {
    "email": "[メール非公開]",
    "url": "[URL非公開]",
    "phone": "[電話番号非公開]",
    "postal": "[郵便番号非公開]",
    "birthday": "[年月日非公開]",
    "address": "[住所非公開]",
    "name_label": "[氏名非公開]",
    "name_dict": "[氏名非公開]",
    "name_context": "[氏名非公開]",
    "name_ai": "[氏名非公開]",
    "name_kana": "[氏名非公開]",
    "sns_ai": "[SNS非公開]",
    "sns_twitter": "[Twitter/X非公開]",
    "sns_github": "[GitHub非公開]",
    "sns_linkedin": "[LinkedIn非公開]",
    "sns_instagram": "[Instagram非公開]",
    "sns_facebook": "[Facebook非公開]",
    "mynumber": "[番号非公開]",
    "ner_person": "[氏名非公開]",
    "ner_org": "[組織名非公開]",
    "custom_keyword": "[指定語非公開]",
    "face": "[顔写真削除]",
}
DEFAULT_PLACEHOLDER = "[非公開]"
ADDRESS_DETAIL_PLACEHOLDER = "[住所詳細非公開]"

# Placeholder-span matcher (redaction.ts:33-34) -- used by validation tests
PLACEHOLDER_RE = _r(
    r"\[(?:メール非公開|URL非公開|電話番号非公開|郵便番号非公開|年月日非公開|生年月日非公開"
    r"|住所非公開|住所詳細非公開|氏名非公開|番号非公開|SNS非公開|Twitter/X非公開|GitHub非公開"
    r"|LinkedIn非公開|Instagram非公開|Facebook非公開|地名非公開|場所非公開|組織名非公開"
    r"|日付非公開|国名非公開|顔写真削除|指定語非公開|非公開"
    r"|Name Redacted|Email Redacted|Phone Redacted|Address Redacted|DOB Redacted"
    r"|URL Redacted)\]")

# Katakana -> romaji initial (detection.ts:280-352).  Stored compactly as
# (initial, katakana-chars) runs instead of one k:v pair per line.
_KANA_RUNS = [
    ("A", "ア"), ("I", "イ"), ("U", "ウ"), ("E", "エ"), ("O", "オ"),
    ("K", "カキクケコ"), ("G", "ガギグゲゴ"),
    ("S", "サシスセソ"), ("Z", "ザジズゼゾ"),
    ("T", "タツテト"), ("C", "チ"), ("D", "ダヂヅデド"),
    ("N", "ナニヌネノン"), ("H", "ハヒヘホ"), ("F", "フ"),
    ("B", "バビブベボ"), ("P", "パピプペポ"),
    ("M", "マミムメモ"), ("Y", "ヤユヨ"), ("R", "ラリルレロ"), ("W", "ワヲ"),
]
KANA_INITIAL_MAP: dict[str, str] = {
    ch: init for init, chars in _KANA_RUNS for ch in chars
}

# normalizeText translation table (detection.ts:15-23): fullwidth digits and
# letters -> ASCII (cp - 0xFEE0), fullwidth semicolon -> ';'.  The reference's
# U+FF1A replace maps '：'->'：' (a no-op) and is intentionally not present.
NORMALIZE_TABLE: dict[int, int] = {
    **{cp: cp - 0xFEE0 for cp in range(0xFF10, 0xFF1A)},   # ０-９
    **{cp: cp - 0xFEE0 for cp in range(0xFF21, 0xFF3B)},   # Ａ-Ｚ
    **{cp: cp - 0xFEE0 for cp in range(0xFF41, 0xFF5B)},   # ａ-ｚ
    0xFF1B: ord(";"),                                      # ；
}
MULTI_SPACE_RE = _r(r"[ \t]{2,}")

# Masking categories enabled by the default preset
# (constants.ts:132-142 DEFAULT_MASK): organization off, keepPrefecture on.
DEFAULT_MASK_CONFIG: dict[str, bool] = {
    "name": True, "contact": True, "address": True, "personal": True,
    "web": True, "organization": False, "custom": True,
}
DEFAULT_KEEP_PREFECTURE = True
DEFAULT_NAME_INITIAL = False

# The reference's three mask presets (constants.ts:151-204): category
# enable-map plus the keepPrefecture/nameInitial options per level.
MASK_PRESETS: dict[str, dict] = {
    "basic": {  # 氏名 + 連絡先のみ
        "mask": {"name": True, "contact": True, "address": False,
                 "personal": False, "web": False, "organization": False,
                 "custom": True},
        "keep_prefecture": True, "name_initial": False, "level": 1,
    },
    "std": {   # + 住所・年月日・URL
        "mask": {"name": True, "contact": True, "address": True,
                 "personal": True, "web": True, "organization": False,
                 "custom": True},
        "keep_prefecture": True, "name_initial": False, "level": 2,
    },
    "strict": {  # 組織名含む全項目
        "mask": {"name": True, "contact": True, "address": True,
                 "personal": True, "web": True, "organization": True,
                 "custom": True},
        "keep_prefecture": False, "name_initial": False, "level": 3,
    },
}

# Pinned "current year" replacing the reference's `new Date()` call in the
# birthday-recency filter (detection.ts:473) so results never rot.
DEFAULT_CURRENT_YEAR = 2026
