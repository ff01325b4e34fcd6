"""Ingest-side operators: format -> clean text (SURVEY.md §2.1-2.2).

Re-expressions of the reference's parser post-processing for the formats
that have transcript analogs:

* ``ingest_post_clean``   -- the parseFile post-normalize chain
  (RedactPro.tsx:1628): strip trailing whitespace per line, collapse 3+
  newlines to 2, strip leading newlines, trim end.  Pure native
  ``regexp_replace`` chain (codegen, SQL-expressible).
* ``csv_to_pipe_lines``   -- parseCSV's row rendering ``a | b | c``
  (RedactPro.tsx:1537): ``concat_ws`` over columns.
* ``flatten_json_text``   -- parseJSON's recursive string-value flattening
  to ``path: value`` lines (RedactPro.tsx:1564-1578); handles tool-call
  payloads embedded in transcript turns.
* ``strip_html``          -- extractTextFromHTML (RedactPro.tsx:1402-1436):
  noise tags dropped, block tags break lines, ``li`` -> ``・``, ``td`` ->
  `` | ``, anchor hrefs appended, title prefixed.
* ``strip_rtf``           -- parseRTF (RedactPro.tsx:1543-1563): header
  group removal, ``\\par``/``\\line``/``\\tab`` conversion, ``\\'XX`` /
  ``\\uN`` decoding, control-word and brace stripping, newline collapse.
* ``detect_encoding``     -- the UTF-8 / Shift-JIS / EUC-JP sniffer
  (RedactPro.tsx:879): BOM checks then byte-pattern scoring over the first
  10 KB, for ``binaryFile``-sourced ingest.
* ``clean_content``       -- the export-side redaction-only-line removal
  (RedactPro.tsx:3078-3093).
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType



# the exact character set JS String.prototype.trim strips (WhiteSpace +
# LineTerminator) -- explicit so the DuckDB oracle can trim the same set;
# Python's argless strip() would strip a slightly different set (e.g.
# U+001C-1F) and silently diverge
JS_TRIM_CHARS = ("\t\n\x0b\f\r \xa0\u1680\u2000\u2001\u2002\u2003\u2004"
                 "\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f"
                 "\u205f\u3000\ufeff")

# JS \s minus \n, as an explicit class usable identically by Java and RE2
# (the reference's /[^\S\n]+$/gm): includes \r -- CRLF input must lose its
# trailing \r per line or the \n{3,} collapse never fires -- plus U+3000
# and the rest of the JS whitespace set
_WS_NOT_NL = JS_TRIM_CHARS.replace("\n", "")


def ingest_post_clean(col: Column) -> Column:
    """Native projection of the parse post-clean (RedactPro.tsx:1628):
    strip trailing whitespace-except-newline per line (JS ``[^\\S\\n]+$``m
    via the explicit class, lookahead-free so the DuckDB twin can run the
    identical regex), collapse 3+ newlines, strip leading newlines,
    trimEnd."""
    c = F.regexp_replace(col, f"[{_WS_NOT_NL}]+\n", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.regexp_replace(c, r"^\n+", "")
    c = F.regexp_replace(c, f"[{_WS_NOT_NL}\n]+$", "")
    return c


def csv_to_pipe_lines(df: DataFrame, cols: Optional[list[str]] = None) -> DataFrame:
    """Rows -> one ``a | b | c`` line per row (parseCSV analog).

    NULL cells render as empty strings (concat_ws would silently SKIP
    them, shifting every later field one position left), and all-blank
    rows are dropped like the reference's ``r.some(c => c.trim())``
    filter -- using the JS trim character set (a cell holding only
    U+3000/NBSP is blank to ``String.prototype.trim`` but not to ASCII
    ``F.trim``, so the ASCII version would keep rows the reference
    drops)."""
    cols = cols or df.columns
    cells = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    trim_re = f"^[{JS_TRIM_CHARS}]+|[{JS_TRIM_CHARS}]+$"
    any_content = F.exists(F.array(*cells),
                           lambda c: F.regexp_replace(c, trim_re, "") != "")
    return (df.filter(any_content)
            .select(F.concat_ws(" | ", *cells).alias("line")))


# ─── JSON flattening (parseJSON analog) ───

def _flatten_json(obj, path: str, out: list[str]) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten_json(v, f"{path}.{k}" if path else str(k), out)
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            _flatten_json(v, f"{path}[{i}]", out)
    elif isinstance(obj, str):
        out.append(f"{path}: {obj}")
    elif obj is not None:
        out.append(f"{path}: {json.dumps(obj)}")


@pandas_udf(StringType())
def flatten_json_text(texts: pd.Series) -> pd.Series:
    """JSON string -> ``path: value`` lines; non-JSON passes through."""
    out = []
    for t in texts.fillna(""):
        s = t.strip()
        if s[:1] in ("{", "["):
            try:
                lines: list[str] = []
                # parse_constant: JSON.parse rejects NaN/Infinity literals,
                # so the reference passes such text through raw -- match it
                obj = json.loads(s, parse_constant=_reject_constant)
                _flatten_json(obj, "", lines)
                out.append("\n".join(lines))
                continue
            except (json.JSONDecodeError, RecursionError, ValueError):
                pass
        out.append(t)
    return pd.Series(out)


def _reject_constant(const: str):
    raise ValueError(f"non-JSON constant {const!r}")


# ─── HTML stripping (extractTextFromHTML analog) ───

_NOISE_TAGS = {"script", "style", "noscript", "iframe", "svg", "path",
               "nav", "meta", "link"}
_BLOCK_TAGS = {"p", "div", "section", "article", "header", "footer", "main",
               "br", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "ul", "ol",
               "table", "blockquote", "pre"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.parts: list[str] = []
        self.skip_depth = 0
        self.title: list[str] = []
        self.in_title = False
        self.href: Optional[str] = None
        self.meta_desc: str = ""
        self.og_title: str = ""

    def handle_starttag(self, tag, attrs):
        if tag in _NOISE_TAGS:
            if tag == "meta":
                # reference prefix: meta description / og:title (:1427-1432)
                a = dict(attrs)
                if a.get("name") == "description" and a.get("content"):
                    self.meta_desc = a["content"]
                elif a.get("property") == "og:title" and a.get("content"):
                    self.og_title = a["content"]
            if tag not in ("meta", "link", "br"):
                self.skip_depth += 1
            return
        if self.skip_depth:  # structure inside skipped subtrees must not leak
            return
        if tag == "title":
            self.in_title = True
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")
        elif tag == "hr":
            self.parts.append("\n---\n")
        elif tag == "li":
            self.parts.append("\n・")
        elif tag == "td" or tag == "th":
            self.parts.append(" | ")
        elif tag == "a":
            self.href = dict(attrs).get("href")

    def handle_endtag(self, tag):
        if tag in _NOISE_TAGS and tag not in ("meta", "link", "br"):
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "title":
            self.in_title = False
        if tag == "a" and self.href and self.href.startswith("http"):
            self.parts.append(f" ({self.href})")
            self.href = None
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title.append(data.strip())
        else:
            self.parts.append(data)


_MANY_NL = re.compile(r"\n{3,}")
_MULTI_SPACE_TAB = re.compile(r"[ \t]{2,}")


@pandas_udf(StringType())
def strip_html(texts: pd.Series) -> pd.Series:
    """Stream-parser approximation of extractTextFromHTML
    (RedactPro.tsx:1402-1436): noise subtrees (incl. nav) dropped, block
    tags break lines, hr -> ---, li/td markers, http hrefs appended,
    title + og:title + meta description prefixed above a --- divider,
    newline collapse + space-run collapse + trim.  (The reference walks a
    DOM and trims per element; this is the streaming analog.)"""
    out = []
    for t in texts.fillna(""):
        if "<" not in t:
            out.append(t)
            continue
        p = _TextExtractor()
        try:
            p.feed(t)
            p.close()
        except Exception:
            out.append(t)
            continue
        body = "".join(p.parts)
        body = _MANY_NL.sub("\n\n", _MULTI_SPACE_TAB.sub(" ", body)).strip()
        title = " ".join(x for x in p.title if x)
        prefix = ""
        if title:
            prefix += title + "\n"
        if p.og_title and p.og_title != title:
            prefix += p.og_title + "\n"
        if p.meta_desc:
            prefix += p.meta_desc + "\n"
        if prefix:
            prefix += "\n---\n\n"
        out.append(prefix + body)
    return pd.Series(out)


# ─── RTF stripping (parseRTF analog, RedactPro.tsx:1543-1563) ───

_RTF_GROUPS = [
    re.compile(r"\{\\fonttbl[^}]*(?:\{[^}]*\})*[^}]*\}"),
    re.compile(r"\{\\colortbl[^}]*\}"),
    re.compile(r"\{\\stylesheet[^}]*(?:\{[^}]*\})*[^}]*\}"),
    re.compile(r"\{\\info[^}]*(?:\{[^}]*\})*[^}]*\}"),
]
_RTF_PAR = re.compile(r"\\par[d]?\s?")
_RTF_LINE = re.compile(r"\\line\s?")
_RTF_TAB = re.compile(r"\\tab\s?")
_RTF_ESCNL = re.compile(r"\\\n")
_RTF_HEX = re.compile(r"\\'([0-9a-fA-F]{2})")
_RTF_UNI = re.compile(r"\\u([0-9]+)\s?\??")  # JS \d is ASCII
_RTF_CTRL = re.compile(r"\\[a-z]+[-]?[0-9]*\s?")  # JS \d is ASCII
_RTF_BRACES = re.compile(r"[{}]")
_RTF_MANY_NL = re.compile(r"\n{3,}")


def _rtf_unichar(m: re.Match) -> str:
    # JS String.fromCharCode applies ToUint16; map the (crafted-input-only)
    # lone-surrogate range to U+FFFD so the result stays Arrow-encodable
    cp = int(m.group(1)) & 0xFFFF
    return "\ufffd" if 0xD800 <= cp <= 0xDFFF else chr(cp)


def strip_rtf_text(text: str) -> str:
    """Basic RTF text extraction (parseRTF, RedactPro.tsx:1543-1563):
    drop header groups, convert \\par/\\line/\\tab, decode \\'XX and \\uN,
    strip remaining control words and braces, collapse 3+ newlines, trim."""
    r = text
    for g in _RTF_GROUPS:
        r = g.sub("", r)
    r = _RTF_PAR.sub("\n", r)
    r = _RTF_LINE.sub("\n", r)
    r = _RTF_TAB.sub("\t", r)
    r = _RTF_ESCNL.sub("\n", r)
    r = _RTF_HEX.sub(lambda m: chr(int(m.group(1), 16)), r)
    r = _RTF_UNI.sub(_rtf_unichar, r)
    r = _RTF_CTRL.sub("", r)
    r = _RTF_BRACES.sub("", r)
    return _RTF_MANY_NL.sub("\n\n", r).strip(JS_TRIM_CHARS)


@pandas_udf(StringType())
def strip_rtf(texts: pd.Series) -> pd.Series:
    return texts.fillna("").map(strip_rtf_text)


# ─── Encoding detection (RedactPro.tsx:879 analog) ───

def detect_encoding(data: bytes) -> str:
    """Heuristic UTF-8 / Shift-JIS / EUC-JP sniffing over the first 10 KB."""
    head = data[:10240]
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if head.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError as e:
        # the 10 KB head can cut a multibyte sequence in half; a decode
        # error only AT THE TRUNCATION POINT is still valid UTF-8 (without
        # this, every large UTF-8 file risks whole-file mojibake via a
        # false Shift-JIS classification)
        if e.reason == "unexpected end of data" and e.start >= len(head) - 3:
            return "utf-8"
    scores = {"shift_jis": 0, "euc_jp": 0}
    i = 0
    while i < len(head) - 1:
        b1, b2 = head[i], head[i + 1]
        if 0x81 <= b1 <= 0x9F or 0xE0 <= b1 <= 0xEF:
            if 0x40 <= b2 <= 0xFC and b2 != 0x7F:
                scores["shift_jis"] += 1
        if 0xA1 <= b1 <= 0xFE and 0xA1 <= b2 <= 0xFE:
            scores["euc_jp"] += 1
        i += 1
    best = max(scores, key=lambda k: scores[k])
    return best if scores[best] > 0 else "utf-8"


@pandas_udf(StringType())
def decode_binary_text(payloads: pd.Series) -> pd.Series:
    """binaryFile content -> decoded text via the encoding sniffer."""
    out = []
    for p in payloads:
        if p is None:
            out.append("")
            continue
        b = bytes(p)
        enc = detect_encoding(b)
        try:
            out.append(b.decode(enc, errors="replace"))
        except LookupError:
            out.append(b.decode("utf-8", errors="replace"))
    return pd.Series(out)


# ─── Export-side content cleanup (cleanContent, RedactPro.tsx:3078-3093) ───

# reference regexes verbatim (JS \d/\s translated per rules.py conventions)
_KV_LINE = re.compile(r"^(.+?)[：:]\s*(.+)$")
_PAGE_MARKER_LINE = re.compile(r"^-{2,}\s*Page\s+[0-9]+\s*-{2,}$")
_SHEET_MARKER_LINE = re.compile(r"^-{2,}\s*Sheet:\s*.+\s*-{2,}$")


def _drop_line(line: str, remove_redaction_only: bool) -> bool:
    from ..functions.oracle import is_pii_value

    trimmed = line.strip(JS_TRIM_CHARS)
    if not trimmed:
        return False  # blank lines are kept (reference returns true)
    if _PAGE_MARKER_LINE.match(trimmed) or _SHEET_MARKER_LINE.match(trimmed):
        return True
    if remove_redaction_only:
        kv = _KV_LINE.match(trimmed)
        if kv and is_pii_value(kv.group(2)):
            return True
        if is_pii_value(trimmed):
            return True
    return False


def make_clean_content_udf(remove_redaction_only: bool = True):
    """Full reference cleanContent: page/sheet marker lines always drop;
    redaction-only lines (bare, or the value side of a ``key: value``
    line) drop when ``remove_redaction_only``."""

    @pandas_udf(StringType())
    def clean(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            kept = [ln for ln in t.split("\n")
                    if not _drop_line(ln, remove_redaction_only)]
            out.append("\n".join(kept))
        return pd.Series(out)

    return clean


clean_content = make_clean_content_udf()
