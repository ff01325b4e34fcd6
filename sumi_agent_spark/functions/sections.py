"""Document section structuring (parseSections, RedactPro.tsx:2991-3033).

Splits text on Japanese resume-style section markers (■/【】/markdown
headers/label lines/dividers) and classifies each section.  Per SURVEY.md
§2.2 this is optional for transcripts; exposed both as a pure function and
as a pandas UDF returning ``array<struct<type,title,content>>`` for
document-shaped tables.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType


class Section(NamedTuple):
    type: str
    title: str
    content: str


_HEADER_RE = re.compile(
    r"^(?:[■●◆◇▶▷☆★━─═]+\s*|【(.+?)】|〈(.+?)〉|《(.+?)》|#{1,3}\s+)(.+?)$")
_LABEL_RE = re.compile(
    r"^(職務経歴書?|履歴書?|学歴|職歴|資格|免許|スキル|自己PR|志望動機|職務要約"
    r"|経歴概要|キャリアサマリ|プロジェクト|業務実績|語学|活動|その他|基本情報"
    r"|個人情報|連絡先)\s*$")
_DIVIDER_RE = re.compile(r"^[-=─━]{3,}$")

_TYPE_RULES = [
    ("summary", re.compile(r"職務要約|概要|サマリ|summary", re.I)),
    ("experience", re.compile(r"職務経歴|職歴|キャリア|経歴|プロジェクト|業務", re.I)),
    ("education", re.compile(r"学歴|教育", re.I)),
    ("skills", re.compile(r"資格|免許|スキル|技術|語学|certification", re.I)),
    ("pr", re.compile(r"自己PR|志望|アピール|強み", re.I)),
]


def parse_sections(text: str) -> list[Section]:
    sections: list[dict] = []
    cur: dict | None = None
    for line in text.split("\n"):
        hm = _HEADER_RE.match(line)
        lm = _LABEL_RE.match(line)
        is_div = bool(_DIVIDER_RE.match(line.strip()))
        if hm or lm:
            if cur and cur["lines"]:
                sections.append(cur)
            title = (next(g for g in hm.groups() if g is not None).strip()
                     if hm else lm.group(1).strip())
            cur = {"title": title, "lines": []}
        elif is_div:
            if cur and cur["lines"]:
                sections.append(cur)
                cur = {"title": "", "lines": []}
        else:
            if cur is None:
                cur = {"title": "", "lines": []}
            cur["lines"].append(line)
    if cur and cur["lines"]:
        sections.append(cur)

    out: list[Section] = []
    for i, s in enumerate(sections):
        content = "\n".join(s["lines"]).strip()
        if not content:
            continue
        t = s["title"]
        stype = "other"
        for name, rx in _TYPE_RULES:
            if rx.search(t):
                stype = name
                break
        else:
            if not t and i == 0:
                stype = "header"
        out.append(Section(stype, t, content))
    return out


SECTION_TYPE = ArrayType(StructType([
    StructField("type", StringType()),
    StructField("title", StringType()),
    StructField("content", StringType()),
]))


@pandas_udf(SECTION_TYPE)
def parse_sections_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([[s._asdict() for s in parse_sections(t)]
                      for t in texts.fillna("")])
