"""Optional AI-based PII enrichment (reference parity, off by default).

Re-expresses the reference's LLM-assisted detection pass
(``parseAIDetectionJson`` /root/reference/src/app/RedactPro.tsx:492-503 and
``detectWithAI`` :505-635) as a pluggable, deterministic-by-injection
stage: the network call is abstracted behind a ``caller`` callable
(``truncated_text -> raw model output str``), so tests inject a
deterministic fake and the default pipeline never touches a network.

Semantics preserved from the reference:

* the prompt sees only the first 8 000 chars, but the existence check runs
  against the FULL text (:559, :572 ``text.includes(item.value)``);
* items must be dicts with a string ``type`` and a string ``value`` of
  length >= 2 (:543-546);
* in-response dedup on ``ai:{type}:{value}`` (:547-549);
* ``person_name`` -> Detection(type='name_ai', category='name',
  confidence 0.95); ``sns_account`` -> Detection(type='sns_ai',
  category='contact', confidence 0.9);
* ids are ``ai_{n}`` / ``ai_sns_{n}`` where ``n`` is the length of the
  combined results list at push time (:561, :574 -- a shared counter);
* primary failure falls back to a second model once (:605-635); both
  failing yields zero detections plus an error string, never an exception.

Merging into the base (regex/dict/heuristic) detections uses the existing
first-wins ``merge_detections`` (oracle.py), so anything the deterministic
engine already found keeps its id/type and the AI duplicate is dropped --
the reference merges AI results the same way (base wins on
``category:value``).
"""

from __future__ import annotations

import json
import re
from typing import Callable, Optional

from .oracle import Detection

AI_TRUNCATE_CHARS = 8000

_JSON_ARRAY_RE = re.compile(r"\[[\s\S]*\]")

AiCaller = Callable[[str], str]


def parse_ai_detection_json(raw) -> tuple[bool, object]:
    """(ok, items | failure_reason) -- RedactPro.tsx:492-503."""
    if not raw or not isinstance(raw, str):
        return False, "empty"
    m = _JSON_ARRAY_RE.search(raw)
    if not m:
        return False, "no_json"
    try:
        items = json.loads(m.group(0))
    except (json.JSONDecodeError, RecursionError):
        return False, "json_parse"
    if not isinstance(items, list):
        return False, "not_array"
    return True, items


def ai_items_to_detections(items: list, text: str) -> list[Detection]:
    """Validated items -> Detections, with the reference's existence check,
    per-response dedup, and shared-counter ids (RedactPro.tsx:540-580)."""
    results: list[Detection] = []
    seen: set[str] = set()
    for item in items:
        if not isinstance(item, dict):
            continue
        value, typ = item.get("value"), item.get("type")
        if not isinstance(value, str) or len(value) < 2:
            continue
        if not isinstance(typ, str):
            continue
        k = f"ai:{typ}:{value}"
        if k in seen:
            continue
        seen.add(k)
        if typ == "person_name":
            if value in text:
                results.append(Detection(
                    id=f"ai_{len(results)}", type="name_ai",
                    label="氏名（AI検出）", category="name", value=value,
                    source="ai", confidence=0.95, enabled=True))
        elif typ == "sns_account":
            if value in text:
                results.append(Detection(
                    id=f"ai_sns_{len(results)}", type="sns_ai",
                    label="SNSアカウント", category="contact", value=value,
                    source="ai", confidence=0.9, enabled=True))
    return results


def detect_with_ai(
    text: str,
    caller: AiCaller,
    fallback_caller: Optional[AiCaller] = None,
) -> tuple[list[Detection], Optional[str]]:
    """Run the AI pass; never raises.  Returns (detections, error|None).

    ``caller`` receives the truncated text and returns the raw model
    output; a raised exception or an unparseable response triggers one
    fallback attempt (RedactPro.tsx:605-635), after which the stage
    degrades to zero detections with an error string."""
    truncated = text[:AI_TRUNCATE_CHARS]

    def run_once(c: AiCaller) -> tuple[bool, object]:
        raw = c(truncated)
        ok, parsed = parse_ai_detection_json(raw)
        if not ok:
            return False, parsed
        return True, ai_items_to_detections(parsed, text)

    reason: object = "error"
    try:
        ok, out = run_once(caller)
        if ok:
            return out, None
        reason = out
    except Exception as e:  # model/transport failure -> fallback, not crash
        reason = str(e) or "error"

    if fallback_caller is not None:
        try:
            ok, out = run_once(fallback_caller)
            if ok:
                return out, None
            return [], f"ai_failed(primary->fallback): {out}"
        except Exception as e:
            return [], f"ai_failed(primary->fallback): {e}"

    return [], f"ai_failed: {reason}"
