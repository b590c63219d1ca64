"""Deterministic language identification — stopword + script heuristic.

The reference carries no language logic (its GPT-4V prompt is language
agnostic); the north-star output schema has a ``lang`` column, so the
engine provides a lightweight deterministic identifier: Unicode-script
detection for CJK/Arabic/Cyrillic, stopword-hit scoring for a closed set
of Latin-script languages. Pure function; ties broken by fixed language
order for byte-stable output.
"""

from __future__ import annotations

import re

_STOPWORDS = {
    "en": {"the", "and", "is", "of", "to", "in", "that", "it", "with", "as",
           "for", "was", "on", "are", "this", "be", "by", "an", "not", "or"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "von", "auf",
           "für", "eine", "einem", "durch", "wenn", "aber", "über", "unter",
           "zwischen", "während", "im"},
    "fr": {"le", "la", "les", "et", "est", "dans", "pour", "une", "des",
           "que", "qui", "avec", "sur", "pas", "plus", "par", "mais",
           "comme", "tout", "du"},
    "es": {"el", "la", "los", "las", "es", "en", "de", "para", "una",
           "que", "con", "por", "no", "más", "pero", "como", "todo",
           "hacer", "durante", "y"},
}
_LANG_ORDER = ["en", "de", "fr", "es"]

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _script_lang(text: str) -> str | None:
    """Script-range vote over the first 400 chars."""
    counts = {"cjk": 0, "kana": 0, "hangul": 0, "arabic": 0, "cyrillic": 0}
    sample = text[:400]
    for ch in sample:
        o = ord(ch)
        if 0x4E00 <= o <= 0x9FFF:
            counts["cjk"] += 1
        elif 0x3040 <= o <= 0x30FF:
            counts["kana"] += 1
        elif 0xAC00 <= o <= 0xD7AF:
            counts["hangul"] += 1
        elif 0x0600 <= o <= 0x06FF:
            counts["arabic"] += 1
        elif 0x0400 <= o <= 0x04FF:
            counts["cyrillic"] += 1
    n = max(len(sample), 1)
    if counts["kana"] > 0 and (counts["kana"] + counts["cjk"]) / n > 0.25:
        return "ja"
    if counts["hangul"] / n > 0.25:
        return "ko"
    if counts["cjk"] / n > 0.25:
        return "zh"
    if counts["arabic"] / n > 0.25:
        return "ar"
    if counts["cyrillic"] / n > 0.25:
        return "ru"
    return None


def detect_lang(text: str, default: str = "und") -> str:
    if not text:
        return default
    script = _script_lang(text)
    if script is not None:
        return script
    words = [w.lower() for w in _WORD_RE.findall(text[:2000])]
    if not words:
        return default
    best_lang, best_hits = default, 0
    for lang in _LANG_ORDER:
        sw = _STOPWORDS[lang]
        hits = sum(1 for w in words if w in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else default
