"""Unified payload dispatch: one pure function from raw bytes to the
north-star output record.

``extract_payload`` is the single function the Spark layer vectorizes —
it discriminates HTML vs PDF by magic bytes (FIXTURES.md §1: PDF payloads
ride in the same ``html`` binary column) and returns a plain dict with
stable key order, ready for Arrow serialization.

Output record (north-star schema + lineage counters):
  url, extracted_text, spans[(start,end,type)], lang, parse_error,
  n_blocks, n_bytes_in, n_bytes_out
"""

from __future__ import annotations

from typing import Optional

from .html_extract import ExtractResult, extract_html
from .langid import detect_lang
from .pdf_extract import extract_pdf, is_pdf

# Span types emitted for PDF items map onto the same enum as HTML items.
_PDF_TYPE_MAP = {"header": "header", "paragraph": "paragraph"}


def extract_payload(payload: Optional[bytes], url: str = "",
                    lang_hint: Optional[str] = None) -> dict:
    n_in = len(payload) if payload is not None else 0
    if payload is None or len(payload) == 0:
        return _record(url, "", [], lang_hint or "und", "EmptyPayload", 0, n_in)
    if is_pdf(payload):
        pr = extract_pdf(payload)
        if pr.error is not None:
            return _record(url, "", [], lang_hint or "und", pr.error, 0, n_in)
        spans = []
        pos = 0
        first = True
        for typ, txt, _page, _size in pr.items:
            if not txt:
                continue
            if not first:
                pos += 2
            first = False
            spans.append((pos, pos + len(txt), _PDF_TYPE_MAP.get(typ, "paragraph")))
            pos += len(txt)
        lang = lang_hint or detect_lang(pr.text)
        return _record(url, pr.text, spans, lang, None, len(pr.items), n_in)
    res: ExtractResult = extract_html(bytes(payload))
    if res.error is not None:
        return _record(url, "", [], lang_hint or "und", res.error, 0, n_in)
    lang = lang_hint or detect_lang(res.text)
    return _record(url, res.text, res.spans, lang, None, len(res.items), n_in)


def _record(url, text, spans, lang, error, n_blocks, n_in) -> dict:
    return {
        "url": url,
        "extracted_text": text,
        "spans": [
            {"start": int(s), "end": int(e), "type": t} for s, e, t in spans
        ],
        "lang": lang,
        "parse_error": error,
        "n_blocks": int(n_blocks),
        "n_bytes_in": int(n_in),
        "n_bytes_out": len(text.encode("utf-8")),
    }
