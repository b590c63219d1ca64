"""t3 property tests (hypothesis): the extractor is total, pure, and
span-consistent on ARBITRARY byte inputs — not just the curated fixtures.
These are the invariants that keep a 10^12-doc run from ever failing a
task on hostile input."""

from hypothesis import given, settings
from hypothesis import strategies as st

from document_extractor_spark.extractor.core import extract_payload
from document_extractor_spark.extractor.html_extract import (
    extract_html,
    refine_table_html,
)

# Mix of raw bytes, ASCII-ish text, and tag-soup fragments.
_tagsoup = st.text(
    alphabet=st.sampled_from(list("<>/abcdiv ptable&#;\"'=\n-!0159")),
    max_size=400,
)
_payloads = st.one_of(
    st.binary(max_size=400),
    _tagsoup.map(lambda s: s.encode("utf-8")),
    st.text(max_size=200).map(lambda s: f"<html><body><p>{s}</p></body></html>".encode()),
)


@settings(max_examples=300, deadline=None)
@given(_payloads)
def test_extract_payload_total(payload):
    """Never raises; always returns the full record shape; error XOR text."""
    rec = extract_payload(payload, url="https://prop.test/x")
    assert set(rec) >= {"url", "extracted_text", "spans", "lang",
                        "parse_error", "n_blocks", "n_bytes_in"}
    assert rec["n_bytes_in"] == len(payload)
    if rec["parse_error"] is not None:
        assert rec["extracted_text"] == ""


@settings(max_examples=300, deadline=None)
@given(_payloads)
def test_extract_payload_deterministic(payload):
    assert extract_payload(payload, url="u") == extract_payload(payload, url="u")


@settings(max_examples=200, deadline=None)
@given(_tagsoup)
def test_spans_tile_text(soup):
    """For any tag soup: spans reconstruct extracted_text exactly."""
    res = extract_html(f"<html><body><main>{soup}</main></body></html>".encode())
    assert res.error is None
    parts = [res.text[s:e] for s, e, _t in res.spans]
    assert "\n\n".join(parts) == res.text


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="<>&", blacklist_categories=("Cs",)),
    max_size=12), min_size=1, max_size=5), min_size=1, max_size=5))
def test_refine_table_idempotent_any_grid(rows):
    html = "<table>" + "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
        for row in rows
    ) + "</table>"
    once = refine_table_html(html)
    assert refine_table_html(once) == once


@settings(max_examples=200, deadline=None)
@given(_payloads)
def test_extract_payload_total_with_items_layout(payload):
    """The opt-in item/layout path (positions, margins) is as total as
    the lean path: never raises, position pcts stay in [0, 100] and
    margins are None or in-range, on arbitrary bytes."""
    rec = extract_payload(payload, url="u", include_items=True,
                          include_layout=True, emit_chrome=True)
    for it in rec.get("content_items") or []:
        pos = it["position"]
        if pos is not None:
            for k in ("x_start", "y_start", "x_end", "y_end"):
                assert 0.0 <= pos[k] <= 100.0
    lay = rec["layout"]
    for k in ("margin_top_percent", "margin_bottom_percent",
              "margin_left_percent", "margin_right_percent"):
        assert lay[k] is None or 0.0 <= lay[k] <= 100.0


def test_pdf_degenerate_mediabox_total():
    """A zero-area mediabox must not divide by zero — positions clamp
    to 0 and extraction still returns the text."""
    from document_extractor_spark.sources.generator import build_pdf

    raw = build_pdf([[(72, 720, 12, ["hello world"])]])
    raw = raw.replace(b"/MediaBox [0 0 612 792]", b"/MediaBox [0 0 0 0]")
    rec = extract_payload(raw, url="u", include_items=True,
                          include_layout=True)
    assert rec["parse_error"] is None
    assert "hello world" in rec["extracted_text"]
    pos = rec["content_items"][0]["position"]
    assert all(0.0 <= pos[k] <= 100.0 for k in pos)
