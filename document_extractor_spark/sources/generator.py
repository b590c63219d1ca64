"""Deterministic synthetic corpus generator — fixtures + bench-scale pages.

Produces rows of exactly the ``input_hint`` shape from BASELINE.json:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Two tiers (FIXTURES.md §5):

- ``fixture_rows()`` — one page per archetype (FIXTURES.md §3): boilerplate
  chrome, KV records (blank-line and repeated-key split, reference test
  content patterns from ``key_value_converter.py:406-483``), section-table
  reorder pages (``test_structure_fixer.py:14-43``), merged-cell tables,
  adjacent tables, two-column layouts, malformed HTML, CJK text, synthetic
  PDFs. Byte-stable across runs: pure literals + seeded RNG.

- ``corpus_rows(n, seed)`` — bench/skew corpus: templated article pages
  with Zipfian host distribution (exercises salting), ~5% PDF payloads,
  spread over 8 warc days for Iceberg-style partitioning.

No external data; everything synthesized locally (north-rule constraint).
"""

from __future__ import annotations

import datetime as dt
import random
import zlib
from typing import Iterator

# ---------------------------------------------------------------------------
# Tiny PDF writer (closed subset matching extractor/pdf_extract.py)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: list[list[tuple]], compress: bool = False,
              info: dict | None = None,
              outlines: list | None = None) -> bytes:
    """pages: list of page specs; each page is a list of text ops
    ``(x, y, size, lines)`` — one positioned block whose lines advance by
    ``T*`` with leading = 1.2 × size. ``info`` adds a ``/Info`` dict
    (Title/Author/… — S1 metadata, pdf_to_png_converter.py:198-236).
    ``outlines`` adds a real ``/Outlines`` bookmark tree (PDF 32000-1
    §12.3.3): a list of ``(title, page_idx, children)`` nodes, children
    in the same shape — /First /Last /Next /Prev /Parent /Count links
    and ``[page /Fit]`` destinations, like any print-oriented PDF
    carries."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cat = add(b"")  # placeholder for catalog (obj 1)
    pages_obj = add(b"")  # placeholder for pages (obj 2)
    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    kid_ids = []
    for page in pages:
        parts = []
        for (x, y, size, lines) in page:
            leading = size * 1.2
            parts.append(f"BT /F1 {size:g} Tf {leading:g} TL {x:g} {y:g} Td")
            for i, line in enumerate(lines):
                if i > 0:
                    parts.append("T*")
                parts.append(f"({_pdf_escape(line)}) Tj")
            parts.append("ET")
        stream = "\n".join(parts).encode("latin-1", errors="replace")
        filt = b""
        if compress:
            stream = zlib.compress(stream, 6)
            filt = b"/Filter /FlateDecode "
        cid = add(
            b"<< "
            + filt
            + b"/Length "
            + str(len(stream)).encode()
            + b" >>\nstream\n"
            + stream
            + b"\nendstream"
        )
        pid = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 "
            + str(font).encode()
            + b" 0 R >> >> /Contents "
            + str(cid).encode()
            + b" 0 R >>"
        )
        kid_ids.append(pid)
    kids = b" ".join(str(k).encode() + b" 0 R" for k in kid_ids)
    objs[pages_obj - 1] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(kid_ids)).encode() + b" >>"
    )
    outline_ref = b""
    if outlines:
        root_id = add(b"")

        def emit(items: list, parent_id: int) -> list[int]:
            ids = [add(b"") for _ in items]
            for idx, ((title, pg, children), oid) in enumerate(
                    zip(items, ids)):
                kids_part = b""
                if children:
                    cids = emit(children, oid)
                    kids_part = (
                        b" /First " + str(cids[0]).encode()
                        + b" 0 R /Last " + str(cids[-1]).encode()
                        + b" 0 R /Count " + str(len(children)).encode())
                links = b""
                if idx > 0:
                    links += b" /Prev " + str(ids[idx - 1]).encode() + b" 0 R"
                if idx < len(ids) - 1:
                    links += b" /Next " + str(ids[idx + 1]).encode() + b" 0 R"
                objs[oid - 1] = (
                    b"<< /Title (" + _pdf_escape(title).encode("latin-1")
                    + b") /Parent " + str(parent_id).encode() + b" 0 R"
                    + b" /Dest [" + str(kid_ids[pg]).encode()
                    + b" 0 R /Fit]" + links + kids_part + b" >>")
            return ids

        top = emit(list(outlines), root_id)
        objs[root_id - 1] = (
            b"<< /Type /Outlines /First " + str(top[0]).encode()
            + b" 0 R /Last " + str(top[-1]).encode() + b" 0 R /Count "
            + str(len(top)).encode() + b" >>")
        outline_ref = b" /Outlines " + str(root_id).encode() + b" 0 R"
    objs[cat - 1] = b"<< /Type /Catalog /Pages 2 0 R" + outline_ref + b" >>"

    info_ref = b""
    if info:
        entries = b" ".join(
            b"/" + k.encode() + b" (" + _pdf_escape(str(v)).encode("latin-1")
            + b")"
            for k, v in info.items()
        )
        iid = add(b"<< " + entries + b" >>")
        info_ref = b" /Info " + str(iid).encode() + b" 0 R"

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R" + info_ref
        + b" >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# HTML page templates
# ---------------------------------------------------------------------------

_CHROME_TOP = (
    "<header><a href='/'>Home</a> <a href='/news'>News</a> "
    "<a href='/about'>About</a></header>\n"
    "<nav><ul><li><a href='/cat/a'>Category A</a></li>"
    "<li><a href='/cat/b'>Category B</a></li>"
    "<li><a href='/cat/c'>Category C</a></li></ul></nav>\n"
)
_CHROME_BOTTOM = (
    "<aside><p>Related: <a href='/x'>story one</a>, "
    "<a href='/y'>story two</a></p></aside>\n"
    "<footer><p>Copyright 2026 Example Corp. "
    "<a href='/terms'>Terms</a> <a href='/privacy'>Privacy</a></p></footer>\n"
)


def wrap_page(title: str, main_html: str, use_main_tag: bool = True) -> str:
    body = f"<main>\n{main_html}\n</main>" if use_main_tag else main_html
    return (
        "<!DOCTYPE html>\n<html><head>"
        f"<title>{title}</title>"
        "<meta charset='utf-8'>"
        "<script>var t=1;</script><style>p{margin:0}</style>"
        "</head>\n<body>\n"
        + _CHROME_TOP
        + body
        + "\n"
        + _CHROME_BOTTOM
        + "</body></html>"
    )


_VOCAB = (
    "the quick brown fox jumps over lazy dog while many readers continue "
    "scanning long articles about data processing engines built on top of "
    "distributed systems with columnar storage vectorized execution and "
    "adaptive query planning across large clusters of commodity machines"
).split()

_DE_VOCAB = (
    "der die das und ist nicht mit von auf für eine einem durch wenn aber "
    "über unter zwischen während immer viele lange artikel daten verarbeitung"
).split()

_FR_VOCAB = (
    "le la les et est dans pour une des que qui avec sur pas plus par mais "
    "comme tout faire donnée traitement pendant toujours articles longue"
).split()

_ES_VOCAB = (
    "el la los las y es en de para una que con por no más pero como todo "
    "hacer datos procesamiento durante siempre artículos larga sección"
).split()

LANG_VOCABS = {"en": _VOCAB, "de": _DE_VOCAB, "fr": _FR_VOCAB, "es": _ES_VOCAB}


def _sentence(rnd: random.Random, vocab: list, n: int) -> str:
    words = [rnd.choice(vocab) for _ in range(n)]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _paragraph(rnd: random.Random, vocab: list, n_sent: int = 3) -> str:
    return " ".join(_sentence(rnd, vocab, rnd.randint(8, 18)) for _ in range(n_sent))


# ---------------------------------------------------------------------------
# Fixture archetypes (FIXTURES.md §3)
# ---------------------------------------------------------------------------


def _fx_plain_article() -> str:
    return wrap_page(
        "Plain Article",
        "<h1>Understanding Distributed Extraction</h1>\n"
        "<p>This article explains how a main content extraction pipeline "
        "separates the article body from surrounding boilerplate chrome such "
        "as navigation bars and footers.</p>\n"
        "<p>The second paragraph continues with enough prose that a word "
        "count based classifier will confidently keep it in the output.</p>",
    )


def _fx_no_main_tag() -> str:
    return wrap_page(
        "Div Soup",
        "<div><h2>A Headline Without Semantic Markup</h2>\n"
        "<div>The extraction heuristics must keep this long block of body "
        "text purely on text density and link density because the page "
        "offers no main or article element to anchor on at all.</div>\n"
        "<div>Another sufficiently verbose block of running prose follows "
        "here so that block fusion has a neighbor to work with.</div></div>",
        use_main_tag=False,
    )


def _fx_kv_blank_line() -> str:
    # key_value_converter.py:406-416 — Name/Age/Email records
    return wrap_page(
        "KV Records",
        "<h1>Personnel Records</h1>\n"
        "<p>Name: John Doe<br>Age: 35<br>Email: john@example.com<br><br>"
        "Name: Jane Smith<br>Age: 28<br>Email: jane@example.com<br><br>"
        "Name: Bob Johnson<br>Age: 42<br>Email: bob@example.com</p>",
    )


def _fx_kv_repeated_key() -> str:
    # key_value_converter.py:435-443 — Product/Price/Stock records
    return wrap_page(
        "Inventory",
        "<h1>Inventory Listing</h1>\n"
        "<p>Product: Laptop<br>Price: 1200<br>Stock: 45<br>"
        "Product: Mouse<br>Price: 25<br>Stock: 150<br>"
        "Product: Keyboard<br>Price: 75<br>Stock: 89</p>",
    )


def _fx_kv_single_record() -> str:
    # key_value_converter.py:462-471 — must NOT convert
    return wrap_page(
        "Single Record",
        "<h1>Contact Card</h1>\n"
        "<p>Name: Solo Person<br>Age: 99<br>Email: solo@example.com</p>\n"
        "<p>The single record above must stay a paragraph because one record "
        "is not a multi record dictionary under the conversion rules.</p>",
    )


def _fx_kv_inconsistent() -> str:
    # key_value_converter.py:475-483 — must NOT convert
    return wrap_page(
        "Inconsistent KV",
        "<h1>Mixed Notes</h1>\n"
        "<p>Name: Alice<br>Age: 30<br><br>City: Berlin<br>Country: Germany</p>\n"
        "<p>These two records carry different keys so the converter has to "
        "leave the block untouched as ordinary paragraph text.</p>",
    )


def _fx_section_table_reorder() -> str:
    # test_structure_fixer.py:14-43 — table before its numbered heading
    return wrap_page(
        "Division Order",
        "<h1>DIVISION ORDER</h1>\n"
        "<p>This division order covers the mineral interests described below "
        "and lists every owner together with a fractional interest.</p>\n"
        "<table><tr><th>Owner</th><th>Interest</th></tr>"
        "<tr><td>Smith Family Trust</td><td>0.125</td></tr>"
        "<tr><td>Jones Minerals LLC</td><td>0.250</td></tr></table>\n"
        "<h2>II. MINERAL OWNERSHIP:</h2>\n"
        "<p>The ownership interests shown in the table are certified by the "
        "operator of record as of the effective date stated herein.</p>\n"
        "<h2>III. BASE OIL AND GAS LEASES:</h2>\n"
        "<p>The base leases remain in full force and effect according to "
        "their original terms and recorded memoranda thereof.</p>",
    )


def _fx_header_levels() -> str:
    # content_structure_fixer.py:107-116 — roman → 2, arabic → 3
    return wrap_page(
        "Numbered Sections",
        "<h1>AGREEMENT</h1>\n"
        "<h4>I. RECITALS</h4>\n"
        "<p>The parties entered into this agreement on the effective date "
        "and agreed to the recitals set out in this opening section.</p>\n"
        "<h4>1. Definitions</h4>\n"
        "<p>Capitalized terms used in this agreement carry the meanings "
        "assigned to them in this definitions subsection.</p>\n"
        "<h4>II. OBLIGATIONS</h4>\n"
        "<p>Each party shall perform the obligations allocated to it under "
        "the schedules attached to this agreement.</p>",
    )


def _fx_merged_cells() -> str:
    return wrap_page(
        "Merged Cells",
        "<h1>Quarterly Report</h1>\n"
        "<p>The table below uses merged header cells and deliberately empty "
        "cells to exercise exact structure preservation in the extractor.</p>\n"
        "<table><tr><th rowspan='2'>Region</th><th colspan='2'>Sales</th></tr>"
        "<tr><th>Q1</th><th>Q2</th></tr>"
        "<tr><td>North</td><td>100</td><td></td></tr>"
        "<tr><td>South</td><td></td><td>250</td></tr></table>",
    )


def _fx_adjacent_tables() -> str:
    return wrap_page(
        "Adjacent Tables",
        "<h1>Continued Listing</h1>\n"
        "<p>Two fragments of one logical table appear consecutively below "
        "and the structural fixer is expected to merge them into one.</p>\n"
        "<table><tr><th>Code</th><th>Value</th></tr>"
        "<tr><td>A1</td><td>10</td></tr></table>\n"
        "<table><tr><td>A2</td><td>20</td></tr>"
        "<tr><td>A3</td><td>30</td></tr></table>",
    )


def _fx_two_column_html() -> str:
    return wrap_page(
        "Two Column",
        "<div style='column-count: 2'>"
        "<p>The first column of this layout holds a long passage of prose "
        "that must be read completely before the second column begins.</p>"
        "<p>The second column continues the story with additional sentences "
        "that belong after everything in the first column.</p></div>",
    )


def _fx_hard_newlines() -> str:
    return wrap_page(
        "Poem",
        "<h1>Verse</h1>\n"
        "<p>line one of the poem stays alone<br>"
        "line two follows on its own row<br>"
        "line three closes the stanza cleanly</p>\n"
        "<p>A closing paragraph with plenty of regular prose words keeps the "
        "surrounding classifier comfortable about this page's content.</p>",
    )


def _fx_figure_caption() -> str:
    return wrap_page(
        "Figure",
        "<h1>Results Overview</h1>\n"
        "<p>The chart referenced below summarizes throughput across cluster "
        "sizes measured during the scaling experiments we conducted.</p>\n"
        "<figure><img src='chart.png' alt='throughput chart'>"
        "<figcaption>Figure 1: Throughput versus executor count</figcaption>"
        "</figure>",
    )


def _fx_malformed() -> str:
    # unclosed tags, stray &, bad nesting — parser robustness
    return (
        "<html><body>"
        + _CHROME_TOP
        + "<main><h1>Broken & Unclosed<p>This page never closes several tags "
        "and drops a stray ampersand & right here yet the extractor must "
        "still recover the body text without raising any error."
        "<p>A second paragraph <b>with <i>badly nested</b> emphasis</i> also "
        "survives the tolerant parsing pass."
        + _CHROME_BOTTOM
        + "</body>"
    )


def _fx_html_entities() -> str:
    return wrap_page(
        "Entities",
        "<h1>Escaping &amp; Entities</h1>\n"
        "<p>Cells and text containing &lt;angle&gt; brackets, &quot;quotes&quot;, "
        "an apostrophe&#x27;s edge case and the ampersand &amp; itself must "
        "round trip through extraction without double escaping anywhere.</p>",
    )


def _fx_cjk() -> str:
    return wrap_page(
        "CJK",
        "<h1>多言語のテスト</h1>\n"
        "<p>これは日本語の段落です。バイト単位で同一のテキスト抽出を検証するために、"
        "十分な長さの文章をここに配置しています。改行やスペースの扱いも確認します。</p>\n"
        "<p>中文段落也包括在内，用于验证非拉丁文字的逐字节一致性提取。</p>",
    )


def _fx_empty_page() -> str:
    return wrap_page("Empty", "<p>   </p>")


def _fx_pre_block() -> str:
    return wrap_page(
        "Code",
        "<h1>Snippet</h1>\n"
        "<p>The preformatted block below must keep its internal spacing and "
        "line structure exactly as written in the source document.</p>\n"
        "<pre>def f(x):\n    return x * 2</pre>",
    )


def _fx_pdf_single_column() -> bytes:
    return build_pdf(
        [[
            (72, 720, 18, ["Simple PDF Heading"]),
            (72, 680, 12, [
                "This is the first line of body text.",
                "This is the second line of body text.",
                "A third line completes the paragraph.",
            ]),
            (72, 600, 12, [
                "A second paragraph starts after a gap.",
                "It also spans multiple source lines.",
            ]),
        ]],
        compress=False,
    )


def _fx_pdf_two_column() -> bytes:
    return build_pdf(
        [[
            (72, 720, 12, [
                "Left column first line.",
                "Left column second line.",
                "Left column third line.",
            ]),
            (340, 720, 12, [
                "Right column first line.",
                "Right column second line.",
                "Right column third line.",
            ]),
        ]],
        compress=True,
    )


def _fx_pdf_multipage() -> bytes:
    return build_pdf(
        [
            [(72, 720, 18, ["Page One Title"]),
             (72, 680, 12, ["Body text on the first page.",
                            "Second line of the first page."])],
            [(72, 720, 12, ["Continuation on the second page.",
                            "Final line of the document."])],
        ],
        compress=True,
    )


_HTML_FIXTURES = [
    ("plain_article", _fx_plain_article, "en"),
    ("no_main_tag", _fx_no_main_tag, "en"),
    ("kv_blank_line", _fx_kv_blank_line, "en"),
    ("kv_repeated_key", _fx_kv_repeated_key, "en"),
    ("kv_single_record", _fx_kv_single_record, "en"),
    ("kv_inconsistent", _fx_kv_inconsistent, "en"),
    ("section_table_reorder", _fx_section_table_reorder, "en"),
    ("header_levels", _fx_header_levels, "en"),
    ("merged_cells", _fx_merged_cells, "en"),
    ("adjacent_tables", _fx_adjacent_tables, "en"),
    ("two_column_html", _fx_two_column_html, "en"),
    ("hard_newlines", _fx_hard_newlines, "en"),
    ("figure_caption", _fx_figure_caption, "en"),
    ("malformed", _fx_malformed, "en"),
    ("html_entities", _fx_html_entities, "en"),
    ("cjk", _fx_cjk, "ja"),
    ("empty_page", _fx_empty_page, "en"),
    ("pre_block", _fx_pre_block, "en"),
]

_PDF_FIXTURES = [
    ("pdf_single_column", _fx_pdf_single_column, "en"),
    ("pdf_two_column", _fx_pdf_two_column, "en"),
    ("pdf_multipage", _fx_pdf_multipage, "en"),
]

_EPOCH = dt.datetime(2026, 3, 1, 0, 0, 0)


def fixture_rows() -> list[dict]:
    """One row per archetype — deterministic, byte-stable."""
    rows = []
    for i, (name, fn, lang) in enumerate(_HTML_FIXTURES):
        html = fn()
        rows.append({
            "url": f"https://fixtures.example.com/{name}",
            "warc_ts": _EPOCH + dt.timedelta(hours=i),
            "html": html.encode("utf-8"),
            "text": None,
            "lang": lang,
        })
    for i, (name, fn, lang) in enumerate(_PDF_FIXTURES):
        rows.append({
            "url": f"https://fixtures.example.com/{name}",
            "warc_ts": _EPOCH + dt.timedelta(hours=100 + i),
            "html": fn(),
            "text": None,
            "lang": lang,
        })
    return rows


# ---------------------------------------------------------------------------
# Bench / skew corpus — realistic Common-Crawl-style pages
#
# Real web pages are 20-100 KB with heavy per-site boilerplate (nav menus,
# sidebars, comment threads, footers) around a prose article. The bench
# corpus mirrors that so (a) the extraction stage is genuinely
# compute-bound at bench scale — the scaling-efficiency measurement is
# honest — and (b) boilerplate stripping actually has boilerplate to fight.
# ---------------------------------------------------------------------------

_N_HOSTS = 1000
_ZIPF_S = 1.3


def _zipf_weights(n: int, s: float) -> list:
    w = [1.0 / (k ** s) for k in range(1, n + 1)]
    tot = sum(w)
    return [x / tot for x in w]


def _host_chrome(host_id: int) -> tuple[str, str]:
    """Deterministic per-host boilerplate (constant across a host's pages —
    exactly the signal real boilerplate classifiers exploit). ~6-10 KB."""
    r = random.Random(10_000 + host_id)
    host = f"host{host_id:04d}.example.org"
    nav_n = r.randint(25, 60)
    nav = "".join(
        f"<li class='nav-item'><a href='/cat/{r.randrange(99)}/"
        f"{r.choice(_VOCAB)}-{r.randrange(999)}'>"
        f"{_sentence(r, _VOCAB, r.randint(1, 3))[:-1]}</a></li>"
        for _ in range(nav_n)
    )
    side_n = r.randint(8, 16)
    sidebar = "".join(
        f"<div class='widget'><a href='/story/{r.randrange(99999)}'>"
        f"{_sentence(r, _VOCAB, r.randint(4, 9))[:-1]}</a>"
        f"<span class='meta'>{r.randrange(1, 999)} comments</span></div>"
        for _ in range(side_n)
    )
    foot = "".join(
        f"<a href='/{p}'>{p.title()}</a> "
        for p in ("terms", "privacy", "contact", "careers", "advertise",
                  "rss", "sitemap", "newsletter")
    )
    top = (
        f"<div class='banner'>Subscribe to {host} — unlimited access "
        "for readers who sign in today</div>\n"
        f"<header class='site-head'><a class='logo' href='/'>{host}</a>"
        f"<ul class='nav'>{nav}</ul></header>\n"
        "<div class='cookie-notice'>We use cookies to improve your "
        "experience. <a href='/cookies'>Learn more</a> "
        "<button>Accept</button></div>\n"
    )
    bottom = (
        f"<aside class='sidebar'><h3>Most read</h3>{sidebar}</aside>\n"
        f"<footer class='site-foot'><p>{foot}</p>"
        f"<p>Copyright 2026 {host}. All rights reserved. Content may not "
        "be reproduced without permission.</p></footer>\n"
    )
    return top, bottom


_CHROME_CACHE: dict = {}


def _chrome_for(host_id: int) -> tuple[str, str]:
    c = _CHROME_CACHE.get(host_id)
    if c is None:
        c = _CHROME_CACHE[host_id] = _host_chrome(host_id)
    return c


def _comments_block(rnd: random.Random, vocab: list) -> str:
    n = rnd.randint(3, 14)
    items = "".join(
        f"<div class='comment'><a href='/user/{rnd.randrange(9999)}'>"
        f"user{rnd.randrange(9999)}</a> wrote: "
        f"{_sentence(rnd, vocab, rnd.randint(5, 15))} "
        "<a href='#reply'>Reply</a> <a href='#like'>Like</a></div>"
        for _ in range(n)
    )
    return f"<section class='comments'><h3>{n} Comments</h3>{items}</section>"


def _article_body(rnd: random.Random, vocab: list, i: int, host: str) -> str:
    """Prose article: headline, subsections, paragraphs, occasional table /
    list / blockquote / figure. ~5-15 KB of main content."""
    body = [f"<h1>Article {i} on {host}</h1>",
            f"<p class='byline'>By staff writer — section "
            f"{rnd.randrange(20)}</p>"]
    n_sections = rnd.randint(2, 5)
    for s in range(n_sections):
        if s > 0:
            body.append(
                f"<h2>{_sentence(rnd, vocab, rnd.randint(3, 7))[:-1]}</h2>")
        for _ in range(rnd.randint(3, 8)):
            para = _paragraph(rnd, vocab, rnd.randint(3, 7))
            if rnd.random() < 0.25:
                w = rnd.choice(vocab)
                para += (f" See <a href='/ref/{rnd.randrange(999)}'>{w}</a>"
                         " for details.")
            body.append(f"<p>{para}</p>")
        roll = rnd.random()
        if roll < 0.25:
            body.append(
                "<table><tr><th>Key</th><th>Value</th><th>Share</th></tr>"
                + "".join(
                    f"<tr><td>{rnd.choice(vocab)}</td>"
                    f"<td>{rnd.randint(0, 999)}</td>"
                    f"<td>{rnd.randint(0, 100)}%</td></tr>"
                    for _ in range(rnd.randint(3, 10))
                )
                + "</table>"
            )
        elif roll < 0.40:
            body.append(
                "<ul>" + "".join(
                    f"<li>{_sentence(rnd, vocab, rnd.randint(4, 10))}</li>"
                    for _ in range(rnd.randint(3, 7))
                ) + "</ul>"
            )
        elif roll < 0.50:
            body.append(
                f"<blockquote>{_sentence(rnd, vocab, rnd.randint(8, 16))}"
                "</blockquote>"
            )
        elif roll < 0.58:
            body.append(
                f"<figure><img src='/img/{i}-{s}.jpg' alt='chart'>"
                f"<figcaption>Figure {s + 1}: "
                f"{_sentence(rnd, vocab, rnd.randint(5, 9))}</figcaption>"
                "</figure>"
            )
    return "\n".join(body)


def corpus_rows(n: int, seed: int = 42, pdf_frac: float = 0.05,
                n_days: int = 8, id_offset: int = 0) -> Iterator[dict]:
    """Deterministic bench corpus: Zipfian hosts, mixed langs, ~pdf_frac
    PDF payloads, n_days distinct warc days, ~15-30 KB/page."""
    rnd = random.Random(seed)
    weights = _zipf_weights(_N_HOSTS, _ZIPF_S)
    langs = ["en"] * 7 + ["de", "fr", "es"]
    for i in range(id_offset, id_offset + n):
        host_id = rnd.choices(range(_N_HOSTS), weights=weights, k=1)[0]
        host = f"host{host_id:04d}.example.org"
        lang = rnd.choice(langs)
        vocab = LANG_VOCABS[lang]
        ts = _EPOCH + dt.timedelta(
            days=i % n_days, seconds=rnd.randint(0, 86399)
        )
        url = f"https://{host}/article/{i}"
        if rnd.random() < pdf_frac:
            pages = []
            for p in range(rnd.randint(1, 3)):
                paras = [
                    _sentence(rnd, vocab, rnd.randint(6, 10))
                    for _ in range(rnd.randint(4, 8))
                ]
                half = len(paras) // 2
                pages.append(
                    [(72, 720, 18, [f"Report {i} page {p + 1}"]),
                     (72, 680, 12, paras[:half]),
                     (72, 600, 12, paras[half:])]
                )
            payload = build_pdf(pages, compress=True)
        else:
            top, bottom = _chrome_for(host_id)
            main = _article_body(rnd, vocab, i, host)
            use_main = rnd.random() < 0.8
            inner = (f"<main>\n{main}\n</main>" if use_main
                     else f"<div id='content'>\n{main}\n</div>")
            page = (
                "<!DOCTYPE html>\n<html><head>"
                f"<title>Article {i} — {host}</title>"
                "<meta charset='utf-8'>"
                "<script>window.dataLayer=[];function gtag(){"
                "dataLayer.push(arguments);}</script>"
                "<style>p{margin:0 0 1em}.nav{display:flex}</style>"
                "</head>\n<body>\n"
                + top + inner + "\n"
                + _comments_block(rnd, vocab)
                + bottom + "</body></html>"
            )
            payload = page.encode("utf-8")
        yield {
            "url": url,
            "warc_ts": ts,
            "html": payload,
            "text": None,
            "lang": lang,
        }


def write_corpus_parquet(out_dir: str, n: int, seed: int = 42,
                         rows_per_file: int = 4096,
                         prefix: str = "part") -> list:
    """Write the corpus as Iceberg-style partitioned parquet
    (``warc_day=YYYY-MM-DD/part-*.parquet``) using pyarrow directly
    (no Spark needed at generation time). Returns written file paths."""
    import os
    from collections import defaultdict

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ])
    buckets: dict = defaultdict(list)
    paths = []
    counters: dict = defaultdict(int)

    def flush(day: str):
        rows = buckets.pop(day)
        if not rows:
            return
        d = os.path.join(out_dir, f"warc_day={day}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{prefix}-{counters[day]:05d}.parquet")
        counters[day] += 1
        table = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(table, p, compression="zstd")
        paths.append(p)

    for row in corpus_rows(n, seed=seed):
        day = row["warc_ts"].strftime("%Y-%m-%d")
        buckets[day].append(row)
        if len(buckets[day]) >= rows_per_file:
            flush(day)
    for day in sorted(buckets.keys()):
        flush(day)
    return paths
