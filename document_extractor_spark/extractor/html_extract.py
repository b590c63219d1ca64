"""Main-content extraction from raw HTML bytes — pure Python, stdlib only.

This is the deterministic replacement for the reference's GPT-4V page
extractor (``openai_content_extractor.py:63-307`` in
EricBui619/document-extractor): instead of prompting a vision model for
typed content items, we flatten the DOM into text blocks, score them with
text-density + link-density heuristics (Boilerpipe / Readability-style
block classification, public algorithm: Kohlschütter et al., WSDM 2010),
classify block types by tag, then apply the reference's deterministic
structural rewrites:

- header-level assignment     (``content_structure_fixer.py:90-118``)
- section↔table reorder       (``content_structure_fixer.py:17-88``)
- adjacent-table merge        (``content_structure_fixer.py:120-177``)
- multi-record KV → table     (``key_value_converter.py:24-397``)

The output is ``ExtractResult(text, spans, items, layout, error)`` where
``spans`` are byte-offset-free *character* offsets into ``text`` and
``text[start:end]`` reconstructs each block exactly (tested invariant).

Everything here is a pure function of the input bytes: no I/O, no global
mutable state, no randomness — a hard requirement for byte-identical
re-extraction across Spark tasks and batch boundaries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from typing import Optional

# ---------------------------------------------------------------------------
# Tag sets
# ---------------------------------------------------------------------------

BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "div", "dd", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol", "p", "pre",
    "section", "table", "td", "th", "title", "tr", "ul",
}

# Content inside these is invisible — never contributes text.
SKIP_TAGS = {
    "script", "style", "noscript", "template", "head", "svg", "iframe",
    "select", "option", "button", "datalist", "canvas", "object", "audio",
    "video",
}

# Ancestor tags that mark page chrome (boilerplate regardless of score).
CHROME_TAGS = {"nav", "aside"}

HEADER_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}

# Block types — same enum as the reference prompt schema
# (openai_content_extractor.py:164): header/paragraph/table/list/caption/
# image, plus page_header/page_footer (emitted opt-in via
# ``emit_chrome`` — the reference classifies them by page position,
# openai_content_extractor.py:146-149), plus kv_table for converted
# key-value records.
T_HEADER = "header"
T_PARAGRAPH = "paragraph"
T_TABLE = "table"
T_LIST = "list"
T_CAPTION = "caption"
T_KV_TABLE = "kv_table"
T_IMAGE = "image"
T_PAGE_HEADER = "page_header"
T_PAGE_FOOTER = "page_footer"

_WS_RE = re.compile(r"[ \t\r\n\f\v]+")
_NL_TRIM_RE = re.compile(r" *\n *")
_ROMAN_RE = re.compile(r"^[IVXLCDM]+\.")   # content_structure_fixer.py:109
_ARABIC_RE = re.compile(r"^\d+\.")          # content_structure_fixer.py:113
_COLCOUNT_RE = re.compile(r"column-count\s*:\s*(\d+)")
_TEXT_ALIGN_RE = re.compile(r"text-align\s*:\s*(left|right|center|justify)")

# Inline formatting tags → index into the flattener's open-tag counters.
# Items carry {bold, italic, underline} like the reference's
# (openai_content_extractor.py:158-200); a block is flagged only when ALL
# of its word-carrying text sits inside the tag.
_FMT_TAGS = {"b": 0, "strong": 0, "i": 1, "em": 1, "u": 2, "ins": 2}
FMT_BOLD, FMT_ITALIC, FMT_UNDERLINE = 1, 2, 4


# ---------------------------------------------------------------------------
# Data model
# ---------------------------------------------------------------------------


@dataclass
class Block:
    """One flattened DOM text block."""

    index: int
    tag: str                      # innermost block-level tag
    ancestors: tuple              # open block tags outside this one
    text: str                     # whitespace-normalized visible text
    n_words: int = 0
    n_link_words: int = 0
    table_html: Optional[str] = None   # raw <table>…</table> source (tables only)
    table_grid: Optional[list] = None  # list[list[str]] cell texts (tables only)
    is_content: bool = False
    btype: str = T_PARAGRAPH
    level: int = 0                # header level
    fmt: int = 0                  # FMT_* bitmask (all text formatted)
    src: Optional[str] = None     # image blocks: <img src>
    image_type: Optional[str] = None  # image blocks: classified enum
    alignment: Optional[str] = None  # style text-align on an open block tag

    @property
    def link_density(self) -> float:
        return self.n_link_words / self.n_words if self.n_words else 0.0


@dataclass
class Item:
    """Content item — mirrors the reference's item schema
    (openai_content_extractor.py:158-200), reduced to the fields that are
    meaningful for text extraction."""

    order: int
    type: str
    content: str                  # text content (tables: rendered grid text)
    html: Optional[str] = None    # tables/kv_tables: exact HTML
    level: int = 0
    row_count: int = 0
    column_count: int = 0
    converted_from_kv: bool = False
    src: Optional[str] = None     # image items: source URL
    image_type: Optional[str] = None  # image items: reference enum
    bold: bool = False            # formatting flags — the reference's
    italic: bool = False          # {bold, italic, underline}
    underline: bool = False       # (openai_content_extractor.py:158-200)
    alignment: Optional[str] = None   # text-align of the owning block
    list_type: Optional[str] = None   # lists: 'ordered' | 'unordered'
    font_size: Optional[float] = None  # PDF items: run font size (pt)


@dataclass
class ExtractResult:
    text: str = ""
    spans: list = field(default_factory=list)   # (start, end, type)
    items: list = field(default_factory=list)   # list[Item]
    layout: dict = field(default_factory=dict)
    error: Optional[str] = None


# ---------------------------------------------------------------------------
# DOM flattening
# ---------------------------------------------------------------------------


# Tokenizer patterns — the hand-rolled replacement for stdlib
# ``html.parser`` (which spends ~90% of extraction time in per-tag regex
# machinery and line/column bookkeeping we never use). One compiled scan
# per construct; C-speed ``str.find`` for the common paths.
_TAGNAME = r"[a-zA-Z][^\t\n\r\f />\x00]*"
_START_TAG_RE = re.compile(
    "<(" + _TAGNAME + ")"                       # 1: name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"        # 2: attrs blob (quote-aware)
    ">"
)
_END_TAG_RE = re.compile(r"</\s*(" + _TAGNAME + r")(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>")
# A trailing "/" marks a self-closing tag only when it is a standalone
# token — i.e. NOT the last character of an unquoted attribute value
# (`<a href=/about/>`: html.parser and the HTML spec treat that slash as
# part of the value, so the anchor stays open).
_SELFCLOSE_RE = re.compile(r"(?:^|[\s\"'])/$")
_ATTR_RE = re.compile(
    r"([^\s/=>]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^>\s]*))?"
)
_RAWTEXT_END = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


def _style_attr(attrs_blob: str) -> str:
    """Last ``style`` attribute value out of a raw attrs blob (mirrors
    ``dict(attrs)`` keep-last semantics of html.parser)."""
    val = ""
    for m in _ATTR_RE.finditer(attrs_blob):
        if m.group(1).lower() == "style":
            v = m.group(2) or ""
            if v[:1] in ("'", '"'):
                v = v[1:-1]
            val = unescape(v) if "&" in v else v
    return val


class _Flattener:
    """Error-tolerant single-pass DOM flattener.

    Produces ``self.blocks`` — the ordered list of text blocks — plus layout
    hints. Unclosed / mis-nested tags are tolerated: end tags pop to the
    nearest matching open tag, stray end tags are ignored, and everything
    left open is flushed at close. Driven by the fast tokenizer in
    ``run()`` rather than stdlib html.parser — same observable semantics
    (verified by the byte-frozen golden fixtures), ~2× faster.
    """

    def __init__(self, raw: str):
        self.raw = raw
        self.blocks: list[Block] = []
        self.stack: list[str] = []
        self._skip = 0
        self._link = 0
        self._pre = 0
        self._fmt = [0, 0, 0]       # open b/strong, i/em, u/ins counts
        # (stack_len_at_push, align) — alignment valid while its owning
        # block tag is still open; _pop_to trims stale entries
        self._align_stack: list = []
        self._frags: list = []      # (kind, text, in_link, fmt) kind: 'txt'|'br'
        # table state
        self._tdepth = 0
        self._tstart = -1
        self._grid: list[list[str]] = []
        self._cell: Optional[list[str]] = None
        self._twords = 0
        self._tlink_words = 0
        # layout
        self.columns = 1
        self.has_header = False
        self.has_footer = False

    # -- block assembly ---------------------------------------------------
    def _flush(self):
        if not self._frags:
            return
        if len(self._frags) == 1:
            # fast path: the overwhelmingly common single-fragment block
            kind, txt, in_link, fmt = self._frags[0]
            self._frags = []
            if kind == "br":
                return
            if kind == "pre":
                text = txt.strip("\n")
            elif txt.isspace():
                return
            else:
                text = _WS_RE.sub(" ", txt).strip()
            if not text:
                return
            w = len(text.split())
            self._emit_block(text, w, w if in_link else 0, fmt)
            return
        parts = []
        words = 0
        link_words = 0
        has_pre = False
        any_nl = False
        fmt_acc = -1            # AND over word-carrying frags; -1 = none yet
        for kind, txt, in_link, fmt in self._frags:
            if kind == "br":
                parts.append("\n")
                any_nl = True
                continue
            if self._pre_frag(kind):
                has_pre = True
                norm = txt
            elif txt.isspace():
                # whitespace-only inter-tag run — collapses to one space,
                # zero words; skip the regex machinery
                parts.append(" ")
                continue
            else:
                norm = _WS_RE.sub(" ", txt)
            parts.append(norm)
            w = len(norm.split())
            words += w
            if in_link:
                link_words += w
            if w:
                fmt_acc = fmt if fmt_acc < 0 else (fmt_acc & fmt)
        self._frags = []
        text = "".join(parts)
        if has_pre:
            text = text.strip("\n")
        elif any_nl:
            text = _NL_TRIM_RE.sub("\n", text).strip()
        else:
            text = text.strip()
        if not text:
            return
        self._emit_block(text, words, link_words, max(fmt_acc, 0))

    def _emit_block(self, text: str, words: int, link_words: int,
                    fmt: int = 0):
        tag = "body"
        for t in reversed(self.stack):
            if t in BLOCK_TAGS:
                tag = t
                break
        self.blocks.append(
            Block(
                index=len(self.blocks),
                tag=tag,
                ancestors=tuple(self.stack[:-1] if self.stack else ()),
                text=text,
                n_words=words,
                n_link_words=link_words,
                fmt=fmt,
                alignment=self._align_stack[-1][1] if self._align_stack
                else None,
            )
        )

    @staticmethod
    def _pre_frag(kind: str) -> bool:
        return kind == "pre"

    # -- handlers ---------------------------------------------------------
    def handle_starttag(self, tag, attrs_blob, tag_off):
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "br":
            if self._tdepth and self._cell is not None:
                self._cell.append("\n")
            else:
                self._frags.append(("br", "", False, 0))
            return
        if tag == "hr":
            self._flush()
            return
        if tag == "a":
            self._link += 1
            return
        fi = _FMT_TAGS.get(tag)
        if fi is not None:
            self._fmt[fi] += 1
            return
        if tag == "img":
            # Block-level images become typed blocks (reference emits
            # `image` items, openai_content_extractor.py:164,186). Inline
            # images mid-paragraph (pending frags) are ignored — emitting
            # them would split the paragraph, changing the north-star text
            # for decorative icons.
            if not self._tdepth and not self._frags:
                src = alt = ""
                width = height = None
                if attrs_blob:
                    for am in _ATTR_RE.finditer(attrs_blob):
                        k = am.group(1).lower()
                        if k in ("src", "alt", "width", "height"):
                            v = (am.group(2) or "").strip("\"'")
                            if k == "src":
                                src = unescape(v) if "&" in v else v
                            elif k == "alt":
                                alt = unescape(v) if "&" in v else v
                            else:
                                try:
                                    iv = int(v)
                                except ValueError:
                                    continue
                                if k == "width":
                                    width = iv
                                else:
                                    height = iv
                self.blocks.append(Block(
                    index=len(self.blocks), tag="img",
                    ancestors=tuple(self.stack),
                    text=_WS_RE.sub(" ", alt).strip(),
                    n_words=0, src=src or None,
                    image_type=classify_image_type(src, alt, width, height),
                ))
            return
        if attrs_blob and "column-count" in attrs_blob:
            m = _COLCOUNT_RE.search(_style_attr(attrs_blob))
            if m:
                self.columns = max(self.columns, int(m.group(1)))
        if tag == "table":
            if self._tdepth == 0:
                self._flush()
                self._tstart = tag_off
                self._grid = []
                self._cell = None
                self._twords = 0
                self._tlink_words = 0
            self._tdepth += 1
            self.stack.append(tag)
            return
        if self._tdepth:
            if tag == "tr":
                self._grid.append([])
                self._cell = None
            elif tag in ("td", "th"):
                if not self._grid:
                    self._grid.append([])
                cs = rs = 1
                if attrs_blob and "span" in attrs_blob:
                    # colspan/rowspan for the E4/E5 grid normalization
                    # (openai_content_extractor.py:355-444 semantics)
                    for am in _ATTR_RE.finditer(attrs_blob):
                        k = am.group(1).lower()
                        if k in ("colspan", "rowspan"):
                            v = (am.group(2) or "").strip("\"'")
                            try:
                                iv = int(v)
                            except ValueError:
                                iv = 1
                            if k == "colspan":
                                cs = min(_MAX_COLSPAN, max(1, iv))
                            else:
                                rs = min(_MAX_ROWSPAN, max(1, iv))
                self._cell = []
                self._grid[-1].append((self._cell, cs, rs))
            self.stack.append(tag)
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag == "pre":
                self._pre += 1
            if tag == "header":
                self.has_header = True
            if tag == "footer":
                self.has_footer = True
            self.stack.append(tag)
            if attrs_blob and "text-align" in attrs_blob:
                m = _TEXT_ALIGN_RE.search(_style_attr(attrs_blob))
                if m:
                    self._align_stack.append((len(self.stack), m.group(1)))

    def handle_endtag(self, tag, end_off):
        if tag in SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
            return
        fi = _FMT_TAGS.get(tag)
        if fi is not None:
            if self._fmt[fi]:
                self._fmt[fi] -= 1
            return
        if tag == "table" and self._tdepth:
            self._tdepth -= 1
            self._pop_to(tag)
            if self._tdepth == 0:
                self._emit_table(end_off)
            return
        if self._tdepth:
            if tag in ("td", "th"):
                self._cell = None
            self._pop_to(tag)
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag == "pre":
                self._pre = max(0, self._pre - 1)
            self._pop_to(tag)

    def _pop_to(self, tag):
        if tag in self.stack:
            while self.stack:
                if self.stack.pop() == tag:
                    break
            if self._align_stack:
                depth = len(self.stack)
                while self._align_stack and self._align_stack[-1][0] > depth:
                    self._align_stack.pop()

    def handle_data(self, data):
        if self._skip:
            return
        if self._tdepth:
            if self._cell is not None:
                self._cell.append(data)
                w = len(data.split())
                self._twords += w
                if self._link:
                    self._tlink_words += w
            return
        if not data:
            return
        kind = "pre" if self._pre else "txt"
        f = self._fmt
        fmt = ((FMT_BOLD if f[0] else 0) | (FMT_ITALIC if f[1] else 0)
               | (FMT_UNDERLINE if f[2] else 0)) if (f[0] or f[1] or f[2]) \
            else 0
        self._frags.append((kind, data, self._link > 0, fmt))

    # -- table finalize ---------------------------------------------------
    def _emit_table(self, end: int):
        html = self.raw[self._tstart:end] if self._tstart >= 0 else ""
        grid = _expand_grid(self._grid)
        text = "\n".join("\t".join(r) for r in grid)
        if not grid:
            return
        blk = Block(
            index=len(self.blocks),
            tag="table",
            ancestors=tuple(self.stack),
            text=text,
            n_words=self._twords,
            n_link_words=self._tlink_words,
            table_html=html,
            table_grid=grid,
        )
        self.blocks.append(blk)

    # -- tokenizer --------------------------------------------------------
    def run(self) -> None:
        """Single pass over ``self.raw``: text runs split at tags, entities
        decoded per run, script/style consumed as rawtext, comments /
        declarations / PIs discarded — the html.parser behaviors this
        pipeline actually observes, without its per-tag overhead."""
        html = self.raw
        n = len(html)
        pos = 0
        find = html.find
        emit = self.handle_data
        while pos < n:
            lt = find("<", pos)
            if lt < 0:
                if not self._skip:
                    emit(html[pos:])
                break
            if lt > pos and not self._skip:
                # (skip-region text — head/script/style — is dropped by
                # handle_data anyway; not slicing it here saves the
                # allocation + entity decode for that dead content)
                seg = html[pos:lt]
                emit(unescape(seg) if "&" in seg else seg)
            nxt = html[lt + 1: lt + 2]
            if nxt == "/":
                m = _END_TAG_RE.match(html, lt)
                if m:
                    self.handle_endtag(m.group(1).lower(), m.end())
                    pos = m.end()
                else:  # bogus end tag / `</>` — discard to next '>'
                    gt = find(">", lt)
                    pos = (gt + 1) if gt >= 0 else n
            elif nxt == "!":
                if html[lt + 2: lt + 4] == "--":        # comment
                    cend = find("-->", lt + 4)
                    pos = (cend + 3) if cend >= 0 else n
                else:                                    # <!DOCTYPE …>
                    gt = find(">", lt)
                    pos = (gt + 1) if gt >= 0 else n
            elif nxt == "?":                             # processing instr.
                gt = find(">", lt)
                pos = (gt + 1) if gt >= 0 else n
            elif nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
                m = _START_TAG_RE.match(html, lt)
                if not m:
                    # unterminated tag at EOF → trailing text, html.parser-style
                    emit(html[lt:])
                    break
                tag = m.group(1).lower()
                attrs = m.group(2)
                pos = m.end()
                self.handle_starttag(tag, attrs, lt)
                if attrs.endswith("/") and _SELFCLOSE_RE.search(attrs):
                    self.handle_endtag(tag, pos)
                elif tag in _RAWTEXT_END:                # script/style rawtext
                    e = _RAWTEXT_END[tag].search(html, pos)
                    if e:
                        m2 = _END_TAG_RE.match(html, e.start())
                        self.handle_endtag(tag, m2.end() if m2 else e.start())
                        pos = m2.end() if m2 else (
                            (find(">", e.start()) + 1) or n)
                    else:
                        break                            # unterminated rawtext
            else:
                emit("<")
                pos = lt + 1
        self._flush()


def flatten(html: str) -> _Flattener:
    p = _Flattener(html)
    p.run()
    return p


# ---------------------------------------------------------------------------
# Table structure refinement (E4/E5 — openai_content_extractor.py:355-444)
# ---------------------------------------------------------------------------


# Hostile-input bounds. colspan/rowspan are clamped to the HTML-spec
# limits (colspan ≤ 1000, rowspan ≤ 65534) at parse time, and the
# *expanded* grid is additionally capped at a total cell budget so a
# 171-byte page with colspan=5000000 can neither wedge the CPU nor drive
# a multi-GB allocation (which on an overcommitting executor means the
# OOM killer SIGKILLs the whole Python worker, not a caught
# MemoryError). Once the budget is exhausted, remaining cells degrade
# gracefully to span 1×1 — their text is kept, only the replication is
# dropped.
_MAX_COLSPAN = 1000
_MAX_ROWSPAN = 65534
_MAX_GRID_CELLS = 100_000


def _expand_grid(rows) -> list:
    """Normalize a parsed cell grid into a rectangle: honor colspan /
    rowspan by replicating the spanning cell's text into every grid
    position it covers, pad ragged rows with empty cells, drop all-empty
    rows.

    This is the deterministic replacement for the reference's 2nd-pass
    GPT table refinement (``refine_table_structure``,
    ``openai_content_extractor.py:355-425``: "re-verify rows/cols/merged
    cells/empty cells") fused into the first parse — idempotent by
    construction. ``rows`` items are ``(cell_text_chunks, colspan,
    rowspan)`` tuples.
    """
    exp: list[list[str]] = []
    occ: dict = {}          # (row, col) -> text carried down by rowspan
    total = 0               # expanded-cell budget (_MAX_GRID_CELLS)
    for r, row in enumerate(rows):
        exp_row: list[str] = []
        c = 0
        for cell, cs, rs in row:
            while (r, c) in occ:
                exp_row.append(occ.pop((r, c)))
                c += 1
            parts = [x if x == "\n" else _WS_RE.sub(" ", x) for x in cell]
            txt = _NL_TRIM_RE.sub("\n", "".join(parts)).strip()
            rem = _MAX_GRID_CELLS - total
            if rem <= 1:
                cs = rs = 1          # budget spent: keep text, drop spans
            else:
                cs = min(cs, rem)
                rs = min(rs, max(1, rem // cs))
            for dc in range(cs):
                exp_row.append(txt)
                for dr in range(1, rs):
                    occ[(r + dr, c + dc)] = txt
            total += cs * rs
            c += cs
        while (r, c) in occ:
            exp_row.append(occ.pop((r, c)))
            c += 1
        exp.append(exp_row)
    occ.clear()
    exp = [row for row in exp if any(row)]
    width = max((len(r) for r in exp), default=0)
    # padding obeys the same budget: a single hostile wide row must not
    # multiply into rows×width cells
    if width and len(exp) * width > _MAX_GRID_CELLS:
        width = max(1, _MAX_GRID_CELLS // len(exp))
    for row in exp:
        if len(row) > width:
            del row[width:]
        else:
            row.extend([""] * (width - len(row)))    # E5: fill ragged rows
    return exp


def refine_table_html(table_html: str) -> str:
    """E4 as a standalone idempotent string operator: re-parse a
    ``<table>`` HTML fragment, normalize its structure (span expansion +
    rectangularization via ``_expand_grid``), and re-emit canonical HTML.
    ``refine(refine(x)) == refine(x)`` — tested invariant."""
    fl = flatten(table_html)
    for b in fl.blocks:
        if b.tag == "table" and b.table_grid:
            body = "".join(
                "<tr>" + "".join(f"<td>{_html_escape(c)}</td>" for c in row)
                + "</tr>"
                for row in b.table_grid
            )
            return f"<table>{body}</table>"
    return table_html


# ---------------------------------------------------------------------------
# Boilerplate classification (Boilerpipe NumWordsRules-style)
# ---------------------------------------------------------------------------


def _in_chrome(b: Block) -> bool:
    if b.tag in CHROME_TAGS:
        return True
    return any(t in CHROME_TAGS or t in ("header", "footer") for t in b.ancestors) \
        or b.tag in ("header", "footer")


def _in_main(b: Block) -> bool:
    return "main" in b.ancestors or "article" in b.ancestors


def _looks_like_kv(text: str) -> bool:
    """≥2 lines parsing as ``key<sep>value`` with short keys — retained even
    when short (the reference always keeps KV record blocks and converts
    them, key_value_converter.py:359-397)."""
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) < 2:
        return False
    parsed = [_parse_kv_line(ln) for ln in lines]
    return sum(1 for p in parsed if p is not None) >= 2


def classify_blocks(blocks: list[Block]) -> None:
    """Mark ``is_content`` per block.

    Core rule set is the public Boilerpipe ``NumWordsRulesClassifier``
    (prev/curr/next word & link-density decision list), with deterministic
    tag overrides for chrome containers, headings, lists and tables.
    """
    n = len(blocks)
    # Pass 1: raw classifier on prose blocks.
    for i, b in enumerate(blocks):
        if _in_chrome(b):
            b.is_content = False
            continue
        if b.tag == "title":
            b.is_content = False
            continue
        if b.tag == "table":
            b.is_content = b.link_density <= 0.35
            continue
        if b.tag in HEADER_TAGS or b.tag in ("figcaption", "img"):
            b.is_content = False  # resolved in pass 3 (attach to content)
            continue
        # Semantic-markup override: explicit <main>/<article> IS the page's
        # declared main content — keep unless link-dominated.
        if b.tag != "li" and _in_main(b) and b.link_density <= 0.35 and b.n_words > 0:
            b.is_content = True
            continue
        # image blocks are transparent to the word-count neighbor rules —
        # a zero-word img between two paragraphs must not perturb their
        # classification
        j = i - 1
        while j >= 0 and blocks[j].tag == "img":
            j -= 1
        prev = blocks[j] if j >= 0 else None
        j = i + 1
        while j < n and blocks[j].tag == "img":
            j += 1
        nxt = blocks[j] if j < n else None
        b.is_content = _num_words_rule(prev, b, nxt) or (
            b.link_density <= 0.1 and _looks_like_kv(b.text)
        )
    # Pass 2: list grouping — a <ul>/<ol> whose items jointly look like
    # content is kept wholesale; nav-like link lists die together.
    i = 0
    while i < n:
        b = blocks[i]
        if b.tag == "li" and not _in_chrome(b):
            j = i
            words = 0
            link_words = 0
            while j < n and blocks[j].tag == "li" and not _in_chrome(blocks[j]):
                words += blocks[j].n_words
                link_words += blocks[j].n_link_words
                j += 1
            ld = link_words / words if words else 1.0
            keep = ld <= 0.35 and (words >= 8 or _in_main(b))
            for k in range(i, j):
                blocks[k].is_content = keep
            i = j
        else:
            i += 1
    # Pass 3: headings/captions/images attach to nearby kept content
    # (within the following 3 blocks; captions/images look both ways).
    for i, b in enumerate(blocks):
        if b.tag in HEADER_TAGS or b.tag in ("figcaption", "img"):
            if _in_chrome(b):
                continue
            window = blocks[i + 1 : i + 4] if b.tag in HEADER_TAGS else \
                blocks[max(0, i - 2) : i + 3]
            b.is_content = any(x.is_content for x in window)


def _num_words_rule(prev: Optional[Block], curr: Block, nxt: Optional[Block]) -> bool:
    """Boilerpipe NumWordsRulesClassifier decision list (public algorithm)."""
    if curr.link_density > 0.333333:
        return False
    p_ld = prev.link_density if prev is not None else 0.0
    p_w = prev.n_words if prev is not None else 0
    n_w = nxt.n_words if nxt is not None else 0
    if p_ld <= 0.555556:
        return curr.n_words > 16 or n_w > 15 or p_w > 4
    return curr.n_words > 40 or n_w > 17


# ---------------------------------------------------------------------------
# Items: typing + structural fixes (R1-R4 semantics)
# ---------------------------------------------------------------------------


# image_type enum (openai_content_extractor.py:186): the reference asks
# GPT-4V to classify; the deterministic replacement votes on src/alt
# keywords and the declared pixel size (tiny = decoration). First match
# wins; 'photo' is the default like a camera-captured <img> with no
# structural signal.
_IMAGE_TYPE_RULES = [
    ("logo", ("logo", "brand", "favicon")),
    ("chart", ("chart", "graph", "plot", "histogram")),
    ("diagram", ("diagram", "schematic", "flowchart", "architecture")),
    ("table_image", ("table", "spreadsheet", "grid")),
]


def classify_image_type(src: str, alt: str, width: Optional[int],
                        height: Optional[int]) -> str:
    if width is not None and height is not None \
            and width <= 32 and height <= 32:
        return "decoration"
    hay = f"{src} {alt}".lower()
    for itype, keys in _IMAGE_TYPE_RULES:
        if any(k in hay for k in keys):
            return itype
    return "photo"


def _chrome_kind(b: Block) -> Optional[str]:
    """page_header / page_footer membership for a chrome block. nav and
    aside blocks are navigation chrome with no reference item type — they
    are never emitted, even when nested inside <header>/<footer>."""
    if b.tag in CHROME_TAGS or any(t in CHROME_TAGS for t in b.ancestors):
        return None
    if b.tag == "header" or "header" in b.ancestors:
        return T_PAGE_HEADER
    if b.tag == "footer" or "footer" in b.ancestors:
        return T_PAGE_FOOTER
    return None


def _fmt_kwargs(fmt: int) -> dict:
    return {
        "bold": bool(fmt & FMT_BOLD),
        "italic": bool(fmt & FMT_ITALIC),
        "underline": bool(fmt & FMT_UNDERLINE),
    }


def blocks_to_items(blocks: list[Block],
                    emit_chrome: bool = False) -> list[Item]:
    items: list[Item] = []
    i = 0
    n = len(blocks)
    while i < n:
        b = blocks[i]
        if not b.is_content:
            if emit_chrome and b.tag != "img" and b.text:
                kind = _chrome_kind(b)
                if kind:
                    items.append(Item(order=len(items), type=kind,
                                      content=b.text,
                                      alignment=b.alignment,
                                      **_fmt_kwargs(b.fmt)))
            i += 1
            continue
        if b.tag in HEADER_TAGS:
            items.append(Item(order=len(items), type=T_HEADER, content=b.text,
                              level=int(b.tag[1]), alignment=b.alignment,
                              **_fmt_kwargs(b.fmt)))
            i += 1
        elif b.tag == "table":
            grid = b.table_grid or []
            items.append(Item(order=len(items), type=T_TABLE, content=b.text,
                              html=b.table_html,
                              row_count=len(grid),
                              column_count=max((len(r) for r in grid), default=0)))
            i += 1
        elif b.tag == "img":
            items.append(Item(order=len(items), type=T_IMAGE, content=b.text,
                              src=b.src, image_type=b.image_type))
            i += 1
        elif b.tag == "li":
            lines = []
            fmt_acc = -1
            first = blocks[i]
            # one item per list CONTAINER: an <ol> run and the <ul> that
            # follows it are separate lists (ancestors change at the
            # container boundary), so list_type stays per-container
            while (i < n and blocks[i].tag == "li" and blocks[i].is_content
                   and blocks[i].ancestors == first.ancestors):
                lines.append(blocks[i].text)
                fmt_acc = blocks[i].fmt if fmt_acc < 0 \
                    else fmt_acc & blocks[i].fmt
                i += 1
            # H8: ol vs ul from the list container (html_generator_v2.py:
            # 330-501 renders by metadata.list_type)
            ltype = "ordered" if "ol" in first.ancestors else "unordered"
            items.append(Item(order=len(items), type=T_LIST,
                              content="\n".join(lines), list_type=ltype,
                              alignment=first.alignment,
                              **_fmt_kwargs(max(fmt_acc, 0))))
        elif b.tag == "figcaption":
            items.append(Item(order=len(items), type=T_CAPTION, content=b.text,
                              alignment=b.alignment, **_fmt_kwargs(b.fmt)))
            i += 1
        else:
            items.append(Item(order=len(items), type=T_PARAGRAPH,
                              content=b.text, alignment=b.alignment,
                              **_fmt_kwargs(b.fmt)))
            i += 1
    return items


def fix_header_levels(items: list[Item]) -> None:
    """R2 — content_structure_fixer.py:90-118: roman-numeral headers →
    level 2, arabic-numbered headers → level 3, others keep their level."""
    for it in items:
        if it.type != T_HEADER:
            continue
        txt = it.content.strip()
        if _ROMAN_RE.match(txt):
            it.level = 2
        elif _ARABIC_RE.match(txt):
            it.level = 3
        elif it.level == 0:
            it.level = 1


def fix_section_table_order(items: list[Item]) -> list[Item]:
    """R1 — content_structure_fixer.py:17-88: if a table is followed within
    2 items by a numbered section header (``^[IVX]+\\.`` / ``^\\d+\\.``),
    move the header before the table."""
    out = list(items)
    i = 0
    while i < len(out):
        if out[i].type in (T_TABLE, T_KV_TABLE):
            for j in range(i + 1, min(i + 3, len(out))):
                it = out[j]
                if it.type == T_HEADER and (
                    _ROMAN_RE.match(it.content.strip())
                    or _ARABIC_RE.match(it.content.strip())
                ):
                    out.insert(i, out.pop(j))
                    i += 1  # past the moved header; table now at i
                    break
        i += 1
    for k, it in enumerate(out):
        it.order = k
    return out


_TBODY_ROWS_RE = re.compile(r"<tr[\s\S]*?</tr\s*>", re.IGNORECASE)
_TABLE_CLOSE_RE = re.compile(r"</table\s*>\s*$", re.IGNORECASE)


def fix_adjacent_tables(items: list[Item]) -> list[Item]:
    """R3 — content_structure_fixer.py:120-177: merge two consecutive table
    items (HTML adjacency replaces the reference's <5%-vertical-gap rule,
    which needs pixel coordinates we don't have for web pages): splice the
    second table's rows before the first's ``</table>``."""
    out: list[Item] = []
    for it in items:
        if (
            out
            and it.type == T_TABLE
            and out[-1].type == T_TABLE
            and out[-1].html
            and it.html
            and out[-1].column_count == it.column_count
        ):
            prev = out[-1]
            rows = _TBODY_ROWS_RE.findall(it.html)
            if rows and _TABLE_CLOSE_RE.search(prev.html):
                prev.html = _TABLE_CLOSE_RE.sub(
                    "".join(rows) + "</table>", prev.html
                )
                prev.content = prev.content + "\n" + it.content
                prev.row_count += it.row_count
                continue
        out.append(it)
    for k, it in enumerate(out):
        it.order = k
    return out


# ---------------------------------------------------------------------------
# KV → table (R5-R8 semantics, key_value_converter.py)
# ---------------------------------------------------------------------------

# key_value_converter.py:15 — separators ': = - – —'; we require a space
# around dash separators to avoid splitting hyphenated words.
_KV_SEPARATORS = [":", "=", " - ", " – ", " — "]
_MAX_KEY_LEN = 50  # key_value_converter.py:155


def _parse_kv_line(line: str):
    """First separator wins per line (key_value_converter.py:205-246)."""
    best = None
    for sep in _KV_SEPARATORS:
        idx = line.find(sep)
        if idx > 0 and (best is None or idx < best[0]):
            best = (idx, sep)
    if best is None:
        return None
    idx, sep = best
    key = line[:idx].strip()
    val = line[idx + len(sep):].strip()
    if not key or len(key) > _MAX_KEY_LEN:
        return None
    return key, val


def parse_multi_record_kv(text: str):
    """Detect ≥2 records each with the same ≥2 keys in the same order.

    Records split by blank lines (key_value_converter.py:67-100) or, if no
    blank lines, by the repeated first key (key_value_converter.py:102-145).
    Returns (headers, records) or None.
    """
    lines = [ln.rstrip() for ln in text.split("\n")]
    # blank-line split
    groups: list[list[str]] = [[]]
    for ln in lines:
        if ln.strip() == "":
            if groups[-1]:
                groups.append([])
        else:
            groups[-1].append(ln)
    if not groups[-1]:
        groups.pop()
    if len(groups) == 1:
        # repeated-first-key split
        parsed = [_parse_kv_line(ln) for ln in groups[0]]
        if any(p is None for p in parsed) or not parsed:
            return None
        first_key = parsed[0][0]
        groups = []
        cur: list[str] = []
        for ln, p in zip([l for l in lines if l.strip()], parsed):
            if p[0] == first_key and cur:
                groups.append(cur)
                cur = []
            cur.append(ln)
        if cur:
            groups.append(cur)
    if len(groups) < 2:
        return None
    records = []
    headers: Optional[list[str]] = None
    for g in groups:
        rec = []
        for ln in g:
            p = _parse_kv_line(ln)
            if p is None:
                return None
            rec.append(p)
        keys = [k for k, _ in rec]
        if len(keys) < 2 or len(set(keys)) != len(keys):
            return None
        if headers is None:
            headers = keys
        elif keys != headers:      # same keys, same order (kvc.py:184-203)
            return None
        records.append(dict(rec))
    if headers is None or len(records) < 2:
        return None
    return headers, records


def _html_escape(s: str) -> str:
    """key_value_converter.py:296-312 escaping set."""
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&#x27;")
    )


def kv_records_to_html(headers: list[str], records: list[dict]) -> str:
    """R7 — styled table render (key_value_converter.py:248-312),
    structure-faithful (header row + zebra body), minus inline colors."""
    th = "".join(f"<th>{_html_escape(h)}</th>" for h in headers)
    rows = []
    for rec in records:
        tds = "".join(f"<td>{_html_escape(rec.get(h, ''))}</td>" for h in headers)
        rows.append(f"<tr>{tds}</tr>")
    return f"<table><thead><tr>{th}</tr></thead><tbody>{''.join(rows)}</tbody></table>"


def convert_kv_items(items: list[Item]) -> list[Item]:
    """R8 — paragraph → kv_table item conversion
    (key_value_converter.py:314-397)."""
    for it in items:
        if it.type != T_PARAGRAPH or "\n" not in it.content:
            continue
        parsed = parse_multi_record_kv(it.content)
        if parsed is None:
            continue
        headers, records = parsed
        it.type = T_KV_TABLE
        it.html = kv_records_to_html(headers, records)
        grid_lines = ["\t".join(headers)]
        for rec in records:
            grid_lines.append("\t".join(rec.get(h, "") for h in headers))
        it.content = "\n".join(grid_lines)
        it.row_count = len(records)
        it.column_count = len(headers)
        it.converted_from_kv = True
    return items


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


def assemble(items: list[Item]) -> tuple[str, list]:
    """Join items with a blank line; emit (start, end, type) spans such that
    ``text[start:end] == item.content`` for every item."""
    parts = []
    spans = []
    pos = 0
    for it in items:
        if parts:
            parts.append("\n\n")
            pos += 2
        start = pos
        parts.append(it.content)
        pos += len(it.content)
        spans.append((start, pos, it.type))
    return "".join(parts), spans


def extract_html(html_bytes: bytes, encoding: str = "utf-8",
                 emit_chrome: bool = False) -> ExtractResult:
    """bytes → ExtractResult. Never raises: failures land in ``error``.

    ``emit_chrome``: additionally surface header/footer chrome as typed
    ``page_header``/``page_footer`` items (the reference classifies them
    by page position, openai_content_extractor.py:146-149; by default we
    drop chrome per the main-text north star)."""
    try:
        html = html_bytes.decode(encoding, errors="replace")
        fl = flatten(html)
        blocks = fl.blocks
        classify_blocks(blocks)
        items = blocks_to_items(blocks, emit_chrome=emit_chrome)
        fix_header_levels(items)
        items = convert_kv_items(items)
        items = fix_section_table_order(items)
        items = fix_adjacent_tables(items)
        text, spans = assemble(items)
        layout = {
            "columns": fl.columns,
            "has_header": fl.has_header,
            "has_footer": fl.has_footer,
        }
        return ExtractResult(text=text, spans=spans, items=items, layout=layout)
    except Exception as exc:  # noqa: BLE001 — per-row isolation, never fail a task
        return ExtractResult(error=f"{type(exc).__name__}: {exc}")
