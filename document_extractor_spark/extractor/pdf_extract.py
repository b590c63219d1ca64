"""Minimal from-scratch PDF text extraction — pure Python + stdlib zlib.

Replaces the reference's rasterize-then-GPT-4V path
(``pdf_to_png_converter.py:24-124`` + ``openai_content_extractor.py:63-307``
in EricBui619/document-extractor) with direct content-stream parsing, per
the north star: page tree walk, text-run extraction (Tj/TJ/Td/TD/Tm/T*),
y-clustered lines, x-gap column detection, top-down / left-right reading
order (finish left column first — the reading-order contract the reference
prompts for, ``openai_content_extractor.py:83-86``).

Supported subset (closed — our fixture generator only emits this):
- objects located by a full-file scan (no xref needed → tolerant of
  linearized/appended files), ``N 0 obj … endobj``
- streams: raw or ``/FlateDecode``
- text operators: BT/ET, Tf, Td, TD, TL, T*, Tm, Tj, TJ, '
- strings: literal ``(…)`` with escapes + octal, hex ``<…>``
- encodings: latin-1-ish one-byte text (fixture fonts are standard 14)

Pure function of the input bytes; never raises (errors → PdfResult.error).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Optional

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.DOTALL)
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_TYPE_CATALOG_RE = re.compile(rb"/Type\s*/Catalog\b")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)


@dataclass
class TextRun:
    x: float
    y: float
    size: float
    text: str


@dataclass
class PdfResult:
    text: str = ""
    n_pages: int = 0
    page_texts: list = field(default_factory=list)
    items: list = field(default_factory=list)
    # item dicts: {type, text, page, size, pos, html, rows, cols} —
    # html/rows/cols are populated for table items only
    max_columns: int = 1      # layout: widest x-gap column split seen
    margins: Optional[dict] = None   # text-extent page margins (pct)
    error: Optional[str] = None


# ---------------------------------------------------------------------------
# Object model
# ---------------------------------------------------------------------------


def _parse_objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _object_stream(body: bytes) -> Optional[bytes]:
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    raw = m.group(1)
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_INFO_KEY_RE = re.compile(rb"/(\w+)\s*\(((?:\\.|[^\\)])*)\)")
_S1_FIELDS = ("Title", "Author", "Subject", "Creator", "Producer",
              "CreationDate", "ModDate")


def pdf_metadata(pdf_bytes: bytes) -> dict:
    """S1 — ``get_pdf_metadata`` (pdf_to_png_converter.py:198-236):
    document ``/Info`` dict + page count + first-page dims, as a plain
    dict with the reference's key names. Never raises."""
    out = {
        "title": None, "author": None, "subject": None, "creator": None,
        "producer": None, "creation_date": None, "modification_date": None,
        "total_pages": 0, "is_pdf": is_pdf(pdf_bytes),
        "page_width": None, "page_height": None,
    }
    keymap = {
        "Title": "title", "Author": "author", "Subject": "subject",
        "Creator": "creator", "Producer": "producer",
        "CreationDate": "creation_date", "ModDate": "modification_date",
    }
    try:
        objs = _parse_objects(pdf_bytes)
        pages = _page_order(objs)
        out["total_pages"] = len(pages)
        if pages:
            m = _MEDIABOX_RE.search(objs[pages[0]])
            if m:
                out["page_width"] = float(m.group(3)) - float(m.group(1))
                out["page_height"] = float(m.group(4)) - float(m.group(2))
        mi = _INFO_REF_RE.search(pdf_bytes)
        if mi and int(mi.group(1)) in objs:
            body = objs[int(mi.group(1))]
            for km in _INFO_KEY_RE.finditer(body):
                key = km.group(1).decode("ascii", "replace")
                if key in keymap:
                    val = km.group(2).replace(b"\\(", b"(") \
                        .replace(b"\\)", b")").replace(b"\\\\", b"\\")
                    out[keymap[key]] = val.decode("latin-1")
    except Exception:  # noqa: BLE001 — metadata probe never fails a row
        pass
    return out


_OUTLINES_REF_RE = re.compile(rb"/Outlines\s+(\d+)\s+\d+\s+R")
_FIRST_REF_RE = re.compile(rb"/First\s+(\d+)\s+\d+\s+R")
_NEXT_REF_RE = re.compile(rb"/Next\s+(\d+)\s+\d+\s+R")
_TITLE_RE = re.compile(rb"/Title\s*\(((?:\\.|[^\\)])*)\)")
_DEST_REF_RE = re.compile(rb"/Dest\s*\[\s*(\d+)\s+\d+\s+R")


def pdf_outline(pdf_bytes: bytes) -> list[dict]:
    """Bookmark (``/Outlines``, PDF 32000-1 §12.3.3) tree → flat
    pre-order list of ``{pos, level, title, page_idx}`` — the document
    structure a print-oriented PDF declares about itself, which the
    reference's rasterize-and-ask flow discards entirely
    (pdf_to_png_converter.py renders pixels; bookmarks never reach the
    model). Cycle-guarded (crawled PDFs lie), depth via /First
    recursion, sibling order via /Next; a missing /Title or /Dest
    yields NULL fields, never a raise."""
    items: list[dict] = []
    try:
        objs = _parse_objects(pdf_bytes)
        page_idx = {num: i for i, num in enumerate(_page_order(objs))}
        root = None
        for body in objs.values():
            if _TYPE_CATALOG_RE.search(body):
                m = _OUTLINES_REF_RE.search(body)
                if m:
                    root = int(m.group(1))
                break
        if root is None or root not in objs:
            return items
        seen: set[int] = set()

        def walk(num, level: int):
            while (num is not None and num in objs and num not in seen
                   and len(items) < 100_000):
                seen.add(num)
                body = objs[num]
                tm = _TITLE_RE.search(body)
                dm = _DEST_REF_RE.search(body)
                items.append({
                    "pos": len(items),
                    "level": level,
                    "title": _decode_literal(tm.group(1)) if tm else None,
                    "page_idx": (page_idx.get(int(dm.group(1)))
                                 if dm else None),
                })
                fm = _FIRST_REF_RE.search(body)
                if fm:
                    walk(int(fm.group(1)), level + 1)
                nm = _NEXT_REF_RE.search(body)
                num = int(nm.group(1)) if nm else None

        fm = _FIRST_REF_RE.search(objs[root])
        if fm:
            walk(int(fm.group(1)), 0)
    except Exception:  # noqa: BLE001 — structure probe never fails a row
        pass
    return items


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Walk Catalog → Pages tree in /Kids order; fall back to document order
    of /Type /Page objects when the tree is broken."""
    root_pages = None
    for body in objs.values():
        if _TYPE_CATALOG_RE.search(body):
            m = _PAGES_REF_RE.search(body)
            if m:
                root_pages = int(m.group(1))
            break
    pages: list[int] = []
    seen: set[int] = set()

    def walk(num: int):
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = objs[num]
        if _TYPE_PAGE_RE.search(body):
            pages.append(num)
            return
        m = _KIDS_RE.search(body)
        if m:
            for r in _REF_RE.finditer(m.group(1)):
                walk(int(r.group(1)))

    if root_pages is not None:
        walk(root_pages)
    if not pages:
        pages = sorted(n for n, b in objs.items() if _TYPE_PAGE_RE.search(b))
    return pages


# ---------------------------------------------------------------------------
# Content-stream tokenizer
# ---------------------------------------------------------------------------

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_literal(buf: bytes) -> str:
    out = []
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i : i + 1]
        if c == b"\\":
            nxt = buf[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and buf[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(buf[i + 1 : j], 8)))
                i = j
            else:
                i += 1
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|/[^\s/\[\]()<>]*"          # name
    rb"|[-+]?\d*\.?\d+"            # number
    rb"|[A-Za-z'\"*]+"             # operator
)


def _tokens(stream: bytes):
    for m in _TOKEN_RE.finditer(stream):
        yield m.group(0)


def extract_runs(stream: bytes) -> list[TextRun]:
    """Execute the text-positioning subset of the content stream."""
    runs: list[TextRun] = []
    stack: list = []
    x = y = 0.0          # text-line matrix origin (tx, ty)
    cx = cy = 0.0        # current point
    leading = 0.0
    size = 12.0
    in_text = False
    arr: Optional[list] = None

    def emit(s: str):
        if s:
            runs.append(TextRun(x=cx, y=cy, size=size, text=s))

    for tok in _tokens(stream):
        c0 = tok[:1]
        if tok == b"[":
            arr = []
            continue
        if tok == b"]":
            stack.append(arr if arr is not None else [])
            arr = None
            continue
        if c0 == b"(":
            val = _decode_literal(tok[1:-1])
            (arr if arr is not None else stack).append(val)
            continue
        if c0 == b"<":
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            val = bytes.fromhex(hx.decode("ascii")).decode("latin-1")
            (arr if arr is not None else stack).append(val)
            continue
        if c0 == b"/":
            stack.append(tok)
            continue
        if re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            (arr if arr is not None else stack).append(float(tok))
            continue
        # operator
        op = tok
        if op == b"BT":
            in_text = True
            x = y = cx = cy = 0.0
            stack.clear()
        elif op == b"ET":
            in_text = False
            stack.clear()
        elif op == b"Tf":
            if stack and isinstance(stack[-1], float):
                size = stack[-1]
            stack.clear()
        elif op == b"TL":
            if stack and isinstance(stack[-1], float):
                leading = stack[-1]
            stack.clear()
        elif op == b"Td":
            if len(stack) >= 2 and isinstance(stack[-1], float):
                x += stack[-2]
                y += stack[-1]
                cx, cy = x, y
            stack.clear()
        elif op == b"TD":
            if len(stack) >= 2 and isinstance(stack[-1], float):
                leading = -stack[-1]
                x += stack[-2]
                y += stack[-1]
                cx, cy = x, y
            stack.clear()
        elif op == b"Tm":
            if len(stack) >= 6:
                x, y = float(stack[-2]), float(stack[-1])
                cx, cy = x, y
            stack.clear()
        elif op == b"T*":
            y -= leading
            cx, cy = x, y
            stack.clear()
        elif op == b"Tj":
            if in_text and stack and isinstance(stack[-1], str):
                emit(stack[-1])
            stack.clear()
        elif op == b"'":
            y -= leading
            cx, cy = x, y
            if in_text and stack and isinstance(stack[-1], str):
                emit(stack[-1])
            stack.clear()
        elif op == b"TJ":
            if in_text and stack and isinstance(stack[-1], list):
                parts = [e for e in stack[-1] if isinstance(e, str)]
                emit("".join(parts))
            stack.clear()
        else:
            stack.clear()
    return runs


# ---------------------------------------------------------------------------
# Layout: lines, columns, paragraphs
# ---------------------------------------------------------------------------

_LINE_TOL = 2.0          # pt — runs within this y-delta form one line
_COL_GAP_MIN = 72.0      # pt — min x gap between column clusters
# Estimated glyph advance as a fraction of font size. The content-stream
# subset carries no font metrics, so run width is approximated as
# 0.55 em/char (Helvetica average) — deterministic, documented, and only
# used for the item position percentages / margin estimates the reference
# schema carries (openai_content_extractor.py:167-173, 190-199).
_EST_ADVANCE = 0.55


def _run_x_end(r: TextRun) -> float:
    return r.x + _EST_ADVANCE * r.size * len(r.text)


def _cluster_lines(runs: list[TextRun]) -> list[dict]:
    """Group runs into lines by y; each line: {y, x, x_end, size, runs}."""
    lines: list[dict] = []
    for r in sorted(runs, key=lambda r: (-r.y, r.x)):
        if lines and abs(lines[-1]["y"] - r.y) <= _LINE_TOL:
            lines[-1]["runs"].append(r)
        else:
            lines.append({"y": r.y, "x": r.x, "size": r.size, "runs": [r]})
    for ln in lines:
        ln["runs"].sort(key=lambda r: r.x)
        ln["x"] = ln["runs"][0].x
        ln["x_end"] = max(_run_x_end(r) for r in ln["runs"])
        ln["size"] = max(r.size for r in ln["runs"])
        ln["text"] = " ".join(r.text for r in ln["runs"]).strip()
    return [ln for ln in lines if ln["text"]]


def _split_columns(runs: list[TextRun], page_width: float) -> list[list[TextRun]]:
    """Two-cluster x-gap detection over text runs: if run x-origins form two
    clusters separated by ≥ _COL_GAP_MIN with ≥2 runs each, the left column
    is read fully before the right (openai_content_extractor.py:83-86).
    Runs BEFORE line clustering — else left/right runs at equal y would fuse
    into one line."""
    if len(runs) < 4:
        return [runs]
    xs = sorted(set(round(r.x, 1) for r in runs))
    best_gap, split_at = 0.0, None
    for a, b in zip(xs, xs[1:]):
        if b - a > best_gap:
            best_gap, split_at = b - a, (a + b) / 2.0
    if best_gap < _COL_GAP_MIN or split_at is None or split_at < page_width * 0.25:
        return [runs]
    left = [r for r in runs if r.x < split_at]
    right = [r for r in runs if r.x >= split_at]
    if len(left) < 2 or len(right) < 2:
        return [runs]
    return [left, right]


def _pct(v: float, span: float) -> float:
    return round(max(0.0, min(100.0, 100.0 * v / span)) if span > 0 else 0.0, 2)


# ---------------------------------------------------------------------------
# Table detection (column-aligned line grids) + pct-gap adjacent merge
# ---------------------------------------------------------------------------

_CELL_ALIGN_TOL = 3.0    # pt — cell x-origins matching across rows
_TABLE_GAP_PCT = 5.0     # content_structure_fixer.py:152 — <5% page height


def _is_tabular(ln: dict) -> bool:
    """A line whose runs form table CELLS: ≥3 runs always qualifies;
    exactly 2 runs only when the inter-run gap is narrower than the
    page-column threshold (a wide 2-run line is a 2-column LAYOUT, which
    ``_split_columns`` owns — the one ambiguity the content stream
    cannot resolve, documented as a 2-column-table limitation)."""
    runs = ln["runs"]
    if len(runs) < 2:
        return False
    if len(runs) == 2:
        return runs[1].x - _run_x_end(runs[0]) < _COL_GAP_MIN
    return True


def _same_grid(a: dict, b: dict) -> bool:
    ra, rb = a["runs"], b["runs"]
    return len(ra) == len(rb) and all(
        abs(x.x - y.x) <= _CELL_ALIGN_TOL for x, y in zip(ra, rb))


def _detect_tables(lines: list[dict]) -> tuple[list[list[dict]], list[dict]]:
    """Split top-down-ordered lines into table blocks (≥2 consecutive
    lines with the same aligned cell grid) and the remaining flow lines.
    The content-stream subset has no table markup — recurring column
    alignment IS the table signal (the reference gets table items from
    its vision model; this is the text-run equivalent)."""
    blocks: list[list[dict]] = []
    rest: list[dict] = []
    cur: list[dict] = []

    def flush():
        if len(cur) >= 2:
            blocks.append(list(cur))
        else:
            rest.extend(cur)
        cur.clear()

    for ln in lines:
        # A same-grid line continues the block only within a normal row
        # leading (≤2× font size) — a larger vertical gap starts a NEW
        # table, which the <5%-page-gap MERGE rule may then rejoin
        # (that separation is what makes the merge rule observable).
        row_gap_ok = bool(cur) and (
            cur[-1]["y"] - ln["y"] <= 2.0 * max(ln["size"], cur[-1]["size"]))
        if _is_tabular(ln) and cur and _same_grid(cur[-1], ln) \
                and row_gap_ok:
            cur.append(ln)
        else:
            flush()
            if _is_tabular(ln):
                cur.append(ln)
            else:
                rest.append(ln)
    flush()
    return blocks, rest


def _table_item(block: list[dict], page: int,
                width: float, height: float) -> dict:
    from html import escape

    html = "<table><tbody>" + "".join(
        "<tr>" + "".join(f"<td>{escape(r.text)}</td>" for r in ln["runs"])
        + "</tr>"
        for ln in block
    ) + "</tbody></table>"
    content = "\n".join(
        " | ".join(r.text for r in ln["runs"]) for ln in block)
    top = block[0]["y"] + block[0]["size"]
    pos = {
        "x_start": _pct(min(ln["x"] for ln in block), width),
        "y_start": _pct(height - top, height),
        "x_end": _pct(max(ln["x_end"] for ln in block), width),
        "y_end": _pct(height - block[-1]["y"], height),
    }
    return {"type": "table", "text": content, "page": page,
            "size": max(ln["size"] for ln in block), "pos": pos,
            "html": html, "rows": len(block), "cols": len(block[0]["runs"])}


_PDF_TBODY_RE = re.compile(r"^.*?<tbody>", re.DOTALL)


def merge_adjacent_pdf_tables(items: list[dict]) -> list[dict]:
    """R3, the real rule — ``content_structure_fixer.py:120-177``: two
    CONSECUTIVE table items whose vertical gap is under 5% of page
    height merge into one. Reference semantics preserved exactly: the
    scan appends the merged item and skips past the pair (a 3-table
    chain merges its first two per pass), y_end extends to the second
    table's, row counts add. Unlike the reference's literal
    string-surgery (which leaves a second ``<tbody>``), the splice is
    clean — our table HTML is self-generated and well-formed."""
    out: list[dict] = []
    i = 0
    while i < len(items):
        cur = items[i]
        if (
            cur["type"] == "table"
            and i + 1 < len(items)
            and items[i + 1]["type"] == "table"
        ):
            nxt = items[i + 1]
            if abs(nxt["pos"]["y_start"] - cur["pos"]["y_end"]) \
                    < _TABLE_GAP_PCT:
                cur = dict(cur)
                cur["html"] = (
                    cur["html"].replace("</tbody></table>", "")
                    + _PDF_TBODY_RE.sub("", nxt["html"], count=1)
                )
                cur["text"] = cur["text"] + "\n" + nxt["text"]
                cur["rows"] += nxt["rows"]
                cur["pos"] = {**cur["pos"],
                              "y_end": nxt["pos"]["y_end"],
                              "x_end": max(cur["pos"]["x_end"],
                                           nxt["pos"]["x_end"]),
                              "x_start": min(cur["pos"]["x_start"],
                                             nxt["pos"]["x_start"])}
                out.append(cur)
                i += 2
                continue
        out.append(cur)
        i += 1
    return out


def _lines_to_items(lines: list[dict], page: int,
                    width: float = 612.0, height: float = 792.0) -> list[dict]:
    """Paragraph grouping by vertical gap; header detection by font size.

    Each item carries a position bbox as page percentages (x/y from the
    top-left, 0-100 — the reference's item position schema,
    openai_content_extractor.py:167-173): x from the line origins /
    estimated advances, y_start from the first line's baseline + ascent
    (≈ font size), y_end from the last line's baseline. PDF user space
    is bottom-up, so y pct = 100·(height − y)/height."""
    items: list[dict] = []
    body_size = 12.0
    sizes = sorted(ln["size"] for ln in lines)
    if sizes:
        body_size = sizes[len(sizes) // 2]
    para: list[str] = []
    bbox: list = []           # [min_x, max_x_end, top_y, bottom_y] in pt
    prev_y = None
    prev_size = None

    def flush():
        if para:
            typ = "header" if (prev_size or 0) > body_size * 1.15 else "paragraph"
            pos = {
                "x_start": _pct(bbox[0], width),
                "y_start": _pct(height - bbox[2], height),
                "x_end": _pct(bbox[1], width),
                "y_end": _pct(height - bbox[3], height),
            }
            items.append({"type": typ, "text": "\n".join(para),
                          "page": page, "size": prev_size or body_size,
                          "pos": pos, "html": None, "rows": 0, "cols": 0})
            para.clear()
            bbox.clear()

    for ln in lines:
        gap = None if prev_y is None else prev_y - ln["y"]
        new_para = (
            prev_y is None
            or (gap is not None and gap > max(ln["size"], prev_size or 0) * 1.6)
            or (prev_size is not None and abs(ln["size"] - prev_size) > 0.5)
        )
        if new_para:
            flush()
        top = ln["y"] + ln["size"]
        if not para:
            bbox[:] = [ln["x"], ln["x_end"], top, ln["y"]]
        else:
            bbox[0] = min(bbox[0], ln["x"])
            bbox[1] = max(bbox[1], ln["x_end"])
            bbox[2] = max(bbox[2], top)
            bbox[3] = min(bbox[3], ln["y"])
        para.append(ln["text"])
        prev_y = ln["y"]
        prev_size = ln["size"]
    flush()
    return items


def extract_pdf(pdf_bytes: bytes) -> PdfResult:
    """bytes → PdfResult; never raises."""
    try:
        objs = _parse_objects(pdf_bytes)
        page_nums = _page_order(objs)
        if not page_nums:
            # corrupt/truncated PDF — must surface as a parse failure so
            # the run counters don't silently swallow bad payloads
            return PdfResult(error="PdfNoPages")
        res = PdfResult(n_pages=len(page_nums))
        for pno, num in enumerate(page_nums, start=1):
            body = objs[num]
            m = _MEDIABOX_RE.search(body)
            width = float(m.group(3)) - float(m.group(1)) if m else 612.0
            height = float(m.group(4)) - float(m.group(2)) if m else 792.0
            streams: list[bytes] = []
            mc = _CONTENTS_RE.search(body)
            if mc:
                refs = [int(mc.group(1))]
            else:
                ma = _CONTENTS_ARR_RE.search(body)
                refs = [int(r.group(1)) for r in _REF_RE.finditer(ma.group(1))] if ma else []
            for ref in refs:
                if ref in objs:
                    s = _object_stream(objs[ref])
                    if s:
                        streams.append(s)
            runs = extract_runs(b"\n".join(streams))
            # Tables are detected on the GLOBAL line clustering, before
            # the column split — a table's aligned cells at equal y MUST
            # cluster into one multi-run line, which is exactly what the
            # column splitter would tear apart.
            blocks, rest_lines = _detect_tables(_cluster_lines(runs))
            rest_runs = [r for ln in rest_lines for r in ln["runs"]]
            page_items: list[dict] = []
            cols = _split_columns(rest_runs, width)
            res.max_columns = max(res.max_columns, len(cols))
            for col_runs in cols:
                page_items.extend(
                    _lines_to_items(_cluster_lines(col_runs), pno,
                                    width, height))
            if blocks:
                page_items.extend(
                    _table_item(b, pno, width, height) for b in blocks)
                # Tables re-enter the flow by vertical position. Stable
                # sort: a multi-column page with tables reads in y order
                # (documented approximation); table-free pages keep the
                # exact left-column-first order, untouched.
                page_items.sort(key=lambda it: it["pos"]["y_start"])
                page_items = merge_adjacent_pdf_tables(page_items)
            res.items.extend(page_items)
            res.page_texts.append(
                "\n\n".join(it["text"] for it in page_items if it["text"]))
        res.text = "\n\n".join(t for t in res.page_texts if t)
        if res.items:
            # Doc-level text-extent margins as page percentages
            # (margin_*_percent, openai_content_extractor.py:195-198):
            # distance from each page edge to the union of item bboxes.
            # Positions are already per-page percentages, so the union is
            # comparable across pages with differing mediaboxes.
            ps = [it["pos"] for it in res.items]
            res.margins = {
                "margin_top_percent": round(min(p["y_start"] for p in ps), 2),
                "margin_bottom_percent": round(
                    100.0 - max(p["y_end"] for p in ps), 2),
                "margin_left_percent": round(min(p["x_start"] for p in ps), 2),
                "margin_right_percent": round(
                    100.0 - max(p["x_end"] for p in ps), 2),
            }
        return res
    except Exception as exc:  # noqa: BLE001
        return PdfResult(error=f"{type(exc).__name__}: {exc}")


def is_pdf(payload: bytes) -> bool:
    """Magic-byte discrimination — PDF payloads ride in the same ``html``
    binary column (FIXTURES.md §1)."""
    return payload[:5] == b"%PDF-"
