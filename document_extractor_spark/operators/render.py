"""Sink-side rendering operators (SURVEY.md §2.5 H1-H10) — flow-layout
HTML from the typed content-item array, entirely in Catalyst expressions.

Reference semantics re-expressed (EricBui619/document-extractor):
- H1 flow-layout page render      html_generator.py:66-99, 834-886
- H2 newline preservation (\\n → <br/>)   html_generator.py:321-341
- H3 text block render + h-level clamp 1-6  html_generator.py:343-393
- H4 table render with caption container    html_generator.py:395-497
- H9 readability stats                      html_formatter.py:20-78
- H10 readability rewrite (th/td restyle)   html_formatter.py:80-321
- E3 legacy projection (tables/text_blocks) openai_content_extractor.py:309-353

No Python anywhere: ``transform`` + ``concat_ws`` + ``CASE WHEN`` over the
nested array — one narrow stage, no shuffle, fully codegen'd. That is the
point of keeping items as ONE nested column instead of an exploded side
table: rendering is embarrassingly row-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _esc(c: Column) -> Column:
    """HTML-escape the reference's set (& < > " ' —
    key_value_converter.py:296-312)."""
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&quot;")
    return F.regexp_replace(c, "'", "&#x27;")


def _with_br(c: Column) -> Column:
    """H2: every \\n becomes <br/>\\n — never collapse."""
    return F.regexp_replace(c, "\n", "<br/>\n")


def _fmt_wrap(c: Column, it: Column) -> Column:
    """H3 formatting flags — <strong>/<em>/<u> nesting per the reference
    (html_generator.py:343-393). Missing flag columns (older item arrays)
    coalesce to false."""
    bold = F.coalesce(it["bold"], F.lit(False))
    ital = F.coalesce(it["italic"], F.lit(False))
    und = F.coalesce(it["underline"], F.lit(False))
    c = F.when(und, F.concat(F.lit("<u>"), c, F.lit("</u>"))).otherwise(c)
    c = F.when(ital, F.concat(F.lit("<em>"), c, F.lit("</em>"))).otherwise(c)
    return F.when(bold,
                  F.concat(F.lit("<strong>"), c, F.lit("</strong>"))
                  ).otherwise(c)


def _align_attr(it: Column) -> Column:
    """H8 alignment — style attribute when the item carries text-align
    (html_generator_v2.py:330-501)."""
    return F.when(
        it["alignment"].isNotNull(),
        F.concat(F.lit(' style="text-align: '), it["alignment"],
                 F.lit(';"')),
    ).otherwise(F.lit(""))


def _render_item(it: Column) -> Column:
    """H3/H4 type dispatch for one item struct."""
    level = F.greatest(F.least(it["level"], F.lit(6)), F.lit(1))  # clamp 1-6
    align = _align_attr(it)
    header = F.concat(
        F.lit("<h"), level.cast("string"), align, F.lit(">"),
        _fmt_wrap(_esc(it["content"]), it),
        F.lit("</h"), level.cast("string"), F.lit(">"),
    )
    para = F.concat(F.lit("<p"), align, F.lit(">"),
                    _fmt_wrap(_with_br(_esc(it["content"])), it),
                    F.lit("</p>"))
    # H8: ol/ul by list_type (html_generator_v2.py:330-501)
    ltag = F.when(it["list_type"] == "ordered", F.lit("ol")) \
        .otherwise(F.lit("ul"))
    lst = F.concat(
        F.lit("<"), ltag, F.lit(">"),
        F.concat_ws(
            "",
            F.transform(
                F.split(it["content"], "\n"),
                lambda li: F.concat(F.lit("<li>"), _esc(li), F.lit("</li>")),
            ),
        ),
        F.lit("</"), ltag, F.lit(">"),
    )
    table = F.concat(
        F.lit('<div class="table-container">'),
        F.coalesce(it["html"], para),
        F.lit("</div>"),
    )
    caption = F.concat(F.lit('<p class="caption">'), _esc(it["content"]),
                       F.lit("</p>"))
    # H4 image container (html_generator.py:395-497): embed when a source
    # is known, placeholder-with-description fallback otherwise
    image = F.when(
        it["src"].isNotNull(),
        F.concat(F.lit('<div class="image-container"><img src="'),
                 _esc(it["src"]), F.lit('" alt="'), _esc(it["content"]),
                 F.lit('"/></div>')),
    ).otherwise(
        F.concat(F.lit('<div class="image-placeholder"><p>'),
                 _esc(it["content"]), F.lit("</p></div>")),
    )
    chrome = F.concat(
        F.lit('<div class="'), it["type"], F.lit('"><p>'),
        _esc(it["content"]), F.lit("</p></div>"),
    )
    return (
        F.when(it["type"] == "header", header)
        .when(it["type"].isin("table", "kv_table"), table)
        .when(it["type"] == "list", lst)
        .when(it["type"] == "caption", caption)
        .when(it["type"] == "image", image)
        .when(it["type"].isin("page_header", "page_footer"), chrome)
        .otherwise(para)
    )


def render_item_column(it: Column) -> Column:
    """Public per-item render expression (H3/H4) — usable after an
    ``explode(content_items)``."""
    return _render_item(it)


def render_html(df: DataFrame, items_col: str = "content_items",
                url_col: str = "url",
                layout_col: str | None = None) -> DataFrame:
    """H1: reading-order render — items are already order-sorted by the
    extractor (E2); re-assert with array_sort on ``order`` to stay correct
    for arbitrary upstream item arrays.

    ``layout_col``: optional layout struct (``extract_pages(
    with_layout=True)``) — multi-column pages get the H8 ``column-count``
    CSS on the page container (html_generator_v2.py:98-229)."""
    items = F.array_sort(
        F.col(items_col),
        lambda a, b: F.when(a["order"] < b["order"], -1)
        .when(a["order"] > b["order"], 1).otherwise(0),
    )
    body = F.concat_ws("\n", F.transform(items, _render_item))
    if layout_col is not None:
        cols = F.coalesce(F.col(layout_col)["columns"], F.lit(1))
        open_div = F.when(
            cols > 1,
            F.concat(F.lit('<div class="page" style="column-count: '),
                     cols.cast("string"), F.lit(';">\n')),
        ).otherwise(F.lit('<div class="page">\n'))
    else:
        open_div = F.lit('<div class="page">\n')
    page = F.concat(open_div, body, F.lit("\n</div>"))
    return df.select(F.col(url_col), page.alias("html"))


def readability_stats(df: DataFrame, items_col: str = "content_items",
                      url_col: str = "url") -> DataFrame:
    """H9: per-doc structural stats + rule-based issue flags
    (html_formatter.py:20-78: huge tables, very long paragraphs)."""
    items = F.col(items_col)
    n_tables = F.size(F.filter(items, lambda i: i["type"].isin("table", "kv_table")))
    n_cells = F.aggregate(
        F.filter(items, lambda i: i["type"].isin("table", "kv_table")),
        F.lit(0),
        lambda acc, i: acc + i["row_count"] * i["column_count"],
    )
    long_paras = F.size(
        F.filter(items, lambda i: (i["type"] == "paragraph")
                 & (F.length(i["content"]) > 500))
    )
    return df.select(
        F.col(url_col),
        F.size(items).alias("n_items"),
        n_tables.alias("n_tables"),
        F.size(F.filter(items, lambda i: i["type"] == "paragraph")).alias(
            "n_paragraphs"),
        F.size(F.filter(items, lambda i: i["type"] == "header")).alias(
            "n_headers"),
        n_cells.alias("n_table_cells"),
        (n_cells > 50).alias("issue_large_table"),
        (long_paras > 0).alias("issue_long_paragraph"),
    )


def _zebra_stripe(c: Column) -> Column:
    """H10 zebra striping (html_formatter.py:80-321): tbody rows get
    alternating even/odd classes BY ROW INDEX. Pure Catalyst: split on
    <tbody>, then index-aware ``transform`` over the <tr> splits of each
    body segment — no Python, no shuffle. Row counting restarts at each
    <tbody> (one per table), matching the reference's per-table pass.

    Each post-``<tbody>`` segment runs up to the NEXT ``<tbody>`` — past
    ``</tbody>`` and into the following table's ``<thead>`` on
    multi-table pages — so the segment is re-split on the FIRST
    ``</tbody>`` and only the part before it is striped (the reference
    stripes tbody rows only, html_formatter.py:188-240)."""
    segs = F.split(c, "<tbody>")

    def stripe_rows(body: Column) -> Column:
        rows = F.split(body, "<tr>")
        return F.concat_ws(
            "",
            F.transform(
                rows,
                lambda part, j: F.when(j == 0, part).otherwise(
                    F.concat(
                        F.when((j % 2) == 1,
                               F.lit('<tr class="even">'))
                        .otherwise(F.lit('<tr class="odd">')),
                        part,
                    )
                ),
            ),
        )

    def stripe_seg(seg: Column, i: Column) -> Column:
        parts = F.split(seg, "</tbody>", 2)
        body = F.element_at(parts, 1)
        rest = F.when(
            F.size(parts) > 1,
            F.concat(F.lit("</tbody>"), F.element_at(parts, 2)),
        ).otherwise(F.lit(""))
        return F.when(i == 0, seg).otherwise(
            F.concat(stripe_rows(body), rest))

    return F.concat_ws("<tbody>", F.transform(segs, stripe_seg))


# Reference th content styling (html_formatter.py:148-156) — merged
# into any pre-existing inline style with dict.update() semantics:
# conflicting keys are overridden IN PLACE (they keep their original
# position), new keys append in this order, serialized as 'k: v; …'
# (html_formatter.py:305-321).
_TH_PROPS = [
    ("padding", "10px"),
    ("background-color", "#4a90e2"),
    ("color", "white"),
    ("font-weight", "bold"),
    ("text-align", "left"),
]


def _merged_style(existing: Column, props: list) -> Column:
    """Catalyst twin of _parse_style_string + dict.update +
    _dict_to_style_string (html_formatter.py:305-321) — all array/string
    expressions, no Python."""
    rules = F.filter(F.split(existing, ";"), lambda p: F.instr(p, ":") > 0)
    pairs = F.filter(
        F.transform(rules, lambda p: F.struct(
            F.trim(F.substring_index(p, ":", 1)).alias("k"),
            F.trim(F.regexp_extract(p, "^[^:]*:(.*)$", 1)).alias("v"))),
        lambda s: s["k"] != "",
    )

    def override(s):
        v = s["v"]
        for k, nv in reversed(props):
            v = F.when(s["k"] == k, F.lit(nv)).otherwise(v)
        return F.concat(s["k"], F.lit(": "), v)

    kept = F.transform(pairs, override)

    def has_key(kk):
        return F.exists(pairs, lambda s: s["k"] == kk)

    appended = F.filter(
        F.array(*[
            F.when(~has_key(k), F.lit(f"{k}: {v}")) for k, v in props
        ]),
        lambda x: x.isNotNull(),
    )
    return F.array_join(F.concat(kept, appended), "; ")


def _restyle_th(c: Column) -> Column:
    """Rewrite every ``<th …>`` tag's ``style`` attribute to the merge of
    its existing inline style with ``_TH_PROPS``. Split on ``<th`` +
    index-aware ``transform`` (the zebra pattern); quote-aware style
    extraction for both quote kinds. Limitation (documented): a literal
    ``>`` inside a quoted attribute value truncates that tag's attrs —
    our renderers never emit one."""
    segs = F.split(c, "<th(?=[\\s>])")

    def fix(seg: Column, i: Column) -> Column:
        parts = F.split(seg, ">", 2)
        attrs = F.element_at(parts, 1)
        rest = F.when(
            F.size(parts) > 1,
            F.concat(F.lit(">"), F.element_at(parts, 2)),
        ).otherwise(F.lit(""))
        dq = F.regexp_extract(attrs, "style\\s*=\\s*\"([^\"]*)\"", 1)
        sq = F.regexp_extract(attrs, "style\\s*=\\s*'([^']*)'", 1)
        existing = F.when(dq != "", dq).otherwise(sq)
        # escape \ and $ so the merged value is literal in the
        # regexp_replace replacement position
        merged = F.regexp_replace(_merged_style(existing, _TH_PROPS),
                                  "[\\\\$]", "\\\\$0")
        attrs2 = F.when(
            attrs.rlike("style\\s*=\\s*[\"']"),
            F.regexp_replace(
                attrs, "style\\s*=\\s*(\"[^\"]*\"|'[^']*')",
                F.concat(F.lit('style="'), merged, F.lit('"'))),
        ).otherwise(
            F.concat(attrs, F.lit(' style="'), merged, F.lit('"')))
        return F.when(i == 0, seg).otherwise(
            F.concat(F.lit("<th"), attrs2, rest))

    return F.concat_ws("", F.transform(segs, fix))


def apply_readability_rewrite(df: DataFrame, html_col: str = "html") -> DataFrame:
    """H10 — the reference's readability restyle pass
    (html_formatter.py:80-321: th header styling merged into any
    pre-existing inline style, tbody zebra striping by row index, table
    restyle) re-expressed as Catalyst string expressions;
    attribute-tolerant (``<th scope=..>`` still matched via lookahead)
    and fully JVM-side."""
    c = F.col(html_col)
    c = _zebra_stripe(c)
    c = _restyle_th(c)
    c = F.regexp_replace(c, "<th(?=[\\s>])", '<th class="hdr"')
    c = F.regexp_replace(c, "<table(?=[\\s>])", '<table class="readable"')
    return df.withColumn(html_col, c)


def legacy_projection(df: DataFrame, items_col: str = "content_items",
                      url_col: str = "url") -> DataFrame:
    """E3: the reference's legacy triple (tables / text_blocks) as a
    projection of the item array — pure array filters, no UDF."""
    items = F.col(items_col)
    return df.select(
        F.col(url_col),
        F.filter(items, lambda i: i["type"].isin("table", "kv_table")).alias(
            "tables"),
        F.filter(
            items,
            lambda i: i["type"].isin("paragraph", "header", "list", "caption"),
        ).alias("text_blocks"),
    )


def concat_pages(df: DataFrame, group_col: str, order_col: str = "page_num",
                 html_col: str = "html") -> DataFrame:
    """H6 — multi-page concat (html_generator.py:792-832, 888-923): per
    group, page bodies joined in page order inside one document shell with
    page-break markers. ``sort_array(collect_list(struct(order, html)))``
    keeps the whole aggregation JVM-side."""
    pages = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"),
                                F.col(html_col).alias("h")))
    )
    body = F.concat_ws(
        '\n<div class="page-break"></div>\n',
        F.transform(pages, lambda p: p["h"]),
    )
    return (
        df.groupBy(group_col)
        .agg(body.alias("body"))
        .select(
            group_col,
            F.concat(F.lit("<html><body>\n"), F.col("body"),
                     F.lit("\n</body></html>")).alias("html"),
        )
    )


def _md_table(content: Column) -> Column:
    """GitHub-pipes table from the kernel's canonical tab/newline grid:
    header row, `---` separator sized to the column count, body rows."""
    rows = F.split(content, "\n")
    def line(r: Column) -> Column:
        return F.concat(F.lit("| "),
                        F.regexp_replace(r, "\t", " | "), F.lit(" |"))
    header = line(F.element_at(rows, 1))
    sep = F.concat(
        F.lit("|"),
        F.repeat(F.lit(" --- |"),
                 F.size(F.split(F.element_at(rows, 1), "\t"))),
    )
    body = F.array_join(
        F.transform(F.slice(rows, 2, F.size(rows) - 1), line), "\n")
    return F.concat_ws("\n", header, sep,
                       F.when(F.size(rows) > 1, body))


def _md_item(it: Column) -> Column:
    """Markdown dispatch for one item struct. Underline has no markdown
    form — inline ``<u>`` (CommonMark passes raw HTML through)."""
    c = F.coalesce(it["content"], F.lit(""))
    bold = F.coalesce(it["bold"], F.lit(False))
    ital = F.coalesce(it["italic"], F.lit(False))
    und = F.coalesce(it["underline"], F.lit(False))
    text = F.when(und, F.concat(F.lit("<u>"), c, F.lit("</u>"))).otherwise(c)
    text = F.when(ital, F.concat(F.lit("*"), text, F.lit("*"))).otherwise(text)
    text = F.when(bold, F.concat(F.lit("**"), text, F.lit("**"))).otherwise(text)
    level = F.greatest(F.least(it["level"], F.lit(6)), F.lit(1))
    bullet = F.when(F.coalesce(it["list_type"], F.lit("")) == "ordered",
                    F.lit("1. ")).otherwise(F.lit("- "))
    return (
        F.when(it["type"] == "header",
               F.concat(F.repeat(F.lit("#"), level), F.lit(" "), c))
        .when(it["type"].isin("table", "kv_table"), _md_table(c))
        .when(it["type"] == "image",
              F.concat(F.lit("!["), c, F.lit("]("),
                       F.coalesce(it["src"], F.lit("")), F.lit(")")))
        .when(it["type"] == "list",
              F.array_join(F.transform(
                  F.split(c, "\n"),
                  lambda ln: F.concat(bullet, ln)), "\n"))
        .when(it["type"] == "caption", F.concat(F.lit("*"), c, F.lit("*")))
        .otherwise(text)
    )


def render_markdown(df: DataFrame, items_col: str = "content_items",
                    out_col: str = "markdown") -> DataFrame:
    """Items → one Markdown document per row — the serialization LLM
    pretraining corpora actually want (headers/tables/lists survive as
    STRUCTURE the tokenizer sees, unlike flat text; far lighter than
    HTML). Same row-local Catalyst shape as :func:`render_html`: one
    ``transform`` + ``array_join`` over the nested item array, blocks
    separated by blank lines, no Python, no shuffle. NULL/empty item
    arrays render as an empty string (a page that extracted nothing is
    an empty document, not a NULL)."""
    items = F.coalesce(
        F.col(items_col),
        F.array().cast(df.schema[items_col].dataType))
    return df.withColumn(
        out_col,
        F.array_join(F.transform(items, _md_item), "\n\n"))
