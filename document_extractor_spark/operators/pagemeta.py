"""Page-head metadata extraction — <title>, rel=canonical, and
OpenGraph tags pulled straight off the raw HTML bytes. A crawl
pipeline reads these constantly: the canonical link feeds URL-level
dedup (the site's own statement of which URL is authoritative beats
any heuristic), og:title/og:site_name label documents for mixing and
reporting, and <title> is the fallback document label when extraction
yields no <h1>. The reference app surfaces PDF /Info metadata the same
way (pdf_to_png_converter.py:198-236); this is the HTML twin.

Spark-first: the whole operator is JVM codegen — decode the payload
(gated on ``is_valid_utf8`` so binary garbage yields NULLs instead of
an ANSI decode error), one ``regexp_extract`` per attribute order, a
5-entity HTML unescape chain. No Python, no UDF: at 100 TB this runs
inside the same whole-stage-codegen span as the scan filter, and
column pruning means only the html column is read.

Attribute-order tolerance: real-world <link>/<meta> tags emit
attributes in either order, so every field is the ``coalesce`` of a
(rel|property)-first and a (href|content)-first pattern. Values in
single or double quotes both match; unquoted values (rare, invalid
for URLs with slashes anyway) are documented as out of scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The 5 named/numeric entities HTML-escaped by every serializer worth
# the name (incl. this repo's docpages fixtures); applied specific-
# entity-first so a literal "&amp;lt;" round-trips to "&lt;".
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]


def _unescape(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _attr_value(page: Column, tag: str, key_attr: str, key: str,
                val_attr: str) -> Column:
    """Value of ``val_attr`` on the <tag> whose ``key_attr`` equals
    ``key`` — tolerant of either attribute order."""
    a = f"""(?is)<{tag}[^>]*{key_attr}=["']{key}["'][^>]*{val_attr}=["']([^"']*)["']"""
    b = f"""(?is)<{tag}[^>]*{val_attr}=["']([^"']*)["'][^>]*{key_attr}=["']{key}["']"""
    return F.coalesce(F.nullif(F.regexp_extract(page, a, 1), F.lit("")),
                      F.nullif(F.regexp_extract(page, b, 1), F.lit("")))


def page_metadata(df: DataFrame, html_col: str = "html",
                  og_fields: tuple[str, ...] = ("title", "site_name",
                                                "image")) -> DataFrame:
    """Append ``title``, ``canonical_url``, and one ``og_<field>``
    column per requested OpenGraph field. NULL html, non-UTF-8
    payloads, and missing tags all yield NULL (never an error)."""
    raw = F.col(html_col)
    page = F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))
    title = F.nullif(
        F.trim(F.regexp_extract(page, "(?is)<title[^>]*>(.*?)</title>", 1)),
        F.lit(""))
    cols = {
        "title": _unescape(title),
        "canonical_url": _unescape(
            _attr_value(page, "link", "rel", "canonical", "href")),
    }
    for f in og_fields:
        cols[f"og_{f}"] = _unescape(
            _attr_value(page, "meta", "property", f"og:{f}", "content"))
    return df.withColumns(cols)
