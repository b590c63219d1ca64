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


_LNK_STAGE = "_lnk_tags"
_LNK_TAG = "_lnk_tag"


def _tag_attr(tag: Column, name: str) -> Column:
    """Value of attribute ``name`` on a whole-tag string — order-free
    by construction (each attribute is matched independently within
    the tag, so 3-attribute tags need no permutation patterns)."""
    pat = f"""(?i)\\b{name}\\s*=\\s*["']([^"']*)["']"""
    return F.nullif(F.regexp_extract(tag, pat, 1), F.lit(""))


def hreflang_alternates(df: DataFrame, html_col: str = "html",
                        url_col: str = "url") -> DataFrame:
    """``(url, hreflang, href, cluster_url)`` — one row per
    ``<link rel="alternate" hreflang=... href=...>`` declaration, the
    page-translation graph multilingual corpus construction reads
    (every hreflang variant of a page is the same content in another
    language; a training mix wants ONE of them, a bitext miner wants
    the pairs). ``cluster_url`` is the page-local cluster
    representative: the lexicographic minimum of the page's own URL
    and every declared alternate href — computed on the staged per-page
    array BEFORE the explode, so for a reciprocal hreflang set (the
    spec requires reciprocity) every member page derives the SAME
    representative with zero shuffle and no join.

    Tags missing hreflang (RSS alternates) or with rel≠alternate
    (stylesheets, canonical) never match; non-UTF-8 and NULL payloads
    yield zero rows. All JVM whole-stage codegen: staged whole-tag
    ``regexp_extract_all``, array filter, ``explode_outer`` of the
    staged array, per-attribute extracts.
    """
    clash = {_LNK_STAGE, _LNK_TAG, "hreflang", "href",
             "cluster_url"} & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with synthesized names: "
                         f"{sorted(clash)}")
    raw = F.col(html_col)
    page = F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))

    def _is_alt(t: Column) -> Column:
        return ((F.lower(_tag_attr(t, "rel")) == "alternate")
                & _tag_attr(t, "hreflang").isNotNull()
                & _tag_attr(t, "href").isNotNull())

    staged = df.withColumn(
        _LNK_STAGE,
        F.filter(
            F.regexp_extract_all(page, F.lit(r"(?is)(<link\b[^>]*>)"),
                                 F.lit(1)),
            _is_alt))
    staged = staged.withColumn(
        "cluster_url",
        F.least(F.array_min(F.transform(_LNK_STAGE,
                                        lambda t: _tag_attr(t, "href"))),
                F.col(url_col)))
    return (
        staged.select(
            F.col(url_col).alias("url"), "cluster_url",
            F.explode_outer(_LNK_STAGE).alias(_LNK_TAG))
        .select("url", "cluster_url",
                F.lower(_tag_attr(F.col(_LNK_TAG), "hreflang"))
                .alias("hreflang"),
                _tag_attr(F.col(_LNK_TAG), "href").alias("href"))
        .where(F.col("hreflang").isNotNull())
    )


def robots_directives(df: DataFrame, html_col: str = "html",
                      directives: tuple[str, ...] = (
                          "noindex", "nofollow", "noarchive")) -> DataFrame:
    """Page-level robots directives — one boolean ``meta_<d>`` column
    per requested directive from every ``<meta name="robots"
    content=...>`` tag on the page (the spec says directives UNION
    across tags). robots.txt (``robots.py``) governs FETCHING; these
    meta directives govern what may be indexed/derived from a fetched
    page — the signal a compliance-minded corpus build filters on
    before text ever reaches training shards.

    Same whole-tag staging as :func:`hreflang_alternates` (attribute
    order free), token-bounded matching (``noindexing`` or ``nofollow-
    me`` never match), case-insensitive values. Decodable pages
    without a directive get ``false``; non-UTF-8/NULL payloads get
    NULL (unknown, not "allowed") — the caller decides the safe
    default. All JVM: regexp_extract_all, array filter/transform,
    ``exists`` folds.
    """
    clash = ({_LNK_STAGE} | {f"meta_{d}" for d in directives}) \
        & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with synthesized names: "
                         f"{sorted(clash)}")
    raw = F.col(html_col)
    page = F.when(F.is_valid_utf8(raw), F.decode(raw, "UTF-8"))
    tags = F.filter(
        F.regexp_extract_all(page, F.lit(r"(?is)(<meta\b[^>]*>)"),
                             F.lit(1)),
        lambda t: F.lower(_tag_attr(t, "name")) == "robots")
    staged = df.withColumn(
        _LNK_STAGE,
        F.transform(tags, lambda t: F.lower(_tag_attr(t, "content"))))
    def _has(pat):
        # closure (not a default arg): a 2-arg lambda would make the
        # HOF bind the element INDEX to the second parameter
        return lambda c: F.coalesce(c.rlike(pat), F.lit(False))

    cols = {}
    for d in directives:
        cols[f"meta_{d}"] = F.exists(
            F.col(_LNK_STAGE), _has(rf"(^|[\s,]){d}([\s,]|$)"))
    return staged.withColumns(cols).drop(_LNK_STAGE)


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
