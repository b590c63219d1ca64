"""THE core operator (SURVEY.md §2.2 E1): vectorized main-content
extraction over the ``html`` binary column.

Spark mapping of the reference's per-page GPT-4V extraction + structural
fix pipeline (``openai_content_extractor.py:63-307`` →
``content_structure_fixer.py:179-197`` → ``key_value_converter.py:359-397``
in EricBui619/document-extractor), collapsed into ONE narrow stage:

    select(url, html, lang) → salted repartition → mapInPandas(extract)

Scale design (the 100 TB story):
- **No per-row Python**: ``mapInPandas`` receives whole Arrow batches; the
  extraction loop is C-level iteration over numpy object arrays. The plan
  contains only ``MapInPandas`` / Arrow nodes — asserted by
  ``plans.assert_vectorized_python_only``.
- **Narrow by default — never shuffle raw payloads.** With
  ``num_partitions=None`` (the default) extraction is a zero-shuffle map
  over the scan: task sizing comes from ``spark.sql.files
  .maxPartitionBytes`` row-group splits, which are host-agnostic, so the
  Zipfian host distribution cannot skew the *extraction* stage at all.
  Measured on this box: the payload shuffle costs 3.7× throughput at 32
  cores (9.5k → 2.6k docs/s); at 100 TB it would be a 100 TB shuffle.
- **Skew, where it actually bites**: downstream per-host operators
  (dedup groupBy, host aggregations) run on the ~10× smaller extracted
  output — ``salted_repartition`` spreads those by ``(host,
  pmod(xxhash64(url), SALT))`` so a hot host fans out over SALT
  partitions instead of one straggler task (AQE only re-plans joins, not
  UDF stages). Pass ``num_partitions`` to salt *before* extraction only
  when the source layout itself is skewed (few giant unsplittable files).
- **Bounded memory**: Arrow's ``maxRecordsPerBatch`` caps rows, not bytes;
  giant pages would still blow the Python worker. ``_rechunk`` re-splits
  each incoming batch on cumulative payload bytes (default 64 MiB).
- **Error isolation**: a malformed page NEVER fails the task — it emits a
  ``parse_error`` row (reference semantics: per-page try/except,
  ``pdf_processor.py:227-235``).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extractor.core import extract_payload

SPAN_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
    ])
)

EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("extracted_text", T.StringType(), True),
    T.StructField("spans", SPAN_TYPE, True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("parse_error", T.StringType(), True),
    T.StructField("n_blocks", T.IntegerType(), True),
    T.StructField("n_bytes_in", T.LongType(), True),
    T.StructField("n_bytes_out", T.LongType(), True),
])

# The reference's core record shape (openai_content_extractor.py:158-200):
# typed items with formatting flags {bold, italic, underline}, image src,
# list_type (ol/ul), text alignment, and PDF font size — opt-in via
# extract_pages(with_items=True)
ITEM_TYPE = T.ArrayType(
    T.StructType([
        T.StructField("order", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("html", T.StringType(), True),
        T.StructField("level", T.IntegerType(), True),
        T.StructField("row_count", T.IntegerType(), True),
        T.StructField("column_count", T.IntegerType(), True),
        T.StructField("converted_from_kv", T.BooleanType(), True),
        T.StructField("src", T.StringType(), True),
        T.StructField("image_type", T.StringType(), True),
        T.StructField("bold", T.BooleanType(), True),
        T.StructField("italic", T.BooleanType(), True),
        T.StructField("underline", T.BooleanType(), True),
        T.StructField("alignment", T.StringType(), True),
        T.StructField("list_type", T.StringType(), True),
        T.StructField("font_size", T.DoubleType(), True),
        # Position bbox as page percentages from the top-left
        # (openai_content_extractor.py:167-173). PDF items: real
        # line/column extents from the content stream; HTML items:
        # reading-order substitute (character-offset pct — web pages
        # have no pixel geometry).
        T.StructField("position", T.StructType([
            T.StructField("x_start", T.DoubleType(), True),
            T.StructField("y_start", T.DoubleType(), True),
            T.StructField("x_end", T.DoubleType(), True),
            T.StructField("y_end", T.DoubleType(), True),
        ]), True),
    ])
)

# Page layout struct (openai_content_extractor.py:190-199) — opt-in via
# extract_pages(with_layout=True). PDF column count comes from the x-gap
# column split (pdf_extract.py); HTML from CSS column-count + semantic
# <header>/<footer> presence.
LAYOUT_TYPE = T.StructType([
    T.StructField("columns", T.IntegerType(), True),
    T.StructField("has_header", T.BooleanType(), True),
    T.StructField("has_footer", T.BooleanType(), True),
    # Text-extent page margins as percentages
    # (margin_*_percent, openai_content_extractor.py:195-198) — PDF
    # only (mediabox vs item-bbox union); NULL for HTML pages.
    T.StructField("margin_top_percent", T.DoubleType(), True),
    T.StructField("margin_bottom_percent", T.DoubleType(), True),
    T.StructField("margin_left_percent", T.DoubleType(), True),
    T.StructField("margin_right_percent", T.DoubleType(), True),
])

_DEFAULT_BATCH_BYTES = 64 * 1024 * 1024


def _rechunk(it: Iterator[pd.DataFrame], cap_bytes: int) -> Iterator[pd.DataFrame]:
    """Split incoming Arrow batches so no chunk exceeds ``cap_bytes`` of
    payload — size-capped batches per the north rule."""
    for pdf in it:
        if len(pdf) == 0:
            continue
        # .str.len() stays C-level over the object/bytes column (a
        # per-row Python ``map`` here was the only interpreted loop in
        # the batch path); NaN for nulls → 0
        sizes = pdf["html"].str.len().fillna(0).astype("int64")
        total = int(sizes.sum())
        if total <= cap_bytes:
            yield pdf
            continue
        start = 0
        acc = 0
        vals = sizes.to_numpy()
        for i in range(len(pdf)):
            acc += int(vals[i])
            if acc >= cap_bytes and i > start:
                yield pdf.iloc[start:i]
                start = i
                acc = int(vals[i])
        if start < len(pdf):
            yield pdf.iloc[start:]


def _extract_map(it: Iterator[pd.DataFrame],
                 cap_bytes: int = _DEFAULT_BATCH_BYTES,
                 include_items: bool = False,
                 include_layout: bool = False,
                 emit_chrome: bool = False) -> Iterator[pd.DataFrame]:
    for pdf in _rechunk(it, cap_bytes):
        urls = pdf["url"].to_numpy()
        payloads = pdf["html"].to_numpy()
        langs = (
            pdf["lang"].to_numpy()
            if "lang" in pdf.columns
            else [None] * len(pdf)
        )
        recs = [
            extract_payload(p, url=u,
                            lang_hint=l if isinstance(l, str) and l else None,
                            include_items=include_items,
                            include_layout=include_layout,
                            emit_chrome=emit_chrome)
            for u, p, l in zip(urls, payloads, langs)
        ]
        out = pd.DataFrame.from_records(recs)
        for extra in ("warc_day",):
            if extra in pdf.columns:
                out[extra] = pdf[extra].to_numpy()
        cols = ["url", "extracted_text", "spans", "lang", "parse_error",
                "n_blocks", "n_bytes_in", "n_bytes_out"]
        if include_items:
            cols.append("content_items")
        if include_layout:
            cols.append("layout")
        if "warc_day" in out.columns:
            cols.append("warc_day")
        yield out[cols]


def host_col(url: Column = None) -> Column:
    """Canonical URL host: built-in try_parse_url (JVM-side, codegen'd),
    lowercased. The try_ variant: Spark 4 parse_url RAISES on malformed
    URLs — one hostile crawl row must not fail a task; a NULL host groups
    the junk under one key instead. Lowercased because the authority is
    case-insensitive (RFC 3986 §6.2.2.1) — without it 'Example.com' and
    'example.com' split host stats, link-graph nodes, and, worst,
    mixed-case hosts BYPASS the lowercased blocklist join in
    ``url_filter``. Every host-keyed operator must parse through here."""
    u = url if url is not None else F.col("url")
    return F.lower(F.try_parse_url(u, F.lit("HOST")))


def salted_repartition(df: DataFrame, num_partitions: int,
                       salt: int = 16) -> DataFrame:
    """Spread Zipfian hosts: partition by (host, salt-of-url). Rows of one
    host land in ≤``salt`` partitions — co-location for downstream per-host
    ops, no single-host straggler."""
    return df.repartition(
        num_partitions,
        host_col(),
        F.pmod(F.xxhash64("url"), F.lit(salt)),
    )


def skew_profile(df: DataFrame, key_col: str = "url",
                 parse_host: bool = True,
                 target_rows_per_task: int = 1_000_000,
                 top: int = 20) -> DataFrame:
    """Key-skew diagnostic that *plans* ``salted_repartition``: the
    ``top`` hottest keys with row count, corpus share (ppm) and the
    salt factor needed to cap any single (key, salt) slice at
    ``target_rows_per_task`` rows. On a Zipfian crawl the top-1 share
    decides whether a host-keyed shuffle stragglers — run this BEFORE
    picking ``salt`` instead of guessing.

    Scale shape: one map-side-combinable ``groupBy(key).count()`` on a
    key-only projection (payload columns never enter the shuffle); the
    corpus total is a 1-row aggregate broadcast back, never a global
    window. Output is host-cardinality metadata capped at ``top``.
    """
    key = host_col(F.col(key_col)) if parse_host else F.col(key_col)
    counts = (df.select(key.alias("key"))
              .groupBy("key").agg(F.count(F.lit(1)).alias("n_rows")))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .select(
                "key", "n_rows",
                F.floor(F.col("n_rows") * 1_000_000 / F.col("_total"))
                .cast("bigint").alias("share_ppm"),
                F.ceil(F.col("n_rows") / F.lit(target_rows_per_task))
                .cast("int").alias("salt_factor"))
            .orderBy(F.desc("n_rows"), F.asc("key"))
            .limit(top))


def extract_pages(df: DataFrame, num_partitions: Optional[int] = None,
                  salt: int = 16, keep_warc_day: bool = False,
                  cap_bytes: int = _DEFAULT_BATCH_BYTES,
                  with_items: bool = False,
                  with_layout: bool = False,
                  emit_chrome: bool = False) -> DataFrame:
    """pages(url, html[, lang][, warc_day]) → north-star output rows.

    Column pruning: selects ONLY the columns the UDF needs before the
    shuffle, so the parquet scan reads just ``url``/``html``(/``lang``) —
    check ``ReadSchema`` in the plan.
    """
    cols = ["url", "html"]
    if "lang" in df.columns:
        cols.append("lang")
    if keep_warc_day and "warc_day" in df.columns:
        cols.append("warc_day")
    narrow = df.select(*cols)
    if num_partitions:
        narrow = salted_repartition(narrow, num_partitions, salt=salt)
    fields = list(EXTRACT_SCHEMA.fields)
    if with_items:
        fields.append(T.StructField("content_items", ITEM_TYPE, True))
    if with_layout:
        fields.append(T.StructField("layout", LAYOUT_TYPE, True))
    if keep_warc_day and "warc_day" in df.columns:
        fields.append(T.StructField("warc_day", T.StringType(), True))
    return narrow.mapInPandas(
        lambda it: _extract_map(it, cap_bytes, include_items=with_items,
                                include_layout=with_layout,
                                emit_chrome=emit_chrome),
        schema=T.StructType(fields),
    )


def observe_extract(df: DataFrame):
    """North-rule counters (SURVEY.md §2.7 A4): docs parsed, parse failures,
    bytes in/out — collected with ``observe`` (piggybacks on the write
    action, no extra pass). Returns (df, Observation)."""
    from pyspark.sql import Observation

    obs = Observation("extract_metrics")
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("parse_error").isNotNull(), 1).otherwise(0)).alias(
            "parse_failures"
        ),
        F.coalesce(F.sum("n_bytes_in"), F.lit(0)).alias("bytes_in"),
        F.coalesce(F.sum("n_bytes_out"), F.lit(0)).alias("bytes_out"),
    )
    return out, obs
