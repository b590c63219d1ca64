"""CDXJ capture-index source — how a Common-Crawl-scale pipeline plans
fetches WITHOUT scanning archives. Each crawl ships a CDX(J) index:
one line per capture, ``<SURT key> <14-digit timestamp> <JSON>``, the
JSON carrying url/mime/status/digest plus the (filename, offset,
length) triple that addresses the raw record inside its WARC. Planning
against the index (which captures to fetch, which WARC byte ranges to
read) is the step that turns "scan 90 TB of WARC" into "range-read the
0.9 TB you need" — the single biggest IO lever in the whole stack.
Sibling of ``warc.py`` (which reads the archives themselves).

Spark-first: the index is plain splittable text; parsing is one JVM
regexp slice + ``from_json`` (PERMISSIVE — a malformed line yields a
row of NULLs, never a task failure: extraction totality, same contract
as ``jsonrepair.py``). The fetch plan is a groupBy on the url with a
``max_by`` struct argmax (latest capture wins, offset breaks ties
deterministically) — narrow metadata rows; payload bytes never exist
in this job at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CDX_RE = r"^(\S+) (\d{14}) (\{.*\})\s*$"
_JSON_SCHEMA = ("url string, mime string, status string, digest string, "
                "length string, offset string, filename string")


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Parse CDXJ lines into typed capture rows: ``(surt, ts_raw,
    capture_ts, url, mime, status, digest, length, offset, filename)``.
    Unparseable lines or JSON yield NULL fields (the surt/ts of a
    malformed line are NULL too, so bad lines group together for
    inspection)."""
    lines = spark.read.text(path)
    return cdx_lines_to_captures(lines, "value")


def cdx_lines_to_captures(df: DataFrame, line_col: str) -> DataFrame:
    """The parsing core, reusable over any string column of CDXJ
    lines (e.g. index shards already in a table)."""
    line = F.col(line_col)
    surt = F.nullif(F.regexp_extract(line, _CDX_RE, 1), F.lit(""))
    ts_raw = F.nullif(F.regexp_extract(line, _CDX_RE, 2), F.lit(""))
    blob = F.nullif(F.regexp_extract(line, _CDX_RE, 3), F.lit(""))
    j = F.from_json(blob, _JSON_SCHEMA)
    return df.select(
        surt.alias("surt"),
        ts_raw.alias("ts_raw"),
        F.to_timestamp(ts_raw, "yyyyMMddHHmmss").alias("capture_ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("bigint").alias("length"),
        j["offset"].cast("bigint").alias("offset"),
        j["filename"].alias("filename"),
    )


def cdx_fetch_plan(captures: DataFrame,
                   mime: str = "text/html") -> DataFrame:
    """Reduce captures to the fetch plan: keep successful (status 200)
    captures of the requested ``mime``, one row per url — the LATEST
    capture (``ts_raw`` max; equal-timestamp ties break on lowest
    offset, then filename, so the plan is partitioning-invariant).
    Output ``(url, ts_raw, filename, offset, length)`` — exactly what
    a WARC range-reader needs."""
    from pyspark.sql import Window

    eligible = captures.where(
        (F.col("status") == 200) & (F.col("mime") == mime)
        & F.col("url").isNotNull() & F.col("ts_raw").isNotNull())
    # rows entering the window are fetch-plan metadata only (no
    # payload exists in this job); per-url capture counts are the
    # crawl's revisit factor, i.e. single digits
    w = Window.partitionBy("url").orderBy(
        F.col("ts_raw").desc(), F.col("offset").asc(),
        F.col("filename").asc())
    return (
        eligible.select("url", "ts_raw", "filename", "offset", "length")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATHQ_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)"


def surt_key(df: DataFrame, url_col: str = "url",
             out_col: str = "surt") -> DataFrame:
    """Append the SURT key (Sort-friendly URI Reordering Transform) —
    the canonical form every web-archive index sorts by and the key
    column of CDXJ lines: host labels lowercased, a leading ``www.``
    dropped, labels REVERSED and comma-joined, then ``)`` and the
    lowercased path with query parameters sorted byte-wise
    (``org,example)/a?b=1&a=2`` for ``https://www.Example.ORG/A?b=1&
    a=2``). Generating the key locally is what lets a pipeline join
    its own URL lists against a crawl's CDX index without fetching
    anything. Ports are dropped (the CC urlkey convention for standard
    ports; documented simplification for the rest). URLs with no
    parseable host get a NULL key.

    All JVM: regexp extracts, a staged split/reverse/sort/join chain —
    whole-stage codegen, no shuffle, and every list op has an exact
    DuckDB twin (string_split / list_reverse / list_sort)."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(F.regexp_replace(host, ":.*$", ""),
                            r"^www\.", "")
    labels = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pathq = F.lower(F.regexp_extract(u, _PATHQ_RE, 1))
    path = F.when(pathq == "", F.lit("/")).otherwise(
        F.regexp_replace(pathq, r"\?.*$", ""))
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    key = F.concat(
        labels, F.lit(")"), path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)))
    return df.withColumn(
        out_col, F.when(host != "", key))

