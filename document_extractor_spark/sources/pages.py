"""Pages-table source/sink seam — Iceberg-style partitioned parquet.

The sandbox Spark distribution carries no Iceberg runtime jars
(SURVEY.md §7), so the engine reads/writes an Iceberg-style layout
(``warc_day=YYYY-MM-DD/part-*.parquet`` + per-partition commit manifests,
see ``checkpoint.py``) behind this seam; pointing ``read_pages`` at a real
Iceberg catalog table is a one-line swap on a cluster with the runtime.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table. ``basePath`` keeps the ``warc_day`` partition
    column visible so Catalyst partition-prunes ``warc_day = X`` filters.

    The scan schema is built fresh each call: ``StructType.add`` MUTATES
    the receiver, so ``PAGES_SCHEMA.add(...)`` would permanently grow
    the shared module-level schema — any later ``stream_pages`` over a
    ``warc_day=*`` glob then sees the column twice
    (COLUMN_ALREADY_EXISTS)."""
    scan_schema = T.StructType(
        list(PAGES_SCHEMA.fields)
        + [T.StructField("warc_day", T.StringType())]
    )
    return (
        spark.read.option("basePath", path)
        .schema(scan_schema)
        .parquet(path)
    )


def list_partitions(path: str) -> list:
    """Partition values present on disk (warc_day=... dirs), sorted."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith("warc_day=") and os.path.isdir(os.path.join(path, name)):
            out.append(name.split("=", 1)[1])
    return out


def write_result(df: DataFrame, path: str) -> None:
    """Idempotent per-partition write: dynamic partition overwrite replaces
    exactly the partitions present in ``df`` (SURVEY.md §4.3)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("warc_day")
        .parquet(path)
    )


def with_warc_day(df: DataFrame) -> DataFrame:
    return df.withColumn("warc_day", F.date_format("warc_ts", "yyyy-MM-dd"))


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str,
                         num_buckets: int, path: str,
                         sort_col: str | None = None) -> None:
    """Write a hash-BUCKETED table (``bucketBy`` + optional in-bucket
    ``sortBy``): the co-location contract for repeated joins/aggs on the
    same key. Two tables bucketed on the join key with the same bucket
    count join with NO Exchange on either side (plan-asserted in tests)
    — at 100 TB that removes the dominant shuffle from every
    fact-to-fact join the key participates in; in-bucket sort
    additionally lets SortMergeJoin skip its sort. Bucketing requires
    ``saveAsTable`` (the metastore records the bucket spec; a bare
    parquet path cannot)."""
    w = df.write.mode("overwrite").option("path", path) \
        .bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


_CATALOG_IDENT_RE = re.compile(
    r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,2}")


#: Explicit-dispatch prefix: ``table:db.pages`` ALWAYS reads the
#: catalog, never the filesystem. The unprefixed heuristic stays as a
#: convenience fallback, but it is cwd-dependent (``os.path.isdir`` on a
#: bare identifier can flip meaning between invocations) — deploy
#: scripts should use the prefix.
TABLE_PREFIX = "table:"


def strip_table_prefix(source: str) -> str:
    """Bare identifier behind an explicit ``table:`` prefix (unchanged
    input when unprefixed)."""
    if source.startswith(TABLE_PREFIX):
        return source[len(TABLE_PREFIX):]
    return source


def is_catalog_table(source: str) -> bool:
    """Dispatch for the ingest seam. An explicit ``table:`` prefix is
    unambiguous and always wins (a malformed identifier behind it
    raises rather than silently falling back to a path read). Without
    the prefix, the heuristic: a catalog identifier (``db.pages``,
    ``iceberg.crawl.pages``) is 1-3 dot-separated SQL identifiers.
    Anything with a path separator, anything that EXISTS as a local
    directory (a bare relative dir like ``pages_data`` must keep
    reading as a path — it worked before the catalog seam and an
    identifier-shaped directory name is still a directory), and
    anything not identifier-shaped routes as a filesystem path."""
    if source.startswith(TABLE_PREFIX):
        ident = source[len(TABLE_PREFIX):]
        if not _CATALOG_IDENT_RE.fullmatch(ident):
            raise ValueError(
                f"{source!r} has the explicit {TABLE_PREFIX!r} prefix but "
                f"{ident!r} is not a 1-3-part SQL identifier; use a plain "
                f"path (no prefix) for filesystem sources")
        return True
    if not source or "/" in source or "\\" in source:
        return False
    if os.path.isdir(source):
        return False
    return _CATALOG_IDENT_RE.fullmatch(source) is not None


def read_pages_table(spark: SparkSession, source: str) -> DataFrame:
    """The one-line Iceberg swap SURVEY §7 promises, made literal: a
    catalog identifier binds through ``spark.read.table`` — on a cluster
    with the Iceberg (or Delta) runtime this is the real table format,
    and predicate/partition pushdown, hidden partitioning, and snapshot
    isolation come from the format's DataSourceV2 implementation, not
    from this code. A path falls back to the Iceberg-style parquet
    layout (`read_pages`). Either way the downstream plan is identical:
    scan → narrow extract. ``table:db.pages`` forces the catalog read
    explicitly (see ``is_catalog_table``)."""
    if is_catalog_table(source):
        return spark.read.table(strip_table_prefix(source))
    return read_pages(spark, source)


def table_partition_values(spark: SparkSession, source: str) -> list:
    """``warc_day`` partition values of a catalog table — the catalog
    analogue of ``list_partitions``' directory listing, and the same
    metadata scale (one value per partition, collected on the driver for
    resume PLANNING only; row data never moves). Three tiers, all tried
    metadata-first: the Iceberg ``<table>.partitions`` metadata table,
    then Hive-style ``SHOW PARTITIONS`` (also pure catalog metadata),
    then — last resort, non-Iceberg non-partitioned catalogs only — a
    DISTINCT over the partition column (a column scan at 100 TB; the
    two metadata tiers exist so it never runs on a real deployment)."""
    source = strip_table_prefix(source)
    try:
        rows = spark.sql(
            f"SELECT partition.warc_day AS warc_day "
            f"FROM {source}.partitions"
        ).collect()
        return sorted(r["warc_day"] for r in rows
                      if r["warc_day"] is not None)
    except Exception:
        pass
    try:
        rows = spark.sql(f"SHOW PARTITIONS {source}").collect()
        vals = []
        for r in rows:
            for part in r[0].split("/"):
                k, _, v = part.partition("=")
                # the Hive null-partition sentinel is not a real value
                if k == "warc_day" and v and \
                        v != "__HIVE_DEFAULT_PARTITION__":
                    vals.append(v)
        # A table partitioned by some OTHER column answers SHOW
        # PARTITIONS with zero warc_day= keys — that means "this tier
        # cannot see warc_day", not "there are no partitions"; fall
        # through to the DISTINCT tier instead of planning zero work.
        if vals:
            return sorted(vals)
    except Exception:
        pass
    rows = (
        spark.read.table(source)
        .select("warc_day").distinct().collect()
    )
    return sorted(r["warc_day"] for r in rows if r["warc_day"] is not None)
