"""Snapshot diff — compare two crawl snapshots by key and classify
every URL as added / removed / changed / unchanged. The crawl-ops use:
revisit policy tuning (how much of the web moved since last month?),
incremental re-extraction planning (only ``changed`` needs the
pipeline re-run), and index maintenance.

Scale shape: both sides reduce to (key, content-fingerprint) BEFORE
the compare, so the one full-outer shuffle moves two 16-byte-ish
columns per row, never the payload. The fingerprint is the repo's
md5-based ``fingerprint`` (exact DuckDB twin), so the whole diff has a
closed-form oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """One row per key present in either snapshot:
    ``(key, status ∈ {added, removed, changed, unchanged})``. Keys must
    be unique per snapshot (crawl tables are, post-dedup). A NULL text
    fingerprints as NULL; two NULLs compare as unchanged (null-safe
    equality), NULL-vs-text as changed."""
    oh = old.select(F.col(key_col).alias("_k"),
                    fingerprint(text_col).alias("_oldh"),
                    F.lit(True).alias("_in_old"))
    nh = new.select(F.col(key_col).alias("_k"),
                    fingerprint(text_col).alias("_newh"),
                    F.lit(True).alias("_in_new"))
    j = oh.join(nh, "_k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_oldh").eqNullSafe(F.col("_newh")),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("_k").alias(key_col), status.alias("status"))
