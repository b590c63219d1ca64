"""Robots-style longest-prefix URL policy — decide allow/deny per URL
from per-host path-prefix rule tables (RFC 9309 matching: the most
specific — longest — matching rule wins; on a length tie the least
strict rule applies, i.e. allow; a URL matching no rule is allowed).
The crawl-pipeline use: re-filter an already-fetched corpus against
current robots/policy snapshots before training export.

Scale shape: one left equi-join on host with the prefix match in the
join condition — rules tables are small per host (tens of prefixes),
so the join fans out each page row by its host's MATCHING rule count
only, with AQE free to broadcast the whole rule side — then one
per-URL argmax. The argmax is ``max_by`` over a (specificity, allow)
struct, not a window: map-side partial aggregation collapses each
URL's candidate rules before the shuffle. Pages whose host has no
rules, whose rules all miss, or whose URL has no parseable host keep
exactly one NULL-rule row through the left join and come back
allowed-by-default."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import host_col


def apply_robots_policy(pages: DataFrame, rules: DataFrame,
                        url_col: str = "url") -> DataFrame:
    """``pages`` (unique per ``url_col``) + ``rules(host, path_prefix,
    allow)`` → pages with ``(matched_prefix, allowed)``. Longest
    matching prefix per URL decides; ties prefer allow; no match →
    allowed with NULL ``matched_prefix``."""
    raw_path = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    tagged = (
        pages.withColumn("_host", host_col(F.col(url_col)))
        .withColumn(
            "_path",
            F.when(raw_path.isNull() | (raw_path == ""), F.lit("/"))
            .otherwise(raw_path))
    )
    r = rules.select(F.col("host").alias("_rhost"),
                     "path_prefix", "allow")
    cand = tagged.join(
        r,
        on=(F.col("_host") == F.col("_rhost"))
        & F.col("_path").startswith(F.col("path_prefix")),
        how="left",
    )
    # most specific wins; tie → allow (RFC 9309 least-strict rule)
    best = F.max_by(
        F.struct(F.col("path_prefix").alias("p"),
                 F.col("allow").alias("a")),
        F.struct(F.length("path_prefix").alias("l"),
                 F.col("allow").cast("int").alias("a")),
    )
    group_cols = [c for c in pages.columns]
    return (
        cand.groupBy(*group_cols)
        .agg(best.alias("_best"))
        .select(
            *group_cols,
            F.col("_best.p").alias("matched_prefix"),
            F.coalesce(F.col("_best.a"), F.lit(True)).alias("allowed"),
        )
    )
