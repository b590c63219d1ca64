"""URL template mining — crawler-trap detection for frontier hygiene.

Infinite URL spaces (calendar pages, session-id links, unbounded
pagination, faceted search) are the classic crawler trap: a single
template like ``/cal/{n}/{n}/{n}`` can emit millions of URLs carrying
the same near-empty page. Frontier schedulers (see ``frontier.py``)
need to know WHICH templates on a host explode so they can cap or skip
them; curation needs the same signal because trap pages are boilerplate
by construction. The reference app has no crawl tier; this extends the
robots/sitemap/frontier group of the beyond-reference mandate.

Method (the shape used by production crawlers, cf. the IRLbot
"spam/trap" budgeting idea, WWW 2008): collapse each URL's variable
parts — long hex runs (session ids, content hashes) to ``{hex}`` first,
then digit runs to ``{n}`` — and aggregate per (host, template). A
template whose distinct-URL fan-out exceeds a budget is flagged a trap.

Spark-first: template derivation is a JVM regexp chain (host extract,
path+query extract, two regexp_replace passes) inside whole-stage
codegen; the only shuffle is the (host, template, url) distinct-count
aggregate — narrow all-string rows, map-side partial-aggregated, keyed
by (host, template) which is far better spread than host alone. No
Python, no explode, payloads never involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: hex runs first (an md5 is also a digit-bearing string),
# digits second. Both patterns are in the Java∩RE2 subset so the DuckDB
# twin evaluates the identical collapse.
_HEX_RUN = "[0-9a-fA-F]{16,}"
_DIGIT_RUN = "[0-9]+"
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATHQ_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)"


def url_templates(df: DataFrame, url_col: str = "url",
                  trap_min_urls: int = 100) -> DataFrame:
    """``(host, template, n_urls, n_fetches, is_trap)`` — one row per
    (host, URL template), where ``n_urls`` counts DISTINCT urls and
    ``n_fetches`` total rows (a recrawled URL adds fetches, not urls).
    ``is_trap`` flags templates whose distinct fan-out reaches
    ``trap_min_urls`` — the frontier budget knob. URLs with no
    parseable scheme://host get a NULL host and group together for
    inspection rather than being dropped."""
    u = F.col(url_col)
    host = F.nullif(F.lower(F.regexp_extract(u, _HOST_RE, 1)), F.lit(""))
    pathq = F.regexp_extract(u, _PATHQ_RE, 1)
    template = F.regexp_replace(
        F.regexp_replace(
            F.when(pathq == "", F.lit("/")).otherwise(pathq),
            _HEX_RUN, "{hex}"),
        _DIGIT_RUN, "{n}")
    return (
        df.select(host.alias("host"), template.alias("template"),
                  u.alias("_url"))
        .groupBy("host", "template")
        .agg(F.countDistinct("_url").alias("n_urls"),
             F.count(F.lit(1)).alias("n_fetches"))
        .withColumn("is_trap", F.col("n_urls") >= F.lit(trap_min_urls))
    )
