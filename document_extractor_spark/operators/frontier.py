"""Crawl revisit scheduling — turn sitemap metadata into fetch-due
verdicts. The frontier story's last step: robots.txt policy
(robots.py) gates, sitemaps/feeds (sources/sitemaps.py, feeds.py)
seed, and this operator decides WHEN each seed is worth refetching,
from the site's own declared ``changefreq``/``lastmod`` (sitemaps.org
protocol semantics).

Pure JVM CASE + epoch arithmetic — exact BIGINT seconds everywhere, so
the DuckDB twin recomputes the full semantics (a genuine relational
twin, not a planted closed form). ``now_epoch`` is an explicit
parameter: schedule computation is a pure function of its inputs —
deterministic, replayable, testable (the repo rule; nothing reads the
wall clock).

Semantics:

* interval = the protocol table (hourly 3600 … yearly 31536000);
  ``never`` → NULL interval (do not revisit); absent or unrecognized →
  ``default_interval_sec`` (a crawler must assume SOMETHING for the
  long tail of sloppy sitemaps).
* ``next_fetch_epoch`` = epoch(lastmod) + interval; unparseable or
  missing lastmod → NULL (``try_to_timestamp`` — malformed dates are
  data, not task errors).
* ``fetch_due`` = false for ``never``; true when lastmod is unknown
  (never observed ⇒ fetch now); else ``next_fetch_epoch ≤ now``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sitemaps.org changefreq → seconds ("always" is clamped to hourly:
# refetching more often than the frontier's own cycle is self-DoS)
FREQ_SECONDS = {
    "always": 3600,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
}


def revisit_schedule(df: DataFrame, now_epoch: int,
                     loc_col: str = "loc",
                     lastmod_col: str = "lastmod",
                     changefreq_col: str = "changefreq",
                     default_interval_sec: int = 604800) -> DataFrame:
    """``(loc, interval_sec, next_fetch_epoch, fetch_due)`` per input
    row — see module docstring for the exact semantics."""
    freq = F.lower(F.trim(F.col(changefreq_col)))
    interval = F.when(freq == "never", F.lit(None).cast("bigint"))
    for name, sec in FREQ_SECONDS.items():
        interval = interval.when(freq == name, F.lit(sec))
    interval = interval.otherwise(F.lit(int(default_interval_sec)))
    last_epoch = F.unix_timestamp(
        F.try_to_timestamp(F.col(lastmod_col))).cast("bigint")
    # one projection — every expression resolves against the input df
    return df.select(
        F.col(loc_col).alias("loc"),
        interval.alias("interval_sec"),
        (last_epoch + interval).cast("bigint").alias("next_fetch_epoch"),
        F.when(freq == "never", F.lit(False))
        .when(last_epoch.isNull(), F.lit(True))
        .otherwise((last_epoch + interval) <= F.lit(int(now_epoch)))
        .alias("fetch_due"),
    )


def politeness_schedule(plan: DataFrame, delays: DataFrame,
                        url_col: str = "url",
                        default_delay_ms: int = 250) -> DataFrame:
    """Per-host serialized fetch slots — the last mile between a fetch
    plan (e.g. ``cdx_fetch_plan`` output, or ``revisit_schedule``'s
    due rows) and the fetcher fleet: RFC 9309 implementations honor a
    per-host Crawl-delay, so a host's fetches must run SERIALLY spaced
    by its delay while different hosts run in parallel. Each URL gets
    ``slot_ms`` (its start offset inside the host's lane) and every
    host a drain time, so the scheduler can see which hosts bound the
    crawl's wall-clock (a million-URL host at 1 fetch/s is 11 days —
    that host needs negotiation or trimming, and this operator is
    where it shows up).

    ``delays`` is a (host, delay_ms) table (from robots.txt
    Crawl-delay parsing); absent hosts get ``default_delay_ms``. The
    slot assignment is a per-host ``row_number`` ordered by url —
    deterministic, and the window rows are fetch-plan metadata whose
    per-host cardinality is exactly the thing the operator exists to
    expose (the drain report IS the skew report). All integer
    arithmetic.

    Output: plan columns + ``host``, ``delay_ms``, ``slot_ms``,
    ``host_drain_ms`` (identical on every row of a host).
    """
    from pyspark.sql import Window

    u = F.col(url_col)
    host = F.nullif(
        F.lower(F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1)),
        F.lit(""))
    d = delays.select(F.col("host").alias("_ph_host"),
                      F.col("delay_ms").cast("bigint").alias("_ph_delay"))
    keyed = (
        plan.withColumn("host", host)
        .join(F.broadcast(d), F.col("host") == F.col("_ph_host"), "left")
        .withColumn("delay_ms",
                    F.coalesce("_ph_delay",
                               F.lit(int(default_delay_ms)).cast("bigint")))
        .drop("_ph_host", "_ph_delay")
    )
    w = Window.partitionBy("host").orderBy(u.asc())
    lane = Window.partitionBy("host")
    return (
        keyed.withColumn("slot_ms",
                         (F.row_number().over(w) - 1) * F.col("delay_ms"))
        .withColumn("host_drain_ms",
                    F.max(F.col("slot_ms") + F.col("delay_ms")).over(lane))
    )
