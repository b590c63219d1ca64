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
