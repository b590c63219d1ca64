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


def change_rate_estimates(captures: DataFrame,
                          url_col: str = "url",
                          ts_col: str = "ts_epoch",
                          digest_col: str = "digest") -> DataFrame:
    """Per-URL change-frequency estimation from crawl-capture history
    (Cho & Garcia-Molina, "Estimating Frequency of Change", TOIT 2003)
    — the statistic that turns an archive's capture index (CDX rows:
    url, timestamp, content digest) into a principled revisit policy.
    ``revisit_schedule`` trusts the site's DECLARED changefreq; this
    operator measures the OBSERVED one, which is what production
    crawlers actually schedule on.

    For each url with ``n`` captures ordered by timestamp, the ``n-1``
    consecutive pairs are change observations (digest differs ⇒ the
    page changed at least once in that gap). The naive ``X/(n-1)``
    ratio underestimates fast-changing pages (multiple changes inside
    one gap collapse to one observation); Cho's bias-corrected
    estimator for the per-gap change rate is::

        r = -ln((n_pairs - n_changed + 0.5) / (n_pairs + 0.5))

    Output per url: ``n_captures``, ``n_changed``, ``span_sec``
    (first→last capture), ``change_rate`` (r, rounded to 9 — NULL when
    only one capture exists: nothing observable), and
    ``revisit_interval_sec`` = expected seconds per change,
    ``(span_sec / n_pairs) / r`` floored to BIGINT — NULL when r = 0
    (never observed changing) or unobservable.

    Digest comparison is null-safe (``<=>``): NULL vs NULL is "no
    change", NULL vs digest is a change — missing digests are data.

    Scale shape: the lag window runs over narrow ``(url, ts, digest)``
    rows partitioned by url — per-url capture history is dozens of
    rows even for hot pages, so no skewed partition exists; the
    aggregate is one map-side-combinable groupBy on url. Payloads
    (page bytes) never enter. The DuckDB oracle is a genuine
    relational twin recomputing the full estimator, not a planted
    closed form.
    """
    from pyspark.sql import Window

    u, t, g = F.col(url_col), F.col(ts_col).cast("bigint"), F.col(digest_col)
    # _prev is NULL on each url's first row — but that row is not a
    # pair, and F.lag cannot distinguish "first row" from "a NULL
    # digest in the previous capture", so pair rows are marked by
    # row_number instead
    paired = captures.select(
        u.alias("url"), t.alias("_ts"), g.alias("_dg")
    ).select(
        "url", "_ts", "_dg",
        F.row_number().over(
            Window.partitionBy("url").orderBy(F.col("_ts").asc(),
                                              F.col("_dg").asc())
        ).alias("_rn"),
        F.lag("_dg").over(
            Window.partitionBy("url").orderBy(F.col("_ts").asc(),
                                              F.col("_dg").asc())
        ).alias("_prev"),
    )
    per_url = paired.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum(F.when((F.col("_rn") > 1) &
                     ~F.col("_dg").eqNullSafe(F.col("_prev")), 1)
              .otherwise(0)).cast("bigint").alias("n_changed"),
        (F.max("_ts") - F.min("_ts")).alias("span_sec"),
    )
    n_pairs = (F.col("n_captures") - 1).cast("double")
    rate = F.round(
        -F.log((n_pairs - F.col("n_changed").cast("double") + 0.5)
               / (n_pairs + 0.5)), 9)
    return per_url.select(
        "url", "n_captures", "n_changed", "span_sec",
        F.when(F.col("n_captures") > 1, rate).alias("change_rate"),
        F.when((F.col("n_captures") > 1) & (F.col("n_changed") > 0),
               F.floor((F.col("span_sec").cast("double") / n_pairs)
                       / rate).cast("bigint"))
        .alias("revisit_interval_sec"),
    )


def apportion_budget(scores: DataFrame, budget: int,
                     key_col: str = "host",
                     score_col: str = "score") -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global integer
    fetch budget across hosts by integer priority score: each host
    gets ``floor(budget * score / total)`` plus one extra for the
    hosts with the largest remainders, so quotas sum EXACTLY to
    ``budget`` — the crawl-planning step between host scoring
    (host_profile / wilson_host_rank) and per-host capping
    (cap_per_host), e.g. splitting a 10^9-fetch daily budget across
    10^7 hosts proportionally to their quality scores.

    Scores must be non-negative integers (page counts, milli-scores):
    ``budget * score`` stays in exact BIGINT, so base quotas and
    remainders are integer-exact and the DuckDB oracle recomputes them
    bit-for-bit. Ties in the remainder rank break by host name
    ascending — apportionment is a pure function of the input.

    Scale shape: ``total`` and the leftover count are two 1-row
    aggregates (metadata-scale driver values, the PageRank-counter
    discipline); the top-``leftover`` selection is a distributed
    TakeOrdered heap (``orderBy().limit()``), NEVER a single-partition
    global window; the +1 rejoin is a broadcast semi join on host.

    Returns ``(host, score, quota)``. Raises if the budget is negative,
    any score is negative/NULL, or all scores are zero with a nonzero
    budget (nothing to apportion by)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    s = scores.select(F.col(key_col).alias("host"),
                      F.col(score_col).cast("bigint").alias("score"))
    bad = s.where(F.col("score").isNull() | (F.col("score") < 0))
    if bad.take(1):
        raise ValueError("scores must be non-negative integers")
    tot_row = s.groupBy().agg(F.sum("score").alias("t")).collect()
    total = tot_row[0]["t"] if tot_row and tot_row[0]["t"] else 0
    if total == 0:
        if budget > 0:
            raise ValueError(
                "all scores are zero; cannot apportion a nonzero budget")
        return s.select("host", "score",
                        F.lit(0).cast("bigint").alias("quota"))
    # `div` is true BIGINT division (no double round-trip — a 10^18
    # product would lose low bits through a double)
    based = s.select(
        "host", "score",
        F.expr(f"score * {budget} div {total}").alias("_base"),
        F.expr(f"score * {budget} % {total}").alias("_rem"))
    leftover = budget - based.groupBy().agg(
        F.sum("_base").alias("b")).collect()[0]["b"]
    top = (based.orderBy(F.col("_rem").desc(), F.col("host").asc())
           .limit(int(leftover))
           .select("host", F.lit(1).cast("bigint").alias("_extra")))
    return (based.join(F.broadcast(top), "host", "left")
            .select("host", "score",
                    (F.col("_base")
                     + F.coalesce(F.col("_extra"), F.lit(0)))
                    .cast("bigint").alias("quota")))


def sitemap_coverage(declared: DataFrame, crawled: DataFrame,
                     declared_col: str = "loc",
                     crawled_col: str = "url") -> DataFrame:
    """Per-host crawl-completeness audit: of the URLs a site DECLARES
    in its sitemaps, how many did the crawl actually fetch? The
    frontier-ops companion to ``sitemap_urls`` (which extracts the
    declarations) — low coverage on a high-value host means the
    scheduler starved it; 100% coverage plus a large crawled-only
    remainder means the sitemap is stale or the site is trap-heavy
    (``url_templates``' territory). Site owners publish sitemaps
    precisely so crawlers can close this loop.

    Scale shape: both sides reduce to DISTINCT (host, url) —
    hash-keyed, near-uniform — then one left anti-style flag join on
    the full URL and a host-keyed count aggregation; all rows are two
    short strings, map-side combinable, no payload anywhere. Hosts
    are lowercased via the shared ``host_col`` rule; URLs compare
    EXACTLY (canonicalize both sides first — ``canonicalize_urls`` —
    when fetch logs disagree on tracking params).

    Output: ``(host, n_declared, n_crawled_of_declared,
    coverage_ppm)``, one row per host that declares at least one URL.
    """
    from .extract import host_col

    dec = (declared.where(F.col(declared_col).isNotNull())
           .select(F.col(declared_col).alias("_u")).distinct()
           .withColumn("_h", host_col(F.col("_u"))))
    got = (crawled.where(F.col(crawled_col).isNotNull())
           .select(F.col(crawled_col).alias("_u")).distinct()
           .withColumn("_hit", F.lit(1)))
    j = dec.join(got, "_u", "left")
    return (j.groupBy(F.col("_h").alias("host"))
            .agg(F.count(F.lit(1)).alias("n_declared"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                 .alias("n_crawled_of_declared"))
            .select("host", "n_declared",
                    F.col("n_crawled_of_declared").cast("bigint")
                    .alias("n_crawled_of_declared"),
                    F.expr("n_crawled_of_declared * 1000000"
                           " div n_declared")
                    .cast("bigint").alias("coverage_ppm")))
