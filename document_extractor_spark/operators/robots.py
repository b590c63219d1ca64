"""Robots-style longest-prefix URL policy — decide allow/deny per URL
from per-host path-prefix rule tables (RFC 9309 matching: the most
specific — longest — matching rule wins; on a length tie the least
strict rule applies, i.e. allow; a URL matching no rule is allowed).
The crawl-pipeline use: re-filter an already-fetched corpus against
current robots/policy snapshots before training export.

Scale shape: the verdict is computed over a (url, host, path)
PROJECTION of the pages — never the payload — via one left equi-join
on host with the prefix match in the join condition (rules tables are
small per host, AQE can broadcast the whole side), then a per-URL
argmax and a join back onto the full pages frame. The argmax is
``max_by`` over a (specificity, allow) struct, not a window: map-side
partial aggregation collapses each URL's candidate rules before the
shuffle. Projecting first keeps arbitrary page schemas safe (map-typed
columns, columns named like rule columns) and keeps the rule fan-out
off the payload. Pages whose host has no rules, whose rules all miss,
or whose URL has no parseable host keep exactly one NULL-rule row
through the left join and come back allowed-by-default. Rule hosts are
lowercased to match ``host_col``'s canonicalization (RFC 3986 — the
same two-sided rule as the url_filter blocklist join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import host_col


def apply_robots_policy(pages: DataFrame, rules: DataFrame,
                        url_col: str = "url") -> DataFrame:
    """``pages`` (unique per ``url_col``) + ``rules(host, path_prefix,
    allow)`` → pages with ``(matched_prefix, allowed)`` appended.
    The most specific (most octets, RFC 9309) matching rule per URL
    decides; ties prefer allow; no match → allowed with NULL
    ``matched_prefix``. Patterns support the RFC's ``*`` (any octets)
    and trailing ``$`` (end anchor); everything else matches
    literally."""
    clash = {"matched_prefix", "allowed"} & set(pages.columns)
    if clash:
        raise ValueError(f"pages already has output columns: "
                         f"{sorted(clash)}")
    raw_path = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    raw_query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    path_only = F.when(raw_path.isNull() | (raw_path == ""), F.lit("/")) \
        .otherwise(raw_path)
    # RFC 9309 matches against path PLUS query (session-id wildcard
    # rules exist precisely to target queries); prefix rules on pure
    # paths are unaffected (the query only extends the string).
    tagged = pages.select(
        F.col(url_col).alias("_url"),
        host_col(F.col(url_col)).alias("_host"),
        F.when(raw_query.isNull() | (raw_query == ""), path_only)
        .otherwise(F.concat(path_only, F.lit("?"), raw_query))
        .alias("_path"),
    )
    r = rules.select(F.lower(F.col("host")).alias("_rhost"),
                     F.col("path_prefix").alias("_pfx"),
                     F.col("allow").alias("_allow"))
    # RFC 9309 §2.2.3 wildcard patterns: '*' matches any octets, a
    # TRAILING '$' anchors the end of the path (elsewhere '$' is
    # literal). Patterns without either stay on the cheap startswith
    # fast path; wildcard rules compile to an anchored regex built
    # from the pattern with every other regex metachar escaped (rule
    # files are hostile input — a rule like '/a+b(' must match
    # literally, never throw or inject).
    pat = F.col("_pfx")
    has_anchor = pat.endswith("$")
    core = F.when(has_anchor, F.substring(
        pat, 1, F.length(pat) - F.lit(1))).otherwise(pat)
    esc = F.regexp_replace(core, r"([.\\+?(){}\[\]|^$])", r"\\$1")
    rx = F.concat(
        F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
        F.when(has_anchor, F.lit("$")).otherwise(F.lit("")))
    path_match = F.when(
        pat.contains("*") | has_anchor,
        F.regexp_like(F.col("_path"), rx),
    ).otherwise(F.col("_path").startswith(pat))
    cand = tagged.join(
        r,
        on=(F.col("_host") == F.col("_rhost")) & path_match,
        how="left",
    )
    # most specific wins; tie → allow (RFC 9309 least-strict rule)
    best = F.max_by(
        F.struct(F.col("_pfx").alias("p"), F.col("_allow").alias("a")),
        F.struct(F.length("_pfx").alias("l"),
                 F.col("_allow").cast("int").alias("a")),
    )
    verdict = (
        cand.groupBy("_url")
        .agg(best.alias("_best"))
        .select(
            F.col("_url"),
            F.col("_best.p").alias("matched_prefix"),
            F.coalesce(F.col("_best.a"), F.lit(True)).alias("allowed"),
        )
    )
    joined = pages.join(
        verdict, on=pages[url_col] == verdict._url, how="left"
    ).drop("_url")
    # a NULL url can't equi-join its own verdict row — still allowed
    return joined.withColumn(
        "allowed", F.coalesce("allowed", F.lit(True)))


def parse_robots_txt(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "robots_txt") -> DataFrame:
    """Parse raw robots.txt text into rule rows ``(id, agent,
    rule_type, value)`` — the missing front half of this module:
    :func:`apply_robots_policy` consumes per-host rule tables, and
    ``frontier.politeness_schedule`` consumes Crawl-delays; this
    produces both from the fetched robots.txt payloads themselves.

    RFC 9309 group semantics: consecutive ``User-agent`` lines form
    ONE group header and every rule in the group body applies to each
    named agent (so the output fans rules out per agent); a later
    ``User-agent`` run starts a new group. ``Sitemap`` is a standalone
    directive outside groups — emitted with ``agent=''`` (never NULL —
    a global row, not an unknown one). Comments (``#…``), blank lines,
    and unknown directives are dropped; directive names are
    case-insensitive; CRLF tolerated.

    Spark shape: staged line split + ``posexplode_outer``; group ids
    are the classic gaps-and-islands cumulative sum of group-boundary
    flags over a per-document window (line-number rows — metadata
    width, thousands per host at most); agents join rules within
    (id, group) — a narrow self-join whose fan-out is the group's
    agent count (single digits in real files). All JVM.
    """
    from pyspark.sql import Window

    line0 = F.trim(F.regexp_replace(F.col("_rb_line"), "#.*$", ""))
    directive = F.lower(F.regexp_extract(line0, r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(line0, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    staged = (
        df.select(F.col(id_col),
                  F.split(F.col(payload_col), r"\r?\n").alias("_rb_ls"))
        .select(id_col, F.posexplode_outer("_rb_ls")
                .alias("_rb_pos", "_rb_line"))
        .withColumns({"_rb_dir": directive, "_rb_val": value})
        .where(F.col("_rb_dir").isin("user-agent", "allow", "disallow",
                                     "crawl-delay", "sitemap")
               & (F.col("_rb_val") != ""))
    )
    w = Window.partitionBy(id_col).orderBy("_rb_pos")
    is_ua = (F.col("_rb_dir") == "user-agent")
    boundary = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = staged.withColumn(
        "_rb_grp",
        F.sum(boundary.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    agents = grouped.where(is_ua).select(
        F.col(id_col), F.col("_rb_grp"), F.col("_rb_val").alias("agent"))
    rules = grouped.where(
        F.col("_rb_dir").isin("allow", "disallow", "crawl-delay")).select(
        F.col(id_col), F.col("_rb_grp"),
        F.replace(F.col("_rb_dir"), F.lit("-"), F.lit("_"))
        .alias("rule_type"),
        F.col("_rb_val").alias("value"))
    grouped_rules = agents.join(rules, [id_col, "_rb_grp"]).drop("_rb_grp")
    sitemaps = grouped.where(F.col("_rb_dir") == "sitemap").select(
        F.col(id_col), F.lit("").alias("agent"),
        F.lit("sitemap").alias("rule_type"),
        F.col("_rb_val").alias("value"))
    return grouped_rules.unionByName(sitemaps)
