"""Robots longest-prefix policy (operators/robots.py) — RFC 9309
matching: most specific wins, ties prefer allow, no match allows."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.robots import apply_robots_policy
from document_extractor_spark.plans import assert_no_python


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, path_prefix string, allow boolean")


def test_robots_longest_prefix_and_defaults(spark):
    pages = spark.createDataFrame(
        [("https://a.example.org/private/x", 1),
         ("https://a.example.org/private/open/y", 2),
         ("https://a.example.org/public", 3),
         ("https://a.example.org/", 4),
         ("https://norules.example.org/z", 5),
         ("notaurl", 6)],
        "url string, doc_id bigint")
    rules = _rules(spark, [
        ("a.example.org", "/private", False),
        ("a.example.org", "/private/open", True),
        ("a.example.org", "/", True),
    ])
    got = {r["doc_id"]: (r["matched_prefix"], r["allowed"])
           for r in apply_robots_policy(pages, rules).collect()}
    assert got == {
        1: ("/private", False),          # most specific deny
        2: ("/private/open", True),      # deeper allow overrides
        3: ("/", True),
        4: ("/", True),                  # empty path normalizes to /
        5: (None, True),                 # host with no rules
        6: (None, True),                 # unparseable URL
    }


def test_robots_tie_prefers_allow(spark):
    """RFC 9309: equally specific conflicting rules → least strict."""
    pages = spark.createDataFrame(
        [("https://t.example.org/dir/f", 1)], "url string, doc_id bigint")
    rules = _rules(spark, [
        ("t.example.org", "/dir", False),
        ("t.example.org", "/dir", True),
    ])
    [r] = apply_robots_policy(pages, rules).collect()
    assert (r["matched_prefix"], r["allowed"]) == ("/dir", True)


def test_robots_mixed_case_host_matches(spark):
    pages = spark.createDataFrame(
        [("https://WWW.Example.ORG/secret", 1)], "url string, doc_id bigint")
    rules = _rules(spark, [("www.example.org", "/secret", False)])
    [r] = apply_robots_policy(pages, rules).collect()
    assert r["allowed"] is False


def test_robots_stays_jvm_side(spark):
    pages = spark.createDataFrame(
        [("https://a.example.org/p", 1)], "url string, doc_id bigint")
    rules = _rules(spark, [("a.example.org", "/", True)])
    assert_no_python(apply_robots_policy(pages, rules))


def test_robots_mixed_case_rule_host_matches(spark):
    """Rule hosts are canonicalized too — a mixed-case DENY rule must
    not be silently bypassed into default-allow."""
    pages = spark.createDataFrame(
        [("https://ads.badsite.com/x", 1)], "url string, doc_id bigint")
    rules = _rules(spark, [("Ads.BadSite.com", "/", False)])
    [r] = apply_robots_policy(pages, rules).collect()
    assert r["allowed"] is False and r["matched_prefix"] == "/"


def test_robots_arbitrary_page_schemas(spark):
    """Pages may carry map-typed columns and columns named like rule
    columns — the verdict is computed on a projection and joined back."""
    pages = spark.createDataFrame(
        [("https://a.example.org/p", {"k": "v"}, False)],
        "url string, props map<string,string>, allow boolean")
    rules = _rules(spark, [("a.example.org", "/p", True)])
    [r] = apply_robots_policy(pages, rules).collect()
    assert r["allowed"] is True and r["allow"] is False
    assert r["props"] == {"k": "v"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="allowed"):
        apply_robots_policy(
            pages.withColumnRenamed("allow", "allowed"), rules)


# --- robots.txt parsing -------------------------------------------------------

from document_extractor_spark.operators.robots import parse_robots_txt


def _parse(spark, txt):
    df = spark.createDataFrame([(1, txt)], "doc_id bigint, robots_txt string")
    return sorted((r["agent"], r["rule_type"], r["value"])
                  for r in parse_robots_txt(df).collect())


def test_groups_shared_headers_and_sitemap(spark):
    txt = (
        "# a comment\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok  # trailing comment\n"
        "Crawl-Delay: 2\n"
        "\r\n"
        "User-agent: botA\n"
        "User-Agent: botB\n"          # shared group header
        "Disallow: /\n"
        "\n"
        "Sitemap: https://e.org/s.xml\n"
        "Weird-Directive: ignored\n"
    )
    got = _parse(spark, txt)
    assert got == sorted([
        ("*", "disallow", "/private/"),
        ("*", "allow", "/private/ok"),
        ("*", "crawl_delay", "2"),
        ("botA", "disallow", "/"),
        ("botB", "disallow", "/"),
        ("", "sitemap", "https://e.org/s.xml"),
    ])


def test_new_ua_run_starts_new_group(spark):
    txt = ("User-agent: a\nDisallow: /x\n"
           "User-agent: b\nDisallow: /y\n")
    got = _parse(spark, txt)
    assert got == sorted([("a", "disallow", "/x"), ("b", "disallow", "/y")])


def test_rules_before_any_group_and_empty_payloads(spark):
    # a rule with no preceding User-agent has no group → dropped
    assert _parse(spark, "Disallow: /orphan\n") == []
    assert _parse(spark, "") == []
    df = spark.createDataFrame([(1, None)],
                               "doc_id bigint, robots_txt string")
    assert parse_robots_txt(df).collect() == []


def test_parse_plan_jvm_only(spark):
    from document_extractor_spark.plans import assert_no_python
    df = spark.createDataFrame([(1, "User-agent: *\nDisallow: /")],
                               "doc_id bigint, robots_txt string")
    assert_no_python(parse_robots_txt(df))


def test_robots_wildcard_star_and_anchor(spark):
    """RFC 9309 §2.2.3: '*' spans octets, trailing '$' anchors; a
    wildcard rule's specificity is its octet length."""
    from document_extractor_spark.operators.robots import (
        apply_robots_policy)

    pages = spark.createDataFrame(
        [("https://h.example/docs/report.pdf",),
         ("https://h.example/docs/report.pdf?dl=1",),
         ("https://h.example/docs/page.html",),
         ("https://h.example/a/x/sessionid=9",)],
        "url string")
    rules = spark.createDataFrame(
        [("h.example", "/*.pdf$", False),
         ("h.example", "/a/*sessionid=", False),
         ("h.example", "/docs/", True)],
        "host string, path_prefix string, allow boolean")
    got = {r["url"]: r for r in
           apply_robots_policy(pages, rules).collect()}
    # '.pdf$' (8 octets) beats '/docs/' (6) and anchors: the ?dl=1
    # variant does NOT match the anchored rule, so /docs/ allows it
    assert got["https://h.example/docs/report.pdf"]["allowed"] is False
    assert got["https://h.example/docs/report.pdf"]["matched_prefix"] \
        == "/*.pdf$"
    assert got["https://h.example/docs/report.pdf?dl=1"]["allowed"] is True
    assert got["https://h.example/docs/page.html"]["allowed"] is True
    assert got["https://h.example/a/x/sessionid=9"]["allowed"] is False


def test_robots_hostile_rule_patterns_match_literally(spark):
    """Regex metachars in rule patterns are data, not syntax: '/a+b('
    matches the literal path and never throws; '$' mid-pattern is
    literal."""
    from document_extractor_spark.operators.robots import (
        apply_robots_policy)

    pages = spark.createDataFrame(
        [("https://h.example/a+b(c",),
         ("https://h.example/aab",),
         ("https://h.example/x$y/z",)],
        "url string")
    rules = spark.createDataFrame(
        [("h.example", "/a+b(", False),
         ("h.example", "/x$y/*", False)],
        "host string, path_prefix string, allow boolean")
    got = {r["url"]: r["allowed"] for r in
           apply_robots_policy(pages, rules).collect()}
    assert got["https://h.example/a+b(c"] is False
    assert got["https://h.example/aab"] is True       # '+' is literal
    assert got["https://h.example/x$y/z"] is False    # mid-'$' literal
