"""URL template mining / crawler traps (operators/urlpatterns.py)."""

from pyspark.sql import functions as F

from document_extractor_spark.operators.urlpatterns import url_templates
from document_extractor_spark.plans import assert_no_python


def _templates(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {(r["host"], r["template"]): r
            for r in url_templates(df, **kw).collect()}


def test_template_collapse_and_counts(spark):
    urls = (
        [f"https://a.org/cal/2026/{m}/{d}" for m in (1, 2) for d in (3, 4)]
        + ["https://a.org/p/7", "https://a.org/p/8", "https://a.org/p/8",
           "https://a.org/s?sid=deadbeefdeadbeefdeadbeef",
           "https://a.org/s?sid=0123456789abcdef0123",
           "https://a.org/about", "https://B.org/about"]
    )
    got = _templates(spark, urls, trap_min_urls=4)
    cal = got[("a.org", "/cal/{n}/{n}/{n}")]
    assert (cal["n_urls"], cal["n_fetches"], cal["is_trap"]) == (4, 4, True)
    p = got[("a.org", "/p/{n}")]
    assert (p["n_urls"], p["n_fetches"], p["is_trap"]) == (2, 3, False)
    sid = got[("a.org", "/s?sid={hex}")]
    assert sid["n_urls"] == 2                   # hex run beats digit run
    assert got[("a.org", "/about")]["n_urls"] == 1
    assert ("b.org", "/about") in got           # host lowercased


def test_unparseable_and_bare_host(spark):
    got = _templates(spark, ["https://x.org", "not a url", "ftp:weird"])
    assert got[("x.org", "/")]["n_urls"] == 1   # empty path → '/'
    assert (None, "/") in got                   # unparseable grouped on NULL


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("https://a.org/1",)], "url string")
    assert_no_python(url_templates(df))
