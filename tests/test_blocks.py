"""Block-scoring profile export (operators/blocks.py) — the north rule's
Boilerpipe-style block scoring surfaced as rows."""

from document_extractor_spark.operators.blocks import block_profile


def _pages(spark, payloads):
    rows = [(f"https://t.example.org/{i}",
             bytearray(p) if p is not None else None)
            for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "url string, html binary")


CHROME_PAGE = (
    b"<!DOCTYPE html><html><body>"
    b"<nav><ul><li><a href='/a'>Cat A</a></li>"
    b"<li><a href='/b'>Cat B</a></li></ul></nav>"
    b"<main><h1>Title Here</h1>"
    b"<p>A real paragraph with quite enough words to pass the classifier"
    b" comfortably.</p></main>"
    b"<footer><p>Copyright 2026 <a href='/t'>Terms</a></p></footer>"
    b"</body></html>"
)


def test_chrome_vs_content_verdicts(spark):
    rows = block_profile(_pages(spark, [CHROME_PAGE])).collect()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r["tag"], []).append(r)
    assert all(not r["is_content"] for r in by_tag["li"])
    assert all(r["link_density"] == 1.0 for r in by_tag["li"])
    (p_main, p_foot) = sorted(by_tag["p"], key=lambda r: r["block_idx"])
    assert p_main["is_content"] and p_main["link_density"] == 0.0
    assert not p_foot["is_content"] and p_foot["n_link_words"] == 1
    # heading attaches to the kept paragraph that follows it
    assert by_tag["h1"][0]["is_content"]
    assert [r["block_idx"] for r in sorted(rows, key=lambda r: r["block_idx"])] \
        == list(range(len(rows)))
    assert all(r["parse_error"] is None for r in rows)


def test_hostile_inputs_isolated(spark):
    rows = block_profile(_pages(spark, [
        None,                                   # 0: null payload
        b"",                                    # 1: empty
        b"\xff\xfe\x00garbage\x00bytes",        # 2: not UTF-8
        b"<p>unclosed <b>mess <table><tr><td>x",  # 3: malformed markup
        CHROME_PAGE,                            # 4: control
    ])).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    null_rows = by_url["https://t.example.org/0"]
    assert len(null_rows) == 1 and null_rows[0]["parse_error"] == "null payload"
    assert "https://t.example.org/1" not in by_url  # no blocks, no rows
    # hostile pages never fail the task; the control page still profiles
    assert any(r["is_content"] for r in by_url["https://t.example.org/4"])


def test_template_profile_counts_and_share(spark):
    """Three h-a pages share one skeleton, one differs; parse_error
    pages are excluded; ppm share is exact integer division."""
    from document_extractor_spark.operators.blocks import template_profile

    rows = []
    # host a: 3 pages with skeleton (h1, p), 1 page with (h1, p, p)
    for u in range(3):
        rows += [(f"https://a.example/{u}", 0, "h1", None),
                 (f"https://a.example/{u}", 1, "p", None)]
    rows += [("https://a.example/x", 0, "h1", None),
             ("https://a.example/x", 1, "p", None),
             ("https://a.example/x", 2, "p", None)]
    # host b: one parse_error page (no skeleton) + one real page
    rows += [("https://b.example/bad", None, None, "boom"),
             ("https://b.example/ok", 0, "p", None)]
    df = spark.createDataFrame(
        rows, "url string, block_idx int, tag string, parse_error string")
    got = {r["host"]: r for r in template_profile(df).collect()}
    a = got["a.example"]
    assert (a["n_pages"], a["n_templates"], a["top_template_pages"]) \
        == (4, 2, 3)
    assert a["template_share_ppm"] == 750000
    b = got["b.example"]
    assert (b["n_pages"], b["n_templates"], b["template_share_ppm"]) \
        == (1, 1, 1000000)


def test_template_profile_order_insensitive_skeleton(spark):
    """The skeleton is document order (block_idx), not row arrival
    order — shuffled input rows produce the same skeleton."""
    from document_extractor_spark.operators.blocks import template_profile

    fwd = [("https://h.example/1", i, t, None)
           for i, t in enumerate(["h1", "p", "li"])]
    rev = [("https://h.example/2", i, t, None)
           for i, t in enumerate(["h1", "p", "li"])][::-1]
    df = spark.createDataFrame(
        fwd + rev, "url string, block_idx int, tag string, "
                   "parse_error string")
    got = template_profile(df).collect()
    assert len(got) == 1 and got[0]["n_templates"] == 1


def test_template_profile_end_to_end_over_block_profile(spark):
    """Real pipeline: planted HTML → block_profile kernel →
    template_profile; the two hosts' skeletons differ by one <p>."""
    from document_extractor_spark.operators.blocks import (
        block_profile,
        template_profile,
    )

    def page(host, i, n_paras):
        body = "<h1>Title here</h1>" + "<p>five words are here now</p>" * n_paras
        return (f"https://{host}/d/{i}",
                bytearray(f"<html><body>{body}</body></html>".encode()))

    pages = spark.createDataFrame(
        [page("t1.example", i, 2) for i in range(4)]
        + [page("t2.example", i, 2 + i % 2) for i in range(4)],
        "url string, html binary")
    got = {r["host"]: r
           for r in template_profile(block_profile(pages)).collect()}
    assert got["t1.example"]["n_templates"] == 1
    assert got["t1.example"]["template_share_ppm"] == 1000000
    assert got["t2.example"]["n_templates"] == 2
    assert got["t2.example"]["template_share_ppm"] == 500000
