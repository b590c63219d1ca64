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
