"""PDF /Outlines bookmark extraction (extractor/pdf_extract.pdf_outline
+ operators/media.pdf_outline_probe)."""

from document_extractor_spark.extractor.pdf_extract import pdf_outline
from document_extractor_spark.sources.generator import build_pdf

TWO_PAGES = [[(72, 720, 12, ["page one"])], [(72, 720, 12, ["page two"])]]


def test_nested_tree_preorder():
    pdf = build_pdf(TWO_PAGES, outlines=[
        ("Intro", 0, []),
        ("Body", 0, [("Part A", 1, []), ("Part B", 1, [])]),
        ("End", 1, []),
    ])
    got = pdf_outline(pdf)
    assert [(n["pos"], n["level"], n["title"], n["page_idx"])
            for n in got] == [
        (0, 0, "Intro", 0),
        (1, 0, "Body", 0),
        (2, 1, "Part A", 1),
        (3, 1, "Part B", 1),
        (4, 0, "End", 1),
    ]


def test_no_outlines_and_hostile_inputs():
    assert pdf_outline(build_pdf(TWO_PAGES)) == []
    assert pdf_outline(b"not a pdf at all") == []
    assert pdf_outline(b"") == []
    # escaped parens in a title survive the literal decoder
    pdf = build_pdf(TWO_PAGES, outlines=[("A (draft)", 0, [])])
    assert pdf_outline(pdf)[0]["title"] == "A (draft)"


def test_cycle_guard():
    pdf = build_pdf(TWO_PAGES, outlines=[("A", 0, []), ("B", 1, [])])
    # find B's object and point its /Next back at A (a lying PDF)
    import re

    m_a = re.search(rb"(\d+) 0 obj\n<< /Title \(A\)", pdf)
    m_b = re.search(rb"/Title \(B\)[^>]*>>", pdf)
    assert m_a and m_b
    broken = (pdf[:m_b.start()]
              + m_b.group(0).replace(
                  b">>", b" /Next " + m_a.group(1) + b" 0 R >>")
              + pdf[m_b.end():])
    got = pdf_outline(broken)  # must terminate
    assert [n["title"] for n in got] == ["A", "B"]


def test_probe_skips_non_pdf_rows(spark):
    from document_extractor_spark.operators.media import pdf_outline_probe

    pdf = build_pdf(TWO_PAGES, outlines=[("Only", 1, [])])
    df = spark.createDataFrame(
        [("u1", bytearray(pdf)), ("u2", bytearray(b"<html>x</html>")),
         ("u3", None)],
        "url string, html binary")
    rows = pdf_outline_probe(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["url"], r["pos"], r["level"], r["title"], r["page_idx"]) == \
        ("u1", 0, 0, "Only", 1)
