"""Soft dedup — inverse-multiplicity weights (operators/dedup.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.dedup import soft_dedup_weights
from document_extractor_spark.plans import assert_no_python, physical_plan


def _df(spark):
    rows = [
        (0, "the same press release"),
        (1, "THE  same   press release"),   # normalizes equal to 0
        (2, "the same press release"),
        (3, "a unique document"),
        (4, None),                          # no content evidence
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_weights_are_inverse_multiplicity(spark):
    got = {r["doc_id"]: (r["n_dups"], r["weight_ppm"])
           for r in soft_dedup_weights(_df(spark)).collect()}
    assert got == {
        0: (3, 333333),
        1: (3, 333333),
        2: (3, 333333),
        3: (1, 1000000),
    }


def test_weight_mass_is_conserved_per_group(spark):
    """Each dup family's total weight stays within rounding of one
    document: n * (scale div n) <= scale < n * (scale div n) + n."""
    out = soft_dedup_weights(_df(spark)).collect()
    fams = {}
    for r in out:
        fams.setdefault(r["n_dups"], []).append(r["weight_ppm"])
    for n, ws in fams.items():
        assert len(ws) % n == 0
        assert 1_000_000 - n < ws[0] * n <= 1_000_000


def test_scale_guard_and_custom_scale(spark):
    with pytest.raises(ValueError, match="scale_ppm"):
        soft_dedup_weights(_df(spark), scale_ppm=0)
    got = soft_dedup_weights(_df(spark), scale_ppm=600).collect()
    assert {r["weight_ppm"] for r in got if r["n_dups"] == 3} == {200}


def test_text_never_shuffles(spark):
    out = soft_dedup_weights(_df(spark))
    assert_no_python(out)
    for line in physical_plan(out).splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
