"""Z-order layout keys (operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.layout import (
    with_zorder_key,
    zorder_key,
)
from document_extractor_spark.plans import assert_no_python


def _py_morton(vals, bits):
    key = 0
    k = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * k + j)
    return key


def test_zorder_matches_python_reference(spark):
    rows = [(3, 5), (0, 0), (255, 255), (170, 85), (1, 128)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = [r["zorder_key"] for r in
           with_zorder_key(df, ["x", "y"], bits=8)
           .orderBy("x", "y").collect()]
    want = [_py_morton([x, y], 8) for x, y in sorted(rows)]
    assert got == want


def test_zorder_quadrant_separation(spark):
    """Every point in the low quadrant (x<128, y<128) keys strictly
    below every point with either coordinate >= 128 — the row-group
    pruning property (bits=8, 2 cols → top two key bits are the two
    coordinates' top bits)."""
    rows = [(x, y) for x in (0, 64, 127, 128, 255) for y in
            (0, 64, 127, 128, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r["x"], r["y"]): r["zorder_key"] for r in
           with_zorder_key(df, ["x", "y"], bits=8).collect()}
    low = [v for (x, y), v in got.items() if x < 128 and y < 128]
    high = [v for (x, y), v in got.items() if x >= 128 or y >= 128]
    assert max(low) < min(high)
    assert max(low) < (1 << 14) <= min(high)


def test_zorder_masks_overflow_and_three_cols(spark):
    df = spark.createDataFrame([(257, 1, 5)], "a int, b int, c int")
    got = df.select(zorder_key(["a", "b", "c"], bits=4).alias("k")) \
        .collect()[0]["k"]
    assert got == _py_morton([257, 1, 5], 4)   # 257 masks to 1


def test_zorder_guards_and_plan(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    with pytest.raises(ValueError, match="bits"):
        zorder_key(["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=8)
    assert_no_python(with_zorder_key(df, ["x", "y"], bits=8))
