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


def test_zone_maps_verdicts_match_python(spark):
    """Zone envelopes + scan verdicts equal a brute-force recompute."""
    from document_extractor_spark.operators.layout import (
        with_zorder_key, zone_maps)

    rows = [(i, i % 64, (i * 5) % 64) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id int, x int, y int")
    keyed = with_zorder_key(df, ["x", "y"], bits=6).withColumn(
        "zone", F.shiftright("zorder_key", 8))
    pred = {"x": (10, 20), "y": (30, 40)}
    got = {r["zone"]: r for r in
           zone_maps(keyed, "zone", ["x", "y"], pred).collect()}

    def interleave(x, y):
        k = 0
        for i in range(6):
            k |= ((x >> i) & 1) << (2 * i)
            k |= ((y >> i) & 1) << (2 * i + 1)
        return k

    zones = {}
    for _, x, y in rows:
        z = interleave(x, y) >> 8
        zones.setdefault(z, []).append((x, y))
    assert set(got) == set(zones)
    for z, pts in zones.items():
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        r = got[z]
        assert (r["n_rows"], r["x_min"], r["x_max"], r["y_min"],
                r["y_max"]) == (len(pts), min(xs), max(xs), min(ys),
                                max(ys))
        want = (max(xs) >= 10 and min(xs) <= 20
                and max(ys) >= 30 and min(ys) <= 40)
        assert r["scanned"] == want, z


def test_zone_maps_zorder_prunes_rowid_does_not(spark):
    """The measurable claim behind ZORDER: under Morton zoning a tight
    2-D predicate scans a small fraction of zones; under row-id zoning
    (values spread everywhere) it scans ~all of them."""
    from document_extractor_spark.operators.layout import (
        with_zorder_key, zone_maps)

    df = spark.range(4096).select(
        F.col("id").cast("int").alias("doc_id"),
        (F.col("id") % 64).cast("int").alias("x"),
        ((F.col("id") * 7) % 64).cast("int").alias("y"))
    pred = {"x": (8, 15), "y": (16, 23)}

    zz = with_zorder_key(df, ["x", "y"], bits=6).withColumn(
        "zone", F.shiftright("zorder_key", 6))
    z_scan = zone_maps(zz, "zone", ["x", "y"], pred)
    z_rows = z_scan.collect()
    z_frac = sum(r["scanned"] for r in z_rows) / len(z_rows)

    rid = df.withColumn("zone", F.floor(F.col("doc_id") / 64))
    r_rows = zone_maps(rid, "zone", ["x", "y"], pred).collect()
    r_frac = sum(r["scanned"] for r in r_rows) / len(r_rows)

    assert z_frac < 0.15 and r_frac > 0.9, (z_frac, r_frac)
    # skipped zones really contain no matching rows (pruning is safe)
    matching = df.where((F.col("x").between(8, 15))
                        & (F.col("y").between(16, 23))
                        ).join(zz.select("doc_id", "zone"), "doc_id")
    hit_zones = {r["zone"] for r in matching.select("zone").distinct()
                 .collect()}
    scanned_zones = {r["zone"] for r in z_rows if r["scanned"]}
    assert hit_zones <= scanned_zones


def test_zone_maps_validation(spark):
    from document_extractor_spark.operators.layout import zone_maps

    df = spark.createDataFrame([(1, 2)], "zone int, x int")
    with pytest.raises(ValueError, match="non-empty"):
        zone_maps(df, "zone", [])
    with pytest.raises(ValueError, match="not in stat_cols"):
        zone_maps(df, "zone", ["x"], {"y": (0, 1)})
    with pytest.raises(ValueError, match="lo"):
        zone_maps(df, "zone", ["x"], {"x": (5, 1)})
