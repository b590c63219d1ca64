"""Range (interval) join — match each left point to every right
interval containing it. The crawl-pipeline use: tag pages with the
crawl campaign / rate-limit window / outage interval active at fetch
time, where intervals can overlap (unlike ``asof_join``'s latest-one
semantics).

Spark plans a raw ``l.ts >= r.lo AND l.ts < r.hi`` join as a
broadcast-nested-loop — O(|L|·|R|) work that is the canonical 100-TB
scale-killer. The scale-correct native shape is the grid-bucket
equi-join:

    right explodes to one row per ``bucket_width`` cell its interval
    covers; left computes its point's single cell; equi-join on
    (key, cell) + residual ``lo <= ts < hi`` filter.

Each (left, right) candidate pair meets in EXACTLY one cell — the
left point's — so no post-join dedup is needed. Cost: the right side
grows by interval_span / bucket_width (pick the width near the median
span), and the join is a plain shuffled/broadcast equi-join Catalyst
can optimize. Both Catalyst traps this repo has measured are avoided:
the cell array is STAGED via ``withColumn`` before the explode (a
transform-over-sequence inlined into ``explode`` re-evaluates per
element), and the explode is ``explode_outer`` + ``isNotNull`` (plain
``explode`` pushes an implicit ``size > 0`` filter below the staged
projection with the whole expression inlined).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(left: DataFrame, right: DataFrame, left_point: str,
               right_lo: str, right_hi: str, bucket_width: int,
               key: str | None = None,
               max_cells_per_interval: int = 4096) -> DataFrame:
    """Inner interval join: rows ``(left ⨝ right)`` for every right
    interval with ``lo <= point < hi`` (half-open; empty intervals
    match nothing) and, when ``key`` is given, equal key values.
    Column names must not collide across the two sides (``key`` being
    the shared join column is the one exception). Timestamps must be
    integral (epoch seconds/millis): the last covered cell is computed
    from ``hi - 1``, the largest point an interval can match."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    clash = (set(left.columns) & set(right.columns)) - {key}
    if clash:
        raise ValueError(f"column names collide across sides: "
                         f"{sorted(clash)}")
    reserved = {"_cell", "_cells"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"reserved column names in use: {sorted(reserved)}")
    lo, hi, pt = F.col(right_lo), F.col(right_hi), F.col(left_point)
    w = F.lit(bucket_width)
    # staged cell array (see module docstring for why withColumn +
    # explode_outer, not an inline explode)
    # a single open-ended/mis-encoded interval (hi ~ 2^62) would ask
    # sequence() for billions of cells and kill the job — fail loudly
    # with the offending span instead (assert_true raises per-row)
    span_guard = F.assert_true(
        (lo >= hi) | ((hi - F.lit(1)) / w - lo / w
                      < F.lit(max_cells_per_interval)),
        F.concat(F.lit("range_join: interval exceeds "
                       f"{max_cells_per_interval} cells of width "
                       f"{bucket_width}: ["),
                 lo, F.lit(", "), hi, F.lit(")")),
    )
    r_cells = (
        right.withColumn(
            "_cells",
            F.when(
                span_guard.isNull() & (lo < hi),
                F.sequence(F.floor(lo / w),
                           F.floor((hi - F.lit(1)) / w))),
        )
        .withColumn("_cell", F.explode_outer("_cells"))
        .where(F.col("_cell").isNotNull())
        .drop("_cells")
    )
    l_cells = left.withColumn("_cell", F.floor(pt / w))
    on = ["_cell", key] if key else ["_cell"]
    return (
        l_cells.join(r_cells, on=on)
        .where((lo <= pt) & (pt < hi))
        .drop("_cell")
    )
