"""Z-order (Morton) layout keys — multi-dimensional data clustering
for scan pruning, the Delta/Iceberg ``OPTIMIZE ZORDER BY`` primitive.

Why a 100-TB corpus wants it: parquet row-group pruning works on
min/max ranges of the SORT key only; sorting by (host) prunes host
predicates but not (warc_day), and vice versa. Interleaving the bits
of both into one Morton key and range-sorting by it gives every
co-sorted column locality at once — a scan with a predicate on EITHER
dimension skips most row groups. This module computes the key; the
existing writers (`sources/pages.py`) take it as an ordinary sort
column: ``df.repartitionByRange(n, 'zorder_key')
.sortWithinPartitions('zorder_key')``.

Spark-first: the interleave is a closed-form bit-algebra expression
(shift/mask/or compositions) built per (column, bit) — whole-stage
codegen, zero Python, and the DuckDB twin states the identical
algebra, so keys are engine-exact. Inputs are masked to ``bits`` low
bits explicitly (documented truncation, never silent overflow into a
neighbor's bit positions). Callers normalize values into the grid
first — rank/bucket/hash, whatever the layout calls for; md5-bucket
normalization (``conv(substr(md5(x),1,8),16,10) % 2^bits``) keeps
hashed text columns uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ceiling on bits·n_cols — the key must fit a signed 64-bit long.
_MAX_KEY_BITS = 63


def zorder_key(cols, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (bit i of
    column j lands at key position ``i·k + j`` for k columns). Columns
    are masked to ``bits`` bits first; the result is a non-negative
    BIGINT strictly below ``2^(bits·k)``."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    k = len(cols)
    if bits < 1 or bits * k > _MAX_KEY_BITS:
        raise ValueError(
            f"bits*len(cols) must be in [1, {_MAX_KEY_BITS}] to fit a "
            f"signed 64-bit key: bits={bits}, cols={k}")
    mask = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long") \
            .bitwiseAND(F.lit(mask))
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j)
    return key


def with_zorder_key(df: DataFrame, cols, bits: int = 16,
                    out_col: str = "zorder_key") -> DataFrame:
    """``df`` + the Morton key column — feed it to
    ``repartitionByRange(out_col).sortWithinPartitions(out_col)`` ahead
    of the parquet writer for multi-dimension row-group pruning."""
    return df.withColumn(out_col, zorder_key(cols, bits=bits))


def zone_maps(df: DataFrame, zone_col: str, stat_cols,
              predicates: dict | None = None) -> DataFrame:
    """Write-time zone statistics (the parquet row-group / Iceberg
    manifest min-max metadata) made explicit and queryable, so a
    layout's pruning power is MEASURED instead of asserted: one row per
    zone with ``(zone, n_rows, <c>_min, <c>_max ..., scanned)`` where
    ``scanned`` is the reader's verdict for a conjunction of inclusive
    range predicates ``{col: (lo, hi)}`` — a zone is skipped exactly
    when any predicate's range misses the zone's [min, max] envelope.

    Pair with ``with_zorder_key``: zone = the Morton key's high bits →
    each zone is a spatial block, and a 2-D range predicate prunes to
    the few blocks it intersects; the same zoning over a row-id layout
    scans everything (the pytest states both, quantified). Scale shape:
    one map-side-combined ``groupBy(zone)`` over zone keys — metadata
    out, no second pass over the data; the scan verdict is pure column
    algebra over the zone stats."""
    stat_cols = list(stat_cols)
    if not stat_cols:
        raise ValueError("stat_cols must be non-empty")
    predicates = dict(predicates or {})
    unknown = set(predicates) - set(stat_cols)
    if unknown:
        raise ValueError(f"predicate columns {sorted(unknown)} "
                         "not in stat_cols")
    for c, (lo, hi) in predicates.items():
        if lo > hi:
            raise ValueError(f"predicate on {c}: lo {lo} > hi {hi}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    z = df.groupBy(F.col(zone_col).alias("zone")).agg(*aggs)
    scanned = F.lit(True)
    for c, (lo, hi) in sorted(predicates.items()):
        scanned = scanned & (F.col(f"{c}_max") >= F.lit(lo)) \
            & (F.col(f"{c}_min") <= F.lit(hi))
    return z.withColumn("scanned", scanned)
