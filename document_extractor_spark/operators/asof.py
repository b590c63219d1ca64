"""As-of (backward temporal) join — align each left row to the most
recent right row at or before its timestamp, per key. The crawl-pipeline
use: stamp every fetched page with the host-policy / quality-tier
snapshot that was in force when the page was crawled (robots changes,
domain scores, blocklists all arrive as timestamped snapshot feeds).

Spark has no native as-of join (pandas-on-Spark's ``merge_asof`` exists,
but this stays in the DataFrame API); the scale-correct native shape is
the union-and-carry-forward window:

    tag both sides → union → window(partitionBy key, orderBy ts with
    right rows winning ties) → last(right-row struct, ignoreNulls) →
    keep left rows, unpack the struct.

The carried value is the whole right row as a STRUCT, not per-column
``last`` calls: a struct is non-null for every right row even when
individual payload fields are NULL, so a snapshot that legitimately
carries a NULL field cannot be skipped in favor of an older snapshot.

Cost: ONE shuffle of each side on the join key (the same shuffle a
plain join would pay), then a per-key sort inside the window — no
range-explode, no per-key driver loop. Skew: a hot key serializes its
own sort, but the window's running ``last`` is O(rows); at web scale
keys are hosts, so the hot-host row count is the same one the rest of
the pipeline already bounds (cf. ``host_stats``). Ties on ts resolve to
the right row (backward-inclusive, DuckDB ``ASOF JOIN`` semantics — the
oracle runs the native operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str) -> DataFrame:
    """Backward-inclusive as-of join. Returns every ``left`` row plus
    every non-key payload column of ``right``, taken from the latest
    right row with ``right_ts <= left_ts`` for the same ``on`` key
    (NULL-filled when no such row exists). ``right`` may not share
    payload column names with ``left``."""
    payload = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: "
                         f"{sorted(clash)}")
    # The synthesized working columns must not collide with user columns
    # (same guard range_join has for _cell/_cells); without it the clash
    # surfaces later as an opaque ambiguous-reference AnalysisException.
    reserved = {"_ts", "_is_right", "_r"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} are reserved by asof_join; "
            f"rename them on the input frames")
    # SQL join semantics, matching the DuckDB ASOF oracle: a right row
    # with a NULL key or NULL timestamp matches nothing (the window
    # would otherwise sort NULL _ts FIRST and carry a malformed
    # snapshot into every row before the first real one, and
    # partitionBy would happily group NULL keys together); a NULL-key
    # LEFT row still comes back, payload NULL-filled, because its
    # partition simply contains no right rows.
    right = right.where(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    l_cols = [c for c in left.columns if c not in (on, left_ts)]
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload) + ">"
        ).alias("_r"),
    )
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols],
        F.struct(*[F.col(c) for c in payload]).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal ts (_is_right DESC), so
    # a snapshot taken exactly at crawl time is visible to that crawl.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        on, "_ts", "_is_right", *l_cols,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        carried.where(F.col("_is_right") == 0)
        .select(on, F.col("_ts").alias(left_ts), *l_cols,
                *[F.col(f"_r.{c}").alias(c) for c in payload])
    )
