"""KMV (k-minimum-values) distinct-count sketch — bounded-memory
cardinality estimation per group (distinct users per event type,
distinct URLs per host, ...). The web-corpus use: crawl-health
dashboards over groups whose exact distinct sets would dominate the
shuffle at 100 TB.

Why KMV and not HyperLogLog here: KMV's state (the k smallest hashes
of the group's distinct values) is **exactly mergeable** — k-smallest
is a semilattice, so the result is a pure function of the input SET,
independent of partitioning, batching, task order, or retries. That
determinism is what lets the DuckDB oracle recompute the identical
sketch from the exact distinct set and hash-match it (Spark's builtin
``approx_count_distinct`` is also deterministic, but its HLL state has
no cross-engine twin). Estimator: (k-1) / kth-smallest-hash-as-fraction
(Bar-Yossef et al.); groups with fewer than k distinct values are
exact by construction.

Scale shape — the classic two-level sketch merge:

1. partition-local partials in ``mapInPandas`` (one of the documented
   legitimate-UDF cases: no builtin expresses bounded per-key state
   across a partition): NO shuffle, memory capped at ~k hashes per key,
   emits ≤ k hashes per (partition, key);
2. one map-side-combined ``groupBy(key)`` over ≤ partitions × k rows
   per key.

The raw values never shuffle; a hot key costs partitions × k rows, not
its row count. md5 (not xxhash64) because both engines compute
identical md5 — cross-engine determinism is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

#: hex chars of the hash used as the uniform (0,1) fraction — 48 bits,
#: exactly representable in a double in BOTH engines
_FRAC_HEX = 12


def kmv_distinct(df: DataFrame, key_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-``key_col`` distinct-count sketch of ``value_col``. Returns
    ``(key, n_kept, est_distinct)``: the sketch size (== min(k, exact
    distinct count)) and the estimate — exact below k, floor((k-1) /
    frac(kth hash)) at or above. NULL values are ignored, like
    ``count(DISTINCT ...)``. Deterministic under any partitioning."""
    if k < 2:
        raise ValueError("k must be at least 2")
    hashed = df.select(
        F.col(key_col).alias("key"),
        F.md5(F.col(value_col).cast("string")).alias("h"),
    ).where(F.col("h").isNotNull())
    out_schema = StructType([
        hashed.schema["key"],
        StructField("h", hashed.schema["h"].dataType, False),
    ])

    def _partials(batches):
        import pandas as pd

        acc: dict = {}
        for pdf in batches:
            # dropna=False: a NULL key is a group like any other
            # (matching Spark groupBy / SQL GROUP BY semantics)
            for key, grp in pdf.groupby("key", sort=False,
                                        dropna=False)["h"]:
                if pd.isna(key):
                    key = None
                s = acc.setdefault(key, set())
                s.update(grp)
                # prune lazily: exact k-smallest is restored at yield
                if len(s) > 4 * k:
                    acc[key] = set(sorted(s)[:k])
        for key, s in acc.items():
            ks = sorted(s)[:k]
            yield pd.DataFrame({"key": [key] * len(ks), "h": ks})

    part = hashed.mapInPandas(_partials, schema=out_schema)
    merged = part.groupBy("key").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("_ks"))
    n = F.size("_ks")
    kth = F.element_at("_ks", n)
    frac = (F.conv(F.substring(kth, 1, _FRAC_HEX), 16, 10).cast("double")
            / F.lit(float(16 ** _FRAC_HEX)))
    est = F.when(n < k, n.cast("double")).otherwise(F.lit(k - 1) / frac)
    return merged.select(
        "key",
        n.cast("int").alias("n_kept"),
        F.floor(est).cast("bigint").alias("est_distinct"),
    )
