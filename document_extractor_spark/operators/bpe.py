"""BPE merge-rule training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", Algorithm 1) — learn the
merge table a byte-pair tokenizer ships with, distributed.

The training loop is inherently iterative (each round's best pair
depends on the previous merges), but every ROUND is pure relational
work at VOCABULARY scale, not corpus scale: the corpus collapses once
into a (word, freq) table, each word carries its current symbol
segmentation as an in-row array, and a round is

  1. pair counts: in-row zip of adjacent symbols → explode →
     map-side-combined groupBy (the only exchange, over symbol-pair
     keys);
  2. best pair: ONE driver row (orderBy count DESC, pair ASC limit 1 —
     the deterministic tie-break);
  3. apply: an in-row ``aggregate`` fold replacing adjacent (s1,s2)
     left-to-right greedily (the reference algorithm's semantics) —
     no shuffle, whole-stage codegen;
  4. ``localCheckpoint`` truncating the iterative lineage (the
     PageRank/duplicate_clusters discipline).

At 100 TB the (word, freq) vocabulary is millions of rows — each round
is seconds; n_merges bounds the driver loop exactly like PageRank's
``iterations``. The learned table feeds the existing BPE-ish
pretokenizer counts (``functions/text.py::bpe_token_count``) story:
this is the TRAINING side of that tokenizer.

Words are lowercased whitespace tokens segmented to single characters
(no end-of-word sentinel — documented simplification, mirrored by the
oracle; a sentinel is one ``concat`` away through the same seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import exploded_tokens


def bpe_learn_merges(df: DataFrame, n_merges: int,
                     id_col: str = "doc_id", text_col: str = "text",
                     stats: dict = None) -> DataFrame:
    """Learn up to ``n_merges`` BPE merge rules from the corpus; returns
    a DataFrame ``(merge_rank, s1, s2, pair_count)`` in learning order
    (rank 1 = first merge). Stops early when no adjacent pair remains
    (every word fused to one symbol); ``stats['merges']`` records the
    executed count. Frequency ties break to the lexicographically
    smallest (s1, s2) — learning is a pure function of the corpus."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if stats is None:
        stats = {}
    words = (
        exploded_tokens(df, id_col, text_col)
        .groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    )
    state = words.select(
        "freq",
        F.filter(F.split("tok", ""), lambda c: c != F.lit(""))
        .alias("syms"),
    ).localCheckpoint(eager=True)

    merges = []
    stats["merges"] = 0
    for _ in range(int(n_merges)):
        n = F.greatest(F.size("syms") - F.lit(1), F.lit(0))
        staged = state.select(
            "freq",
            F.arrays_zip(
                F.slice("syms", 1, n).alias("s1"),
                F.slice("syms", 2, n).alias("s2"),
            ).alias("_ps"),
        )
        pairs = (
            staged.select("freq", F.explode_outer("_ps").alias("_p"))
            .where(F.col("_p").isNotNull())
            .groupBy(F.col("_p.s1").alias("s1"), F.col("_p.s2").alias("s2"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.col("pair_count").desc(), "s1", "s2").limit(1).collect()
        if not top:
            break
        s1, s2, cnt = top[0]["s1"], top[0]["s2"], top[0]["pair_count"]
        merges.append((len(merges) + 1, s1, s2, cnt))
        stats["merges"] += 1
        fused = s1 + s2
        state = state.select(
            "freq",
            F.aggregate(
                "syms", F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(s1))
                    & (x == F.lit(s2)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(F.lit(fused))),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
        ).localCheckpoint(eager=True)

    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, s1 string, s2 string, pair_count bigint")
