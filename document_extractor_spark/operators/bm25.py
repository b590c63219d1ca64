"""Okapi BM25 ranked retrieval over the token pipeline — "find the
strongest exemplar documents for these terms" at corpus scale: seed-set
expansion for quality classifiers, contamination triage ("which corpus
docs score highest against this benchmark prompt"), and targeted audits
of a curated snapshot. Completes the retrieval stack next to the
inverted index (boolean/posting access) and tf-idf pairs (doc-doc
similarity): BM25 is query-doc ranking.

Scoring (Robertson/Sparck-Jones, the standard '+0.5 / +1' smoothing):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d)   = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))

Scale shape:
- the query-term ``isin`` filter lands BEFORE the tf aggregation, so
  only matching tokens ever aggregate — the hot path is proportional
  to the query terms' posting sizes, not the corpus vocabulary;
- doc lengths are a map-side-combinable ``groupBy(id)`` over the
  narrow token stream (no payload);
- N / avgdl / per-term df are metadata-scale: the 1-row corpus stats
  and the ≤|query| df rows join back via BROADCAST on a constant key —
  never a crossJoin node, never a shuffle of the doc side;
- final top-k is ``ORDER BY … LIMIT k`` → TakeOrderedAndProject
  (per-partition heaps, k rows to the driver stage).

Cross-engine determinism: everything is exact-integer until the final
score; the one ln per query term quantizes identically under the
shared MILLI fixed-point (see invindex.MILLI), and ties break on
doc_id, so Spark and DuckDB return the identical top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import exploded_tokens
from .invindex import MILLI


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` documents by BM25 against ``query_terms`` (lowercased
    to match the shared tokenizer): ``(id, n_hit_terms, score_milli)``,
    ranked by score then ascending id. Documents matching no term are
    not candidates."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = exploded_tokens(df, id_col, text_col)

    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).withColumn("_k", F.lit(1))

    hits = toks.where(F.col("tok").isin(terms))
    tf = hits.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(doclen, id_col)
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(stats), "_k")
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5))),
        )
        .withColumn(
            "w",
            F.col("idf") * F.col("tf")
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
               + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
            F.round(F.sum("w") * MILLI, 0).cast("bigint")
            .alias("score_milli"),
        )
        .orderBy(F.col("score_milli").desc(), F.col(id_col))
        .limit(k)
    )
