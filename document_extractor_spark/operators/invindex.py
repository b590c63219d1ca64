"""Inverted-index construction — term → sorted posting list with
document frequency, the retrieval-side counterpart of the token-level
analytics (``top_terms``) and the substrate for corpus search,
contamination lookup, and targeted span audits over a curated corpus.

Scale shape — the skew problem IS the stopword problem: a naive
``groupBy(term).collect_list(doc_id)`` sends every occurrence of "the"
(≈ every document id in the corpus) to one reducer. This builds in two
passes so that never happens:

1. document frequency over NARROW ``(term, doc_id)`` pairs —
   map-side-combinable count, hot terms partial-aggregate before the
   exchange;
2. terms outside ``[min_df, max_df]`` are dropped BEFORE any posting
   list materializes — the df cap bounds the largest posting list by
   construction (an uncapped index is a configuration choice the caller
   makes explicitly), and only then does the list aggregation run, on
   the surviving minority.

Posting lists are emitted both as a sorted array and as a CSV string
(``postings``): deterministic, engine-portable, and directly writable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 2,
                   max_df: int = 1_000_000) -> DataFrame:
    """``(term, df, postings)`` for every distinct (lowercased,
    whitespace-tokenized) term appearing in between ``min_df`` and
    ``max_df`` distinct documents; ``postings`` is the ascending
    doc-id list, CSV-joined. Tokenization matches ``top_terms`` /
    ``token_counts`` so the index aligns with the rest of the
    token-level pipeline."""
    from ..functions.text import tokens

    pairs = (
        df.select(F.col(id_col), F.lower(F.col(text_col)).alias("_t"))
        .withColumn("_toks", tokens("_t"))
        .select(F.col(id_col), F.explode_outer("_toks").alias("term"))
        .where(F.col("term").isNotNull())
        .distinct()
    )
    dfreq = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    return (
        pairs.join(dfreq, on="term")
        .groupBy("term", "df")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .select(
            "term", "df",
            F.array_join(
                F.transform("_ids", lambda i: i.cast("string")), ","
            ).alias("postings"))
    )
