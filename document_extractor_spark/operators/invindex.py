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

#: fixed-point scale for tf-idf weights (milli-units): coarse enough
#: that the one ln product per distinct (tf, df) pair quantizes
#: identically in Spark and DuckDB (~1e-12 value error vs a 5e-4
#: rounding boundary), fine enough for 1e-4 cosine resolution.
MILLI = 1_000


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 2,
                   max_df: int = 1_000_000) -> DataFrame:
    """``(term, df, postings)`` for every distinct (lowercased,
    whitespace-tokenized) term appearing in between ``min_df`` and
    ``max_df`` distinct documents; ``postings`` is the ascending
    doc-id list, CSV-joined. Tokenization matches ``top_terms`` /
    ``token_counts`` so the index aligns with the rest of the
    token-level pipeline."""
    pairs = _term_doc_pairs(df, id_col, text_col)
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


def _term_doc_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (term, id) pairs, tokenization shared with
    ``inverted_index`` / ``top_terms`` (one scaffold:
    ``functions.text.exploded_tokens``)."""
    from ..functions.text import exploded_tokens

    return (
        exploded_tokens(df, id_col, text_col)
        .select(F.col(id_col), F.col("tok").alias("term"))
        .distinct()
    )


def index_state_from_docs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_df: int = 1_000_000) -> DataFrame:
    """Build the MAINTAINABLE index state: ``(term, df, posting_ids)``
    for EVERY term — including sub-``min_df`` singletons (their lists
    are ≤ min_df-1 ids, so they're cheap, and a term crossing min_df
    after a later delta needs them) — with ``posting_ids = NULL`` for
    terms over ``max_df`` (their lists are unrecoverable by design: the
    skew guard means a corpus stopword's posting list never exists;
    only its df count is carried, and df can only grow, so the list
    never needs to come back).  ``posting_ids`` keeps the id column's
    NATIVE type (sorted array) — no stringly round-trip, so string or
    long ids merge and re-sort correctly.  Serve queries through
    :func:`served_index` (which emits the CSV shape)."""
    return (
        _term_doc_pairs(df, id_col, text_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"),
             F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .select(
            "term", "df",
            F.when(F.col("df") <= max_df, F.col("_ids"))
            .alias("posting_ids"))
    )


def index_state_merge(state: DataFrame, delta_docs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_df: int = 1_000_000) -> DataFrame:
    """Incremental index maintenance: fold a DELTA corpus into an
    existing index state WITHOUT re-tokenizing the indexed corpus —
    the append-only ingest path of a growing web archive.

    Precondition (documented, upstream-enforced): delta doc ids are
    disjoint from indexed ones — exactly what ``snapshot_dedup`` /
    ``drop_known_duplicates_bloom`` guarantee ahead of this operator.
    Under it, df adds and posting arrays concatenate disjointly.

    Scale shape: one full-outer join on ``term``.  In-band posting
    lists ride the exchange (inherent to index maintenance, bounded by
    ``max_df`` entries each); over-band terms move as (term, df) only —
    the corpus-stopword rows stay narrow forever.  The rebuilt
    alternative re-tokenizes the ENTIRE corpus; this touches only the
    delta plus the state.

    Equivalence contract (the operator's oracle):
    ``merge(from_docs(A), B) ≡ from_docs(A ∪ B)`` row-for-row."""
    delta = (
        _term_doc_pairs(delta_docs, id_col, text_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df_d"),
             F.collect_list(id_col).alias("_ids_d"))
    )
    s = state.select(
        "term", F.col("df").alias("_df_s"),
        F.col("posting_ids").alias("_ids_s"),
        F.col("posting_ids").isNotNull().alias("_had_list"),
    )
    j = s.join(delta, "term", "full_outer")
    df2 = (F.coalesce("_df_s", F.lit(0))
           + F.coalesce("_df_d", F.lit(0))).alias("df")
    # posting lists survive iff the merged df is in cap AND the state
    # side never dropped its list (state NULL ⇒ old df > max_df ⇒ df2 >
    # max_df anyway — the second conjunct is belt-and-braces for a
    # hand-edited state).  The empty-array fallbacks take the OTHER
    # side's element type, so native id typing flows through the merge.
    merged_ids = F.sort_array(F.concat(
        F.coalesce(F.col("_ids_s"), F.array()),
        F.coalesce(F.col("_ids_d"), F.array()),
    ))
    keep_list = (
        (F.coalesce("_df_s", F.lit(0)) + F.coalesce("_df_d", F.lit(0))
         <= F.lit(max_df))
        & (F.coalesce("_had_list", F.lit(True)))
    )
    return j.select(
        "term", df2,
        F.when(keep_list, merged_ids).alias("posting_ids"))


def served_index(state: DataFrame, min_df: int = 2,
                 max_df: int = 1_000_000) -> DataFrame:
    """The query-facing band of an index state — identical shape and
    semantics to :func:`inverted_index` output (CSV postings)."""
    return state.where(
        (F.col("df") >= min_df) & (F.col("df") <= max_df)
        & F.col("posting_ids").isNotNull()
    ).select(
        "term", "df",
        F.array_join(
            F.transform("posting_ids", lambda i: i.cast("string")), ","
        ).alias("postings"))


def tfidf_cosine_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", threshold: float = 0.8,
                       min_df: int = 2, max_df: int = 1_000) -> DataFrame:
    """All-pairs lexical similarity (Bayardo/Chaudhuri-style) — every
    document pair whose tf-idf cosine meets ``threshold``, mined through
    the inverted index rather than a quadratic corpus self-join.

    Weighting is sublinear-tf × idf (``(1 + ln tf) · ln(N/df)``),
    l2-normalized.  Weights are MILLI-quantized BIGINTs, so the dot
    product is an EXACT integer sum (order-free), the norm is
    ``sqrt`` of an exact integer (IEEE sqrt is correctly rounded in
    both engines), and the final cosine is bit-deterministic — the
    DuckDB twin hashes identically with no libm exposure beyond the
    one quantized ln product per distinct (tf, df) pair.

    Scale shape:

    * ``max_df`` is the prefix filter: a term in more than ``max_df``
      documents generates no candidate pairs, bounding per-term join
      fan-out at ``max_df²`` — the corpus-stopword quadratic blowup is
      structurally impossible (same knob as ``inverted_index``; the
      documented recall tradeoff of every banded similarity operator
      in this repo).  ``min_df=2`` is free pruning: df-1 terms cannot
      form a pair.
    * Everything that moves is ``(doc, term, weight)`` — narrow; text
      never rides an exchange.
    * ``N`` (corpus size) is the one driver-side scalar (metadata
      budget, same as PageRank's vertex count).
    * Weight bound: ``w ≤ (1+ln tf)·ln(N/df)·1e3 ≈ 4e5`` at 1e12 docs,
      so per-doc ``Σw²`` stays ~1e16 ≪ BIGINT range.
    * ``tf``/``w`` persist for their multiple consumers and stay cached
      for the session (lazy result — same contract as the MinHash
      shingle frame); ``spark.catalog.clearCache()`` between
      corpus-scale invocations in a long-lived driver.
    """
    from ..functions.text import exploded_tokens

    tf = (
        exploded_tokens(df, id_col, text_col)
        .select(F.col(id_col), F.col("tok").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf.persist()
    n_docs = df.select(id_col).distinct().count()

    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    w = tf.join(dfreq, "term").select(
        F.col(id_col), "term",
        F.round(
            (F.lit(1.0) + F.log(F.col("tf").cast("double")))
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            * F.lit(float(MILLI)),
            0,
        ).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    w.persist()
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("norm"))

    a = w.select(F.col(id_col).alias("doc_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col(id_col).alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )
