"""ExactSubstr-style duplicate-span detection — the token-level tier of
training-data dedup (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"): document-level dedup (exact / MinHash / SimHash
in ``dedup.py``) misses the very common case where two pages share a long
verbatim PASSAGE (syndicated paragraphs, quoted licenses, templated legal
text) inside otherwise-distinct documents. This module finds every
maximal token span of at least ``min_tokens`` tokens that occurs more
than once in the corpus, keeps the first occurrence, and can rewrite
every other document with the span removed.

The reference engine has no corpus-level operator at all (single-document
PDF app — cf. ``pdf_processor.py``); this is part of the beyond-reference
training-pipeline mandate.

Spark shape (suffix arrays do not distribute; the scalable equivalent is
rolling windows over token streams):

1. tokenize once, STAGED (the repo HOF/explode discipline);
2. per doc, hash every ``min_tokens``-token window — a JVM
   ``transform(sequence(...))`` over the staged token array, one
   ``md5`` per window (128 bits: at the 100-TB target of ~2e13
   windows a 64-bit hash would EXPECT ~1e7 colliding pairs, each one
   silently deleting never-duplicated text; md5's expectation there is
   ~1e-12 — the same reasoning as the md5-keyed paragraph dedup.
   Tokens contain no whitespace, so the space-join the hash consumes
   is an injective encoding of the token sequence);
3. explode to NARROW ``(id, start, hash)`` rows — 16-byte keys; token
   text never shuffles;
4. group by hash: a hash seen more than once is a duplicate anchor; the
   lexicographically smallest ``(id, start)`` is the surviving copy
   (map-side-combinable ``count`` + ``min(struct)``, so a corpus-hot
   boilerplate window — the skew case — partial-aggregates before the
   exchange);
5. merge each document's overlapping/adjacent anchors into maximal
   spans with the gaps-and-islands window pattern (per-doc partitions,
   metadata-width rows).

A span that repeats INSIDE one document keeps only its first occurrence
too (same ``(id, start)`` ordering). At 100 TB the window rows are the
same cardinality as every token-explode operator in this repo
(``top_terms``, SimHash) and the verdict state is anchors-only; the one
text-bearing shuffle is ``drop_duplicate_spans``' final per-doc rebuild,
keyed by the uniform doc id — the same irreducible reassembly as
``drop_duplicate_paragraphs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _staged_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _toks) with whitespace tokens, empties removed — the same
    tokenization as ``token_counts``/``top_terms`` so spans line up with
    the rest of the token-level pipeline. Staged projections per the
    repo HOF rule."""
    return (
        df.select(F.col(id_col),
                  F.split(F.trim(F.col(text_col)), r"\s+").alias("_raw"))
        .select(F.col(id_col),
                F.filter("_raw", lambda t: t != "").alias("_toks"))
    )


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_tokens: int = 8) -> DataFrame:
    """Maximal duplicated token spans: ``(id, span_start, span_end)``
    (token-indexed, end exclusive) for every occurrence of a shared
    run EXCEPT the corpus-first one (smallest ``(id, start)``). Spans
    shorter than ``min_tokens`` tokens are below the detection floor by
    construction. Docs with no duplicated span emit no row."""
    L = min_tokens
    toks = _staged_tokens(df, id_col, text_col)
    windows = (
        toks
        .withColumn("_n", F.size("_toks"))
        # sequence(1,0) counts DOWN — guard the short-doc case
        .withColumn(
            "_wh",
            F.when(
                F.col("_n") >= L,
                F.transform(
                    F.sequence(F.lit(0), F.col("_n") - L),
                    lambda j: F.md5(
                        F.array_join(F.slice("_toks", j + 1, L), " ")
                        .cast("binary"))),
            ).otherwise(F.array().cast("array<string>")))
        .select(F.col(id_col),
                F.posexplode_outer("_wh").alias("start", "h"))
        .where(F.col("h").isNotNull())
    )
    dup_groups = (
        windows.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"),
             F.min(F.struct(F.col(id_col), F.col("start"))).alias("_w"))
        .where(F.col("_c") > 1)
        .select("h", "_w")
    )
    anchors = (
        windows.join(dup_groups, on="h")
        .where(~((F.col(id_col) == F.col(f"_w.{id_col}"))
                 & (F.col("start") == F.col("_w.start"))))
        .select(F.col(id_col), F.col("start"))
    )
    wd = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max(F.col("start") + L).over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    staged = (
        anchors
        .withColumn(
            "_new",
            F.when(prev_end.isNull() | (F.col("start") > prev_end), 1)
            .otherwise(0))
        .withColumn(
            "_island",
            F.sum("_new").over(
                wd.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        staged.groupBy(id_col, "_island")
        .agg(F.min("start").alias("span_start"),
             (F.max("start") + L).alias("span_end"))
        .select(F.col(id_col),
                F.col("span_start").cast("int"),
                F.col("span_end").cast("int"))
    )


def drop_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_tokens: int = 8) -> DataFrame:
    """Rewrite the corpus with every non-first duplicated span removed:
    the ExactSubstr trainer-dedup. Output text is the kept tokens
    space-joined (span surgery operates on the token stream, as the
    published implementations do — intra-token whitespace is already
    normalized by tokenization). Every input doc survives; the
    corpus-first copy of each span is untouched.

    Shape: span verdicts come from :func:`duplicate_spans` (narrow);
    they fold to ONE per-doc struct array, broadcast-or-hash join the
    corpus on the uniform doc id, and the rewrite is a JVM
    filter-over-zipped-positions — the text moves through exactly one
    doc-id exchange, never through the hash-keyed decision path."""
    spans = (
        duplicate_spans(df, id_col, text_col, min_tokens)
        .groupBy(id_col)
        .agg(F.collect_list(
            F.struct("span_start", "span_end")).alias("_spans"))
    )
    toks = _staged_tokens(df, id_col, text_col)
    rebuilt = (
        toks.join(spans, on=id_col, how="left")
        # sequence(0,-1) counts DOWN — guard the empty-token case
        .withColumn(
            "_idx",
            F.when(F.size("_toks") > 0,
                   F.sequence(F.lit(0), F.size("_toks") - 1))
            .otherwise(F.array().cast("array<int>")))
        .withColumn(
            "_pairs",
            F.zip_with(
                "_toks", "_idx",
                lambda t, i: F.struct(t.alias("tok"), i.alias("pos"))))
        .withColumn(
            "_kept",
            F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
                F.transform(
                    F.filter(
                        "_pairs",
                        lambda p: ~F.exists(
                            "_spans",
                            lambda s: (p["pos"] >= s["span_start"])
                            & (p["pos"] < s["span_end"]))),
                    lambda p: p["tok"])))
        .select(F.col(id_col),
                F.array_join("_kept", " ").alias(text_col))
    )
    return rebuilt
