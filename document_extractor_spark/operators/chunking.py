"""Passage chunking — fixed-token windows with overlap, the
segmentation primitive under both RAG indexing (embed each passage)
and long-document pretraining prep (attribution-friendly fixed spans).
Sibling of ``curation.py::pack_sequences`` (which concatenates ACROSS
documents for training efficiency); chunking splits WITHIN a document
and never mixes sources.

Spark-first: the token array is staged once (repo HOF/explode rule),
chunk starts are a JVM ``sequence`` with the stride as step, each
chunk a ``transform`` + ``slice`` over the staged array, and the
fan-out one staged ``posexplode_outer`` — whole-stage codegen, zero
shuffle, and the chunk text is rebuilt with single spaces (the same
whitespace normalization every token-level operator in this repo and
its DuckDB twins share). Documents with no tokens yield no rows.

The tail rule is the standard one: starts advance by ``chunk_tokens −
overlap`` while they stay inside the document, so the final chunk may
be shorter than ``chunk_tokens`` (it is never empty); every token
belongs to at least one chunk and consecutive chunks share exactly
``overlap`` tokens except possibly at the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKS = "_ck_toks"
_CHUNKS = "_ck_chunks"


def chunk_passages(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", chunk_tokens: int = 128,
                   overlap: int = 16) -> DataFrame:
    """``(id, chunk_id, n_tokens, chunk_text)`` — one row per passage
    window. ``chunk_id`` is the 0-based window index (start token =
    chunk_id · (chunk_tokens − overlap))."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): {overlap}")
    clash = {_TOKS, _CHUNKS, "chunk_id", "n_tokens",
             "chunk_text"} & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with synthesized names: "
                         f"{sorted(clash)}")
    stride = chunk_tokens - overlap
    from ..functions.text import tokens

    staged = df.withColumn(_TOKS, tokens(F.col(text_col)))
    n = F.size(_TOKS)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.slice(F.col(_TOKS), s + 1, chunk_tokens))
    out = (
        staged.withColumn(_CHUNKS, chunks)
        .select(F.col(id_col),
                F.posexplode_outer(_CHUNKS).alias("chunk_id", "_ck"))
        .where(F.col("_ck").isNotNull())
    )
    return out.select(
        id_col, "chunk_id",
        F.size("_ck").cast("bigint").alias("n_tokens"),
        F.array_join("_ck", " ").alias("chunk_text"))
