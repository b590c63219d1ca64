"""Text-analysis operators over a documents table — quality scoring,
token counting, fingerprinting, language ID.

All but language ID are pure column expressions (``functions/text.py``)
with DuckDB-SQL oracle twins. Language ID needs the script/stopword
tables → a scalar *pandas* UDF (Arrow-batched; rows-only correctness
check + pytest unit coverage).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import (
    avg_word_len,
    char_count,
    content_hash,
    fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


def text_stats(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col),
        char_count(text_col).alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        F.round(avg_word_len(text_col), 6).alias("avg_word_len"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
    )


def doc_fingerprints(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col),
        fingerprint(text_col).alias("fingerprint"),
    )


@F.pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched language ID — the VECTORIZED batch kernel (numpy
    codepoint bucketing + single regex pass), not a per-row lambda;
    output parity with the scalar ``detect_lang`` is pytest-gated."""
    from ..extractor.langid import detect_langs_batch

    return pd.Series(detect_langs_batch(texts.tolist()), index=texts.index)


def detect_languages(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col), lang_id_udf(F.col(text_col)).alias("lang_pred")
    )
