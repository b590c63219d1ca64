"""Bitext candidate mining — pair documents that declare each other as
translations (hreflang alternates) and pass a length-ratio sanity
check. This is the high-precision front-end of parallel-corpus
construction (CCAligned/CCMatrix start exactly here: URL-declared
pairs first, embedding alignment later): a page and its hreflang
alternate are the same content in two languages, and a token-length
ratio far from 1 flags navigation stubs, truncated variants, or
mislabeled pairs.

Spark-first: two equi-joins of the alternates edge list against the
corpus metadata table (url → (lang, n_tokens)) — narrow all-metadata
rows keyed by url, map-side prunable; the ratio test is pure BIGINT
(``len·100 ≤ other·max_ratio_pct`` both ways), so verdicts are exact
and engine-identical; document text is never touched, let alone
shuffled. Output keeps the DECLARED direction (src = the page carrying
the <link> tag); callers wanting undirected pairs canonicalize with
least/greatest afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bitext_candidates(docs: DataFrame, alternates: DataFrame,
                      url_col: str = "url", lang_col: str = "lang",
                      len_col: str = "n_tokens",
                      max_ratio_pct: int = 200) -> DataFrame:
    """``(src_url, dst_url, src_lang, dst_lang, src_tokens,
    dst_tokens)`` — one row per declared (url → href) alternate whose
    two ends both exist in ``docs``, carry DIFFERENT languages, and
    whose token counts satisfy the two-sided ratio bound
    ``100·len ≤ max_ratio_pct·other_len`` (exact integers; the default
    200 = factor-2 bound). Duplicate declarations collapse.

    ``alternates`` needs (url, href) columns — e.g. the output of
    :func:`~.pagemeta.hreflang_alternates`."""
    if max_ratio_pct < 100:
        raise ValueError(
            f"max_ratio_pct must be >= 100 (a ratio bound): "
            f"{max_ratio_pct}")
    meta = docs.select(
        F.col(url_col).alias("_u"), F.col(lang_col).alias("_lang"),
        F.col(len_col).cast("bigint").alias("_len"))
    edges = (
        alternates.select(F.col("url").alias("src_url"),
                          F.col("href").alias("dst_url"))
        .where(F.col("src_url") != F.col("dst_url"))
        .distinct()
    )
    src = meta.select(F.col("_u").alias("src_url"),
                      F.col("_lang").alias("src_lang"),
                      F.col("_len").alias("src_tokens"))
    dst = meta.select(F.col("_u").alias("dst_url"),
                      F.col("_lang").alias("dst_lang"),
                      F.col("_len").alias("dst_tokens"))
    r = F.lit(int(max_ratio_pct))
    return (
        edges.join(src, "src_url").join(dst, "dst_url")
        .where((F.col("src_lang") != F.col("dst_lang"))
               & (F.col("src_tokens") > 0) & (F.col("dst_tokens") > 0)
               & (F.col("src_tokens") * 100 <= F.col("dst_tokens") * r)
               & (F.col("dst_tokens") * 100 <= F.col("src_tokens") * r))
        .select("src_url", "dst_url", "src_lang", "dst_lang",
                "src_tokens", "dst_tokens")
    )
