"""Unicode NFC normalization — canonicalize text before dedup,
fingerprinting, and tokenization. Crawled text mixes precomposed and
decomposed forms of the same characters (U+00E9 vs e+U+0301): without
canonical composition, byte-level dedup misses true duplicates and
token counts drift. NFC is the W3C-recommended interchange form.

Spark has no normalization builtin, so this is legitimate-UDF
territory: an Arrow-batched pandas UDF over ``unicodedata.normalize``
(C implementation under the hood, with an ASCII fast path — NFC over
pure-ASCII is the identity, and ``str.isascii`` is a cheap C check
that skips the normalizer for the common case). The DuckDB oracle twin
is the built-in ``nfc_normalize``, making this one of the few places
the engines' UNICODE behavior itself is cross-checked.

The UDF is constructed lazily inside ``normalize_text``:
``pandas_udf`` resolves its DDL return type against the active session,
so a module-level decorator would make importing this module require a
running SparkSession (breaks pytest collection, spark-submit zip
imports, and any driver that imports before building the session)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_batch(texts):
    import unicodedata

    def norm(s):
        if s is None or s.isascii():
            return s
        return unicodedata.normalize("NFC", s)

    return texts.map(norm, na_action="ignore")


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str | None = None) -> DataFrame:
    """Append (or replace) ``out_col`` with the NFC normalization of
    ``text_col``. NULL passes through."""
    udf = F.pandas_udf(_norm_batch, "string")
    return df.withColumn(out_col or text_col, udf(F.col(text_col)))


def dehyphenate(df: DataFrame, text_col: str = "text",
                out_col: str | None = None) -> DataFrame:
    """Repair typographic line-wrap hyphenation in extracted PDF/print
    text — 'exam-\\nple' → 'example'. Layout engines break words at
    line ends with a hyphen the author never wrote (the reference's
    per-page PDF text inherits them verbatim, pdf_processor.py — it
    ships each page image to GPT-4V, which re-joins words invisibly;
    the deterministic replacement needs the rule stated):

    1. lowercase-letter '-' newline lowercase-letter → join bare
       (the canonical soft wrap; the hyphen was typographic);
    2. any remaining '-' newline → keep the hyphen, drop the break
       ('Wall-\\nStreet' → 'Wall-Street': before a capital the hyphen
       is plausibly lexical, so only the wrap is repaired);
    3. real intra-word hyphens without a break ('state-of-the-art')
       are untouched.

    Entirely JVM ``regexp_replace`` (two passes, codegen'd, narrow —
    zero shuffle at any scale); ``\\p{Ll}`` so accented lowercase
    joins too. NULL passes through. The DuckDB twin uses the same
    RE2-compatible classes, so the repair has an exact cross-engine
    oracle."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"(\p{Ll})-\n(\p{Ll})", r"$1$2")
    c = F.regexp_replace(c, r"-\n", "-")
    return df.withColumn(out_col or text_col, c)
