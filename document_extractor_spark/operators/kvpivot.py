"""R5-R8 relational form — multi-record key:value text → pivoted table.

The reference detects multi-record KV dictionaries in page text and
converts them to HTML tables in Python (``key_value_converter.py:24-397``
in EricBui619/document-extractor). The extractor library already carries
the in-UDF port for the extraction hot path
(``extractor/html_extract.py::parse_multi_record_kv``); THIS module is
the *relational* expression the survey calls for (SURVEY.md §2.3 R5:
"split→explode ``(record_id, key, value)``→groupBy(record_id)
.pivot(key)") — pure Catalyst, zero Python, scales to any corpus:

    kv_long : text → (id, record_id, key, value) long format
    kv_pivot: long → one row per (id, record_id), one column per key

Scale notes: ``posexplode`` is a narrow generate (no shuffle); the pivot
groupBy shuffles only the parsed long rows (tiny vs the source text) and
pivot keys are supplied explicitly so no extra distinct-keys job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# First separator wins per line (key_value_converter.py:205-246);
# separators ': = - – —' (key_value_converter.py:15). The regex mirrors
# _parse_kv_line: shortest prefix up to any separator, key ≤50 chars.
_KV_LINE = r"^([^:=\n]{1,50}?)\s*(?::|=| - | – | — )\s*(.*)$"


def kv_long(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Explode blank-line-separated KV records into long format.

    Records split on blank lines (key_value_converter.py:67-100); each
    non-empty line parses as ``key<sep>value`` with the first separator
    winning. Lines that do not parse are dropped (the relational form is
    for well-formed KV blocks; the extractor's in-UDF variant keeps the
    reference's full reject semantics).
    """
    recs = F.split(F.col(text_col), r"\n\s*\n")
    exploded = (
        df.select(F.col(id_col), F.posexplode(recs).alias("record_id", "rec"))
        .select(id_col, "record_id",
                F.posexplode(F.split("rec", "\n")).alias("line_no", "line"))
        .filter(F.trim("line") != "")
    )
    return (
        exploded.select(
            id_col,
            "record_id",
            "line_no",
            F.trim(F.regexp_extract("line", _KV_LINE, 1)).alias("key"),
            F.trim(F.regexp_extract("line", _KV_LINE, 2)).alias("value"),
        )
        .filter(F.col("key") != "")
    )


def kv_pivot(long_df: DataFrame, keys: list, id_col: str = "doc_id") -> DataFrame:
    """(id, record_id, key, value) → one row per record, one column per
    key (R5's ``groupBy(record_id).pivot(key)``). ``keys`` given
    explicitly so Catalyst skips the distinct-keys pre-job."""
    return (
        long_df.groupBy(id_col, "record_id")
        .pivot("key", keys)
        .agg(F.first("value"))
    )


def kv_records_to_table(df: DataFrame, keys: list, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """R5→R8 composed: text in, pivoted records out."""
    return kv_pivot(kv_long(df, id_col, text_col), keys, id_col)
