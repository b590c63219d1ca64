"""S7 — JSON content source with deterministic repair.

The reference persists per-page JSON and ships an offline repair tool for
responses that failed to parse (``fix_json_files.py:11-52`` strips bad
escapes/control chars; ``openai_content_extractor.py:446-482`` strips
markdown fences and falls back to an empty skeleton). Spark mapping
(SURVEY.md §2.1 S7): PERMISSIVE ``from_json`` for the well-formed
majority + a deterministic JVM-side repair expression for the tail, then
one re-parse. No Python anywhere.

    parse_json_relaxed(df, schema):
        raw → from_json(raw)            — fast path
            ↘ failed rows → repair(raw) → from_json(repaired)
        adds  parse_ok BOOLEAN, was_repaired BOOLEAN

Repair steps (fix_json_files.py semantics, as regexp_replace chain):
  1. strip ```json …``` / ``` …``` markdown fences
  2. drop ASCII control characters (except \\t \\n \\r)
  3. remove trailing commas before } or ]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def repair_json(col: Column) -> Column:
    c = F.regexp_replace(col, r"^\s*```(?:json)?\s*", "")
    c = F.regexp_replace(c, r"\s*```\s*$", "")
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    c = F.regexp_replace(c, r",\s*([}\]])", "$1")
    return c


def _parsed_ok(parsed: Column, schema) -> Column:
    """PERMISSIVE from_json yields an all-null struct (not NULL) on
    malformed input — "parsed" therefore means: struct present AND at
    least one field materialized. (A degenerate payload of literally
    all-null fields counts as failed — same call the reference repair
    tool makes when it falls back to the empty skeleton,
    openai_content_extractor.py:446-482.)"""
    any_field = None
    for f in schema.fields:
        c = parsed[f.name].isNotNull()
        any_field = c if any_field is None else (any_field | c)
    return parsed.isNotNull() & any_field


def parse_json_relaxed(df: DataFrame, schema, raw_col: str = "raw",
                       out_col: str = "parsed") -> DataFrame:
    """Two-phase parse: plain from_json, then the repair chain for rows
    whose first parse failed. Both parses are JVM expressions in one
    projection — Catalyst evaluates the repair branch only for the
    failed tail (conditional expression, no second pass over the data).
    """
    first = F.from_json(F.col(raw_col), schema)
    second = F.from_json(repair_json(F.col(raw_col)), schema)
    first_ok = _parsed_ok(first, schema)
    second_ok = _parsed_ok(second, schema)
    # no otherwise() → typed NULL struct when both parses failed
    parsed = F.when(first_ok, first).when(second_ok, second)
    return df.withColumn(out_col, parsed).withColumn(
        "was_repaired", (~first_ok) & second_ok
    ).withColumn("parse_ok", first_ok | second_ok)
