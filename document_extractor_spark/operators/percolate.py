"""Percolation — standing-query matching at ingest: a bounded table of
stored boolean-AND keyword queries (alerting rules, routing rules,
topic taps) is matched against every incoming document, emitting
``(doc_id, query_id)`` for each rule whose terms ALL appear in the
document. The inverse of search: documents stream past a fixed query
set (Elasticsearch "percolator" shape), e.g. routing crawl pages to
downstream consumers who registered keyword subscriptions.

Scale shape — term-count containment, no per-query scan:

1. rules explode once into ``(query_id, term, n_terms)`` rows —
   vocabulary-scale metadata, BROADCAST (the genuinely-bounded side:
   a rule table is thousands of rows, never corpus-scale);
2. documents explode into DISTINCT ``(doc_id, tok)`` pairs (the same
   ``exploded_tokens`` contract every token operator shares);
3. one broadcast hash join on the term + a map-side-combined
   ``groupBy(doc_id, query_id)``: a rule matches iff its hit count
   equals its term count. The corpus text itself never shuffles —
   only (doc_id, matched-term) pairs for terms some rule mentions,
   and the join filter discards every other token before the exchange.

A rule with an empty term list matches nothing (it has no term rows) —
the subscription analogue of an empty conjunction being undefined, and
the behavior the oracle states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import exploded_tokens

#: a rule table is subscription metadata, not data
_MAX_RULES = 1 << 20


def percolate(docs: DataFrame, rules: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              query_col: str = "query_id",
              terms_col: str = "terms") -> DataFrame:
    """``(id, query_id)`` for every rule whose (lowercased, distinct)
    terms are ALL among the document's lowercased whitespace tokens.
    Deterministic; one row per matching pair."""
    staged = rules.select(
        F.col(query_col).alias("query_id"),
        F.array_distinct(
            F.transform(F.col(terms_col), F.lower)).alias("_terms"))
    qterms = (staged
              .withColumn("n_terms", F.size("_terms"))
              .select("query_id", "n_terms",
                      F.explode_outer("_terms").alias("term"))
              .where(F.col("term").isNotNull()))
    doc_terms = (exploded_tokens(docs, id_col, text_col)
                 .select(F.col(id_col), F.col("tok").alias("term"))
                 .distinct())
    hits = doc_terms.join(F.broadcast(qterms), "term")
    return (hits.groupBy(id_col, "query_id")
            .agg(F.count(F.lit(1)).alias("_hits"),
                 F.max("n_terms").alias("_need"))
            .where(F.col("_hits") == F.col("_need"))
            .select(id_col, "query_id"))
