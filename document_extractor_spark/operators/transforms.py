"""Training-example transforms — the last hop of the corpus pipeline,
where curated documents become model-ready training strings. First
member: FIM (fill-in-the-middle, Bavarian et al. 2022 — the public
"prefix-suffix-middle" infilling recipe): a deterministic fraction of
documents is rewritten as

    <PRE> prefix <SUF> suffix <MID> middle

so an autoregressive model learns infilling from plain text. The paper
applies it to a random subset at a fixed rate with uniformly random
split points; here both draws are md5-derived from the document id —
exactly reproducible across runs, partitionings, and engines (the
DuckDB twin recomputes the identical transform), which is what a
training-data pipeline needs for ablations ("same corpus, same splits,
different rate").

Scale shape: pure per-row JVM column expressions (md5 + substring
arithmetic inside whole-stage codegen) — zero shuffle, zero Python,
linear in payload bytes at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hex chars of each md5 draw — 48 bits, exact in BIGINT math
_HEX = 12

PRE_TOK, SUF_TOK, MID_TOK = "<PRE>", "<SUF>", "<MID>"


def _draw(salt: str, id_col, mod):
    """Uniform integer in [0, mod) from md5(salt ‖ id) — the engine's
    shared seeded-randomness idiom (cross-engine deterministic)."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, _HEX), 16, 10).cast("bigint"), mod)


def fim_transform(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", rate_pct: int = 50,
                  min_chars: int = 20) -> DataFrame:
    """Append ``(fim_applied, fim_text)``: ``rate_pct``% of documents
    (hash-selected on id, NOT row order) are rewritten PSM-style; the
    rest — and texts under ``min_chars`` or NULL — pass through
    verbatim with ``fim_applied = false``. Split points are two
    id-seeded uniform draws over [1, len-1]; their min/max bound the
    middle, so prefix and suffix are always non-empty and
    prefix ‖ middle ‖ suffix reassembles the original exactly."""
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100]: {rate_pct}")
    if min_chars < 3:
        raise ValueError(f"min_chars must be >= 3: {min_chars}")
    t = F.col(text_col)
    L = F.length(t)
    selected = (_draw("fim:", id_col, F.lit(100)) < F.lit(int(rate_pct)))
    eligible = t.isNotNull() & (L >= int(min_chars))
    a = F.lit(1) + _draw("fim1:", id_col, (L - 1).cast("bigint"))
    b = F.lit(1) + _draw("fim2:", id_col, (L - 1).cast("bigint"))
    p1, p2 = F.least(a, b), F.greatest(a, b)
    rewritten = F.concat(
        F.lit(PRE_TOK), F.substring(t, 1, p1.cast("int")),
        F.lit(SUF_TOK), F.substring(t, (p2 + 1).cast("int"),
                                    (L - p2).cast("int")),
        F.lit(MID_TOK), F.substring(t, (p1 + 1).cast("int"),
                                    (p2 - p1).cast("int")),
    )
    applied = selected & eligible
    return df.withColumns({
        "fim_applied": applied,
        "fim_text": F.when(applied, rewritten).otherwise(t),
    })
