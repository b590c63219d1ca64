"""Training-data mixture weights — temperature-scaled domain sampling
plus token-budget epoch allocation (the mT5 / XLM-R / GPT-3 data-mixing
move: upsample small high-value domains by raising per-domain mass to a
temperature ``τ < 1`` before normalizing; Raffel et al. 2020 §3.4.3,
Conneau et al. 2020 §3).  Completes the curation tier: ``dsir.py``
*selects* documents toward a target, ``sample_mix`` *applies* a given
mix — this operator *derives* the mix from the corpus itself.

Method (deterministic, exact cross-engine):

* Per-domain mass ``m_d`` = total whitespace-token count (the repo
  tokenizer, ``functions.text.tokens``) — BIGINT, exact.
* Tempered score ``s_d = floor(m_d^τ · 10^6)``.  To keep the DuckDB
  oracle hash-identical, ``τ`` is restricted to the dyadic ladder
  {1, 0.75, 0.5, 0.25} and ``m_d^τ`` is built ONLY from ``sqrt``
  compositions (``τ=0.75 → sqrt(m)·sqrt(sqrt(m))``): IEEE-754 requires
  ``sqrt`` and ``*`` to be correctly rounded, so JVM and DuckDB produce
  the SAME double bit-for-bit, unlike ``pow`` whose libm is only
  ≤1-ulp.  ``m_d < 2^53`` keeps the BIGINT→double cast exact (a 100 TB
  corpus is ~10^13 tokens per domain — comfortably inside).
* ``weight_ppm = (s_d · 10^6) div S`` with ``S = Σ s_d`` — integer
  parts-per-million of the sampling mixture; the sum is a BIGINT sum
  (order-independent), never a float normalization.
* ``epochs_milli``: with a global training budget of ``B`` tokens,
  domain ``d`` contributes ``B·w_d`` tokens, i.e. passes over its own
  data ``B·s_d / (S·m_d)`` times.  Computed exactly in BIGINT via the
  quotient/remainder split ``q = N div D;  milli = q·1000 +
  ((N − q·D)·1000) div D`` — no ``N·1000`` blow-up, no float division.
  Range: needs ``B·s_d < 2^63`` (holds for B ≤ 10^12 with
  token-scale domains; beyond that move the same expressions to
  DECIMAL(38,0) — both engines do exact decimal arithmetic).

Scale shape:

* Token counts are ``F.size(split(...))`` per row — NO explode, the
  text column never leaves its scan task; the only exchange carries
  narrow ``(domain, token_count)`` rows into a map-side-combinable
  ``groupBy(domain)``.
* ``S`` is an unpartitioned window sum over the per-domain aggregate —
  the aggregate is domain-cardinality (hosts/sources: bounded metadata
  scale, the PageRank vertex-count budget), so the single window task
  reduces a few rows and every step after the first groupBy is
  effectively free at 100 TB.

Reference parity note: the reference app has no mixing stage (GPT-4V
extraction UI, ``openai_content_extractor.py``); this operator exists
for the training-data pipeline mandate (deterministic mix derivation
as a first-class component).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count

#: fixed-point scale for tempered domain scores (ppm resolution).
SCORE_SCALE = 1_000_000

#: temperatures expressible as exact sqrt compositions (see module doc).
DYADIC_TEMPERATURES = (1.0, 0.75, 0.5, 0.25)


def _tempered(mass: Column, temperature: float) -> Column:
    """``floor(mass^τ · SCORE_SCALE)`` as BIGINT via sqrt compositions.

    Only correctly-rounded IEEE ops (sqrt, *) touch doubles, so the
    DuckDB twin — same sqrt/multiply tree — hashes identically."""
    if temperature not in DYADIC_TEMPERATURES:
        raise ValueError(
            f"temperature {temperature} not in {DYADIC_TEMPERATURES}; "
            "only sqrt-composable temperatures keep the cross-engine "
            "contract exact (see module docstring)")
    m = mass.cast("double")
    if temperature == 1.0:
        # stay in BIGINT entirely — no double round-trip at all
        return mass * F.lit(SCORE_SCALE)
    r = F.sqrt(m)          # m^0.5
    if temperature == 0.5:
        t = r
    elif temperature == 0.25:
        t = F.sqrt(r)
    else:                  # 0.75 = 0.5 + 0.25
        t = r * F.sqrt(r)
    return F.floor(t * F.lit(float(SCORE_SCALE)))


def _tempered_sql(expr: str, temperature: float) -> str:
    """DuckDB twin of :func:`_tempered` over a BIGINT SQL expression."""
    if temperature == 1.0:
        return f"({expr}) * {SCORE_SCALE}"
    m = f"CAST({expr} AS DOUBLE)"
    if temperature == 0.5:
        t = f"sqrt({m})"
    elif temperature == 0.25:
        t = f"sqrt(sqrt({m}))"
    elif temperature == 0.75:
        t = f"sqrt({m}) * sqrt(sqrt({m}))"
    else:
        raise ValueError(f"temperature {temperature} not dyadic")
    return f"CAST(floor({t} * {SCORE_SCALE}.0) AS BIGINT)"


def domain_mixture(docs: DataFrame, group_col: str = "source",
                   text_col: str = "text", temperature: float = 0.5,
                   budget_tokens: int = 1_000_000_000) -> DataFrame:
    """Per-domain sampling mixture ``(domain, n_docs, n_tokens,
    weight_ppm, epochs_milli)`` — see module docstring for the method.

    ``weight_ppm`` floors, so ``Σ weight_ppm ≤ 10^6`` with deficit
    ``< n_domains`` (the caller assigns the dust, typically to the
    largest domain).  Domains with zero tokens get weight 0 and
    epochs 0 (never a division by zero)."""
    per_domain = (
        docs
        .select(F.col(group_col).alias("domain"),
                token_count(text_col).alias("_tc"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("_tc").alias("n_tokens"))
        .withColumn("_s", _tempered(F.col("n_tokens"), temperature))
    )
    # S = Σ s_d via an UNPARTITIONED window — the frame is the per-domain
    # aggregate (domain-cardinality rows, bounded metadata scale), never
    # the documents, so the single window task is a few-row reduction.
    # A broadcast self-crossJoin would express the same thing but trips
    # Spark's self-join attribute dedup (ambiguous lineage); and the
    # name must differ from `_s` under MORE than case (Spark resolves
    # column names case-insensitively by default, so `_S` would silently
    # REPLACE `_s` in withColumn).
    from pyspark.sql import Window

    out = per_domain.withColumn(
        "_stot", F.sum("_s").over(Window.partitionBy()))
    n = F.lit(int(budget_tokens)) * F.col("_s")
    d = F.col("_stot") * F.col("n_tokens")
    # quotient/remainder split — exact BIGINT throughout (non-negative
    # operands, so Spark's truncating `div` == floor == DuckDB's `//`)
    out = (
        out
        .withColumn("weight_ppm",
                    F.when(F.col("_stot") > 0,
                           F.expr(f"(_s * {SCORE_SCALE}L) div _stot"))
                    .otherwise(F.lit(0)).cast("bigint"))
        .withColumn("_n", n.cast("bigint"))
        .withColumn("_d", d.cast("bigint"))
        .withColumn("_q", F.when(F.col("_d") > 0,
                                 F.expr("_n div _d")).otherwise(F.lit(0)))
        .withColumn(
            "epochs_milli",
            F.when(F.col("_d") > 0,
                   F.col("_q") * 1000
                   + F.expr("((_n - _q * _d) * 1000) div _d"))
            .otherwise(F.lit(0)).cast("bigint"))
        .select("domain", "n_docs", "n_tokens", "weight_ppm",
                "epochs_milli")
    )
    return out


def domain_mixture_sql(table: str = "documents", group_col: str = "source",
                       text_col: str = "text", temperature: float = 0.5,
                       budget_tokens: int = 1_000_000_000) -> str:
    """DuckDB oracle twin of :func:`domain_mixture` (same column names,
    same integer arithmetic — hash-identical by construction)."""
    s_expr = _tempered_sql("n_tokens", temperature)
    return f"""
WITH per_domain AS (
  SELECT {group_col} AS domain,
         COUNT(*) AS n_docs,
         SUM(len(list_filter(regexp_split_to_array(trim({text_col}), '\\s+'),
                             t -> t <> ''))) AS n_tokens
  FROM {table}
  GROUP BY {group_col}
), scored AS (
  SELECT *, {s_expr} AS s FROM per_domain
), tot AS (
  SELECT SUM(s) AS total_s FROM scored
)
SELECT domain, n_docs, n_tokens,
       CASE WHEN total_s > 0 THEN (s * {SCORE_SCALE}) // total_s
            ELSE 0 END AS weight_ppm,
       CASE WHEN total_s * n_tokens > 0 THEN
         (({budget_tokens} * s) // (total_s * n_tokens)) * 1000
         + ((({budget_tokens} * s) % (total_s * n_tokens)) * 1000)
           // (total_s * n_tokens)
       ELSE 0 END AS epochs_milli
FROM scored CROSS JOIN tot
""".strip()
