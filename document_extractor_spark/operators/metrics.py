"""Classifier evaluation metrics over corpus-scale score tables.

A curation stack ships quality/toxicity/language classifiers (this
repo: ``nb.py``, ``lm.py``, Gopher/C4 rule scores) and needs to
evaluate them on labeled holdouts measured in millions of rows — on
the cluster, not by collecting scores to a driver notebook. The core
metric is ROC-AUC, computed EXACTLY via the Mann-Whitney pair count
with the standard tie correction (each (positive, negative) pair
contributes 1 if the positive scores higher, ½ if tied):

    AUC = [ Σ_s P(s)·N(<s) + ½·Σ_s P(s)·N(s) ] / (n_pos · n_neg)

where P(s)/N(s) count positives/negatives AT score s and N(<s) the
negatives strictly below. Everything is BIGINT until one final
division, so the result is bit-identical across engines and
partitionings — no sampling, no sketch.

Spark shape: one map-side-combinable ``groupBy(score)`` collapses the
corpus to its DISTINCT score values; the cumulative-negatives window
then runs over that collapsed table. An unpartitioned window is a
single-task sort, which is exactly right here: after collapse the
cardinality is the score grid, not the corpus (classifier scores are
quantized in practice — for genuinely continuous scores, quantize
first; the ``n_shards``-style knob documented on the function). Label
semantics: 1/true = positive, 0/false = negative, NULL score or label
rows are excluded (they have no rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(df: DataFrame, score_col: str = "score",
            label_col: str = "label") -> DataFrame:
    """One-row ``(n_pos, n_neg, pairs_won_x2, auc)`` — ``pairs_won_x2``
    is the exact integer 2·Σ[pos>neg] + Σ[pos==neg] over all
    positive×negative pairs, and ``auc = pairs_won_x2 / (2·n_pos·
    n_neg)``. Degenerate inputs (no positives or no negatives) yield
    NULL auc rather than a division error."""
    lab = F.col(label_col).cast("int")
    per = (
        df.where(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(F.col(score_col).alias("_s"))
        .agg(F.sum(F.when(lab == 1, 1).otherwise(0)).alias("_p"),
             F.sum(F.when(lab == 0, 1).otherwise(0)).alias("_n"))
    )
    below = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, -1)
    cum = per.withColumn(
        "_nb", F.coalesce(F.sum("_n").over(below), F.lit(0)))
    return (
        cum.agg(
            F.sum("_p").cast("bigint").alias("n_pos"),
            F.sum("_n").cast("bigint").alias("n_neg"),
            (F.lit(2) * F.sum(F.col("_p") * F.col("_nb"))
             + F.sum(F.col("_p") * F.col("_n")))
            .cast("bigint").alias("pairs_won_x2"))
        .select(
            "n_pos", "n_neg", "pairs_won_x2",
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                   F.col("pairs_won_x2").cast("double")
                   / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")))
            .alias("auc"))
    )


def calibration_buckets(df: DataFrame, score_col: str = "score",
                        label_col: str = "label", n_buckets: int = 10,
                        lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """Reliability-diagram table for a probabilistic quality classifier
    — ``(bucket, n, n_pos, pos_ppm)`` over ``n_buckets`` equal-width
    score bins on [lo, hi): a calibrated classifier's positive rate
    tracks the bin midpoint; quality-threshold pickers read this table
    to translate "keep the top X%" into a score cutoff with known
    purity. Scores outside the range clamp into the edge bins (sort
    safety + nothing silently dropped); NULL score/label rows are
    excluded like :func:`roc_auc`.

    Same scale shape as ``roc_auc``'s first stage alone: one map-side-
    combinable groupBy on the bucket id — n_buckets keys, no window,
    no sort anywhere. ``pos_ppm`` is the exact integer positive rate.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    if not hi > lo:
        raise ValueError(f"empty score range [{lo}, {hi})")
    lab = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    raw = F.floor((s - F.lit(float(lo)))
                  / F.lit(float(hi - lo)) * F.lit(int(n_buckets)))
    bucket = F.least(F.greatest(raw, F.lit(0)),
                     F.lit(int(n_buckets) - 1)).cast("int")
    return (
        df.where(s.isNotNull() & lab.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.when(lab == 1, 1).otherwise(0))
             .cast("bigint").alias("n_pos"))
        .withColumn("pos_ppm",
                    F.expr("(n_pos * 1000000L) div n").cast("bigint"))
    )


def wilson_lower_bound(df: DataFrame, group_col: str, success_col: str,
                       z: float = 1.959963984540054) -> DataFrame:
    """Per-group Wilson score interval lower bound on the success
    proportion — the small-sample-honest way to RANK groups by a binary
    quality rate (hosts by share of keepable docs, sources by rule pass
    rate): a host with 2/2 good pages must not outrank one with 180/200,
    which the naive ratio does and the Wilson bound (Wilson 1927, the
    classic "sort by lower bound" ranking fix) does not.

        lb = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    Returns ``(group, n, n_pos, wilson_lb)``; default z is the exact
    two-sided 95% normal quantile. NULL successes are excluded (no
    verdict ≠ failure); groups surviving with n = 0 cannot occur.

    Scale shape: ONE map-side-combinable groupBy over narrow (group,
    0/1) pairs; the bound is arithmetic + one IEEE sqrt per GROUP
    (both engines' sqrt is correctly rounded, so cross-engine parity
    is exact before the defensive round-to-6)."""
    s = F.col(success_col).cast("int")
    agg = (
        df.where(s.isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(s).cast("bigint").alias("n_pos"))
    )
    n = F.col("n").cast("double")
    p = F.col("n_pos").cast("double") / n
    z2 = F.lit(z * z)
    lb = (
        (p + z2 / (2 * n)
         - F.lit(z) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n)))
        / (1 + z2 / n)
    )
    return agg.select("group", "n", "n_pos",
                      F.round(lb, 6).alias("wilson_lb"))


def classification_prf(df: DataFrame, pred_col: str,
                       gold_col: str) -> DataFrame:
    """One-row micro-averaged precision/recall/F1 of a boolean
    predictor against gold labels — ``(n, tp, fp, fn, precision_ppm,
    recall_ppm, f1_ppm)`` in exact integer ppm (the repo's ``div``
    discipline: bit-identical across engines and partitionings, no
    float division anywhere). Rows with a NULL prediction or label are
    excluded (unlabeled ≠ wrong). Degenerate denominators (no
    predicted / no gold positives) yield −1, not NULL (the compare
    harness sorts rowsets).

    Scale shape: a single map-side-combinable aggregate over two
    narrow booleans — no window, no shuffle beyond the 1-row combine."""
    p = F.col(pred_col).cast("boolean")
    g = F.col(gold_col).cast("boolean")
    agg = (
        df.where(p.isNotNull() & g.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((p & g).cast("long")).alias("tp"),
            F.sum((p & ~g).cast("long")).alias("fp"),
            F.sum((~p & g).cast("long")).alias("fn"),
        )
    )
    return agg.select(
        "n", "tp", "fp", "fn",
        F.expr("CASE WHEN tp + fp = 0 THEN -1 "
               "ELSE (tp * 1000000) div (tp + fp) END")
        .cast("bigint").alias("precision_ppm"),
        F.expr("CASE WHEN tp + fn = 0 THEN -1 "
               "ELSE (tp * 1000000) div (tp + fn) END")
        .cast("bigint").alias("recall_ppm"),
        F.expr("CASE WHEN 2 * tp + fp + fn = 0 THEN -1 "
               "ELSE (2 * tp * 1000000) div (2 * tp + fp + fn) END")
        .cast("bigint").alias("f1_ppm"),
    )


def ndcg_at_k(df: DataFrame, k: int = 10,
              query_col: str = "query_id", doc_col: str = "doc_id",
              score_col: str = "score",
              rel_col: str = "relevance") -> DataFrame:
    """Exact nDCG@k per query — the ranking twin of :func:`roc_auc`
    (AUC judges a classifier's order over ONE pool; nDCG judges a
    retrieval system's order per query against graded relevance — the
    BM25 / ANN tiers here need exactly this on labeled query sets).

    Standard exponential-gain formulation: DCG@k = Σ over the top k
    ranked docs of (2^rel - 1)/log2(rank+1); nDCG = DCG/IDCG with IDCG
    the same sum over relevance-descending order. Cross-engine
    exactness by the repo's fixed-point recipe: each TERM is one IEEE
    composition quantized to nano units and summed as BIGINT — float
    summation order can never change a result — with one final
    BIGINT/BIGINT division rounded to 6. Ranking ties break
    deterministically: score DESC then doc ASC (ideal order:
    relevance DESC then doc ASC).

    Returns ``(query, dcg_nano, idcg_nano, ndcg)``; queries with zero
    relevant docs (IDCG 0) get NULL ndcg explicitly — no signal, never
    a divide-by-zero or a fake 0. Scale shape: both windows partition
    by query over narrow (query, doc, score, rel) rows — per-query
    candidate lists are retrieval-sized (hundreds), so no skewed
    partition; one groupBy(query) ends the plan.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, dc = F.col(query_col), F.col(doc_col)
    base = df.select(
        q.alias("query"), dc.alias("_doc"),
        F.col(score_col).alias("_s"),
        F.col(rel_col).cast("long").alias("_rel"),
    ).where(F.col("_s").isNotNull() & F.col("_rel").isNotNull())
    w_run = Window.partitionBy("query").orderBy(
        F.col("_s").desc(), F.col("_doc").asc())
    w_ideal = Window.partitionBy("query").orderBy(
        F.col("_rel").desc(), F.col("_doc").asc())
    gain = F.pow(F.lit(2.0), F.col("_rel").cast("double")) - F.lit(1.0)
    ranked = base.select(
        "query", "_rel", gain.alias("_g"),
        F.row_number().over(w_run).alias("_r"),
        F.row_number().over(w_ideal).alias("_ir"),
    )
    term = lambda rank: F.round(  # noqa: E731
        F.col("_g") / F.log2(rank.cast("double") + F.lit(1.0))
        * F.lit(1e9), 0).cast("long")
    return (
        ranked.groupBy("query")
        .agg(
            F.sum(F.when(F.col("_r") <= k, term(F.col("_r")))
                  .otherwise(F.lit(0))).alias("dcg_nano"),
            F.sum(F.when(F.col("_ir") <= k, term(F.col("_ir")))
                  .otherwise(F.lit(0))).alias("idcg_nano"),
        )
        .select(
            "query", "dcg_nano", "idcg_nano",
            F.when(F.col("idcg_nano") > 0,
                   F.round(F.col("dcg_nano").cast("double")
                           / F.col("idcg_nano").cast("double"), 6))
            .alias("ndcg"),
        )
    )
