"""Multinomial Naive Bayes text classification — the trained-classifier
tier of corpus curation (the GPT-3 / LLaMA pipelines gate documents
with a learned text classifier; this is that stage, self-contained:
train on any label column of the corpus, predict at corpus scale).

Why Naive Bayes and not logistic regression: training is TWO
map-side-combinable aggregations — token-class counts and class
priors — no iterations, no gradient state, no driver loop; exactly the
shape that survives 100 TB.  Scoring is one narrow join plus integer
sums.

Determinism contract (shared with ``lm.py``): every log-probability is
quantized ONCE per distinct (token, class) to a nano-nat BIGINT, so
per-document class scores are exact integer sums and the argmin is
bit-deterministic — the DuckDB oracle twin hashes identically.

Scale shape:

* The unseen-token problem is solved algebraically, not by a dense
  (doc × vocab × class) expansion: with ``def(k) = -ln(1/(c(k)+V))``
  (the smoothed unseen-token cost),

      score(d,k) = Σ_seen tf·(nano(t,k) − def(k))
                   + n_tokens(d)·def(k) + prior(k)

  so the join only ever touches (token, class) pairs that EXIST in the
  model — the delta term is zero for unseen tokens by construction.
* The class table (def, prior per class) is metadata-scale and rides a
  broadcast; per-doc candidate rows are |classes| wide, built from a
  collected literal — the one driver-side value, same budget as
  PageRank's vertex count.
* Exchanges carry (doc, token, tf) and (doc, class, score) — text
  never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import exploded_tokens
from .lm import NANO  # one fixed-point scale across the model-based tier


def _token_counts(df: DataFrame, id_col: str, text_col: str,
                  extra: tuple = ()) -> DataFrame:
    return (
        exploded_tokens(df, id_col, text_col, extra=extra)
        .groupBy(id_col, *extra, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def naive_bayes_predict(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        label_col: str = "lang") -> DataFrame:
    """Train a Laplace-smoothed multinomial NB on ``(text, label)`` and
    predict every document's label back.  Returns
    ``(id, label, predicted)`` — feed to a confusion-matrix aggregate
    or use the mismatch set as an anomaly signal (docs whose declared
    language the token distribution contradicts).

    Ties break to the lexicographically smallest label (exact integer
    score comparison, so ties are real ties in both engines).

    NULL-labeled documents are excluded from training and output (no
    label to learn or confuse against); a class whose documents are all
    token-free never enters the model.

    ``occ``/``tc`` persist for their multiple consumers and stay cached
    for the session (lazy result — same contract as the MinHash shingle
    frame); call ``spark.catalog.clearCache()`` between corpus-scale
    invocations in a long-lived driver."""
    df = df.where(F.col(label_col).isNotNull())
    occ = _token_counts(df, id_col, text_col, extra=(label_col,))
    occ.persist()

    # model: c(t,k), c(k), V — all integer aggregates; tc feeds three
    # consumers (class totals, the model join, the vocab count), so it
    # is persisted alongside occ
    tc = occ.groupBy(label_col, "tok").agg(F.sum("tf").alias("c_tk"))
    tc.persist()
    ck = tc.groupBy(label_col).agg(F.sum("c_tk").alias("c_k"))
    v_size = tc.select("tok").distinct().count() or 0
    n_by_k = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_k"))
    n_total = df.count()

    # per-class constants (metadata-scale): unseen-token cost + prior
    klass = (
        ck.join(n_by_k, label_col)
        .select(
            F.col(label_col).alias("k"),
            F.round(
                -F.log(F.lit(1.0) / (F.col("c_k") + F.lit(v_size))
                       .cast("double")) * F.lit(float(NANO)), 0
            ).cast("long").alias("def_nano"),
            F.round(
                -F.log(F.col("n_k").cast("double") / F.lit(float(n_total)))
                * F.lit(float(NANO)), 0
            ).cast("long").alias("prior_nano"),
        )
    )
    # seen-token delta: nano(t,k) - def(k)  (negative: seen is cheaper)
    model = (
        tc.join(ck, label_col)
        .select(
            F.col(label_col).alias("k"), "tok",
            F.round(
                -F.log(
                    (F.col("c_tk") + F.lit(1)).cast("double")
                    / (F.col("c_k") + F.lit(v_size)).cast("double")
                ) * F.lit(float(NANO)), 0
            ).cast("long").alias("nano"),
        )
        .join(F.broadcast(klass.select("k", "def_nano")), "k")
        .select("k", "tok", (F.col("nano") - F.col("def_nano")).alias("dn"))
    )

    doc_tf = occ.drop(label_col)
    deltas = (
        doc_tf.join(model, "tok")
        .groupBy(id_col, "k")
        .agg(F.sum(F.col("tf") * F.col("dn")).alias("delta"))
    )
    n_toks = doc_tf.groupBy(id_col).agg(F.sum("tf").alias("n_toks"))

    # candidate rows: every doc × every class, classes as a collected
    # literal (|classes| is metadata-scale — langs, not vocabulary)
    classes = sorted(
        (r["k"], r["def_nano"], r["prior_nano"]) for r in klass.collect())
    if not classes:
        # every labeled document is token-free: no model, no
        # predictions — an empty, correctly-typed result instead of an
        # unresolvable empty-array explode downstream
        return (
            df.select(F.col(id_col), F.col(label_col),
                      F.col(label_col).alias("predicted"))
            .where(F.lit(False))
        )
    karr = F.array(*[
        F.struct(F.lit(k).alias("k"), F.lit(d).alias("def_nano"),
                 F.lit(p).alias("prior_nano"))
        for k, d, p in classes
    ])
    cand = (
        df.select(id_col, F.col(label_col).alias("label"))
        .join(n_toks, id_col, "left")
        .withColumn("_ks", karr)
        .select(id_col, "label",
                F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
                F.explode_outer("_ks").alias("_k"))
        .select(id_col, "label", "n_toks",
                F.col("_k.k").alias("k"),
                F.col("_k.def_nano").alias("def_nano"),
                F.col("_k.prior_nano").alias("prior_nano"))
    )
    scored = (
        cand.join(deltas, [id_col, "k"], "left")
        .select(
            id_col, "label", "k",
            (
                F.coalesce("delta", F.lit(0))
                + F.col("n_toks") * F.col("def_nano")
                + F.col("prior_nano")
            ).alias("score"),
        )
    )
    # argmin with lexicographic tiebreak: min over (score, k) structs
    return (
        scored.groupBy(id_col, "label")
        .agg(F.min(F.struct("score", "k")).alias("_best"))
        .select(id_col, F.col("label").alias(label_col),
                F.col("_best.k").alias("predicted"))
    )


def nb_confusion(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 label_col: str = "lang") -> DataFrame:
    """Self-consistency confusion matrix of the NB classifier:
    ``(label, predicted, n_docs)`` — the corpus-scale sanity report for
    a trained curation classifier (off-diagonal mass = documents whose
    declared label the token distribution contradicts)."""
    pred = naive_bayes_predict(df, id_col=id_col, text_col=text_col,
                               label_col=label_col)
    return (
        pred.groupBy(label_col, "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
