"""BPE merge-rule training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", Algorithm 1) — learn the
merge table a byte-pair tokenizer ships with, distributed.

The training loop is inherently iterative (each round's best pair
depends on the previous merges), but every ROUND is pure relational
work at VOCABULARY scale, not corpus scale: the corpus collapses once
into a (word, freq) table, each word carries its current symbol
segmentation as an in-row array, and a round is

  1. pair counts: in-row zip of adjacent symbols → explode →
     map-side-combined groupBy (the only exchange, over symbol-pair
     keys);
  2. best pair: ONE driver row (orderBy count DESC, pair ASC limit 1 —
     the deterministic tie-break);
  3. apply: an in-row ``aggregate`` fold replacing adjacent (s1,s2)
     left-to-right greedily (the reference algorithm's semantics) —
     no shuffle, whole-stage codegen;
  4. ``localCheckpoint`` truncating the iterative lineage (the
     PageRank/duplicate_clusters discipline).

At 100 TB the (word, freq) vocabulary is millions of rows — each round
is seconds; n_merges bounds the driver loop exactly like PageRank's
``iterations``. The learned table feeds the existing BPE-ish
pretokenizer counts (``functions/text.py::bpe_token_count``) story:
this is the TRAINING side of that tokenizer.

Words are lowercased whitespace tokens segmented to single characters
(no end-of-word sentinel — documented simplification, mirrored by the
oracle; a sentinel is one ``concat`` away through the same seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import exploded_tokens, tokens


def bpe_learn_merges(df: DataFrame, n_merges: int,
                     id_col: str = "doc_id", text_col: str = "text",
                     stats: dict = None) -> DataFrame:
    """Learn up to ``n_merges`` BPE merge rules from the corpus; returns
    a DataFrame ``(merge_rank, s1, s2, pair_count)`` in learning order
    (rank 1 = first merge). Stops early when no adjacent pair remains
    (every word fused to one symbol); ``stats['merges']`` records the
    executed count. Frequency ties break to the lexicographically
    smallest (s1, s2) — learning is a pure function of the corpus."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if stats is None:
        stats = {}
    words = (
        exploded_tokens(df, id_col, text_col)
        .groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    )
    state = words.select(
        "freq",
        F.filter(F.split("tok", ""), lambda c: c != F.lit(""))
        .alias("syms"),
    ).localCheckpoint(eager=True)

    merges = []
    stats["merges"] = 0
    for _ in range(int(n_merges)):
        n = F.greatest(F.size("syms") - F.lit(1), F.lit(0))
        staged = state.select(
            "freq",
            F.arrays_zip(
                F.slice("syms", 1, n).alias("s1"),
                F.slice("syms", 2, n).alias("s2"),
            ).alias("_ps"),
        )
        pairs = (
            staged.select("freq", F.explode_outer("_ps").alias("_p"))
            .where(F.col("_p").isNotNull())
            .groupBy(F.col("_p.s1").alias("s1"), F.col("_p.s2").alias("s2"))
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.col("pair_count").desc(), "s1", "s2").limit(1).collect()
        if not top:
            break
        s1, s2, cnt = top[0]["s1"], top[0]["s2"], top[0]["pair_count"]
        merges.append((len(merges) + 1, s1, s2, cnt))
        stats["merges"] += 1
        fused = s1 + s2
        state = state.select(
            "freq",
            F.aggregate(
                "syms", F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(s1))
                    & (x == F.lit(s2)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(F.lit(fused))),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
        ).localCheckpoint(eager=True)

    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, s1 string, s2 string, pair_count bigint")


#: inter-symbol separator for the encode fold — U+001F (unit separator),
#: never produced by the whitespace pretokenizer's tokens in practice;
#: tokens that DO contain it are excluded (documented guard below)
_SEP = "\x1f"
#: a merge table is tokenizer vocabulary metadata (32k-100k rules for
#: real tokenizers); collecting it at the driver is the same bounded-
#: metadata discipline as the decontamination benchmark grams
_MAX_RULES = 1 << 17


def bpe_apply_merges(df: DataFrame, merges: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """ENCODE side of the tokenizer: segment every document with a
    learned merge table (`bpe_learn_merges` output or any
    ``(merge_rank, s1, s2)`` frame). Returns ``(id, n_words,
    n_subwords, encoded)`` where ``encoded`` is the space-joined
    subword sequence of the whole document.

    Scale shape: the merge table is bounded vocabulary metadata — it is
    collected once and inlined as an array literal, so the corpus pass
    is a single narrow whole-stage-codegen projection (NO join, NO
    shuffle, NO Python). Each word becomes a ``\\x1f\\x1f``-joined
    symbol string and the rules fold over it with literal ``replace``:
    the double-separator invariant (every symbol flanked by two
    separators, a merge consuming the inner one from each side) makes
    one left-to-right ``replace`` pass EXACTLY the reference greedy
    merge semantics of the training fold above — including consecutive
    overlapping pairs, which a single-separator encoding gets wrong.
    Applying rules in merge_rank order matches fast BPE encoders
    (one ordered pass per rule); words containing the separator byte
    itself are excluded from encoding (counted as 0 subwords) rather
    than corrupting the fold. DuckDB twin: the identical fold via
    ``list_reduce`` + ``replace`` (see the `bpe_encode` oracle)."""
    rules = merges.orderBy("merge_rank").select("s1", "s2").collect()
    if len(rules) > _MAX_RULES:
        raise ValueError(
            f"merge table has {len(rules)} rules > {_MAX_RULES}; "
            "not vocabulary-scale metadata")
    for r in rules:
        if not r["s1"] or not r["s2"] or _SEP in r["s1"] + r["s2"]:
            raise ValueError(f"invalid merge rule {(r['s1'], r['s2'])}")
    s2 = _SEP * 2
    rule_lits = F.array(*[
        F.struct(
            F.lit(_SEP + r["s1"] + s2 + r["s2"] + _SEP).alias("pat"),
            F.lit(_SEP + r["s1"] + r["s2"] + _SEP).alias("rep"),
        ) for r in rules
    ]).cast("array<struct<pat:string,rep:string>>")

    toks = F.filter(tokens(F.lower(F.col(text_col))),
                    lambda t: ~t.contains(_SEP))
    staged = df.select(F.col(id_col), toks.alias("_toks"))

    def _encode_word(t):
        chars = F.filter(F.split(t, ""), lambda c: c != F.lit(""))
        word = F.concat(F.lit(s2), F.array_join(chars, s2), F.lit(s2))
        folded = F.aggregate(
            rule_lits, word,
            lambda acc, ru: F.replace(acc, ru["pat"], ru["rep"]))
        return F.array_join(
            F.filter(F.split(folded, _SEP), lambda x: x != F.lit("")),
            " ")

    out = staged.select(
        F.col(id_col),
        F.size("_toks").alias("n_words"),
        F.array_join(F.transform("_toks", _encode_word), " ")
        .alias("encoded"))
    n_sub = F.size(F.filter(F.split("encoded", " "),
                            lambda x: x != F.lit("")))
    return out.select(
        id_col, "n_words", n_sub.alias("n_subwords"), "encoded")


def bpe_encode_oracle_sql(table: str, rules, id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """DuckDB twin of `bpe_apply_merges` for a FIXED rule list — the
    identical double-separator fold via ``list_reduce`` + literal
    ``replace``. Kept next to the operator so the separator convention
    and fold order can never drift between engines."""
    s1 = "chr(31)"
    s2 = "chr(31)||chr(31)"
    rule_elems = ", ".join(
        f"{s1}||'{a}'||{s2}||'{b}'||{s1} || chr(9) || "
        f"{s1}||'{a}{b}'||{s1}"
        for a, b in rules)
    toks = (f"list_filter(regexp_split_to_array(trim(lower({text_col})),"
            r" '\s+'), t -> t <> '' AND NOT contains(t, chr(31)))")
    word = (f"{s2} || array_to_string("
            "list_filter(regexp_split_to_array(t, ''), c -> c <> ''), "
            f"{s2}) || {s2}")
    fold = (f"list_reduce(list_prepend({word}, [{rule_elems}]), "
            "(acc, r) -> replace(acc, split_part(r, chr(9), 1), "
            "split_part(r, chr(9), 2)))")
    word_enc = (f"array_to_string(list_filter(regexp_split_to_array("
                f"{fold}, chr(31)), x -> x <> ''), ' ')")
    return f"""
        WITH staged AS (SELECT {id_col}, {toks} AS toks FROM {table}),
        enc AS (SELECT {id_col},
                       CAST(len(toks) AS INT) AS n_words,
                       array_to_string(
                         list_transform(toks, t -> {word_enc}), ' ')
                         AS encoded
                FROM staged)
        SELECT {id_col}, n_words,
               CAST(len(list_filter(regexp_split_to_array(encoded, ' '),
                                    x -> x <> '')) AS INT) AS n_subwords,
               encoded
        FROM enc
    """
