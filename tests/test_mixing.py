"""domain_mixture — temperature-scaled mixture weights + epoch budget."""

import duckdb
import pytest

from document_extractor_spark.operators.mixing import (
    SCORE_SCALE, domain_mixture, domain_mixture_sql)


def _docs(spark):
    rows = [
        # big domain: 6 docs x 10 tokens
        *[(i, "tok " * 10, "big") for i in range(6)],
        # small domain: 2 docs x 5 tokens
        *[(10 + i, "w w w w w", "small") for i in range(2)],
        # empty domain: whitespace-only text -> 0 tokens
        (20, "   ", "empty"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _collect(df):
    return {r["domain"]: r.asDict() for r in df.collect()}


def test_masses_and_zero_domain(spark):
    out = _collect(domain_mixture(_docs(spark)))
    assert out["big"]["n_tokens"] == 60
    assert out["small"]["n_tokens"] == 10
    assert out["empty"]["n_tokens"] == 0
    assert out["empty"]["weight_ppm"] == 0
    assert out["empty"]["epochs_milli"] == 0


def test_temperature_one_is_proportional(spark):
    out = _collect(domain_mixture(_docs(spark), temperature=1.0))
    # tau=1: weights proportional to token mass (60 vs 10 of 70 total)
    assert out["big"]["weight_ppm"] == 60 * SCORE_SCALE // 70
    assert out["small"]["weight_ppm"] == 10 * SCORE_SCALE // 70


def test_temperature_flattens(spark):
    flat = _collect(domain_mixture(_docs(spark), temperature=0.25))
    prop = _collect(domain_mixture(_docs(spark), temperature=1.0))
    # lower temperature narrows the big/small gap
    assert (flat["big"]["weight_ppm"] / flat["small"]["weight_ppm"]
            < prop["big"]["weight_ppm"] / prop["small"]["weight_ppm"])
    # and boosts the small domain's absolute share
    assert flat["small"]["weight_ppm"] > prop["small"]["weight_ppm"]


def test_weights_sum_to_million_minus_dust(spark):
    for tau in (1.0, 0.75, 0.5, 0.25):
        out = _collect(domain_mixture(_docs(spark), temperature=tau))
        total = sum(v["weight_ppm"] for v in out.values())
        assert SCORE_SCALE - len(out) < total <= SCORE_SCALE


def test_epochs_budget_consistency(spark):
    budget = 1_000_000
    out = _collect(domain_mixture(_docs(spark), budget_tokens=budget))
    for v in out.values():
        if v["n_tokens"] == 0:
            continue
        # epochs_milli/1000 * n_tokens ~= budget * weight share; the floor
        # split guarantees epochs never OVERSHOOTS the exact quotient and
        # undershoots by < 1 milli-epoch
        exact = budget * v["weight_ppm"] / SCORE_SCALE / v["n_tokens"]
        got = v["epochs_milli"] / 1000
        # weight_ppm itself floors, so compare against the unfloored share
        assert got <= exact * 1.001 + 0.001
        assert got > exact - 0.1


def test_partitioning_invariance(spark):
    base = _collect(domain_mixture(_docs(spark)))
    rep = _collect(domain_mixture(_docs(spark).repartition(7)))
    assert base == rep


def test_invalid_temperature_raises(spark):
    with pytest.raises(ValueError, match="sqrt-composable"):
        domain_mixture(_docs(spark), temperature=0.7)


def test_duckdb_twin_hash_identical(spark, tmp_path):
    df = _docs(spark)
    p = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    for tau in (1.0, 0.75, 0.5, 0.25):
        spark_rows = sorted(
            tuple(r) for r in domain_mixture(df, temperature=tau).collect())
        oracle_rows = sorted(
            tuple(r) for r in
            con.execute(domain_mixture_sql(temperature=tau)).fetchall())
        assert spark_rows == oracle_rows, f"tau={tau}"


# --- lexical_diversity (textstats) — registered alongside the mixture ---

from document_extractor_spark.operators.textstats import lexical_diversity


def _lex_docs(spark):
    rows = [
        (1, "a b A", "d1"),      # lowercased: a x2, b -> hapax b
        (2, "c", "d1"),          # hapax c
        (3, "x x x x", "d2"),
        (4, "   ", "d3"),        # whitespace-only: domain absent
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_lexical_diversity_counts(spark):
    out = {r["domain"]: r.asDict()
           for r in lexical_diversity(_lex_docs(spark)).collect()}
    assert out["d1"] == {"domain": "d1", "n_tokens": 4, "n_types": 3,
                         "n_hapax": 2, "ttr_ppm": 750000,
                         "hapax_ppm": 500000}
    assert out["d2"] == {"domain": "d2", "n_tokens": 4, "n_types": 1,
                         "n_hapax": 0, "ttr_ppm": 250000, "hapax_ppm": 0}
    assert "d3" not in out  # all-empty domain has no token rows


def test_lexical_diversity_partitioning_invariance(spark):
    a = sorted(map(tuple, lexical_diversity(_lex_docs(spark)).collect()))
    b = sorted(map(tuple, lexical_diversity(
        _lex_docs(spark).repartition(5)).collect()))
    assert a == b


def test_lexical_diversity_duckdb_twin(spark, tmp_path):
    df = _lex_docs(spark)
    p = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sql = m.oracle_sql()["lexical_diversity"]
    spark_rows = sorted(tuple(r) for r in lexical_diversity(df).collect())
    oracle_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == oracle_rows
