"""Rendezvous hashing (operators/routing.py) — minimal-disruption
property, balance, determinism vs a pure-Python recompute, NULL/
validation handling, and the zero-shuffle plan claim."""

import hashlib

import pytest
from pyspark.sql import functions as F

from document_extractor_spark.operators.routing import rendezvous_assign
from document_extractor_spark.plans import assert_no_python, physical_plan


def _py_assign(key, shards):
    return max(
        sorted(shards),
        key=lambda s: hashlib.md5(
            f"{key}\x1f{s}".encode()).hexdigest())


def test_matches_python_recompute(spark):
    shards = [f"fetcher-{i}" for i in range(8)]
    keys = [f"https://host{i}.example.org/" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    got = {r["url"]: r["shard"]
           for r in rendezvous_assign(df, "url", shards).collect()}
    for k in keys:
        assert got[k] == _py_assign(k, shards)


def test_minimal_disruption_on_shard_add(spark):
    """Adding shard-8: every moved key moves TO shard-8; no key ever
    moves between two surviving shards. Moved fraction ~1/9."""
    old = [f"s{i}" for i in range(8)]
    new = old + ["s8"]
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(2000)], "k string")
    both = rendezvous_assign(
        rendezvous_assign(df, "k", old, out_col="old_shard"),
        "k", new, out_col="new_shard")
    rows = both.collect()
    moved = [r for r in rows if r["old_shard"] != r["new_shard"]]
    assert all(r["new_shard"] == "s8" for r in moved)
    assert 0 < len(moved) / len(rows) < 0.25  # E = 1/9 ~ 0.111


def test_balance(spark):
    """Uniform md5 weights → each of 8 shards gets ~1/8 of keys."""
    shards = [f"s{i}" for i in range(8)]
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(4000)], "k string")
    counts = (rendezvous_assign(df, "k", shards)
              .groupBy("shard").count().collect())
    assert len(counts) == 8
    for r in counts:
        assert 0.06 < r["count"] / 4000 < 0.20


def test_null_key_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    rows = {r["k"]: r["shard"]
            for r in rendezvous_assign(df, "k", ["x", "y"]).collect()}
    assert rows[None] is None and rows["a"] in ("x", "y")
    with pytest.raises(ValueError, match="unique"):
        rendezvous_assign(df, "k", ["x", "x"])
    with pytest.raises(ValueError, match="non-empty"):
        rendezvous_assign(df, "k", [])
    with pytest.raises(ValueError, match="non-empty"):
        rendezvous_assign(df, "k", ["ok", ""])


def test_plan_zero_shuffle_no_python(spark):
    df = spark.createDataFrame([("a",)], "k string")
    out = rendezvous_assign(df, "k", ["x", "y", "z"])
    assert_no_python(out)
    plan = physical_plan(out)
    assert "Exchange" not in plan and "Join" not in plan
