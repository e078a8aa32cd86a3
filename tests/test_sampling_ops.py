"""Deterministic sampling + token-budget packing operators."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.operators import sampling as sp


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", 10 + (i * 7) % 50) for i in range(400)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens int").cache()


def test_sample_deterministic_rate_and_stability(docs):
    s1 = sp.sample_deterministic(docs, 0.25, ["doc_id"])
    s2 = sp.sample_deterministic(docs.repartition(7), 0.25, ["doc_id"])
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2                      # repartition-stable
    assert 0.15 <= len(ids1) / 400 <= 0.35   # ~fraction
    # distinct seeds give different samples
    ids3 = {r["doc_id"]
            for r in sp.sample_deterministic(docs, 0.25, ["doc_id"],
                                             seed=7).collect()}
    assert ids3 != ids1


def test_sample_deterministic_nesting(docs):
    # raising the fraction only ADDS rows (same seed): threshold property
    small = {r["doc_id"]
             for r in sp.sample_deterministic(docs, 0.1, ["doc_id"]).collect()}
    big = {r["doc_id"]
           for r in sp.sample_deterministic(docs, 0.4, ["doc_id"]).collect()}
    assert small <= big


def test_sample_deterministic_bounds(docs):
    assert sp.sample_deterministic(docs, 0.0, ["doc_id"]).count() == 0
    assert sp.sample_deterministic(docs, 1.0, ["doc_id"]).count() == 400
    with pytest.raises(ValueError):
        sp.sample_deterministic(docs, 1.5, ["doc_id"])
    with pytest.raises(ValueError):
        sp.sample_deterministic(docs, 0.5, [])


def test_sample_per_group(docs):
    out = sp.sample_per_group(docs, "lang",
                              {"lang0": 1.0, "lang1": 0.0},
                              key_cols=["doc_id"],
                              default_fraction=0.5)
    by_lang = {r["lang"]: r["n"]
               for r in out.groupBy("lang").agg(
                   F.count("*").alias("n")).collect()}
    assert by_lang.get("lang0") == 134        # every lang0 row (ceil)
    assert "lang1" not in by_lang             # dropped entirely
    assert 0 < by_lang.get("lang2", 0) < 133  # ~half of lang2
    # nesting across fraction changes holds per group too
    half = {r["doc_id"] for r in out.collect()}
    fuller = {r["doc_id"]
              for r in sp.sample_per_group(
                  docs, "lang", {"lang0": 1.0, "lang1": 0.0},
                  key_cols=["doc_id"], default_fraction=0.9).collect()}
    assert half <= fuller


def test_pack_token_budget_bounds(docs):
    budget = 200
    out = sp.pack_token_budget(docs, budget, n_buckets=8).cache()
    assert out.count() == 400                 # every doc assigned
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    shard_totals = (out.groupBy("pack_bucket", "shard_id")
                    .agg(F.sum("n_tokens").alias("tot")).collect())
    assert all(r["tot"] < budget + max_doc for r in shard_totals)
    # determinism under repartitioning
    out2 = sp.pack_token_budget(docs.repartition(13), budget, n_buckets=8)
    a = {(r["doc_id"], r["pack_bucket"], r["shard_id"])
         for r in out.collect()}
    b = {(r["doc_id"], r["pack_bucket"], r["shard_id"])
         for r in out2.collect()}
    assert a == b
    out.unpersist()


def test_pack_token_budget_oversize_doc_closes_shard(spark):
    rows = [(0, 50), (1, 500), (2, 50), (3, 60)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = sp.pack_token_budget(docs, 100, n_buckets=1)
    shard = {r["doc_id"]: r["shard_id"] for r in out.collect()}
    # doc 1 (500 tokens) may share its shard with doc 0 but docs 2,3 must
    # land in a LATER shard
    assert shard[2] > shard[1] and shard[3] >= shard[2]
    with pytest.raises(ValueError):
        sp.pack_token_budget(docs, 0)


def test_sample_md5_method_cross_engine(docs):
    """method="md5" (round 5): the portable hex-threshold hash keeps the
    same properties (rate, repartition stability, nesting) AND reproduces
    bit-identically in DuckDB — the form the training_corpus oracle
    verifies end-to-end."""
    import duckdb
    s1 = sp.sample_deterministic(docs, 0.25, ["doc_id"], method="md5")
    s2 = sp.sample_deterministic(docs.repartition(7), 0.25, ["doc_id"],
                                 method="md5")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2
    assert 0.15 <= len(ids1) / 400 <= 0.35
    small = {r["doc_id"] for r in
             sp.sample_deterministic(docs, 0.1, ["doc_id"],
                                     method="md5").collect()}
    assert small <= set(ids1) | {r["doc_id"] for r in
                                 sp.sample_deterministic(
                                     docs, 0.4, ["doc_id"],
                                     method="md5").collect()}
    dk = [r[0] for r in duckdb.connect().execute("""
        SELECT i AS doc_id FROM range(0, 400) t(i)
        WHERE ('0x' || substring(md5(concat_ws(chr(31), i, '42')), 1, 8))
              ::UBIGINT::BIGINT / 4294967296.0 < 0.25
        ORDER BY 1""").fetchall()]
    assert ids1 == dk


def test_pack_token_budget_md5_method(docs):
    """md5-method packing keeps the budget bound and is deterministic."""
    out = sp.pack_token_budget(docs, 150, n_buckets=4, method="md5")
    stats = (out.groupBy("pack_bucket", "shard_id")
             .agg(F.sum("n_tokens").alias("tot"),
                  F.max("n_tokens").alias("mx")).collect())
    for s in stats:
        assert s["tot"] < 150 + s["mx"]
    again = sp.pack_token_budget(docs.repartition(5), 150, n_buckets=4,
                                 method="md5")
    a = {(r["doc_id"], r["pack_bucket"], r["shard_id"])
         for r in out.collect()}
    b = {(r["doc_id"], r["pack_bucket"], r["shard_id"])
         for r in again.collect()}
    assert a == b
    with pytest.raises(ValueError):
        sp.pack_token_budget(docs, 150, method="nope")
