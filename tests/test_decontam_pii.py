"""Benchmark decontamination + PII scrub operators."""

import re

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.operators import decontam as dc
from slimsearch_spark.operators import pii


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow today"),
        (4, "the quick brown fox naps"),   # 3 trigrams, 2 shared w/ bench
        (5, "short doc"),                                  # < n tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def bench_set(spark):
    rows = [
        (100, "eval asks about the quick brown fox behavior"),
        (101, "completely unrelated benchmark prompt here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_contamination_hits_flags_overlap(corpus, bench_set):
    hits = {r["doc_id"]: r.asDict()
            for r in dc.contamination_hits(corpus, bench_set, n=3).collect()}
    # docs 1 and 4 share "the quick brown" / "quick brown fox" with doc 100
    assert set(hits) == {1, 4}
    assert hits[1]["n_hits"] == 2          # both 3-grams
    assert hits[4]["n_hits"] == 2
    assert hits[1]["n_shingles"] == 7      # 9 tokens -> 7 trigrams
    assert hits[1]["hit_frac"] == pytest.approx(2 / 7, abs=1e-6)


def test_decontaminate_drops_flagged_only(corpus, bench_set):
    kept = {r["doc_id"]
            for r in dc.decontaminate(corpus, bench_set, n=3).collect()}
    assert kept == {2, 3, 5}
    # fraction threshold: require > 30% contaminated shingles — doc 1
    # (2/7 = 0.286) survives, doc 4 (2/3 = 0.667) still drops
    kept_frac = {r["doc_id"] for r in dc.decontaminate(
        corpus, bench_set, n=3, min_frac=0.31).collect()}
    assert kept_frac == {1, 2, 3, 5}


def test_decontaminate_no_overlap_is_identity(corpus, spark):
    clean_bench = spark.createDataFrame(
        [(200, "zzz yyy xxx www vvv")], "doc_id long, text string")
    assert dc.decontaminate(corpus, clean_bench, n=3).count() == corpus.count()


def test_contamination_shuffle_join_variant(corpus, bench_set):
    a = sorted(r["doc_id"] for r in dc.contamination_hits(
        corpus, bench_set, n=3, broadcast_benchmark=False).collect())
    assert a == [1, 4]


PII_DOC = ("reach me at dev.user+spam@example-mail.org or +44 20 7946 0958, "
           "server at 192.168.0.1 logs to admin@corp.io")


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, PII_DOC),
        (2, "no pii here just plain text and version 1.2.3 notes"),
        (3, "ip 10.0.0.255 then +1-555-0100 twice +1-555-0100"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_pii_stats_counts(pii_docs):
    got = {r["doc_id"]: r.asDict() for r in pii.pii_stats(pii_docs).collect()}
    assert got[1]["n_email"] == 2
    assert got[1]["n_ipv4"] == 1
    assert got[1]["n_phone"] == 1
    assert got[2] == {"doc_id": 2, "n_email": 0, "n_ipv4": 0, "n_phone": 0}
    assert got[3]["n_ipv4"] == 1 and got[3]["n_phone"] == 2


def test_pii_scrub_redacts_and_preserves_rest(pii_docs):
    out = {r["doc_id"]: r["text"] for r in pii.pii_scrub(pii_docs).collect()}
    assert "<EMAIL>" in out[1] and "<IP>" in out[1] and "<PHONE>" in out[1]
    for pat, _ in pii.PII_PATTERNS.values():
        assert not re.search(pat, out[1])
    assert out[2] == "no pii here just plain text and version 1.2.3 notes"
    assert out[3].count("<PHONE>") == 2
    # non-text columns pass through
    assert pii.pii_scrub(pii_docs).columns == ["doc_id", "text"]


def test_pii_python_re_agreement(pii_docs):
    """The Spark counts equal Python re counts — guards the Java-regex
    reading of each pattern against the pattern author's intent."""
    rows = {r["doc_id"]: r for r in pii_docs.collect()}
    got = {r["doc_id"]: r.asDict() for r in pii.pii_stats(pii_docs).collect()}
    for did, row in rows.items():
        for name, (pat, _) in pii.PII_PATTERNS.items():
            key = {"email": "n_email", "ipv4": "n_ipv4",
                   "phone": "n_phone"}[name]
            assert got[did][key] == len(re.findall(pat, row["text"])), (
                did, name)


# ---------------------------------------------------------------- fuzz

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from slimsearch_spark.functions.tokenize import analyze_py

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]


def _texts(min_size=0, max_size=8):
    return st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=9)
        .map(" ".join),
        min_size=min_size, max_size=max_size)


def _py_shingles(text, n):
    toks = analyze_py(text)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES", "8")),
          deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(corpus_t=_texts(min_size=1), bench_t=_texts(),
       n=st.integers(min_value=2, max_value=4))
def test_fuzz_contamination_vs_python(spark, corpus_t, bench_t, n):
    """contamination_hits == a pure-Python n-gram overlap oracle on random
    tiny-vocabulary corpora (the small vocab forces shingle collisions)."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_t)], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_t)] or [(0, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["n_shingles"])
           for r in dc.contamination_hits(docs, bench, n=n).collect()}
    bench_sh = set().union(*(_py_shingles(t, n) for t in bench_t)) \
        if bench_t else set()
    want = {}
    for i, t in enumerate(corpus_t):
        sh = _py_shingles(t, n)
        hits = len(sh & bench_sh)
        if hits:
            want[i] = (hits, len(sh))
    assert got == want
