"""Scale-safe term expansion (round 2): the DataFrame (joined, no-collect)
expansion path must equal the driver (broadcast) path on every surface —
scores, qterms, match ranks, autosuggest phrases.

The driver path collects the matched dictionary slice only when it is
≤ expansionCollectThreshold rows (probed with limit(T+1), so the driver
never holds more than T+1 rows however wide the vocabulary); above the
threshold the expansion stays distributed with weight/rank as column
expressions (engine._expansion_df).
"""

import pytest

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.sources.corpus import synth_corpus

CFG = IndexConfig(fields=["content"], id_field="path", store_fields=["repo"])


@pytest.fixture(scope="module")
def index(spark):
    docs = synth_corpus(spark, 400, tokens_per_file=60).cache()
    return SparkSearchIndex.build(docs, CFG, order_cols=["repo", "path"])


def _full(idx, query, **opts):
    # match is compared by ORDER, not rank value: the DF path emits the
    # class as an order surrogate (engine._expansion_df) — the induced
    # (branch, cls, term) ordering equals the driver path's dense-rank
    # ordering, which is all any consumer (phrases, parity output) uses
    rows = idx.search_df(query, **opts).collect()
    return sorted(
        (r["doc_id"], round(r["score"], 9), tuple(r["qterms"]),
         tuple((m["branch"], m["term"], m["field_id"])
               for m in r["match"]))
        for r in rows)


@pytest.mark.parametrize("query,kw", [
    ("par", {"prefix": True}),
    ("quary", {"fuzzy": 1}),          # vocab near-miss: query/quary
    ("merje", {"prefix": True, "fuzzy": 1}),
])
def test_df_expansion_equals_driver_path(index, query, kw):
    """threshold=0 forces the joined DataFrame expansion; every output
    column (including match ordering) must equal the broadcast path."""
    want = _full(index, query, **kw)
    got = _full(index, query, expansionCollectThreshold=0, **kw)
    assert want, "query must match something for the test to mean anything"
    assert got == want
    # the expansion really derived extra terms (non-vacuous)
    assert any(len(m) and any(t != query for (_, t, _) in m)
               for *_ , m in want)


def test_threshold_binds_automatically(index):
    """A threshold smaller than the matched slice flips to the DF path
    without any caller hint — results identical."""
    want = _full(index, "p", prefix=True)
    got = _full(index, "p", prefix=True, expansionCollectThreshold=2)
    assert len({t for _, _, _, m in want for (_, t, _) in m}) > 2
    assert got == want


def test_autosuggest_over_df_expansion(index):
    """Phrase construction orders by expansion rank — the window-computed
    rank of the DF path must reproduce the driver ranks."""
    want = [(r["suggestion"], round(r["score"], 9))
            for r in index.auto_suggest_df("par", prefix=True).collect()]
    got = [(r["suggestion"], round(r["score"], 9))
           for r in index.auto_suggest_df(
               "par", prefix=True, expansionCollectThreshold=0).collect()]
    assert want and got == want


def test_driver_never_collects_wide_slice(index, monkeypatch):
    """With the default threshold, a wide expansion must not reach
    DataFrame.collect() with the full slice: patch collect to record sizes
    and assert every driver-side collect stays ≤ threshold+1 rows."""
    from pyspark.sql.classic.dataframe import DataFrame  # concrete class
    seen = []
    orig = DataFrame.collect

    def spy(self):
        out = orig(self)
        seen.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    index.search_df("p", prefix=True,
                    expansionCollectThreshold=3).collect()
    # the probe is limit(4): no driver-side materialization may exceed it
    # (the final result collect is excluded — it happened after the patch
    # captured it too, so allow the single result-sized entry)
    probe_sizes = seen[:-1]
    assert probe_sizes and max(probe_sizes) <= 4, seen


def test_large_corpus_defaults_to_df_path(index, monkeypatch):
    """Above DEFAULT_EXPANSION_DF_MIN_DOCS live docs the expansion
    defaults to the no-collect DataFrame path (measured 3.5x faster at
    1M docs) — results identical; an explicit expansionCollectThreshold
    still forces the broadcast path."""
    import slimsearch_spark.engine as eng
    want = _full(index, "par", prefix=True)  # broadcast (under the bound)
    monkeypatch.setattr(eng, "DEFAULT_EXPANSION_DF_MIN_DOCS", 1)
    calls = []
    orig = type(index)._expansion_df

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(index), "_expansion_df", spy)
    got = _full(index, "par", prefix=True)
    assert calls, "adaptive default must take the DataFrame path"
    assert got == want
    calls.clear()
    got2 = _full(index, "par", prefix=True,
                 expansionCollectThreshold=10_000)
    assert not calls, "explicit option must override the heuristic"
    assert got2 == want
