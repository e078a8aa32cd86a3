"""Spark engine vs. pure-Python oracle — rank-identity + score parity on the
reference query set (north rule: rank-identical docIDs and BM25 scores).

Every query here is from the reference's own test suite (search.spec.ts /
autoSuggest.spec.ts golden sets). Scores compared at rel-tol 1e-9.
"""

import pytest

from pyspark.sql import types as T

from slimsearch_spark.config import WILDCARD, IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.oracle import OracleIndex

from fixtures import BOOKS, BOOKS_MATCH, MOVIES, SONGS

REL_TOL = 1e-9


def make_df(spark, docs, columns, id_type=T.StringType()):
    fields = []
    for c in columns:
        t = id_type if c == "id" else T.StringType()
        fields.append(T.StructField(c, t, True))
    fields.append(T.StructField("_ord", T.IntegerType(), False))
    rows = [tuple(d.get(c) for c in columns) + (i,) for i, d in enumerate(docs)]
    return spark.createDataFrame(rows, T.StructType(fields))


def build_pair(spark, docs, fields, store_fields=(), id_type=T.StringType(),
               columns=None):
    columns = columns or list(dict.fromkeys(
        ["id"] + list(fields) + list(store_fields)))
    sdf = make_df(spark, docs, columns, id_type)
    cfg = IndexConfig(fields=fields, store_fields=store_fields)
    sidx = SparkSearchIndex.build(sdf, cfg, order_cols=["_ord"])
    oidx = OracleIndex(fields=fields, store_fields=store_fields)
    oidx.add_all(docs)
    return sidx, oidx


@pytest.fixture(scope="module")
def books_pair(spark):
    return build_pair(spark, BOOKS, ["title", "text"],
                      ["lang", "category"], id_type=T.LongType())


@pytest.fixture(scope="module")
def movies_pair(spark):
    return build_pair(spark, MOVIES, ["title", "description"], ["title"],
                      columns=["id", "title", "description"])


@pytest.fixture(scope="module")
def songs_pair(spark):
    return build_pair(spark, SONGS, ["song", "artist"], ["song"])


def assert_parity(sidx, oidx, query, check_match=False, **options):
    got = sidx.search(query, **options)
    want = oidx.search(query, **options)
    assert [r["id"] for r in got] == [r["id"] for r in want], \
        f"rank mismatch for {query!r}: {[r['id'] for r in got]} != " \
        f"{[r['id'] for r in want]}"
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=REL_TOL), \
            f"score mismatch for {query!r} doc {g['id']}"
        assert set(g["queryTerms"]) == set(w["queryTerms"])
        if check_match:
            assert {k: v for k, v in g["match"].items()} == \
                {k: sorted(v) if False else v for k, v in w["match"].items()}
    return got


# ---- books reference query set ----

def test_books_basic(books_pair):
    s, o = books_pair
    assert_parity(s, o, "vita")
    assert_parity(s, o, "del")
    assert s.search("paguro") == []
    assert s.search("") == []
    assert s.search("sottomarino aeroplano") == []


def test_books_boost(books_pair):
    s, o = books_pair
    assert_parity(s, o, "vita", boost={"title": 2})


def test_books_fields_selection(books_pair):
    s, o = books_pair
    assert_parity(s, o, "vita", fields=["title"])
    assert_parity(s, o, "vita", fields=["title"], boost={"text": 2})


def test_books_combinators(books_pair):
    s, o = books_pair
    assert_parity(s, o, "cammin como sottomarino")
    assert_parity(s, o, "vita cammin", combineWith="AND")
    assert_parity(s, o, "vita sottomarino", combineWith="AND")
    assert_parity(s, o, "vita cammin", combineWith="AND_NOT")
    assert_parity(s, o, "vita sottomarino", combineWith="AND_NOT")
    assert_parity(s, o, "sottomarino vita", combineWith="AND_NOT")
    with pytest.raises(ValueError, match="Invalid combination operator"):
        s.search("vita cammin", combineWith="XOR")


def test_books_fuzzy(books_pair):
    s, o = books_pair
    assert_parity(s, o, "camin memory", fuzzy=2)
    assert_parity(s, o, "comedia", fuzzy=0.6, maxFuzzy=3)


def test_books_prefix(books_pair):
    s, o = books_pair
    assert_parity(s, o, "que", prefix=True)
    assert_parity(s, o, "cammino quel", fuzzy=0.25, prefix=True)


def test_books_weights(books_pair):
    s, o = books_pair
    assert_parity(s, o, "cammino quel", fuzzy=True, prefix=True,
                  weights={"prefix": 0.1})
    assert_parity(s, o, "cammino quel", fuzzy=True, prefix=True,
                  weights={"fuzzy": 0.1})


def test_books_fuzzy_prefix_functions(books_pair):
    s, o = books_pair
    assert_parity(s, o, "quel comedia",
                  fuzzy=lambda t, i, ts: 2 if len(t) > 4 else False,
                  prefix=lambda t, i, ts: len(t) > 4)


def test_books_boost_document(books_pair):
    s, o = books_pair
    assert_parity(s, o, "divina commedia nova",
                  boostDocument=lambda i, t, st: 1.234)
    assert_parity(s, o, "vita",
                  boostDocument=lambda i, t, st: None if i == 3 else 1)


def test_books_filter(books_pair):
    s, o = books_pair
    assert_parity(s, o, "del", filter=lambda r: r.get("category") == "poetry")


def test_books_wildcard(books_pair):
    s, o = books_pair
    got = s.search(WILDCARD)
    want = o.search(WILDCARD)
    assert [r["id"] for r in got] == [r["id"] for r in want]
    assert_parity(s, o, WILDCARD, boostDocument=lambda i, t, st: i)


def test_books_query_tree(books_pair):
    s, o = books_pair
    assert_parity(s, o, {"combineWith": "OR", "queries": [
        {"combineWith": "AND", "queries": ["vita", "cammin"]},
        "como sottomarino",
        {"combineWith": "AND", "queries": ["nova", "pappagallo"]},
    ]})
    assert_parity(s, o, {"combineWith": "AND_NOT",
                         "queries": [WILDCARD, "vita"]})
    assert_parity(s, o, {"combineWith": "OR", "fuzzy": True,
                         "queries": [
                             {"prefix": True, "fields": ["title"],
                              "queries": ["vit"]},
                             {"combineWith": "AND",
                              "queries": ["bago", "coomo"]}],
                         "weights": {"fuzzy": 0.2, "prefix": 0.75}})


def test_books_query_tree_cascade(books_pair):
    s, o = books_pair
    tree = {"queries": [{"fields": ["text"], "queries": ["vita"]},
                        {"fields": ["title"], "queries": ["promessi"]}]}
    assert_parity(s, o, tree)
    assert_parity(s, o, tree, boost={"title": 2})
    assert_parity(s, o, tree, combineWith="AND")
    assert_parity(s, o, {**tree, "combineWith": "OR"}, combineWith="AND")


def test_books_bm25_params(books_pair):
    s, o = books_pair
    assert_parity(s, o, "vita", bm25={"k": 1.0, "b": 0.7, "d": 0.5})
    assert_parity(s, o, "del", bm25={"k": 1.2, "b": 1.0, "d": 0.5})
    assert_parity(s, o, "del", bm25={"k": 1.2, "b": 0.7, "d": 0.1})


# ---- match info parity (search.spec.ts:534-610) ----

@pytest.fixture(scope="module")
def match_pair(spark):
    return build_pair(spark, BOOKS_MATCH, ["title", "text"], (),
                      id_type=T.LongType(),
                      columns=["id", "title", "text"])


def test_match_info(match_pair):
    s, o = match_pair
    got = assert_parity(s, o, "vita nova", check_match=True)
    assert [r["match"] for r in got] == [
        {"vita": ["title", "text"], "nova": ["title"]},
        {"vita": ["text"]},
    ]
    assert_parity(s, o, "vita nova", combineWith="AND", check_match=True)
    assert_parity(s, o, "vi nuova", fuzzy=0.2, prefix=True, check_match=True)
    got = assert_parity(s, o, "vi nuova m de", fuzzy=0.2, prefix=True)
    assert got[0]["match"] == {
        "del": ["text"], "della": ["text"], "memoria": ["text"],
        "mia": ["text"], "vita": ["title", "text"], "nova": ["title"]}


# ---- movies golden ranking set ----

def test_movies_golden(movies_pair):
    s, o = movies_pair
    hits = assert_parity(s, o, "lamb", fuzzy=1, prefix=True)
    assert [h["title"] for h in hits] == [
        "Lamb", "Boundin'", "Ringing Bell", "The Lion of Judah",
        "The Silence of the Lambs"]
    hits = assert_parity(s, o, "sheep", fuzzy=1, prefix=True)
    assert [h["title"] for h in hits] == [
        "Shaun the Sheep", "Rams", "Shaun the Sheep: The Farmer's Llamas",
        "Ringing Bell", "Lamb"]
    assert assert_parity(s, o, "shaun the sheep")[0]["title"] == "Shaun the Sheep"
    assert assert_parity(s, o, "shaun the sheep", fuzzy=1, prefix=True)[0][
        "title"] == "Shaun the Sheep"
    assert assert_parity(s, o, "chirin the sheep")[0]["title"] == "Ringing Bell"
    assert assert_parity(s, o, "chirin the sheep", fuzzy=1, prefix=True)[0][
        "title"] == "Ringing Bell"
    assert assert_parity(s, o, "judah the sheep")[0]["title"] == "The Lion of Judah"
    assert assert_parity(s, o, "judah the sheep", fuzzy=1, prefix=True)[0][
        "title"] == "The Lion of Judah"
    assert assert_parity(s, o, "bounding sheep", fuzzy=1)[0]["title"] == "Boundin'"


# ---- songs golden ranking set ----

def test_songs_golden(songs_pair):
    s, o = songs_pair
    hits = assert_parity(s, o, "witch queen", fuzzy=1, prefix=True)
    assert [h["song"] for h in hits] == [
        "The Witch Queen Of New Orleans", "Killer Queen",
        "Bohemian Rhapsody", "Dancing Queen"]
    assert assert_parity(s, o, "queen", fuzzy=1, prefix=True)[0]["song"] == \
        "Killer Queen"


# ---- autoSuggest parity ----

def test_autosuggest(books_pair):
    s, o = books_pair
    for q, kw in [("com", {}), ("vita no", {}), ("nostra vi", {}),
                  ("vita", {"fuzzy": True, "prefix": True})]:
        got = s.auto_suggest(q, **kw)
        want = o.auto_suggest(q, **kw)
        assert [g["suggestion"] for g in got] == [w["suggestion"] for w in want]
        for g, w in zip(got, want):
            assert g["score"] == pytest.approx(w["score"], rel=REL_TOL)


def test_autosuggest_df_matches_driver(books_pair):
    """The distributed autoSuggest plan (groupBy phrase) must equal the
    parity-shaped driver implementation."""
    s, _ = books_pair
    for q, kw in [("com", {}), ("vita no", {}),
                  ("vita", {"fuzzy": True, "prefix": True})]:
        want = [(r["suggestion"], round(r["score"], 9))
                for r in s.auto_suggest(q, **kw)]
        got = [(r["suggestion"], round(r["score"], 9))
               for r in s.auto_suggest_df(q, **kw).collect()]
        assert sorted(got) == sorted(want), q
        # score-ordering parity (ties broken by suggestion in the DF plan)
        assert [g[1] for g in got] == sorted([g[1] for g in got],
                                             reverse=True)


# ---- top-k equals full-sort prefix (north-star addition) ----

def test_topk_prefix(movies_pair):
    s, _ = movies_pair
    full = s.search("sheep", fuzzy=1, prefix=True)
    top2 = s.search("sheep", fuzzy=1, prefix=True, top_k=2)
    assert [r["id"] for r in top2] == [r["id"] for r in full[:2]]


# ---- maintenance parity ----

def test_discard_vacuum_parity(spark):
    s, o = build_pair(spark, BOOKS, ["title", "text"], ["lang", "category"],
                      id_type=T.LongType())
    s.discard(1)
    o.discard(1)
    assert not s.has(1) and not o.has(1)
    assert_parity(s, o, "vita")
    assert_parity(s, o, "del")
    # df must reflect lazy cleanup (M7): "cammin" only in discarded doc
    assert s.search("cammin") == o.search("cammin") == []
    s.vacuum()
    o.vacuum()
    assert_parity(s, o, "vita")
    with pytest.raises(ValueError):
        s.discard(1)


def test_incremental_add_parity(spark):
    s, o = build_pair(spark, BOOKS[:2], ["title", "text"],
                      ["lang", "category"], id_type=T.LongType())
    extra = make_df(spark, BOOKS[2:], ["id", "title", "text", "lang",
                                       "category"], T.LongType())
    s.add_all(extra, order_cols=["_ord"])
    o.add(BOOKS[2])
    assert s.doc_count == o._doc_count == 3
    assert_parity(s, o, "vita")
    assert_parity(s, o, "del")
    with pytest.raises(ValueError, match="duplicate ID"):
        s.add_all(extra, order_cols=["_ord"])
