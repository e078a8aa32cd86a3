"""Validate the pure-Python oracle against the reference's hard-coded golden
expectations (search.spec.ts / autoSuggest.spec.ts). The oracle is the referee
for all later Spark parity tests, so it must itself be proven correct first."""

import pytest

from slimsearch_spark.config import WILDCARD
from slimsearch_spark.oracle import OracleIndex

from fixtures import BOOKS, BOOKS_MATCH, BOOKS_SUGGEST, MOVIES, SONGS


def books_index(**kw):
    idx = OracleIndex(fields=["title", "text"], store_fields=["lang", "category"], **kw)
    idx.add_all(BOOKS)
    return idx


@pytest.fixture(scope="module")
def books():
    return books_index()


@pytest.fixture(scope="module")
def movies():
    idx = OracleIndex(fields=["title", "description"], store_fields=["title"])
    idx.add_all(MOVIES)
    return idx


@pytest.fixture(scope="module")
def songs():
    idx = OracleIndex(fields=["song", "artist"], store_fields=["song"])
    idx.add_all(SONGS)
    return idx


def ids(results):
    return [r["id"] for r in results]


# ---- basic search semantics (search.spec.ts:49-160) ----

def test_returns_scored_results(books):
    rs = books.search("vita")
    assert sorted(ids(rs)) == [1, 3]
    assert rs[0]["score"] >= rs[1]["score"]


def test_stored_fields(books):
    rs = books.search("del")
    assert sorted((r.get("lang") or "") for r in rs) == ["", "", "it"]
    assert sorted((r.get("category") or "") for r in rs) == ["", "fiction", "poetry"]


def test_no_match_and_empty(books):
    assert books.search("paguro") == []
    assert books.search("") == []
    assert books.search("sottomarino aeroplano") == []


def test_boost_fields(books):
    rs = books.search("vita", boost={"title": 2})
    assert ids(rs) == [3, 1]
    assert rs[0]["score"] > rs[1]["score"]


def test_selected_fields(books):
    rs = books.search("vita", fields=["title"])
    assert ids(rs) == [3]
    rs = books.search("vita", fields=["title"], boost={"text": 2})
    assert ids(rs) == [3]


def test_combinators(books):
    assert ids(books.search("cammin como sottomarino")) == [2, 1]
    assert ids(books.search("vita cammin", combineWith="AND")) == [1]
    assert books.search("vita sottomarino", combineWith="AND") == []
    assert books.search("sottomarino vita", combineWith="AND") == []
    assert ids(books.search("vita cammin", combineWith="AND_NOT")) == [3]
    assert len(books.search("vita sottomarino", combineWith="AND_NOT")) == 2
    assert books.search("sottomarino vita", combineWith="AND_NOT") == []
    with pytest.raises(ValueError, match="Invalid combination operator: XOR"):
        books.search("vita cammin", combineWith="XOR")


def test_fuzzy(books):
    assert ids(books.search("camin memory", fuzzy=2)) == [1, 3]
    assert ids(books.search("comedia", fuzzy=0.6, maxFuzzy=3)) == [1]


def test_prefix(books):
    assert ids(books.search("que", prefix=True)) == [2, 3]


def test_prefix_and_fuzzy(books):
    assert ids(books.search("cammino quel", fuzzy=0.25, prefix=True)) == [2, 1, 3]


def test_weights(books):
    exact = books.search("cammino quel")
    assert ids(exact) == [2]
    prefix_last = books.search("cammino quel", fuzzy=True, prefix=True,
                               weights={"prefix": 0.1})
    assert ids(prefix_last) == [2, 1, 3]
    assert prefix_last[0]["score"] == exact[0]["score"]
    fuzzy_last = books.search("cammino quel", fuzzy=True, prefix=True,
                              weights={"fuzzy": 0.1})
    assert ids(fuzzy_last) == [2, 3, 1]
    assert fuzzy_last[0]["score"] == exact[0]["score"]


def test_prefix_and_fuzzy_same_term_scored_once():
    idx = OracleIndex(fields=["text"])
    idx.add_all([{"id": 1, "text": "Poi che la gente poverella crebbe"},
                 {"id": 2, "text": "Deus, venerunt gentes"}])
    exact = idx.search("gente")
    combined = idx.search("gente", fuzzy=0.2, prefix=True)
    assert ids(combined) == [1, 2]
    assert combined[0]["score"] == exact[0]["score"]
    assert combined[1]["match"]["gentes"] == ["text"]


def test_fuzzy_prefix_as_functions(books):
    rs = books.search("quel comedia",
                      fuzzy=lambda t, i, terms: 2 if len(t) > 4 else False,
                      prefix=lambda t, i, terms: len(t) > 4)
    assert ids(rs) == [2, 1]


def test_boost_document(books):
    no_boost = books.search("divina commedia nova")
    rs = books.search("divina commedia nova", boostDocument=lambda i, t, s: 1.234)
    assert rs[0]["score"] == pytest.approx(no_boost[0]["score"] * 1.234)
    rs = books.search("vita", boostDocument=lambda i, t, s: None if i == 3 else 1)
    assert 3 not in ids(rs)


def test_filter(books):
    rs = books.search("del", filter=lambda r: r.get("category") == "poetry")
    assert len(rs) == 1 and rs[0]["category"] == "poetry"


def test_bm25_params():
    idx = OracleIndex(fields=["text"])
    idx.add_all([{"id": 1, "text": "something very very very cool"},
                 {"id": 2, "text": "something cool"}])
    assert idx.search("very")[0]["score"] > \
        idx.search("very", bm25={"k": 1, "b": 0.7, "d": 0.5})[0]["score"]
    assert idx.search("something")[1]["score"] > \
        idx.search("something", bm25={"k": 1.2, "b": 1, "d": 0.5})[1]["score"]
    assert idx.search("something")[1]["score"] > \
        idx.search("something", bm25={"k": 1.2, "b": 0.7, "d": 0.1})[1]["score"]


def test_wildcard():
    idx = OracleIndex(fields=["text"], store_fields=["cool"])
    idx.add_all([{"id": 1, "text": "something cool", "cool": True},
                 {"id": 2, "text": "something else", "cool": False},
                 {"id": 3, "text": None, "cool": True}])
    assert idx.search("*") == []
    assert idx.search("") == []
    assert ids(idx.search(WILDCARD)) == [1, 2, 3]
    rs = idx.search(WILDCARD, filter=lambda x: x["cool"],
                    boostDocument=lambda i, t, s: i)
    assert ids(rs) == [3, 1]


def test_query_tree(books):
    rs = books.search({"combineWith": "OR", "queries": [
        {"combineWith": "AND", "queries": ["vita", "cammin"]},
        "como sottomarino",
        {"combineWith": "AND", "queries": ["nova", "pappagallo"]},
    ]})
    assert ids(rs) == [1, 2]

    rs = books.search({"combineWith": "AND_NOT", "queries": [WILDCARD, "vita"]})
    assert ids(rs) == [2]

    rs = books.search({"combineWith": "OR", "fuzzy": True,
                       "queries": [
                           {"prefix": True, "fields": ["title"], "queries": ["vit"]},
                           {"combineWith": "AND", "queries": ["bago", "coomo"]}],
                       "weights": {"fuzzy": 0.2, "prefix": 0.75}})
    assert ids(rs) == [3, 2]


def test_query_tree_option_cascade(books):
    tree = {"queries": [{"fields": ["text"], "queries": ["vita"]},
                        {"fields": ["title"], "queries": ["promessi"]}]}
    reference = books.search(tree)
    boosted = books.search({**tree}, boost={"title": 2})
    assert len(boosted) == len(reference)
    b2 = next(r for r in boosted if r["id"] == 2)
    r2 = next(r for r in reference if r["id"] == 2)
    assert b2["score"] > r2["score"]
    assert books.search({**tree}, combineWith="AND") == []
    assert len(books.search({**tree, "combineWith": "OR"}, combineWith="AND")) == \
        len(reference)


# ---- match data (search.spec.ts:534-610) ----

def match_index():
    idx = OracleIndex(fields=["title", "text"])
    idx.add_all(BOOKS_MATCH)
    return idx


def test_match_info():
    idx = match_index()
    rs = idx.search("vita nova")
    assert [r["match"] for r in rs] == [
        {"vita": ["title", "text"], "nova": ["title"]},
        {"vita": ["text"]},
    ]
    assert [set(r["terms"]) for r in rs] == [{"vita", "nova"}, {"vita"}]

    rs = idx.search("vita nova", combineWith="AND")
    assert [r["match"] for r in rs] == [{"vita": ["title", "text"], "nova": ["title"]}]

    rs = idx.search("vi nuova", fuzzy=0.2, prefix=True)
    assert [r["match"] for r in rs] == [
        {"vita": ["title", "text"], "nova": ["title"]},
        {"vita": ["text"]},
    ]

    rs = idx.search("vi nuova m de", fuzzy=0.2, prefix=True)
    assert [r["match"] for r in rs] == [
        {"del": ["text"], "della": ["text"], "memoria": ["text"],
         "mia": ["text"], "vita": ["title", "text"], "nova": ["title"]},
        {"del": ["text"], "mezzo": ["text"], "vita": ["text"]},
        {"del": ["text"]},
    ]
    assert [set(r["queryTerms"]) for r in rs] == [
        {"vi", "nuova", "m", "de"}, {"vi", "m", "de"}, {"de"}]


# ---- search-time tokenize / processTerm hooks ----

def test_search_time_hooks(books):
    idx = OracleIndex(fields=["title", "text"])
    idx.add_all(BOOKS)
    orig_tok = idx._tokenize
    idx._tokenize = lambda s: s.split("X")
    assert sorted(ids(idx.search("divinaXcommedia"))) == [1]
    idx._tokenize = orig_tok
    orig_pt = idx._process_term
    idx._process_term = lambda t: t.replace("1", "i").replace("4", "a").lower()
    assert ids(idx.search("d1v1n4")) == [1]
    idx._process_term = lambda t: None if t == "quel" else t.lower()
    assert ids(idx.search("quel commedia")) == [1]
    idx._process_term = lambda t: ["divina", "commedia"] if t == "divinacommedia" \
        else t.lower()
    assert ids(idx.search("divinacommedia")) == [1]
    idx._process_term = orig_pt


# ---- golden ranking set 1: movies (search.spec.ts:738-823) ----

def titles(results):
    return [r["title"] for r in results]


def test_movies_lamb(movies):
    hits = movies.search("lamb", fuzzy=1, prefix=True)
    assert titles(hits) == ["Lamb", "Boundin'", "Ringing Bell",
                            "The Lion of Judah", "The Silence of the Lambs"]


def test_movies_sheep(movies):
    hits = movies.search("sheep", fuzzy=1, prefix=True)
    assert titles(hits) == ["Shaun the Sheep", "Rams",
                            "Shaun the Sheep: The Farmer's Llamas",
                            "Ringing Bell", "Lamb"]


def test_movies_shaun(movies):
    assert movies.search("shaun the sheep")[0]["title"] == "Shaun the Sheep"
    assert movies.search("shaun the sheep", fuzzy=1, prefix=True)[0]["title"] == \
        "Shaun the Sheep"


def test_movies_chirin(movies):
    assert movies.search("chirin the sheep")[0]["title"] == "Ringing Bell"
    assert movies.search("chirin the sheep", fuzzy=1, prefix=True)[0]["title"] == \
        "Ringing Bell"


def test_movies_judah(movies):
    assert movies.search("judah the sheep")[0]["title"] == "The Lion of Judah"
    assert movies.search("judah the sheep", fuzzy=1, prefix=True)[0]["title"] == \
        "The Lion of Judah"


def test_movies_bounding(movies):
    assert movies.search("bounding sheep", fuzzy=1)[0]["title"] == "Boundin'"


# ---- golden ranking set 2: songs (search.spec.ts:884-906) ----

def test_songs_witch_queen(songs):
    hits = songs.search("witch queen", fuzzy=1, prefix=True)
    assert [r["song"] for r in hits] == [
        "The Witch Queen Of New Orleans", "Killer Queen",
        "Bohemian Rhapsody", "Dancing Queen"]


def test_songs_queen(songs):
    assert songs.search("queen", fuzzy=1, prefix=True)[0]["song"] == "Killer Queen"


# ---- autoSuggest (autoSuggest.spec.ts:42-130) ----

@pytest.fixture(scope="module")
def suggest_index():
    idx = OracleIndex(fields=["title", "text"], store_fields=["category"])
    idx.add_all(BOOKS_SUGGEST)
    return idx


def test_suggest_basic(suggest_index):
    rs = suggest_index.auto_suggest("com")
    assert [r["suggestion"] for r in rs] == ["como", "commedia"]
    assert rs[0]["score"] > rs[1]["score"]
    assert suggest_index.auto_suggest("paguro") == []
    assert suggest_index.auto_suggest("") == []
    assert suggest_index.auto_suggest("sottomarino aeroplano") == []


def test_suggest_multiword(suggest_index):
    rs = suggest_index.auto_suggest("vita no")
    assert [r["suggestion"] for r in rs] == ["vita nova", "vita nostra"]
    assert rs[0]["score"] > rs[1]["score"]
    rs = suggest_index.auto_suggest("nostra vi")
    assert [r["suggestion"] for r in rs] == ["nostra vita"]


def test_suggest_no_dup(suggest_index):
    rs = suggest_index.auto_suggest("vita", fuzzy=True, prefix=True)
    assert rs[0]["suggestion"] == "vita"
    assert rs[0]["terms"] == ["vita"]


def test_suggest_filter(suggest_index):
    rs = suggest_index.auto_suggest(
        "que", filter=lambda r: r.get("category") == "fiction")
    assert len(rs) == 1 and rs[0]["suggestion"] == "quel"
    rs = suggest_index.auto_suggest(
        "que", filter=lambda r: r.get("category") == "poetry")
    assert len(rs) == 1 and rs[0]["suggestion"] == "quella"


def test_suggest_custom_defaults():
    idx = OracleIndex(fields=["title", "text"],
                      auto_suggest_options={"combineWith": "OR", "fuzzy": True})
    idx.add_all(BOOKS_SUGGEST)
    rs = idx.auto_suggest("nosta vi")
    assert [r["suggestion"] for r in rs] == ["nostra vita", "vita"]


def test_suggest_search_option_defaults():
    idx = OracleIndex(fields=["title", "text"],
                      search_options={"combineWith": "OR", "fuzzy": True})
    idx.add_all(BOOKS_SUGGEST)
    rs = idx.auto_suggest("nosta vi")
    assert [r["suggestion"] for r in rs] == ["nostra vita"]


# ---- maintenance semantics ----

def test_discard_and_vacuum():
    idx = books_index()
    idx.discard(1)
    assert not idx.has(1)
    assert ids(idx.search("vita")) == [3]
    with pytest.raises(ValueError):
        idx.discard(1)
    idx.vacuum()
    assert idx._dirt_count == 0
    assert ids(idx.search("vita")) == [3]


def test_replace():
    idx = books_index()
    idx.replace({"id": 1, "title": "Divina Commedia",
                 "text": "totally different text"})
    rs = idx.search("totally")
    assert ids(rs) == [1]
    assert ids(idx.search("cammin")) == []


def test_duplicate_id_raises():
    idx = books_index()
    with pytest.raises(ValueError, match="duplicate ID"):
        idx.add(BOOKS[0])
