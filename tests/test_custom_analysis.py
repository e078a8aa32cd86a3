"""Index-time custom analysis chain (round 2): config.tokenize /
config.process_term run inside the Arrow-batched build UDF with the
reference's add-time semantics (src/add.ts:93-113) — 1→N expansion, falsy
rejection, field-aware callables, raw-token field lengths — and are reused
as the query-side defaults. Nested (dot-path) fields index struct columns
natively (reference extractField default, src/defaults.ts:10-14).
"""

import pytest

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex


def _postings(idx):
    return {(r["term"], r["doc_id"]): r["tf"]
            for r in idx.postings.collect()}


def test_process_term_expansion_and_rejection(spark):
    """processTerm returning a list indexes every element (1→N); falsy
    return drops the token; field_len still counts unique RAW tokens."""
    cfg = IndexConfig(
        fields=["text"], id_field="id",
        process_term=lambda t: (None if t.lower() == "drop"
                                else [t.lower(), t.lower() + "x"]))
    docs = spark.createDataFrame([(0, "Aa Bb drop"), (1, "Aa aa")],
                                 "id long, text string")
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["id"])
    assert _postings(idx) == {
        ("aa", 0): 1, ("aax", 0): 1, ("bb", 0): 1, ("bbx", 0): 1,
        ("aa", 1): 2, ("aax", 1): 2,
    }
    stats = {r["doc_id"]: r["field_len"] for r in idx.doc_stats.collect()}
    assert stats == {0: 3, 1: 2}  # raw tokens: {Aa,Bb,drop}, {Aa,aa}
    # the same processTerm is the query-side default: 'Bb' → ['bb','bbx']
    hits = idx.search("Bb")
    assert [h["id"] for h in hits] == [0]
    assert set(hits[0]["terms"]) == {"bb", "bbx"}


def test_field_aware_callables(spark):
    """Two-argument callables receive the field name at index time
    (reference processTerm(term, fieldName))."""
    cfg = IndexConfig(
        fields=["title", "body"], id_field="id",
        process_term=lambda t, field: f"{t.lower()}@{field}")
    docs = spark.createDataFrame([(0, "Foo", "Bar")],
                                 "id long, title string, body string")
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["id"])
    assert set(_postings(idx)) == {("foo@title", 0), ("bar@body", 0)}


def test_custom_tokenize(spark):
    """config.tokenize replaces the split; field_len = unique raw custom
    tokens."""
    cfg = IndexConfig(fields=["text"], id_field="id",
                      tokenize=lambda s: s.split(","))
    docs = spark.createDataFrame([(0, "a,b hello,a")],
                                 "id long, text string")
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["id"])
    assert set(_postings(idx)) == {("a", 0), ("b hello", 0)}
    assert _postings(idx)[("a", 0)] == 2
    stats = {r["doc_id"]: r["field_len"] for r in idx.doc_stats.collect()}
    assert stats == {0: 2}  # raw comma-tokens {a, b hello}
    assert [h["id"] for h in idx.search("b hello",
                                        tokenize=lambda s: [s])] == [0]


def test_nested_dot_path_fields(spark):
    """Dot-path field names resolve into struct columns — search over
    author.name scores like a flat column with the same content."""
    rows = [(0, ("Alice Smith",), "doc about spark"),
            (1, ("Bob Smith",), "doc about flink")]
    nested = spark.createDataFrame(
        rows, "id long, author struct<name: string>, text string")
    cfg = IndexConfig(fields=["author.name", "text"], id_field="id")
    idx = SparkSearchIndex.build(nested, cfg, order_cols=["id"])

    flat = spark.createDataFrame(
        [(0, "Alice Smith", "doc about spark"),
         (1, "Bob Smith", "doc about flink")],
        "id long, name string, text string")
    cfg_flat = IndexConfig(fields=["name", "text"], id_field="id")
    idx_flat = SparkSearchIndex.build(flat, cfg_flat, order_cols=["id"])

    for q in ["smith", "alice spark"]:
        got = [(h["id"], round(h["score"], 9)) for h in idx.search(q)]
        want = [(h["id"], round(h["score"], 9)) for h in idx_flat.search(q)]
        assert got == want and got, q
    # per-field options address the nested field by its dot-path name
    only_author = idx.search("smith", fields=["author.name"])
    assert {h["id"] for h in only_author} == {0, 1}


def test_custom_chain_survives_incremental_add(spark):
    """add_all re-runs the same custom chain — incremental == one-shot."""
    cfg = IndexConfig(fields=["text"], id_field="id",
                      process_term=lambda t: t.lower().rstrip("s"))
    all_docs = spark.createDataFrame(
        [(0, "merges the queues"), (1, "merge queue"), (2, "other stuff")],
        "id long, text string")
    one_shot = SparkSearchIndex.build(all_docs, cfg, order_cols=["id"])
    inc = SparkSearchIndex.build(all_docs.where("id < 2"), cfg,
                                 order_cols=["id"])
    inc.add_all(all_docs.where("id = 2"))
    a = [(h["id"], round(h["score"], 9)) for h in one_shot.search("merges")]
    b = [(h["id"], round(h["score"], 9)) for h in inc.search("merges")]
    assert a == b and {i for i, _ in a} == {0, 1}


def test_custom_extract_field(spark):
    """config.extract_field computes a field from the whole document
    (reference src/typings.ts:246, src/add.ts:89-93); returning None skips
    the doc for that field (the == null continue) — it contributes no
    postings and no field-length row."""
    cfg = IndexConfig(
        fields=["headline"], id_field="id",
        extract_field=lambda doc, field:
            (None if doc["title"] is None
             else f"{doc['title']} {doc['subtitle']}"))
    docs = spark.createDataFrame(
        [(0, "Hello", "World"), (1, None, "Orphan"), (2, "Solo", "Act")],
        "id long, title string, subtitle string")
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["id"])
    assert set(_postings(idx)) == {("hello", 0), ("world", 0),
                                   ("solo", 2), ("act", 2)}
    stats = {r["doc_id"]: r["field_len"] for r in idx.doc_stats.collect()}
    assert stats == {0: 2, 2: 2}  # doc 1 skipped entirely
    assert [h["id"] for h in idx.search("world")] == [0]


def test_custom_stringify_field(spark):
    """config.stringify_field turns native values into the indexed text
    (reference src/typings.ts:277, default .toString()) — the callable
    sees the raw typed value, not a pre-cast string."""
    seen = []

    def stringify(value, field):
        seen.append(type(value).__name__)
        return f"num {value:04d}"

    cfg = IndexConfig(fields=["n"], id_field="id",
                      stringify_field=stringify)
    docs = spark.createDataFrame([(0, 7), (1, 42)], "id long, n int")
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["id"])
    assert set(_postings(idx)) == {("num", 0), ("0007", 0),
                                   ("num", 1), ("0042", 1)}


def test_extract_and_stringify_compose_with_process_term(spark):
    """extractField → stringifyField → tokenize → processTerm is the full
    reference add-time chain (src/add.ts:89-113) in one Arrow UDF."""
    cfg = IndexConfig(
        fields=["combo"], id_field="id",
        extract_field=lambda doc, f: (doc["a"], doc["b"]),
        stringify_field=lambda v, f: f"{v[0]}-sep-{v[1]}",
        tokenize=lambda s: s.split("-sep-"),
        process_term=lambda t: t.upper())
    docs = spark.createDataFrame([(0, "x", "y")],
                                 "id long, a string, b string")
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["id"])
    assert set(_postings(idx)) == {("X", 0), ("Y", 0)}
