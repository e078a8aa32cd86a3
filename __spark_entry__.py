"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator family (SURVEY.md §2 +
training-data-pipeline ops), each with a DuckDB ``oracle_sql()`` twin.
Semantics are the slimsearch reference's (BM25+ k=1.2 b=0.7 d=0.5, unique-
raw-token field lengths, prefix weight 0.375·len/(len+0.3·d), fuzzy weight
0.45·len/(len+d), quality multiplier = #matched query terms).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.operators.build import (build_doc_stats, build_postings,
                                              build_term_dict, tokenize_fields)
from slimsearch_spark.operators import decontam as dc
from slimsearch_spark.operators import dedup as dd
from slimsearch_spark.operators import pii as pii_op
from slimsearch_spark.operators import textstats as ts
from slimsearch_spark.operators import similarity as sim

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------- helpers

_INDEX_CACHE: dict = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _index(spark: SparkSession, sf_dir: str) -> SparkSearchIndex:
    key = ("idx", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(fields=["text"], id_field="doc_id",
                          store_fields=["lang", "source"])
        _INDEX_CACHE[key] = SparkSearchIndex.build(
            _docs(spark, sf_dir), cfg, order_cols=["doc_id"])
    return _INDEX_CACHE[key]


def _search_scores(idx: SparkSearchIndex, query, **opts) -> DataFrame:
    # with_stored=False: these entries keep only (doc_id, score), so the
    # row-store join would be dead weight in every plan (engine.search_df)
    return (idx.search_df(query, with_stored=False, **opts)
            .select("doc_id", F.round("score", 6).alias("score")))


def _tokenized(spark, sf_dir):
    cfg = IndexConfig(fields=["text"], id_field="doc_id")
    return tokenize_fields(_docs(spark, sf_dir), cfg)


# ------------------------------------------------------------ Spark side

def q_postings(spark, sf_dir):
    """B2-B5: inverted-index postings (term, doc_id, tf)."""
    return (build_postings(_tokenized(spark, sf_dir))
            .select("term", "doc_id", "tf"))


def q_doc_stats(spark, sf_dir):
    """B6: per-doc field length = unique raw tokens (parity note P1)."""
    return (build_doc_stats(_tokenized(spark, sf_dir))
            .select("doc_id", "field_len"))


def q_term_stats(spark, sf_dir):
    """Term dictionary with df + collection frequency."""
    p = build_postings(_tokenized(spark, sf_dir))
    return (p.groupBy("term")
            .agg(F.count("*").cast("int").alias("df"),
                 F.sum("tf").cast("bigint").alias("cf")))


def q_bm25_topk(spark, sf_dir):
    """Q1/Q6/Q7: flagship BM25 OR top-10 for 'spark join merge'."""
    return _search_scores(_index(spark, sf_dir), "spark join merge", top_k=10)


def q_bm25_and(spark, sf_dir):
    """Q8 AND combinator, full match set: 'spark join'. (Driver-gated
    again since round 5 — the text_stats consolidation freed the slot;
    VERDICT r04 #8.)"""
    return _search_scores(_index(spark, sf_dir), "spark join",
                          combineWith="AND")


def q_bm25_topk_batch(spark, sf_dir):
    """Round 4: batched multi-query scoring (plans/batch.py) — ONE Spark
    job serves three queries; every query's expansion ships in one
    broadcast table keyed by query_id, the postings join runs once, and a
    single aggregation folds scoring + quality for all of them. Scores
    are identical to running search_df per query (q0 is exactly
    bm25_topk's query, so the oracle cross-checks the flagship entry).
    This is the query-THROUGHPUT path: a distributed engine pays
    per-job scheduling overhead, so a query stream is served batched."""
    idx = _index(spark, sf_dir)
    return (idx.search_many_df(
        ["spark join merge", "data system query", "merge spark"], top_k=10)
        .select("query_id", "doc_id", F.round("score", 6).alias("score")))


def q_bm25_and_not(spark, sf_dir):
    """Q8 AND_NOT combinator: 'spark' minus 'join'."""
    return _search_scores(_index(spark, sf_dir), "spark join",
                          combineWith="AND_NOT")


def q_prefix_search(spark, sf_dir):
    """Q5 prefix expansion: one-char prefix 's'."""
    return _search_scores(_index(spark, sf_dir), "s", prefix=True)


def q_fuzzy_search(spark, sf_dir):
    """Q5/S5 fuzzy expansion: 'spak' within edit distance 1."""
    return _search_scores(_index(spark, sf_dir), "spak", fuzzy=1)


def q_combined_search(spark, sf_dir):
    """Q5 combined prefix+fuzzy ('spak', fuzzy=0.2 → maxDist 1): a term that
    is both a prefix- and fuzzy-match scores once, as prefix
    (src/results.ts:230-234)."""
    return _search_scores(_index(spark, sf_dir), "spak",
                          prefix=True, fuzzy=0.2)


def q_prefix_search_wide(spark, sf_dir):
    """Q5 scale-safe expansion (round 2): combined prefix+fuzzy on 'ma'
    with expansionCollectThreshold=0 — the expansion stays a joined
    DataFrame (weights/ranks as column expressions, no driver collect) and
    must score identically to the broadcast path / oracle."""
    return _search_scores(_index(spark, sf_dir), "ma",
                          prefix=True, fuzzy=1,
                          expansionCollectThreshold=0)


def q_search_doc_boosted(spark, sf_dir):
    """boostDocument Column fast path (round 2): lang='en' docs boosted 2x,
    lang='de' docs dropped (falsy ⇒ skip, src/results.ts:123-126) —
    evaluated executor-side, no live_docs().collect()."""
    boost = (F.when(F.col("lang") == "en", 2.0)
             .when(F.col("lang") == "de", F.lit(None))
             .otherwise(1.0))
    return _search_scores(_index(spark, sf_dir), "merge",
                          boostDocument=boost)


def q_wildcard_boosted(spark, sf_dir):
    """Q3 wildcard + Column boostDocument over stored fields: per-lang
    boost, de docs dropped (falsy) — computed in the row-store scan, no
    driver loop."""
    from slimsearch_spark.config import WILDCARD
    idx = _index(spark, sf_dir)
    boost = (F.when(F.col("lang") == "en", 2.0)
             .when(F.col("lang") == "fr", 1.5)
             .when(F.col("lang") == "de", F.lit(None))
             .otherwise(1.0))
    return (idx.search_df(WILDCARD, boostDocument=boost, with_stored=False)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_term_boosted(spark, sf_dir):
    """Q4 boostTerm callable: first query term weighted 2x."""
    return _search_scores(
        _index(spark, sf_dir), "spark join",
        boostTerm=lambda term, i, terms: 2.0 if i == 0 else 1.0)


def q_search_after_vacuum(spark, sf_dir):
    """M6 vacuum compaction: discard (doc_id % 7 == 0) then vacuum — scores
    must equal the tombstoned state (vacuum only rewrites storage)."""
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang"])
    idx = SparkSearchIndex.build(_docs(spark, sf_dir), cfg,
                                 order_cols=["doc_id"])
    victims = [r["doc_id"] for r in
               _docs(spark, sf_dir).where(F.col("doc_id") % 7 == 0)
               .select("doc_id").collect()]
    idx.discard_many(victims)
    idx.vacuum()
    return _search_scores(idx, "spark")


def q_wand_topk(spark, sf_dir):
    """Block-max WAND top-10 over the compacted (delta+varint) posting
    lists — must be rank- and score-identical to bm25_topk.
    adaptive_min_docs=0 pins the REAL pruned path at oracle scale (the
    production default skips to the exact plan below the measured
    crossover; that skip is benched as wand_topk_adaptive)."""
    idx = _index(spark, sf_dir)
    return (idx.search_topk_wand("spark join merge", 10, adaptive_min_docs=0)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_wand_topk_adaptive(spark, sf_dir):
    """Default search_topk_wand (adaptive skip below the crossover) —
    result-identical to wand_topk/bm25_topk by contract."""
    idx = _index(spark, sf_dir)
    return (idx.search_topk_wand("spark join merge", 10)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_wand_and_topk(spark, sf_dir):
    """Round 3: conjunctive (AND) block-max WAND top-10 — posting-list
    intersection at grid-cell granularity with block skip; must be rank-
    and score-identical to the exact AND plan's top-10."""
    idx = _index(spark, sf_dir)
    return (idx.search_topk_wand("spark join", 10, combineWith="AND",
                                 adaptive_min_docs=0)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_wand_topk_multifield(spark, sf_dir):
    """Round 3: multi-field WAND top-10 (fields text+source, source boosted
    2x) — per-(term, field) df/idf, per-field avg length and boost routed
    through the pruned path; identical to bm25_multifield's top-10."""
    key = ("idx2", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(fields=["text", "source"], id_field="doc_id")
        _INDEX_CACHE[key] = SparkSearchIndex.build(
            _docs(spark, sf_dir), cfg, order_cols=["doc_id"])
    idx = _INDEX_CACHE[key]
    return (idx.search_topk_wand("spark src3", 10, boost={"source": 2.0},
                                 adaptive_min_docs=0)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_wand_and_not_topk(spark, sf_dir):
    """Round 3: AND_NOT WAND top-10 ('spark' minus 'join') — negative
    posting lists decode only inside surviving positive cells; identical
    to the exact anti-join plan's top-10."""
    idx = _index(spark, sf_dir)
    return (idx.search_topk_wand("spark join", 10, combineWith="AND_NOT",
                                 adaptive_min_docs=0)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_wand_topk_discarded(spark, sf_dir):
    """Round 4: WAND top-10 over a SEGMENTED, discarded, UNVACUUMED
    index. Build on ~80% of the corpus, compact, then `add_all` the rest
    — incremental segment compaction encodes only the new batch as an
    appended segment (engine._append_segment; no index rewrite), with
    per-(term, field) df totals re-aggregated inside wand_topk. Then
    discard: the tombstoned doc_ids ship into the shard kernels and are
    dropped at block-decode time (round-3 VERDICT #4), with the live df
    recount spanning both segments. The oracle is the plain full-corpus
    BM25 over the live view — segmentation and tombstones must be
    invisible in the results. The constructed fixture is deterministic in
    sf_dir, so it caches like _index: repeat calls (bench warm-up) measure
    the tombstoned segmented QUERY, not the fixture construction."""
    key = ("idx_disc", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(fields=["text"], id_field="doc_id",
                          store_fields=["lang"], auto_vacuum=False)
        docs = _docs(spark, sf_dir)
        idx = SparkSearchIndex.build(docs.where(F.col("doc_id") % 5 != 0),
                                     cfg, order_cols=["doc_id"])
        idx.posting_lists()  # compact → the next add_all appends a segment
        idx.add_all(docs.where(F.col("doc_id") % 5 == 0),
                    order_cols=["doc_id"])
        assert idx._segment_count == 2  # appended, not re-encoded
        victims = [r["doc_id"] for r in
                   docs.where(F.col("doc_id") % 7 == 0)
                   .select("doc_id").collect()]
        idx.discard_many(victims)
        _INDEX_CACHE[key] = idx
    idx = _INDEX_CACHE[key]
    return (idx.search_topk_wand("spark", 10, adaptive_min_docs=0)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_autosuggest_custom_defaults(spark, sf_dir):
    """Round 3: index-level auto_suggest_options (reference
    SearchIndex.ts:161-163) — fuzzy set once at createIndex applies to
    every suggest call; 'spak' is not a corpus term, so ignoring the
    defaults would return nothing."""
    key = ("idx_aso", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(fields=["text"], id_field="doc_id",
                          auto_suggest_options={"fuzzy": 0.2})
        _INDEX_CACHE[key] = SparkSearchIndex.build(
            _docs(spark, sf_dir), cfg, order_cols=["doc_id"])
    idx = _INDEX_CACHE[key]
    return (idx.auto_suggest_df("spak")
            .select("suggestion", F.round("score", 6).alias("score")))


def q_custom_extract_field(spark, sf_dir):
    """Round 3: custom extract_field callable (reference typings.ts:246)
    runs in the Arrow analysis UDF — the indexed text is computed from the
    whole document (text + lang tag), changing tf/df of the lang tokens."""
    key = ("idx_extract", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(
            fields=["combo"], id_field="doc_id",
            extract_field=lambda doc, field:
                f"{doc['text']} lang{doc['lang']}")
        _INDEX_CACHE[key] = SparkSearchIndex.build(
            _docs(spark, sf_dir), cfg, order_cols=["doc_id"])
    idx = _INDEX_CACHE[key]
    return _search_scores(idx, "langen merge")


def q_wildcard(spark, sf_dir):
    """Q3: wildcard — every live doc, score 1."""
    from slimsearch_spark.config import WILDCARD
    idx = _index(spark, sf_dir)
    return (idx.search_df(WILDCARD, with_stored=False)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_search_filtered(spark, sf_dir):
    """Q10: stored-field filter (lang = 'en') on 'merge'."""
    idx = _index(spark, sf_dir)
    return (idx.search_df("merge")
            .where(F.col("lang") == "en")
            .select("doc_id", F.round("score", 6).alias("score")))


def q_autosuggest(spark, sf_dir):
    """Q11: autoSuggest('spa') — distributed phrase-group plan."""
    idx = _index(spark, sf_dir)
    return (idx.auto_suggest_df("spa")
            .select("suggestion", F.round("score", 6).alias("score")))


def q_autosuggest_fuzzy(spark, sf_dir):
    """Q11 autoSuggest with fuzzy expansion: phrase ordering follows the
    expansion ranks (exact, then prefix alphabetical, then fuzzy)."""
    idx = _index(spark, sf_dir)
    return (idx.auto_suggest_df("spak", fuzzy=0.2)
            .select("suggestion", F.round("score", 6).alias("score")))


def q_search_after_discard(spark, sf_dir):
    """M3/M7: tombstone docs (doc_id % 7 == 0), search 'spark' — df and
    averages must reflect lazy cleanup. auto_vacuum off so the tombstone
    anti-join path (not the compacted rewrite) is what's scored."""
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang"], auto_vacuum=False)
    idx = SparkSearchIndex.build(_docs(spark, sf_dir), cfg,
                                 order_cols=["doc_id"])
    victims = [r["doc_id"] for r in
               _docs(spark, sf_dir).where(F.col("doc_id") % 7 == 0)
               .select("doc_id").collect()]
    idx.discard_many(victims)
    return _search_scores(idx, "spark")


def q_bm25_query_tree(spark, sf_dir):
    """Q2/Q8 recursive query tree with option cascading:
    OR( AND('spark join'), 'merge' )."""
    idx = _index(spark, sf_dir)
    tree = {"queries": [{"queries": ["spark join"], "combineWith": "AND"},
                        "merge"],
            "combineWith": "OR"}
    return (idx.search_df(tree, with_stored=False)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_bm25_multifield(spark, sf_dir):
    """Multi-field search with field boosts: fields=[text, source],
    boost source x2 — per-(term, field) df, per-field avg length (P2/P3)."""
    key = ("idx2", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(fields=["text", "source"], id_field="doc_id")
        _INDEX_CACHE[key] = SparkSearchIndex.build(
            _docs(spark, sf_dir), cfg, order_cols=["doc_id"])
    idx = _INDEX_CACHE[key]
    return (idx.search_df("spark src3", boost={"source": 2.0},
                          with_stored=False)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_incremental_add(spark, sf_dir):
    """B2/B3 incremental addAll: build on even doc_ids, append odd ones —
    scores must equal a one-shot build over everything."""
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang"])
    idx = SparkSearchIndex.build(
        _docs(spark, sf_dir).where(F.col("doc_id") % 2 == 0), cfg,
        order_cols=["doc_id"])
    idx.add_all(_docs(spark, sf_dir).where(F.col("doc_id") % 2 == 1))
    return _search_scores(idx, "merge")


def q_search_after_remove(spark, sf_dir):
    """M1/M2: eager batched remove (doc_id % 13 == 0), search 'merge' —
    postings gone immediately, stats reversed."""
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang"])
    idx = SparkSearchIndex.build(_docs(spark, sf_dir), cfg,
                                 order_cols=["doc_id"])
    victims = [r.asDict() for r in
               _docs(spark, sf_dir).where(F.col("doc_id") % 13 == 0)
               .collect()]
    idx.remove_all(victims)
    return _search_scores(idx, "merge")


def q_custom_process_term(spark, sf_dir):
    """B10 (round 2): custom processTerm applied at INDEX time via the
    Arrow-batched analysis UDF (reference src/add.ts:106-113) and reused
    query-side — synonym folding 'join' → 'merge', changing tf AND df of
    the folded term, so any index/query asymmetry breaks the scores."""
    key = ("idx_stem", sf_dir)
    if key not in _INDEX_CACHE:
        cfg = IndexConfig(
            fields=["text"], id_field="doc_id",
            process_term=lambda t: ("merge" if t.lower() in ("merge", "join")
                                    else t.lower()))
        _INDEX_CACHE[key] = SparkSearchIndex.build(
            _docs(spark, sf_dir), cfg, order_cols=["doc_id"])
    return _search_scores(_INDEX_CACHE[key], "join")


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: winner per distinct content."""
    return dd.exact_dedup(_docs(spark, sf_dir))


def q_near_dup_minhash(spark, sf_dir):
    """MinHash + LSH banding + exact-Jaccard verify (threshold 0.5)."""
    return dd.near_dup_pairs(_docs(spark, sf_dir), k=8, rows_per_band=2,
                             threshold=0.5)


def q_ngram_jaccard(spark, sf_dir):
    """Direct n-gram Jaccard near-dup (round 4): rare-shingle inverted-
    index candidates (df ≤ 64), exact-Jaccard verify, no MinHash."""
    return dd.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_simhash(spark, sf_dir):
    """16-bit tf-weighted SimHash fingerprints."""
    return dd.simhash16(_docs(spark, sf_dir))


def q_simhash64(spark, sf_dir):
    """64-bit tf-weighted SimHash (two 32-bit halves, portable packing)."""
    return dd.simhash64(_docs(spark, sf_dir))


def q_simhash_near_dup(spark, sf_dir):
    """SimHash Hamming-banded near-dup pairs (≤3 bits over 64)."""
    return dd.simhash_near_dup(_docs(spark, sf_dir), max_hamming=3)


def q_lang_id(spark, sf_dir):
    """Both language-ID heuristics in one gated entry (consolidated in
    round 4 to free a driver slot): the stopword-ratio variant and the
    char-trigram-profile variant, joined on doc_id. Both operators stay
    independently pytest-covered in tests/test_dedup_ops.py."""
    docs = _docs(spark, sf_dir)
    stop = (ts.lang_id(docs)
            .withColumnRenamed("predicted_lang", "stop_lang"))
    ngram = (ts.lang_id_ngram(docs)
             .withColumnRenamed("predicted_lang", "ngram_lang"))
    return stop.join(ngram, "doc_id")


def q_text_quality(spark, sf_dir):
    """Both per-row text-metric operators in one gated entry
    (consolidated in round 4 to free a driver slot for dedup_clusters):
    quality features (token counts, TTR, mean token length, gate) joined
    with the whitespace + BPE-ish token counts. Both operators stay
    independently pytest-covered in tests/test_dedup_ops.py."""
    docs = _docs(spark, sf_dir)
    return ts.text_quality(docs).join(ts.token_counts(docs), "doc_id")


def q_dedup_clusters(spark, sf_dir):
    """Full duplicate clusters (round 4): exact-dup relation ∪ MinHash-LSH
    near-dup pairs → connected components via distributed min-label
    propagation with pointer jumping; cluster_id = component min."""
    return dd.dedup_clusters(_docs(spark, sf_dir), k=8, rows_per_band=2,
                             threshold=0.5)


def q_fingerprint(spark, sf_dir):
    """Both document fingerprints in one gated entry: the whole-doc
    normalized-stream md5 AND the winnowing rolling-hash digest
    (round 4 — the brief's "rolling hash" fingerprint proper), joined
    on doc_id."""
    docs = _docs(spark, sf_dir)
    return ts.fingerprint(docs).join(ts.winnow_fingerprints(docs), "doc_id")


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 embedding."""
    emb = _embeddings(spark, sf_dir)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    return sim.brute_force_topk(emb, q, k=10, exclude_id=0)


def q_ann_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed ANN (8 hyperplanes, seed 42), cosine re-rank."""
    emb = _embeddings(spark, sf_dir)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    return sim.lsh_topk(emb, q, k=10, n_planes=8, seed=42, exclude_id=0)


def q_ann_lsh_multiprobe(spark, sf_dir):
    """Sign-LSH ANN with multi-probe (Hamming ≤ 2 buckets) — the recall
    lever over the single-bucket probe, same exact cosine re-rank."""
    emb = _embeddings(spark, sf_dir)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    return sim.lsh_topk(emb, q, k=10, n_planes=8, seed=42, exclude_id=0,
                        hamming=2)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN: seeded coarse quantizer (first 16 vectors), probe the 2
    cells nearest the query, exact cosine re-rank. Assignment is one
    codegen'd argmin expression; probed cells prune before arithmetic."""
    emb = _embeddings(spark, sf_dir)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    seeds = sim.seed_centroids(emb, 16)
    return sim.ivf_topk(emb, q, k=10, centroids=seeds, n_probe=2,
                        exclude_id=0)


def q_ann_ivf_topk_saved(spark, sf_dir):
    """Round 3: IVF ANN over the persisted layout — the cell is a physical
    partition column (save_ivf_index), so the probe prunes directories at
    file-listing time (`PartitionFilters: [cell IN (...)]`); results must
    equal the live ann_ivf_topk plan."""
    import hashlib
    import tempfile
    emb = _embeddings(spark, sf_dir)
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    seeds = sim.seed_centroids(emb, 16)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/slimsearch_ivf_saved_{tag}"
    key = ("ivf_saved", sf_dir)
    if key not in _INDEX_CACHE:
        sim.save_ivf_index(emb, path, seeds)
        _INDEX_CACHE[key] = path
    return sim.ivf_topk_saved(spark, path, q, k=10, centroids=seeds,
                              n_probe=2, exclude_id=0)


def q_ann_ivf_topk_paths(spark, sf_dir):
    """Round-4 session-10 consolidation: the live IVF assignment AND the
    saved partition-pruned layout in ONE gated entry — both paths must
    produce the identical top-10 (tagged by ``path``), freeing a driver
    slot without un-gating either code path."""
    live = q_ann_ivf_topk(spark, sf_dir).withColumn("path", F.lit("live"))
    saved = (q_ann_ivf_topk_saved(spark, sf_dir)
             .withColumn("path", F.lit("saved")))
    return live.unionByName(saved)


def q_search_after_maintenance(spark, sf_dir):
    """Round-4 session-10 consolidation: the lazy-tombstone path (M3/M7,
    discard doc_id % 7, search 'spark') and the eager batched-remove path
    (M1/M2, remove doc_id % 13, search 'merge') in ONE gated entry, tagged
    by ``op`` — both maintenance semantics stay driver-gated in one slot."""
    d = (q_search_after_discard(spark, sf_dir)
         .withColumn("op", F.lit("discard")))
    r = (q_search_after_remove(spark, sf_dir)
         .withColumn("op", F.lit("remove")))
    return d.unionByName(r)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (training-data hygiene): eval set = every
    37th document, corpus = the rest; per-doc counts of token 3-grams
    shared with the eval set (a contaminated doc is any row returned —
    ``decontaminate`` anti-joins these ids away). Plan: benchmark shingles
    broadcast, corpus side one explode + one map-side-combinable
    aggregation — linear in corpus tokens, no self-join."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    corpus = docs.where(F.col("doc_id") % 37 != 0)
    return dc.contamination_hits(corpus, bench, n=3)


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction over documents with deterministically
    injected PII (the synthetic corpus contains none): per-doc match
    counts for email/IPv4/phone plus the md5 of the scrubbed text — the
    hash gates the full redacted form without shipping wide strings.
    Whole-stage-codegen regexp_count/regexp_replace only."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.1."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"))
    stats = pii_op.pii_stats(docs)
    scrub = (pii_op.pii_scrub(docs)
             .select("doc_id", F.md5("text").alias("scrub_md5")))
    return stats.join(scrub, "doc_id")


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via banded sign-LSH (16 planes,
    4 bands) + exact cosine verify ≥ 0.4 — never all-pairs."""
    return sim.embedding_near_dup(_embeddings(spark, sf_dir), threshold=0.4,
                                  n_planes=16, n_bands=4, seed=42)


def q_events_windowed(spark, sf_dir):
    """Tumbling 1-hour window counts per event type (batch twin of the
    streaming watermark+window path)."""
    from slimsearch_spark.operators import events as ev
    return ev.windowed_counts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "1 hour")


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) — batch twin of the
    applyInPandasWithState stateful streaming operator."""
    from slimsearch_spark.operators import events as ev
    return ev.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet"), gap_minutes=30.0)


def q_events_ops(spark, sf_dir):
    """Round-5 consolidation (VERDICT r04 #1): tumbling-window counts AND
    gap-based sessionization in ONE union-tagged entry (the
    search_after_maintenance pattern) — both event operators stay
    driver-gated while freeing a slot for training_corpus."""
    w = (q_events_windowed(spark, sf_dir)
         .select(F.lit("window").alias("op"),
                 F.col("event_type").alias("key"),
                 F.lit(None).cast("int").alias("session_id"),
                 F.col("window_start_ms").alias("start_ms"),
                 F.lit(None).cast("long").alias("end_ms"),
                 "n_events", "sum_value"))
    s = (q_sessionize(spark, sf_dir)
         .select(F.lit("session").alias("op"),
                 F.col("user_id").cast("string").alias("key"),
                 "session_id",
                 F.col("session_start_ms").alias("start_ms"),
                 F.col("session_end_ms").alias("end_ms"),
                 "n_events", "sum_value"))
    return w.unionByName(s)


def q_text_stats(spark, sf_dir):
    """Round-5 consolidation: the two round-4 joined entries (quality
    features + token counts; stopword + trigram language-ID) folded into
    ONE per-doc stats row — all four operators stay driver-gated, the
    freed slot goes to bm25_and (VERDICT r04 #8)."""
    return q_text_quality(spark, sf_dir).join(q_lang_id(spark, sf_dir),
                                              "doc_id")


def q_training_corpus(spark, sf_dir):
    """Round-5 (VERDICT r04 #1): the COMPOSED LLM training-data pipeline
    (pipeline.prepare_training_corpus) end-to-end oracle-gated. Corpus =
    documents with q_pii_scrub's deterministically injected PII suffix,
    benchmark = every 37th document (raw). Stage order is pinned by the
    value hash: PII scrub (both sides — the redacted form must feed every
    later hash/shingle) → benchmark 3-gram decontamination → quality gate
    (10 ≤ n_tokens ≤ 100k, ttr > 0.1 on the scrubbed text) → exact +
    MinHash-LSH duplicate-cluster survivors → deterministic 0.8 sample
    (portable md5 hex-threshold hash — bit-identical in DuckDB) →
    token-budget shard packing (n_buckets=1 → the pure window cumsum).
    The scrub-before-hash ordering is observable: the injected suffix is
    distinct per doc RAW but identical after redaction, so hashing the
    wrong form changes the exact-dup collapse and the output hash."""
    from slimsearch_spark.pipeline import prepare_training_corpus
    base = _docs(spark, sf_dir).select("doc_id", "text")
    injected = base.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.1."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"))
    corpus = injected.where(F.col("doc_id") % 37 != 0)
    bench = base.where(F.col("doc_id") % 37 == 0)
    out = prepare_training_corpus(
        corpus, benchmark=bench, scrub_pii=True, decontam_n=3,
        min_tokens=10, max_tokens=100_000, min_ttr=0.1,
        sample_fraction=0.8, shard_budget=2000, seed=42,
        hash_method="md5", n_buckets=1,
        threshold=0.5, k=8, rows_per_band=2)
    return out.select("doc_id", F.md5("text").alias("text_md5"),
                      "n_tokens", "pack_bucket", "shard_id")


def q_binary_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary column + typed metadata.
    (Consolidated out of the driver's 50-entry window in round-4
    session 4 — media_features gates the same binary-column plumbing
    through the heavier Arrow mapInPandas path; its slot went to
    index_merge.)"""
    return (_docs(spark, sf_dir)
            .select("doc_id", F.encode("text", "UTF-8").alias("__b"))
            .select("doc_id",
                    F.octet_length("__b").alias("n_bytes"),
                    F.md5(F.col("__b")).alias("content_md5")))


def q_index_merge(spark, sf_dir):
    """Round-4 session 4: sharded-build merge + incremental absorb (the
    north-star merge job). THREE independent shard builds over disjoint
    thirds of the corpus — each with its own dense internal doc-id space
    and its own corpus stats — then ``SparkSearchIndex.merge`` combines
    two and ``absorb`` ingests the third into the merged serving index
    in O(shard) with no re-tokenize. doc_count / avg field lengths / df
    all recompute over the union, so the BM25 top-10 must be IDENTICAL
    to one full-corpus build: the oracle is the plain full-corpus BM25
    (same SQL as bm25_topk) — sharding must be invisible."""
    key = ("idx_merged", sf_dir)
    if key not in _INDEX_CACHE:
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "ext_id")
        cfg = IndexConfig(fields=["text"], id_field="ext_id",
                          store_fields=["lang"])
        shards = [SparkSearchIndex.build(
            docs.where(F.pmod("ext_id", F.lit(3)) == i),
            cfg, order_cols=["ext_id"]) for i in range(3)]
        merged = SparkSearchIndex.merge(shards[:2])
        merged.absorb(shards[2])
        _INDEX_CACHE[key] = merged
    idx = _INDEX_CACHE[key]
    return (idx.search_df("spark join merge", top_k=10)
            .select(F.col("ext_id").alias("doc_id"),
                    F.round("score", 6).alias("score")))


def q_media_features(spark, sf_dir):
    """Multimodal feature extraction through the Arrow mapInPandas path:
    binary payloads → per-media byte stats. Gates the Python plumbing
    (batch iteration, binary columns, schema) against the SQL oracle —
    byte sums are exact integers in float64, so numpy and SQL means are
    bit-identical."""
    from slimsearch_spark.operators import multimodal as mm
    media = mm.synth_media(_docs(spark, sf_dir))
    return (mm.extract_features(media)
            .select("media_id", "n_bytes",
                    F.round("byte_mean", 6).alias("byte_mean")))


def q_image_resize(spark, sf_dir):
    """Round 3: multimodal resize through mapInPandas — decoder='fake'
    pins the deterministic cyclic-tiling fake (np.resize ==
    substring(repeat(...))), so the Arrow plumbing is byte-verifiable
    against SQL; a real decoder slots in at the same boundary."""
    from slimsearch_spark.operators import multimodal as mm
    media = mm.synth_media(_docs(spark, sf_dir))
    return (mm.resize_images(media, 64, 64, decoder="fake")
            .select("media_id", "width", "height",
                    F.md5("payload").alias("payload_md5")))


def q_frame_samples(spark, sf_dir):
    """Round 3: frame sampling — one media row fans out to every 4th
    fixed-rate pseudo-frame (byte slices with timestamps) through the
    mapInPandas boundary a real demuxer would use."""
    from slimsearch_spark.operators import multimodal as mm
    media = mm.synth_media(_docs(spark, sf_dir))
    return (mm.sample_frames(media, frame_bytes=64, stride=2)
            .select("media_id", "frame_idx", "ts_ms",
                    F.md5("frame").alias("frame_md5"),
                    F.octet_length("frame").alias("n_bytes")))


def q_sha256_invariant(spark, sf_dir):
    """North-rule per-row invariant: content sha256 (F.sha2 == oracle)."""
    return (_docs(spark, sf_dir)
            .select("doc_id", F.sha2(F.col("text"), 256).alias("sha256")))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 on sf0.001."""
    return q_bm25_topk(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings": q_postings,
        "doc_stats": q_doc_stats,
        "term_stats": q_term_stats,
        "bm25_topk": q_bm25_topk,
        "wand_topk": q_wand_topk,
        "wand_and_topk": q_wand_and_topk,
        "wand_and_not_topk": q_wand_and_not_topk,
        "wand_topk_multifield": q_wand_topk_multifield,
        "wand_topk_discarded": q_wand_topk_discarded,
        "bm25_topk_batch": q_bm25_topk_batch,
        "bm25_and_not": q_bm25_and_not,
        "bm25_query_tree": q_bm25_query_tree,
        "bm25_multifield": q_bm25_multifield,
        "prefix_search": q_prefix_search,
        "prefix_search_wide": q_prefix_search_wide,
        "search_doc_boosted": q_search_doc_boosted,
        "fuzzy_search": q_fuzzy_search,
        "combined_search": q_combined_search,
        "term_boosted": q_term_boosted,
        "search_after_vacuum": q_search_after_vacuum,
        "wildcard": q_wildcard,
        "search_filtered": q_search_filtered,
        "autosuggest_fuzzy": q_autosuggest_fuzzy,
        "autosuggest_custom_defaults": q_autosuggest_custom_defaults,
        "custom_extract_field": q_custom_extract_field,
        "search_after_maintenance": q_search_after_maintenance,
        "incremental_add": q_incremental_add,
        "custom_process_term": q_custom_process_term,
        "dedup_exact": q_dedup_exact,
        "near_dup_minhash": q_near_dup_minhash,
        "ngram_jaccard": q_ngram_jaccard,
        "simhash64": q_simhash64,
        "simhash_near_dup": q_simhash_near_dup,
        "text_stats": q_text_stats,
        "bm25_and": q_bm25_and,
        "dedup_clusters": q_dedup_clusters,
        "fingerprint": q_fingerprint,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "ann_ivf_topk": q_ann_ivf_topk_paths,
        "embedding_near_dup": q_embedding_near_dup,
        "decontaminate": q_decontaminate,
        "pii_scrub": q_pii_scrub,
        "events_ops": q_events_ops,
        "training_corpus": q_training_corpus,
        "index_merge": q_index_merge,
        "media_features": q_media_features,
        "image_resize": q_image_resize,
        "frame_samples": q_frame_samples,
        "sha256_invariant": q_sha256_invariant,
    }


# ------------------------------------------------------------- oracle SQL

# tokenizer: same split class as the engine (JS \p{Z}\p{P} == RE2 \p{Z}\p{P})
_TOK = r"""
tok AS (
  SELECT doc_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{Z}\p{P}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM documents
)"""

_POSTINGS = _TOK + r""",
postings AS (
  SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2
)"""

_STATS = r""",
dstat AS (
  SELECT doc_id,
         length(list_distinct(regexp_split_to_array(text,
             '[\n\r\p{Z}\p{P}]+')))::INT AS field_len
  FROM documents
),
cstat AS (SELECT avg(field_len) AS avg_len, count(*) AS n FROM dstat)"""


def _bm25_sql(terms_values: str, quality: str, having: str = "",
              limit: str = "") -> str:
    """Shared BM25 oracle: q(term[, weight]) → scored docs."""
    return f"""
WITH {_POSTINGS}{_STATS},
q AS ({terms_values}),
matched AS (
  SELECT p.term, q.weight, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id, m.term,
         m.weight * ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
),
agg AS (
  SELECT doc_id, sum(s) AS raw, {quality} AS quality
  FROM scored GROUP BY doc_id {having}
)
SELECT doc_id, round(raw * quality, 6) AS score
FROM agg
{('ORDER BY raw * quality DESC, doc_id ' + limit) if limit else ''}
"""


def oracle_sql() -> dict[str, str]:
    exact_terms = "SELECT unnest(['spark','join','merge']) AS term, 1.0 AS weight"
    sql = {}

    sql["postings"] = f"WITH {_POSTINGS} SELECT term, doc_id, tf FROM postings"

    sql["doc_stats"] = r"""
SELECT doc_id,
       length(list_distinct(regexp_split_to_array(text,
           '[\n\r\p{Z}\p{P}]+')))::INT AS field_len
FROM documents"""

    sql["term_stats"] = f"""
WITH {_POSTINGS}
SELECT term, count(*)::INT AS df, sum(tf)::BIGINT AS cf
FROM postings GROUP BY term"""

    sql["bm25_topk"] = _bm25_sql(
        exact_terms, quality="count(DISTINCT term)", limit="LIMIT 10")

    # WAND is pruned-but-exact: same oracle as the unpruned top-k
    sql["wand_topk"] = sql["bm25_topk"]

    # conjunctive WAND: exact AND semantics, top-10 (round 3)
    sql["wand_and_topk"] = _bm25_sql(
        "SELECT unnest(['spark','join']) AS term, 1.0 AS weight",
        having="HAVING count(DISTINCT term) = 2",
        quality="count(DISTINCT term)", limit="LIMIT 10")

    # batched multi-query: per-query BM25 with query_id threaded through
    # the df window, the doc aggregation, and a per-query top-10 QUALIFY —
    # the DuckDB mirror of plans/batch.py's single-aggregation fold
    sql["bm25_topk_batch"] = f"""
WITH {_POSTINGS}{_STATS},
q AS (
  SELECT * FROM (VALUES
    (0, 'spark', 1.0), (0, 'join', 1.0), (0, 'merge', 1.0),
    (1, 'data', 1.0), (1, 'system', 1.0), (1, 'query', 1.0),
    (2, 'merge', 1.0), (2, 'spark', 1.0)) AS t(query_id, term, weight)
),
matched AS (
  SELECT q.query_id, p.term, q.weight, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY q.query_id, p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.query_id, m.doc_id, m.term,
         m.weight * ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
),
agg AS (
  SELECT query_id, doc_id, sum(s) AS raw, count(DISTINCT term) AS quality
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, round(raw * quality, 6) AS score
FROM agg
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY raw * quality DESC, doc_id) <= 10
ORDER BY query_id, raw * quality DESC, doc_id
"""

    # AND combinator, full match set (round 5, VERDICT r04 #8: the exact
    # AND plan's correctness previously rode only on pytest + the
    # WAND-equality fuzz)
    sql["bm25_and"] = _bm25_sql(
        "SELECT unnest(['spark','join']) AS term, 1.0 AS weight",
        having="HAVING count(DISTINCT term) = 2",
        quality="count(DISTINCT term)")

    sql["bm25_and_not"] = f"""
WITH {_POSTINGS}{_STATS},
q AS (SELECT 'spark' AS term, 1.0 AS weight),
matched AS (
  SELECT p.term, q.weight, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id,
         m.weight * ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
)
SELECT doc_id, round(sum(s), 6) AS score
FROM scored
WHERE doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'join')
GROUP BY doc_id"""

    # AND_NOT WAND: pruned-but-exact → same scoring, top-10 (round 3)
    sql["wand_and_not_topk"] = sql["bm25_and_not"] + """
ORDER BY sum(s) DESC, doc_id
LIMIT 10"""

    # query tree OR( AND(spark, join), merge ): per-branch combinators,
    # quality = distinct matched query terms across surviving branches
    sql["bm25_query_tree"] = f"""
WITH {_POSTINGS}{_STATS},
q AS (SELECT unnest(['spark','join','merge']) AS term),
matched AS (
  SELECT p.term, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id, m.term,
         ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN term = 'spark' THEN s END) AS s_spark,
         sum(CASE WHEN term = 'join' THEN s END) AS s_join,
         sum(CASE WHEN term = 'merge' THEN s END) AS s_merge
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       round(((CASE WHEN s_spark IS NOT NULL AND s_join IS NOT NULL
                    THEN s_spark + s_join ELSE 0 END)
              + coalesce(s_merge, 0))
             * ((CASE WHEN s_spark IS NOT NULL AND s_join IS NOT NULL
                      THEN 2 ELSE 0 END)
                + (CASE WHEN s_merge IS NOT NULL THEN 1 ELSE 0 END)),
             6) AS score
FROM agg
WHERE (s_spark IS NOT NULL AND s_join IS NOT NULL) OR s_merge IS NOT NULL"""

    # multi-field: per-(term, field) df, per-field stats, boost source x2
    sql["bm25_multifield"] = r"""
WITH tok AS (
  SELECT doc_id, 0 AS field_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{Z}\p{P}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM documents
  UNION ALL
  SELECT doc_id, 1 AS field_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(source, '[\n\r\p{Z}\p{P}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM documents
),
postings AS (
  SELECT term, field_id, doc_id, count(*)::INT AS tf
  FROM tok GROUP BY 1, 2, 3
),
dstat AS (
  SELECT doc_id, 0 AS field_id,
         length(list_distinct(regexp_split_to_array(text,
             '[\n\r\p{Z}\p{P}]+')))::INT AS field_len
  FROM documents
  UNION ALL
  SELECT doc_id, 1 AS field_id,
         length(list_distinct(regexp_split_to_array(source,
             '[\n\r\p{Z}\p{P}]+')))::INT AS field_len
  FROM documents
),
cstat AS (
  SELECT field_id, avg(field_len) AS avg_len FROM dstat GROUP BY field_id
),
nn AS (SELECT count(*) AS n FROM documents),
q AS (SELECT unnest(['spark','src3']) AS term),
matched AS (
  SELECT p.term, p.field_id, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term, p.field_id) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id, m.term,
         (CASE m.field_id WHEN 1 THEN 2.0 ELSE 1.0 END)
           * ln(1 + (nn.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / c.avg_len)))
           AS s
  FROM matched m
  JOIN dstat d USING (doc_id, field_id)
  JOIN cstat c USING (field_id)
  CROSS JOIN nn
)
SELECT doc_id, round(sum(s) * count(DISTINCT term), 6) AS score
FROM scored GROUP BY doc_id"""

    # multi-field WAND: pruned-but-exact → same scoring, top-10 (round 3)
    sql["wand_topk_multifield"] = sql["bm25_multifield"] + """
ORDER BY sum(s) * count(DISTINCT term) DESC, doc_id
LIMIT 10"""

    # prefix: derived terms LIKE 's%', weight 0.375·len/(len+0.3·(len-1))
    prefix_terms = r"""
  SELECT term,
         CASE WHEN term = 's' THEN 1.0
              ELSE 0.375 * length(term) /
                   (length(term) + 0.3 * (length(term) - 1)) END AS weight
  FROM (SELECT DISTINCT term FROM postings) WHERE term LIKE 's%'"""
    sql["prefix_search"] = _bm25_sql(prefix_terms, quality="1")

    # combined prefix+fuzzy: prefix matches win (scored once, as prefix);
    # fuzzy adds only non-prefix terms within distance 1, distance > 0
    combined_terms = r"""
  SELECT term,
         CASE WHEN term = 'spak' THEN 1.0
              WHEN term LIKE 'spak%' THEN
                   0.375 * length(term) /
                   (length(term) + 0.3 * (length(term) - 4))
              ELSE 0.45 * length(term) /
                   (length(term) + levenshtein(term, 'spak')) END AS weight
  FROM (SELECT DISTINCT term FROM postings)
  WHERE term LIKE 'spak%' OR levenshtein(term, 'spak') <= 1"""
    sql["combined_search"] = _bm25_sql(combined_terms, quality="1")

    # combined prefix+fuzzy on 'ma' (DF expansion path — same semantics as
    # the broadcast path: prefix wins, fuzzy adds non-prefix distance-1)
    wide_terms = r"""
  SELECT term,
         CASE WHEN term = 'ma' THEN 1.0
              WHEN term LIKE 'ma%' THEN
                   0.375 * length(term) /
                   (length(term) + 0.3 * (length(term) - 2))
              ELSE 0.45 * length(term) /
                   (length(term) + levenshtein(term, 'ma')) END AS weight
  FROM (SELECT DISTINCT term FROM postings)
  WHERE term LIKE 'ma%' OR levenshtein(term, 'ma') <= 1"""
    sql["prefix_search_wide"] = _bm25_sql(wide_terms, quality="1")

    # Column boostDocument: en ×2, de dropped (falsy ⇒ skip), others ×1
    sql["search_doc_boosted"] = f"""
WITH {_POSTINGS}{_STATS},
q AS (SELECT 'merge' AS term, 1.0 AS weight),
matched AS (
  SELECT p.term, q.weight, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id,
         ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
)
SELECT s.doc_id,
       round(sum(s.s) * (CASE WHEN dd.lang = 'en' THEN 2.0 ELSE 1.0 END),
             6) AS score
FROM scored s JOIN documents dd ON s.doc_id = dd.doc_id
WHERE dd.lang <> 'de'
GROUP BY s.doc_id, dd.lang"""

    sql["term_boosted"] = _bm25_sql(
        "SELECT 'spark' AS term, 2.0 AS weight "
        "UNION ALL SELECT 'join', 1.0",
        quality="count(DISTINCT term)")

    fuzzy_terms = r"""
  SELECT term,
         CASE WHEN term = 'spak' THEN 1.0
              ELSE 0.45 * length(term) /
                   (length(term) + levenshtein(term, 'spak')) END AS weight
  FROM (SELECT DISTINCT term FROM postings)
  WHERE levenshtein(term, 'spak') <= 1"""
    sql["fuzzy_search"] = _bm25_sql(fuzzy_terms, quality="1")

    sql["wildcard"] = "SELECT doc_id, 1.0::DOUBLE AS score FROM documents"

    sql["search_filtered"] = f"""
WITH {_POSTINGS}{_STATS},
q AS (SELECT 'merge' AS term, 1.0 AS weight),
matched AS (
  SELECT p.term, q.weight, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id,
         ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
)
SELECT s.doc_id, round(sum(s.s), 6) AS score
FROM scored s JOIN documents dd ON s.doc_id = dd.doc_id
WHERE dd.lang = 'en'
GROUP BY s.doc_id"""

    sql["autosuggest_fuzzy"] = f"""
WITH {_POSTINGS}{_STATS},
cand AS (
  SELECT term,
         CASE WHEN term = 'spak' THEN 1.0
              WHEN term LIKE 'spak%' THEN
                   0.375 * length(term) /
                   (length(term) + 0.3 * (length(term) - 4))
              ELSE 0.45 * length(term) /
                   (length(term) + levenshtein(term, 'spak')) END AS weight,
         CASE WHEN term = 'spak' THEN 0
              WHEN term LIKE 'spak%' THEN 1 ELSE 2 END AS cls
  FROM (SELECT DISTINCT term FROM postings)
  WHERE term LIKE 'spak%' OR levenshtein(term, 'spak') <= 1
),
q AS (
  SELECT term, weight,
         row_number() OVER (ORDER BY cls, term) - 1 AS rnk
  FROM cand
),
matched AS (
  SELECT p.term, q.weight, q.rnk, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id, m.term, m.rnk,
         m.weight * ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
),
per_doc AS (
  SELECT doc_id, string_agg(term, ' ' ORDER BY rnk) AS suggestion,
         sum(s) AS score
  FROM scored GROUP BY doc_id
)
SELECT suggestion, round(avg(score), 6) AS score
FROM per_doc GROUP BY suggestion"""

    # index-level fuzzy default: identical expansion to autosuggest_fuzzy —
    # the Spark side gets fuzzy from IndexConfig.auto_suggest_options, so a
    # non-empty result proves the defaults reached the engine ('spak' is
    # not a corpus term)
    sql["autosuggest_custom_defaults"] = sql["autosuggest_fuzzy"]

    # custom extract_field: the indexed text is computed from the whole doc
    # (text + ' lang<lang>'), so the lang tokens join the postings
    sql["custom_extract_field"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text || ' lang' || lang,
                                   '[\n\r\p{Z}\p{P}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM documents
),
postings AS (
  SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2
),
dstat AS (
  SELECT doc_id,
         length(list_distinct(regexp_split_to_array(text || ' lang' || lang,
             '[\n\r\p{Z}\p{P}]+')))::INT AS field_len
  FROM documents
),
cstat AS (SELECT avg(field_len) AS avg_len, count(*) AS n FROM dstat),
q AS (SELECT unnest(['langen','merge']) AS term),
matched AS (
  SELECT p.term, p.doc_id, p.tf,
         count(*) OVER (PARTITION BY p.term) AS df
  FROM postings p JOIN q USING (term)
),
scored AS (
  SELECT m.doc_id, m.term,
         ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
)
SELECT doc_id, round(sum(s) * count(DISTINCT term), 6) AS score
FROM scored GROUP BY doc_id"""

    # tombstones: doc_id % 7 == 0 discarded → stats and df over survivors
    sql["search_after_discard"] = f"""
WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
tok AS (
  SELECT doc_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text, '[\\n\\r\\p{{Z}}\\p{{P}}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM live
),
postings AS (SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2),
dstat AS (
  SELECT doc_id,
         length(list_distinct(regexp_split_to_array(text,
             '[\\n\\r\\p{{Z}}\\p{{P}}]+')))::INT AS field_len
  FROM live
),
cstat AS (SELECT avg(field_len) AS avg_len, count(*) AS n FROM dstat),
matched AS (
  SELECT p.doc_id, p.tf, count(*) OVER () AS df
  FROM postings p WHERE p.term = 'spark'
)
SELECT m.doc_id,
       round(ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
         * (0.5 + (m.tf * 2.2) /
            (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len))), 6)
         AS score
FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat"""

    # vacuum == discard for scoring: same oracle as search_after_discard
    sql["search_after_vacuum"] = sql["search_after_discard"]

    # WAND over the unvacuumed tombstoned index: pruned-but-exact top-10
    # of the same live view (order by the unrounded score, ties by doc_id)
    sql["wand_topk_discarded"] = f"""
WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
tok AS (
  SELECT doc_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text, '[\\n\\r\\p{{Z}}\\p{{P}}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM live
),
postings AS (SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2),
dstat AS (
  SELECT doc_id,
         length(list_distinct(regexp_split_to_array(text,
             '[\\n\\r\\p{{Z}}\\p{{P}}]+')))::INT AS field_len
  FROM live
),
cstat AS (SELECT avg(field_len) AS avg_len, count(*) AS n FROM dstat),
matched AS (
  SELECT p.doc_id, p.tf, count(*) OVER () AS df
  FROM postings p WHERE p.term = 'spark'
),
scored AS (
  SELECT m.doc_id,
         ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
           * (0.5 + (m.tf * 2.2) /
              (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len)))
           AS s
  FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat
)
SELECT doc_id, round(s, 6) AS score
FROM scored
ORDER BY s DESC, doc_id
LIMIT 10"""

    # incremental build must equal a one-shot build over the full corpus
    sql["incremental_add"] = _bm25_sql(
        "SELECT 'merge' AS term, 1.0 AS weight", quality="1")

    sql["search_after_remove"] = f"""
WITH live AS (SELECT * FROM documents WHERE doc_id % 13 <> 0),
tok AS (
  SELECT doc_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text, '[\\n\\r\\p{{Z}}\\p{{P}}]+'),
             x -> lower(x)), x -> x <> '')) AS term
  FROM live
),
postings AS (SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2),
dstat AS (
  SELECT doc_id,
         length(list_distinct(regexp_split_to_array(text,
             '[\\n\\r\\p{{Z}}\\p{{P}}]+')))::INT AS field_len
  FROM live
),
cstat AS (SELECT avg(field_len) AS avg_len, count(*) AS n FROM dstat),
matched AS (
  SELECT p.doc_id, p.tf, count(*) OVER () AS df
  FROM postings p WHERE p.term = 'merge'
)
SELECT m.doc_id,
       round(ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
         * (0.5 + (m.tf * 2.2) /
            (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len))), 6)
         AS score
FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat"""

    # consolidated maintenance entry: lazy discard ∪ eager remove, tagged
    sql["search_after_maintenance"] = f"""
SELECT 'discard' AS op, * FROM ({sql.pop("search_after_discard")})
UNION ALL
SELECT 'remove' AS op, * FROM ({sql.pop("search_after_remove")})"""

    # custom processTerm (join→merge synonym fold) at index AND query time;
    # field_len stays the raw-token count (reference src/add.ts:96)
    sql["custom_process_term"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{Z}\p{P}]+'),
             x -> CASE WHEN lower(x) IN ('merge', 'join') THEN 'merge'
                       ELSE lower(x) END),
             x -> x <> '')) AS term
  FROM documents
),
postings AS (
  SELECT term, doc_id, count(*)::INT AS tf FROM tok GROUP BY 1, 2
),
dstat AS (
  SELECT doc_id,
         length(list_distinct(regexp_split_to_array(text,
             '[\n\r\p{Z}\p{P}]+')))::INT AS field_len
  FROM documents
),
cstat AS (SELECT avg(field_len) AS avg_len, count(*) AS n FROM dstat),
matched AS (
  SELECT p.doc_id, p.tf, count(*) OVER () AS df
  FROM postings p WHERE p.term = 'merge'
)
SELECT m.doc_id,
       round(ln(1 + (cstat.n - m.df + 0.5) / (m.df + 0.5))
         * (0.5 + (m.tf * 2.2) /
            (m.tf + 1.2 * (1 - 0.7 + 0.7 * d.field_len / cstat.avg_len))), 6)
         AS score
FROM matched m JOIN dstat d USING (doc_id) CROSS JOIN cstat"""

    sql["dedup_exact"] = """
SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)"""

    # numeric MinHash (round 2): same 32-bit md5-derived term hash + the
    # same (a,b) universal-hash constants as operators/dedup.py, exact-dup
    # pre-grouping, and the QUALIFY bucket cap mirroring the Spark window
    sig_exprs = ",\n".join(
        f"         min((h32 * {a}::BIGINT + {b}) % {dd.MINHASH_PRIME}) "
        f"AS sig_{j}"
        for j, (a, b) in enumerate(dd.MINHASH_PARAMS[:8]))
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_id, sig_{2 * b}::VARCHAR || '|' || "
        f"sig_{2 * b + 1}::VARCHAR AS band_sig FROM sigs"
        for b in range(4))
    # parameterized on the source relation (round 5): training_corpus
    # runs the identical chain over its scrubbed/gated derived corpus
    def _near_pair_ctes_for(src: str) -> str:
        return rf"""reps AS (
  SELECT min(doc_id) AS doc_id FROM {src} GROUP BY md5(text)
),
live AS (SELECT d.* FROM {src} d JOIN reps USING (doc_id)),
toks AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{{Z}}\p{{P}}]+'),
             x -> lower(x)), x -> x <> '') AS t
  FROM live
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(length(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
  FROM toks
),
tset AS (SELECT DISTINCT doc_id, term FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM tset GROUP BY doc_id),
h AS (
  SELECT doc_id,
         ('0x' || substring(md5(term), 1, 8))::UBIGINT::BIGINT AS h32
  FROM tset
),
sigs AS (
  SELECT doc_id,
{sig_exprs}
  FROM h GROUP BY doc_id
),
bands AS (
{band_rows}
),
capped AS (
  SELECT doc_id, band_id, band_sig FROM bands
  QUALIFY row_number() OVER (PARTITION BY band_id, band_sig
                             ORDER BY doc_id) <= {dd.DEFAULT_MAX_BUCKET}
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM capped l JOIN capped r
    ON l.band_id = r.band_id AND l.band_sig = r.band_sig
   AND l.doc_id < r.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cands c
  JOIN tset ta ON ta.doc_id = c.a
  JOIN tset tb ON tb.doc_id = c.b AND tb.term = ta.term
  GROUP BY c.a, c.b
),
near AS (
  SELECT c.a, c.b,
         round(coalesce(i.i, 0) * 1.0 /
               (sa.sz + sb.sz - coalesce(i.i, 0)), 6) AS jaccard
  FROM cands c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN sizes sa ON sa.doc_id = c.a
  JOIN sizes sb ON sb.doc_id = c.b
  WHERE coalesce(i.i, 0) * 1.0 /
        (sa.sz + sb.sz - coalesce(i.i, 0)) >= 0.5
)"""

    near_pair_ctes = _near_pair_ctes_for("documents")
    sql["near_dup_minhash"] = (
        f"WITH {near_pair_ctes}\nSELECT a, b, jaccard FROM near")

    # full duplicate clusters (round 4): connected components of the
    # exact-dup relation ∪ the near-dup pair graph, labeled by component
    # min — the oracle for the distributed min-label-propagation operator
    # (dedup.cluster_pairs). The recursive walk propagates every label
    # along symmetric edges; min per vertex = component min.
    sql["dedup_clusters"] = f"""WITH RECURSIVE {near_pair_ctes},
exact_map AS (
  SELECT d.doc_id AS u, r.rep AS v
  FROM documents d
  JOIN (SELECT md5(text) AS m, min(doc_id) AS rep
        FROM documents GROUP BY md5(text)) r ON md5(d.text) = r.m
),
edges AS (
  SELECT u, v FROM exact_map
  UNION SELECT v, u FROM exact_map
  UNION SELECT a AS u, b AS v FROM near
  UNION SELECT b AS u, a AS v FROM near
),
walk(u, l) AS (
  SELECT DISTINCT u, u AS l FROM edges
  UNION
  SELECT e.v AS u, w.l FROM walk w JOIN edges e ON e.u = w.u
)
SELECT u AS doc_id, min(l) AS cluster_id FROM walk GROUP BY u"""

    # direct n-gram Jaccard (round 4): same shingle/verify CTEs as the
    # MinHash oracle, but candidates come from a rare-shingle (df ≤ cap)
    # inverted-index self-join instead of LSH banding
    sql["ngram_jaccard"] = rf"""
WITH reps AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
live AS (SELECT d.* FROM documents d JOIN reps USING (doc_id)),
toks AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{{Z}}\p{{P}}]+'),
             x -> lower(x)), x -> x <> '') AS t
  FROM live
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(length(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
  FROM toks
),
tset AS (SELECT DISTINCT doc_id, term FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM tset GROUP BY doc_id),
rare AS (
  SELECT term FROM tset GROUP BY term
  HAVING count(*) <= {dd.DEFAULT_MAX_SHINGLE_DF}
),
rt AS (SELECT t.doc_id, t.term FROM tset t JOIN rare USING (term)),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM rt l JOIN rt r
    ON l.term = r.term AND l.doc_id < r.doc_id
),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cands c
  JOIN tset ta ON ta.doc_id = c.a
  JOIN tset tb ON tb.doc_id = c.b AND tb.term = ta.term
  GROUP BY c.a, c.b
)
SELECT c.a, c.b,
       round(coalesce(i.i, 0) * 1.0 /
             (sa.sz + sb.sz - coalesce(i.i, 0)), 6) AS jaccard
FROM cands c
LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
JOIN sizes sa ON sa.doc_id = c.a
JOIN sizes sb ON sb.doc_id = c.b
WHERE coalesce(i.i, 0) * 1.0 / (sa.sz + sb.sz - coalesce(i.i, 0)) >= 0.5"""

    # benchmark decontamination: eval set = doc_id % 37 == 0, overlap on
    # distinct token 3-grams (same shingle CTEs as ngram_jaccard)
    sql["decontaminate"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{Z}\p{P}]+'),
             x -> lower(x)), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(length(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
  FROM toks
),
tset AS (SELECT DISTINCT doc_id, term FROM sh),
bench AS (SELECT DISTINCT term FROM tset WHERE doc_id % 37 = 0),
corp AS (SELECT * FROM tset WHERE doc_id % 37 <> 0),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM corp c JOIN bench b USING (term) GROUP BY c.doc_id
)
SELECT h.doc_id, h.n_hits, s.n_shingles,
       round(h.n_hits * 1.0 / s.n_shingles, 6) AS hit_frac
FROM hits h JOIN sizes s USING (doc_id)"""

    # PII scrub: injected email/IPv4/phone per doc; counts on raw text,
    # md5 of the redacted text gates the full scrub. RE2 and Java regex
    # agree on these alternation-free patterns (tests/test_decontam_pii.py
    # additionally pins them to Python re)
    from slimsearch_spark.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE
    pii_text = ("text || ' contact user' || doc_id::VARCHAR || "
                "'@example.com from 10.1.' || (doc_id % 256)::VARCHAR || "
                "'.7 tel +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')")
    sql["pii_scrub"] = f"""
WITH d AS (SELECT doc_id, {pii_text} AS text FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}'))::INT AS n_email,
       len(regexp_extract_all(text, '{IPV4_RE}'))::INT AS n_ipv4,
       len(regexp_extract_all(text, '{PHONE_RE}'))::INT AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g')) AS scrub_md5
FROM d"""

    # the COMPOSED training-data pipeline (round 5, VERDICT r04 #1):
    # scrub (both sides) → decontaminate → quality gate → duplicate
    # -cluster survivors → portable-hash 0.8 sample → window-cumsum
    # packing. Every CTE is the per-stage oracle already gated above,
    # rebased onto the derived corpus; the dedup chain is the identical
    # _near_pair_ctes_for template over d3.
    def _scrub(col: str) -> str:
        return (f"regexp_replace(regexp_replace(regexp_replace({col}, "
                f"'{EMAIL_RE}', '<EMAIL>', 'g'), "
                f"'{IPV4_RE}', '<IP>', 'g'), "
                f"'{PHONE_RE}', '<PHONE>', 'g')")

    _TOKS_OF = (r"list_filter(list_transform("
                r"regexp_split_to_array(text, '[\n\r\p{Z}\p{P}]+'), "
                r"x -> lower(x)), x -> x <> '')")
    sql["training_corpus"] = rf"""
WITH RECURSIVE
raw AS (
  SELECT doc_id, {pii_text} AS text
  FROM documents WHERE doc_id % 37 <> 0
),
scrubbed AS (SELECT doc_id, {_scrub('text')} AS text FROM raw),
bench AS (
  SELECT doc_id, {_scrub('text')} AS text
  FROM documents WHERE doc_id % 37 = 0
),
ctoks AS (SELECT doc_id, {_TOKS_OF} AS t FROM scrubbed),
csh AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(length(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
  FROM ctoks
),
ctset AS (SELECT DISTINCT doc_id, term FROM csh),
btoks AS (SELECT doc_id, {_TOKS_OF} AS t FROM bench),
bsh AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(length(t) - 2, 0) + 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS term
  FROM btoks
),
bterm AS (SELECT DISTINCT term FROM bsh),
contaminated AS (
  SELECT DISTINCT doc_id FROM ctset JOIN bterm USING (term)
),
quality AS (
  SELECT doc_id, length(t)::INT AS n_tokens,
         round(length(list_distinct(t)) * 1.0 /
               greatest(length(t), 1), 6) AS ttr
  FROM ctoks
),
d3 AS (
  SELECT s.doc_id, s.text, q.n_tokens
  FROM scrubbed s JOIN quality q USING (doc_id)
  WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND q.n_tokens >= 10 AND q.n_tokens <= 100000 AND q.ttr > 0.1
),
{_near_pair_ctes_for('d3')},
exact_map AS (
  SELECT d.doc_id AS u, r.rep AS v
  FROM d3 d
  JOIN (SELECT md5(text) AS m, min(doc_id) AS rep
        FROM d3 GROUP BY md5(text)) r ON md5(d.text) = r.m
),
edges AS (
  SELECT u, v FROM exact_map
  UNION SELECT v, u FROM exact_map
  UNION SELECT a AS u, b AS v FROM near
  UNION SELECT b AS u, a AS v FROM near
),
walk(u, l) AS (
  SELECT DISTINCT u, u AS l FROM edges
  UNION
  SELECT e.v AS u, w.l FROM walk w JOIN edges e ON e.u = w.u
),
labels AS (SELECT u AS doc_id, min(l) AS cluster_id FROM walk GROUP BY u),
survivors AS (
  SELECT d3.* FROM d3 JOIN labels USING (doc_id)
  WHERE labels.cluster_id = d3.doc_id
),
sampled AS (
  SELECT * FROM survivors
  WHERE ('0x' || substring(md5(concat_ws(chr(31), doc_id, '42')), 1, 8))
        ::UBIGINT::BIGINT / 4294967296.0 < 0.8
)
SELECT doc_id, md5(text) AS text_md5, n_tokens, 0::INT AS pack_bucket,
       ((sum(n_tokens::BIGINT) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING)
         - n_tokens) // 2000)::INT AS shard_id
FROM sampled"""

    # 64-bit simhash: tf-weighted bits over two 32-bit md5 halves (the
    # 16-bit variant stays pytest-covered in tests/test_dedup_ops.py; its
    # driver entry was consolidated into this one, round-3 VERDICT #2)
    sim_bit_sums = ",\n".join(
        f"  sum(CASE WHEN (h_{half} >> {i}) & 1 = 1 THEN tf ELSE -tf END) "
        f"AS s_{half}_{i}"
        for half in ("lo", "hi") for i in range(32))
    sim_packs = {
        half: " + ".join(f"(CASE WHEN s_{half}_{i} > 0 THEN {1 << i} "
                         f"ELSE 0 END)" for i in range(32))
        for half in ("lo", "hi")}
    _SIM64 = f"""
tf64 AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf,
         ('0x' || substring(md5(term), 1, 8))::UBIGINT::BIGINT AS h_lo,
         ('0x' || substring(md5(term), 9, 8))::UBIGINT::BIGINT AS h_hi
  FROM tok GROUP BY doc_id, term
),
bits64 AS (
  SELECT doc_id,
{sim_bit_sums}
  FROM tf64 GROUP BY doc_id
),
sims64 AS (
  SELECT doc_id, ({sim_packs['hi']})::BIGINT AS sim_hi,
         ({sim_packs['lo']})::BIGINT AS sim_lo
  FROM bits64
)"""
    sql["simhash64"] = f"WITH {_TOK},{_SIM64} " \
        "SELECT doc_id, sim_hi, sim_lo FROM sims64"

    # Hamming-banded near-dup: 4 × 16-bit bands over (hi, lo), verify ≤ 3
    band_defs = [
        ("(sim_lo >> 0) & 65535", 0), ("(sim_lo >> 16) & 65535", 1),
        ("(sim_hi >> 0) & 65535", 2), ("(sim_hi >> 16) & 65535", 3)]
    band_union = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, sim_hi, sim_lo, {bid} AS band_id, "
        f"{expr} AS band_val FROM sims64"
        for expr, bid in band_defs)
    sql["simhash_near_dup"] = f"""
WITH {_TOK},{_SIM64},
bands AS (
{band_union}
),
capped AS (
  SELECT * FROM bands
  QUALIFY row_number() OVER (PARTITION BY band_id, band_val
                             ORDER BY doc_id) <= {dd.DEFAULT_MAX_BUCKET}
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       (bit_count(xor(l.sim_hi, r.sim_hi))
        + bit_count(xor(l.sim_lo, r.sim_lo)))::INT AS hamming
FROM capped l JOIN capped r
  ON l.band_id = r.band_id AND l.band_val = r.band_val
 AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.sim_hi, r.sim_hi))
      + bit_count(xor(l.sim_lo, r.sim_lo)) <= 3"""

    # consolidated lang_id (round 4): stopword-ratio + char-trigram
    # variants joined on doc_id. Trigram score expressions are the
    # IDENTICAL strings the Spark operator parses (built by the same
    # helper) — structurally identical arithmetic cross-engine.
    stop = "', '".join(ts.EN_STOPWORDS)
    ngram_scores = ts.lang_ngram_score_sql("text")
    ngram_pred = (f"CASE WHEN ({ngram_scores['en']}) >= ({ngram_scores['de']}) "
                  f"AND ({ngram_scores['en']}) >= ({ngram_scores['fr']}) "
                  f"THEN 'en' "
                  f"WHEN ({ngram_scores['de']}) >= ({ngram_scores['fr']}) "
                  f"THEN 'de' ELSE 'fr' END")
    sql["lang_id"] = rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{{Z}}\p{{P}}]+'),
             x -> lower(x)), x -> x <> '') AS terms
  FROM documents
)
SELECT doc_id,
       round(length(list_filter(terms, x -> x IN ('{stop}'))) * 1.0 /
             greatest(length(terms), 1), 6) AS en_ratio,
       CASE WHEN length(list_filter(terms, x -> x IN ('{stop}'))) * 1.0 /
                 greatest(length(terms), 1) > 0.05
            THEN 'en' ELSE 'unknown' END AS stop_lang,
       round({ngram_scores['en']}, 6) AS en_score,
       round({ngram_scores['de']}, 6) AS de_score,
       round({ngram_scores['fr']}, 6) AS fr_score,
       {ngram_pred} AS ngram_lang
FROM t"""

    # quality features + token counts, one joined entry (round-4 slot
    # consolidation; see q_text_quality)
    sql["text_quality"] = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{{Z}}\p{{P}}]+'),
             x -> lower(x)), x -> x <> '') AS terms
  FROM documents
)
SELECT t.doc_id,
       length(terms)::INT AS n_tokens,
       length(list_distinct(terms))::INT AS n_unique,
       round(length(list_distinct(terms)) * 1.0 /
             greatest(length(terms), 1), 6) AS ttr,
       round(list_sum(list_transform(terms, x -> length(x))) * 1.0 /
             greatest(length(terms), 1), 6) AS mean_token_len,
       (length(terms) >= 10 AND length(terms) <= 100000
        AND length(list_distinct(terms)) * 1.0 /
            greatest(length(terms), 1) > 0.1) AS is_quality,
       length(list_filter(regexp_split_to_array(d.text, '\s+'),
                          x -> x <> ''))::INT AS ws_tokens,
       length(regexp_extract_all(lower(d.text),
           '{ts.BPE_ISH_PATTERN}'))::INT AS bpe_ish_tokens
FROM t JOIN documents d ON d.doc_id = t.doc_id"""

    # consolidated per-doc stats entry (round 5): quality ⋈ language-ID
    sql["text_stats"] = f"""
SELECT * FROM ({sql.pop("text_quality")}) q
JOIN ({sql.pop("lang_id")}) l USING (doc_id)"""

    # whole-doc md5 + winnowing rolling-hash digest (round 4); the winnow
    # CTE body comes from the same helper that documents the construction
    sql["fingerprint"] = rf"""
WITH wtoks AS (
  SELECT doc_id,
         coalesce(array_to_string(list_filter(list_transform(
             regexp_split_to_array(text, '[\n\r\p{{Z}}\p{{P}}]+'),
             x -> lower(x)), x -> x <> ''), ' '), '') AS norm
  FROM documents
),
w AS ({ts.winnow_fingerprint_sql()})
SELECT t.doc_id, md5(t.norm) AS fp, w.winnow_fp, w.n_selected
FROM wtoks t JOIN w USING (doc_id)"""

    sql["ann_cosine_topk"] = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], q.qv) /
             (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM embeddings CROSS JOIN q
WHERE vec_id <> 0
ORDER BY list_dot_product(embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
          * sqrt(list_dot_product(q.qv, q.qv))) DESC, vec_id
LIMIT 10"""

    # sign-LSH with the same deterministic hyperplanes (numpy seed 42)
    planes = sim.hyperplanes(64, 8, 42)
    plane_lits = ["[" + ", ".join(repr(x) for x in h) + "]::DOUBLE[]"
                  for h in planes]
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(v, {plane_lits[j]}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(8))
    # multi-probe: same 8 hyperplanes, buckets within Hamming ≤ 2 (the
    # single-bucket variant is its Hamming=0 special case; its driver entry
    # was consolidated into this one, round-3 VERDICT #2 — the operator
    # stays pytest-covered in tests/test_dedup_ops.py)
    sql["ann_lsh_multiprobe"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM e),
q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
SELECT b.vec_id,
       round(list_dot_product(b.v, q.qv) /
             (sqrt(list_dot_product(b.v, b.v)) *
              sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM b CROSS JOIN q
WHERE bit_count(xor(b.bucket::BIGINT, q.qb::BIGINT)) <= 2 AND b.vec_id <> 0
ORDER BY list_dot_product(b.v, q.qv) /
         (sqrt(list_dot_product(b.v, b.v)) *
          sqrt(list_dot_product(q.qv, q.qv))) DESC, b.vec_id
LIMIT 10"""

    # seeded IVF: centroids = first 16 vectors (pure-SQL join), assignment
    # and probe use the IDENTICAL left-fold squared distance as the Spark
    # expression (verified bit-identical cross-engine)
    fold = ("list_reduce(list_prepend(0.0::DOUBLE, "
            "list_transform(list_zip(e.v, s.cv), "
            "p -> (p[1] - p[2]) * (p[1] - p[2]))), (acc, x) -> acc + x)")
    sql["ann_ivf_topk"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
dist AS (
  SELECT e.vec_id, s.cid, {fold} AS d
  FROM e CROSS JOIN seeds s
),
assign AS (
  SELECT vec_id, cid FROM dist
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
),
qprobe AS (SELECT cid FROM dist WHERE vec_id = 0 ORDER BY d, cid LIMIT 2),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_dot_product(e.v, q.qv) /
             (sqrt(list_dot_product(e.v, e.v)) *
              sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
FROM e JOIN assign a USING (vec_id) CROSS JOIN q
WHERE a.cid IN (SELECT cid FROM qprobe) AND e.vec_id <> 0
ORDER BY list_dot_product(e.v, q.qv) /
         (sqrt(list_dot_product(e.v, e.v)) *
          sqrt(list_dot_product(q.qv, q.qv))) DESC, e.vec_id
LIMIT 10"""

    # consolidated entry: live assignment ∪ saved partition-pruned layout,
    # tagged — both must equal the same oracle top-10
    sql["ann_ivf_topk"] = f"""
SELECT 'live' AS path, * FROM ({sql["ann_ivf_topk"]})
UNION ALL
SELECT 'saved' AS path, * FROM ({sql["ann_ivf_topk"]})"""

    # embedding near-dup: 16 deterministic hyperplanes, 4 bands of 4 bits,
    # QUALIFY bucket cap, exact-cosine verify ≥ 0.4 on banded candidates
    planes16 = sim.hyperplanes(64, 16, 42)
    plane16_lits = ["[" + ", ".join(repr(x) for x in h) + "]::DOUBLE[]"
                    for h in planes16]
    bucket16 = " + ".join(
        f"(CASE WHEN list_dot_product(v, {plane16_lits[j]}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(16))
    band16 = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, v, {b} AS band_id, "
        f"(bucket >> {b * 4}) & 15 AS band_val FROM eb"
        for b in range(4))
    sql["embedding_near_dup"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
eb AS (SELECT vec_id, v, {bucket16} AS bucket FROM e),
bands AS (
{band16}
),
capped AS (
  SELECT * FROM bands
  QUALIFY row_number() OVER (PARTITION BY band_id, band_val
                             ORDER BY vec_id) <= 1024
)
SELECT DISTINCT l.vec_id AS a, r.vec_id AS b,
       round(list_dot_product(l.v, r.v) /
             (sqrt(list_dot_product(l.v, l.v)) *
              sqrt(list_dot_product(r.v, r.v))), 6) AS cosine
FROM capped l JOIN capped r
  ON l.band_id = r.band_id AND l.band_val = r.band_val
 AND l.vec_id < r.vec_id
WHERE round(list_dot_product(l.v, r.v) /
            (sqrt(list_dot_product(l.v, l.v)) *
             sqrt(list_dot_product(r.v, r.v))), 6) >= 0.4"""

    sql["events_windowed"] = """
SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
       event_type, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""

    sql["sessionize"] = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events
),
tagged AS (
  SELECT *,
         CASE WHEN lag(ms) OVER w IS NULL
                   OR ms - lag(ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
),
sess AS (
  SELECT *,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
                            ROWS UNBOUNDED PRECEDING) - 1)::INT AS session_id
  FROM tagged
)
SELECT user_id, session_id,
       min(ms) AS session_start_ms, max(ms) AS session_end_ms,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM sess GROUP BY 1, 2"""

    # consolidated events entry (round 5): window ∪ session, tagged
    sql["events_ops"] = f"""
SELECT 'window' AS op, event_type AS key, NULL::INT AS session_id,
       window_start_ms AS start_ms, NULL::BIGINT AS end_ms,
       n_events, sum_value
FROM ({sql.pop("events_windowed")})
UNION ALL
SELECT 'session' AS op, user_id::VARCHAR AS key, session_id,
       session_start_ms AS start_ms, session_end_ms AS end_ms,
       n_events, sum_value
FROM ({sql.pop("sessionize")})"""

    # sharded merge + absorb must be invisible: full-corpus BM25 oracle
    sql["index_merge"] = sql["bm25_topk"]

    sql["media_features"] = """
SELECT doc_id AS media_id,
       octet_length(encode(text))::INT AS n_bytes,
       round(list_avg(list_transform(string_split_regex(text, ''),
                                     x -> ascii(x))), 6) AS byte_mean
FROM documents"""

    # resize fake = cyclic byte tiling (np.resize) — ASCII corpus makes
    # byte slices equal char slices, so repeat+substring reproduces it
    sql["image_resize"] = """
SELECT doc_id AS media_id, 64 AS width, 64 AS height,
       md5(substring(repeat(text, (4096 // greatest(length(text), 1))::INT
                                  + 1), 1, 4096)) AS payload_md5
FROM documents"""

    # fixed-rate pseudo-frames: every 4th 256-byte slice with timestamps
    sql["frame_samples"] = """
WITH t AS (
  SELECT doc_id, text, octet_length(encode(text))::INT AS n FROM documents
),
x AS (
  SELECT doc_id, text, n,
         unnest(range(greatest((n + 63) // 64, 1))) AS i
  FROM t
)
SELECT doc_id AS media_id, i::INT AS frame_idx, (i * 40)::INT AS ts_ms,
       md5(substring(text, (i * 64 + 1)::INT, 64)) AS frame_md5,
       least(64, n - i * 64)::INT AS n_bytes
FROM x WHERE i % 2 = 0"""

    sql["sha256_invariant"] = \
        "SELECT doc_id, sha256(text) AS sha256 FROM documents"

    return sql
