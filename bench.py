"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: files_per_sec (index-build throughput, the BASELINE.json
headline) and doc counts for context.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _calibrate() -> float:
    """Burst-credit canary: a fixed single-threaded CPU-bound loop timed
    before Spark starts. On this box identical jobs run 3-4x slower when
    cgroup burst credits are drained (BASELINE.md §bench variance);
    calibration_sec carries the credit state of THIS run so cross-run
    comparisons can be normalized (~0.8 s on a cold-credit core, ~3x that
    when drained)."""
    t0 = time.time()
    x = 0x9E3779B9
    for _ in range(20_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    assert x >= 0
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    calibration_sec = _calibrate()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("slimsearch_spark_bench")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
             .config("spark.sql.adaptive.enabled", "true")
             # keep the heap under 32g: beyond that the JVM loses compressed
             # OOPs and this workload measured ~16x slower (see BASELINE.md)
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex

    timings: dict = {}
    t_total0 = time.time()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # index build (files/sec headline) — materialize postings + stats
    t0 = time.time()
    cfg = IndexConfig(fields=["text"], id_field="doc_id",
                      store_fields=["lang", "source"])
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["doc_id"])
    idx.postings.count()
    idx.doc_stats.count()
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 3)
    E._INDEX_CACHE[("idx", sf_dir)] = idx  # reuse for the query benches

    # secondary fixtures, prebuilt UNTIMED: the multi-field index and the
    # saved IVF layout are one-time constructions — the benched queries
    # should measure the query path, not index builds (index_build above
    # is the build headline)
    cfg2 = IndexConfig(fields=["text", "source"], id_field="doc_id")
    idx2 = SparkSearchIndex.build(docs, cfg2, order_cols=["doc_id"])
    idx2.postings.count()
    idx2.doc_stats.count()
    E._INDEX_CACHE[("idx2", sf_dir)] = idx2
    E.q_ann_ivf_topk_saved(spark, sf_dir)  # writes the saved IVF layout
    # the WAND serving layout (compacted block-max lists) is the index's
    # save-time artifact — compaction is a BUILD cost (one-time, like
    # save_index), so it materializes here untimed and the wand_* entries
    # below measure the pruned QUERY path; same for the segmented +
    # tombstoned fixture behind wand_topk_discarded (cached in the entry)
    idx.posting_lists().count()
    idx2.posting_lists().count()
    E.queries()["wand_topk_discarded"](spark, sf_dir).count()

    bench_queries = [
        "bm25_topk", "wand_topk", "wand_and_topk",
        "wand_and_not_topk", "wand_topk_multifield", "wand_topk_discarded",
        "bm25_topk_batch", "bm25_and_not", "prefix_search",
        "prefix_search_wide",
        "fuzzy_search", "autosuggest_fuzzy", "search_filtered",
        "search_doc_boosted", "custom_process_term",
        "dedup_exact", "near_dup_minhash", "ngram_jaccard", "simhash64",
        "simhash_near_dup", "text_stats", "dedup_clusters",
        "fingerprint", "bm25_and",
        "ann_cosine_topk", "ann_lsh_multiprobe", "embedding_near_dup",
        "events_ops", "media_features",
        "decontaminate", "pii_scrub", "training_corpus",
    ]
    # consolidated-out driver entries still benched via their q_ functions
    # (wand_topk_adaptive = the production adaptive default; the ivf pair
    # benches live and saved separately — the gated entry unions them)
    extra = {"wand_topk_adaptive": E.q_wand_topk_adaptive,
             "ann_ivf_topk": E.q_ann_ivf_topk,
             "ann_ivf_topk_saved": E.q_ann_ivf_topk_saved}
    qs = dict(E.queries(), **extra)
    for name in bench_queries + sorted(extra):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)

    total = time.time() - t_total0

    # BASELINE.json headline metric, second half: "rank-identical BM25
    # top-10 match rate on the slimsearch reference query set". Runs the
    # reference spec's golden queries (search.spec.ts ranking sets, the
    # same set tests/test_spark_parity.py gates) through the Spark engine
    # AND the pure-Python parity oracle; a query matches iff the top-10
    # docID ranking is identical and every BM25 score agrees at rel-tol
    # 1e-9. Computed OUTSIDE the timed section (fidelity, not throughput).
    match_rate, n_ref_queries = _reference_match_rate(spark)

    out = {
        "metric": "slimsearch_spark_e2e",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": int(cpus),
        "n_docs": n_docs,
        "files_per_sec": round(n_docs / build_sec, 1),
        "bm25_match_rate": match_rate,
        "bm25_match_queries": n_ref_queries,
        "calibration_sec": calibration_sec,
    }
    print(json.dumps(out))


def _reference_match_rate(spark) -> tuple:
    """Fraction of the reference query set whose Spark top-10 is
    rank-identical (docIDs + BM25 scores at rel 1e-9) to the parity
    oracle. Corpora and queries are the reference's own test data
    (search.spec.ts:17-36,666-906)."""
    import math

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from fixtures import BOOKS, MOVIES, SONGS
    from pyspark.sql import types as T
    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.oracle import OracleIndex

    def pair(docs, fields, store, id_type):
        cols = list(dict.fromkeys(["id"] + fields + store))
        schema = T.StructType(
            [T.StructField(c, id_type if c == "id" else T.StringType(), True)
             for c in cols] + [T.StructField("_ord", T.IntegerType(), False)])
        rows = [tuple(d.get(c) for c in cols) + (i,)
                for i, d in enumerate(docs)]
        sdf = spark.createDataFrame(rows, schema)
        sidx = SparkSearchIndex.build(
            sdf, IndexConfig(fields=fields, store_fields=store),
            order_cols=["_ord"])
        oidx = OracleIndex(fields=fields, store_fields=store)
        oidx.add_all(docs)
        return sidx, oidx

    suites = [
        (pair(BOOKS, ["title", "text"], ["lang", "category"], T.LongType()), [
            ("vita", {}), ("del", {}),
            ("vita", {"boost": {"title": 2}}),
            ("cammin como sottomarino", {}),
            ("vita cammin", {"combineWith": "AND"}),
            ("vita cammin", {"combineWith": "AND_NOT"}),
            ("camin memory", {"fuzzy": 2}),
            ("comedia", {"fuzzy": 0.6, "maxFuzzy": 3}),
            ("que", {"prefix": True}),
            ("cammino quel", {"fuzzy": 0.25, "prefix": True}),
        ]),
        (pair(MOVIES, ["title", "description"], ["title"], T.StringType()), [
            ("lamb", {"fuzzy": 1, "prefix": True}),
            ("sheep", {"fuzzy": 1, "prefix": True}),
            ("shaun the sheep", {}),
            ("shaun the sheep", {"fuzzy": 1, "prefix": True}),
            ("chirin the sheep", {}),
            ("judah the sheep", {}),
            ("bounding sheep", {"fuzzy": 1}),
        ]),
        (pair(SONGS, ["song", "artist"], ["song"], T.StringType()), [
            ("witch queen", {"fuzzy": 1, "prefix": True}),
            ("queen", {"fuzzy": 1, "prefix": True}),
        ]),
    ]
    matched = total = 0
    for (sidx, oidx), qs in suites:
        for q, opts in qs:
            total += 1
            got = sidx.search(q, **opts)[:10]
            want = oidx.search(q, **opts)[:10]
            ok = ([r["id"] for r in got] == [r["id"] for r in want]
                  and all(math.isclose(g["score"], w["score"], rel_tol=1e-9)
                          for g, w in zip(got, want)))
            matched += ok
    return (round(matched / total, 4) if total else None), total


if __name__ == "__main__":
    main()
