"""Query-throughput probe: batched multi-query scoring vs per-query jobs
(round 4, `plans/batch.py` / `engine.search_many_df`).

The reference answers one in-memory query in microseconds; a distributed
engine pays per-job scheduling + scan + shuffle, so sequential per-query
service wastes nearly all wall clock on overhead. This measures what the
batch path recovers: N queries served by ONE job vs N `search_df` jobs,
same index, result equality checked per query.

Usage: python scripts/batch_query_probe.py [n_files] [tokens_per_file] [n_queries]
Prints one JSON line; appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_POOL = [
    "varint delta merge", "the parse", "spark shuffle partition",
    "token stream engine", "bm25 score field", "index bucket salt",
    "query merge broadcast", "posting codec arrow", "search suggest fuzzy",
    "document weight boost", "vacuum discard batch", "column vector heap",
    "parse tokenizer", "delta skew", "prefix term filter", "engine score",
    "import license return", "the spark merge", "stream partition value",
    "wildcard field document", "shuffle codec", "salt heap vector",
    "suggest boost", "token delta spark", "merge engine column",
    "score posting the", "filter vacuum", "arrow bucket stream",
    "fuzzy weight", "parse index token", "batch broadcast", "term varint",
]


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tpf = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    queries = [QUERY_POOL[i % len(QUERY_POOL)] for i in range(n_q)]

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus

    docs = synth_corpus(spark, n_files, tokens_per_file=tpf)
    docs = docs.repartition(cores * 2).cache()
    docs.count()
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"])
    t0 = time.time()
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    idx.postings.count()
    idx.doc_stats.count()
    build_sec = round(time.time() - t0, 3)

    # sequential: one job per query (what a naive serving loop pays)
    t0 = time.time()
    seq = {}
    for qi, q in enumerate(queries):
        seq[qi] = [(r["doc_id"], round(r["score"], 9)) for r in
                   idx.search_df(q, top_k=10)
                   .select("doc_id", "score").collect()]
    seq_sec = round(time.time() - t0, 3)

    # batched: ONE job for the whole set
    t0 = time.time()
    rows = idx.search_many_df(queries, top_k=10).collect()
    batch_sec = round(time.time() - t0, 3)
    bat = {}
    for r in rows:
        bat.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(r["score"], 9)))

    def tie_groups(rows):
        """[(doc, score)] → {rounded-6 score: frozenset(docs)} — docs with
        EXACTLY tied raw scores can legally permute between plans (the
        sort key is (raw score, doc_id) and ±1-ulp summation-order noise
        flips equal-score neighbors; measured at 1M docs: every diff was
        an adjacent equal-score swap, identical to 12 decimals)."""
        g = {}
        for d, s in rows:
            g.setdefault(round(s, 6), set()).add(d)
        return {k: frozenset(v) for k, v in g.items()}

    equal = all(tie_groups(bat.get(qi, [])) == tie_groups(seq[qi])
                for qi in range(n_q))
    out = {
        "metric": "batch_query_probe",
        "n_files": n_files, "tokens_per_file": tpf,
        "n_queries": n_q, "cores": cores, "build_sec": build_sec,
        "sequential_sec": seq_sec,
        "sequential_per_query": round(seq_sec / n_q, 3),
        "batch_sec": batch_sec,
        "batch_per_query": round(batch_sec / n_q, 3),
        "batch_speedup": round(seq_sec / max(batch_sec, 1e-9), 2),
        "topk_equal": equal,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
