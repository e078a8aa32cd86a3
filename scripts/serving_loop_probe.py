"""Continuous-ingest serving-loop probe (round-5, round-4 VERDICT #6).

Composes the full production ingest→serve story as ONE loop over B
batches against an n_files base corpus:

  1. ``ingest_batch_dedup`` (persistent md5+band state store, epoch
     partitions) — exact + near dedup of the batch vs the corpus so far,
     survivors appended to the corpus parquet;
  2. ``add_all`` — survivors appended to the serving index as an
     encoded SEGMENT (O(batch), no re-encode);
  3. ``save_index_delta`` — the segment persisted as an O(batch) delta;
  4. ``load_index`` + ``search_topk_wand`` — a cold reader loads the
     delta-layered index and serves top-10.

The claims under test: per-batch cost of every stage stays FLAT as the
corpus grows (work is O(batch), not O(corpus)), and after all batches
the cold-loaded delta-layered index returns the SAME top-10
(id_field + score) as an index rebuilt from scratch over the final
corpus — continuous ingest never drifts from the batch rebuild.

Batch composition: ~70% novel docs, ~15% exact duplicates of already
-ingested content (re-keyed paths), ~15% near-duplicates (content +
mutation suffix) — the dedup stages must actually fire every batch.

Isolation note (found by this probe's first run): every write to the
corpus path makes Spark refresh cached plans that READ that path, so a
serving index whose lineage points at the mutable ingest-append corpus
silently recomputes over the grown file listing — its doc set drifts
mid-loop (here: ``add_all`` saw the batch it was about to add as
already-live and raised). The index therefore consumes IMMUTABLE
inputs only: the base corpus from a one-time snapshot dir, each
batch's survivors from a per-batch side copy — the same discipline a
production deployment needs (index builders read snapshots/epoch
partitions, never the live append target).

Usage: python scripts/serving_loop_probe.py [n_files] [batch] [n_batches]
Prints one JSON line; appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tpf = 30
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus
    from slimsearch_spark.sources.index_store import (load_index,
                                                      save_index,
                                                      save_index_delta)
    from slimsearch_spark.streaming.ingest import ingest_batch_dedup

    work = tempfile.mkdtemp(prefix="serving_loop_")
    corpus_path = f"{work}/corpus"
    store_path = f"{work}/dedup_store"
    index_path = f"{work}/index"
    queries = ["varint delta merge", "bitmap roaring scan", "hash join"]

    # ---- base: corpus parquet (epoch layout), serving index, full save.
    # The index and the dup-source draws read the IMMUTABLE snapshot dir,
    # never corpus_path (see isolation note above).
    snap_path = f"{work}/base_snapshot"
    (synth_corpus(spark, n_files, tokens_per_file=tpf, seed=42)
     .withColumn("path", F.concat(F.lit("base/"), F.col("path")))
     .repartition(cores * 2)
     .write.parquet(snap_path))
    base = spark.read.parquet(snap_path).cache()
    base.count()
    (base.withColumn("__batch", F.lit(-1))
     .write.partitionBy("__batch").parquet(corpus_path))

    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"])
    t0 = time.time()
    idx = SparkSearchIndex.build(base, cfg, order_cols=["path"])
    idx.posting_lists().count()  # compact up front: serving state
    build_sec = round(time.time() - t0, 3)
    t0 = time.time()
    save_index(idx, index_path)
    save_sec = round(time.time() - t0, 3)

    # dedup-store bootstrap (one full pass, paid once): an empty batch
    # triggers it without ingesting anything
    empty = spark.createDataFrame([], base.schema)
    t0 = time.time()
    ingest_batch_dedup(empty, corpus_path, text_col="content",
                       id_col="path", threshold=0.5,
                       state_store_path=store_path, batch_id=0)
    bootstrap_sec = round(time.time() - t0, 3)

    # ---- the loop
    per_batch = []
    for b in range(1, n_batches + 1):
        novel = (synth_corpus(spark, int(batch_n * 0.7),
                              tokens_per_file=tpf, seed=1000 + b)
                 .withColumn("path", F.concat(F.lit(f"b{b}/"),
                                              F.col("path"))))
        # duplicate sources: already-ingested base docs, re-keyed
        src = (base.orderBy("path")
               .limit(int(batch_n * 0.3))
               .withColumn("path", F.concat(F.lit(f"b{b}/dup/"),
                                            F.col("path"))))
        half = int(batch_n * 0.15)
        exact_dup = src.limit(half)
        near_dup = (src.subtract(exact_dup)
                    .withColumn("content",
                                F.concat(F.col("content"),
                                         F.lit(f" mutated{b}"))))
        incoming = (novel.unionByName(exact_dup).unionByName(near_dup)
                    .repartition(max(2, cores // 4)).cache())
        n_in = incoming.count()

        t0 = time.time()
        n_kept = ingest_batch_dedup(
            incoming, corpus_path, text_col="content", id_col="path",
            threshold=0.5, state_store_path=store_path, batch_id=b)
        ingest_sec = round(time.time() - t0, 3)

        # side-copy the batch's survivors so the index's lineage stays
        # off the mutable corpus path (O(batch) write, isolation note)
        (spark.read.parquet(corpus_path)
         .where(F.col("__batch") == b).drop("__batch")
         .write.parquet(f"{work}/sv/{b}"))
        survivors = spark.read.parquet(f"{work}/sv/{b}")
        t0 = time.time()
        idx.add_all(survivors, order_cols=["path"])
        append_sec = round(time.time() - t0, 3)

        t0 = time.time()
        save_index_delta(idx, index_path)
        delta_sec = round(time.time() - t0, 3)

        t0 = time.time()
        served = load_index(spark, index_path)
        top = served.search_topk_wand(queries[0], 10).collect()
        serve_sec = round(time.time() - t0, 3)
        assert len(top) == 10
        # release the superseded generation: without this, ten 1M-doc
        # cold loads accumulate ~10 generations of cached tables in one
        # local-mode heap and the loop OOMs at batch ~5 (the finding
        # that motivated SparkSearchIndex.unpersist)
        served.unpersist()
        incoming.unpersist()
        per_batch.append({"batch": b, "incoming": n_in, "kept": n_kept,
                          "ingest_sec": ingest_sec,
                          "append_sec": append_sec,
                          "delta_sec": delta_sec,
                          "cold_load_query_sec": serve_sec})

    # ---- the final cold reader vs a from-scratch rebuild
    served = load_index(spark, index_path)

    def topk(ix, q):
        # map internal doc_id -> external id_field: internal ids differ
        # between the incremental index and the rebuild, paths don't
        top = ix.search_topk_wand(q, 10)
        rows = (top.join(ix.docs.select("doc_id", cfg.id_field), "doc_id")
                .select(cfg.id_field, "score").collect())
        return sorted((r[cfg.id_field], round(r["score"], 6))
                      for r in rows)

    final_corpus = spark.read.parquet(corpus_path).drop("__batch") \
        .repartition(cores * 2).cache()
    n_final = final_corpus.count()
    t0 = time.time()
    rebuilt = SparkSearchIndex.build(final_corpus, cfg,
                                     order_cols=["path"])
    rebuilt.posting_lists().count()
    rebuild_sec = round(time.time() - t0, 3)

    matches = {q: topk(served, q) == topk(rebuilt, q) for q in queries}
    # flatness: compare mean stage cost of the first vs last 3 batches
    def drift(key):
        head = sum(x[key] for x in per_batch[:3]) / 3
        tail = sum(x[key] for x in per_batch[-3:]) / 3
        return round(tail / max(head, 1e-9), 2)

    out = {
        "metric": "serving_loop_probe",
        "n_files": n_files, "batch": batch_n, "n_batches": n_batches,
        "cores": cores, "corpus_final": n_final,
        "base_build_sec": build_sec, "base_save_sec": save_sec,
        "dedup_store_bootstrap_sec": bootstrap_sec,
        "per_batch": per_batch,
        "stage_drift_last3_over_first3": {
            k: drift(k) for k in ("ingest_sec", "append_sec",
                                  "delta_sec", "cold_load_query_sec")},
        "rebuild_sec": rebuild_sec,
        "loop_vs_rebuild_topk_match": matches,
        "all_match": all(matches.values()),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
