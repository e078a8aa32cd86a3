"""Index persistence + resumable build.

The reference serializes the whole index to one JSON blob
(``toJSON``/``loadJSONIndex``, src/SearchIndex.ts:253-277, src/init.ts:120-148);
our checkpoint/serve unit is a directory of parquet tables plus a JSON
manifest (version, counters, lineage):

    <path>/manifest.json
    <path>/docs/            (doc_id, <ext id>, stored fields)
    <path>/doc_stats/       (doc_id, field_id, field_len)
    <path>/postings/        row postings (query path), bucketed dirs
    <path>/posting_lists/   delta+varint compacted lists (storage path)
    <path>/chunks/          per-chunk checkpoint markers + counters

Resumable build (north rule): the corpus is split into n_chunks by a hash of
the doc key; each chunk's postings land in ``postings/chunk=<c>/`` with a
counters file written after the data (write-then-mark, so a torn chunk is
re-done). Resume skips completed chunks — per-partition lineage + metrics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig, IndexLayout
from ..engine import SparkSearchIndex
from ..operators.build import (assign_doc_ids, build_doc_stats,
                               build_postings, corpus_stats, tokenize_fields)
from ..operators.compact import compact_posting_lists

MANIFEST_VERSION = 2  # matches the reference's serialization version gate


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via Spark's Hadoop FS layer — works
    for file://, hdfs://, s3a://, ... (local os.* calls only work for the
    first)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def _write_json(path: str, obj: dict,
                spark: Optional[SparkSession] = None) -> None:
    """Atomic-ish JSON write: local fast path, Hadoop FS (create + rename)
    for remote index roots."""
    data = json.dumps(obj, indent=1, sort_keys=True)
    if spark is None or "://" not in path:
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)
        return
    fs, hpath = _hadoop_fs(spark, path + ".tmp")
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()
    _, dest = _hadoop_fs(spark, path)
    if fs.exists(dest):
        fs.delete(dest, False)
    fs.rename(hpath, dest)


def _read_json(path: str, spark: Optional[SparkSession] = None) -> dict:
    if spark is None or "://" not in path:
        with open(path) as f:
            return json.load(f)
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        # the remote write is tmp → delete(dest) → rename: a driver death
        # between the last two leaves only the completed .tmp — fall back
        # to it so the index root stays loadable (round-2 ADVICE)
        _, tmp = _hadoop_fs(spark, path + ".tmp")
        if fs.exists(tmp):
            hpath = tmp
    stream = fs.open(hpath)
    try:
        jvm = spark.sparkContext._jvm
        data = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(data)


def _delete_path(spark: SparkSession, path: str) -> None:
    """Recursively delete a directory if it exists — local fast path,
    Hadoop FS for remote index roots. Used to clear state a full save
    compacts away (the persisted tombstone table)."""
    if "://" not in path:
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        return
    fs, hpath = _hadoop_fs(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _json_exists(path: str, spark: Optional[SparkSession] = None) -> bool:
    """Filesystem-agnostic existence probe for a JSON file (incl. the
    torn-write .tmp fallback on remote roots)."""
    if spark is None or "://" not in path:
        return os.path.exists(path)
    fs, hpath = _hadoop_fs(spark, path)
    if fs.exists(hpath):
        return True
    _, tmp = _hadoop_fs(spark, path + ".tmp")
    return bool(fs.exists(tmp))


def save_index(index: SparkSearchIndex, path: str,
               layout: Optional[IndexLayout] = None,
               compact: bool = True) -> dict:
    """Write all index tables + manifest; returns the manifest."""
    if "://" not in path:
        os.makedirs(path, exist_ok=True)
    layout = layout or IndexLayout()
    # save compacts: every table is written through the live (tombstone-
    # filtered) view, so a load never resurrects discarded docs — the
    # parquet directory IS the persisted tombstone state (manifest
    # dirt_count 0 by construction). Round-2 fix: docs/doc_stats were
    # previously written raw, so discarded docs reappeared after load.
    # docs row-store bucketed by external-id hash (round-3 VERDICT #5):
    # point maintenance ops (has / get_stored_fields / discard) filter on
    # the literal bucket of their ids → directory-level PartitionFilters
    # pruning instead of a full row-store scan at 10⁹ docs
    docs_out = (index.live_docs()
                .withColumn("doc_bucket",
                            F.pmod(F.xxhash64(index.config.id_field),
                                   F.lit(layout.n_doc_buckets)).cast("int")))
    (docs_out.repartition("doc_bucket")
     .write.mode("overwrite").partitionBy("doc_bucket")
     .parquet(f"{path}/docs"))
    live_tomb = index._all_tombstones()
    live_stats = index.doc_stats
    if live_tomb is not None:
        live_stats = live_stats.join(live_tomb, "doc_id", "left_anti")
    live_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
    live = index.live_postings()
    # the denormalized field_len (build_postings) stays an IN-MEMORY
    # optimization: a saved layout keeps the normalized row postings so
    # delta appends (which write raw_cols only) can never mix NULL
    # field_lens into older files — loaded indexes score via the
    # doc_stats join, exactly like the df-less loaded term dictionary
    postings_out = (live.drop("field_len")).withColumn(
        "bucket", F.pmod(F.xxhash64("term"),
                         F.lit(layout.n_term_buckets)).cast("int"))
    (postings_out
     .repartition("bucket")
     .sortWithinPartitions("term", "field_id", "doc_id")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{path}/postings"))
    n_postings = live.count()
    # term dictionary: sorted so prefix queries become min/max-prunable
    # range scans (the radix tree's capability, SURVEY.md §2.4 S4)
    (live.select("term", "field_id").distinct()
     .repartitionByRange(max(1, layout.n_term_buckets // 8), "term")
     .sortWithinPartitions("term")
     .write.mode("overwrite").parquet(f"{path}/terms"))
    bytes_compressed = None
    if compact:
        lists = compact_posting_lists(
            live, layout, doc_stats=index.doc_stats,
            avg_field_length=dict(index.avg_field_length))
        # segment=0 partition dir: a full save is always ONE merged
        # segment; save_index_delta appends segment=1,2,... dirs later
        # (O(batch) persistence for the LSM ingest path)
        (lists.withColumn("segment", F.lit(0))
         .write.mode("overwrite").partitionBy("segment")
         .parquet(f"{path}/posting_lists"))
        # a zero-postings index (all-empty documents — legal, the
        # reference round-trips an empty index too) writes no part files
        # under partitionBy, so the read-back can't infer a schema:
        # fall back to 0 instead of crashing the save
        lists_rb = _try_read_parquet(index.spark, f"{path}/posting_lists")
        bytes_compressed = (
            int(lists_rb.agg(F.sum("n_bytes")).collect()[0][0] or 0)
            if lists_rb is not None else 0)
    # a full save compacts tombstones away; a stale tombstones/ dir from
    # earlier delta saves would re-delete live docs on the next load
    _delete_path(index.spark, f"{path}/tombstones")
    manifest = {
        "version": MANIFEST_VERSION,
        "engine": "slimsearch_spark",
        "fields": list(index.config.fields),
        "id_field": index.config.id_field,
        "store_fields": list(index.config.store_fields),
        "tokenizer": index.config.tokenizer,
        "doc_count": index.doc_count,
        "next_id": index.next_id,
        "dirt_count": 0,  # tombstones are compacted away on save
        "avg_field_length": {str(k): v
                             for k, v in index.avg_field_length.items()},
        # docs-with-field counts: the batch-mean denominators, persisted so
        # maintenance ops on a LOADED index skip the lazy doc_stats scan
        "field_doc_count": {str(k): v
                            for k, v in index._field_counts().items()},
        "counters": {
            "postings_emitted": n_postings,
            "bytes_compressed": bytes_compressed,
        },
        # written-table schemas: load_index's fallback when a table dir
        # holds no part files (empty table under partitionBy) and parquet
        # schema inference fails — without these, an index saved with
        # zero live postings (or zero live docs) could never be loaded
        "schemas": {
            "docs": docs_out.schema.json(),
            "doc_stats": live_stats.schema.json(),
            "postings": postings_out.schema.json(),
        },
        "lineage": {"saved_at": time.time(),
                    "n_term_buckets": layout.n_term_buckets,
                    "n_doc_buckets": layout.n_doc_buckets,
                    "block_doc_range": layout.block_doc_range,
                    "n_segments": 1 if compact else 0},
    }
    _write_json(f"{path}/manifest.json", manifest, index.spark)
    return manifest


def save_index_delta(index: SparkSearchIndex, path: str) -> dict:
    """Incremental persistence: append ONLY the docs added since the last
    save — the storage analog of the engine's in-memory segment append
    (round 4). A full ``save_index`` is O(index) per call, which turns a
    10⁹-doc serving index's ingest loop into a full rewrite per batch;
    this writes O(batch): delta rows appended into the same bucketed
    partition layouts (docs/doc_stats/postings), batch-only new terms
    appended to the dictionary (anti-joined against the saved terms so
    expansion never sees duplicates), and the batch's compacted lists
    written as a NEW ``segment=<n>`` partition dir of ``posting_lists/``
    — ``load_index`` then serves the segmented WAND path exactly like an
    in-memory append (per-(term, field) df totals re-aggregated at query
    time).

    Tombstones persist as a delta too (round 4, session 3): discards
    between saves land in ``<path>/tombstones/`` (the full live set,
    overwritten — it only grows between vacuums and is tiny next to the
    index), with ``dirt_count`` recorded in the manifest; ``load_index``
    restores them, so a discard batch on a serving index is O(batch)
    persisted instead of forcing the O(index) vacuum + ``save_index``
    rewrite. A full save still compacts them away (and deletes the dir).

    Preconditions (raise, never corrupt): the path holds a compatible
    manifest; the new docs' ids all continue past the saved ``next_id``
    (the assign path guarantees it; caller-provided interleaved ids need
    a full save); no in-place rewrite happened since the save (vacuum /
    remove of already-saved docs — those mutate tables a delta cannot
    touch, detected via the (doc_count + dirt_count) invariant)."""
    spark = index.spark
    manifest = _read_json(f"{path}/manifest.json", spark)
    if manifest.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"save_index_delta: unsupported version {manifest.get('version')}")
    lineage = manifest.get("lineage", {})
    layout = IndexLayout(
        n_term_buckets=lineage.get("n_term_buckets",
                                   IndexLayout().n_term_buckets),
        n_doc_buckets=lineage.get("n_doc_buckets",
                                  IndexLayout().n_doc_buckets),
        block_doc_range=lineage.get("block_doc_range",
                                    IndexLayout().block_doc_range))
    saved_next = int(manifest["next_id"])
    saved_dirt = int(manifest.get("dirt_count", 0) or 0)
    pred = F.col("doc_id") >= saved_next
    n_delta = index.docs.where(pred).count()
    # discard moves a doc from doc_count to dirt_count, so their sum is
    # invariant under tombstoning and grows only by appended docs; any
    # in-place rewrite since the save (vacuum dropped dead rows the saved
    # tables still hold, remove/removeAll of saved docs) breaks the
    # equality and must go through a full compacting save_index
    expected = ((index.doc_count + index.dirt_count)
                - (int(manifest["doc_count"]) + saved_dirt))
    if n_delta != expected:
        raise ValueError(
            "save_index_delta: delta is not a pure id-range append "
            f"(doc_count + dirt_count grew by {expected} "
            f"but {n_delta} docs have doc_id >= saved next_id "
            f"{saved_next}); interleaved ids, eager removes of saved "
            "docs, or a post-save vacuum need save_index")
    dirt_changed = index.dirt_count != saved_dirt
    if dirt_changed:
        live_tomb = index._all_tombstones()
        if live_tomb is None:
            raise ValueError(
                "save_index_delta: dirt_count changed but no tombstones "
                "are live (post-save vacuum?); run save_index")
        # full current set, overwritten: it only grows between vacuums
        (live_tomb.select("doc_id")
         .write.mode("overwrite").parquet(f"{path}/tombstones"))
        manifest["dirt_count"] = index.dirt_count
    if n_delta == 0:
        if dirt_changed:  # tombstone-only delta (a pure discard batch)
            manifest["doc_count"] = index.doc_count
            manifest["avg_field_length"] = {
                str(k): v for k, v in index.avg_field_length.items()}
            lineage["saved_at"] = time.time()
            manifest["lineage"] = lineage
            _write_json(f"{path}/manifest.json", manifest, spark)
        return manifest  # nothing new since the last save
    docs_delta = index.docs.where(pred)
    if "doc_bucket" not in docs_delta.columns:
        docs_delta = docs_delta.withColumn(
            "doc_bucket", F.pmod(F.xxhash64(index.config.id_field),
                                 F.lit(layout.n_doc_buckets)).cast("int"))
    (docs_delta.repartition("doc_bucket")
     .write.mode("append").partitionBy("doc_bucket")
     .parquet(f"{path}/docs"))
    stats_delta = index.doc_stats.where(pred)
    stats_delta.write.mode("append").parquet(f"{path}/doc_stats")
    raw_cols = ["term", "field_id", "doc_id", "tf"]
    post_delta = index.postings.where(pred).select(*raw_cols)
    (post_delta
     .withColumn("bucket", F.pmod(F.xxhash64("term"),
                                  F.lit(layout.n_term_buckets)).cast("int"))
     .repartition("bucket")
     .sortWithinPartitions("term", "field_id", "doc_id")
     .write.mode("append").partitionBy("bucket")
     .parquet(f"{path}/postings"))
    n_delta_postings = post_delta.count()
    saved_terms = _try_read_parquet(spark, f"{path}/terms")
    if saved_terms is not None:
        new_terms = (post_delta.select("term", "field_id").distinct()
                     .join(saved_terms, ["term", "field_id"], "left_anti"))
        (new_terms.repartitionByRange(1, "term").sortWithinPartitions("term")
         .write.mode("append").parquet(f"{path}/terms"))
    bytes_delta = None
    seg_id = int(lineage.get("n_segments", 1))
    if seg_id > 0 and _try_read_parquet(
            spark, f"{path}/posting_lists") is not None:
        from ..config import DEFAULT_BM25
        lists = compact_posting_lists(
            post_delta, layout, max_doc_id=index.next_id - 1,
            doc_stats=stats_delta, bm25=dict(DEFAULT_BM25),
            avg_field_length=dict(index.avg_field_length))
        (lists.withColumn("segment", F.lit(seg_id))
         .write.mode("append").partitionBy("segment")
         .parquet(f"{path}/posting_lists"))
        bytes_delta = (
            spark.read.parquet(f"{path}/posting_lists")
            .where(F.col("segment") == seg_id)
            .agg(F.sum("n_bytes")).collect()[0][0])
        lineage["n_segments"] = seg_id + 1
    counters = manifest.get("counters", {})
    counters["postings_emitted"] = (
        int(counters.get("postings_emitted") or 0) + n_delta_postings)
    if bytes_delta is not None:
        counters["bytes_compressed"] = (
            int(counters.get("bytes_compressed") or 0) + int(bytes_delta))
    lineage["saved_at"] = time.time()
    manifest.update({
        "doc_count": index.doc_count,
        "next_id": index.next_id,
        "avg_field_length": {str(k): v
                             for k, v in index.avg_field_length.items()},
        "field_doc_count": {str(k): v
                            for k, v in index._field_counts().items()},
        "counters": counters,
        "lineage": lineage,
    })
    _write_json(f"{path}/manifest.json", manifest, spark)
    return manifest


def load_index(spark: SparkSession, path: str,
               cache: bool = True) -> SparkSearchIndex:
    """Read manifest (strict version gate, like loadJSONIndex) + tables."""
    manifest = _read_json(f"{path}/manifest.json", spark)
    if manifest.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"cannot load index: unsupported version {manifest.get('version')}")
    config = IndexConfig(fields=manifest["fields"],
                         id_field=manifest["id_field"],
                         store_fields=manifest["store_fields"],
                         tokenizer=manifest.get("tokenizer", "jvm"))
    # keep the bucket partition column: the engine adds literal
    # `bucket IN (...)` predicates per query → parquet partition pruning.
    # Empty tables (zero live postings / docs) write no part files under
    # partitionBy and defeat schema inference — fall back to the schema
    # the save recorded in the manifest
    schemas = manifest.get("schemas", {})
    postings = _read_parquet_with_fallback(
        spark, f"{path}/postings", schemas.get("postings"))
    doc_stats = _read_parquet_with_fallback(
        spark, f"{path}/doc_stats", schemas.get("doc_stats"))
    docs = _read_parquet_with_fallback(
        spark, f"{path}/docs", schemas.get("docs"))
    index = SparkSearchIndex(
        spark, config, postings, doc_stats, docs,
        doc_count=manifest["doc_count"],
        avg_field_length={int(k): v for k, v in
                          manifest["avg_field_length"].items()},
        next_id=manifest["next_id"], cache=cache)
    if "field_doc_count" in manifest:
        index._field_doc_count = {int(k): int(v) for k, v in
                                  manifest["field_doc_count"].items()}
    # (older manifests lack the key — _field_counts() recomputes lazily)
    index._n_term_buckets = manifest.get("lineage", {}).get("n_term_buckets")
    index._n_doc_buckets = manifest.get("lineage", {}).get("n_doc_buckets")
    # probe optional tables via spark.read, not os.path.exists: the index
    # directory may live on S3/HDFS where local-FS checks always fail and
    # would silently drop the term dictionary / compacted WAND lists
    # delta-saved tombstones: restore the discard state so loads never
    # resurrect docs discarded since the last full save. Small sets come
    # back as the driver list (broadcast anti-join form), large ones stay
    # a DataFrame (the discard_where scale form)
    dirt = int(manifest.get("dirt_count", 0) or 0)
    if dirt:
        tomb = _try_read_parquet(spark, f"{path}/tombstones")
        if tomb is None:
            raise ValueError(
                "cannot load index: manifest records dirt_count "
                f"{dirt} but no tombstones/ table exists at {path}")
        if dirt <= 100_000:
            index.tombstones = sorted(
                int(r["doc_id"]) for r in tomb.select("doc_id").collect())
        else:
            t = tomb.select("doc_id").cache()
            index._tombstone_df = t
            index._tombstone_caches.append(t)
        index.dirt_count = dirt
    terms = _try_read_parquet(spark, f"{path}/terms")
    if terms is not None:
        index._term_dict = terms
    lists = _try_read_parquet(spark, f"{path}/posting_lists")
    if lists is not None:
        # serve the saved compacted lists (WAND path) without recompacting
        index._posting_lists = lists
        index._posting_lists_layout = IndexLayout(
            block_doc_range=manifest.get("lineage", {}).get(
                "block_doc_range", IndexLayout().block_doc_range))
        # delta saves append segment=1,2,... partition dirs; a segmented
        # saved index serves through wand_topk's df re-aggregation exactly
        # like an in-memory segment append
        index._segment_count = max(
            1, int(manifest.get("lineage", {}).get("n_segments", 1)))
        # every persisted row has doc_id < the saved next_id: in-memory
        # appends stacked on top stay tiered-mergeable above this floor
        index._segment_floor = int(manifest["next_id"])
        index._segments_mergeable = True
    return index


def _read_parquet_with_fallback(spark: SparkSession, path: str,
                                schema_json: Optional[str]) -> DataFrame:
    """Read a required index table; when schema inference fails (the dir
    exists but holds no part files — an empty table written through
    partitionBy) substitute an empty DataFrame with the manifest-recorded
    schema. Re-raises when no schema was recorded (pre-round-4 manifests:
    those saves crashed on empty tables before reaching the manifest, so
    an existing old save is never empty)."""
    import json as _json

    from pyspark.errors import AnalysisException
    from pyspark.sql import types as T
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        if not schema_json:
            raise
        schema = T.StructType.fromJson(_json.loads(schema_json))
        return spark.createDataFrame([], schema)


def _try_read_parquet(spark: SparkSession, path: str) -> Optional[DataFrame]:
    """spark.read.parquet(path) or None if absent — filesystem-agnostic
    existence probe (works wherever Spark's Hadoop FS layer can read)."""
    from pyspark.errors import AnalysisException
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


# ------------------------------------------------------------- resumable

def build_resumable(docs_df: DataFrame, config: IndexConfig, path: str,
                    order_cols: Sequence[str], n_chunks: int = 8,
                    fail_after_chunk: Optional[int] = None) -> dict:
    """Chunked, checkpointed index build with per-chunk lineage + counters.

    Stage 0: assign dense doc_ids, persist the assigned corpus (checkpoint).
    Stage 1..n: per chunk (doc_id % n_chunks == c) tokenize → postings →
    write + mark done with counters. Already-marked chunks are skipped on
    re-run, so a killed build resumes where it stopped.

    ``fail_after_chunk`` is a test hook: raise after finishing chunk c to
    simulate a mid-build crash.
    """
    spark = docs_df.sparkSession
    if "://" not in path:
        os.makedirs(f"{path}/chunks", exist_ok=True)
    state_file = f"{path}/build_state.json"

    assigned = _try_read_parquet(spark, f"{path}/assigned")
    if assigned is None:
        assign_doc_ids(docs_df, order_cols).write.mode(
            "overwrite").parquet(f"{path}/assigned")
        assigned = spark.read.parquet(f"{path}/assigned")

    # missing state = fresh build; a PRESENT but unreadable/corrupt state
    # file propagates instead of silently redoing every chunk (round-2
    # ADVICE: the blanket `except Exception: pass` hid real I/O errors)
    done: Dict[str, dict] = {}
    if _json_exists(state_file, spark):
        done = _read_json(state_file, spark).get("chunks", {})

    t_start = time.time()
    for c in range(n_chunks):
        key = str(c)
        if key in done:
            continue
        chunk_docs = assigned.where(F.col("doc_id") % n_chunks == c)
        tokenized = tokenize_fields(chunk_docs, config)
        postings = build_postings(tokenized)
        stats = build_doc_stats(tokenized)
        postings.write.mode("overwrite").parquet(f"{path}/chunks/postings_{c}")
        stats.write.mode("overwrite").parquet(f"{path}/chunks/doc_stats_{c}")
        n_docs = chunk_docs.count()
        n_post = spark.read.parquet(f"{path}/chunks/postings_{c}").count()
        done[key] = {"docs_tokenized": n_docs, "postings_emitted": n_post,
                     "finished_at": time.time()}
        _write_json(state_file, {"chunks": done}, spark)
        if fail_after_chunk is not None and c >= fail_after_chunk:
            raise RuntimeError(f"injected failure after chunk {c}")

    # finalize: union chunk outputs into the serve layout
    postings = spark.read.parquet(
        *[f"{path}/chunks/postings_{c}" for c in range(n_chunks)])
    doc_stats = spark.read.parquet(
        *[f"{path}/chunks/doc_stats_{c}" for c in range(n_chunks)])
    avg_len, _ = corpus_stats(doc_stats)
    keep = ["doc_id", config.id_field] + [f for f in config.store_fields
                                          if f in assigned.columns]
    docs_keep = assigned.select(*dict.fromkeys(keep))
    doc_count = docs_keep.count()
    index = SparkSearchIndex(spark, config, postings, doc_stats, docs_keep,
                             doc_count, avg_len, next_id=doc_count,
                             cache=False)
    manifest = save_index(index, path)
    manifest["build"] = {
        "chunks": done, "n_chunks": n_chunks,
        "wall_sec": round(time.time() - t_start, 3),
        "docs_total": doc_count,
    }
    _write_json(f"{path}/manifest.json", manifest, spark)
    return manifest


def merge_saved_indexes(spark: SparkSession, in_paths: Sequence[str],
                        out_path: str,
                        layout: Optional[IndexLayout] = None,
                        check_duplicate_ids: bool = True) -> dict:
    """Merge k saved shard layouts into one saved index — the merge JOB of
    a sharded 10^12-file build (k bounded `build_index.py` runs, then one
    `merge_indexes.py` run). Loads each shard uncached (the merge plan
    streams shard parquet straight into the writers — no executor-storage
    pressure from corpus-sized caches), merges via
    ``SparkSearchIndex.merge`` (doc-id offsets, BM25 stats recomputed over
    the union), and writes through ``save_index`` — whose posting-list
    compaction IS the north-star salted term-hash merge shuffle
    (operators/compact.py skew path included). Returns the manifest."""
    if not in_paths:
        raise ValueError("merge_saved_indexes: need at least one input")
    shards = [load_index(spark, p, cache=False) for p in in_paths]
    merged = SparkSearchIndex.merge(
        shards, cache=False, check_duplicate_ids=check_duplicate_ids)
    manifest = save_index(merged, out_path, layout=layout)
    manifest["merge"] = {"inputs": list(in_paths),
                         "n_shards": len(in_paths)}
    _write_json(f"{out_path}/manifest.json", manifest, spark)
    return manifest
