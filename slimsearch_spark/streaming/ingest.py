"""Streaming ingest hygiene, full form: per micro-batch exact AND
near-duplicate filtering against the continuously-growing corpus.

``streaming/dedup.py`` handles exact dedup with keyed state (cheap,
content-hash only). This module is the near-dup-aware loop: each
micro-batch is cleaned with the BATCH operators — which are individually
oracle-gated and fuzzed — inside ``foreachBatch``, then appended to the
corpus store, so the next batch checks against everything ingested so
far:

  1. intra-batch exact dedup (min-id survivor per content hash);
  2. intra-batch NEAR dedup via ``dedup.near_dup_pairs`` (two near
     -duplicates in the same micro-batch are invisible to the corpus
     check — neither is in the corpus yet);
  3. exact corpus matches dropped by an md5 anti-join (no shingling for
     byte-identical re-crawls — the dominant duplicate mode);
  4. near-duplicates of the corpus dropped via
     ``dedup.near_dup_pairs_against`` (banded LSH candidates, exact
     -Jaccard verify ≥ threshold);
  5. survivors appended to the corpus parquet.

Work per batch is O(batch · bands) probe + collision verify — never a
corpus rescan. Two corpus-side modes (round 5):

* default: the corpus band table is recomputed from parquet per batch —
  zero extra state, right for compaction-cadence runs, but per-batch
  cost grows with the corpus (it re-shingles corpus text every batch);
* ``state_store_path``: the production serving-loop mode — the corpus
  md5 set and LSH band table persist as two skinny parquet tables,
  appended with each batch's survivors, so a batch check reads hashes
  instead of recomputing them and per-batch cost stays O(batch) compute
  plus a hash-column scan (corpus TEXT is touched only for the verify
  step's collision set, fetched by pushed-down id). A store created by
  one (k, rows_per_band, shingle_n) configuration refuses other values
  via its params manifest. Bootstrapping an existing corpus into a
  store costs one full pass, paid once.

foreachBatch is the right tool, not a keyed-state operator: near-dup
state is the full shingle/band index, which belongs in a queryable
store — duplicating it into streaming state would double storage and
cap corpus size at state-store limits.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import (_lsh_bands, doc_shingles,
                               minhash_signatures, near_dup_pairs,
                               near_dup_pairs_against,
                               near_dup_pairs_against_bands)
from ..sources.index_store import _read_json, _write_json


def _corpus_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on the session's Hadoop filesystem.

    This is the ONLY condition under which the corpus checks may be
    skipped. A transient listing failure or corrupted footer on an
    EXISTING corpus must fail the batch (so the streaming checkpoint
    retries it) rather than silently ingest unchecked duplicates."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf).exists(jpath)


def _batch_bands(batch: DataFrame, text_col: str, id_col: str,
                 k: int, rows_per_band: int, shingle_n: int,
                 max_bucket: int) -> DataFrame:
    """The batch's own capped LSH band table — the same pieces
    ``near_dup_pairs_against_bands`` computes, for the first batch
    (nothing to join against yet, but its bands must seed the store)."""
    terms = doc_shingles(batch, shingle_n, text_col, id_col)
    return _lsh_bands(minhash_signatures(terms, k), k, rows_per_band,
                      max_bucket)


def _check_store_params(spark, store_path: str, k: int,
                        rows_per_band: int, shingle_n: int) -> None:
    """Create-or-validate the store's params manifest: band keys hashed
    under one (k, rows_per_band, shingle_n) are meaningless under
    another, so a mismatch must fail the batch, not silently miss
    duplicates."""
    mpath = f"{store_path}/params.json"
    want = {"k": k, "rows_per_band": rows_per_band, "shingle_n": shingle_n}
    if _corpus_exists(spark, mpath):
        got = _read_json(mpath, spark)
        if got != want:
            raise ValueError(
                f"dedup state store at {store_path} was built with "
                f"{got}; this batch passed {want}")
    else:
        _write_json(mpath, want, spark)


def ingest_batch_dedup(batch: DataFrame, corpus_path: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.5,
                       intra_batch_near_dup: bool = True,
                       state_store_path: Optional[str] = None,
                       batch_id: Optional[int] = None,
                       **near_kwargs) -> int:
    """Clean one batch against the corpus at ``corpus_path`` and append
    the survivors. Returns the number of appended rows. Usable directly
    for batch-incremental ingest, or via ``stream_ingest_dedup`` as a
    Structured Streaming sink.

    Full near-dup hygiene covers BOTH directions: within the batch
    (``intra_batch_near_dup``, on by default — two near-duplicates
    arriving in the same micro-batch keep only the smaller id) and
    batch-vs-corpus.

    ``state_store_path`` selects the persistent-store mode (see module
    docstring): the corpus md5 set lives at ``<store>/md5`` and the LSH
    band table at ``<store>/bands``, both appended with each batch's
    survivors, so per-batch cost stops growing with corpus TEXT size.
    An existing corpus without a store is bootstrapped (one full pass,
    paid once); a store whose params manifest disagrees with this
    call's LSH shape raises.

    ``batch_id`` (the streaming path always passes foreachBatch's epoch
    id) upgrades the appends to REPLAY-IDEMPOTENT writes: each table
    gains a ``__batch=<id>`` partition written with dynamic partition
    overwrite, so a replayed batch rewrites exactly its own files
    instead of appending twice. Write order is corpus → bands → md5:
    a crash between any two leaves the md5 set (the first check a
    replay consults) missing, so the replay redoes the whole batch and
    every table converges — whereas md5-first could drop a batch whose
    corpus write never happened. Without ``batch_id`` the writes are
    plain appends and a crash between them can double-ingest one batch
    (exact duplicates only, removed by the next compaction); parquet
    has no cross-table transaction — an Iceberg catalog would close
    even the multi-table window with one commit. Pick ONE mode per
    corpus: partitioned and unpartitioned layouts don't mix."""
    spark = batch.sparkSession
    k = near_kwargs.get("k", 8)
    rows_per_band = near_kwargs.get("rows_per_band", 2)
    shingle_n = near_kwargs.get("shingle_n", 3)
    from ..operators.dedup import DEFAULT_MAX_BUCKET
    max_bucket = near_kwargs.get("max_bucket", DEFAULT_MAX_BUCKET)
    if state_store_path is not None:
        _check_store_params(spark, state_store_path, k, rows_per_band,
                            shingle_n)
    # 1. intra-batch exact: min-id survivor per content hash
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    batch = (batch.withColumn("__rn", F.row_number().over(w))
             .where(F.col("__rn") == 1).drop("__rn"))
    # 1b. intra-batch NEAR duplicates: neither is in the corpus yet, so
    # the corpus check below cannot catch them — drop the larger id of
    # each verified pair (same survivor rule as the exact step).
    if intra_batch_near_dup:
        pairs = near_dup_pairs(batch, text_col, id_col,
                               threshold=threshold, **near_kwargs)
        losers = (pairs.select(F.greatest("a", "b").alias(id_col))
                  .distinct())
        batch = batch.join(losers, id_col, "left_anti")
    # First batch (corpus path absent): nothing to check against. Any
    # other read failure propagates — see _corpus_exists.
    corpus = (spark.read.parquet(corpus_path)
              if _corpus_exists(spark, corpus_path) else None)
    new_bands: Optional[DataFrame] = None
    if corpus is not None and state_store_path is not None:
        md5_path = f"{state_store_path}/md5"
        bands_path = f"{state_store_path}/bands"
        if not _corpus_exists(spark, md5_path):
            # bootstrap an existing corpus into the store: one full
            # pass, landing in the __batch=-1 partition under batch_id
            # mode so the store keeps one consistent layout
            def bootstrap(df: DataFrame, path: str) -> None:
                if batch_id is None:
                    df.write.parquet(path)
                else:
                    (df.withColumn("__batch", F.lit(-1))
                     .write.partitionBy("__batch").parquet(path))
            bootstrap(corpus.select(F.md5(F.col(text_col)).alias("__h"))
                      .distinct(), md5_path)
            bootstrap(_batch_bands(corpus, text_col, id_col, k,
                                   rows_per_band, shingle_n, max_bucket),
                      bands_path)
        # 2. exact corpus matches from the persisted hash set
        seen = spark.read.parquet(md5_path)
        batch = (batch.withColumn("__h", F.md5(F.col(text_col)))
                 .join(seen, "__h", "left_anti").drop("__h"))
        # 3. near-duplicates of the corpus from the persisted band table;
        # corpus text is read only for the collision set, by pushed id
        flagged, new_bands = near_dup_pairs_against_bands(
            batch, spark.read.parquet(bands_path), corpus, text_col,
            id_col, threshold=threshold, **near_kwargs)
        batch = batch.join(
            flagged.select(F.col("a").alias(id_col)).distinct(),
            id_col, "left_anti")
    elif corpus is not None:
        # 2. exact corpus matches: md5 anti-join (no shingling)
        seen = corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct()
        batch = (batch.withColumn("__h", F.md5(F.col(text_col)))
                 .join(seen, "__h", "left_anti").drop("__h"))
        # 3. near-duplicates of the corpus
        flagged = (near_dup_pairs_against(batch, corpus, text_col, id_col,
                                          threshold=threshold, **near_kwargs)
                   .select(F.col("a").alias(id_col)).distinct())
        batch = batch.join(flagged, id_col, "left_anti")
    batch = batch.cache()
    n = batch.count()

    def write(df: DataFrame, path: str) -> None:
        if batch_id is None:
            df.write.mode("append").parquet(path)
        else:
            (df.withColumn("__batch", F.lit(int(batch_id)))
             .write.partitionBy("__batch")
             .option("partitionOverwriteMode", "dynamic")
             .mode("overwrite").parquet(path))

    if n:
        write(batch, corpus_path)
        if state_store_path is not None:
            # persist the SURVIVORS' hashes so the next batch checks
            # against them; first batch computes its bands here
            if new_bands is None:
                new_bands = _batch_bands(batch, text_col, id_col, k,
                                         rows_per_band, shingle_n,
                                         max_bucket)
                survivor_bands = new_bands
            else:
                survivor_bands = new_bands.join(
                    batch.select(F.col(id_col).alias("doc_id")),
                    "doc_id", "left_semi")
            write(survivor_bands, f"{state_store_path}/bands")
            write(batch.select(F.md5(F.col(text_col)).alias("__h"))
                  .distinct(), f"{state_store_path}/md5")
    if new_bands is not None:
        new_bands.unpersist()
    batch.unpersist()
    return n


def stream_ingest_dedup(stream: DataFrame, corpus_path: str,
                        checkpoint_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, available_now: bool = False,
                        intra_batch_near_dup: bool = True,
                        state_store_path: Optional[str] = None,
                        epoch_partitions: bool = False,
                        **near_kwargs):
    """readStream → per-batch exact+near dedup vs the growing corpus →
    append survivors. Returns the started StreamingQuery.

    ``state_store_path`` turns on the persisted md5+band store (flat
    per-batch cost — see ``ingest_batch_dedup``). ``epoch_partitions``
    keys every write to foreachBatch's epoch id (``__batch=<id>``
    partitions + dynamic overwrite), making a replayed batch rewrite its
    own files — full replay idempotency across corpus AND store tables.

    Exactly-once note without ``epoch_partitions``: the corpus append is
    idempotent per batch only if the checkpoint survives (Spark replays
    a failed batch; the md5 anti-join then drops the rows the failed
    attempt already wrote, so a replay cannot double-ingest
    byte-identical content) — and in store mode a crash between the
    corpus and store writes can double-ingest one batch's exact
    duplicates until the next compaction."""
    writer = (stream.writeStream
              .foreachBatch(lambda b, eid: ingest_batch_dedup(
                  b, corpus_path, text_col, id_col, threshold,
                  intra_batch_near_dup, state_store_path,
                  int(eid) if epoch_partitions else None,
                  **near_kwargs))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
