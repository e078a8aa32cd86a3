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
corpus rescan: the corpus side contributes its band table (recomputed
from parquet per batch here; a production deployment persists the band
table and appends to it, same math). foreachBatch is the right tool, not
a keyed-state operator: near-dup state is the full shingle/band index,
which already lives in the corpus store — duplicating it into streaming
state would double storage and cap corpus size at state-store limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import near_dup_pairs, near_dup_pairs_against


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


def ingest_batch_dedup(batch: DataFrame, corpus_path: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.5,
                       intra_batch_near_dup: bool = True,
                       **near_kwargs) -> int:
    """Clean one batch against the corpus at ``corpus_path`` and append
    the survivors. Returns the number of appended rows. Usable directly
    for batch-incremental ingest, or via ``stream_ingest_dedup`` as a
    Structured Streaming sink.

    Full near-dup hygiene covers BOTH directions: within the batch
    (``intra_batch_near_dup``, on by default — two near-duplicates
    arriving in the same micro-batch keep only the smaller id) and
    batch-vs-corpus."""
    spark = batch.sparkSession
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
    if corpus is not None:
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
    if n:
        batch.write.mode("append").parquet(corpus_path)
    batch.unpersist()
    return n


def stream_ingest_dedup(stream: DataFrame, corpus_path: str,
                        checkpoint_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, available_now: bool = False,
                        intra_batch_near_dup: bool = True,
                        **near_kwargs):
    """readStream → per-batch exact+near dedup vs the growing corpus →
    append survivors. Returns the started StreamingQuery.

    Exactly-once note: the corpus append is idempotent per batch only if
    the checkpoint survives (Spark replays a failed batch; the md5
    anti-join then drops the rows the failed attempt already wrote, so a
    replay cannot double-ingest byte-identical content)."""
    writer = (stream.writeStream
              .foreachBatch(lambda b, _id: ingest_batch_dedup(
                  b, corpus_path, text_col, id_col, threshold,
                  intra_batch_near_dup, **near_kwargs))
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
