"""Streaming ingest hygiene: exact deduplication over a document stream.

The batch pipeline dedups a corpus in place (``operators/dedup.py``); a
continuously-ingesting pipeline needs the same guarantee per arriving
micro-batch AND across batches — a document seen an hour ago must not
re-enter the corpus. Structured Streaming's keyed dedup state is exactly
that: the content hash becomes the state key, so replays and
cross-batch duplicates drop without any join against the stored corpus.

State-size honesty at 10^12 files: unbounded ``drop_duplicates`` state is
one 16-byte md5 key per DISTINCT document ever seen — fine for dedup
windows of days, not forever. Pass (``event_time_col``, ``within``) to
use ``dropDuplicatesWithinWatermark`` instead: state expires once the
watermark passes, bounding memory to the duplicate-arrival horizon (the
operational assumption that a duplicate re-arrives within N hours/days;
later re-arrivals are the batch operators' job, e.g.
``near_dup_pairs_against`` at compaction time).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_HASH_COL = "__content_md5"


def stream_exact_dedup(stream: DataFrame, text_col: str = "text",
                       event_time_col: Optional[str] = None,
                       within: Optional[str] = None) -> DataFrame:
    """First occurrence of each distinct ``text_col`` content wins;
    later arrivals (same or later micro-batch) are dropped.

    Without a watermark the dedup state never expires (exact forever,
    memory grows with distinct content). With ``event_time_col`` +
    ``within`` (e.g. ``"24 hours"``), duplicates are only guaranteed
    dropped when they arrive within the watermark horizon of the first
    copy, and state stays bounded."""
    hashed = stream.withColumn(CONTENT_HASH_COL, F.md5(F.col(text_col)))
    if (event_time_col is None) != (within is None):
        raise ValueError(
            "pass event_time_col and within together (or neither)")
    if event_time_col is not None:
        deduped = (hashed.withWatermark(event_time_col, within)
                   .dropDuplicatesWithinWatermark([CONTENT_HASH_COL]))
    else:
        deduped = hashed.dropDuplicates([CONTENT_HASH_COL])
    return deduped.drop(CONTENT_HASH_COL)
