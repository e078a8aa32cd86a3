"""Stateful streaming near-duplicate candidate detection: MinHash-LSH
band membership kept as keyed streaming state (``applyInPandasWithState``).

This is the low-latency twin of the two existing near-dup paths:

* batch ``operators/dedup.near_dup_pairs`` — full corpus, exact-Jaccard
  verified (the compaction-time ground truth);
* ``streaming/ingest.stream_ingest_dedup`` — per-batch foreachBatch
  verify against the growing corpus store (exact answers, but each batch
  pays a corpus band-table scan).

Here the LSH bucket membership itself IS the streaming state: the shuffle
key is ``(band_id, band_sig)`` and the state per bucket is the capped list
of doc_ids seen in it. A new document emits a candidate pair for every
existing member of each bucket it lands in — O(bands × bucket members)
per doc, zero corpus rescans, and the emitted pair stream is available at
micro-batch latency for downstream exact verification (batch
``_verify_jaccard`` / ``near_dup_pairs_against``).

State-size honesty at 10^12 files: state is doc_id lists only — no text,
no shingles, no signatures — so ≈ n_bands × 8 bytes per live document,
orders of magnitude below the corpus band table (the round-3 concern with
keyed-state near-dup). Pass (``event_time_col``, ``within``) to expire
buckets untouched for longer than the duplicate-arrival horizon via
event-time timeouts, bounding state exactly like
``stream_exact_dedup``'s watermarked mode; without it, state grows with
distinct (bucket, member) pairs forever.

Parity contract (tested in tests/test_streaming_near_dup.py): on the same
corpus, the DISTINCT (a, b) set drained from this operator equals batch
``lsh_candidate_pairs`` over the same (k, rows_per_band, shingle_n) —
regardless of how the corpus is split into micro-batches — whenever no
bucket exceeds ``max_bucket``. Above the cap the two diverge by design:
batch keeps the max_bucket smallest doc_ids per bucket, streaming keeps
the first arrivals (deterministic given arrival order). Pairs that
collide in several bands are emitted once per band (``band_id`` column
tells which); consumers take ``.distinct()`` on (a, b) — the batch
operator's ``.distinct()`` is a shuffle the stream cannot pay per batch
without a second stateful operator.

Signature parity: band keys are computed by the SAME JVM expressions as
the batch pipeline — ``terms_col`` tokens, the pyspark.ml NGram shingler,
``term_hash32`` md5-derived 32-bit hashes, and ``MINHASH_PARAMS``
universal hashes mod ``MINHASH_PRIME`` — per row inside whole-stage
codegen (``bands_df``): ``array_min(transform(hashes, h → (a·h+b) mod p))``
replaces the batch groupBy, so the stream's map side has zero Python and
zero shuffle before the stateful operator. ``band_keys_py`` is the
pure-Python reference form the parity tests compare both engines against.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.tokenize import analyze_py, terms_col
from ..operators.dedup import (DEFAULT_MAX_BUCKET, MINHASH_PARAMS,
                               MINHASH_PRIME, term_hash32)

OUT_SCHEMA = "a bigint, b bigint, band_id int"
STATE_SCHEMA = "members array<bigint>"
_EMPTY = pd.DataFrame({
    "a": pd.Series([], dtype="int64"),
    "b": pd.Series([], dtype="int64"),
    "band_id": pd.Series([], dtype="int32"),
})

def band_keys_py(text: Optional[str], k: int, rows_per_band: int,
                 shingle_n: int) -> List[Tuple[int, str]]:
    """(band_id, band_sig) LSH keys for one document — the per-row form of
    batch ``doc_shingles`` → ``minhash_signatures`` → ``_lsh_bands``.
    A doc with fewer than ``shingle_n`` tokens has no shingles and lands
    in no bucket (matching the batch groupBy, where it has no rows)."""
    toks = analyze_py(text) if text is not None else []
    shingles = {" ".join(toks[i:i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)}
    if not shingles:
        return []
    hashes = [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
              for s in shingles]
    sigs = [min((h * a + b) % MINHASH_PRIME for h in hashes)
            for a, b in MINHASH_PARAMS[:k]]
    n_bands = k // rows_per_band
    return [(bi, "|".join(str(sigs[bi * rows_per_band + r])
                          for r in range(rows_per_band)))
            for bi in range(n_bands)]


def bands_df(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", k: int = 8, rows_per_band: int = 2,
             shingle_n: int = 3, keep_cols: Tuple[str, ...] = ()
             ) -> DataFrame:
    """→ (doc_id, band_id, band_sig, *keep_cols): per-document LSH band
    keys as pure JVM SQL expressions — no Python, no shuffle, works on
    batch AND streaming frames (every node is stateless).

    Bit-identical to batch ``doc_shingles`` → ``minhash_signatures`` →
    ``_lsh_bands`` (pre-cap) because it is built from the same pieces:
    ``terms_col`` tokens, the ml NGram shingler, ``term_hash32``, and the
    per-permutation ``(a·h + b) mod p`` — only the per-doc min moves from
    a groupBy aggregate into ``array_min`` over the doc's own hash array.
    Docs with no shingles produce no rows (explode of a null array),
    matching the batch groupBy where they have no (doc, term) rows.

    The hash array ``__h`` is materialized in its own projection and only
    referenced as an attribute by the k ``array_min`` expressions —
    CollapseProject keeps non-cheap multi-referenced aliases separate, so
    each shingle is md5-hashed exactly once per permutation set."""
    if k > len(MINHASH_PARAMS):
        raise ValueError(f"k > {len(MINHASH_PARAMS)} needs more "
                         "MINHASH_PARAMS entries")
    if k % rows_per_band:
        raise ValueError("k must be divisible by rows_per_band")
    from pyspark.ml.feature import NGram
    keep = list(keep_cols)
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # NULL text → empty token array (the NGram udf NPEs on null input;
        # batch never feeds it one — explode drops null-text docs earlier)
        F.coalesce(terms_col(F.col(text_col)),
                   F.array().cast("array<string>")).alias("__toks"),
        *keep)
    sh = NGram(n=shingle_n, inputCol="__toks",
               outputCol="__sh").transform(toks)
    hashed = sh.select(
        "doc_id",
        F.transform(F.array_distinct("__sh"),
                    lambda x: term_hash32(x)).alias("__h"),
        *keep)
    sigs = [F.array_min(F.transform(
        F.col("__h"),
        (lambda a_, b_: lambda h: (h * F.lit(a_) + F.lit(b_))
            % F.lit(MINHASH_PRIME))(a, b)))
        for a, b in MINHASH_PARAMS[:k]]
    n_bands = k // rows_per_band
    melt = F.array(*[
        F.struct(
            F.lit(bi).alias("band_id"),
            F.concat_ws("|", *[sigs[bi * rows_per_band + r]
                               for r in range(rows_per_band)])
            .alias("band_sig"))
        for bi in range(n_bands)])
    # null array for shingle-less docs: explode drops the row entirely
    # (a WHERE would be pushed through the projection and re-evaluate __h)
    bands = F.when(F.size("__h") > 0, melt)
    return (hashed.select("doc_id", F.explode(bands).alias("__b"), *keep)
            .select("doc_id", F.col("__b.band_id").alias("band_id"),
                    F.col("__b.band_sig").alias("band_sig"), *keep))


def _bucket_fn(max_bucket: int, horizon_ms: Optional[int]):
    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # watermark passed the bucket's horizon: drop its membership
            state.remove()
            yield _EMPTY
            return
        # most buckets see 1-2 rows per batch: stay in numpy/plain-int
        # land — pd.concat + sort_values + astype per key was the state
        # operator's measured Python cost at 35k keys/batch
        chunks = list(pdfs)
        rows = (chunks[0] if len(chunks) == 1
                else pd.concat(chunks, ignore_index=True))
        # intra-batch determinism: batch LSH pairs on doc_id order, and a
        # replayed batch must regenerate the same pairs
        ids = rows["doc_id"].to_numpy()
        ids = ids[ids.argsort()].tolist()
        members: List[int] = (list(state.get[0]) if state.exists else [])
        seen = set(members)
        out_a: List[int] = []
        out_b: List[int] = []
        for d in ids:
            d = int(d)
            if d in seen:
                continue            # replay / duplicate row: no re-emit
            if len(members) >= max_bucket:
                break               # capped bucket: no pairs, no growth
            for m in members:
                out_a.append(min(m, d))
                out_b.append(max(m, d))
            members.append(d)
            seen.add(d)
        state.update((members,))
        if horizon_ms is not None:
            state.setTimeoutTimestamp(
                int(rows["__ms"].max()) + horizon_ms)
        if not out_a:
            yield _EMPTY
            return
        band_id = int(key[0])
        yield pd.DataFrame({"a": out_a, "b": out_b,
                            "band_id": [band_id] * len(out_a)})

    return update


def _interval_ms(within: str) -> int:
    """'24 hours' / '30 minutes' / '10 seconds' → milliseconds."""
    parts = within.split()
    factors = {"millisecond": 1, "second": 1000, "minute": 60_000,
               "hour": 3_600_000, "day": 86_400_000}
    if len(parts) != 2 or parts[1].rstrip("s") not in factors:
        raise ValueError(
            f"within={within!r}: expected '<n> "
            f"{{{'|'.join(sorted(factors))}}}[s]'")
    return int(parts[0]) * factors[parts[1].rstrip("s")]


def stream_near_dup_candidates(stream: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", k: int = 8,
                               rows_per_band: int = 2, shingle_n: int = 3,
                               max_bucket: int = DEFAULT_MAX_BUCKET,
                               event_time_col: Optional[str] = None,
                               within: Optional[str] = None) -> DataFrame:
    """streaming docs → (a, b, band_id) near-dup candidate pairs, state =
    capped LSH bucket membership. See module docstring for the parity and
    state-size contract; consumers ``.distinct()`` on (a, b) and verify
    with the batch exact-Jaccard operators."""
    if (event_time_col is None) != (within is None):
        raise ValueError(
            "pass event_time_col and within together (or neither)")
    horizon_ms: Optional[int] = None
    if within is not None:
        horizon_ms = _interval_ms(within)   # validate before plan building
    keep: Tuple[str, ...] = ()
    if event_time_col is not None:
        # same NTZ→LTZ handling as streaming/sessions.py (fixed-offset
        # session zones only; run under UTC)
        tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")
        stream = (stream
                  .withColumn("__ts", F.from_utc_timestamp(
                      F.col(event_time_col).cast("timestamp"), tz))
                  .withWatermark("__ts", within)
                  .withColumn("__ms", F.unix_millis(F.col("__ts"))))
        # __ts itself must survive to the stateful operator: the analyzer
        # requires the watermarked attribute in its child plan
        keep = ("__ms", "__ts")
    exploded = bands_df(stream, text_col, id_col, k, rows_per_band,
                        shingle_n, keep_cols=keep)
    timeout = (GroupStateTimeout.EventTimeTimeout
               if event_time_col is not None
               else GroupStateTimeout.NoTimeout)
    return (exploded.groupBy("band_id", "band_sig")
            .applyInPandasWithState(
                _bucket_fn(max_bucket, horizon_ms),
                OUT_SCHEMA, STATE_SCHEMA, "append", timeout))
