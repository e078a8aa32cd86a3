"""Stateful streaming near-dup candidates: per-row signature parity with
the batch MinHash pipeline, batch-equality of the drained candidate set,
bucket-cap semantics, replay idempotence, and event-time state expiry."""

import pytest

from pyspark.sql import functions as F

from slimsearch_spark.operators import dedup as dd
from slimsearch_spark.streaming.near_dup import (band_keys_py, bands_df,
                                                 stream_near_dup_candidates)

BASE = "the quick brown fox jumps over the lazy dog tonight"
CORPUS = [
    (1, BASE),
    (2, BASE),                                              # exact dup of 1
    (3, BASE.replace("dog", "cat")),                        # near dup
    (4, BASE.replace("quick", "slow")),                     # near dup
    (5, "completely different content about spark engines today"),
    (6, "completely different content about spark engines today"),  # dup of 5
    (7, "short text"),                                      # no 3-shingles? has 0? (2 tokens -> none)
    (8, BASE.replace("jumps", "leaps").replace("dog", "cat")),
]


def _write_files(spark, path, rows_per_file):
    for chunk in rows_per_file:
        (spark.createDataFrame(chunk, "doc_id long, text string")
         .coalesce(1).write.mode("append").parquet(path))


def _drain(spark, src, sink_name, schema="doc_id long, text string",
           **kwargs):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)    # one file = one batch
              .parquet(src))
    out = stream_near_dup_candidates(stream, **kwargs)
    q = (out.writeStream.format("memory").queryName(sink_name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.table(sink_name)


def test_band_keys_parity_with_batch(spark):
    """Per-doc (band_id, band_sig) from the Python per-row path must be
    bit-identical to batch doc_shingles → minhash_signatures →
    _lsh_bands."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    sigs = dd.minhash_signatures(dd.doc_shingles(docs, 3), 8)
    batch = dd._lsh_bands(sigs, 8, 2, max_bucket=0)
    got_batch = {}
    for r in batch.collect():
        got_batch.setdefault(r["doc_id"], set()).add(
            (r["band_id"], r["band_sig"]))
    for doc_id, text in CORPUS:
        py = set(band_keys_py(text, 8, 2, 3))
        assert py == got_batch.get(doc_id, set()), f"doc {doc_id}"
    # empty / sub-shingle docs land in no bucket
    assert band_keys_py(None, 8, 2, 3) == []
    assert band_keys_py("one two", 8, 2, 3) == []


def test_bands_df_matches_per_row(spark):
    """The SQL band path (what the stream actually runs) must be
    bit-identical to the pure-Python reference, including empty / None /
    sub-shingle rows, across (k, rows_per_band, shingle_n) shapes."""
    texts = ([None, "", "one two"] + [t for _, t in CORPUS]
             + ["one two three", None, BASE * 4, "x y z " * 20])
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k, rpb, n in ((8, 2, 3), (16, 4, 2), (8, 1, 5)):
        got = {}
        for r in bands_df(docs, k=k, rows_per_band=rpb,
                          shingle_n=n).collect():
            got.setdefault(r["doc_id"], set()).add(
                (r["band_id"], r["band_sig"]))
        for i, t in rows:
            assert got.get(i, set()) == set(
                band_keys_py(t, k, rpb, n)), (i, k, rpb, n)
    with pytest.raises(ValueError):
        bands_df(docs, k=7, rows_per_band=2)
    with pytest.raises(ValueError):
        bands_df(docs, k=32)


def test_stream_candidates_match_batch(spark, tmp_path):
    """Distinct (a, b) drained from the stream == batch
    lsh_candidate_pairs, however the corpus is split into batches."""
    src = str(tmp_path / "src")
    _write_files(spark, src, [CORPUS[:3], CORPUS[3:6], CORPUS[6:]])
    got = _drain(spark, src, "nd_sink")
    stream_pairs = {(r["a"], r["b"])
                    for r in got.select("a", "b").distinct().collect()}
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    sigs = dd.minhash_signatures(dd.doc_shingles(docs, 3), 8)
    batch_pairs = {(r["a"], r["b"])
                   for r in dd.lsh_candidate_pairs(sigs).collect()}
    assert stream_pairs == batch_pairs
    # sanity: the corpus actually produces collisions (exact dups always
    # agree in every band)
    assert (1, 2) in stream_pairs and (5, 6) in stream_pairs


def test_stream_bucket_cap(spark, tmp_path):
    """A bucket at max_bucket stops growing and emitting: n identical
    docs with cap 3 yield exactly C(3,2) pairs among the first arrivals."""
    src = str(tmp_path / "srccap")
    rows = [(i, BASE) for i in range(1, 7)]
    _write_files(spark, src, [rows[:3], rows[3:]])
    got = _drain(spark, src, "nd_cap_sink", max_bucket=3)
    pairs = {(r["a"], r["b"])
             for r in got.select("a", "b").distinct().collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_stream_replay_idempotent(spark, tmp_path):
    """A doc_id arriving twice (replayed file) adds no membership and
    re-emits nothing."""
    src = str(tmp_path / "srcrep")
    _write_files(spark, src, [[(1, BASE), (2, BASE)], [(1, BASE)]])
    got = _drain(spark, src, "nd_rep_sink")
    rows = got.select("a", "b").distinct().collect()
    assert {(r["a"], r["b"]) for r in rows} == {(1, 2)}
    # and per band, the (1,2) pair was emitted exactly once (no re-emit
    # when doc 1 replays)
    per_band = (got.groupBy("band_id").count().collect())
    assert all(r["count"] == 1 for r in per_band)


def test_stream_state_expiry(spark, tmp_path):
    """With (event_time_col, within), a bucket untouched past the horizon
    expires: a later duplicate no longer pairs with the expired member."""
    src = str(tmp_path / "srcexp")
    other = "completely different content about spark engines today"
    files = [
        [(1, BASE, "2026-01-01 00:00:00")],
        # unrelated docs advance the watermark well past 00:00 + 1 hour
        [(50, other, "2026-01-01 05:00:00")],
        [(51, other + " again", "2026-01-01 06:00:00")],
        # doc 1's buckets had no data while the watermark crossed their
        # timeout -> expired before this duplicate arrives
        [(2, BASE, "2026-01-01 06:30:00")],
    ]
    for chunk in files:
        (spark.createDataFrame(chunk, "doc_id long, text string, ts string")
         .withColumn("ts", F.to_timestamp("ts"))
         .coalesce(1).write.mode("append").parquet(src))
    got = _drain(spark, src, "nd_exp_sink",
                 schema="doc_id long, text string, ts timestamp",
                 event_time_col="ts", within="1 hour")
    pairs = {(r["a"], r["b"])
             for r in got.select("a", "b").distinct().collect()}
    assert (1, 2) not in pairs
    # no pair involves the expired doc at all (docs 50/51 are free to
    # pair with each other — they really are near-dups)
    assert not any(1 in p or 2 in p for p in pairs)


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_stream_candidates_match_batch_random(spark, tmp_path, seed):
    """Seeded random corpora (mutated sentence families, random micro-batch
    splits) keep the batch-equality contract — corners the fixed corpus
    misses: singleton buckets, docs in no bucket, families spanning every
    batch boundary."""
    import random
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    rows = []
    doc_id = 0
    for _fam in range(rng.randint(3, 5)):
        base = [rng.choice(words) for _ in range(rng.randint(4, 9))]
        for _v in range(rng.randint(1, 4)):
            variant = list(base)
            for _m in range(rng.randint(0, 2)):
                variant[rng.randrange(len(variant))] = rng.choice(words)
            rows.append((doc_id, " ".join(variant)))
            doc_id += 1
    rng.shuffle(rows)
    cut1, cut2 = sorted(rng.sample(range(len(rows) + 1), 2))
    chunks = [c for c in (rows[:cut1], rows[cut1:cut2], rows[cut2:]) if c]
    src = str(tmp_path / f"srcrnd{seed}")
    _write_files(spark, src, chunks)
    got = _drain(spark, src, f"nd_rnd_sink_{seed}")
    stream_pairs = {(r["a"], r["b"])
                    for r in got.select("a", "b").distinct().collect()}
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dd.minhash_signatures(dd.doc_shingles(docs, 3), 8)
    batch_pairs = {(r["a"], r["b"])
                   for r in dd.lsh_candidate_pairs(sigs).collect()}
    assert stream_pairs == batch_pairs


def test_stream_near_dup_arg_validation(spark):
    df = spark.createDataFrame([(1, "aa bb cc dd")],
                               "doc_id long, text string")
    with pytest.raises(ValueError):
        stream_near_dup_candidates(df, event_time_col="ts")
    with pytest.raises(ValueError):
        stream_near_dup_candidates(df, within="1 hour")
    with pytest.raises(ValueError):
        stream_near_dup_candidates(df, k=8, rows_per_band=3)
    with pytest.raises(ValueError, match="within"):
        stream_near_dup_candidates(df, event_time_col="ts",
                                   within="1 fortnight")
