"""Multimodal plumbing + streaming incremental build tests."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from slimsearch_spark.config import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex
from slimsearch_spark.operators.multimodal import (decode_image,
                                                   extract_features,
                                                   fake_feature, synth_media)
from slimsearch_spark.sources.corpus import synth_corpus
from slimsearch_spark.streaming.incremental import stream_build


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_media_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark arrow batch"), (3, "")],
        "doc_id long, text string")
    media = synth_media(docs)
    assert [f.name for f in media.schema.fields] == \
        ["media_id", "kind", "mime", "payload", "meta"]
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["n_bytes"] == len(b"hello world")
    expect = fake_feature(b"hello world")
    assert np.allclose(feats[1]["feature"], expect, atol=1e-6)
    assert feats[3]["n_bytes"] == 0
    assert feats[1]["byte_mean"] == pytest.approx(
        float(np.frombuffer(b"hello world", np.uint8).mean()))


def test_stream_build_matches_batch(spark, tmp_path):
    corpus = synth_corpus(spark, 120, tokens_per_file=40)
    src = str(tmp_path / "src")
    # three parquet files → three-ish input splits
    corpus.repartition(3).write.parquet(src)
    out = str(tmp_path / "streamed")
    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo", "lang"])
    stream_build(spark, src, out, cfg,
                 schema=spark.read.parquet(src).schema, available_now=True)

    postings = spark.read.parquet(f"{out}/postings")
    doc_stats = spark.read.parquet(f"{out}/doc_stats")
    docs = spark.read.parquet(f"{out}/docs")
    assert docs.count() == 120

    from slimsearch_spark.operators.build import corpus_stats
    avg_len, _ = corpus_stats(doc_stats)
    idx = SparkSearchIndex(spark, cfg, postings, doc_stats, docs,
                           doc_count=120, avg_field_length=avg_len,
                           next_id=0, cache=False)
    batch_idx = SparkSearchIndex.build(corpus, cfg,
                                       order_cols=["repo", "path"])
    q = "parse tokenizer varint"
    a = idx.search(q)
    b = batch_idx.search(q)
    # same docs, same scores (doc_ids differ — compare by external id)
    assert {(r["id"], round(r["score"], 9)) for r in a} == \
        {(r["id"], round(r["score"], 9)) for r in b}


def test_decode_image_optional_dependency():
    """decode_image is a real decoder behind an import-try (round 3):
    with Pillow absent it raises the documented NotImplementedError; with
    Pillow present it decodes to HxWxC uint8 and image_feature matches
    fake_feature's output shape."""
    import numpy as np
    import pytest
    from slimsearch_spark.operators import multimodal as mm
    if mm._PILImage is None:
        with pytest.raises(NotImplementedError, match="imaging library"):
            mm.decode_image(b"not-an-image")
        return
    import io
    im = mm._PILImage.new("RGB", (4, 3), color=(10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    px = mm.decode_image(buf.getvalue())
    assert px.shape == (3, 4, 3) and px.dtype == np.uint8
    feat = mm.image_feature(buf.getvalue(), dim=8)
    assert feat.shape == (8,) and feat.dtype == np.float32
