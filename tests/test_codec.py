"""Varint codec + posting-list compaction unit/property tests."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from slimsearch_spark.functions.codec import (decode_posting_list,
                                              decode_varint_array,
                                              encode_posting_list,
                                              encode_varint_array,
                                              merge_encoded_runs)


def test_varint_roundtrip_basic():
    v = np.array([0, 1, 127, 128, 300, 2 ** 32, 2 ** 63 - 1], dtype=np.uint64)
    assert (decode_varint_array(encode_varint_array(v)) == v).all()


def test_varint_empty():
    assert encode_varint_array(np.empty(0, np.uint64)) == b""
    assert decode_varint_array(b"").size == 0


def test_varint_single_byte_efficiency():
    v = np.ones(1000, dtype=np.uint64)
    assert len(encode_varint_array(v)) == 1000


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2 ** 62), max_size=200))
def test_varint_roundtrip_property(values):
    v = np.array(values, dtype=np.uint64)
    assert (decode_varint_array(encode_varint_array(v)) == v).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10 ** 12), st.integers(1, 1000)),
                min_size=0, max_size=100, unique_by=lambda x: x[0]))
def test_posting_list_roundtrip(pairs):
    doc_ids = np.array([p[0] for p in pairs], dtype=np.uint64)
    tfs = np.array([p[1] for p in pairs], dtype=np.uint64)
    db, tb = encode_posting_list(doc_ids, tfs)
    d, t = decode_posting_list(db, tb)
    order = np.argsort(doc_ids, kind="stable")
    assert (d == doc_ids[order]).all()
    assert (t == tfs[order]).all()


def test_delta_compression_is_compact():
    # dense sorted run → 1 byte per doc delta
    doc_ids = np.arange(10_000, dtype=np.uint64)
    tfs = np.ones(10_000, dtype=np.uint64)
    db, tb = encode_posting_list(doc_ids, tfs)
    assert len(db) < 10_100  # ~1 byte/doc vs 8 bytes raw
    assert len(tb) == 10_000


def test_merge_encoded_runs():
    runs = []
    expect_docs, expect_tfs = [], []
    for base in (0, 1000, 5000):
        d = np.arange(base, base + 50, dtype=np.uint64)
        t = (d % 7 + 1).astype(np.uint64)
        runs.append(encode_posting_list(d, t))
        expect_docs.append(d)
        expect_tfs.append(t)
    db, tb = merge_encoded_runs(runs)
    d, t = decode_posting_list(db, tb)
    assert (d == np.concatenate(expect_docs)).all()
    assert (t == np.concatenate(expect_tfs)).all()
