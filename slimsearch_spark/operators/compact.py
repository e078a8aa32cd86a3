"""Posting-list compaction: delta+varint binary lists with block-max
metadata, built with an explicit two-phase salted shuffle for hot-term skew.

North-rule items covered here:
* per-partition posting lists, delta + varint compressed
* salted term-hash shuffle with skew handling for stopword-like hot terms
* block-max metadata (per 128-doc block max tf) for WAND pruning

Phase 1 groups by (term, field_id, salt) where salt = doc_id // range —
a hot term's millions of postings split into bounded, contiguous doc_id
ranges, so no single reducer key explodes. Phase 2 merges the ordered runs
per (term, field_id): because salts are contiguous ranges, the merge is an
ordered concat + delta re-base, not a re-sort.

Encoding runs in Arrow-batched ``applyInPandas`` (numpy varint codec,
functions/codec.py) — vectorized, no per-row Python.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import IndexLayout
from ..functions.codec import (decode_posting_list, encode_posting_list,
                               encode_varint_array)

RUN_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("field_id", T.IntegerType()),
    T.StructField("salt", T.IntegerType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("doc_blob", T.BinaryType()),
    T.StructField("tf_blob", T.BinaryType()),
])

LIST_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("field_id", T.IntegerType()),
    T.StructField("df", T.IntegerType()),
    T.StructField("max_tf", T.IntegerType()),
    T.StructField("doc_blob", T.BinaryType()),
    T.StructField("tf_blob", T.BinaryType()),
    T.StructField("block_max_tf", T.BinaryType()),
    T.StructField("n_bytes", T.IntegerType()),
])


def _encode_run(pdf: pd.DataFrame) -> pd.DataFrame:
    doc_blob, tf_blob = encode_posting_list(
        pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy())
    return pd.DataFrame({
        "term": [pdf["term"].iloc[0]],
        "field_id": [pdf["field_id"].iloc[0]],
        "salt": [int(pdf["salt"].iloc[0])],
        "n": [len(pdf)],
        "doc_blob": [doc_blob],
        "tf_blob": [tf_blob],
    })


def _merge_runs(block_size: int):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("salt")
        docs_parts, tf_parts = [], []
        for doc_blob, tf_blob in zip(pdf["doc_blob"], pdf["tf_blob"]):
            d, t = decode_posting_list(doc_blob, tf_blob)
            docs_parts.append(d)
            tf_parts.append(t)
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        # salts are contiguous doc_id ranges → already globally sorted
        doc_blob, tf_blob = encode_posting_list(docs, tfs)
        n = len(docs)
        n_blocks = math.ceil(n / block_size) if n else 0
        bmax = np.zeros(n_blocks, dtype=np.uint64)
        for b in range(n_blocks):
            bmax[b] = tfs[b * block_size:(b + 1) * block_size].max()
        return pd.DataFrame({
            "term": [pdf["term"].iloc[0]],
            "field_id": [int(pdf["field_id"].iloc[0])],
            "df": [n],
            "max_tf": [int(tfs.max()) if n else 0],
            "doc_blob": [doc_blob],
            "tf_blob": [tf_blob],
            "block_max_tf": [encode_varint_array(bmax)],
            "n_bytes": [len(doc_blob) + len(tf_blob)],
        })
    return merge


def compact_posting_lists(postings: DataFrame,
                          layout: Optional[IndexLayout] = None,
                          max_doc_id: Optional[int] = None) -> DataFrame:
    """postings(term, field_id, doc_id, tf) → posting_lists(term, field_id,
    df, max_tf, doc_blob, tf_blob, block_max_tf, n_bytes)."""
    layout = layout or IndexLayout()
    if max_doc_id is None:
        max_doc_id = postings.agg(F.max("doc_id")).collect()[0][0] or 0
    range_size = max(1, (int(max_doc_id) + 1 + layout.hot_term_salts - 1)
                     // layout.hot_term_salts)
    salted = postings.withColumn(
        "salt", (F.col("doc_id") / F.lit(range_size)).cast("int"))
    runs = (salted
            .groupBy("term", "field_id", "salt")
            .applyInPandas(_encode_run, RUN_SCHEMA))
    # phase 2: ≤ hot_term_salts small rows per (term, field) — bounded keys
    lists = (runs
             .repartition(F.xxhash64("term"))
             .groupBy("term", "field_id")
             .applyInPandas(_merge_runs(layout.posting_block_size),
                            LIST_SCHEMA))
    return lists


EXPLODE_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("field_id", T.IntegerType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("tf", T.IntegerType()),
])


def explode_posting_lists(lists: DataFrame) -> DataFrame:
    """Inverse of compact_posting_lists — decode binary lists back to row
    postings (used by load + round-trip tests)."""
    def decode(iterator):
        for pdf in iterator:
            out_term, out_fid, out_doc, out_tf = [], [], [], []
            for term, fid, doc_blob, tf_blob in zip(
                    pdf["term"], pdf["field_id"], pdf["doc_blob"],
                    pdf["tf_blob"]):
                d, t = decode_posting_list(doc_blob, tf_blob)
                out_term.extend([term] * len(d))
                out_fid.extend([fid] * len(d))
                out_doc.extend(d.astype(np.int64).tolist())
                out_tf.extend(t.astype(np.int64).tolist())
            yield pd.DataFrame({"term": out_term, "field_id": out_fid,
                                "doc_id": out_doc, "tf": out_tf})
    return lists.mapInPandas(decode, EXPLODE_SCHEMA)
