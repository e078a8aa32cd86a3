"""Posting-list compaction: delta+varint binary lists with block-max
metadata, built with an explicit two-phase salted shuffle for hot-term skew.

North-rule items covered here:
* per-partition posting lists, delta + varint compressed
* salted term-hash shuffle with skew handling for stopword-like hot terms
* block-max metadata + per-block byte offsets for WAND physical block skip

Phase 1 groups by (term, field_id, salt) where salt = doc_id // range —
a hot term's millions of postings split into bounded, contiguous doc_id
ranges, so no single reducer key explodes. Phase 2 merges the ordered runs
per (term, field_id): because salts are contiguous ranges, the merge is an
ordered concat + delta re-base, not a re-sort.

Blocks are aligned to the absolute doc-id grid (``doc_id //
block_doc_range``), NOT fixed-count: a block never straddles a doc-range
shard boundary, so the distributed WAND scorer (plans/wand.py) can route
whole blocks to shards by slicing byte ranges — no decode, no split. The
per-posting field length is inlined (``fl_blob``) so BM25 scoring over the
compacted index needs no doc_stats join (norms travel with the postings).

Encoding runs in Arrow-batched ``applyInPandas`` (numpy varint codec,
functions/codec.py) — vectorized, no per-row Python.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import IndexLayout
from ..functions.codec import (decode_blocked_posting_list,
                               decode_posting_list, decode_varint_array,
                               encode_blocked_posting_list,
                               encode_posting_list, encode_varint_array)

RUN_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("field_id", T.IntegerType()),
    T.StructField("salt", T.IntegerType()),
    T.StructField("n", T.IntegerType()),
    T.StructField("doc_blob", T.BinaryType()),
    T.StructField("tf_blob", T.BinaryType()),
    T.StructField("fl_blob", T.BinaryType()),
])

LIST_SCHEMA = T.StructType([
    T.StructField("term", T.StringType()),
    T.StructField("field_id", T.IntegerType()),
    T.StructField("df", T.IntegerType()),
    T.StructField("max_tf", T.IntegerType()),
    T.StructField("n_blocks", T.IntegerType()),
    T.StructField("doc_blob", T.BinaryType()),
    T.StructField("tf_blob", T.BinaryType()),
    T.StructField("fl_blob", T.BinaryType()),
    T.StructField("block_g", T.BinaryType()),
    T.StructField("block_n", T.BinaryType()),
    T.StructField("doc_off", T.BinaryType()),
    T.StructField("tf_off", T.BinaryType()),
    T.StructField("fl_off", T.BinaryType()),
    T.StructField("block_max_tf", T.BinaryType()),
    T.StructField("block_min_fl", T.BinaryType()),
    T.StructField("block_impact", T.BinaryType()),
    T.StructField("enc_k", T.DoubleType()),
    T.StructField("enc_b", T.DoubleType()),
    T.StructField("enc_avg_len", T.DoubleType()),
    T.StructField("n_bytes", T.IntegerType()),
])


def _encode_run(pdf: pd.DataFrame) -> pd.DataFrame:
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_blob, tf_blob = encode_posting_list(
        pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy())
    fls = pdf["field_len"].to_numpy()[order].astype(np.uint64)
    return pd.DataFrame({
        "term": [pdf["term"].iloc[0]],
        "field_id": [pdf["field_id"].iloc[0]],
        "salt": [int(pdf["salt"].iloc[0])],
        "n": [len(pdf)],
        "doc_blob": [doc_blob],
        "tf_blob": [tf_blob],
        "fl_blob": [encode_varint_array(fls)],
    })


def _merge_runs(block_doc_range: int, bm25: Optional[dict] = None,
                avg_by_fid: Optional[dict] = None):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("salt")
        docs_parts, tf_parts, fl_parts = [], [], []
        for doc_blob, tf_blob, fl_blob in zip(
                pdf["doc_blob"], pdf["tf_blob"], pdf["fl_blob"]):
            d, t = decode_posting_list(doc_blob, tf_blob)
            docs_parts.append(d)
            tf_parts.append(t)
            fl_parts.append(decode_varint_array(fl_blob))
        # salts are contiguous doc_id ranges → already globally sorted
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        fls = np.concatenate(fl_parts)
        fid = int(pdf["field_id"].iloc[0])
        impact_params = None
        enc_k = enc_b = enc_avg = None
        if bm25 is not None and avg_by_fid is not None \
                and fid in avg_by_fid and avg_by_fid[fid] > 0:
            enc_k, enc_b = float(bm25["k"]), float(bm25["b"])
            enc_avg = float(avg_by_fid[fid])
            impact_params = (enc_k, enc_b, enc_avg)
        enc = encode_blocked_posting_list(docs, tfs, fls, block_doc_range,
                                          impact_params=impact_params)
        return pd.DataFrame({
            "term": [pdf["term"].iloc[0]],
            "field_id": [fid],
            "df": [enc["n"]],
            "max_tf": [enc["max_tf"]],
            "n_blocks": [enc["n_blocks"]],
            "doc_blob": [enc["doc_blob"]],
            "tf_blob": [enc["tf_blob"]],
            "fl_blob": [enc["fl_blob"]],
            "block_g": [enc["block_g"]],
            "block_n": [enc["block_n"]],
            "doc_off": [enc["doc_off"]],
            "tf_off": [enc["tf_off"]],
            "fl_off": [enc["fl_off"]],
            "block_max_tf": [enc["block_max_tf"]],
            "block_min_fl": [enc["block_min_fl"]],
            "block_impact": [enc["block_impact"]],
            "enc_k": [enc_k],
            "enc_b": [enc_b],
            "enc_avg_len": [enc_avg],
            "n_bytes": [len(enc["doc_blob"]) + len(enc["tf_blob"])
                        + len(enc["fl_blob"])],
        })
    return merge


def compact_posting_lists(postings: DataFrame,
                          layout: Optional[IndexLayout] = None,
                          max_doc_id: Optional[int] = None,
                          doc_stats: Optional[DataFrame] = None,
                          bm25: Optional[dict] = None,
                          avg_field_length: Optional[dict] = None
                          ) -> DataFrame:
    """postings(term, field_id, doc_id, tf) [⋈ doc_stats for inline norms]
    → posting_lists(term, field_id, df, max_tf, blobs..., block metadata).

    With ``bm25`` + ``avg_field_length`` (or derivable from ``doc_stats``),
    each block also stores the classic block-max float impact bound
    (max tf/(tf + k(1-b+b·fl/avg))) plus the encode params, so WAND
    θ-pruning is tight even on flat-tf corpora; queries with different
    params fall back to the parameter-free (max_tf, min_fl) bound."""
    from ..config import DEFAULT_BM25
    from .. import ensure_workers
    ensure_workers(postings.sparkSession)
    layout = layout or IndexLayout()
    if max_doc_id is None:
        max_doc_id = postings.agg(F.max("doc_id")).collect()[0][0] or 0
    if doc_stats is not None:
        if "field_len" not in postings.columns:
            # saved-layout postings: fetch lengths via the stats join;
            # built postings carry field_len denormalized (build_postings,
            # round 6) and skip the join entirely
            postings = postings.join(doc_stats, ["doc_id", "field_id"],
                                     "left")
        postings = postings.withColumn(
            "field_len", F.coalesce("field_len", F.lit(0)))
        if avg_field_length is None:
            avg_field_length = {
                int(r["field_id"]): float(r["avg"]) for r in
                doc_stats.groupBy("field_id")
                .agg(F.avg("field_len").alias("avg")).collect()}
        if bm25 is None:
            bm25 = dict(DEFAULT_BM25)
    else:
        # no stats: parameter-free bound — fl=0 everywhere, even when the
        # posting rows carry field_len (keeps the encoded bytes identical
        # to the pre-denormalization layout)
        postings = postings.withColumn("field_len", F.lit(0))
        avg_field_length = None  # fl=0 everywhere → impact adds nothing
    avg_by_fid = ({int(k): float(v) for k, v in avg_field_length.items()}
                  if avg_field_length else None)
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
             .applyInPandas(_merge_runs(layout.block_doc_range,
                                        bm25=bm25, avg_by_fid=avg_by_fid),
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
            for _, row in pdf.iterrows():
                d, t, _fl = decode_blocked_posting_list(row)
                out_term.extend([row["term"]] * len(d))
                out_fid.extend([row["field_id"]] * len(d))
                out_doc.extend(d.astype(np.int64).tolist())
                out_tf.extend(t.astype(np.int64).tolist())
            yield pd.DataFrame({"term": out_term, "field_id": out_fid,
                                "doc_id": out_doc, "tf": out_tf})
    return lists.mapInPandas(decode, EXPLODE_SCHEMA)
