"""Distributed block-max WAND top-k over compacted posting lists.

North-rule item: "posting-list intersection with block-max WAND pruning and
a distributed top-k heap merge". The reference has no top-k at all (it
returns every match, src/search.ts:169-209); this is the scale path that
makes the same BM25 ranking answerable over 10^12 files.

Plan shape (3 stages, all vectorized numpy inside Arrow-batched UDFs):

  1. **Route** (mapInPandas): matched compacted lists → doc-range shards.
     Blocks are aligned to the absolute doc-id grid (operators/compact.py),
     so a shard's postings are a contiguous *byte slice* of each term's
     blobs — no decode, no split. Shard count scales with cluster cores.
  2. **Prune + score** (applyInPandas per shard, the per-partition "heap"):
       a. per-block BM25 upper bounds from block-max tf (field_len→0 bound);
       b. a θ seed = k-th best exact partial score of the rarest term's
          postings (a lower bound of the true k-th final score);
       c. candidate docs = docs in blocks whose bound can reach θ
          (every dropped doc provably scores < θ);
       d. exact BM25 for candidates only, decoding only the blocks whose
          doc-grid cells contain a candidate (physical block skip);
       e. local top-k.
  3. **Merge**: global orderBy(score desc, doc_id).limit(k) — Spark's
     TakeOrderedAndProject = per-partition heaps + driver merge.

Scoring matches the reference kernel exactly (BM25+ src/utils.ts:136-152,
quality multiplier src/search.ts:186-191): correctness tests assert the WAND
top-k equals the full-sort prefix of the unpruned plan.
"""

from __future__ import annotations

import math
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_BM25, IndexLayout
from ..functions.codec import decode_block_meta, decode_blocks

SHARD_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("query_term", T.StringType()),
    T.StructField("derived_term", T.StringType()),
    T.StructField("wmult", T.DoubleType()),
    T.StructField("idf", T.DoubleType()),
    T.StructField("block_g", T.ArrayType(T.LongType())),
    T.StructField("block_n", T.ArrayType(T.IntegerType())),
    T.StructField("block_max", T.ArrayType(T.IntegerType())),
    T.StructField("doc_blob", T.BinaryType()),
    T.StructField("tf_blob", T.BinaryType()),
    T.StructField("fl_blob", T.BinaryType()),
    T.StructField("doc_off", T.ArrayType(T.LongType())),
    T.StructField("tf_off", T.ArrayType(T.LongType())),
    T.StructField("fl_off", T.ArrayType(T.LongType())),
])

TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("score", T.DoubleType()),
])


def _route_stage(exp_by_term: Dict[str, List[Tuple[str, float]]],
                 doc_count: int, blocks_per_shard: int):
    """mapInPandas fn: slice each matched list row into per-shard byte
    ranges. ``exp_by_term``: derived_term → [(query_term, wmult)]."""

    def route(iterator):
        for pdf in iterator:
            out: Dict[str, list] = {f.name: [] for f in SHARD_SCHEMA.fields}
            for _, row in pdf.iterrows():
                expansions = exp_by_term.get(row["term"])
                if not expansions:
                    continue
                df_t = float(row["df"])
                idf = math.log(1 + (doc_count - df_t + 0.5) / (df_t + 0.5))
                g, bn, d_off, t_off, f_off, bmax = decode_block_meta(row)
                if g.size == 0:
                    continue
                shard = (g // np.uint64(blocks_per_shard)).astype(np.int64)
                # shards are contiguous index runs (g is ascending)
                starts = np.concatenate(
                    ([0], np.nonzero(np.diff(shard))[0] + 1))
                ends = np.concatenate((starts[1:], [g.size]))
                d_end = np.concatenate(
                    (d_off[1:], [len(row["doc_blob"])])).astype(np.int64)
                t_end = np.concatenate(
                    (t_off[1:], [len(row["tf_blob"])])).astype(np.int64)
                f_end = np.concatenate(
                    (f_off[1:], [len(row["fl_blob"])])).astype(np.int64)
                for s, e in zip(starts, ends):
                    db = row["doc_blob"][int(d_off[s]):int(d_end[e - 1])]
                    tb = row["tf_blob"][int(t_off[s]):int(t_end[e - 1])]
                    fb = row["fl_blob"][int(f_off[s]):int(f_end[e - 1])]
                    for query_term, wmult in expansions:
                        out["shard"].append(int(shard[s]))
                        out["query_term"].append(query_term)
                        out["derived_term"].append(row["term"])
                        out["wmult"].append(float(wmult))
                        out["idf"].append(idf)
                        out["block_g"].append(
                            g[s:e].astype(np.int64).tolist())
                        out["block_n"].append(
                            bn[s:e].astype(np.int32).tolist())
                        out["block_max"].append(
                            bmax[s:e].astype(np.int32).tolist())
                        out["doc_blob"].append(db)
                        out["tf_blob"].append(tb)
                        out["fl_blob"].append(fb)
                        out["doc_off"].append(
                            (d_off[s:e] - d_off[s]).astype(np.int64).tolist())
                        out["tf_off"].append(
                            (t_off[s:e] - t_off[s]).astype(np.int64).tolist())
                        out["fl_off"].append(
                            (f_off[s:e] - f_off[s]).astype(np.int64).tolist())
            yield pd.DataFrame(out)

    return route


def _score_exact(tf: np.ndarray, fl: np.ndarray, idf: float, wmult: float,
                 avg_len: float, bm25: Mapping[str, float]) -> np.ndarray:
    k, b, d = float(bm25["k"]), float(bm25["b"]), float(bm25["d"])
    tf = tf.astype(np.float64)
    norm = tf + k * (1.0 - b + b * fl.astype(np.float64) / avg_len)
    return wmult * idf * (d + tf * (k + 1.0) / norm)


def _ub_block(block_max: np.ndarray, idf: float, wmult: float,
              bm25: Mapping[str, float]) -> np.ndarray:
    """Per-block score upper bound: max tf with the minimal norm
    (field_len→0) — monotone in tf, ≥ any true in-block score."""
    k, b, d = float(bm25["k"]), float(bm25["b"]), float(bm25["d"])
    m = block_max.astype(np.float64)
    return wmult * idf * (d + m * (k + 1.0) / (m + k * (1.0 - b)))


def _slice_of_row(row) -> dict:
    return {
        "qt": row["query_term"],
        "wmult": float(row["wmult"]),
        "idf": float(row["idf"]),
        "g": np.asarray(row["block_g"], dtype=np.int64),
        "bn": np.asarray(row["block_n"], dtype=np.uint64),
        "bmax": np.asarray(row["block_max"], dtype=np.int64),
        "d_off": np.asarray(row["doc_off"], dtype=np.uint64),
        "t_off": np.asarray(row["tf_off"], dtype=np.uint64),
        "f_off": np.asarray(row["fl_off"], dtype=np.uint64),
        "doc_blob": row["doc_blob"],
        "tf_blob": row["tf_blob"],
        "fl_blob": row["fl_blob"],
        "n": int(np.asarray(row["block_n"]).sum()),
        "_dec": {},   # block idx -> (docs, tfs, fls): decode-once cache
    }


def _fetch_blocks(s: dict, which: np.ndarray, acc_decoded=None):
    """Decode the requested blocks of one slice, at most once per block
    (physical skip = blocks never requested are never decoded)."""
    missing = np.asarray([b for b in which if b not in s["_dec"]],
                         dtype=np.int64)
    if missing.size:
        if acc_decoded is not None:
            acc_decoded.add(int(missing.size))
        d, t, f = decode_blocks(s["doc_blob"], s["tf_blob"], s["fl_blob"],
                                s["d_off"], s["t_off"], s["f_off"],
                                s["bn"], missing)
        splits = np.cumsum(s["bn"][missing].astype(np.int64))[:-1]
        for b, dd, tt, ff in zip(missing, np.split(d, splits),
                                 np.split(t, splits), np.split(f, splits)):
            s["_dec"][int(b)] = (dd, tt, ff)
    if not len(which):
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    parts = [s["_dec"][int(b)] for b in which]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


def _theta0_stage(exp_by_term: Dict[str, List[Tuple[str, float]]],
                  doc_count: int, avg_len: float,
                  bm25: Mapping[str, float], k_top: int, acc_decoded=None):
    """mapInPandas fn for the global-θ pre-pass over the raw matched lists:
    per term, decode only the highest-impact blocks (by block-max upper
    bound) until they cover ≥ k docs, emit (doc_id, exact partial score).

    The caller reduces to max(partial) PER DISTINCT DOC before taking the
    k-th largest: a doc matching several query terms contributes one partial
    per term, and pooling them without doc identity could place the same doc
    in the "top k" more than once, inflating θ0 above the true k-th final
    score (over-pruning). With the per-doc max, the k-th value covers k
    distinct docs, each of whose final score ≥ its max partial (partials are
    positive and quality ≥ 1) — a valid lower bound of the true k-th final
    score."""

    def run(iterator):
        for pdf in iterator:
            out_d: List[np.ndarray] = []
            out_s: List[np.ndarray] = []
            for _, row in pdf.iterrows():
                expansions = exp_by_term.get(row["term"])
                if not expansions:
                    continue
                df_t = float(row["df"])
                if df_t <= 0:
                    continue
                idf = math.log(1 + (doc_count - df_t + 0.5) / (df_t + 0.5))
                g, bn, d_off, t_off, f_off, bmax = decode_block_meta(row)
                wmult = max(w for _, w in expansions)
                ub = _ub_block(bmax.astype(np.int64), idf, wmult, bm25)
                order = np.argsort(-ub, kind="stable")
                covered, take = 0, []
                for b in order:
                    take.append(int(b))
                    covered += int(bn[b])
                    if covered >= k_top:
                        break
                which = np.sort(np.asarray(take, dtype=np.int64))
                if acc_decoded is not None:
                    acc_decoded.add(int(which.size))
                d, t, f = decode_blocks(
                    row["doc_blob"], row["tf_blob"], row["fl_blob"],
                    d_off, t_off, f_off, bn, which)
                scores = _score_exact(t, f, idf, wmult, avg_len, bm25)
                if scores.size > k_top:
                    keep = np.argpartition(scores, -k_top)[-k_top:]
                    d, scores = d[keep], scores[keep]
                out_d.append(d.astype(np.int64))
                out_s.append(scores)
            if out_d:
                yield pd.DataFrame({
                    "doc_id": np.concatenate(out_d),
                    "s": np.concatenate(out_s)})
            else:
                yield pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="float64")})

    return run


def _shard_stage(k_top: int, n_query_terms: int, avg_len: float,
                 bm25: Mapping[str, float], block_doc_range: int,
                 theta0: float = 0.0,
                 acc_blocks_total=None, acc_blocks_decoded=None):
    """applyInPandas fn: per-shard block-max prune + exact top-k.

    θ = max(global θ0 from the pre-pass, local seed from the rarest slice).
    Blocks decode at most once per shard (``_fetch_blocks`` cache); the
    accumulators count blocks present vs. physically decoded."""

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        slices = [s for s in (_slice_of_row(r) for _, r in pdf.iterrows())
                  if s["n"]]
        if not slices:
            return _empty()
        if acc_blocks_total is not None:
            acc_blocks_total.add(int(sum(s["bn"].size for s in slices)))

        for s in slices:
            s["ub"] = _ub_block(s["bmax"], s["idf"], s["wmult"], bm25)
            s["ub_max"] = float(s["ub"].max()) if s["ub"].size else 0.0

        theta = float(theta0)
        if len(slices) > 1:
            # local refinement: exact partials of the rarest slice
            seed = min(slices, key=lambda s: s["n"])
            _, st, sf = _fetch_blocks(
                seed, np.arange(seed["bn"].size, dtype=np.int64),
                acc_blocks_decoded)
            seed_scores = _score_exact(st, sf, seed["idf"], seed["wmult"],
                                       avg_len, bm25)
            if seed_scores.size >= k_top:
                theta = max(theta, float(
                    np.partition(seed_scores, -k_top)[-k_top]))

        # candidate docs: blocks whose bound can still reach θ
        ub_sum = sum(s["ub_max"] for s in slices)
        cand_parts = []
        for s in slices:
            rest = ub_sum - s["ub_max"]
            keep = np.nonzero(
                n_query_terms * (s["ub"] + rest) >= theta)[0]
            if keep.size:
                d, _, _ = _fetch_blocks(s, keep, acc_blocks_decoded)
                cand_parts.append(d.astype(np.int64))
        if not cand_parts:
            return _empty()
        candidates = np.unique(np.concatenate(cand_parts))
        cand_cells = np.unique(candidates // np.int64(block_doc_range))

        # exact scoring of candidates across ALL slices (decode only blocks
        # whose grid cell holds a candidate — physical block skip)
        doc_parts, score_parts, qt_parts = [], [], []
        for s in slices:
            need = np.nonzero(np.isin(s["g"], cand_cells))[0]
            if not need.size:
                continue
            d, t, fl = _fetch_blocks(s, need, acc_blocks_decoded)
            d = d.astype(np.int64)
            mask = np.isin(d, candidates)
            if not mask.any():
                continue
            doc_parts.append(d[mask])
            score_parts.append(_score_exact(t[mask], fl[mask], s["idf"],
                                            s["wmult"], avg_len, bm25))
            qt_parts.append(np.full(int(mask.sum()), s["qt"], dtype=object))

        if not doc_parts:
            return _empty()
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        qts = np.concatenate(qt_parts)
        agg = (pd.DataFrame({"doc_id": docs, "s": scores, "qt": qts})
               .groupby("doc_id")
               .agg(raw=("s", "sum"), q=("qt", "nunique"))
               .reset_index())
        agg["score"] = agg["raw"] * agg["q"]
        agg = agg.sort_values(["score", "doc_id"],
                              ascending=[False, True]).head(k_top)
        return agg[["doc_id", "score"]]

    return score_shard


def wand_topk(posting_lists: DataFrame,
              expansion_rows: Sequence[tuple],
              k_top: int,
              doc_count: int,
              avg_field_length: Mapping[int, float],
              field_id: int = 0,
              field_boost: float = 1.0,
              bm25: Optional[Mapping[str, float]] = None,
              layout: Optional[IndexLayout] = None,
              max_doc_id: Optional[int] = None,
              n_shards: Optional[int] = None,
              metrics: Optional[dict] = None) -> DataFrame:
    """Top-k BM25 OR-query over compacted posting lists with block-max
    pruning. ``expansion_rows``: (branch, query_term, derived_term, rank,
    weight, term_boost) as produced by the engine's expansion planner.

    Returns DataFrame(doc_id, score) — the global top-k, reference-identical
    scores (quality multiplier included).

    Pass ``metrics={}`` to receive pruning-evidence accumulators: after an
    action, ``metrics["blocks_total"].value`` / ``["blocks_decoded"].value``
    report posting blocks present vs. physically decoded.
    """
    layout = layout or IndexLayout()
    bm25 = dict(DEFAULT_BM25, **(bm25 or {}))
    spark = posting_lists.sparkSession

    exp_by_term: Dict[str, List[Tuple[str, float]]] = {}
    query_terms = set()
    for (_b, query_term, derived_term, _r, weight, term_boost) in expansion_rows:
        query_terms.add(query_term)
        exp_by_term.setdefault(derived_term, []).append(
            (query_term, float(weight) * float(term_boost) * field_boost))
    if not exp_by_term:
        return spark.createDataFrame([], TOPK_SCHEMA)

    matched = (posting_lists
               .where((F.col("field_id") == field_id)
                      & F.col("term").isin(list(exp_by_term))))

    if max_doc_id is None:
        max_doc_id = doc_count  # dense row_number ids → count bounds max
    if n_shards is None:
        n_shards = max(1, spark.sparkContext.defaultParallelism
                       * layout.wand_ranges_per_core)
    n_grid = max_doc_id // layout.block_doc_range + 1
    blocks_per_shard = max(1, math.ceil(n_grid / n_shards))

    acc_total = acc_decoded = None
    if metrics is not None:
        acc_total = spark.sparkContext.accumulator(0)
        acc_decoded = spark.sparkContext.accumulator(0)
        metrics["blocks_total"] = acc_total
        metrics["blocks_decoded"] = acc_decoded

    avg_len = float(avg_field_length.get(field_id, 1.0))

    # global-θ pre-pass: exact partials from each term's top-impact blocks;
    # the k-th largest seeds every shard's threshold. matched is re-read by
    # the main pass — it is the term-pruned scan (a few lists), not cached,
    # to avoid leaking per-query cache entries
    theta0 = 0.0
    top = (matched
           .mapInPandas(_theta0_stage(exp_by_term, doc_count, avg_len,
                                      bm25, k_top, acc_decoded),
                        T.StructType([T.StructField("doc_id", T.LongType()),
                                      T.StructField("s", T.DoubleType())]))
           # max partial per DISTINCT doc before the k-th largest — see
           # _theta0_stage: pooling partials without doc identity would let
           # one doc fill several of the top-k slots and over-prune
           .groupBy("doc_id").agg(F.max("s").alias("s"))
           .orderBy(F.desc("s")).limit(k_top).collect())
    if len(top) >= k_top:
        theta0 = float(top[-1]["s"])

    routed = matched.mapInPandas(
        _route_stage(exp_by_term, doc_count, blocks_per_shard), SHARD_SCHEMA)
    local = routed.groupBy("shard").applyInPandas(
        _shard_stage(k_top, len(query_terms), avg_len, bm25,
                     layout.block_doc_range, theta0, acc_total, acc_decoded),
        TOPK_SCHEMA)
    return (local
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k_top))
