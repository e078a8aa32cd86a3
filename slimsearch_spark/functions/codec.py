"""Delta + varint posting-list codec (numpy-vectorized, Arrow-batched).

North-rule requirement: per-partition posting lists stored as
delta+varint-compressed binary columns. The reference compresses by using
dense short ids inside JS Maps (src/add.ts:25-37); at Spark scale we compress
the sorted doc_id runs themselves.

Encoding: doc_ids sorted ascending → first-order deltas → LEB128 varint.
tfs are varint-encoded as-is (almost always 1 byte). Pure numpy inside a
pandas UDF — no per-row Python in the hot path.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def encode_varint_array(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = values.astype(np.uint64, copy=True)
    if v.size == 0:
        return b""
    # how many 7-bit groups per value (at least 1), via repeated shifting
    n_groups = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        n_groups += (tmp > 0)
        tmp >>= np.uint64(7)
    total = int(n_groups.sum())
    out = np.empty(total, dtype=np.uint8)
    # positions where each value's encoding starts
    starts = np.zeros(v.shape, dtype=np.int64)
    starts[1:] = np.cumsum(n_groups)[:-1]
    max_groups = int(n_groups.max())
    work = v.copy()
    for g in range(max_groups):
        mask = n_groups > g
        if not mask.any():
            break
        byte = (work[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (g + 1) < n_groups[mask]
        byte = byte | (more.astype(np.uint8) << 7)
        out[starts[mask] + g] = byte
        work[mask] >>= np.uint64(7)
    return out.tobytes()


def decode_varint_array(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array, vectorized."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    cont = (b & 0x80) > 0
    ends = np.nonzero(~cont)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & 0x7F).astype(np.uint64)
    # shift amount per byte = 7 * (index - start of its group)
    group_id = np.cumsum(np.concatenate(([0], (~cont)[:-1].astype(np.int64))))
    offsets = np.arange(b.size, dtype=np.int64) - starts[group_id]
    shifted = payload << (np.uint64(7) * offsets.astype(np.uint64))
    out = np.zeros(ends.size, dtype=np.uint64)
    np.add.at(out, group_id, shifted)
    return out


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray) -> Tuple[bytes, bytes]:
    """(sorted doc_ids, matching tfs) → (delta+varint docs, varint tfs)."""
    order = np.argsort(doc_ids, kind="stable")
    d = doc_ids[order].astype(np.uint64)
    t = tfs[order].astype(np.uint64)
    deltas = np.empty_like(d)
    if d.size:
        deltas[0] = d[0]
        deltas[1:] = d[1:] - d[:-1]
    return encode_varint_array(deltas), encode_varint_array(t)


def decode_posting_list(doc_blob: bytes, tf_blob: bytes) -> Tuple[np.ndarray, np.ndarray]:
    deltas = decode_varint_array(doc_blob)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs = decode_varint_array(tf_blob)
    return doc_ids, tfs


def merge_encoded_runs(runs: List[Tuple[bytes, bytes]]) -> Tuple[bytes, bytes]:
    """Merge per-salt partial posting lists (each sorted) into one list.

    Salts are contiguous doc_id ranges (salt = doc_id // range), so ordered
    concatenation with delta re-basing is enough — no re-sort of the full
    list. This is the stage-2 combine of the two-phase skew-salted pack.
    """
    all_docs, all_tfs = [], []
    for doc_blob, tf_blob in runs:
        d, t = decode_posting_list(doc_blob, tf_blob)
        all_docs.append(d)
        all_tfs.append(t)
    docs = np.concatenate(all_docs) if all_docs else np.empty(0, np.uint64)
    tfs = np.concatenate(all_tfs) if all_tfs else np.empty(0, np.uint64)
    return encode_posting_list(docs, tfs)
