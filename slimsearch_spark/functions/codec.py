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


def varint_len(values: np.ndarray) -> np.ndarray:
    """Byte length of each value's LEB128 encoding (vectorized)."""
    v = values.astype(np.uint64, copy=True)
    n = np.ones(v.shape, dtype=np.int64)
    v >>= np.uint64(7)
    while v.any():
        n += (v > 0)
        v >>= np.uint64(7)
    return n


def encode_blocked_posting_list(doc_ids: np.ndarray, tfs: np.ndarray,
                                fls: np.ndarray, block_doc_range: int,
                                impact_params=None) -> dict:
    """Blocked, block-addressable posting list.

    Blocks are aligned to the absolute doc-id grid (``block = doc_id //
    block_doc_range``) rather than fixed-count — so a block never straddles a
    doc-range partition boundary, which makes distributed WAND sharding an
    offset slice instead of a decode+split. Within each block the first doc_id
    is absolute and the rest are deltas, so any block decodes independently.

    Per-posting ``fls`` (field length) is inlined so scoring needs no join
    with doc_stats at query time (the norms live with the postings, like
    Lucene's per-field norms).

    Block-max metadata, from loosest to tightest:
    * ``block_max_tf`` — max tf per block (varint); the round-1 bound.
    * ``block_min_fl`` — min field length per block (varint); pairs with
      max_tf into a parameter-FREE bound max_tf/(max_tf + k(1-b+b·min_fl/
      avg)) that is valid for any query-time (k, b, avg) and exact on
      uniform-length corpora (where the fl→0 bound was hopelessly loose).
    * ``block_impact`` — the classic block-max float impact (float64 LE
      bytes): max over the block of tf/(tf + k(1-b+b·fl/avg_fl)) computed
      with the encode-time ``impact_params=(k, b, avg_len)``; only valid
      when the query's params equal the encode params (the caller checks).

    Returns dict with: doc_blob, tf_blob, fl_blob, block_g (varint deltas of
    block grid ids), block_n (varint docs per block), doc_off/tf_off/fl_off
    (varint absolute byte offsets of each block), block_max_tf, block_min_fl
    (varint), block_impact (float64 bytes or b""), n (total postings),
    n_blocks, max_tf.
    """
    order = np.argsort(doc_ids, kind="stable")
    d = doc_ids[order].astype(np.uint64)
    t = tfs[order].astype(np.uint64)
    f = fls[order].astype(np.uint64)
    n = d.size
    if n == 0:
        empty = b""
        return {"doc_blob": empty, "tf_blob": empty, "fl_blob": empty,
                "block_g": empty, "block_n": empty, "doc_off": empty,
                "tf_off": empty, "fl_off": empty, "block_max_tf": empty,
                "block_min_fl": empty, "block_impact": empty,
                "n": 0, "n_blocks": 0, "max_tf": 0}
    g = (d // np.uint64(block_doc_range)).astype(np.uint64)
    starts = np.concatenate(([0], np.nonzero(np.diff(g))[0] + 1))
    block_g = g[starts]
    block_n = np.diff(np.concatenate((starts, [n]))).astype(np.uint64)
    block_max = np.maximum.reduceat(t, starts)
    block_min_fl = np.minimum.reduceat(f, starts)
    block_impact = b""
    if impact_params is not None:
        k, b, avg_len = (float(x) for x in impact_params)
        tf64 = t.astype(np.float64)
        norm = tf64 + k * (1.0 - b + b * f.astype(np.float64)
                           / max(avg_len, 1e-12))
        block_impact = np.maximum.reduceat(tf64 / norm, starts) \
            .astype("<f8").tobytes()

    vals = d.copy()
    vals[1:] -= d[:-1]
    vals[starts] = d[starts]  # block-first doc absolute → independent decode

    doc_lens = varint_len(vals)
    tf_lens = varint_len(t)
    fl_lens = varint_len(f)
    doc_csum = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_csum = np.concatenate(([0], np.cumsum(tf_lens)))
    fl_csum = np.concatenate(([0], np.cumsum(fl_lens)))

    gd = np.empty_like(block_g)
    gd[0] = block_g[0]
    gd[1:] = block_g[1:] - block_g[:-1]

    return {
        "doc_blob": encode_varint_array(vals),
        "tf_blob": encode_varint_array(t),
        "fl_blob": encode_varint_array(f),
        "block_g": encode_varint_array(gd),
        "block_n": encode_varint_array(block_n),
        "doc_off": encode_varint_array(doc_csum[starts].astype(np.uint64)),
        "tf_off": encode_varint_array(tf_csum[starts].astype(np.uint64)),
        "fl_off": encode_varint_array(fl_csum[starts].astype(np.uint64)),
        "block_max_tf": encode_varint_array(block_max),
        "block_min_fl": encode_varint_array(block_min_fl),
        "block_impact": block_impact,
        "n": int(n),
        "n_blocks": int(block_g.size),
        "max_tf": int(t.max()),
    }


def block_impact_bounds(row, k: float, b: float, avg_len: float) -> np.ndarray:
    """Per-block upper bound of the BM25 impact tf/(tf + k(1-b+b·fl/avg))
    for one posting-list row, choosing the tightest VALID source:

    1. the stored float impact (``block_impact``), when the row carries
       encode params (``enc_k``/``enc_b``/``enc_avg_len``) equal to the
       query's — the classic block-max;
    2. else the parameter-free (max_tf, min_fl) bound — monotone ↑ in tf,
       ↓ in fl, hence ≥ every true in-block impact for ANY (k, b, avg);
    3. else (legacy layout without ``block_min_fl``) the fl→0 bound.

    ``row`` is a mapping (pandas Series / dict) over the list-row columns.
    """
    def _get(name):
        try:
            v = row[name]
        except (KeyError, IndexError):
            return None
        return v

    imp = _get("block_impact")
    if imp is not None and len(imp):
        ek, eb, ea = _get("enc_k"), _get("enc_b"), _get("enc_avg_len")
        if (ek is not None and eb is not None and ea is not None
                and abs(float(ek) - k) <= 1e-12
                and abs(float(eb) - b) <= 1e-12
                and abs(float(ea) - avg_len) <= 1e-9 * max(avg_len, 1.0)):
            return np.frombuffer(imp, dtype="<f8")
    m = decode_varint_array(row["block_max_tf"]).astype(np.float64)
    min_fl = _get("block_min_fl")
    if min_fl is not None and len(min_fl):
        fl = decode_varint_array(min_fl).astype(np.float64)
        norm = m + k * (1.0 - b + b * fl / max(avg_len, 1e-12))
    else:
        norm = m + k * (1.0 - b)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(m > 0, m / norm, 0.0)
    return out


def decode_block_meta(row: dict) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                          np.ndarray, np.ndarray, np.ndarray]:
    """Decode only the tiny per-block metadata arrays (no posting decode):
    (block_grid_ids, block_n, doc_off, tf_off, fl_off, block_max_tf)."""
    gd = decode_varint_array(row["block_g"])
    return (np.cumsum(gd, dtype=np.uint64),
            decode_varint_array(row["block_n"]),
            decode_varint_array(row["doc_off"]),
            decode_varint_array(row["tf_off"]),
            decode_varint_array(row["fl_off"]),
            decode_varint_array(row["block_max_tf"]))


def decode_blocks(doc_blob: bytes, tf_blob: bytes, fl_blob: bytes,
                  doc_off: np.ndarray, tf_off: np.ndarray,
                  fl_off: np.ndarray, block_n: np.ndarray,
                  which: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ONLY the selected blocks (physical block skip). ``which`` is an
    ascending array of block indices. Returns (doc_ids, tfs, fls)."""
    if which.size == 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    n_blocks = block_n.size
    doc_end = np.concatenate((doc_off[1:], [len(doc_blob)])).astype(np.int64)
    tf_end = np.concatenate((tf_off[1:], [len(tf_blob)])).astype(np.int64)
    fl_end = np.concatenate((fl_off[1:], [len(fl_blob)])).astype(np.int64)
    docs_parts, tf_parts, fl_parts = [], [], []
    # group contiguous runs of selected blocks into single decode calls
    run_starts = np.concatenate(([0], np.nonzero(np.diff(which) != 1)[0] + 1))
    run_ends = np.concatenate((run_starts[1:], [which.size]))
    for rs, re_ in zip(run_starts, run_ends):
        b0, b1 = int(which[rs]), int(which[re_ - 1])
        vals = decode_varint_array(
            doc_blob[int(doc_off[b0]):int(doc_end[b1])])
        tfs = decode_varint_array(tf_blob[int(tf_off[b0]):int(tf_end[b1])])
        fls = decode_varint_array(fl_blob[int(fl_off[b0]):int(fl_end[b1])])
        # rebuild absolute doc ids: cumsum with reset at each block start
        counts = block_n[b0:b1 + 1].astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        c = np.cumsum(vals, dtype=np.uint64)
        base = np.zeros(counts.size, dtype=np.uint64)
        base[1:] = c[starts[1:] - 1]
        docs = c - np.repeat(base, counts)
        docs_parts.append(docs)
        tf_parts.append(tfs)
        fl_parts.append(fls)
    return (np.concatenate(docs_parts), np.concatenate(tf_parts),
            np.concatenate(fl_parts))


def decode_blocked_posting_list(row: dict) -> Tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
    """Full decode of a blocked posting list row → (doc_ids, tfs, fls)."""
    _, block_n, doc_off, tf_off, fl_off, _ = decode_block_meta(row)
    return decode_blocks(row["doc_blob"], row["tf_blob"], row["fl_blob"],
                         doc_off, tf_off, fl_off, block_n,
                         np.arange(block_n.size, dtype=np.int64))


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
