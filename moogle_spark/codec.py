"""Posting-block codec: delta + varint (LEB128) compression, numpy-vectorized.

This replaces the reference's one-Mongo-document-per-posting layout
(services/indexer/data/mongo_client.py:75-90 — exploded `words` rows) with
compressed posting blocks, the architectural change mandated by
BASELINE.json north_star: "global posting lists stored delta-encoded with
varint/PForDelta block compression and per-block max-score metadata".

Layout per block (one `postings` row):
  doc_ids   : varint(delta(doc_ids))        — doc_ids strictly increasing
  tfs       : varint(tfs)                   — parallel to doc_ids
  positions : varint(concat per-doc [len, delta(positions)...])

Encode and decode are both vectorized numpy (no per-int Python loops on the
decode hot path); decode of a 128-entry block is a few array ops.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def varint_encode_with_lens(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a non-negative int array; also return the per-value
    byte width so callers can slice the stream at value boundaries (the
    block encoder compresses a whole partition's postings in ONE call and
    carves per-block byte ranges out of the result).

    Bandwidth-lean vectorization (the encoder is the single hottest
    Python loop at build time, and on a many-core single box it is
    memory-bus bound, not ALU bound):
      * values that fit 32 bits — tfs, dls, position deltas, and most
        doc-id deltas — are processed in uint32, halving every
        intermediate array's byte traffic vs the old always-u64 path;
      * per-value byte widths come from 4 (u32) / 9 (u64) vectorized
        threshold compares instead of a shift-until-zero loop that
        re-touched the full array once per output byte;
      * after the first 7-bit group (which every value emits), the
        remaining groups operate on a COMPACTED array of still-alive
        values — multi-byte values are a small minority of delta
        streams, so later passes touch only their bytes.
    Output bytes are identical to the previous encoder (same LEB128)."""
    v = np.asarray(values)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    if int(v.max()) <= 0xFFFFFFFF:
        dt = np.uint32
        thresholds = (7, 14, 21, 28)
    else:
        dt = _U64
        thresholds = tuple(range(7, 64, 7))
    v = v.astype(dt, copy=False)
    seven = dt(7)
    mask = dt(0x7F)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in thresholds:
        nbytes += v >= dt(1 << t)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    # first 7-bit group: every value emits one byte
    chunk = (v & mask).astype(np.uint8)
    rem = v >> seven
    more = rem > 0
    chunk[more] |= 0x80
    out[starts] = chunk
    # subsequent groups: compact to the still-alive values only
    alive = np.flatnonzero(more)
    rem = rem[alive]
    pos = starts[alive] + 1
    while rem.size:
        chunk = (rem & mask).astype(np.uint8)
        rem = rem >> seven
        more = rem > 0
        chunk[more] |= 0x80
        out[pos] = chunk
        keep = np.flatnonzero(more)
        rem = rem[keep]
        pos = pos[keep] + 1
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_lens(values)[0]


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` LEB128 varints. Vectorized: finds terminator bytes,
    groups 7-bit chunks by output index with shift-weighted summation.
    Fast path: when every varint is one byte (len == count — the common
    case for tf/delta/doc-length streams, where most values are < 128)
    the bytes ARE the values and decode is a single widening copy."""
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == count:
        return raw.astype(np.int64)
    is_last = (raw & 0x80) == 0
    out_idx = np.zeros(raw.shape, dtype=np.int64)
    out_idx[1:] = np.cumsum(is_last)[:-1]
    # position of each byte within its varint
    starts = np.zeros(raw.shape, dtype=np.int64)
    last_pos = np.flatnonzero(is_last)
    starts[last_pos[:-1] + 1] = last_pos[:-1] + 1
    byte_pos = np.arange(raw.size) - np.maximum.accumulate(starts)
    vals = (raw & 0x7F).astype(_U64) << (_U64(7) * byte_pos.astype(_U64))
    out = np.zeros(count, dtype=_U64)
    np.add.at(out, out_idx, vals)
    return out.astype(np.int64)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Strictly-increasing doc_ids -> delta -> varint."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    return varint_encode(deltas)


def decode_doc_ids(buf: bytes, count: int) -> np.ndarray:
    return np.cumsum(varint_decode(buf, count))


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.int64))


def decode_tfs(buf: bytes, count: int) -> np.ndarray:
    return varint_decode(buf, count)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concat per-doc [n, delta(pos)...] then varint the whole stream."""
    stream: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.int64)
        d = np.empty(p.size + 1, dtype=np.int64)
        d[0] = p.size
        if p.size:
            d[1] = p[0]
            np.subtract(p[1:], p[:-1], out=d[2:])
        stream.append(d)
    if not stream:
        return b""
    return varint_encode(np.concatenate(stream))


def decode_positions(buf: bytes, n_docs: int, total_ints: int) -> list[np.ndarray]:
    """Inverse of encode_positions. total_ints = n_docs + sum(tf)."""
    flat = varint_decode(buf, total_ints)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        n = int(flat[i])
        i += 1
        out.append(np.cumsum(flat[i : i + n]))
        i += n
    return out


def decode_positions_flat(buf: bytes, tfs: np.ndarray, total_ints: int) -> np.ndarray:
    """Flat absolute positions (doc-major) of a whole block, given the
    block's tf array (available from the parallel ``tfs`` column):
    equivalent to ``np.concatenate(decode_positions(...))`` but fully
    vectorized — the per-posting cumsum loop becomes ONE global cumsum
    with a per-posting correction (each posting's delta run restarts at
    its absolute first position, so subtracting the running total at
    every run start re-bases all runs at once)."""
    n = int(tfs.size)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    flat = varint_decode(buf, total_ints)
    # stream layout per posting: [tf, delta*tf]; len-slot index of
    # posting j is cumsum(1 + tf)[:j]
    ls = np.zeros(n, dtype=np.int64)
    np.cumsum(1 + tfs[:-1], out=ls[1:])
    mask = np.ones(total_ints, dtype=bool)
    mask[ls] = False
    c = np.cumsum(flat[mask])
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    corr = np.zeros(n, dtype=np.int64)
    nz = starts > 0
    corr[nz] = c[starts[nz] - 1]
    return c - np.repeat(corr, tfs)
