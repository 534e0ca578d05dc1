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
    carves per-block byte ranges out of the result).  Vectorized: computes
    the byte width of every value, scatters 7-bit groups into one output
    buffer."""
    v = np.asarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= _U64(7)
        nz = tmp > 0
    nbytes = np.maximum(nbits, 1)  # value 0 still takes one byte
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    # scatter 7-bit groups; max 10 groups for 64-bit values
    shift = _U64(0)
    remaining = v.copy()
    idx = starts.copy()
    alive = np.ones(v.shape, dtype=bool)
    for _ in range(10):
        if not alive.any():
            break
        chunk = (remaining & _U64(0x7F)).astype(np.uint8)
        remaining = remaining >> _U64(7)
        more = (remaining > 0) & alive
        chunk[more] |= 0x80
        out[idx[alive]] = chunk[alive]
        idx[alive] += 1
        alive = more
        shift += _U64(7)
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_lens(values)[0]


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` LEB128 varints. Vectorized: finds terminator bytes,
    groups 7-bit chunks by output index with shift-weighted summation."""
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
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
