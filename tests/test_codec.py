"""Codec round-trip + property tests (SURVEY.md §5.2 item 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from moogle_spark import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.int64)
    assert (codec.varint_decode(codec.varint_encode(arr), len(arr)) == arr).all()


@given(
    st.lists(st.integers(min_value=1, max_value=10**12), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_doc_ids_roundtrip(ids):
    arr = np.sort(np.asarray(ids, dtype=np.int64))
    assert (codec.decode_doc_ids(codec.encode_doc_ids(arr), len(arr)) == arr).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=40),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_positions_roundtrip(poslists):
    pos = [np.sort(np.asarray(sorted(set(p)), dtype=np.int64)) for p in poslists]
    buf = codec.encode_positions(pos)
    total = len(pos) + sum(len(p) for p in pos)
    back = codec.decode_positions(buf, len(pos), total)
    assert len(back) == len(pos)
    for a, b in zip(pos, back):
        assert (a == b).all()


def test_empty_varint():
    assert codec.varint_encode(np.zeros(0, dtype=np.int64)) == b""
    assert codec.varint_decode(b"", 0).size == 0


def test_compression_beats_raw():
    ids = np.cumsum(np.random.default_rng(7).integers(1, 64, 128))
    assert len(codec.encode_doc_ids(ids)) < 128 * 8 // 4


def test_decode_positions_flat_matches_listform():
    import numpy as np

    from moogle_spark import codec

    rng = np.random.default_rng(9)
    per_doc = [
        np.sort(rng.choice(5000, size=rng.integers(1, 40), replace=False))
        for _ in range(57)
    ]
    buf = codec.encode_positions(per_doc)
    tfs = np.array([p.size for p in per_doc], dtype=np.int64)
    total = int(tfs.sum()) + len(per_doc)
    want = np.concatenate(codec.decode_positions(buf, len(per_doc), total))
    got = codec.decode_positions_flat(buf, tfs, total)
    np.testing.assert_array_equal(got, want)


def test_varint_u32_u64_path_boundary():
    """The encoder picks a uint32 fast path when max(values) fits 32
    bits; values straddling that boundary (and the int64 extremes) must
    round-trip identically through either path."""
    import numpy as np

    from moogle_spark import codec

    cases = [
        np.array([0], dtype=np.int64),
        np.array([0, 1, 127, 128, 129], dtype=np.int64),               # 1->2 byte edge
        np.array([0xFFFFFFFF], dtype=np.int64),                        # u32 path max
        np.array([0xFFFFFFFF + 1], dtype=np.int64),                    # first u64 value
        np.array([0, 0xFFFFFFFF, 2**62, 2**63 - 1], dtype=np.int64),   # u64 extremes
        np.array([2**35, 5, 0, 2**50 + 7], dtype=np.int64),
        np.arange(0, 300, dtype=np.int64) * 127,                       # mixed widths
    ]
    for vals in cases:
        buf, lens = codec.varint_encode_with_lens(vals)
        assert int(lens.sum()) == len(buf)
        out = codec.varint_decode(buf, len(vals))
        np.testing.assert_array_equal(out, vals)


def test_varint_single_byte_fast_path_exact():
    """All-sub-128 streams hit the len==count decode fast path; a single
    129 in the stream must fall back to the general path — same values
    either way."""
    import numpy as np

    from moogle_spark import codec

    fast = np.arange(128, dtype=np.int64)
    buf, _ = codec.varint_encode_with_lens(fast)
    assert len(buf) == 128  # truly one byte per value
    np.testing.assert_array_equal(codec.varint_decode(buf, 128), fast)
    slow = np.append(fast, 129)
    buf2, _ = codec.varint_encode_with_lens(slow)
    assert len(buf2) == 130
    np.testing.assert_array_equal(codec.varint_decode(buf2, 129), slow)
