"""Property-based round-trip tests for the varbyte/delta codec and the
block-max headers (SURVEY.md §5.2 layer 3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=0, max_size=400, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_docids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(codec.decode_docids(codec.encode_docids(arr)), arr)


@given(st.lists(st.integers(min_value=1, max_value=10**6), max_size=400))
@settings(max_examples=100, deadline=None)
def test_tfs_roundtrip(tfs):
    arr = np.array(tfs, dtype=np.int64)
    assert np.array_equal(codec.decode_tfs(codec.encode_tfs(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=10**7), min_size=2, max_size=300,
             unique=True),
    st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=100, deadline=None)
def test_rebase_concat(ids, gap):
    ids = sorted(ids)
    cut = len(ids) // 2
    a = np.array(ids[:cut], dtype=np.int64)
    b = np.array(ids[cut:], dtype=np.int64) + a[-1] + gap if cut else None
    if cut == 0 or cut == len(ids):
        return
    buf = codec.encode_docids(a) + codec.rebase_first_gap(
        codec.encode_docids(b), int(a[-1])
    )
    assert np.array_equal(codec.decode_docids(buf), np.concatenate([a, b]))


def test_rebase_rejects_nonincreasing():
    import pytest

    buf = codec.encode_docids(np.array([5, 9]))
    with pytest.raises(ValueError):
        codec.rebase_first_gap(buf, 5)


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=2000,
             unique=True)
)
@settings(max_examples=50, deadline=None)
def test_block_headers_invariants(ids):
    ids = np.array(sorted(ids), dtype=np.int64)
    w = np.sin(ids.astype(np.float64)) ** 2  # deterministic pseudo-weights
    last, maxw = codec.block_headers(ids, w, block_size=128)
    n_blocks = (ids.size + 127) // 128
    assert last.size == maxw.size == n_blocks
    assert last[-1] == ids[-1]
    for bi in range(n_blocks):
        blk = slice(bi * 128, min((bi + 1) * 128, ids.size))
        assert last[bi] == ids[blk][-1]
        assert maxw[bi] == w[blk].max()  # exact upper bound per block
    # headers bound every posting's weight (the WAND safety property)
    bidx = np.searchsorted(last, ids)
    assert (w <= maxw[bidx] + 1e-15).all()


def test_compression_beats_fixed_width():
    rng = np.random.default_rng(7)
    ids = np.cumsum(rng.integers(1, 60, 100_000))
    buf = codec.encode_docids(ids)
    assert len(buf) < ids.size * 2  # vs 8 bytes/doc fixed width


@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=1 << 20),
                 min_size=1, max_size=30, unique=True),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_position_stream_roundtrip(doc_positions):
    """Per-doc delta streams concatenate verbatim and decode back with the
    tfs-derived lengths — the packed ``pos`` column contract."""
    docs = [np.sort(np.array(p, dtype=np.int64)) for p in doc_positions]
    stream = b"".join(codec.encode_positions_row(p) for p in docs)
    lens = np.array([p.size for p in docs], dtype=np.int64)
    flat = codec.decode_position_stream(stream, lens)
    assert flat.tolist() == np.concatenate(docs).tolist()


@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=1 << 20),
                 min_size=1, max_size=30, unique=True),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=60, deadline=None)
def test_batch_position_encode_matches_per_row(doc_positions):
    docs = [np.sort(np.array(p, dtype=np.int64)) for p in doc_positions]
    batch = codec.encode_position_lists(docs)
    assert batch == [codec.encode_positions_row(p) for p in docs]
