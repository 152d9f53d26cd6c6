"""O(segment) random access ≡ full sequential decode, bit for bit."""

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.parallel.random_access import BlockIndex, build_index, read_segment
from libacm_tpu.scan import native, oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native scanner did not build"
)


def _full(data):
    h, pcm, _ = oracle.decode_bytes(data)
    return h, pcm


@pytest.mark.parametrize("level,rows,nb", [
    (4, 16, 8), (7, 16, 5), (2, 2, 6), (3, 100, 4), (5, 3, 7),
])
def test_segments_match_sequential(level, rows, nb):
    rng = np.random.default_rng(level * 7 + rows)
    data = testing.random_acm_bytes(rng, level=level, rows=rows, n_blocks=nb,
                                    max_pwr=12)
    h, want = _full(data)
    idx = build_index(data)
    assert idx.n_good == nb
    bl = h.block_len
    cases = [
        (0, 10), (bl - 3, 7), (bl, bl), (2 * bl + 5, bl + 17),
        (len(want) - 9, 100), (len(want), 5), (0, len(want)),
        (3, len(want) * 2),
    ]
    for start, n in cases:
        got = read_segment(data, idx, start, n)
        np.testing.assert_array_equal(
            got, want[start : min(start + n, len(want))],
            err_msg=f"segment ({start}, {n})")


def test_rows1_prefix_fallback():
    rng = np.random.default_rng(5)
    data = testing.random_acm_bytes(rng, level=3, rows=1, n_blocks=10)
    h, want = _full(data)
    idx = build_index(data)
    got = read_segment(data, idx, 30, 25)
    np.testing.assert_array_equal(got, want[30:55])


def test_truncated_stream_index():
    rng = np.random.default_rng(9)
    data = testing.random_acm_bytes(rng, level=3, rows=20, n_blocks=6)
    cut = data[: len(data) * 2 // 3]
    idx = build_index(cut)
    assert idx.n_good < 6
    h, want = _full(cut)
    avail = idx.n_good * idx.header.block_len
    got = read_segment(cut, idx, avail - 50, 200)
    np.testing.assert_array_equal(got, want[avail - 50 : avail])


def test_index_bit_offsets_are_exact_resume_points():
    """Scanning from index[i] reproduces the tail of a full scan."""
    rng = np.random.default_rng(3)
    data = testing.random_acm_bytes(rng, level=4, rows=12, n_blocks=6)
    idx = build_index(data)
    full = oracle.scan_bytes(data)
    h, want = _full(data)
    for a in (1, 3, 5):
        got = read_segment(data, idx, a * h.block_len, h.block_len)
        np.testing.assert_array_equal(
            got, want[a * h.block_len : (a + 1) * h.block_len])


def test_random_access_corpus_wrapper(tmp_path):
    from libacm_tpu.parallel.random_access import RandomAccessCorpus

    rng = np.random.default_rng(12)
    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.acm"
        p.write_bytes(testing.random_acm_bytes(
            rng, level=4, rows=16, n_blocks=4,
            channels=2 if i == 1 else 1))
        paths.append(str(p))
    rac = RandomAccessCorpus(paths)
    for i, p in enumerate(paths):
        h, want = _full(open(p, "rb").read())
        ch = 2 if i == 1 else 1
        got = rac.read(i, 10, 50)
        np.testing.assert_array_equal(
            got.reshape(-1), want[10 * ch : 10 * ch + 50 * ch])
        assert rac.pcm_total(i) == h.total_values // ch
    # reads past the end clamp to whole frames
    tail = rac.read(1, rac.pcm_total(1) - 5, 100)
    assert tail.shape == (5, 2)
