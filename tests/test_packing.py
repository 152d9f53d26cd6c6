"""Wire packing: pack/unpack round trip + corpus parity packed vs not."""

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.ops import packing
from libacm_tpu.parallel import decode_corpus


@pytest.mark.parametrize("rows,cols", [(16, 128), (3, 1), (5, 4), (7, 2)])
def test_roundtrip_random(rows, cols):
    rng = np.random.default_rng(rows * 100 + cols)
    nb = 9
    k = np.zeros((nb, rows, cols), dtype=np.int16)
    # per-block ranges spanning all three classes + exact boundaries
    bounds = [(0, 0), (-8, 7), (-9, 7), (-8, 8), (-128, 127), (-129, 127),
              (-128, 128), (-32768, 32767), (-1, 1)]
    for i, (lo, hi) in enumerate(bounds):
        k[i] = rng.integers(lo, hi + 1, size=(rows, cols), dtype=np.int64).astype(np.int16)
        k[i].flat[0] = lo  # pin the boundary values
        k[i].flat[-1] = hi
    pk = packing.pack_blocks(k)
    got = np.asarray(packing.unpack_blocks(
        pk.p4, pk.p8, pk.p16, pk.idx4, pk.idx8, pk.idx16,
        nb=nb, rows=rows, cols=cols,
    ))
    np.testing.assert_array_equal(got, k)
    if k.nbytes > 1024:  # index overhead dominates only for tiny blocks
        assert pk.wire_bytes < k.nbytes  # the whole point


def test_roundtrip_padded_classes():
    rng = np.random.default_rng(5)
    k = rng.integers(-5, 6, size=(7, 4, 8), dtype=np.int64).astype(np.int16)
    k[3] = 2000  # one 16-bit block
    pk = packing.pack_blocks(k, pad_to=(8, 4, 2))
    got = np.asarray(packing.unpack_blocks(
        pk.p4, pk.p8, pk.p16, pk.idx4, pk.idx8, pk.idx16,
        nb=7, rows=4, cols=8,
    ))
    np.testing.assert_array_equal(got, k)


def test_empty_blocks():
    k = np.zeros((0, 4, 8), dtype=np.int16)
    pk = packing.pack_blocks(k)
    assert pk.wire_bytes == 0 or pk.p4.shape[0] == 0


def test_corpus_packed_equals_unpacked():
    rng = np.random.default_rng(17)
    files = [
        testing.random_acm_bytes(rng, level=int(rng.choice([0, 3, 5])),
                                 rows=int(rng.integers(1, 30)),
                                 n_blocks=int(rng.integers(1, 6)),
                                 max_pwr=int(rng.integers(0, 16)))
        for _ in range(8)
    ]
    a = decode_corpus(files, pack=True)
    b = decode_corpus(files, pack=False)
    for x, y in zip(a, b):
        assert x.status == y.status
        np.testing.assert_array_equal(x.pcm, y.pcm)
