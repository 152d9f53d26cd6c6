"""Uncommon geometries end-to-end: level > 7 (cols > 128, XLA-fallback
synthesis), level 0 (no filterbank), large rows."""

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.parallel import decode_corpus
from libacm_tpu.scan import oracle


@pytest.mark.parametrize("level,rows,nb", [(8, 4, 3), (9, 2, 2), (0, 50, 4),
                                           (10, 1, 2)])
def test_corpus_uncommon_geometries(level, rows, nb):
    rng = np.random.default_rng(level * 11 + rows)
    data = testing.random_acm_bytes(rng, level=level, rows=rows, n_blocks=nb,
                                    max_pwr=9)
    h, want, _ = oracle.decode_bytes(data)
    r = decode_corpus([data])[0]
    assert r.ok
    np.testing.assert_array_equal(r.pcm, want[: len(r.pcm)])
    assert len(r.pcm) == h.total_values


def test_stream_level12():
    rng = np.random.default_rng(3)
    data = testing.random_acm_bytes(rng, level=12, rows=1, n_blocks=1,
                                    max_pwr=4)
    from libacm_tpu.stream import acm_open_decoder

    h, want, _ = oracle.decode_bytes(data)
    got = np.frombuffer(acm_open_decoder(data).read_loop(10**8), dtype="<i2")
    np.testing.assert_array_equal(got, want)
