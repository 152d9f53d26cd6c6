"""Pallas synthesis kernel ≡ XLA path, in interpreter mode on CPU.

(Real-TPU compilation of the same kernel is exercised by bench.py and was
validated bit-exact on hardware; CI runs the interpreter so the math and
the halo/carry bookkeeping stay covered on every commit.)
"""

import numpy as np
import pytest

import jax
from jax.experimental import pallas as pl

from libacm_tpu import testing
from libacm_tpu.scan import oracle


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # rebind the symbol the module captured at import time
    import libacm_tpu.ops.synth_pallas as sp

    monkeypatch.setattr(sp.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("level,rows,B,nb", [
    # supported: rows*cols % 128 == 0 (the C=128 flat tile)
    (7, 16, 2, 3), (3, 16, 1, 4), (1, 64, 2, 2), (4, 8, 1, 3),
    (5, 36, 2, 2), (2, 32, 1, 2), (6, 6, 1, 2),
    # wide geometries: cols > 128 flat-tiled as [rows*cols/128, 128]
    (8, 4, 2, 3), (9, 3, 1, 2), (10, 1, 2, 2), (12, 2, 1, 2),
    (13, 2, 1, 2), (14, 1, 1, 2),  # widest in-kernel levels under VMEM cap
    # silent XLA fallback: level 0, non-multiple-of-128 tiles (Mosaic
    # cannot lower the narrow-lane layout), and oversized VMEM tiles
    (0, 7, 2, 2), (3, 8, 1, 4), (1, 5, 2, 2), (4, 1, 1, 3),
    (5, 33, 2, 2), (15, 16, 1, 2),
])
def test_pallas_matches_xla(level, rows, B, nb):
    from libacm_tpu.ops import synth_jax as sj
    from libacm_tpu.ops import synth_pallas as sp

    rng = np.random.default_rng(level * 31 + rows)
    cols = 1 << level
    k = rng.integers(-2000, 2000, (B, nb, rows, cols)).astype(np.int16)
    v = rng.integers(0, 1 << 16, (B, nb)).astype(np.int32)
    w = rng.integers(-500, 500, (B, max(2 * cols - 2, 1))).astype(np.int32)
    want_pcm, want_w = sj.synth_pcm_batch(k, v, w, level=level, rows=rows)
    got_pcm, got_w = sp.synth_pcm_pallas(k, v, w, level=level, rows=rows)
    np.testing.assert_array_equal(np.asarray(want_pcm), np.asarray(got_pcm))
    if level:
        np.testing.assert_array_equal(np.asarray(want_w), np.asarray(got_w))


def test_pallas_full_decode_matches_oracle():
    """End-to-end: scan + pallas synth == oracle decode, carry included."""
    from libacm_tpu.ops import synth_pallas as sp

    rng = np.random.default_rng(77)
    data = testing.random_acm_bytes(rng, level=4, rows=20, n_blocks=5,
                                    max_pwr=15)
    scan = oracle.scan_bytes(data)
    want = oracle.words_to_pcm(oracle.synth_all(scan), 4)
    pcm, _ = sp.synth_pcm_pallas(
        scan.k[None], scan.val.astype(np.int32)[None],
        np.zeros((1, scan.header.wrapbuf_len), np.int32),
        level=4, rows=20,
    )
    np.testing.assert_array_equal(np.asarray(pcm).reshape(-1), want)
