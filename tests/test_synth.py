"""Differential tests: JAX synthesis back-end ≡ NumPy oracle, bit for bit."""

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.ops import synth_jax
from libacm_tpu.scan import oracle


@pytest.mark.parametrize("level,rows,nb", [
    (0, 5, 3), (1, 1, 4), (2, 9, 2), (3, 100, 3), (5, 33, 5), (7, 16, 6),
])
def test_jax_matches_oracle(level, rows, nb):
    rng = np.random.default_rng(level * 1000 + rows)
    data = testing.random_acm_bytes(rng, level=level, rows=rows, n_blocks=nb,
                                    max_pwr=15)
    scan = oracle.scan_bytes(data)
    want = oracle.words_to_pcm(oracle.synth_all(scan), level)
    got = synth_jax.decode_scan_result(scan)
    np.testing.assert_array_equal(want, got)


def test_int32_wraparound_contract():
    """Huge (pwr=15, val=65535) coefficients must wrap, not saturate."""
    rng = np.random.default_rng(99)
    rows, level = 16, 4
    cols = 1 << level
    k = rng.integers(-32768, 32768, size=(rows, cols)).astype(np.int32)
    blk = testing.BlockData(pwr=15, val=65535, k=k,
                            fillers=[16] * cols)
    data = testing.encode_acm([blk] * 3, total_values=3 * rows * cols)
    scan = oracle.scan_bytes(data)
    want = oracle.words_to_pcm(oracle.synth_all(scan), level)
    got = synth_jax.decode_scan_result(scan)
    np.testing.assert_array_equal(want, got)
    # sanity: dequantized magnitudes brush the int32 boundary, so the FIR
    # sums (|y| up to 4×|x|) certainly wrapped somewhere
    redone = scan.k.astype(np.int64).reshape(3, -1) * 65535
    assert np.abs(redone).max() > 2**30


def test_carry_continuity_vs_reblocking():
    """Splitting the same coefficient stream into different block counts
    changes wrapbuf hand-off points but not the PCM (SURVEY §2.6)."""
    rng = np.random.default_rng(3)
    level, rows = 4, 60
    cols = 1 << level
    blocks = testing.random_blocks(rng, level, rows, 4, max_pwr=6)
    # same k/val for all blocks so re-blocking is representable
    for b in blocks[1:]:
        b.pwr, b.val, b.k = blocks[0].pwr, blocks[0].val, blocks[0].k.copy()
    a = testing.encode_acm(blocks, total_values=4 * rows * cols,
                           level=level, rows=rows)
    # same stream as 2 double-height blocks
    tall = [testing.BlockData(blocks[0].pwr, blocks[0].val,
                              np.concatenate([blocks[0].k, blocks[0].k]))
            for _ in range(2)]
    b2 = testing.encode_acm(tall, total_values=4 * rows * cols,
                            level=level, rows=2 * rows)
    _, pcm_a, _ = oracle.decode_bytes(a)
    _, pcm_b, _ = oracle.decode_bytes(b2)
    np.testing.assert_array_equal(pcm_a, pcm_b)


def test_empty_and_padding_paths():
    rng = np.random.default_rng(11)
    data = testing.random_acm_bytes(rng, level=3, rows=10, n_blocks=5)
    scan = oracle.scan_bytes(data)
    got = synth_jax.decode_scan_result(scan)  # nb=5 pads to 8
    want = oracle.words_to_pcm(oracle.synth_all(scan), 3)
    np.testing.assert_array_equal(want, got)
