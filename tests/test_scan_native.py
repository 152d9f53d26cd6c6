"""Differential fuzz: C++ scanner ≡ NumPy oracle on every field.

The native scanner re-implements the serial VLC hot loop; any divergence
from the oracle (the executable spec) is a bug. Fixtures + random streams +
adversarial mutations (truncation, bit flips) are compared field by field.
"""

import pathlib

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.scan import native, oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native scanner did not build"
)

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"


def _assert_same(data: bytes):
    try:
        want = oracle.scan_bytes(data)
    except ValueError:
        with pytest.raises(ValueError):
            native.scan_bytes(data)
        return
    got = native.scan_bytes(data)
    assert got.header == want.header
    assert got.n_blocks == want.n_blocks
    np.testing.assert_array_equal(got.k, want.k)
    np.testing.assert_array_equal(got.pwr, want.pwr)
    np.testing.assert_array_equal(got.val, want.val)
    np.testing.assert_array_equal(got.events, want.events)
    assert got.status == want.status
    np.testing.assert_array_equal(got.raw_tell, want.raw_tell)
    assert got.raw_tell0 == want.raw_tell0
    assert got.raw_tell_end == want.raw_tell_end


def test_fixture_parity():
    for f in sorted(FIXTURES.glob("*.acm")):
        _assert_same(f.read_bytes())


def test_random_streams():
    rng = np.random.default_rng(42)
    for _ in range(30):
        level = int(rng.integers(0, 7))
        rows = int(rng.integers(1, 50))
        nb = int(rng.integers(1, 8))
        data = testing.random_acm_bytes(
            rng, level=level, rows=rows, n_blocks=nb,
            wavc=bool(rng.integers(0, 2)), max_pwr=int(rng.integers(0, 16)),
        )
        _assert_same(data)


def test_truncations():
    rng = np.random.default_rng(7)
    data = testing.random_acm_bytes(rng, level=3, rows=20, n_blocks=4)
    for cut in range(14, len(data), max(1, len(data) // 40)):
        _assert_same(data[:cut])


def test_bitflip_corruptions():
    rng = np.random.default_rng(13)
    data = bytearray(testing.random_acm_bytes(rng, level=4, rows=16, n_blocks=3))
    for _ in range(60):
        mut = bytearray(data)
        for _ in range(int(rng.integers(1, 6))):
            pos = int(rng.integers(14, len(mut)))
            mut[pos] ^= 1 << int(rng.integers(0, 8))
        _assert_same(bytes(mut))


def test_all_linear_widths_and_extreme_vals():
    # f_linear at every width incl. the full-range 16-bit edge (k = -32768)
    for ind in range(3, 17):
        count = 1 << (ind - 1)
        rows, cols = 8, 4
        k = np.full((rows, cols), -count, dtype=np.int32)
        k[::2] = count - 1
        blk = testing.BlockData(pwr=15, val=65535, k=k, fillers=[ind] * cols)
        data = testing.encode_acm([blk], total_values=rows * cols, level=2,
                                  rows=rows)
        _assert_same(data)


def test_max_blocks_cap():
    rng = np.random.default_rng(3)
    data = testing.random_acm_bytes(rng, level=2, rows=8, n_blocks=6)
    for cap in (0, 1, 3, 6, 10):
        want = oracle.scan_bytes(data, cap)
        got = native.scan_bytes(data, cap)
        assert got.n_blocks == want.n_blocks
        np.testing.assert_array_equal(got.k, want.k)
        np.testing.assert_array_equal(got.events, want.events)
        assert got.status == want.status


def test_stale_amp_table_exceptions_match_reference_semantics():
    """Out-of-range coefficient indexes read stale amp-table entries in the
    C; the oracle's virtual table reproduces them, and every decode path
    (stream, corpus, random access) returns the same bytes."""
    from libacm_tpu import testing as T
    from libacm_tpu.parallel import decode_corpus, build_index, read_segment
    from libacm_tpu.stream import acm_open_decoder

    # block 0: big pwr=10 table; block 1: pwr=0 but a linear-4 filler
    # emitting k in [-8, 7] -> indexes beyond [-1, 0] hit block 0's table
    rng = np.random.default_rng(0)
    rows, cols = 8, 8
    k0 = rng.integers(-100, 100, (rows, cols)).astype(np.int32)
    k1 = rng.integers(-8, 8, (rows, cols)).astype(np.int32)
    blocks = [T.BlockData(pwr=10, val=777, k=k0, fillers=[8] * cols),
              T.BlockData(pwr=0, val=5, k=k1, fillers=[4] * cols)]
    data = T.encode_acm(blocks, 2 * rows * cols, level=3, rows=rows)

    scan = oracle.scan_bytes(data)
    assert scan.n_exceptions > 0
    # exception values = k * 777 (block 0's table covers |k| <= 8)
    assert all(v % 777 == 0 for v in scan.exc_val)

    _, want, _ = oracle.decode_bytes(data)
    got_stream = np.frombuffer(acm_open_decoder(data).read_loop(10**7), "<i2")
    np.testing.assert_array_equal(got_stream, want)
    r = decode_corpus([data])[0]
    np.testing.assert_array_equal(r.pcm, want)
    idx = build_index(data)
    np.testing.assert_array_equal(read_segment(data, idx, 5, 100),
                                  want[5:105])


def test_load_thread_safe_first_touch():
    """Concurrent first native touches must all see the loaded library
    (the pre-lock _load set _tried before the seconds-long build, so a
    racing thread could observe None and fail a whole corpus decode)."""
    import threading

    from libacm_tpu.scan import native

    orig_lib, orig_tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, False
        results = []
        barrier = threading.Barrier(4)

        def touch():
            barrier.wait()
            results.append(native._load() is not None)

        threads = [threading.Thread(target=touch) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == [True] * 4
    finally:
        native._lib, native._tried = orig_lib, orig_tried


def test_trip_lut_bitflip_sweep_matches_oracle():
    """Deterministic pin for the trip-filler LUT paths (_scan.cpp
    decode_map_col over slots 19/22/29): LUT entries end before an
    invalid symbol, and a window whose FIRST symbol is invalid carries
    nbits=0 and must fall back to the strict step at the identical
    failure site. Every single-bit corruption of an all-trips stream
    must decode identically to the oracle on the fused host driver —
    events, block counts, status, AND PCM (PCM depends on every
    decoded trip value, so this checks the values too)."""
    from libacm_tpu.scan import native

    rng = np.random.default_rng(11)
    level, rows = 5, 24
    cols = 1 << level
    fillers = ([19, 22, 29] * ((cols // 3) + 1))[:cols]
    ranges = {19: (-1, 1), 22: (-2, 2), 29: (-5, 5)}
    k = np.zeros((rows, cols), dtype=np.int32)
    for c, f in enumerate(fillers):
        lo, hi = ranges[f]
        k[:, c] = rng.integers(lo, hi + 1, size=rows)
    blk = testing.BlockData(pwr=15, val=7, k=k, fillers=fillers)
    base = bytearray(testing.encode_acm([blk], total_values=rows * cols))
    # header (14 bytes) + pwr/val (20 bits); flips start inside the
    # first trip column's payload
    first_payload_bit = 14 * 8 + 20
    last = len(base) * 8  # every payload bit, through the stream tail
    for bit in range(first_payload_bit, last):
        data = bytearray(base)
        data[bit >> 3] ^= 1 << (bit & 7)
        data = bytes(data)
        scan = oracle.scan_bytes(data)
        hd = native.decode_host(data)
        np.testing.assert_array_equal(hd.events, scan.events)
        assert hd.n_good == scan.n_blocks
        assert hd.status == scan.status
        if hd.oor:
            continue  # stale-amp streams: callers use the oracle
        want = oracle.words_to_pcm(oracle.synth_all(scan), level)
        np.testing.assert_array_equal(hd.pcm, want.reshape(-1))
