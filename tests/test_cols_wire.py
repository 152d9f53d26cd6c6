"""Per-column wire format: native packed scan + device unpack ≡ dense scan."""

import pathlib

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.ops.packing import unpack_columns
from libacm_tpu.scan import native, oracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native scanner did not build"
)


def _roundtrip(data: bytes):
    dense = oracle.scan_bytes(data)
    ps = native.scan_bytes_packed(data)
    assert ps.n_blocks == dense.n_blocks
    np.testing.assert_array_equal(ps.pwr, dense.pwr)
    np.testing.assert_array_equal(ps.val, dense.val)
    np.testing.assert_array_equal(ps.events, dense.events)
    assert ps.status == dense.status
    h = ps.header
    if ps.n_blocks == 0:
        return
    def even(a):
        return a if len(a) % 2 == 0 else np.concatenate(
            [a, np.zeros(1, np.uint8)])

    k_cols = np.asarray(unpack_columns(
        ps.cls.reshape(-1), even(ps.pay4), even(ps.pay8), even(ps.pay16),
        ps.wid4, ps.wid8, ps.wid16, rows=h.rows,
    ))  # [nb*cols, rows]
    k = k_cols.reshape(ps.n_blocks, h.cols, h.rows).transpose(0, 2, 1)
    np.testing.assert_array_equal(k, dense.k)


@pytest.mark.parametrize("level,rows,nb,wavc", [
    (0, 5, 3, False), (2, 9, 4, True), (4, 16, 3, False),
    (5, 33, 2, False), (7, 16, 4, False), (3, 1, 5, False),
])
def test_packed_scan_roundtrip(level, rows, nb, wavc):
    rng = np.random.default_rng(level * 977 + rows)
    data = testing.random_acm_bytes(rng, level=level, rows=rows, n_blocks=nb,
                                    wavc=wavc, max_pwr=15)
    _roundtrip(data)


def test_packed_scan_truncations_and_errors():
    rng = np.random.default_rng(31)
    data = testing.random_acm_bytes(rng, level=3, rows=12, n_blocks=4)
    for cut in range(14, len(data), max(1, len(data) // 25)):
        _roundtrip(data[:cut])
    mut = bytearray(data)
    for _ in range(40):
        mut2 = bytearray(mut)
        pos = int(rng.integers(14, len(mut2)))
        mut2[pos] ^= 1 << int(rng.integers(0, 8))
        _roundtrip(bytes(mut2))


def test_corpus_cols_wire_matches_reference_paths():
    from libacm_tpu.parallel import decode_corpus

    rng = np.random.default_rng(8)
    files = [
        testing.random_acm_bytes(rng, level=int(rng.choice([0, 2, 4, 7])),
                                 rows=int(rng.integers(1, 30)),
                                 n_blocks=int(rng.integers(1, 6)),
                                 max_pwr=int(rng.integers(0, 16)))
        for _ in range(10)
    ]
    a = decode_corpus(files, pack=True)   # cols-wire (native available)
    b = decode_corpus(files, pack=False)  # dense transfer
    for x, y in zip(a, b):
        assert x.status == y.status
        np.testing.assert_array_equal(x.pcm, y.pcm)


def test_packed_scan_pooled_scratch_determinism():
    """scan_bytes_packed reuses per-thread scratch buffers; results must be
    (a) byte-identical however the pool was dirtied by other files, and
    (b) real copies that survive later calls overwriting the pool."""
    rng = np.random.default_rng(77)
    small = testing.random_acm_bytes(rng, level=2, rows=7, n_blocks=3)
    big = testing.random_acm_bytes(rng, level=7, rows=16, n_blocks=20,
                                   max_pwr=9)
    fields = ("cls", "pay4", "pay8", "pay16", "wid4", "wid8", "wid16",
              "pwr", "val", "events")
    ref = {n: getattr(native.scan_bytes_packed(small), n).copy()
           for n in fields}
    # dirty the pool with a bigger geometry, then rescan the small file
    native.scan_bytes_packed(big)
    got = native.scan_bytes_packed(small)
    for n in fields:
        np.testing.assert_array_equal(getattr(got, n), ref[n], err_msg=n)
    # the returned arrays must be detached from the pool: scanning the big
    # file again must not mutate them
    native.scan_bytes_packed(big)
    for n in fields:
        np.testing.assert_array_equal(getattr(got, n), ref[n], err_msg=n)


def test_wide_field_at_stream_tail_keeps_top_bits():
    """Fuzz seed 9205 round 1425: the stream's FINAL wide-linear field went
    through BitStreamSink.put with ~50 bits already pending (the strict
    tail fallback, unlike the bulk branch, did not pre-drain), so the
    append ran past bit 63 and the field's top (sign) bit fell off the
    wire — the device paths decoded +15988 where the reference decodes
    -396. The wire must round-trip the dense scan exactly."""
    data = (pathlib.Path(__file__).parent
            / "fixtures" / "wide_tail_field.acm").read_bytes()
    _roundtrip(data)
