"""AcmStream with explicit synth/scan backends stays bit-identical."""

import numpy as np
import pytest

from jax.experimental import pallas as pl

from libacm_tpu import testing
from libacm_tpu.scan import set_backend
from libacm_tpu.stream import acm_open_decoder


@pytest.fixture(autouse=True)
def _interp_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    import libacm_tpu.ops.synth_pallas as sp

    monkeypatch.setattr(sp.pl, "pallas_call", patched)
    yield


def _data():
    rng = np.random.default_rng(21)
    return testing.random_acm_bytes(rng, level=4, rows=24, n_blocks=4)


def test_stream_pallas_backend_matches_default():
    data = _data()
    want = acm_open_decoder(data).read_loop(10**7)
    from libacm_tpu.stream import AcmStream
    from libacm_tpu import io as acmio

    s = AcmStream(acmio.BytesSource(data), synth_backend="pallas")
    assert s.read_loop(10**7) == want


@pytest.mark.parametrize("backend", ["oracle", "native"])
def test_stream_scan_backends_match(backend):
    from libacm_tpu.scan import native

    if backend == "native" and not native.available():
        pytest.skip("native scanner unavailable")
    data = _data()
    try:
        set_backend(backend)
        got = acm_open_decoder(data).read_loop(10**7)
    finally:
        set_backend(None)
    assert got == acm_open_decoder(data).read_loop(10**7)
