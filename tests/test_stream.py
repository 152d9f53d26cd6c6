"""Streaming API semantics (stream.py) — reference behavior contracts."""

import numpy as np
import pytest

from libacm_tpu import (
    AcmError,
    AcmException,
    acm_open_decoder,
    acm_read,
    acm_seek_pcm,
    testing,
)
from libacm_tpu.io import BytesSource
from libacm_tpu.scan import oracle
from libacm_tpu.stream import AcmStream


def _mk(rng=None, **kw):
    rng = rng or np.random.default_rng(17)
    kw.setdefault("level", 4)
    kw.setdefault("rows", 64)
    kw.setdefault("n_blocks", 5)
    return testing.random_acm_bytes(rng, **kw)


def _full_pcm(data):
    _, pcm, _ = oracle.decode_bytes(data)
    return pcm


def test_read_returns_at_most_block_remainder():
    data = _mk()
    acm = acm_open_decoder(data)
    block_bytes = acm.info.acm_rows * acm.info.acm_cols * 2
    chunk = acm.read(10 * block_bytes)
    assert len(chunk) == block_bytes  # one acm_read call caps at the block
    # an unaligned read leaves a remainder for the next call
    c2 = acm.read(100)
    assert len(c2) == 100
    c3 = acm.read(10 * block_bytes)
    assert len(c3) == block_bytes - 100


def test_read_loop_matches_oracle_exactly():
    data = _mk()
    acm = acm_open_decoder(data)
    out = acm.read_loop(10**9)
    want = _full_pcm(data).astype("<i2").tobytes()
    assert out == want
    assert acm.read_loop(4096) == b""  # EOF


def test_output_formats():
    data = _mk(n_blocks=2)
    want = _full_pcm(data)
    be = acm_open_decoder(data).read_loop(10**9, bigendianp=1)
    assert be == want.astype(">i2").tobytes()
    us = acm_open_decoder(data).read_loop(10**9, sgned=0)
    u16 = (want.astype(np.int32) + 0x8000).astype(np.uint16)
    assert us == u16.astype("<u2").tobytes()
    ub = acm_open_decoder(data).read_loop(10**9, bigendianp=1, sgned=0)
    assert ub == u16.astype(">u2").tobytes()


def test_badfmt_wordlen():
    acm = acm_open_decoder(_mk(n_blocks=1))
    assert acm_read(acm, 128, wordlen=1) == int(AcmError.ERR_BADFMT)
    with pytest.raises(AcmException) as ei:
        acm.read(128, wordlen=4)
    assert ei.value.code == int(AcmError.ERR_BADFMT)


def test_total_values_clamp_and_channel_multiple():
    # stereo with odd total: final word is never handed out
    rng = np.random.default_rng(23)
    data = _mk(rng, channels=2, total_values=4 * 64 * 16 - 7)
    acm = acm_open_decoder(data)
    out = acm.read_loop(10**9)
    assert len(out) // 2 == (4 * 64 * 16 - 8)  # clamped to channel multiple
    assert acm.read(4096) == b""


def test_force_chans_quirk_modes():
    mono = _mk(n_blocks=1, channels=1)
    assert acm_open_decoder(mono, 0).channels == 1
    assert acm_open_decoder(mono, -1).channels == 2  # plain ACM quirk
    assert acm_open_decoder(mono, 1).channels == 1
    assert acm_open_decoder(mono, 2).channels == 2
    wavc = _mk(np.random.default_rng(5), n_blocks=1, channels=1, wavc=True)
    assert acm_open_decoder(wavc, -1).channels == 1  # WAVC header trusted
    stereo = _mk(np.random.default_rng(6), n_blocks=1, channels=2)
    assert acm_open_decoder(stereo, -1).channels == 2
    st = acm_open_decoder(stereo, 1)
    assert st.channels == 1 and st.info.acm_channels == 2


def test_seek_equivalence_with_straight_read():
    data = _mk()
    full = _full_pcm(data).astype("<i2").tobytes()
    acm = acm_open_decoder(data)
    target = 1234
    reached = acm.seek_pcm(target)
    assert reached == target
    rest = acm.read_loop(10**9)
    assert rest == full[target * 2:]
    # backward seek and re-read from zero
    assert acm.seek_pcm(0) == 0
    assert acm.read_loop(10**9) == full
    # seek past EOF clamps to stream end
    assert acm.seek_pcm(10**9) == len(full) // 2


def test_seek_time_roundtrip():
    data = _mk()
    acm = acm_open_decoder(data)
    ms = acm.time_total() // 2
    res = acm.seek_time(ms)
    assert abs(res - ms) <= 1000 * 2048 // acm.rate + 1


class _NoSeekSource:
    def __init__(self, data):
        self._b = BytesSource(data)

    def read(self, size=-1):
        return self._b.read(size)


def test_not_seekable_semantics():
    data = _mk(n_blocks=2)
    acm = AcmStream(_NoSeekSource(data))
    assert not acm.seekable()  # no length capability (util.c:152-155)
    assert acm.bitrate() == 13000  # raw_total()==0 fallback (util.c:161-162)
    acm.read(100)
    acm.read(100)
    # forward decode-seek works without seek capability
    assert acm_seek_pcm(acm, 500) == 500
    # backward needs a seek callback → ACM_ERR_NOT_SEEKABLE
    assert acm_seek_pcm(acm, 0) == int(AcmError.ERR_NOT_SEEKABLE)


def test_tell_accessors():
    data = _mk(channels=2)
    acm = acm_open_decoder(data)
    assert acm.pcm_total() == acm.total_values // 2
    acm.read(1000)
    assert acm.pcm_tell() == 250
    assert acm.time_tell() == 250 * 1000 // acm.rate
    assert acm.raw_total() == len(data)
    assert acm.bitrate() == 8 * len(data) * 1000 // acm.time_total()


def test_raw_tell_progression():
    data = _mk()
    acm = acm_open_decoder(data)
    t0 = acm.raw_tell()
    assert 14 <= t0 <= len(data) + 1
    seen = [t0]
    while True:
        if not acm.read(4096):
            break
        seen.append(acm.raw_tell())
    assert seen == sorted(seen)
    assert seen[-1] <= len(data) + 1


def test_corrupt_stream_read_behavior(fixtures_dir):
    data = (fixtures_dir / "corrupt.acm").read_bytes()
    acm = acm_open_decoder(data)
    hdr_block = acm.info.acm_rows * acm.info.acm_cols * 2
    good = acm.read_loop(hdr_block)  # block 0 decodes fine
    assert len(good) == hdr_block
    with pytest.raises(AcmException) as ei:
        acm.read(4096)
    assert ei.value.code == int(AcmError.ERR_CORRUPT)
    # like the reference, the NEXT read keeps decoding from the failed
    # attempt's bit position — here that immediately hits clean EOF
    assert acm_read(acm, 4096) == b""
    acm.seek_pcm(0)
    assert len(acm.read(hdr_block)) == hdr_block


def test_read_loop_partial_before_error(fixtures_dir):
    data = (fixtures_dir / "corrupt.acm").read_bytes()
    acm = acm_open_decoder(data)
    out = acm.read_loop(10**9)  # error after block 0 → partial data returned
    assert len(out) == acm.info.acm_rows * acm.info.acm_cols * 2


def test_expected_eof_mid_block_is_clean(fixtures_dir):
    data = (fixtures_dir / "trunc_colbound.acm").read_bytes()
    acm = acm_open_decoder(data)
    out = acm.read_loop(10**9)
    assert len(out) > 0  # no exception: clean EOF


def test_unexpected_eof_is_error(fixtures_dir):
    data = (fixtures_dir / "trunc_midfiller.acm").read_bytes()
    acm = acm_open_decoder(data)
    with pytest.raises(AcmException) as ei:
        while acm.read(10**6):
            pass
    assert ei.value.code == int(AcmError.ERR_UNEXPECTED_EOF)


def test_not_acm_open():
    with pytest.raises(AcmException) as ei:
        acm_open_decoder(b"garbage data not acm")
    assert ei.value.code == int(AcmError.ERR_NOT_ACM)


def test_zero_byte_read_returns_empty():
    acm = acm_open_decoder(_mk(n_blocks=1))
    assert acm.read(1) == b""  # numwords==0 → 0, like the C
    assert acm.read(4096)  # stream still usable


def test_acm_read_simulate_mode():
    """The reference's dst=NULL mode (decode.c:859-866): simulate=True
    advances the stream identically to a real read and returns the
    consumed byte count (0 at EOF); interleaving simulate and real reads
    yields the same suffix bytes a position-matched real stream yields."""
    data = _mk()
    real = acm_open_decoder(data)
    sim = acm_open_decoder(data)
    # simulate three chunks; mirror with real reads
    consumed = 0
    for n in (100, 256, 74):
        got_sim = acm_read(sim, n, simulate=True)
        got_real = acm_read(real, n)
        assert isinstance(got_sim, int)
        assert got_sim == len(got_real)
        consumed += got_sim
    assert sim.pcm_tell() == real.pcm_tell()
    rest_sim = bytearray()
    while True:
        b = sim.read_loop(4096)
        if not b:
            break
        rest_sim += b
    rest_real = bytearray()
    while True:
        b = real.read_loop(4096)
        if not b:
            break
        rest_real += b
    assert bytes(rest_sim) == bytes(rest_real)
    # drained: simulate now reports EOF as 0
    assert acm_read(sim, 512, simulate=True) == 0
