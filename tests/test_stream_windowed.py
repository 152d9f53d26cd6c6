"""Bounded-memory windowed streaming vs the slurped full-file decode.

The reference decodes any stream in O(64 KiB + block) memory from
arbitrary IO (decode.c:29, 41-67; the player plugins stream interactively).
AcmStream(window_blocks=N) is that capability here: these tests pin
byte-equality with the whole-file path across hostile inputs, telemetry
(raw_tell) parity, seek parity, and actual memory boundedness.
"""

import io
import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libacm_tpu import testing
from libacm_tpu.format import AcmException
from libacm_tpu.scan import native
from libacm_tpu.stream import AcmStream, acm_open_decoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native scanner unavailable")


class PipeSource:
    """read()-only AcmIO: no seek, no length (like a network/VFS pipe)."""

    def __init__(self, data: bytes, trickle: int | None = None):
        self._b = io.BytesIO(data)
        self._trickle = trickle  # cap per-read size (slow producer)

    def read(self, size: int = -1) -> bytes:
        if self._trickle is not None:
            size = self._trickle if size < 0 else min(size, self._trickle)
        return self._b.read(size)


def _drain(s: AcmStream, chunk: int) -> bytes:
    out = bytearray()
    while True:
        try:
            got = s.read_loop(chunk)
        except AcmException:
            break
        if not got:
            break
        out += got
    return bytes(out)


def _fuzz_stream(rng) -> bytes:
    level = int(rng.integers(0, 9))
    rows = int(rng.integers(1, 40))
    nb = int(rng.integers(1, 12))
    if rng.random() < 0.5:
        data = testing.speech_acm_bytes(
            rng, level=level, rows=rows, n_blocks=nb,
            channels=int(rng.integers(1, 3)), wavc=bool(rng.integers(0, 2)))
    else:
        data = testing.random_acm_bytes(
            rng, level=level, rows=rows, n_blocks=nb,
            channels=int(rng.integers(1, 3)), wavc=bool(rng.integers(0, 2)),
            max_pwr=int(rng.integers(0, 16)))
    mut = rng.random()
    if mut < 0.25 and len(data) > 20:
        data = data[: int(rng.integers(14, len(data)))]
    elif mut < 0.5:
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(14, len(b)))] ^= 1 << int(rng.integers(0, 8))
        data = bytes(b)
    return data


def test_windowed_equals_slurped_fuzzed():
    """Byte-for-byte equality incl. truncated/corrupt/stale-amp streams,
    via a read()-only source (no length, no seek)."""
    rng = np.random.default_rng(20260816)
    n = 0
    for _ in range(60):
        data = _fuzz_stream(rng)
        try:
            ref = acm_open_decoder(data)
        except AcmException:
            with pytest.raises(AcmException):
                AcmStream(PipeSource(data), window_blocks=3)
            continue
        want = _drain(ref, 8192)
        wb = int(rng.integers(1, 6))
        chunk = int(rng.integers(64, 16384))
        trickle = int(rng.integers(17, 4096)) if rng.random() < 0.5 else None
        s = AcmStream(PipeSource(data, trickle), window_blocks=wb)
        assert _drain(s, chunk) == want
        assert not s.seekable()  # no length capability
        n += 1
    assert n > 40


def test_windowed_error_surfacing():
    """An immediate decode error raises in both modes at the same read."""
    rng = np.random.default_rng(5)
    data = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=6)
    # corrupt block 3's filler region with an f_bad pattern storm
    b = bytearray(data)
    for i in range(60, 70):
        b[i] ^= 0xFF
    data = bytes(b)
    ref = acm_open_decoder(data)
    win = AcmStream(PipeSource(data), window_blocks=2)
    # drive both with single-block reads so errors surface identically
    bl2 = 2 * ref._header.block_len
    while True:
        try:
            a = ref.read_loop(bl2)
        except AcmException as e:
            with pytest.raises(AcmException) as ei:
                win.read_loop(bl2)
            assert ei.value.code == e.code
            continue
        try:
            c = win.read_loop(bl2)
        except AcmException:
            pytest.fail("windowed raised where slurped did not")
        assert a == c
        if not a:
            break


def test_windowed_raw_tell_parity():
    """raw_tell's closed-form reconstruction == the strict scan, at every
    attempt boundary, pre- and post-seek."""
    rng = np.random.default_rng(11)
    for _ in range(25):
        data = _fuzz_stream(rng)
        try:
            ref = acm_open_decoder(data)
        except AcmException:
            continue
        win = AcmStream(io.BytesIO(data), window_blocks=2)
        step = max(2, 2 * ((ref._header.block_len * 2) // 3) // 2 * 2)
        assert win.raw_tell() == ref.raw_tell()
        while True:
            try:
                a = ref.read_loop(step)
            except AcmException:
                a = None
            try:
                b = win.read_loop(step)
            except AcmException:
                b = None
            assert win.raw_tell() == ref.raw_tell()
            assert a == b
            if not a:
                break


def test_windowed_seek_parity():
    rng = np.random.default_rng(13)
    data = testing.speech_acm_bytes(rng, level=6, rows=12, n_blocks=20,
                                    channels=2)
    ref = acm_open_decoder(data)
    win = AcmStream(io.BytesIO(data), window_blocks=3)
    # forward seek
    assert win.seek_pcm(1500) == ref.seek_pcm(1500)
    assert win.read_loop(4096) == ref.read_loop(4096)
    # backward seek (reset + re-decode in windowed mode)
    assert win.seek_pcm(100) == ref.seek_pcm(100)
    assert win.raw_tell() == ref.raw_tell()
    assert win.read_loop(8192) == ref.read_loop(8192)
    assert win.raw_tell() == ref.raw_tell()
    assert _drain(win, 4096) == _drain(ref, 4096)


def test_windowed_seek_requires_seekable():
    rng = np.random.default_rng(17)
    data = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=8)
    s = AcmStream(PipeSource(data), window_blocks=2)
    s.read_loop(s._header.block_len * 2)
    s.read_loop(s._header.block_len * 2)
    with pytest.raises(AcmException):
        s.seek_pcm(0)


def test_windowed_memory_bounded():
    """A long stream decodes in O(window) residency, not O(file)."""
    rng = np.random.default_rng(19)
    data = testing.speech_acm_bytes(rng, level=7, rows=16, n_blocks=400)
    assert len(data) > 100_000
    s = AcmStream(PipeSource(data), window_blocks=4)
    block_bytes = 2 * s._header.block_len
    bound = 3 * _window_chunk() + 8 * block_bytes
    peak = 0
    out = bytearray()
    while True:
        got = s.read_loop(8192)
        if not got:
            break
        out += got
        peak = max(peak, s._win.resident_bytes())
    assert len(out) == 2 * 400 * s._header.block_len
    assert peak < bound, (peak, bound)
    # cross-check content against the slurped path
    assert bytes(out) == _drain(acm_open_decoder(data), 65536)


def _window_chunk() -> int:
    from libacm_tpu.stream import _Window

    return _Window.CHUNK


def test_windowed_telemetry_and_state():
    rng = np.random.default_rng(23)
    data = testing.speech_acm_bytes(rng, level=5, rows=10, n_blocks=10,
                                    rate=22050)
    ref = acm_open_decoder(data)
    win = AcmStream(io.BytesIO(data), window_blocks=2)
    assert (win.pcm_total(), win.time_total()) == (ref.pcm_total(),
                                                   ref.time_total())
    ref.read_loop(5000)
    win.read_loop(5000)
    assert win.pcm_tell() == ref.pcm_tell()
    assert win.time_tell() == ref.time_tell()


def test_player_simulation_interactive_seek():
    """The player-plugin usage shape (SURVEY §3.5: gstreamer/winamp decode
    loop + UI-thread seek requests): a windowed stream driven in small
    playback chunks with interleaved forward/backward seeks must produce
    exactly the bytes a slurped stream produces under the same schedule."""
    rng = np.random.default_rng(31)
    data = testing.speech_acm_bytes(rng, level=6, rows=16, n_blocks=25,
                                    channels=2, rate=44100)
    ref = acm_open_decoder(data)
    win = AcmStream(io.BytesIO(data), window_blocks=3)
    schedule = []  # (kind, arg) replay log for debugging
    chunk = 4096  # the reference play loop's 4 KiB (acmtool.c:118-128)
    for step in range(200):
        r = rng.random()
        if r < 0.08:
            pos = int(rng.integers(0, ref.pcm_total()))
            schedule.append(("seek", pos))
            assert win.seek_pcm(pos) == ref.seek_pcm(pos), schedule[-3:]
            assert win.pcm_tell() == ref.pcm_tell()
        else:
            schedule.append(("read", chunk))
            a = ref.read_loop(chunk)
            b = win.read_loop(chunk)
            assert a == b, schedule[-3:]
            if not a:
                break
    assert win.time_tell() == ref.time_tell()


def test_windowed_post_seek_raw_tell_fuzzed():
    """Post-seek raw_tell at EOF: reload boundaries restart at data_start,
    so the extent probe must be data_start-relative — the absolute form
    under-requests by up to 3 bytes and can miss the final truncated
    reload (regression: level=1 rows=6 nb=9 gave 130 vs strict 129)."""
    rng = np.random.default_rng(47)
    checked = 0
    for _ in range(120):
        data = _fuzz_stream(rng)
        try:
            ref = acm_open_decoder(data)
        except AcmException:
            continue
        win = AcmStream(io.BytesIO(data), window_blocks=2)
        _drain(ref, 4096)
        _drain(win, 4096)
        try:
            ref.seek_pcm(0)
        except AcmException:
            continue
        win.seek_pcm(0)
        _drain(ref, 4096)
        _drain(win, 4096)
        assert win.raw_tell() == ref.raw_tell()
        checked += 1
    assert checked > 60


def _drain_past_errors(s: AcmStream, chunk: int = 4096) -> bytes:
    """Drain continuing past error events (the reference keeps decoding
    after a failed attempt; each raise consumes one event, so this
    terminates)."""
    out = bytearray()
    while True:
        try:
            b = s.read_loop(chunk)
        except AcmException:
            continue
        if not b:
            return bytes(out)
        out += b


def test_windowed_state_resume():
    """get_state/set_state in windowed mode: resume repositions the
    window (reset + replay) and reproduces exactly the bytes and
    telemetry the snapshotted stream would have produced — on a fresh
    stream and on the same stream after the window pruned the snapshot's
    blocks (backward replay), hostile streams included."""
    rng = np.random.default_rng(53)
    checked = 0
    for trial in range(30):
        data = _fuzz_stream(rng)
        try:
            s = AcmStream(io.BytesIO(data), window_blocks=2)
        except AcmException:
            continue
        for _ in range(int(rng.integers(0, 15))):
            try:
                if not s.read_loop(4096):
                    break
            except AcmException:
                pass  # failed attempt consumed; the reference keeps going
        st = s.get_state()
        want_tail = _drain_past_errors(s)
        want_tells = (s.raw_tell(), s.pcm_tell())
        # fresh stream of the same bytes
        s2 = AcmStream(io.BytesIO(data), window_blocks=2)
        s2.set_state(st)
        assert _drain_past_errors(s2) == want_tail, trial
        assert (s2.raw_tell(), s2.pcm_tell()) == want_tells, trial
        # same stream, backward (its window long since pruned the state)
        s.set_state(st)
        assert _drain_past_errors(s) == want_tail, trial
        checked += 1
    assert checked > 20


def test_windowed_state_resume_at_eof():
    """A snapshot taken after the terminal-EOF attempt restores cleanly
    (end_bits re-derived) including raw_tell."""
    rng = np.random.default_rng(59)
    data = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=6)
    ref = acm_open_decoder(data)
    _drain(ref, 4096)
    assert ref.read(4096) == b""  # provoke the terminal attempt
    s = AcmStream(io.BytesIO(data), window_blocks=2)
    _drain(s, 4096)
    assert s.read(4096) == b""
    st = s.get_state()
    s2 = AcmStream(io.BytesIO(data), window_blocks=2)
    s2.set_state(st)
    assert s2.read(4096) == b""
    assert s2.raw_tell() == ref.raw_tell()
    assert s2.pcm_tell() == ref.pcm_tell()


def test_windowed_state_resume_pipe_forward_only():
    """Forward resume onto the same (unseekable) stream needs no seek;
    a backward resume without seek capability raises NOT_SEEKABLE."""
    rng = np.random.default_rng(61)
    data = testing.speech_acm_bytes(rng, level=5, rows=10, n_blocks=8)
    full = _drain(acm_open_decoder(data), 4096)
    bl2 = None
    s = AcmStream(PipeSource(data), window_blocks=2)
    bl2 = 2 * s._header.block_len
    s.read_loop(bl2)
    st_early = s.get_state()
    s.read_loop(bl2)
    st_late = s.get_state()  # ahead of current? no — at current
    # forward resume: jump from st_late's position onward is a no-op replay
    s.set_state(st_late)
    tail = _drain(s, 4096)
    assert full.endswith(tail) and len(tail) == len(full) - 2 * bl2
    # backward resume on a pipe must raise
    s3 = AcmStream(PipeSource(data), window_blocks=2)
    s3.read_loop(bl2)
    s3.read_loop(bl2)
    with pytest.raises(AcmException):
        s3.set_state(st_early)


def test_windowed_resume_after_seek_is_first_pass():
    """A forward set_state on a stream that seeked backward must not
    serve the window's dirty-table state: any pass history forces a
    reset + first-pass replay, matching a fresh-stream resume (fuzz
    misses this: its resume path always builds a fresh stream)."""
    from libacm_tpu import testing as T

    rng = np.random.default_rng(67)
    rows, cols = 8, 8
    k0 = rng.integers(-8, 8, (rows, cols)).astype(np.int32)
    k1 = rng.integers(-100, 100, (rows, cols)).astype(np.int32)
    blocks = [T.BlockData(pwr=0, val=5, k=k0, fillers=[4] * cols),
              T.BlockData(pwr=10, val=777, k=k1, fillers=[8] * cols),
              T.BlockData(pwr=0, val=9, k=k0, fillers=[4] * cols)]
    data = T.encode_acm(blocks, 3 * rows * cols, level=3, rows=rows)

    s = AcmStream(io.BytesIO(data), window_blocks=3)
    s.read_loop(32)
    st = s.get_state()
    _drain(s, 4096)
    s.seek_pcm(0)  # dirties the window's amp table (reference semantics)
    s.set_state(st)
    tail_same = _drain(s, 4096)
    s2 = AcmStream(io.BytesIO(data), window_blocks=3)
    s2.set_state(st)
    tail_fresh = _drain(s2, 4096)
    assert tail_same == tail_fresh
    # and equals the true first-pass tail
    s3 = AcmStream(io.BytesIO(data), window_blocks=3)
    s3.read_loop(32)
    assert _drain(s3, 4096) == tail_fresh


def test_window_without_native_warns_loudly():
    """window_blocks without the native scanner must NOT silently slurp:
    the bounded-memory contract (decode.c:29) degrades to O(file) RSS, so
    the stream warns (ResourceWarning) and then behaves as a whole-file
    decode."""
    import warnings

    from libacm_tpu.scan import native as native_mod

    rng = np.random.default_rng(7)
    data = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=6)
    orig = native_mod.available
    native_mod.available = lambda: False
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            s = AcmStream(io.BytesIO(data), window_blocks=4)
        assert any(issubclass(w.category, ResourceWarning) for w in rec)
        assert s._win is None  # whole-file fallback
        fallback = _drain(s, 4096)
    finally:
        native_mod.available = orig
    s2 = AcmStream(io.BytesIO(data), window_blocks=4)
    assert _drain(s2, 4096) == fallback
