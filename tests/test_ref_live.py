"""Live differential tests against the compiled C reference binary.

These only run when the reference `acmtool` is available (built out-of-tree,
e.g. /tmp/refbuild — see BASELINE.md). CI without the binary relies on the
committed goldens instead (test_cli.py), which were captured from the same
binary.
"""

import subprocess

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.scan import oracle


def _ref_raw(ref, path, tmp_path, extra=()):
    out = tmp_path / "ref.raw"
    r = subprocess.run([ref, "-d", "-r", "-q", *extra, "-o", str(out), str(path)],
                       capture_output=True)
    return np.fromfile(out, dtype="<i2"), r


@pytest.mark.parametrize("seed", range(12))
def test_randomized_live_parity(seed, ref_acmtool, tmp_path):
    rng = np.random.default_rng(seed)
    level = int(rng.integers(0, 9))
    rows = int(rng.integers(1, 300))
    nb = int(rng.integers(1, 6))
    ch = int(rng.integers(1, 3))
    words = nb * rows * (1 << level)
    total = int(rng.integers(max(1, words - 2 * rows), words + 50))
    data = testing.random_acm_bytes(
        rng, level=level, rows=rows, n_blocks=nb, channels=ch,
        total_values=total, wavc=bool(rng.integers(0, 2)), max_pwr=15)
    src = tmp_path / "t.acm"
    src.write_bytes(data)
    ref, _ = _ref_raw(ref_acmtool, src, tmp_path)

    hdr, pcm, _ = oracle.decode_bytes(data)
    want_words = (hdr.total_values // hdr.channels) * hdr.channels
    mine = np.zeros(want_words, dtype=np.int16)
    n = min(len(pcm), want_words)
    mine[:n] = pcm[:n]
    np.testing.assert_array_equal(ref, mine)


@pytest.mark.parametrize("level,rows", [
    (10, 4), (11, 3), (12, 2), (13, 1), (14, 1), (15, 1)])
def test_high_level_live_parity(level, rows, ref_acmtool, tmp_path):
    """Levels 10-15 (cols 1024..32768) vs the C binary.

    The strip loop degenerates to step_subcount=1 above level 9
    (decode.c:538-541) and the wrapbuf spans up to 65534 ints — geometry
    the randomized parity test (levels 0-8) and the bench corpus
    (max level 10) never reach. Both the oracle and the fused native
    host decoder must byte-match."""
    rng = np.random.default_rng(1000 + level)
    data = testing.random_acm_bytes(rng, level=level, rows=rows,
                                    n_blocks=2, max_pwr=6)
    src = tmp_path / "t.acm"
    src.write_bytes(data)
    ref, _ = _ref_raw(ref_acmtool, src, tmp_path)

    _, pcm, _ = oracle.decode_bytes(data)
    np.testing.assert_array_equal(ref, pcm[: len(ref)])
    assert len(pcm) == len(ref)

    from libacm_tpu.scan import native
    if native.available():
        from libacm_tpu.parallel import decode_corpus
        (res,) = decode_corpus([data], backend="host")
        np.testing.assert_array_equal(ref, res.pcm)


@pytest.mark.parametrize("total,channels", [
    # total_bytes wraps NEGATIVE as C int (acmtool.c:272): the reference
    # emits nothing past the WAV header — so must we, instead of writing
    # ~2 GB of zero filler from a ~100-byte hostile file.
    ((1 << 30) + 100, 1),
    # wraps to a small POSITIVE count: output truncates at the first
    # read chunk past the wrapped total.
    ((1 << 31) + 100, 1),
    ((1 << 30) + 7, 2),
])
def test_cli_total_bytes_overflow_live(total, channels, ref_acmtool, tmp_path,
                                       capsys):
    """Hostile total_values headers: our CLI's output must byte-match the
    reference CLI's C-int total_bytes arithmetic, WAV header included."""
    from libacm_tpu import cli

    rng = np.random.default_rng(99)
    data = testing.random_acm_bytes(
        rng, level=4, rows=10, n_blocks=3, channels=channels,
        total_values=total)
    src = tmp_path / "t.acm"
    src.write_bytes(data)

    ref_out = tmp_path / "ref.wav"
    r = subprocess.run([ref_acmtool, "-d", "-q", "-o", str(ref_out), str(src)],
                       capture_output=True)
    ref_bytes = ref_out.read_bytes()
    assert len(ref_bytes) < 1 << 20  # guard: the C must not explode either

    my_out = tmp_path / "my.wav"
    cli.main(["-d", "-q", "-o", str(my_out), str(src)])
    capsys.readouterr()
    assert my_out.read_bytes() == ref_bytes


def test_seek_live_parity(ref_acmtool, tmp_path):
    """Our seek returns the same reached positions the C library would:
    validated indirectly — after seek, remaining PCM equals the reference
    tail at the same offset."""
    from libacm_tpu import acm_open_decoder

    rng = np.random.default_rng(1234)
    data = testing.random_acm_bytes(rng, level=5, rows=50, n_blocks=6)
    src = tmp_path / "t.acm"
    src.write_bytes(data)
    ref, _ = _ref_raw(ref_acmtool, src, tmp_path)
    for target in (0, 1, 777, 1600, 5000):
        acm = acm_open_decoder(data)
        reached = acm.seek_pcm(target)
        assert reached == min(target, len(ref))
        rest = acm.read_loop(10**9)
        assert rest == ref[reached:].astype("<i2").tobytes()


@pytest.fixture(scope="session")
def ref_seekread(tmp_path_factory):
    """Compile the seek harness against the reference library sources
    (captures post-seek semantics — persistent amp table, wrapbuf zeroing
    — that the CLI alone cannot exercise; run-only use per policy)."""
    from tests.ref_harness import build_seekread

    exe = build_seekread(tmp_path_factory.mktemp("seekharness"))
    if exe is None:
        pytest.skip("reference sources or gcc unavailable")
    return exe


def _stale_table_stream(rng):
    """Hostile stream whose oor coefficient reads hit stale amp-table
    entries — block 0 reads a (first-pass) zero table; after block 1
    dirties it, a backward seek re-reads block 0 with k*777 values."""
    rows, cols = 8, 8
    k0 = rng.integers(-8, 8, (rows, cols)).astype(np.int32)
    k1 = rng.integers(-100, 100, (rows, cols)).astype(np.int32)
    blocks = [testing.BlockData(pwr=0, val=5, k=k0, fillers=[4] * cols),
              testing.BlockData(pwr=10, val=777, k=k1, fillers=[8] * cols),
              testing.BlockData(pwr=0, val=9, k=k0, fillers=[4] * cols)]
    return testing.encode_acm(blocks, 3 * rows * cols, level=3, rows=rows)


def test_seek_amp_table_persistence_live(ref_seekread, tmp_path):
    """The reference's backward seek keeps its dirty amp table
    (util.c:230-241 zeroes only wrapbuf), so stale-table streams decode
    DIFFERENT bytes on the re-decode pass. Byte-diff both stream modes
    against the reference library across read-depth/target schedules."""
    import io

    from libacm_tpu.stream import AcmStream, acm_open_decoder

    rng = np.random.default_rng(97)
    data = _stale_table_stream(rng)
    src = tmp_path / "stale.acm"
    src.write_bytes(data)
    bl_bytes = 2 * 8 * 8
    for pre_bytes, target in ((4 * bl_bytes, 0), (2 * bl_bytes, 0),
                              (6 * bl_bytes, 10), (6 * bl_bytes, 70)):
        want = subprocess.run(
            [ref_seekread, str(src), str(pre_bytes), str(target)],
            capture_output=True).stdout
        for mode in ("full", "windowed"):
            if mode == "full":
                s = acm_open_decoder(data)
            else:
                s = AcmStream(io.BytesIO(data), window_blocks=1)
            s.read_loop(pre_bytes)
            s.seek_pcm(target)
            got = s.read_loop(10**9)
            assert got == want, (mode, pre_bytes, target)


def test_seek_amp_table_multi_seek_live(ref_seekread, tmp_path):
    """Repeated backward seeks accumulate table history; pin a
    double-seek schedule via two harness invocations composed by the
    fact that the table state is pass-history-determined."""
    import io

    from libacm_tpu.stream import AcmStream, acm_open_decoder

    rng = np.random.default_rng(101)
    data = _stale_table_stream(rng)
    src = tmp_path / "stale2.acm"
    src.write_bytes(data)
    bl_bytes = 2 * 8 * 8
    # schedule: read 2 blocks, seek 0, read 3 blocks, seek 0, read all.
    # Reference equivalent: pass1 consumed 2 blocks, pass2's decode then
    # reads a table dirtied by pass1+pass2 — run the harness from a
    # pre-read of 2 blocks, whose post-seek output's first 3 blocks match
    # pass2, then compose the third pass with a second harness run that
    # pre-reads 2+3 blocks worth... simpler: drive the real library in
    # one process via two chained targets is not expressible with the
    # harness, so pin the invariant both our modes agree byte-for-byte
    # on the full schedule (full-file path computes the table from pass
    # history; windowed threads it natively — two independent
    # implementations).
    out = {}
    for mode in ("full", "windowed"):
        if mode == "full":
            s = acm_open_decoder(data)
        else:
            s = AcmStream(io.BytesIO(data), window_blocks=2)
        chunks = []
        s.read_loop(2 * bl_bytes)
        s.seek_pcm(0)
        chunks.append(s.read_loop(3 * bl_bytes))
        s.seek_pcm(0)
        chunks.append(s.read_loop(10**9))
        out[mode] = b"".join(chunks)
    assert out["full"] == out["windowed"]


def test_seek_readahead_table_regression(ref_seekread, tmp_path):
    """Fuzz-found (seed 203 round 5509): a window that decodes AHEAD of
    the reads must not let those attempts advance the persistent amp
    table — at seek time the reference's table reflects only consumed
    attempts. wb>=3 with a short pre-read reproduced the divergence."""
    import io
    import pathlib

    from libacm_tpu.stream import AcmStream

    data = (pathlib.Path(__file__).parent / "fixtures"
            / "seek_readahead_stale.acm").read_bytes()
    src = tmp_path / "s.acm"
    src.write_bytes(data)
    from libacm_tpu.format import AcmException

    for pre, tgt in ((64, 0), (64, 1), (128, 0)):
        want = subprocess.run([ref_seekread, str(src), str(pre), str(tgt)],
                              capture_output=True).stdout
        for wb in (1, 2, 3, 4):
            s = AcmStream(io.BytesIO(data), window_blocks=wb)
            left = pre
            while left > 0:
                try:
                    b = s.read_loop(min(1 << 16, left))
                except AcmException:
                    break
                if not b:
                    break
                left -= len(b)
            s.seek_pcm(tgt)
            # mirror the harness' 64 KiB loop: it keeps reading past
            # error events (one read_loop call would stop at the first,
            # partial-data-wins), and this stream has one
            got = bytearray()
            while True:
                try:
                    b = s.read_loop(1 << 16)
                except AcmException:
                    break
                if not b:
                    break
                got += b
            assert bytes(got) == want, (pre, tgt, wb)


def test_seek_terminal_attempt_table_regression(ref_seekread, tmp_path):
    """Fuzz-found (seed 503 round 9179): an attempt that reads pwr/val
    and then hits clean EOF at a column code produces NO event, but the
    reference's amp table was already regenerated from it (decode.c:
    591-599 precedes fill_block) — draining a stale-table stream to EOF
    and seeking back must fold that terminal attempt into the table."""
    import io
    import pathlib

    from libacm_tpu.format import AcmException
    from libacm_tpu.stream import AcmStream, acm_open_decoder

    data = (pathlib.Path(__file__).parent / "fixtures"
            / "seek_terminal_att_stale.acm").read_bytes()
    src = tmp_path / "s.acm"
    src.write_bytes(data)
    for tgt in (0, 1, 7):
        want = subprocess.run([ref_seekread, str(src), str(10**9), str(tgt)],
                              capture_output=True).stdout
        for mode in ("full", "win1", "win3"):
            if mode == "full":
                s = acm_open_decoder(data)
            else:
                s = AcmStream(io.BytesIO(data), window_blocks=int(mode[3]))
            while True:  # drain to terminal EOF, past error events
                try:
                    if not s.read_loop(1 << 16):
                        break
                except AcmException:
                    continue
            s.seek_pcm(tgt)
            got = bytearray()
            while True:
                try:
                    b = s.read_loop(1 << 16)
                except AcmException:
                    break
                if not b:
                    break
                got += b
            assert bytes(got) == want, (mode, tgt)
