"""CLI golden tests: byte-compare acmtool outputs against the C reference's
captured outputs (tests/goldens), plus flag/command behavior."""

import contextlib
import io
import pathlib
import shutil
import sys

import numpy as np
import pytest

from libacm_tpu import cli, testing
from libacm_tpu.scan import oracle

ALL_FIXTURES = [
    "speech_22k_mono", "music_44k_stereo", "mistagged_mono", "wavc_22k",
    "level0", "level9", "rows1", "rows4095", "eofpad", "oddtotal_stereo",
    "partial_total", "allfillers", "corrupt", "trunc_midfiller",
    "trunc_colbound",
]


def run_cli(args):
    so, se = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
        code = 0
        try:
            code = cli.main(args)
        except SystemExit as e:
            code = e.code
    return code, so.getvalue(), se.getvalue()


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_raw_decode_matches_reference_golden(name, fixtures_dir, goldens_dir, tmp_path):
    src = fixtures_dir / f"{name}.acm"
    out = tmp_path / "out.raw"
    _, stdout, stderr = run_cli(["-d", "-r", "-o", str(out), str(src)])
    assert out.read_bytes() == (goldens_dir / f"{name}.raw").read_bytes()
    assert stderr.replace(str(src), "%SRC%") == \
        (goldens_dir / f"{name}.stderr").read_bytes().decode()
    assert stdout.replace(str(src), "%SRC%") == \
        (goldens_dir / f"{name}.info").read_bytes().decode()


@pytest.mark.parametrize("name", ["speech_22k_mono", "music_44k_stereo",
                                  "wavc_22k", "eofpad", "oddtotal_stereo"])
def test_wav_decode_matches_reference_golden(name, fixtures_dir, goldens_dir, tmp_path):
    src = fixtures_dir / f"{name}.acm"
    out = tmp_path / "out.wav"
    run_cli(["-d", "-q", "-o", str(out), str(src)])
    assert out.read_bytes() == (goldens_dir / f"{name}.wav").read_bytes()


def test_default_output_name(fixtures_dir, tmp_path):
    src = tmp_path / "thing.acm"
    shutil.copy(fixtures_dir / "rows1.acm", src)
    run_cli(["-d", "-q", str(src)])
    assert (tmp_path / "thing.wav").exists()
    run_cli(["-d", "-r", "-q", str(src)])
    assert (tmp_path / "thing.raw").exists()
    # no dot → extension appended
    src2 = tmp_path / "noext"
    shutil.copy(fixtures_dir / "rows1.acm", src2)
    run_cli(["-d", "-q", str(src2)])
    assert (tmp_path / "noext.wav").exists()


def test_no_output_benchmark_mode(fixtures_dir, tmp_path):
    src = tmp_path / "x.acm"
    shutil.copy(fixtures_dir / "rows1.acm", src)
    code, stdout, _ = run_cli(["-d", "-n", str(src)])
    assert code == 0
    assert not (tmp_path / "x.wav").exists()
    assert "Length" in stdout  # info line still printed


def test_info_command(fixtures_dir):
    src = fixtures_dir / "speech_22k_mono.acm"
    code, stdout, _ = run_cli(["-i", str(src)])
    assert code == 0
    assert "Chans:1(1)" in stdout and "Freq:22050" in stdout
    assert "A:7/16" in stdout


def test_retag_channels(fixtures_dir, tmp_path):
    from libacm_tpu import acm_open_file

    src = tmp_path / "x.acm"
    shutil.copy(fixtures_dir / "speech_22k_mono.acm", src)
    run_cli(["-S", str(src)])
    acm = acm_open_file(src)
    assert acm.info.acm_channels == 2 and acm.channels == 2
    run_cli(["-M", str(src)])
    acm = acm_open_file(src)
    assert acm.info.acm_channels == 1
    # PCM words are unchanged by retagging (channel-agnostic codec)
    orig = oracle.decode_bytes((fixtures_dir / "speech_22k_mono.acm").read_bytes())[1]
    now = oracle.decode_bytes(src.read_bytes())[1]
    np.testing.assert_array_equal(orig, now)


def test_retag_refuses_non_acm(tmp_path):
    bad = tmp_path / "bad.acm"
    bad.write_bytes(b"not acm at all....")
    code, _, stderr = run_cli(["-M", str(bad)])
    assert "not an ACM file" in stderr


def test_command_exclusivity():
    code, _, stderr = run_cli(["-d", "-i", "x"])
    assert code == 1
    assert "only one command at a time" in stderr


def test_version_flag():
    code, stdout, _ = run_cli(["-v"])
    assert code == 0 and "acmtool" in stdout


def test_stdout_output(fixtures_dir):
    # '-o -' writes binary to stdout's buffer and flips quiet mode
    src = fixtures_dir / "rows1.acm"

    class _Cap(io.TextIOBase):
        def __init__(self):
            self.buffer = io.BytesIO()

        def write(self, s):
            return len(s)

    cap = _Cap()
    old = sys.stdout
    sys.stdout = cap
    try:
        cli.main(["-d", "-r", "-o", "-", str(src)])
    finally:
        sys.stdout = old
    raw = cap.buffer.getvalue()
    want = oracle.decode_bytes(src.read_bytes())[1]
    assert raw[: len(want) * 2] == want.astype("<i2").tobytes()


def test_windowed_decode_path_bytes_equal(tmp_path, monkeypatch):
    """Huge files decode through the windowed stream (reference 8 KiB read
    pattern, O(window) memory); the output bytes must equal the fast path
    on clean AND hostile streams."""
    rng = np.random.default_rng(99)
    for hostile in (False, True):
        data = testing.speech_acm_bytes(rng, level=6, rows=16, n_blocks=30)
        if hostile:
            b = bytearray(data)
            b[200] ^= 0xFF
            data = bytes(b)
        src = tmp_path / f"in_{hostile}.acm"
        src.write_bytes(data)

        def run(out):
            err = io.StringIO()
            with contextlib.redirect_stderr(err):
                cli.main(["-d", "-r", "-q", "-o", str(out), str(src)])
            return out.read_bytes(), err.getvalue()

        fast, err_fast = run(tmp_path / "fast.raw")
        monkeypatch.setattr(cli, "_WINDOWED_DECODE_BYTES", 0)
        win, err_win = run(tmp_path / "win.raw")
        monkeypatch.undo()
        assert win == fast
        assert ("filler_samples" in err_win) == ("filler_samples" in err_fast)


def test_play_streams_progressively(tmp_path, monkeypatch):
    """-p (C16 play): drive play_file with a stub sounddevice and check the
    played bytes equal the decode, arrive in reference-sized (4 KiB)
    chunks BEFORE the stream is fully consumed (progressive playback, not
    decode-then-play), and that filler zeros pad a truncated file."""
    import types

    rng = np.random.default_rng(55)
    data = testing.speech_acm_bytes(rng, level=5, rows=16, n_blocks=12,
                                    rate=22050)
    src = tmp_path / "p.acm"
    src.write_bytes(data)

    played = []

    class StubStream:
        def __init__(self, samplerate, channels, dtype):
            assert (samplerate, channels, dtype) == (22050, 1, "int16")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            pass

        def write(self, buf):
            played.append(bytes(buf))

    stub = types.SimpleNamespace(RawOutputStream=StubStream)
    monkeypatch.setitem(sys.modules, "sounddevice", stub)

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        cli.main(["-p", "-q", str(src)])
    blob = b"".join(played)
    want = oracle.decode_bytes(data)[1].astype("<i2").tobytes()
    assert blob == want
    assert max(len(c) for c in played) <= 4096  # reference ao_play chunking
    assert "filler" not in err.getvalue()

    # truncated file: played bytes = decoded prefix + zero filler + notice
    played.clear()
    cut = tmp_path / "cut.acm"
    cut.write_bytes(data[: len(data) * 2 // 3])
    with contextlib.redirect_stderr(err):
        cli.main(["-p", "-q", str(cut)])
    blob2 = b"".join(played)
    assert len(blob2) == len(want)  # padded to the declared total
    assert blob2[: 100] == want[: 100]
    assert blob2.endswith(bytes(64))
    assert "filler_samples" in err.getvalue()
