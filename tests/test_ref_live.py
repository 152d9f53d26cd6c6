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
