"""acmtool -e: WAV → ACM round trip through the CLI surface."""

import numpy as np

from libacm_tpu import cli, io as acmio
from libacm_tpu.scan import oracle


def _wav_bytes(pcm: np.ndarray, channels: int, rate: int) -> bytes:
    return acmio.wav_header(len(pcm) // channels, channels, rate) + \
        pcm.astype("<i2").tobytes()


def test_cli_encode_decode_roundtrip(tmp_path, capsys):
    t = np.arange(3 * 2048)
    pcm = (800 * np.sin(t / 25.0)).astype(np.int16)
    wav = tmp_path / "in.wav"
    wav.write_bytes(_wav_bytes(pcm, 1, 22050))
    out = tmp_path / "out.acm"
    assert cli.main(["-e", "-q", "-o", str(out), str(wav)]) == 0
    h, got, _ = oracle.decode_bytes(out.read_bytes())
    assert h.rate == 22050 and h.channels == 1
    assert got.shape == pcm.shape
    a, b = pcm.astype(float), got.astype(float)
    snr = 10 * np.log10(np.mean(a**2) / max(np.mean((a - b) ** 2), 1e-12))
    assert snr > 15.0  # pure tones are the codec's worst case
    # decode back with the CLI and re-read the WAV
    back = tmp_path / "back.wav"
    assert cli.main(["-d", "-q", "-o", str(back), str(out)]) == 0
    ch, rate, pcm2 = acmio.read_wav(back.read_bytes())
    assert (ch, rate) == (1, 22050)
    np.testing.assert_array_equal(pcm2, got)


def test_cli_encode_rejects_non_wav(tmp_path, capsys):
    bad = tmp_path / "x.wav"
    bad.write_bytes(b"not a wav")
    assert cli.main(["-e", str(bad)]) == 0  # per-file error, like -d
    assert "not a RIFF/WAVE" in capsys.readouterr().err


def test_cli_encode_default_output_name(tmp_path, capsys):
    pcm = (np.zeros(100)).astype(np.int16)
    wav = tmp_path / "thing.wav"
    wav.write_bytes(_wav_bytes(pcm, 1, 22050))
    assert cli.main(["-e", "-q", str(wav)]) == 0
    assert (tmp_path / "thing.acm").exists()
