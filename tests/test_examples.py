"""Smoke tests: every shipped example must run end-to-end on fixtures.

The examples are the plugin-replacement documentation (PARITY C17-C20);
running them as subprocesses (CPU backend) keeps them from bit-rotting.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
FIXTURES = REPO / "tests" / "fixtures"
EXAMPLES = REPO / "examples"


def _run(args, timeout=240):
    env = dict(os.environ, LIBACM_TPU_PLATFORM="cpu",
               PYTHONPATH=str(REPO) + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    return subprocess.run([sys.executable, *args], capture_output=True,
                          text=True, timeout=timeout, env=env)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("examples_corpus")
    for name in ("speech_22k_mono.acm", "music_44k_stereo.acm",
                 "wavc_22k.acm"):
        shutil.copy(FIXTURES / name, d / name)
    # walk_acm discovers by content: one payload under a foreign suffix
    shutil.copy(FIXTURES / "speech_22k_mono.acm", d / "hidden.dat")
    return d


def test_transcode_corpus_example(corpus_dir, tmp_path):
    out = tmp_path / "wav"
    r = _run([EXAMPLES / "transcode_corpus.py", corpus_dir, out])
    assert r.returncode == 0, r.stderr
    wavs = sorted(p.name for p in out.glob("*.wav"))
    assert wavs == ["hidden.wav", "music_44k_stereo.wav",
                    "speech_22k_mono.wav", "wavc_22k.wav"]
    for w in out.glob("*.wav"):
        assert w.read_bytes()[:4] == b"RIFF"
    assert "files ok" in r.stdout


def test_stream_player_example(corpus_dir):
    r = _run([EXAMPLES / "stream_player.py",
              corpus_dir / "speech_22k_mono.acm", "0.5"])
    assert r.returncode == 0, r.stderr
    assert "streamed" in r.stdout and "seek to 500 ms" in r.stdout


def test_training_ingest_example(corpus_dir):
    r = _run([EXAMPLES / "training_ingest.py", corpus_dir])
    assert r.returncode == 0, r.stderr
    assert "mean energy" in r.stdout and "summary:" in r.stdout


def test_segment_server_self_demo():
    r = _run([EXAMPLES / "segment_server.py"])
    assert r.returncode == 0, r.stderr
    assert "self-demo OK" in r.stdout
