"""Auxiliary subsystems: checkpoint/resume, ingest adapters, summary,
manifest sharding, profiling hooks (SURVEY §5)."""

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.stream import AcmStream, DecodeState, acm_open_decoder
from libacm_tpu.parallel import decode_corpus_device
from libacm_tpu.parallel.corpus import CorpusConfig
from libacm_tpu.parallel.distributed import shard_manifest, allreduce_summary
from libacm_tpu import ingest


def _stream_bytes(seed=0, n_blocks=6):
    rng = np.random.default_rng(seed)
    return testing.random_acm_bytes(rng, level=3, rows=16, n_blocks=n_blocks)


def test_decode_state_roundtrip_resume():
    data = _stream_bytes()
    a = acm_open_decoder(data)
    first = a.read_loop(1000)
    st = a.get_state()
    rest_a = a.read_loop(10**6)

    b = acm_open_decoder(data)
    b.set_state(DecodeState.from_json(st.to_json()))
    rest_b = b.read_loop(10**6)
    assert rest_a == rest_b
    assert b.pcm_tell() == a.pcm_tell()


def test_decode_state_channel_mismatch_rejected():
    data = _stream_bytes()
    a = acm_open_decoder(data)
    st = a.get_state()
    b = acm_open_decoder(data, force_chans=2)
    with pytest.raises(Exception):
        b.set_state(st)


def test_iter_pcm_matches_batch():
    files = [_stream_bytes(seed=i, n_blocks=2 + i % 3) for i in range(7)]
    from libacm_tpu.parallel import decode_corpus

    whole = decode_corpus(files)
    streamed = list(ingest.iter_pcm(files, batch_files=3))
    assert len(streamed) == len(whole)
    for x, y in zip(streamed, whole):
        np.testing.assert_array_equal(x.pcm, y.pcm)


def test_iter_frames_shapes_and_padding():
    files = [_stream_bytes(seed=1, n_blocks=2)]
    frames = list(ingest.iter_frames(files, 1000, batch_files=1))
    total = 2 * 16 * 8
    assert len(frames) == -(-total // 1000)
    assert all(f.shape == (1000,) and f.dtype == np.int16 for _, f in frames)
    # padded tail: last frame ends with zeros
    assert frames[-1][1][-(1000 - total % 1000):].tolist() == [0] * (1000 - total % 1000)


def test_decode_to_wav_dir(tmp_path):
    import pathlib
    src = tmp_path / "a.acm"
    src.write_bytes(_stream_bytes(seed=3))
    res = ingest.decode_to_wav_dir([src], tmp_path / "out")
    assert res[0].ok
    wav = (tmp_path / "out" / "a.wav").read_bytes()
    # compare against the CLI's own output
    from libacm_tpu import cli
    cli.main(["-d", "-q", "-o", str(tmp_path / "cli.wav"), str(src)])
    assert wav == (tmp_path / "cli.wav").read_bytes()


def test_corpus_summary_counters():
    good = _stream_bytes(seed=5)
    corpus = decode_corpus_device([good, b"nope", good[:40]],
                                  config=CorpusConfig(chunk_files=2))
    s = corpus.summary
    assert s.n_files == 3
    assert s.n_failed == 1
    assert s.n_ok + s.n_partial == 2
    assert s.samples > 0 and s.wall_s > 0
    assert s.as_dict()["msamples_per_s"] >= 0


def test_shard_manifest_partition():
    paths = list(range(10))
    shards = [shard_manifest(paths, i, 3) for i in range(3)]
    assert sorted(x for s in shards for x in s) == paths
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_allreduce_summary_single_process():
    from libacm_tpu.parallel.corpus import CorpusSummary

    s = CorpusSummary(n_files=3, n_ok=2, samples=100, wall_s=1.0)
    assert allreduce_summary(s) is s


def test_profiling_annotation_noop():
    from libacm_tpu.utils.profiling import annotate, maybe_trace_from_env

    with maybe_trace_from_env():
        with annotate("scan"):
            pass


def test_torch_frame_dataset(tmp_path):
    """torch DataLoader adapter: frames match iter_frames, indices refer
    to the caller's manifest, and worker sharding covers all files."""
    torch = pytest.importorskip("torch")
    from torch.utils.data import DataLoader

    from libacm_tpu.ingest import iter_frames, torch_frame_dataset

    rng = np.random.default_rng(21)
    files = []
    for i in range(5):
        f = tmp_path / f"f{i}.acm"
        f.write_bytes(testing.speech_acm_bytes(rng, level=3, rows=8,
                                               n_blocks=2 + i % 3))
        files.append(str(f))
    want = [(i, fr) for i, fr in iter_frames(files, 512)]
    ds = torch_frame_dataset(files, 512)
    got = [(int(i), fr.numpy()) for i, fr in ds]
    assert len(got) == len(want)
    for (wi, wf), (gi, gf) in zip(want, got):
        assert wi == gi
        np.testing.assert_array_equal(wf, gf)
    # through a DataLoader with batching
    loader = DataLoader(ds, batch_size=4)
    n = sum(len(b[0]) for b in loader)
    assert n == len(want)


def test_run_corpus_job_checkpoint_resume(tmp_path):
    """Corpus-job checkpointing (SURVEY §5): crash mid-job, resume from the
    manifest cursor, end with the same counters as a straight decode."""
    import json

    from libacm_tpu import ingest
    from libacm_tpu.parallel import decode_corpus

    rng = np.random.default_rng(404)
    files = []
    for i in range(7):
        data = testing.speech_acm_bytes(rng, level=3, rows=8, n_blocks=3)
        if i == 4:
            data = data[: len(data) - 6]  # partial member
        p = tmp_path / f"f{i}.acm"
        p.write_bytes(data)
        files.append(str(p))
    files.insert(2, str(tmp_path / "missing.acm"))  # failed member

    cp = tmp_path / "job.json"
    seen = []

    class Crash(RuntimeError):
        pass

    def crashing(r):
        if len(seen) == 5:
            raise Crash()
        seen.append(r.index)

    try:
        ingest.run_corpus_job(files, cp, batch_files=3, on_result=crashing)
        assert False, "expected crash"
    except Crash:
        pass
    # one full batch committed before the crash (batch 2 was in flight)
    assert json.loads(cp.read_text())["cursor"] == 3

    summary = ingest.run_corpus_job(files, cp, batch_files=3,
                                    on_result=lambda r: seen.append(r.index))
    assert summary["resumed_at"] == 3
    assert summary["files"] == len(files)
    assert summary["cursor"] == len(files)
    # batch 0 delivered once, the crashed batch redelivered (at-least-once)
    assert sorted(set(seen)) == list(range(len(files)))

    want = decode_corpus(files)
    assert summary["n_ok"] == sum(r.status == 0 for r in want)
    assert summary["n_failed"] == sum(r.pcm is None for r in want)
    assert summary["n_partial"] == sum(
        r.pcm is not None and r.status != 0 for r in want)
    assert summary["samples"] == sum(
        len(r.pcm) for r in want if r.pcm is not None)

    # completed job: rerun is a no-op (cursor already at the end)
    again = ingest.run_corpus_job(files, cp, batch_files=3,
                                  on_result=lambda r: seen.append(-1))
    assert again["resumed_at"] == len(files)
    assert -1 not in seen
