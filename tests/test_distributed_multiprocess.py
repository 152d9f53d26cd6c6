"""Real multi-process distributed path: 2 local processes over the JAX
distributed runtime (CPU backend) compose shard_manifest + decode_corpus +
allreduce_summary to the same totals as one process (SURVEY §5
distributed backend). This exercises the non-identity branch of
allreduce_summary (process_allgather over the coordinator service), which
unit tests cannot reach."""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libacm_tpu import testing

_WORKER = pathlib.Path(__file__).resolve().parent / "_dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("n_procs,n_files,shard_sizes", [
    (2, 9, [5, 4]),
    # 4 ranks, uneven manifest: exercises >2-rank allgather over the
    # coordinator (VERDICT r2 item 7) with a rank that gets fewer files
    (4, 10, [3, 3, 2, 2]),
])
def test_multi_process_decode_matches_single(tmp_path, n_procs, n_files,
                                             shard_sizes):
    rng = np.random.default_rng(2026)
    for i in range(n_files):
        (tmp_path / f"f{i:02d}.acm").write_bytes(
            testing.speech_acm_bytes(rng, level=int(rng.choice([3, 5])),
                                     rows=16, n_blocks=3,
                                     channels=int(rng.integers(1, 3))))

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers use plain 1-device CPU
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), coord, str(n_procs), str(i),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        try:
            # generous: 4 cold JAX imports share this VM's single core, and
            # the suite may run alongside a bench/fuzz process
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    result = next(l for l in outs[0].splitlines() if l.startswith("RESULT "))
    totals = json.loads(result[len("RESULT "):])
    shards = []
    for out in outs:
        line = next(l for l in out.splitlines() if l.startswith("SHARD "))
        shards.append(json.loads(line[len("SHARD "):]))

    # single-process ground truth
    from libacm_tpu.parallel import decode_corpus_device

    solo = decode_corpus_device(
        [str(p) for p in sorted(tmp_path.glob("*.acm"))]).block_until_ready()
    assert totals["n_files"] == n_files
    assert totals["n_ok"] == solo.summary.n_ok
    assert totals["n_failed"] == solo.summary.n_failed
    assert totals["n_partial"] == solo.summary.n_partial
    assert totals["samples"] == solo.summary.samples
    assert sum(s["files"] for s in shards) == n_files
    assert [s["files"] for s in shards] == shard_sizes
    assert totals["shard_files"] == shard_sizes[0]
