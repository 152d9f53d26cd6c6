"""Concurrent seek/read tests — the player plugins' defining pattern.

The reference library is single-threaded per stream; its consumers run a
decode thread and a UI thread and serialize seeks via a handshake
(gstreamer: pending-seek under the object lock, executed by the task
thread, plugin-gstreamer.c:505-508,621-651; winamp: `seek_to` posted to
the decode thread, plugin-winamp.c:186-213; audacious: polled global,
plugin-audacious.c:105-140). These tests exercise that exact pattern on
AcmStream (documented contract: one stream, one thread, callers
serialize), many-reader serving over RandomAccessCorpus (internally
locked), and the native scanner's per-thread scratch pools — the one
place a data race could corrupt decode output.
"""

import pathlib
import threading
import time

import numpy as np
import pytest

from libacm_tpu import acm_open_file, acm_read_loop, acm_seek_pcm
from libacm_tpu.parallel.random_access import RandomAccessCorpus
from libacm_tpu.scan import native

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
SPEECH = FIXTURES / "speech_22k_mono.acm"
MUSIC = FIXTURES / "music_44k_stereo.acm"


def test_seek_read_handshake_two_threads():
    """UI thread posts seek targets; decode thread performs them between
    reads (the gstreamer do_real_seek shape). The interleaved event log
    must replay bit-exactly on a fresh single-threaded stream."""
    stream = acm_open_file(SPEECH)
    total = stream.pcm_total()
    assert total > 8192

    lock = threading.Lock()
    pending: list[int | None] = [None]
    seeker_done = threading.Event()
    events: list[tuple] = []  # reader-thread only; read after join

    def reader():
        while True:
            with lock:
                tgt, pending[0] = pending[0], None
            if tgt is not None:
                reached = acm_seek_pcm(stream, tgt)
                events.append(("seek", tgt, reached))
            data = acm_read_loop(stream, 4096)
            events.append(("data", data))
            if not isinstance(data, bytes) or not data:
                if seeker_done.is_set() and pending[0] is None:
                    return
                time.sleep(0.001)

    def seeker():
        rng = np.random.default_rng(42)
        for _ in range(12):
            with lock:
                pending[0] = int(rng.integers(0, total))
            time.sleep(0.002)
        # park the reader at a known final position so it can drain to EOF
        with lock:
            pending[0] = total - 2048
        seeker_done.set()

    t_r = threading.Thread(target=reader)
    t_s = threading.Thread(target=seeker)
    t_r.start(), t_s.start()
    t_s.join(30), t_r.join(30)
    assert not t_r.is_alive() and not t_s.is_alive()

    n_seeks = sum(1 for e in events if e[0] == "seek")
    assert n_seeks >= 5  # the handshake may coalesce rapid-fire targets

    # replay the exact event script single-threaded: bit-exact outputs
    ref = acm_open_file(SPEECH)
    for ev in events:
        if ev[0] == "seek":
            _, tgt, reached = ev
            assert acm_seek_pcm(ref, tgt) == reached
        else:
            expect = acm_read_loop(ref, 4096)
            assert expect == ev[1]


def test_random_access_corpus_many_readers():
    """N serving threads over one RandomAccessCorpus (the locked LRU +
    GIL-free segment decode), with evictions forced: every returned
    segment must equal the single-threaded answer."""
    paths = [SPEECH, MUSIC, FIXTURES / "wavc_22k.acm",
             FIXTURES / "level0.acm"]
    corpus = RandomAccessCorpus(paths, max_cached_files=2)
    single = RandomAccessCorpus(paths)
    rng = np.random.default_rng(7)
    reqs = []
    for _ in range(80):
        i = int(rng.integers(0, len(paths)))
        total = single.pcm_total(i)
        start = int(rng.integers(0, max(total - 8, 1)))
        n = int(rng.integers(1, 2048))
        reqs.append((i, start, n, single.read(i, start, n)))

    errors: list[Exception] = []

    def worker(shard):
        try:
            for i, start, n, expect in shard:
                got = corpus.read(i, start, n)
                np.testing.assert_array_equal(got, expect)
        except Exception as exc:  # surfaced after join
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(reqs[k::4],))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert corpus.cached_files <= 2


@pytest.mark.skipif(not native.available(), reason="native scanner required")
def test_packed_scan_parallel_scratch_pools():
    """scan_bytes_packed under 4 threads × distinct geometries: the
    per-thread scratch reuse (native.py _pool_scratch) must never bleed
    between threads — every result bit-identical to the serial scan."""
    from libacm_tpu import testing

    rng = np.random.default_rng(11)
    datas = [
        testing.random_acm_bytes(rng, level=7, rows=16, n_blocks=30,
                                 max_pwr=9),
        testing.random_acm_bytes(rng, level=2, rows=7, n_blocks=9),
        testing.random_acm_bytes(rng, level=10, rows=4, n_blocks=6),
        testing.random_acm_bytes(rng, level=4, rows=40, n_blocks=20),
    ]
    fields = ("cls", "pay4", "pay8", "pay16", "wid4", "wid8", "wid16",
              "pwr", "val", "events")
    serial = [{f: getattr(native.scan_bytes_packed(d), f).copy()
               for f in fields} for d in datas]

    errors: list[Exception] = []

    def worker(tid):
        try:
            order = list(range(len(datas)))
            for rep in range(12):
                for j in order[tid % len(order):] + order[:tid % len(order)]:
                    got = native.scan_bytes_packed(datas[j])
                    for f in fields:
                        np.testing.assert_array_equal(
                            getattr(got, f), serial[j][f],
                            err_msg=f"thread {tid} rep {rep} file {j} {f}")
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
