"""Corpus batch decode ≡ sequential per-file decode, with error isolation
and sharding over the 8 virtual CPU devices (SURVEY §4.4-4.5)."""

import numpy as np
import pytest

import jax

from libacm_tpu import testing
from libacm_tpu.format import AcmError
from libacm_tpu.parallel import decode_corpus, effective_stop, make_mesh
from libacm_tpu.scan import oracle


def _corpus(seed=0, n=12):
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n):
        level = int(rng.choice([0, 2, 4, 5]))
        rows = int(rng.integers(1, 40))
        nb = int(rng.integers(1, 6))
        files.append(
            testing.random_acm_bytes(
                rng, level=level, rows=rows, n_blocks=nb,
                channels=int(rng.integers(1, 3)) if (rows * (1 << level)) % 2 == 0 else 1,
            )
        )
    return files


def _oracle_decode(data):
    h, pcm, _ = oracle.decode_bytes(data)
    ch = h.channels
    stop = effective_stop(h.total_values, h.block_len, ch, len(pcm))
    return pcm[:stop]


def test_corpus_matches_sequential():
    files = _corpus()
    res = decode_corpus(files)
    assert len(res) == len(files)
    for data, r in zip(files, res):
        assert r.ok
        np.testing.assert_array_equal(r.pcm, _oracle_decode(data))


def test_corpus_sharded_matches_unsharded():
    files = _corpus(seed=7, n=10)
    mesh = make_mesh()
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
    res_m = decode_corpus(files, mesh=mesh)
    res_1 = decode_corpus(files)
    for a, b in zip(res_m, res_1):
        assert a.status == b.status
        np.testing.assert_array_equal(a.pcm, b.pcm)


def test_corpus_sharded_packed_hostile_and_uneven():
    """The sharded packed path (per-shard wire arrays + shard_map) on a
    chunk that doesn't divide the mesh, with corrupt/truncated members."""
    rng = np.random.default_rng(21)
    files = []
    for i in range(11):  # 11 files on 8 devices: uneven groups + padding
        data = testing.speech_acm_bytes(
            rng, level=int(rng.choice([3, 6])), rows=16, n_blocks=4,
            channels=int(rng.integers(1, 3)))
        if i % 4 == 1:
            data = data[: len(data) - 10]  # truncated
        elif i % 4 == 2:
            b = bytearray(data)
            b[40] ^= 0xFF  # corrupt
            data = bytes(b)
        files.append(data)
    res_m = decode_corpus(files, mesh=make_mesh())
    res_1 = decode_corpus(files)
    for a, b in zip(res_m, res_1):
        assert a.status == b.status
        assert a.filler_words == b.filler_words
        np.testing.assert_array_equal(a.pcm, b.pcm)


def test_decode_stream_device_blocks_sharded():
    """One big file sharded along its BLOCK axis across the mesh — the
    sequence-parallel analog (SURVEY §5 long-context): the carry-free
    formulation makes the halo a ppermute XLA inserts on its own."""
    from libacm_tpu.parallel.corpus import decode_stream_device

    rng = np.random.default_rng(33)
    data = testing.speech_acm_bytes(rng, level=6, rows=16, n_blocks=40)
    mesh = make_mesh(axis="blocks")
    pcm, meta = decode_stream_device(data, mesh=mesh, axis="blocks")
    assert meta.status == 0
    host = np.asarray(jax.device_get(pcm)).reshape(-1)
    want = _oracle_decode(data)
    np.testing.assert_array_equal(host[: len(want)], want)


def test_corpus_error_isolation():
    rng = np.random.default_rng(3)
    good = testing.random_acm_bytes(rng, level=3, rows=8, n_blocks=2)
    res = decode_corpus([good, b"not an acm file at all", good])
    assert res[0].ok and res[2].ok
    assert res[1].status == AcmError.ERR_NOT_ACM
    assert res[1].pcm is None
    np.testing.assert_array_equal(res[0].pcm, res[2].pcm)


def test_corpus_truncated_file_reports_filler():
    rng = np.random.default_rng(5)
    data = testing.random_acm_bytes(rng, level=2, rows=16, n_blocks=4)
    cut = data[: len(data) - len(data) // 3]
    res = decode_corpus([cut])[0]
    h, pcm, _ = oracle.decode_bytes(cut)
    assert res.filler_words == h.total_values - len(res.pcm)
    np.testing.assert_array_equal(res.pcm, pcm[: len(res.pcm)])


def test_corpus_force_chans():
    rng = np.random.default_rng(9)
    data = testing.random_acm_bytes(rng, level=2, rows=16, n_blocks=2, channels=1)
    r = decode_corpus([data], force_chans=2)[0]
    assert r.info.channels == 2
    assert r.info.acm_channels == 1


def test_effective_stop_odd_blocklen_stereo_wedge():
    # block_len odd + stereo: the stranded final word of each block wedges
    # the reference's read loop (numwords%channels clamp, decode.c:857).
    assert effective_stop(100, 9, 2, 27) == 8
    assert effective_stop(100, 8, 2, 24) == 24
    assert effective_stop(7, 8, 2, 24) == 6
    assert effective_stop(100, 9, 1, 27) == 27


def test_device_checksum_config_invariant():
    """checksum() is a content digest: padded rows/blocks are masked, so
    any chunking / mesh / backend configuration yields the same value
    (padded all-zero blocks DO synthesize nonzero PCM via the rounding
    bias, so an unmasked sum would depend on _pad_blocks geometry)."""
    from libacm_tpu.parallel import decode_corpus_device, make_mesh

    rng = np.random.default_rng(77)
    files = [testing.speech_acm_bytes(rng, level=4, rows=8,
                                      n_blocks=int(rng.integers(2, 9)))
             for _ in range(7)]
    base = decode_corpus_device(files).checksum()
    assert base == decode_corpus_device(files, chunk_files=2).checksum()
    assert base == decode_corpus_device(files, pack=False).checksum()
    assert base == decode_corpus_device(files, mesh=make_mesh()).checksum()


def test_corpus_unreadable_file_isolated(tmp_path):
    """An unreadable path yields FileResult(status=ERR_OPEN) — IO failures
    are per-file isolated exactly like decode errors."""
    from libacm_tpu.format import AcmError

    rng = np.random.default_rng(5)
    good = testing.speech_acm_bytes(rng, level=3, rows=8, n_blocks=3)
    gf = tmp_path / "good.acm"
    gf.write_bytes(good)
    missing = tmp_path / "nope.acm"
    for backend in ("host", "jax"):
        res = decode_corpus([str(gf), str(missing), str(gf)],
                            backend=backend)
        assert res[1].status == int(AcmError.ERR_OPEN)
        assert res[1].pcm is None
        assert res[0].status == 0 and res[2].status == 0
        np.testing.assert_array_equal(res[0].pcm, res[2].pcm)


def test_ingest_indices_survive_batching(tmp_path):
    """iter_pcm/iter_frames re-anchor chunk-relative indices to the
    manifest (regression: every file past the first batch was mislabeled)."""
    from libacm_tpu.ingest import iter_frames, iter_pcm

    rng = np.random.default_rng(3)
    files = []
    for i in range(7):
        f = tmp_path / f"f{i}.acm"
        f.write_bytes(testing.speech_acm_bytes(rng, level=3, rows=8,
                                               n_blocks=2 + i % 3))
        files.append(str(f))
    singles = [decode_corpus([f])[0] for f in files]
    got = list(iter_pcm(files, batch_files=3))
    assert [r.index for r in got] == list(range(7))
    for r, s in zip(got, singles):
        np.testing.assert_array_equal(r.pcm, s.pcm)
    idxs = {i for i, _ in iter_frames(files, 256, batch_files=2)}
    assert idxs == set(range(7))


def test_corpus_file_vanishes_mid_scan(tmp_path):
    """A file that disappears between the header peek and the chunk scan
    yields FileResult(status=ERR_OPEN) on every backend path — it must
    neither kill the batch (dense path used to raise) nor read as a
    clean empty success (wire path used to report status=0)."""
    import os

    from libacm_tpu.format import AcmError

    rng = np.random.default_rng(13)
    good = testing.speech_acm_bytes(rng, level=3, rows=8, n_blocks=3)
    gf = tmp_path / "good.acm"
    gf.write_bytes(good)
    vf = tmp_path / "vanish.acm"

    class VanishingPath(os.PathLike):
        """Resolves to a real file for the header peek, then vanishes."""

        def __init__(self):
            self.calls = 0

        def __fspath__(self):
            self.calls += 1
            return str(vf if self.calls <= 1 else tmp_path / "gone.acm")

    from libacm_tpu.parallel import decode_corpus_device

    for pack in (True, False):
        vf.write_bytes(good)
        res = decode_corpus_device([str(gf), VanishingPath(), str(gf)],
                                   pack=pack).to_results()
        assert res[1].status == int(AcmError.ERR_OPEN), pack
        assert res[1].pcm is None
        assert res[0].status == 0 and res[2].status == 0
        np.testing.assert_array_equal(res[0].pcm, res[2].pcm)


def test_decode_stream_device_windowed_bounded_memory():
    """VERDICT r2 item 3: ONE huge stream decoded through a read()-only
    source into a blocks-sharded mesh via the REAL pipeline (windowed
    native packed scan → cols-wire chunks → device unpack+synth with the
    carry threaded on device), byte-exact vs the oracle, with host
    residency bounded to O(window) — the source is never slurped."""
    from libacm_tpu.parallel.corpus import decode_stream_device

    rng = np.random.default_rng(44)
    data = testing.speech_acm_bytes(rng, level=5, rows=32, n_blocks=600)

    class MeteredPipe:
        """read()-only source that tracks the largest single request."""

        def __init__(self, raw):
            self._raw = raw
            self._pos = 0
            self.max_req = 0

        def read(self, n=-1):
            assert n >= 0, "windowed path must never slurp"
            self.max_req = max(self.max_req, n)
            out = self._raw[self._pos : self._pos + n]
            self._pos += len(out)
            return out

    pipe = MeteredPipe(data)
    mesh = make_mesh(axis="blocks")
    pcm, meta = decode_stream_device(
        pipe, mesh=mesh, axis="blocks", window_blocks=16)
    assert meta.status == 0
    want = _oracle_decode(data)
    assert meta.filler_words == 0
    host = np.asarray(jax.device_get(pcm)).reshape(-1)
    np.testing.assert_array_equal(host[: len(want)], want)
    # bounded residency: requests stay at the 64 KiB IO granularity (the
    # reference's own buffer size, decode.c:29), far below the file size
    assert pipe.max_req <= 128 * 1024 < len(data), (pipe.max_req, len(data))


def test_decode_stream_device_windowed_matches_fullfile():
    """Windowed and whole-file stream-device decode agree (including
    events/status metadata) on clean and error-bearing streams."""
    from libacm_tpu.parallel.corpus import decode_stream_device

    rng = np.random.default_rng(45)
    clean = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=30)
    cut = clean[: int(len(clean) * 0.8)]
    for data in (clean, cut):
        p_full, m_full = decode_stream_device(data)
        p_win, m_win = decode_stream_device(data, window_blocks=8)
        assert m_full.status == m_win.status
        assert m_full.filler_words == m_win.filler_words
        nf = np.asarray(jax.device_get(p_full)).reshape(-1)
        nw = np.asarray(jax.device_get(p_win)).reshape(-1)
        n = min(len(nf), len(nw))
        np.testing.assert_array_equal(nf[:n], nw[:n])


def test_decode_stream_device_hostile_unseekable_source():
    """Fuzz-found (seed 2103 round 280): a stale-amp-table stream decoded
    windowed from a read()-only source used to crash with a TypeError
    deep in the fallback (the consumed pipe cannot be re-read). Contract
    now: re-readable sources fall back to the exact host decode; a
    consumed unseekable source raises the documented ValueError."""
    import io as _io
    import pathlib

    from libacm_tpu.parallel.corpus import decode_stream_device

    data = (pathlib.Path(__file__).parent / "fixtures" /
            "stale_table_fuzz_2103.acm").read_bytes()
    host = decode_corpus([data])[0]
    assert host.status == 0 and host.pcm is not None

    # bytes source: exact fallback, windowed and full-file
    for wb in (None, 2, 4):
        pcm, meta = decode_stream_device(data, window_blocks=wb)
        got = np.asarray(pcm).reshape(-1)
        np.testing.assert_array_equal(got[: len(host.pcm)], host.pcm)
        assert meta.status == host.status

    # seekable object: rewound and exact
    pcm, _ = decode_stream_device(_io.BytesIO(data), window_blocks=2)
    np.testing.assert_array_equal(
        np.asarray(pcm).reshape(-1)[: len(host.pcm)], host.pcm)

    class _Pipe:
        def __init__(self, b):
            self._b = _io.BytesIO(b)

        def read(self, n=-1):
            return self._b.read(n)

    with pytest.raises(ValueError, match="stale-amp-table"):
        decode_stream_device(_Pipe(data), window_blocks=2)
    # FULL-FILE mode already slurped the bytes: the same hostile stream
    # from a consumed pipe must fall back using the in-hand data instead
    # of demanding a re-readable source
    pcm, meta = decode_stream_device(_Pipe(data))
    np.testing.assert_array_equal(
        np.asarray(pcm).reshape(-1)[: len(host.pcm)], host.pcm)
    assert meta.status == host.status
    # a CLEAN stream from the same pipe type stays fine (no regression)
    rng = np.random.default_rng(8)
    clean = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=6)
    want = decode_corpus([clean])[0].pcm
    pcm, _ = decode_stream_device(_Pipe(clean), window_blocks=2)
    np.testing.assert_array_equal(
        np.asarray(pcm).reshape(-1)[: len(want)], want)
    # full-file mode slurps a fresh read()-only source too
    pcm, _ = decode_stream_device(_Pipe(clean))
    np.testing.assert_array_equal(
        np.asarray(pcm).reshape(-1)[: len(want)], want)


def test_stream_device_ignores_bits_past_declared_blocks():
    """Fuzz seed 9202 round 1520: a WAVC stream whose trailing bits parse
    as a doomed block attempt PAST the declared total_values. The
    reference never attempts that block (acm_read clamps at total_values,
    decode.c:853-854), so decode_stream_device must report the same clean
    status as the corpus path in every mode."""
    import io
    import pathlib

    from libacm_tpu.parallel.corpus import decode_stream_device

    data = (pathlib.Path(__file__).parent
            / "fixtures" / "trailing_bits_clean.acm").read_bytes()
    host = decode_corpus([data])[0]
    assert host.status == 0

    class NoLen:
        def __init__(self, d):
            self._b = io.BytesIO(d)

        def read(self, n=-1):
            return self._b.read(n)

    for mesh in (None, make_mesh(axis="blocks")):
        for wb, pipe in ((None, False), (2, False), (1, True), (3, True)):
            src = NoLen(data) if pipe else data
            pcm, meta = decode_stream_device(src, mesh=mesh,
                                             window_blocks=wb)
            assert meta.status == host.status, (wb, pipe, meta.status)
            got = np.asarray(pcm).reshape(-1)
            assert np.array_equal(got[: len(host.pcm)], host.pcm)


def test_corpus_host_workers_match_serial():
    """Multi-threaded host decode (GIL-released native, thread-local
    scratch) must be index-ordered and byte-identical to the serial path,
    including failed/hostile members."""
    from libacm_tpu.parallel.corpus import decode_corpus_host
    from libacm_tpu.scan import native

    if not native.available():
        pytest.skip("native scanner unavailable")
    rng = np.random.default_rng(33)
    files = _corpus(seed=33, n=14)
    files[3] = files[3][: len(files[3]) // 2]          # truncated
    files[6] = b"not an acm stream at all"             # not ACM
    b = bytearray(files[9])                            # bit-flipped body
    b[20] ^= 0x40
    files[9] = bytes(b)
    serial = decode_corpus_host(files)
    for workers in (2, 5):
        par = decode_corpus_host(files, workers=workers)
        assert [r.index for r in par] == [r.index for r in serial]
        for a, b2 in zip(par, serial):
            assert a.status == b2.status
            if b2.pcm is None:
                assert a.pcm is None
            else:
                np.testing.assert_array_equal(a.pcm, b2.pcm)


def test_host_batch_matches_per_file_decode():
    """The one-native-call corpus batch (acm_decode_corpus_host_batch)
    must be bit-identical per file to solo decode_host calls — mixed
    geometries, truncated and heavily bit-flipped members, and the
    event-slot overflow -> solo-rescan path included."""
    from libacm_tpu.scan import native

    if not native.available():
        pytest.skip("native scanner unavailable")
    from libacm_tpu.scan.oracle import BitReader, parse_header

    rng = np.random.default_rng(77)
    files = _corpus(seed=77, n=16)
    files[2] = files[2][: len(files[2]) * 2 // 3]  # truncated
    flip = bytearray(files[5])  # moderate corruption (bit flips)
    for _ in range(40):
        flip[int(rng.integers(14, len(flip)))] ^= 1 << int(rng.integers(0, 8))
    files[5] = bytes(flip)
    # guaranteed event-slot overflow: a 2-block header whose body is a
    # truncated block followed by 0xFF garbage — every garbage attempt
    # reads pwr/val then hits filler 31 (f_bad) and fails, so the attempt
    # count (~8*600/25) dwarfs the 2*nb+16 slot and the batch must route
    # this file to the solo rescan
    tiny = testing.random_acm_bytes(np.random.default_rng(5), level=4,
                                    rows=8, n_blocks=2)
    files[8] = tiny[: len(tiny) * 3 // 5] + b"\xff" * 600
    headers = [parse_header(BitReader(b)) for b in files]
    batch = native.decode_corpus_host_batch(files, headers)
    n_overflowed = 0
    for data, header, bf in zip(files, headers, batch):
        hd = native.decode_host(data, header)
        if bf.overflowed:
            n_overflowed += 1
            continue  # contract: caller rescans solo (which IS `hd`)
        assert bf.n_good == hd.n_good
        assert bf.first_err == hd.first_err
        np.testing.assert_array_equal(bf.events, hd.events)
        np.testing.assert_array_equal(bf.pcm, hd.pcm)
    # the corruption above must actually exercise the overflow -> solo
    # rescan branch; if the event slot grows later, re-tune this fixture
    assert n_overflowed >= 1
    # end to end: decode_corpus_host (batch + rescans + finalize) must
    # equal a per-file decode_host reassembly on the same hostile corpus
    from libacm_tpu.parallel.corpus import (_FileEntry, _apply_host_decode,
                                            _finalize, decode_corpus_host,
                                            resolve_channels)

    got = decode_corpus_host(files)
    for i, (data, header, r) in enumerate(zip(files, headers, got)):
        e = _FileEntry(index=i, src=data, header=header, nbytes=len(data),
                       channels=resolve_channels(header.channels,
                                                 header.wavc_file, 0))
        _apply_host_decode(e, native.decode_host(data, header))
        want = _finalize(e, e.host_pcm, header.block_len)
        assert r.status == want.status
        assert r.filler_words == want.filler_words
        np.testing.assert_array_equal(r.pcm, want.pcm)


def test_corpus_config_host_workers_routing():
    """CorpusConfig.host_workers reaches the host path through
    decode_corpus (one precedence rule across both entry points)."""
    from libacm_tpu.parallel.corpus import CorpusConfig
    from libacm_tpu.scan import native

    if not native.available():
        pytest.skip("native scanner unavailable")
    files = _corpus(seed=40, n=6)
    cfg = CorpusConfig(host_workers=3)
    res = decode_corpus(files, config=cfg)
    for data, r in zip(files, res):
        assert r.ok
        np.testing.assert_array_equal(r.pcm, _oracle_decode(data))


def test_decode_stream_device_without_native_scanner(monkeypatch):
    """With no native scanner every decode_stream_device call routes
    through the exact oracle fallback — including from a read()-only
    source, since full-file mode (the only no-native mode) already holds
    the bytes. This used to fail with a misleading 'stale-amp-table'
    ValueError for ALL pipe sources."""
    import io as _io

    from libacm_tpu.parallel.corpus import decode_stream_device
    from libacm_tpu.scan import native

    rng = np.random.default_rng(41)
    clean = testing.speech_acm_bytes(rng, level=4, rows=8, n_blocks=6)
    want = decode_corpus([clean])[0].pcm
    monkeypatch.setattr(native, "available", lambda: False)

    class _Pipe:
        def __init__(self, b):
            self._b = _io.BytesIO(b)

        def read(self, n=-1):
            return self._b.read(n)

    for src in (clean, _io.BytesIO(clean), _Pipe(clean)):
        pcm, meta = decode_stream_device(src)
        np.testing.assert_array_equal(
            np.asarray(pcm).reshape(-1)[: len(want)], want)
        assert meta.status == 0


def test_wire_pool_hold_blocks_reuse_between_scan_and_dispatch(monkeypatch):
    """The sharded cols-wire loop scans all shard groups BEFORE the
    dispatch future exists; every group shares the pool key, so without
    the _SCAN_HOLD pin the pool would hand group s's buffers to group
    s+1 (reset + payload overwrite -> wrong PCM for shard s). Pooling is
    accelerator-only, so force it on."""
    from libacm_tpu.parallel import corpus as C

    monkeypatch.setattr(C.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(C._SCAN_TLS, "wire_pool", [], raising=False)
    w1 = C._acquire_wire_bufs(2, 4, 3, 8)
    w1.fut = C._SCAN_HOLD
    w2 = C._acquire_wire_bufs(2, 4, 3, 8)
    assert w2 is not w1  # held buffer must not be reused
    w1.fut = None
    w2.fut = None
    w3 = C._acquire_wire_bufs(2, 4, 3, 8)
    assert w3 is w1 or w3 is w2  # released buffers ARE reused
    C._SCAN_TLS.wire_pool = []


def test_windowed_native_calls_release_buffer_exports():
    """Fuzz seed 6100 round 1524: the native calls' ctypes pointers kept
    a CYCLIC export of the caller's byte window alive until gc, so
    growing the window (`buf += chunk`) raised BufferError whenever a
    collection hadn't happened yet. With gc disabled, both windowed
    consumers must still be able to grow their buffers — the export has
    to release at call return, deterministically."""
    import gc

    from libacm_tpu import acm_open_decoder
    from libacm_tpu.parallel.corpus import decode_stream_device

    rng = np.random.default_rng(3)
    # dense coefficients (wide linear fillers): the actual stream (~13
    # bits/sample, >64 KiB) exceeds the stream scanner's ~4 bits/sample
    # first-window estimate, forcing the NEED_MORE_DATA grow path that
    # crashed
    data = testing.random_acm_bytes(rng, level=6, rows=24, n_blocks=120,
                                    max_pwr=14)
    expect = decode_corpus([data])[0]
    gc.disable()
    try:
        pcm, meta = decode_stream_device(data)
        got = np.asarray(pcm).reshape(-1)
        assert meta.status == expect.status
        assert np.array_equal(got[: len(expect.pcm)], expect.pcm)

        # windowed AcmStream grows self.buf after zero-copy native calls
        s = acm_open_decoder(data, window_blocks=2)
        out = bytearray()
        while chunk := s.read_loop(8192):
            out += chunk
        assert bytes(out) == expect.pcm.astype("<i2").tobytes()
    finally:
        gc.enable()
