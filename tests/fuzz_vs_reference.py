"""Long-running differential fuzz: full pipeline vs the compiled C reference.

Not a pytest (runtime-unbounded); run manually:
    python tests/fuzz_vs_reference.py [seconds] [seed]

Each round synthesizes a random stream (random geometry, content style,
optional WAVC wrap, optional truncation/bit flips — header bytes
included), decodes it with the C binary (`acmtool -d -r`) and with this
framework through the public paths (AcmStream read_loop — full-file or
windowed — and decode_corpus), and requires byte equality of the decoded
prefix plus agreement on the zero-padded tail. Some rounds additionally
diff: the repo's own acmtool CLI output against the reference binary's
bytes, DecodeState save/resume at a random cut, and read_segment random
windows. Any divergence saves the offending stream next to this script
and exits non-zero.
"""

import io
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

# sharded-mesh rounds need multiple (virtual) devices; harmless elsewhere
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("LIBACM_TPU_PLATFORM", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libacm_tpu import cli as acmcli  # noqa: E402
from libacm_tpu import testing  # noqa: E402
from libacm_tpu.format import AcmException, cli_total_bytes  # noqa: E402
from libacm_tpu.parallel import decode_corpus  # noqa: E402
from libacm_tpu.scan.oracle import BitReader, parse_header  # noqa: E402
from libacm_tpu.stream import AcmStream, acm_open_decoder  # noqa: E402

REF = "/tmp/refbuild/src/acmtool"
#: skip the want-file comparison when a (hostile) header legitimately
#: makes the reference emit this much — disk/time guard, not a semantic one
MAX_REF_BYTES = 64 << 20

try:
    from tests.ref_harness import build_seekread
    SEEKREAD = build_seekread("/tmp/refbuild/harness")
except Exception:
    SEEKREAD = None


def ref_decode(data: bytes):
    with tempfile.NamedTemporaryFile(suffix=".acm", delete=False) as f:
        f.write(data)
        src = f.name
    out = src + ".raw"
    try:
        r = subprocess.run([REF, "-d", "-r", "-q", "-o", out, src],
                           capture_output=True, text=True, timeout=60)
        try:
            pcm = np.frombuffer(open(out, "rb").read(), dtype="<i2")
        except OSError:
            pcm = None
        return pcm, r.stderr
    finally:
        # multi-hour campaigns call this every round (up to MAX_REF_BYTES
        # of .raw each): leaking the pair fills /tmp across a campaign
        pathlib.Path(src).unlink(missing_ok=True)
        pathlib.Path(out).unlink(missing_ok=True)


def gen_stream(rng: np.random.Generator) -> tuple[bytes, str]:
    """The round's stream synthesis + mutation (deterministic given the
    RNG state — re-run with a captured state to regenerate a repro)."""
    if rng.random() < 0.06:
        # high-level tail (cols 512..32768): the degenerate strip loop
        # (decode.c:538-541) and huge wrapbuf; rows stay tiny to keep a
        # round's block_len (and the reference's decode time) bounded
        level = int(rng.integers(9, 16))
        rows = int(rng.integers(1, max(2, 1 << max(13 - level, 0))))
    else:
        level = int(rng.integers(0, 9))
        rows = int(rng.integers(1, 80))
    nb = int(rng.integers(1, 7))
    style = rng.random()
    if style < 0.5:
        data = testing.random_acm_bytes(
            rng, level=level, rows=rows, n_blocks=nb,
            channels=int(rng.integers(1, 3)),
            wavc=bool(rng.integers(0, 2)), max_pwr=int(rng.integers(0, 16)))
    elif style < 0.92:
        data = testing.speech_acm_bytes(
            rng, level=level, rows=rows, n_blocks=nb,
            channels=int(rng.integers(1, 3)),
            base_pwr=int(rng.integers(2, 9)),
            wavc=bool(rng.integers(0, 2)))
    else:
        # streams authored by the REAL lossy encoder: a different filler/
        # value distribution than the fixture synthesizers (ridge-LS
        # coefficients, cheapest-covering-filler choices)
        from libacm_tpu.encode import encode_pcm

        lv = int(rng.integers(1, 7))
        rw = int(rng.integers(1, 24))
        ch = int(rng.integers(1, 3))
        n = (rw << lv) * int(rng.integers(1, 4))
        pcm = (rng.normal(0, 3000, n * ch)
               .clip(-32768, 32767).astype(np.int16))
        try:
            data = encode_pcm(pcm, level=lv, rows=rw, channels=ch,
                              pwr=int(rng.integers(4, 12)),
                              wavc=bool(rng.integers(0, 2))).data
        except Exception:
            # encoder rejected the geometry: never kill the campaign over
            # stream AUTHORING — fall back to a fixture stream
            data = testing.speech_acm_bytes(
                rng, level=level, rows=rows, n_blocks=nb)
    mut = rng.random()
    if mut < 0.25 and len(data) > 20:
        data = data[: int(rng.integers(14, len(data)))]
        kind = "trunc"
    elif mut < 0.45:
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(14, len(b)))] ^= 1 << int(rng.integers(0, 8))
        data = bytes(b)
        kind = "flip"
    elif mut < 0.55:
        # header-region flips: hostile total_values/channels/rate/level/rows
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, min(42, len(b))))] ^= \
                1 << int(rng.integers(0, 8))
        data = bytes(b)
        kind = "hdrflip"
    else:
        kind = "clean"
    return data, kind


def _regen_stream(rng: np.random.Generator) -> bytes:
    return gen_stream(rng)[0]


def one_round(rng: np.random.Generator) -> str:
    data, kind = gen_stream(rng)
    _POOL.append(data)
    if len(_POOL) > 32:
        del _POOL[0]

    # output-size guard: a hostile header the reference accepts can demand
    # gigabytes of zero filler from BOTH tools; don't fuzz the disk
    hdr = parse_header(BitReader(data))
    if hdr is not None:
        tb = cli_total_bytes(hdr.total_values,
                             2 if hdr.channels == 2 else 1)
        if tb > MAX_REF_BYTES:
            return "huge"

    want, _ = ref_decode(data)
    if want is None:
        return kind  # reference refused to open; header-level reject

    # path 1: corpus decode
    r = decode_corpus([data])[0]
    got = r.pcm if r.pcm is not None else np.zeros(0, np.int16)
    assert np.array_equal(got, want[: len(got)]), "corpus prefix mismatch"
    assert not want[len(got):].any(), "reference tail not zero-padding"

    # occasionally: the repo's own CLI, byte-for-byte vs the reference CLI
    if rng.random() < 0.04:
        assert_cli_parity(data)

    # the CLI's int32 total_bytes overflows negative for absurd headers and
    # emits nothing; the library API still reads — skip the want-based
    # stream comparison there (the corpus check above covered CLI parity)
    if len(want) == 0 and len(got) == 0:
        return kind

    # path 2: streaming API — full-file or bounded-memory windowed
    windowed = rng.random() < 0.35
    try:
        if windowed:
            s = AcmStream(_NoLenSource(data),
                          window_blocks=int(rng.integers(1, 5)))
        else:
            s = acm_open_decoder(data)
        buf = bytearray()
        cut_state = None
        cut_at = int(rng.integers(0, 4 * len(want) + 2)) \
            if rng.random() < 0.3 else None
        while True:
            try:
                chunk = s.read_loop(8192)
            except AcmException:
                break
            if not chunk:
                break
            buf += chunk
            if cut_at is not None and len(buf) >= cut_at and cut_state is None:
                cut_state = (len(buf), s.get_state().to_json())
        got2 = np.frombuffer(bytes(buf), dtype="<i2")
    except AcmException:
        got2 = np.zeros(0, np.int16)
        cut_state = None
    assert np.array_equal(got2, want[: len(got2)]), "stream prefix mismatch"
    assert not want[len(got2):].any(), "stream tail mismatch"

    # DecodeState save/resume at a random cut: the resumed stream must
    # produce exactly the remaining bytes
    if cut_state is not None:
        from libacm_tpu.stream import DecodeState

        done, st = cut_state
        if windowed:
            # fresh windowed stream at position 0: a forward-only replay,
            # so even a read()-only source resumes
            s2 = AcmStream(_NoLenSource(data),
                           window_blocks=int(rng.integers(1, 5)))
        else:
            s2 = acm_open_decoder(data)
        s2.set_state(DecodeState.from_json(st))
        rest = bytearray()
        while True:
            try:
                chunk = s2.read_loop(8192)
            except AcmException:
                break
            if not chunk:
                break
            rest += chunk
        assert bytes(rest) == bytes(got2.tobytes()[done:]), "resume mismatch"

    # seek-path differential vs the reference LIBRARY (harness): the
    # post-seek amp table persists in the C, so stale-table streams
    # decode different bytes on the re-decode pass (util.c:230-241)
    if SEEKREAD is not None and rng.random() < 0.10:
        pre = int(rng.integers(0, 2 * len(want) + 2))
        tgt = int(rng.integers(0, max(1, len(want))))
        with tempfile.NamedTemporaryFile(suffix=".acm", delete=False) as f:
            f.write(data)
            src = f.name
        want_seek = subprocess.run(
            [SEEKREAD, src, str(pre), str(tgt)],
            capture_output=True, timeout=60).stdout
        pathlib.Path(src).unlink(missing_ok=True)
        for mode in ("full", "windowed"):
            if mode == "full":
                s = acm_open_decoder(data)
            else:
                s = AcmStream(io.BytesIO(data),
                              window_blocks=int(rng.integers(1, 5)))
            left = pre
            while left > 0:  # mirror the harness' 64 KiB pre-read loop
                try:
                    b = s.read_loop(min(1 << 16, left))
                except AcmException:
                    break
                if not b:
                    break
                left -= len(b)
            s.seek_pcm(tgt)
            got_seek = bytearray()
            while True:
                try:
                    b = s.read_loop(1 << 16)
                except AcmException:
                    break
                if not b:
                    break
                got_seek += b
            assert bytes(got_seek) == want_seek, f"seek mismatch ({mode})"

    # random-access window vs the full decode (clean streams only: the
    # random-access contract covers clean prefixes)
    if kind == "clean" and len(got2) and rng.random() < 0.25:
        from libacm_tpu.parallel.random_access import (build_index,
                                                       read_segment)

        idx = build_index(data)
        avail = min(len(got2), idx.words_avail)
        if avail > 1:
            a = int(rng.integers(0, avail - 1))
            nw = int(rng.integers(1, avail - a))
            # cover BOTH routes: the fused native host sweep (the serving
            # default) and the XLA wire-coalescing device route ("jax"),
            # which the default no longer exercises
            be = "auto" if rng.random() < 0.5 else "jax"
            seg = read_segment(data, idx, a, nw, backend=be)
            assert np.array_equal(seg, got2[a : a + nw]), \
                f"segment mismatch (backend={be})"

    # encoder axis: losslessly re-encode (optimal filler choices) and make
    # the REFERENCE BINARY decode the framework-authored bitstream — the
    # C decoder is the ground truth that our emitted grammar is legal and
    # PCM-identical (clean, fully-decoded streams only: that is
    # optimize_acm's contract)
    if kind == "clean" and len(want) and rng.random() < 0.10:
        from libacm_tpu.encode import optimize_acm

        try:
            redata = optimize_acm(data)
        except ValueError:
            redata = None  # stream ends mid-block etc.: out of contract
        if redata is not None:
            want2, _ = ref_decode(redata)
            assert want2 is not None, "reference refused re-encoded stream"
            assert np.array_equal(want2, want), "re-encode PCM mismatch"
            return "optimize"
    return kind


#: rolling pool of recently fuzzed streams for the sharded-corpus rounds
_POOL: list[bytes] = []


def _maybe_wavc(rng: np.random.Generator, data: bytes) -> bytes:
    """WAVC-wrapper mutation axis for the mesh rounds: sometimes wrap a
    pooled member — valid, byte-corrupted inside the 28-byte wrapper, or
    truncated in/near the wrapper — so the sharded path sees hostile
    headers too (VERDICT r3 item 8). The host path is the comparator, so
    whatever the wrapper's validity, both paths must agree."""
    r = rng.random()
    if r < 0.6:
        return data
    from libacm_tpu.testing import wavc_wrap

    wrapped = bytearray(wavc_wrap(data))
    r2 = rng.random()
    if r2 < 0.5:
        return bytes(wrapped)  # valid wrapper
    if r2 < 0.8:  # corrupt one wrapper byte (magic/'V1.0'/word6/sizes)
        wrapped[int(rng.integers(0, 28))] ^= 1 << int(rng.integers(0, 8))
        return bytes(wrapped)
    # truncate within the wrapper or the inner ACM header
    return bytes(wrapped[: int(rng.integers(1, min(60, len(wrapped))))])


def sharded_round(rng: np.random.Generator) -> None:
    """Decode a random corpus (incl. hostile members) on an 8-virtual-
    device mesh through the packed shard_map path and byte-compare every
    file against the host path (VERDICT r2 item 6). Uneven chunks and a
    corpus size not divisible by the mesh exercise the padding rows."""
    import jax

    from libacm_tpu.parallel import decode_corpus_device, make_mesh

    n = int(rng.integers(3, 14))  # usually not a multiple of 8
    corpus = [_maybe_wavc(rng, bytes(_POOL[int(rng.integers(0, len(_POOL)))]))
              for _ in range(n)]
    try:
        _sharded_check(rng, corpus)
    except AssertionError:
        # pooled inputs can't be regenerated from RNG state: save them
        d = pathlib.Path(__file__).parent / "fuzz_fail_sharded"
        d.mkdir(exist_ok=True)
        for j, b in enumerate(corpus):
            (d / f"m{j}.acm").write_bytes(b)
        raise


def _sharded_check(rng: np.random.Generator, corpus) -> None:
    import jax

    from libacm_tpu.parallel import decode_corpus_device, make_mesh

    host = decode_corpus(corpus, backend="host")
    # multi-threaded host decode (GIL-released native, thread-local
    # scratch) must be identical to the serial host path on the same
    # hostile corpus
    if rng.random() < 0.5:
        from libacm_tpu.parallel.corpus import decode_corpus_host

        par = decode_corpus_host(corpus, workers=int(rng.integers(2, 6)))
        for h, p in zip(host, par):
            assert h.status == p.status, "workers status mismatch"
            hp, pp = h.pcm, p.pcm
            assert (hp is None) == (pp is None), "workers open mismatch"
            if hp is not None:
                assert np.array_equal(hp, pp), "workers pcm mismatch"
    mesh = make_mesh()
    dev = decode_corpus_device(
        corpus, mesh=mesh,
        chunk_files=int(rng.integers(1, 4)),
        backend="jax").to_results()
    for h, d in zip(host, dev):
        assert h.status == d.status, "sharded status mismatch"
        assert h.filler_words == d.filler_words, "sharded filler mismatch"
        hp = h.pcm if h.pcm is not None else None
        dp = d.pcm if d.pcm is not None else None
        assert (hp is None) == (dp is None), "sharded open mismatch"
        if hp is not None:
            assert np.array_equal(hp, dp), "sharded pcm mismatch"


def stream_device_round(rng: np.random.Generator) -> None:
    """Decode ONE pooled stream through decode_stream_device — sometimes
    blocks-sharded over the 8-virtual-device mesh, sometimes windowed
    with O(window) host residency from a read()-only source — and
    byte-compare the valid words against the host corpus path (which the
    clean rounds pin to the reference). Stale-amp-table streams exercise
    the documented exact-host fallback inside the same call."""
    import jax

    from libacm_tpu.parallel import make_mesh
    from libacm_tpu.parallel.corpus import decode_stream_device

    data = bytes(_POOL[int(rng.integers(0, len(_POOL)))])
    try:
        _stream_device_check(rng, data)
    except AssertionError:
        # pooled rounds can't be regenerated from RNG state (the input
        # came from the pool, not a fresh draw): save the ACTUAL stream
        bad = pathlib.Path(__file__).parent / "fuzz_fail_pooled.acm"
        bad.write_bytes(data)
        raise


def _stream_device_check(rng: np.random.Generator, data: bytes) -> None:
    from libacm_tpu.parallel import make_mesh
    from libacm_tpu.parallel.corpus import decode_stream_device

    h = decode_corpus([data])[0]
    mesh = make_mesh(axis="blocks") if rng.random() < 0.5 else None
    wb = int(rng.integers(1, 6)) if rng.random() < 0.6 else None
    pipe = wb is not None and rng.random() < 0.5
    src = _NoLenSource(data) if pipe else data
    try:
        pcm, meta = decode_stream_device(src, mesh=mesh, window_blocks=wb)
    except ValueError as e:
        # documented: a hostile (stale-amp-table) stream from a consumed
        # unseekable source cannot be exactly re-decoded — but the SAME
        # stream as re-readable bytes must then succeed
        assert pipe and "stale-amp-table" in str(e), e
        pcm, meta = decode_stream_device(data, mesh=mesh, window_blocks=wb)
    except Exception:
        assert h.pcm is None or h.status != 0, \
            "stream_device raised on a stream the host path decodes"
        return
    assert h.status == meta.status, "stream_device status mismatch"
    got = np.asarray(pcm).reshape(-1)
    hp = h.pcm if h.pcm is not None else np.zeros(0, np.int16)
    # device output is block-padded; the host result is the valid prefix
    assert len(got) >= len(hp), "stream_device shorter than host decode"
    assert np.array_equal(got[: len(hp)], hp), "stream_device pcm mismatch"


class _NoLenSource:
    """read()-only AcmIO wrapper (exercises the windowed/pipe path)."""

    def __init__(self, data: bytes):
        self._b = io.BytesIO(data)

    def read(self, size: int = -1) -> bytes:
        return self._b.read(size)


def assert_cli_parity(data: bytes) -> None:
    """repo `acmtool -d -r` bytes + stderr notices vs the reference binary."""
    with tempfile.TemporaryDirectory() as td:
        src = pathlib.Path(td) / "in.acm"
        src.write_bytes(data)
        out_ref = pathlib.Path(td) / "ref.raw"
        out_py = pathlib.Path(td) / "py.raw"
        r = subprocess.run([REF, "-d", "-r", "-q", "-o", str(out_ref),
                            str(src)], capture_output=True, text=True,
                           timeout=60)
        import contextlib

        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            acmcli.main(["-d", "-r", "-q", "-o", str(out_py), str(src)])
        ref_bytes = out_ref.read_bytes() if out_ref.exists() else None
        py_bytes = out_py.read_bytes() if out_py.exists() else None
        if ref_bytes is None:
            # reference refused to open; ours must refuse too (no file or
            # empty — we create the file before the open in decode_file)
            assert not py_bytes, "repo CLI decoded a file the reference rejected"
            return
        assert py_bytes == ref_bytes, "CLI byte mismatch"
        # the filler notice is part of the observable contract
        ref_fill = "filler_samples" in r.stderr
        py_fill = "filler_samples" in err.getvalue()
        assert ref_fill == py_fill, "CLI filler notice mismatch"


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    t0 = time.time()
    n = 0
    iters = 0
    kinds = {}
    while time.time() - t0 < budget:
        iters += 1
        if iters % 50 == 0:
            # every random geometry compiles a fresh XLA program; a
            # multi-hour single process otherwise accumulates thousands of
            # them until the process hits vm.max_map_count (65530 here —
            # observed as LLVM "Cannot allocate memory" + segfault at
            # ~70-100 new mmaps per round). Clear on measured map count.
            # NOTE the dedicated `iters` counter: a check on `n % K == 0`
            # NEVER fired — the sharded round at every 25th n consumed
            # each multiple of 50/1000 before the loop-top test saw it,
            # which is why earlier "periodic clear" mitigations did not
            # actually mitigate.
            try:
                with open(f"/proc/{os.getpid()}/maps") as mf:
                    heavy = sum(1 for _ in mf) > 30000
            except OSError:
                heavy = iters % 1000 == 0  # no /proc: periodic fallback
            if heavy:
                import jax

                jax.clear_caches()
                print(f"  [maps>30k at round {n}: cleared XLA caches]",
                      flush=True)
        state = rng.bit_generator.state
        try:
            kind = one_round(rng)
            kinds[kind] = kinds.get(kind, 0) + 1
            n += 1
            # mesh axes at ~30% of rounds combined, stream_device alone
            # >= 10% (VERDICT r4 item 6: 6/145 was too thin — the round-4
            # bug class, wire-sink tails and buffer exports, lives on the
            # device-pipeline axes)
            if _POOL and n % 8 == 0:
                sharded_round(rng)
                kinds["sharded"] = kinds.get("sharded", 0) + 1
                n += 1
            if _POOL and n % 6 == 0:
                stream_device_round(rng)
                kinds["stream_device"] = kinds.get("stream_device", 0) + 1
                n += 1
        except AssertionError as e:
            bad = pathlib.Path(__file__).parent / f"fuzz_fail_{seed}_{n}.acm"
            # regenerate the round's stream deterministically from the
            # captured RNG state and save it as the repro artifact
            rng.bit_generator.state = state
            try:
                bad.write_bytes(_regen_stream(rng))
                where = str(bad)
            except Exception as gen_err:  # still report the seed/round
                where = f"<regeneration failed: {gen_err}>"
            print(f"FAIL after {n} rounds: {e}", file=sys.stderr)
            print(f"repro stream: {where} (seed={seed}, round={n})",
                  file=sys.stderr)
            return 1
    print(f"OK: {n} rounds in {time.time()-t0:.0f}s {kinds}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
