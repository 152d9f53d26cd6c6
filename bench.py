"""End-to-end corpus decode benchmark: framework (TPU) vs C reference (CPU).

Prints ONE JSON line:
  {"metric": "corpus_decode_Msamples_per_s", "value": N,
   "unit": "Msamples/s", "vs_baseline": N/<C reference single-core>}

The headline is the device-resident decode when the TPU relay link ran at
decoder speed; when every device round was link-bound (bulk bandwidth under
HEALTHY_MBPS — the artifact says so via headline_path/link_MBps), the host
full-decode path carries the headline and the device numbers are reported
alongside. Self-budgeted (LIBACM_TPU_BENCH_BUDGET_S, default 2400 s): the
JSON line always appears, whatever the relay weather.

The corpus is synthesized deterministically with the in-repo test encoder
(no game assets) in the classic Fallout speech geometry — level 7 (cols=128),
rows 16, 2048-word blocks at 22050 Hz mono (SURVEY §2.4, §6) — and cached
under /tmp. The baseline is the compiled reference `acmtool -n` (decode,
output discarded — its own benchmark mode, acmtool.c:402) over the same
files; the framework timing covers the same work end to end: file read +
native bitstream scan + device synthesis + PCM fetched back to host.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

# Persistent XLA compile cache: cold remote TPU compiles cost minutes here.
# Repo-local (gitignored) so a /tmp wipe between sessions can't cold-start
# the driver's round-end bench run.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent / ".jax_comp_cache"),
)

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

# Corpus: audio-realistic content mirroring BASELINE.json's configs —
# mostly 22 kHz mono Fallout-style speech (sparse high bands, ~16 kbps:
# the reference's own typical-file anchor is 13 kbps, util.c:161-162)
# plus denser 44.1 kHz stereo Baldur's-Gate-style music — and, per the
# round-1 review, NOT a single compiled geometry: minority shares at
# levels 0/4/10 (distinct buckets → real bucketing/compile/scheduling
# cost in the measured number), a WAVC-wrapped share, and a few
# corrupt/truncated members (error-isolation cost included). Level 7 /
# rows 16 remains the classic 2048-word majority geometry.
N_SPEECH, N_MUSIC = 120, 30
LEVEL, ROWS, NBLOCKS = 7, 16, 300
RATE = 22050
#: (tag, count, level, rows, n_blocks, channels, rate, wavc)
MINORITY = [
    ("lvl4", 15, 4, 40, 1200, 1, 22050, False),
    ("lvl10", 10, 10, 4, 150, 2, 44100, False),
    ("lvl0", 5, 0, 2048, 400, 1, 22050, False),
    ("wavc", 5, 7, 16, 300, 1, 22050, True),
]
N_HOSTILE = 5  # 3 bit-flipped + 2 truncated level-7 members
CORPUS_DIR = pathlib.Path(
    f"/tmp/libacm_tpu_bench_v5_{N_SPEECH}+{N_MUSIC}mix"
)
REF_SRC = pathlib.Path("/root/reference/src")
REF_BIN = pathlib.Path("/tmp/refbuild/src/acmtool")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_corpus() -> list[pathlib.Path]:
    from libacm_tpu import testing

    specs = []
    for i in range(N_SPEECH):
        specs.append((f"speech_{i:03d}", LEVEL, ROWS, NBLOCKS, 1, RATE,
                      False, 5, 4.0))
    for i in range(N_MUSIC):
        specs.append((f"music_{i:03d}", LEVEL, ROWS, NBLOCKS, 2, 44100,
                      False, 8, 24.0))
    for tag, cnt, lv, rw, nb, ch, rate, wavc in MINORITY:
        for i in range(cnt):
            specs.append((f"{tag}_{i:03d}", lv, rw, nb, ch, rate, wavc,
                          5, 4.0))
    files = [CORPUS_DIR / f"{name}.acm" for (name, *_) in specs]
    files += [CORPUS_DIR / f"hostile_{i}.acm" for i in range(N_HOSTILE)]
    if all(f.exists() for f in files):
        return files

    log(f"synthesizing corpus into {CORPUS_DIR} (one-time)...")
    CORPUS_DIR.mkdir(parents=True, exist_ok=True)
    for i, (name, lv, rw, nb, ch, rate, wavc, pwr, decay) in enumerate(specs):
        f = CORPUS_DIR / f"{name}.acm"
        if f.exists():
            continue
        rng = np.random.default_rng(2026 + i)  # per-file: resumable gen
        f.write_bytes(
            testing.speech_acm_bytes(
                rng, level=lv, rows=rw, n_blocks=nb, channels=ch, rate=rate,
                base_pwr=pwr, decay_cols=decay, wavc=wavc,
            )
        )
    for i in range(N_HOSTILE):
        f = CORPUS_DIR / f"hostile_{i}.acm"
        if f.exists():
            continue
        rng = np.random.default_rng(5000 + i)
        data = testing.speech_acm_bytes(rng, level=LEVEL, rows=ROWS,
                                        n_blocks=NBLOCKS, channels=1,
                                        rate=RATE)
        if i < 3:
            b = bytearray(data)
            for _ in range(8):
                b[int(rng.integers(14, len(b)))] ^= 1 << int(rng.integers(0, 8))
            data = bytes(b)
        else:
            data = data[: int(len(data) * 0.7)]
        f.write_bytes(data)
    return files


def ensure_reference() -> pathlib.Path | None:
    if REF_BIN.exists():
        return REF_BIN
    if not REF_SRC.exists():
        return None
    REF_BIN.parent.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            ["gcc", "-O2", "-o", str(REF_BIN), "-I", str(REF_SRC),
             str(REF_SRC / "decode.c"), str(REF_SRC / "util.c"),
             str(REF_SRC / "acmtool.c")],
            check=True, capture_output=True,
        )
        return REF_BIN
    except (OSError, subprocess.CalledProcessError):
        return None


def time_reference_once(ref: pathlib.Path, files: list[pathlib.Path]) -> float:
    """One timed `acmtool -d -n -q <files>` run (decode, no output — the
    reference's own benchmark mode). check is off: hostile corpus members
    make the tool print errors, not fail."""
    argv = [str(ref), "-d", "-n", "-q"] + [str(f) for f in files]
    t0 = time.perf_counter()
    subprocess.run(argv, check=False, capture_output=True)
    return time.perf_counter() - t0


#: below this host->device bandwidth the device path is link-bound: the
#: corpus wire is ~28 MiB of near-entropy content, so at < ~60 MB/s the
#: transfer alone exceeds the ~0.65 s needed to beat the C reference by
#: 1.3x — the measurement becomes one of the shared relay, not the decoder.
HEALTHY_MBPS = 60.0


def _deadline(fn, seconds: float, label: str):
    """Run fn() with a hard wall-clock bound.

    A fully STALLED relay makes jax.device_put block indefinitely — no
    exception, no return — which would hang the bench past any budget and
    lose the artifact. The call runs in a daemon thread; on timeout the
    (possibly forever-blocked) thread is abandoned and (None, False) is
    returned. jax dispatch is thread-safe, so later device calls from the
    main flow are unaffected; an eventually-completing zombie op is
    discarded."""
    import threading

    box = [None, None]

    def runner():
        try:
            box[0] = fn()
        except BaseException as exc:  # re-raised in the caller's thread
            box[1] = exc

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        log(f"  {label}: no response in {seconds:.0f} s (stalled link)")
        return None, False
    if box[1] is not None:
        raise box[1]
    return box[0], True


def safe_probe(label: str = "relay probe",
               timeout_s: float = 240.0) -> tuple[float, float]:
    """Deadline-guarded relay_probe that maps stalls AND transport
    exceptions to (inf, 0.0): a probe can only ever degrade the health
    verdict, never crash the artifact. On a fully STALLED relay the probe
    costs its whole timeout — callers must clamp timeout_s to the time
    they can actually afford (a healthy link answers in seconds)."""
    if timeout_s < 5:
        return float("inf"), 0.0
    try:
        res, ok = _deadline(relay_probe, timeout_s, label)
    except Exception as exc:
        log(f"  {label}: failed ({type(exc).__name__})")
        return float("inf"), 0.0
    return res if ok else (float("inf"), 0.0)


def relay_probe() -> tuple[float, float]:
    """(RTT seconds, bulk bandwidth MB/s) for the device link.

    The TPU sits behind a shared remote relay whose throughput swings
    from ~1 GB/s to ~KB/s with congestion. RTT alone is NOT a health
    signal (observed: 0.9 s RTT with 5 MB/s bulk), so health is judged
    on a fresh-content bulk transfer (fresh: the relay dedups repeated
    content). Both numbers land in the JSON artifact so a bad window is
    identifiable from the artifact alone."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    rng = _np.random.default_rng(_np.frombuffer(os.urandom(8), _np.uint64))
    small = rng.integers(0, 255, size=64 << 10, dtype=_np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(small)
    int(jnp.sum(d[:: 4096].astype(jnp.int32)))
    rtt = time.perf_counter() - t0
    if rtt > 5.0:
        return rtt, (64 / 1024) / rtt  # too slow to afford the bulk probe
    big = rng.integers(0, 255, size=8 << 20, dtype=_np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(big)
    int(jnp.sum(d[:: 65536].astype(jnp.int32)))
    bulk = time.perf_counter() - t0
    return rtt, 8.0 / bulk


def wait_for_relay(budget_s: float) -> tuple[float, float]:
    """Probe until the relay's BANDWIDTH looks usable (or budget out).

    Returns the last (rtt, MB/s). Waiting for a usable shared link is
    measurement hygiene, not cherry-picking: both decoders are timed in
    whatever window we do run, interleaved."""
    deadline = time.time() + budget_s
    while True:
        left = deadline - time.time()
        rtt, mbps = safe_probe(timeout_s=min(240.0, max(30.0, left)))
        log(f"relay probe: rtt={rtt:.2f} s, bulk={mbps:.1f} MB/s")
        # the next probe's timeout is itself clamped to what's left, and
        # a HEALTHY link answers in seconds — so another round is useful
        # as long as the 45 s sleep plus a minimal 30 s probe still fits
        if mbps >= HEALTHY_MBPS or time.time() + 80 > deadline:
            return rtt, mbps
        log("  degraded relay; waiting 45 s...")
        time.sleep(45)


def time_all(
    ref: pathlib.Path | None, files: list[pathlib.Path], total_samples: int,
    healthy: bool, deadline: float, link_mbps: float = float("inf"),
) -> tuple[float | None, float, float | None, dict, bool]:
    """(device s, host s, reference s | None, backend shootout, healthy).

    Device-resident is the headline: the corpus-decode use case is dataset
    ingest for TPU jobs, where PCM is consumed on device (and the
    reference's own benchmark mode, `acmtool -n`, likewise discards its
    output). The checksum is a device reduction that forces every PCM
    sample to materialize; only scalars cross the wire.

    Reference and framework runs are INTERLEAVED round-robin: this host's
    CPU throughput drifts ±30% between "idle" windows, so sequential
    phases would measure the weather, not the decoders; min-of-N over
    interleaved rounds makes the ratio meaningful (and short cooldowns
    let the TPU relay queue drain between device runs). The shootout
    times the XLA pass chain vs the fused Pallas kernel on the same
    corpus so the `auto` backend selection is grounded in a hardware
    measurement.
    """
    from libacm_tpu.parallel import decode_corpus, decode_corpus_device

    paths = [str(f) for f in files]
    want_sum = None

    def run_device(backend: str = "auto", timeout_s: float = 420.0) -> float:
        """One timed device-resident decode; retries once after a pause on
        relay transport errors (the remote compile/execute service drops
        connections under load — a transient, not a result). Deadline-
        guarded: a stalled link raises TimeoutError instead of hanging."""
        nonlocal want_sum

        def attempt_once():
            corpus = decode_corpus_device(paths, backend=backend)
            return corpus.checksum()

        for attempt in (0, 1):
            # never let one attempt (or its retry pause) run the bench
            # past its self-budget: clamp to the time actually left
            eff = min(timeout_s, max(60.0, deadline - time.time() - 30))
            t0 = time.perf_counter()
            try:
                cs, ok = _deadline(attempt_once, eff,
                                   f"device run ({backend})")
                if not ok:
                    raise TimeoutError("device run stalled")
            except ValueError:
                raise  # semantic (unsupported backend), not transport
            except Exception as exc:
                if attempt or time.time() + 150 > deadline:
                    raise
                log(f"  device run failed ({type(exc).__name__}); "
                    "retrying in 60 s...")
                time.sleep(60)
                continue
            dt = time.perf_counter() - t0
            if want_sum is None:
                want_sum = cs
            assert cs == want_sum, f"checksum mismatch (backend={backend})"
            return dt

    def run_host() -> float:
        t0 = time.perf_counter()
        res = decode_corpus(paths)
        got = sum(len(r.pcm) for r in res if r.pcm is not None)
        dt = time.perf_counter() - t0
        # hostile members decode partially by design; the decoded total
        # is pinned by the warmup (self-consistency, not completeness)
        assert got == total_samples, (got, total_samples)
        return dt

    # In a degraded window each device round costs wire/link-bandwidth
    # (~20 s at 1.4 MB/s): run only 2 such rounds so the artifact still
    # carries device numbers without blowing the budget — and none at all
    # below 1 MB/s, where a single ~28 MiB wire transfer runs to minutes.
    n_dev = 7 if healthy else (2 if link_mbps >= 1.0 else 0)
    log("framework: warmup (compile)...")
    device_ok = n_dev > 0
    if device_ok:
        try:
            run_device(timeout_s=900.0)  # first run may compile cold
        except Exception as exc:
            # never lose the whole artifact to a dead link: fall back to
            # host-only measurement, device fields null
            log(f"device path unavailable ({type(exc).__name__}: {exc}); "
                "continuing host-only")
            device_ok = False
    run_host()
    if ref is not None:
        time_reference_once(ref, files)  # warm page cache
    dev_t, host_t, ref_t = [], [], []
    for i in range(7):
        if ref is not None:
            ref_t.append(time_reference_once(ref, files))
        if device_ok and i < n_dev and time.time() < deadline - 60:
            try:
                dev_t.append(run_device())
            except Exception as exc:
                # a mid-rounds transport failure must not discard the
                # ref/host timings already collected (main()'s crash
                # fallback would re-time host-only and drop all device
                # and link telemetry) — keep what we have, stop trying
                log(f"  device round failed ({type(exc).__name__}); "
                    "continuing without further device rounds")
                device_ok = False
        host_t.append(run_host())
        log(f"  round {i}: ref={ref_t[-1] if ref_t else float('nan'):.3f} "
            f"device={dev_t[-1] if dev_t else float('nan'):.3f} "
            f"host={host_t[-1]:.3f} s")
        time.sleep(1.5)  # let the relay queue drain between rounds

    # A degraded relay window floors the device path at link speed (the
    # wire is ~28 MiB; at the measured worst ~1.4 MB/s that alone is ~20 s
    # against a ~0.8 s reference decode). If the device lost AND the link
    # is degraded, give it one bounded second chance and fold extra device
    # rounds into the same min-of-N — the reference rounds above are
    # unaffected and the protocol stays interleaved-fair.
    budget = deadline - time.time()
    dev_lost = not dev_t or (ref_t and min(dev_t) > min(ref_t))
    if dev_lost and budget > 300:
        # Device lost (or never ran): re-probe the link NOW — the pre-round
        # probe may have read healthy and the link collapsed mid-run, or
        # vice versa. `healthy` must describe the window min(dev_t) came
        # from, so from here it is earned only by a completed retry round
        # (or by a genuinely healthy link with the existing rounds).
        _, mbps = safe_probe(timeout_s=min(240.0, budget - 120))
        if mbps < HEALTHY_MBPS:
            healthy = False
            log("device path ran link-bound; waiting for one healthy window...")
            _, mbps = wait_for_relay(
                min(600.0, deadline - time.time() - 180))
        if mbps >= HEALTHY_MBPS:
            retried = 0
            try:
                for i in range(3):
                    left = deadline - time.time()
                    if left < 90:
                        break
                    if ref is not None:
                        ref_t.append(time_reference_once(ref, files))
                    dev_t.append(run_device(timeout_s=min(420.0, left - 30)))
                    retried += 1
                    log(f"  retry round {i}: "
                        f"ref={ref_t[-1] if ref_t else float('nan'):.3f} "
                        f"device={dev_t[-1]:.3f} s")
                    time.sleep(1.5)
            except Exception as exc:
                log(f"  retry rounds abandoned ({type(exc).__name__})")
            # a completed retry round is the only proof this window ran at
            # decoder speed; transport failures leave it unproven
            healthy = retried > 0
        device_ok = device_ok or bool(dev_t)

    # The backend shootout is diagnostic stderr + two JSON fields; in a
    # link-bound window it would measure the relay 8 more times for
    # nothing — skip it (fields go null) unless the link is usable.
    shoot = {}
    run_shootout = device_ok and (healthy or not dev_t)
    for backend in ("jax", "pallas") if run_shootout else ():
        try:
            times = []
            for i in range(4):  # warmup/compile + 3 timed
                left = deadline - time.time()
                if left < 90:
                    raise TimeoutError("budget")
                t = run_device(backend, timeout_s=min(420.0, left - 30))
                if i:
                    times.append(t)
            bt = min(times)
            shoot[backend] = round(total_samples / bt / 1e6, 1)
            log(f"  backend {backend}: {bt:.3f} s = {shoot[backend]} Msamples/s")
        except Exception as e:  # pallas may be unsupported on this backend
            log(f"  backend {backend}: failed ({type(e).__name__}: {e})")
            shoot[backend] = None
    return (min(dev_t) if dev_t else None, min(host_t),
            min(ref_t) if ref_t else None, shoot, healthy)


def time_native_scan(files: list[pathlib.Path], total: int) -> float | None:
    """Min-of-3 native packed scan of the whole corpus (pure host work)."""
    from libacm_tpu.scan import native

    if not native.available():
        return None
    datas = [f.read_bytes() for f in files]
    best = min(_scan_once(native, datas) for _ in range(3))
    return total / best / 1e6


def _scan_once(native, datas) -> float:
    t0 = time.perf_counter()
    for d in datas:
        try:
            native.scan_bytes_packed(d)
        except ValueError:
            pass  # hostile member with a broken header
    return time.perf_counter() - t0


def pallas_parity_sweep(timeout_s: float = 900.0) -> str:
    """On-HW pallas-vs-XLA sweep in a subprocess (timeout-bounded)."""
    sweep = pathlib.Path(__file__).parent / "tools" / "pallas_parity_sweep.py"
    try:
        r = subprocess.run([sys.executable, str(sweep)], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return "sweep timed out (remote compile service)"
    for line in r.stdout.splitlines():
        log("  " + line)
    return "PASS" if r.returncode == 0 else "FAIL"


def main() -> int:
    # Hard self-budget: the artifact (one JSON line) must ALWAYS appear,
    # even if the relay is dead all window — an external timeout killing
    # this process loses the whole round's number.
    t_start = time.time()
    budget_s = float(os.environ.get("LIBACM_TPU_BENCH_BUDGET_S", "2400"))
    deadline = t_start + budget_s
    files = ensure_corpus()
    n_files = len(files)
    # the decoded-sample total comes from an actual host decode (hostile
    # members decode partially; both tools decode the same words)
    from libacm_tpu.parallel import decode_corpus

    res = decode_corpus([str(f) for f in files])
    total_samples = sum(len(r.pcm) for r in res if r.pcm is not None)
    n_buckets = len({(r.info.acm_level, r.info.acm_rows) for r in res
                     if r.info is not None})
    wire = sum(f.stat().st_size for f in files)
    log(f"corpus: {n_files} files, {n_buckets} (level,rows) buckets "
        f"(majority level {LEVEL}/rows {ROWS}; minority levels 0/4/10, "
        f"WAVC, {N_HOSTILE} hostile) = {total_samples/1e6:.1f} Msamples "
        f"decoded, {wire*8/total_samples:.2f} bits/sample on disk")

    ref = ensure_reference()
    if ref is None:
        log("reference binary unavailable; vs_baseline=null")

    try:
        return _measure_and_report(files, n_files, ref, total_samples,
                                   budget_s, deadline, t_start)
    except Exception as exc:
        # LAST-RESORT artifact: whatever blew up (an unforeseen device/
        # transport error escaping the guards), the one-JSON-line contract
        # holds — re-time the host path (pure host work, no device) and
        # report it as the headline, flagged.
        log(f"measurement crashed ({type(exc).__name__}: {exc}); "
            "emitting host-only artifact")
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            decode_corpus([str(f) for f in files])
            best = min(best, time.perf_counter() - t0)
        host_msps = total_samples / best / 1e6
        ref_msps = None
        if ref is not None:
            rbest = min(time_reference_once(ref, files) for _ in range(3))
            ref_msps = total_samples / rbest / 1e6
        print(json.dumps({
            "metric": "corpus_decode_Msamples_per_s",
            "value": round(host_msps, 2),
            "unit": "Msamples/s",
            "vs_baseline": (round(host_msps / ref_msps, 3)
                            if ref_msps else None),
            "headline_path": "host-crashfallback",
            "host_path_Msamples_per_s": round(host_msps, 2),
            "bench_wall_s": round(time.time() - t_start, 1),
        }, allow_nan=False), flush=True)
        return 0


def _measure_and_report(files, n_files, ref, total_samples, budget_s,
                        deadline, t_start) -> int:
    def backend_name():
        import jax

        return jax.default_backend()

    # even backend enumeration can stall on a dead tunnel — guarded, and a
    # stall is treated as a remote backend with a dead link
    bk, ok = _deadline(backend_name, 300.0, "backend detection")
    remote = bk not in ("cpu", "gpu") if ok else True
    if remote and ok:
        # leave >= ~900 s of budget for the timed rounds themselves
        probe_s, link_mbps = wait_for_relay(
            max(0.0, min(budget_s - 900, deadline - time.time() - 900)))
    elif remote:
        probe_s, link_mbps = float("inf"), 0.0
    else:
        probe_s, link_mbps = 0.0, float("inf")
    healthy = link_mbps >= HEALTHY_MBPS

    # standalone bitstream-scan throughput (host CPU, no device): the
    # serial VLC front-end is the Amdahl term under every number
    scan_msps = time_native_scan(files, total_samples)
    if scan_msps:
        log(f"native packed scan alone: {scan_msps:.1f} Msamples/s "
            f"({total_samples / scan_msps / 1e6:.3f} s host CPU)")

    fw_s, host_s, ref_s, shoot, healthy = time_all(
        ref, files, total_samples, healthy, deadline, link_mbps)
    if ref_s is not None:
        ref_msps = total_samples / ref_s / 1e6
        log(f"reference acmtool -n: {ref_s:.3f} s = {ref_msps:.1f} Msamples/s")
    else:
        ref_msps = None
    host_msps = total_samples / host_s / 1e6
    dev_msps = total_samples / fw_s / 1e6 if fw_s is not None else None
    # Headline selection: the device-resident decode is the headline
    # whenever the link let it run at decoder speed. When every device
    # round was link-bound (bulk bandwidth below the corpus's ~28 MiB of
    # near-entropy wire / the reference's ~0.8 s decode), the number
    # measures the shared relay, not this framework — the host path is
    # the same complete corpus decode (what `acmtool -n` itself times),
    # so it carries the headline and the device numbers + link telemetry
    # are reported alongside, flagged via headline_path.
    if dev_msps is not None:
        realtime = dev_msps * 1e6 / RATE
        log(f"framework (device-resident): {fw_s:.3f} s = {dev_msps:.1f} "
            f"Msamples/s ({realtime:.0f}x realtime @ {RATE} Hz mono)")
    else:
        log("framework (device-resident): UNAVAILABLE this window")
    log(f"framework (PCM fetched to host): {host_s:.3f} s = "
        f"{host_msps:.1f} Msamples/s")
    dev_won = (dev_msps is not None and ref_msps is not None
               and dev_msps >= ref_msps)
    if dev_msps is not None and (healthy or dev_won):
        # dev_won in a degraded window undersells the device (it beat the
        # reference through a throttled link) — still the honest headline
        fw_msps, headline = dev_msps, "device"
    else:
        fw_msps, headline = host_msps, ("host-linkbound" if dev_msps is not None
                                        else "host")
        log(f"headline falls back to the host path ({headline}): "
            f"link bulk bandwidth {link_mbps:.1f} MB/s this window")

    print(json.dumps({
        "metric": "corpus_decode_Msamples_per_s",
        "value": round(fw_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(fw_msps / ref_msps, 3) if ref_msps else None,
        "headline_path": headline,
        "device_Msamples_per_s": (round(dev_msps, 2)
                                  if dev_msps is not None else None),
        "device_vs_baseline": (round(dev_msps / ref_msps, 3)
                               if dev_msps and ref_msps else None),
        "host_path_Msamples_per_s": round(host_msps, 2),
        "host_vs_baseline": (round(host_msps / ref_msps, 3)
                             if ref_msps else None),
        "scan_Msamples_per_s": round(scan_msps, 1) if scan_msps else None,
        "backend_jax_Msamples_per_s": shoot.get("jax"),
        "backend_pallas_Msamples_per_s": shoot.get("pallas"),
        # math.isfinite: json.dumps would emit bare `Infinity` (invalid
        # JSON) for a stalled probe, poisoning the whole artifact
        "relay_probe_s": (round(probe_s, 3)
                          if probe_s == probe_s and probe_s != float("inf")
                          else None),
        "link_MBps": (round(link_mbps, 1)
                      if link_mbps != float("inf") else None),
        "bench_wall_s": round(time.time() - t_start, 1),
    }, allow_nan=False), flush=True)

    # Diagnostics AFTER the artifact is out (stderr only): a watchdog kill
    # from here on cannot lose the round's number.
    sweep_budget = deadline - time.time() - 30
    try:
        if remote and healthy and sweep_budget > 120:
            log("pallas parity sweep (levels 1-14, on hardware):")
            log(f"  sweep: {pallas_parity_sweep(min(900.0, sweep_budget))}")
        elif remote:
            log("pallas parity sweep: skipped (degraded link or budget)")
    except Exception as exc:
        # the artifact is already out — a diagnostics failure must not
        # reach main()'s crash handler, which would print a SECOND JSON
        # line (the one-line stdout contract is the driver interface)
        try:
            log(f"post-artifact diagnostics failed ({type(exc).__name__})")
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
