"""End-to-end corpus decode benchmark: framework (TPU) vs C reference (CPU).

Prints ONE JSON line:
  {"metric": "corpus_decode_Msamples_per_s", "value": N,
   "unit": "Msamples/s", "vs_baseline": N/<C reference single-core>}

Artifact-first structure (round 3 was killed by an EXTERNAL timeout after
burning its window waiting on a degraded relay — rc=124, no number):

  Phase 1 (no relay dependency, ~1 min): interleaved reference/host-path
  rounds secure a complete host-headline artifact. From that point the
  JSON line is guaranteed: SIGTERM/SIGINT and atexit flush it, so even a
  driver-side kill cannot lose the round's number.

  Phase 2 (device upgrade, every step deadline-guarded): relay wait capped
  at a small fraction of the budget, device-resident rounds (checksum-only
  sync — the ingest regime where PCM is consumed on device), the
  per-geometry pallas-vs-XLA shootout, and the on-HW parity sweep. If the
  device beat the reference (or the window was healthy), the headline is
  upgraded to the device-resident number; otherwise headline_path says
  why and the device numbers + link telemetry ride alongside.

Self-budgeted (LIBACM_TPU_BENCH_BUDGET_S, default 1200 s — round 3 proved
2400 s outlives the driver's window).

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


_ARTIFACT: dict | None = None
_EMITTED = False


def set_artifact(d: dict) -> None:
    global _ARTIFACT
    _ARTIFACT = d


def emit_artifact() -> None:
    """Print the one-JSON-line artifact exactly once (idempotent): the
    normal end of main, the atexit hook, and the signal guard all call
    this, and whichever fires first wins. Guard signals are blocked
    before the write so an external killer cannot land mid-print and
    leave a truncated line (the handler would see _EMITTED and no-op)."""
    global _EMITTED
    if _EMITTED or _ARTIFACT is None:
        return
    guard = {0}
    try:
        import signal

        guard = {signal.SIGTERM, signal.SIGINT, signal.SIGHUP}
        signal.pthread_sigmask(signal.SIG_BLOCK, guard)
    except (OSError, ValueError, AttributeError):
        guard = None  # non-main thread / no sigmask: best effort
    _EMITTED = True
    print(json.dumps(_ARTIFACT, allow_nan=False), flush=True)
    if guard is not None:
        try:
            import signal

            # UNBLOCK after the line is out: a blocked mask is inherited
            # by child processes, and a pending guard signal should now
            # fire (the handler sees _EMITTED and just exits)
            signal.pthread_sigmask(signal.SIG_UNBLOCK, guard)
        except (OSError, ValueError):
            pass


def _install_artifact_guard() -> None:
    """The artifact must survive an EXTERNAL killer: round 3 died at
    rc=124 (driver timeout SIGTERM) with no number after burning its
    window on a degraded relay. SIGTERM/SIGINT/SIGHUP now flush the best
    artifact secured so far and exit 0; atexit covers unforeseen clean
    exits (only SIGKILL remains unguardable, and the phase structure
    makes the window for that ~1 minute of pure host work)."""
    import atexit
    import signal

    def _flush(signum, frame):
        # Async-signal context: bypass buffered stdio entirely (a print
        # here could re-enter a buffered write and raise; os.write is a
        # direct syscall). The normal emit path blocks these signals
        # around its own print, so _EMITTED is a reliable gate.
        global _EMITTED
        try:
            if not _EMITTED and _ARTIFACT is not None:
                _EMITTED = True
                os.write(1, (json.dumps(_ARTIFACT, allow_nan=False)
                             + "\n").encode())
            os.write(2, f"signal {signum}: artifact guard exit\n".encode())
        except Exception:
            pass
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        try:
            signal.signal(sig, _flush)
        except (OSError, ValueError, AttributeError):
            pass
    atexit.register(emit_artifact)


def _ratio(num: float | None, den: float | None) -> float | None:
    return round(num / den, 3) if num and den else None


def _device_phase(
    artifact: dict, ref: pathlib.Path | None, files: list[pathlib.Path],
    total_samples: int, geoms: "dict[tuple[int, int], int]",
    ref_t: list[float],
    deadline: float,
) -> None:
    """Upgrade the secured host artifact with device-resident numbers,
    the per-geometry pallas/XLA shootout, and the on-HW parity sweep.
    Mutates `artifact` in place; every step is deadline-guarded so a
    stalled relay degrades fields to null instead of losing the line.

    The device-resident round is the ingest regime (BASELINE configs
    4/5): PCM is produced and CONSUMED on device; the checksum is a
    device reduction over every sample and only scalars cross the wire.
    Reference and device runs stay INTERLEAVED (one ref round per device
    round, folded into the same min-of-N as phase 1) because this host's
    CPU drifts ±30% between windows.
    """
    from libacm_tpu.parallel import decode_corpus_device

    paths = [str(f) for f in files]

    def backend_name():
        import jax

        return jax.default_backend()

    bk, ok = _deadline(backend_name, 240.0, "backend detection")
    if not ok:
        log("backend detection stalled; device fields stay null")
        return
    if bk in ("cpu", "gpu"):
        log(f"{bk} backend: no TPU, device phase skipped")
        return
    # Relay wait capped at min(300 s, 25% of remaining budget): waiting
    # for a usable shared link is measurement hygiene, but round 3 proved
    # an uncapped wait loses the race against the external killer.
    left = deadline - time.time()
    probe_s, link_mbps = wait_for_relay(max(0.0, min(300.0, 0.25 * left)))
    if probe_s == probe_s and probe_s != float("inf"):
        artifact["relay_probe_s"] = round(probe_s, 3)
    artifact["link_MBps"] = (round(link_mbps, 1)
                             if link_mbps != float("inf") else None)
    healthy = link_mbps >= HEALTHY_MBPS

    want_sum = None

    def run_device(backend: str = "auto", timeout_s: float = 420.0) -> float:
        """One timed device-resident decode (checksum-only sync).
        Deadline-guarded: a stalled link raises TimeoutError instead of
        hanging jax.device_put forever."""
        nonlocal want_sum

        def attempt_once():
            corpus = decode_corpus_device(paths, backend=backend)
            return corpus.checksum()

        eff = min(timeout_s, max(60.0, deadline - time.time() - 30))
        t0 = time.perf_counter()
        cs, ok = _deadline(attempt_once, eff, f"device run ({backend})")
        if not ok:
            raise TimeoutError("device run stalled")
        dt = time.perf_counter() - t0
        if want_sum is None:
            want_sum = cs
        assert cs == want_sum, f"checksum mismatch (backend={backend})"
        return dt

    # In a degraded window each device round costs wire/link-bandwidth
    # (~20 s at 1.4 MB/s): run only 2 such rounds so the artifact still
    # carries device numbers without blowing the budget — and none at all
    # below 1 MB/s, where a single ~28 MiB wire transfer runs to minutes.
    n_dev = 5 if healthy else (2 if link_mbps >= 1.0 else 0)
    if n_dev == 0:
        log(f"link at {link_mbps:.1f} MB/s: device rounds skipped")
        # the pure-compute evidence (shootout + parity sweep) is nearly
        # link-independent — put it on the record even in this window
        _compute_phase(artifact, geoms, deadline, probe_s)
        return
    log("framework: device warmup (compile)...")
    # in a degraded window, cap the warmup tighter: a stalled transfer
    # consuming the whole remaining budget (observed: probe read 36 MB/s,
    # the very next device_put hung 700+ s) leaves nothing for the
    # healthy-window retry path
    warm_cap = 720.0 if healthy else 300.0
    warmed = True
    try:
        run_device(timeout_s=min(warm_cap, max(120.0,
                                               deadline - time.time() - 240)))
    except Exception as exc:
        # don't give up yet: the healthy-window retry below may still get
        # device rounds if the relay recovers within the budget
        log(f"device warmup failed ({type(exc).__name__}: {exc})")
        warmed = False
    dev_t: list[float] = []
    for i in range(n_dev if warmed else 0):
        if time.time() > deadline - 90:
            break
        if ref is not None:
            ref_t.append(time_reference_once(ref, files))
        try:
            dev_t.append(run_device())
        except Exception as exc:
            log(f"  device round failed ({type(exc).__name__}); "
                "stopping device rounds")
            break
        log(f"  device round {i}: ref={ref_t[-1] if ref_t else float('nan'):.3f} "
            f"device={dev_t[-1]:.3f} s")
        time.sleep(1.5)  # let the relay queue drain between rounds

    # The headline decision needs a verdict about the window the kept
    # rounds actually ran in — the PRE-round probe is stale in either
    # direction (observed: probe healthy, the very next device_put hung
    # 700+ s; and probes degraded while later rounds ran clean). A
    # device that BEAT the reference is honest whatever the link; a
    # device that lost (or never ran) earns a headline only through a
    # fresh post-round probe + completed retry rounds in that window.
    ref_min = min(ref_t) if ref_t else None
    dev_lost = not dev_t or (ref_min is not None
                             and min(dev_t) > ref_min)
    window_ok = bool(dev_t) and not dev_lost
    if dev_lost and deadline - time.time() > 420:
        _, mbps = safe_probe(
            timeout_s=min(240.0, deadline - time.time() - 180))
        if mbps < HEALTHY_MBPS:
            log("device lost/absent on a degraded link; waiting for one "
                "healthy window...")
            _, mbps = wait_for_relay(
                min(240.0, deadline - time.time() - 300))
        if mbps >= HEALTHY_MBPS:
            retried = 0
            try:
                for i in range(3):
                    if deadline - time.time() < 120:
                        break
                    if ref is not None:
                        ref_t.append(time_reference_once(ref, files))
                    dev_t.append(run_device(
                        timeout_s=min(300.0, deadline - time.time() - 60)))
                    retried += 1
                    log(f"  retry round {i}: device={dev_t[-1]:.3f} s")
                    time.sleep(1.5)
            except Exception as exc:
                log(f"  retry rounds abandoned ({type(exc).__name__})")
            # a completed retry round is the only proof this window ran
            # at decoder speed
            window_ok = retried > 0
        artifact["link_MBps"] = (round(mbps, 1)
                                 if mbps != float("inf") else None)
        link_mbps = mbps

    if not dev_t:
        _compute_phase(artifact, geoms, deadline, probe_s)
        return
    healthy = window_ok
    ref_min = min(ref_t) if ref_t else None
    ref_msps = total_samples / ref_min / 1e6 if ref_min else None
    dev_msps = total_samples / min(dev_t) / 1e6
    artifact["device_resident_Msamples_per_s"] = round(dev_msps, 2)
    artifact["device_vs_baseline"] = _ratio(dev_msps, ref_msps)
    log(f"framework (device-resident): {min(dev_t):.3f} s = "
        f"{dev_msps:.1f} Msamples/s")

    # Headline: the FASTER of the two end-to-end product paths carries
    # it (both always ride in the artifact). The device number is
    # eligible when it beat the reference (honest whatever the link) or
    # its window is VERIFIED healthy; it wins the headline only if it
    # also beat the host path — reporting the slower of two honest
    # decoders as "the" number would understate the framework.
    host_msps = artifact["host_path_Msamples_per_s"]
    artifact["host_vs_baseline"] = _ratio(host_msps, ref_msps)
    dev_won = ref_msps and dev_msps >= ref_msps
    if (window_ok or dev_won) and (not host_msps or dev_msps >= host_msps):
        artifact["value"] = round(dev_msps, 2)
        artifact["headline_path"] = "device"
        artifact["vs_baseline"] = _ratio(dev_msps, ref_msps)
    elif window_ok or dev_won:
        # device rounds are honest but the relay link taxes every ~28 MiB
        # wire round: the host path stays the headline, device alongside
        artifact["headline_path"] = "host"
        artifact["vs_baseline"] = _ratio(host_msps, ref_msps)
        log(f"host path keeps the headline ({host_msps:.1f} vs device "
            f"{dev_msps:.1f} Msamples/s this window)")
    else:
        artifact["headline_path"] = "host-linkbound"
        artifact["vs_baseline"] = _ratio(host_msps, ref_msps)
        log(f"headline stays on the host path: link "
            f"{link_mbps:.1f} MB/s this window")

    # Corpus-level backend shootout (full pipeline, each backend forced);
    # link-bound windows would measure the relay 8 more times — skip.
    if healthy:
        for backend in ("jax", "pallas"):
            try:
                times = []
                for i in range(3):  # warmup + 2 timed
                    if deadline - time.time() < 120:
                        raise TimeoutError("budget")
                    t = run_device(backend, timeout_s=min(
                        300.0, deadline - time.time() - 60))
                    if i:
                        times.append(t)
                msps = round(total_samples / min(times) / 1e6, 1)
                artifact[f"backend_{backend}_Msamples_per_s"] = msps
                log(f"  corpus backend {backend}: {msps} Msamples/s")
            except Exception as e:
                log(f"  corpus backend {backend}: failed "
                    f"({type(e).__name__}: {e})")

    # Pure-compute evidence (per-geometry shootout, device_compute
    # summary, on-HW parity sweep). rtt 0.0: this window just ran full
    # device rounds, so the link is known responsive.
    _compute_phase(artifact, geoms, deadline, 0.0)


def _compute_phase(artifact: dict, geoms: "dict[tuple[int, int], int]",
                   deadline: float, rtt_s: float) -> None:
    """Pure on-chip evidence, nearly link-INDEPENDENT — runs even in
    bulk-degraded windows that skip the ~28 MiB corpus wire rounds:

    - Per-geometry pallas-vs-XLA shootout: `measure_backend` generates
      its inputs ON DEVICE (jax.random) and syncs scalar checksums, so
      only the program + a few KB cross the wire. Its winners yield
      `device_compute_Msamples_per_s` — the pure on-chip synthesis rate
      (what end-to-end would approach if host scan and link were free).
    - On-HW parity sweep: bit-equality pallas vs XLA at every supported
      level (~1-2 MB of test vectors per level, subprocess + timeout).

    Gate on the RTT, not bulk bandwidth: a STALLED relay (rtt inf) would
    burn the _deadline timeouts for nothing, but a merely slow one can
    still produce this evidence. Mutates `artifact` in place.

    RESUMABLE: geometries already in the artifact's shootout table are
    skipped and a PASS/FAIL sweep verdict is kept, so the recovery loop
    can re-enter this phase after a mid-window stall and only the missing
    evidence re-runs."""
    if rtt_s != rtt_s or rtt_s == float("inf") or rtt_s > 5.0:
        log("relay unresponsive (rtt gate): compute phase skipped")
        if artifact.get("pallas_parity_sweep") is None:
            artifact["pallas_parity_sweep"] = "skipped (relay unresponsive)"
        return
    if deadline - time.time() > 180:
        from libacm_tpu.ops.synth_pallas import pallas_supported
        from libacm_tpu.parallel.corpus import measure_backend

        table: dict[str, dict] = dict(artifact.get("pallas_shootout") or {})
        best: dict[tuple[int, int], float] = {}
        for key, row in table.items():  # resume: keep prior measurements
            lv, rw = map(int, key.split("/"))
            if row.get(row.get("winner")):
                best[(lv, rw)] = row[row["winner"]]
        for level, rows in geoms:
            if deadline - time.time() < 150:
                break
            if not pallas_supported(level, rows) or f"{level}/{rows}" in table:
                continue
            try:
                res, ok = _deadline(
                    lambda: measure_backend(level, rows),
                    min(300.0, deadline - time.time() - 90),
                    f"shootout {level}/{rows}")
                if not ok:
                    break
                winner, speeds = res
                table[f"{level}/{rows}"] = {
                    "winner": winner,
                    **{k: round(v, 1) for k, v in speeds.items()},
                }
                if speeds.get(winner):
                    best[(level, rows)] = speeds[winner]
                log(f"  geometry {level}/{rows}: {table[f'{level}/{rows}']}")
            except Exception as exc:
                log(f"  geometry {level}/{rows} shootout failed "
                    f"({type(exc).__name__})")
        if table:
            artifact["pallas_shootout"] = table
        if best:
            # harmonic (time-weighted) mean over the measured geometries,
            # weighted by the corpus's sample share per geometry
            shares = {g: float(geoms.get(g, 1)) for g in best}
            tsec = sum(shares[g] / best[g] for g in best)
            artifact["device_compute_Msamples_per_s"] = round(
                sum(shares.values()) / tsec, 1)
            log(f"  device compute (winners, corpus geometries): "
                f"{artifact['device_compute_Msamples_per_s']} Msamples/s")

    # On-HW parity sweep (subprocess, bounded): bit-equality pallas vs
    # XLA at every supported level, recorded in the artifact.
    if artifact.get("pallas_parity_sweep") in ("PASS", "FAIL"):
        return  # resume: a real verdict is never re-earned or downgraded
    sweep_left = deadline - time.time() - 30
    if sweep_left > 120:
        log("pallas parity sweep (levels 1-14, on hardware):")
        new = pallas_parity_sweep(min(900.0, sweep_left))
        # upgrade-only: a re-entered phase keeps the PARTIAL verdict
        # with more OK levels rather than letting a worse retry clobber it
        old = artifact.get("pallas_parity_sweep")
        artifact["pallas_parity_sweep"] = max(
            (v for v in (old, new) if v), key=_sweep_rank, default=new)
        log(f"  sweep: {artifact['pallas_parity_sweep']} (this run: {new})")
    elif artifact.get("pallas_parity_sweep") is None:
        artifact["pallas_parity_sweep"] = "skipped (budget exhausted)"


def _sweep_rank(verdict: str) -> tuple[int, int]:
    """Order parity-sweep verdicts by evidence value: FAIL and PASS are
    terminal (a FAIL must never be papered over), PARTIALs rank by how
    many levels they proved, skip/timeout strings rank lowest."""
    if verdict in ("PASS", "FAIL"):
        return (2, 0)
    if verdict.startswith("PARTIAL"):
        levels = verdict.split("levels", 1)[-1].split("OK")[0]
        return (1, len([v for v in levels.split(",") if v.strip()]))
    return (0, 0)


def _missing_device_evidence(artifact: dict) -> list[str]:
    """Which device-evidence fields the artifact still lacks."""
    missing = []
    if artifact.get("pallas_shootout") is None:
        missing.append("shootout")
    if artifact.get("device_compute_Msamples_per_s") is None:
        missing.append("compute")
    if artifact.get("pallas_parity_sweep") not in ("PASS", "FAIL"):
        missing.append("parity")
    if artifact.get("device_resident_Msamples_per_s") is None:
        missing.append("device-resident")
    return missing


def _recovery_device_rounds(artifact: dict, ref, files, total_samples: int,
                            ref_t: list[float], deadline: float,
                            link_mbps: float) -> None:
    """Late device-resident rounds after the relay recovered mid-budget.

    Mirrors _device_phase's round + headline semantics: warmup, then
    reference-interleaved timed rounds (2 in a degraded window, 5 in a
    healthy one), checksum self-consistency, and the
    faster-of-two-honest-paths headline rule. Upgrade-only: a stalled
    round abandons quietly and the artifact keeps its prior fields."""
    from libacm_tpu.parallel import decode_corpus_device

    paths = [str(f) for f in files]
    healthy = link_mbps >= HEALTHY_MBPS
    dev_t: list[float] = []
    want = None
    n = 5 if healthy else 2
    for i in range(n + 1):  # round 0 is the compile/warmup round
        if deadline - time.time() < 150:
            break
        if i and ref is not None:
            ref_t.append(time_reference_once(ref, files))
        t0 = time.perf_counter()
        cs, ok = _deadline(
            lambda: decode_corpus_device(paths).checksum(),
            min(420.0, deadline - time.time() - 60),
            "recovery device round")
        if not ok:
            log("  recovery device round stalled; backing off")
            return
        dt = time.perf_counter() - t0
        if want is None:
            want = cs
        assert cs == want, "checksum drift across recovery rounds"
        if i:
            dev_t.append(dt)
            log(f"  recovery device round {i}: {dt:.3f} s")
        time.sleep(1.5)
    if not dev_t:
        return
    ref_min = min(ref_t) if ref_t else None
    ref_msps = total_samples / ref_min / 1e6 if ref_min else None
    dev_msps = total_samples / min(dev_t) / 1e6
    artifact["device_resident_Msamples_per_s"] = round(dev_msps, 2)
    artifact["device_vs_baseline"] = _ratio(dev_msps, ref_msps)
    log(f"framework (device-resident, recovered window): {min(dev_t):.3f} s "
        f"= {dev_msps:.1f} Msamples/s")
    host_msps = artifact.get("host_path_Msamples_per_s")
    artifact["host_vs_baseline"] = _ratio(host_msps, ref_msps)
    dev_won = bool(ref_msps) and dev_msps >= ref_msps
    if (healthy or dev_won) and (not host_msps or dev_msps >= host_msps):
        artifact["value"] = round(dev_msps, 2)
        artifact["headline_path"] = "device"
        artifact["vs_baseline"] = _ratio(dev_msps, ref_msps)
    elif healthy or dev_won:
        artifact["headline_path"] = "host"
        artifact["vs_baseline"] = _ratio(host_msps, ref_msps)
    else:
        artifact["headline_path"] = "host-linkbound"
        artifact["vs_baseline"] = _ratio(host_msps, ref_msps)


def _recovery_loop(artifact: dict, ref, files, total_samples: int,
                   geoms: "dict[tuple[int, int], int]", ref_t: list[float],
                   t_start: float, probe_deadline: float,
                   deadline: float) -> None:
    """Keep re-probing a stalled relay for the REST of the budget.

    Round-4 loss mode: one 240 s probe timed out, the rtt gate skipped
    the compute phase, and the bench exited at t+248 s of a 1200 s budget
    — leaving ~950 s in which the relay might have recovered. As long as
    device evidence is missing: sleep 60 s, cheap probe, and the moment
    the relay answers run the (resumable) compute phase and — at >=1 MB/s
    bulk — late device-resident rounds. New probes stop at
    `probe_deadline` (~0.85x budget); in-flight work may run to
    `deadline`. Every probe lands in artifact["recovery_probes"], so an
    artifact with null device fields carries the trail proving the relay
    never answered once in the full budget."""
    missing = _missing_device_evidence(artifact)
    if not missing:
        return

    def backend_name():
        import jax

        return jax.default_backend()

    bk, ok = _deadline(backend_name, min(240.0, max(
        5.0, probe_deadline - time.time())), "recovery backend detection")
    if ok and bk in ("cpu", "gpu"):
        return  # no TPU behind this process: nothing to recover
    trail: list[dict] = artifact.setdefault("recovery_probes", [])
    while missing and time.time() + 70 < probe_deadline:
        time.sleep(60)
        rtt, mbps = safe_probe(
            "recovery probe",
            timeout_s=min(120.0, probe_deadline - time.time()))
        trail.append({
            "t_s": round(time.time() - t_start, 1),
            "rtt_s": round(rtt, 2) if rtt != float("inf") else None,
            "MBps": round(mbps, 1) if mbps == mbps else 0.0,
        })
        log(f"recovery probe at t+{trail[-1]['t_s']:.0f} s: "
            f"rtt={rtt:.2f} s, bulk={mbps:.1f} MB/s "
            f"(missing: {', '.join(missing)})")
        if rtt == float("inf") or rtt > 5.0:
            continue
        artifact["relay_probe_s"] = round(rtt, 3)
        artifact["link_MBps"] = round(mbps, 1)
        # Bulk-hungry work first: device-resident rounds need this
        # window's bandwidth NOW (good-bulk windows are the rare
        # resource), while the shootout/sweep only need a responsive
        # RTT and can run in the degraded tail of the window.
        if "device-resident" in missing and mbps >= 1.0:
            try:
                _recovery_device_rounds(artifact, ref, files, total_samples,
                                        ref_t, deadline, mbps)
            except Exception as exc:
                log(f"recovery device rounds failed "
                    f"({type(exc).__name__}: {exc})")
        if {"shootout", "compute", "parity"} \
                & set(_missing_device_evidence(artifact)):
            try:
                _compute_phase(artifact, geoms, deadline, rtt)
            except Exception as exc:
                log(f"recovered-window compute phase failed "
                    f"({type(exc).__name__}: {exc})")
        missing = _missing_device_evidence(artifact)
    if missing:
        log(f"recovery loop ended at t+{time.time() - t_start:.0f} s; "
            f"still missing: {', '.join(missing)}")


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


def pallas_parity_sweep(timeout_s: float = 900.0, echo=None) -> str:
    """On-HW pallas-vs-XLA sweep in a subprocess (timeout-bounded).
    `echo` overrides the per-line logger (default: bench's stderr log) so
    callers like the relay watcher keep the per-level evidence lines in
    their own timestamped log stream.

    Partial-credit protocol: the tool self-deadlines BETWEEN levels and
    prints a flushed `SWEEP RESULT:` line; if the hard subprocess
    timeout fires mid-level anyway, the per-level lines flushed so far
    are salvaged from the pipe, so a slow remote-compile window records
    "PARTIAL: levels 1,2,… OK" instead of nothing (VERDICT r4 item 1:
    the rehearsal window lost a 13-level sweep to an all-or-nothing
    subprocess timeout)."""
    sweep = pathlib.Path(__file__).parent / "tools" / "pallas_parity_sweep.py"
    argv = [sys.executable, str(sweep),
            f"--deadline-s={max(60.0, timeout_s - 20.0)}"]
    timed_out = False
    try:
        r = subprocess.run(argv, timeout=timeout_s,
                           capture_output=True, text=True)
        out, rc = r.stdout or "", r.returncode
    except subprocess.TimeoutExpired as exc:
        out, rc, timed_out = exc.stdout or "", None, True
        if isinstance(out, bytes):
            out = out.decode("utf-8", errors="replace")
    for line in out.splitlines():
        (echo or log)("  " + line)
    result = next((ln for ln in out.splitlines()
                   if ln.startswith("SWEEP RESULT:")), "")
    if "FAIL" in result or " MISMATCH " in out:
        return "FAIL"
    if result.startswith("SWEEP RESULT: PASS"):
        return "PASS"
    if result.startswith("SWEEP RESULT: PARTIAL"):
        return f"PARTIAL: levels {result.split('ok=', 1)[1]} OK (deadline)"
    # hard timeout mid-level: salvage the flushed per-level lines
    oks = [ln.split(":", 1)[0].split()[-1] for ln in out.splitlines()
           if " OK " in ln]
    if oks:
        return f"PARTIAL: levels {','.join(oks)} OK (timed out mid-level)"
    if timed_out:
        return "sweep timed out (remote compile service)"
    if "no TPU" in out:
        return "skipped (no TPU backend)"
    if rc == 0:
        return "PASS"
    # rc != 0 with no mismatch evidence in the output is a CRASH
    # (SIGSEGV from mmap exhaustion, import error, TPU init dying on a
    # half-dead relay) — never record it as a parity FAIL: FAIL is
    # terminal, outranks earned PARTIALs, and documents a bit-equality
    # mismatch that did not happen. Low rank -> retried next window.
    return f"error (sweep subprocess crashed, rc={rc})"


def main() -> int:
    # Hard self-budget: the artifact (one JSON line) must ALWAYS appear,
    # even if the relay is dead all window — an external timeout killing
    # this process loses the whole round's number.
    t_start = time.time()
    _install_artifact_guard()
    try:
        return _main(t_start)
    except Exception as exc:
        # LAST-RESORT: an exception before the phase-1 artifact was
        # secured (corpus synthesis, the warmup decode, a phase-1
        # assertion) must still leave one JSON line — re-time the host
        # path minimally and emit it flagged.
        log(f"bench crashed ({type(exc).__name__}: {exc}); "
            "emitting fallback artifact")
        if _ARTIFACT is None:
            value = ref_msps = None
            try:
                from libacm_tpu.parallel import decode_corpus

                files = ensure_corpus()
                best = 1e18
                total = 0
                for _ in range(3):
                    t0 = time.perf_counter()
                    res = decode_corpus([str(f) for f in files])
                    best = min(best, time.perf_counter() - t0)
                    total = sum(len(r.pcm) for r in res if r.pcm is not None)
                value = round(total / best / 1e6, 2)
                ref = ensure_reference()
                if ref is not None:
                    rbest = min(time_reference_once(ref, files)
                                for _ in range(3))
                    ref_msps = total / rbest / 1e6
            except Exception as exc2:
                log(f"fallback measurement failed too "
                    f"({type(exc2).__name__}: {exc2})")
            set_artifact({
                "metric": "corpus_decode_Msamples_per_s",
                "value": value,
                "unit": "Msamples/s",
                "vs_baseline": (round(value / ref_msps, 3)
                                if value and ref_msps else None),
                "headline_path": "host-crashfallback",
                "host_path_Msamples_per_s": value,
                "bench_wall_s": round(time.time() - t_start, 1),
            })
        emit_artifact()
        return 0


def _main(t_start: float) -> int:
    budget_s = float(os.environ.get("LIBACM_TPU_BENCH_BUDGET_S", "1200"))
    deadline = t_start + budget_s
    files = ensure_corpus()
    n_files = len(files)
    ref = ensure_reference()
    if ref is None:
        log("reference binary unavailable; vs_baseline=null")
    # the decoded-sample total comes from an actual host decode (hostile
    # members decode partially; both tools decode the same words)
    from libacm_tpu.parallel import decode_corpus

    paths = [str(f) for f in files]
    res = decode_corpus(paths)
    total_samples = sum(len(r.pcm) for r in res if r.pcm is not None)
    # (level, rows) -> decoded samples: the device phase weights its
    # pure-compute summary by each geometry's corpus share
    geoms: dict = {}
    for r in res:
        if r.info is not None and r.pcm is not None:
            g = (r.info.acm_level, r.info.acm_rows)
            geoms[g] = geoms.get(g, 0) + len(r.pcm)
    wire = sum(f.stat().st_size for f in files)
    log(f"corpus: {n_files} files, {len(geoms)} (level,rows) buckets "
        f"(majority level {LEVEL}/rows {ROWS}; minority levels 0/4/10, "
        f"WAVC, {N_HOSTILE} hostile) = {total_samples/1e6:.1f} Msamples "
        f"decoded, {wire*8/total_samples:.2f} bits/sample on disk")

    def run_host() -> float:
        t0 = time.perf_counter()
        out = decode_corpus(paths)
        got = sum(len(r.pcm) for r in out if r.pcm is not None)
        dt = time.perf_counter() - t0
        # hostile members decode partially by design; the decoded total
        # is pinned by the warmup (self-consistency, not completeness)
        assert got == total_samples, (got, total_samples)
        return dt

    # ---- Phase 1: the headline, with NO relay dependency (~1 min) ----
    # Reference and host-path runs INTERLEAVED round-robin: this host's
    # CPU throughput drifts ±30% between "idle" windows, so sequential
    # phases would measure the weather, not the decoders.
    ref_t: list[float] = []
    host_t: list[float] = []
    if ref is not None:
        time_reference_once(ref, files)  # warm the page cache
    for i in range(5):
        if ref is not None:
            ref_t.append(time_reference_once(ref, files))
        host_t.append(run_host())
        log(f"  phase1 round {i}: "
            f"ref={ref_t[-1] if ref_t else float('nan'):.3f} "
            f"host={host_t[-1]:.3f} s")
    # standalone bitstream-scan throughput (host CPU, no device): the
    # serial VLC front-end is the Amdahl term under every number
    scan_msps = time_native_scan(files, total_samples)
    if scan_msps:
        log(f"native packed scan alone: {scan_msps:.1f} Msamples/s")

    ref_msps = total_samples / min(ref_t) / 1e6 if ref_t else None
    host_msps = total_samples / min(host_t) / 1e6
    if ref_msps:
        log(f"reference acmtool -n: {ref_msps:.1f} Msamples/s")
    log(f"framework (host path): {host_msps:.1f} Msamples/s")
    set_artifact({
        "metric": "corpus_decode_Msamples_per_s",
        "value": round(host_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": _ratio(host_msps, ref_msps),
        "headline_path": "host",
        "device_resident_Msamples_per_s": None,
        "device_vs_baseline": None,
        "host_path_Msamples_per_s": round(host_msps, 2),
        "host_vs_baseline": _ratio(host_msps, ref_msps),
        "scan_Msamples_per_s": round(scan_msps, 1) if scan_msps else None,
        "backend_jax_Msamples_per_s": None,
        "backend_pallas_Msamples_per_s": None,
        "pallas_shootout": None,
        "device_compute_Msamples_per_s": None,
        "pallas_parity_sweep": None,
        "relay_probe_s": None,
        "link_MBps": None,
        "bench_wall_s": round(time.time() - t_start, 1),
    })
    log(f"phase 1 artifact secured at t+{time.time() - t_start:.0f} s "
        "(guarded against SIGTERM from here)")

    # ---- Phase 2: device upgrade (deadline-guarded end to end) ----
    try:
        _device_phase(_ARTIFACT, ref, files, total_samples, geoms, ref_t,
                      deadline)
    except Exception as exc:
        log(f"device phase abandoned ({type(exc).__name__}: {exc}); "
            "host artifact stands")
    # ---- Phase 3: relay recovery (use the WHOLE budget, not the first
    # stalled probe's verdict) — new probes stop at 0.85x budget ----
    try:
        _recovery_loop(_ARTIFACT, ref, files, total_samples, geoms, ref_t,
                       t_start, t_start + 0.85 * budget_s, deadline)
    except Exception as exc:
        log(f"recovery loop abandoned ({type(exc).__name__}: {exc})")
    _ARTIFACT["bench_wall_s"] = round(time.time() - t_start, 1)
    emit_artifact()
    return 0


if __name__ == "__main__":
    rc = main()
    # Skip interpreter/JAX teardown: against a degraded relay the PJRT
    # client's shutdown (and abandoned _deadline zombie ops) can hang the
    # process for minutes AFTER the artifact line is out (observed: emit
    # at t+120 s, process alive at t+280 s). Both main() paths have
    # already emitted explicitly; flush and leave.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
