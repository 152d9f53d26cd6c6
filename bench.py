"""End-to-end corpus decode benchmark: framework (TPU) vs C reference (CPU).

Prints ONE JSON line:
  {"metric": "corpus_decode_Msamples_per_s", "value": N,
   "unit": "Msamples/s", "vs_baseline": N/<C reference single-core>}

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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

# Corpus: audio-realistic content mirroring BASELINE.json's configs —
# mostly 22 kHz mono Fallout-style speech (sparse high bands, ~16 kbps:
# the reference's own typical-file anchor is 13 kbps, util.c:161-162)
# plus denser 44.1 kHz stereo Baldur's-Gate-style music. Level 7 /
# rows 16 = the classic 2048-word block geometry. Encoded with the
# cheapest covering filler per column, like real encoders.
N_SPEECH, N_MUSIC = 160, 40
LEVEL, ROWS, NBLOCKS = 7, 16, 300
RATE = 22050
CORPUS_DIR = pathlib.Path(
    f"/tmp/libacm_tpu_bench_v4_{N_SPEECH}+{N_MUSIC}x{NBLOCKS}"
)
REF_SRC = pathlib.Path("/root/reference/src")
REF_BIN = pathlib.Path("/tmp/refbuild/src/acmtool")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_corpus() -> list[pathlib.Path]:
    files = [CORPUS_DIR / f"speech_{i:03d}.acm" for i in range(N_SPEECH)]
    files += [CORPUS_DIR / f"music_{i:03d}.acm" for i in range(N_MUSIC)]
    if all(f.exists() for f in files):
        return files
    from libacm_tpu import testing

    log(f"synthesizing corpus into {CORPUS_DIR} (one-time)...")
    CORPUS_DIR.mkdir(parents=True, exist_ok=True)
    for i, f in enumerate(files):
        if f.exists():
            continue
        rng = np.random.default_rng(2026 + i)  # per-file: resumable gen
        music = f.name.startswith("music")
        f.write_bytes(
            testing.speech_acm_bytes(
                rng, level=LEVEL, rows=ROWS, n_blocks=NBLOCKS,
                channels=2 if music else 1,
                rate=44100 if music else RATE,
                base_pwr=8 if music else 5,
                decay_cols=24.0 if music else 4.0,
            )
        )
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


def time_reference(ref: pathlib.Path, files: list[pathlib.Path]) -> float:
    """Best-of-5 seconds for `acmtool -d -n -q <files>` (decode, no output;
    min-of-N on both sides so host CPU contention cancels out)."""
    argv = [str(ref), "-d", "-n", "-q"] + [str(f) for f in files]
    subprocess.run(argv, check=True, capture_output=True)  # warm page cache
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        subprocess.run(argv, check=True, capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return best


def time_framework(
    files: list[pathlib.Path], total_samples: int
) -> tuple[float, float, dict]:
    """(device-resident seconds, host-fetch seconds, backend shootout).

    Device-resident is the headline: the corpus-decode use case is dataset
    ingest for TPU jobs, where PCM is consumed on device (and the
    reference's own benchmark mode, `acmtool -n`, likewise discards its
    output). The checksum is a device reduction that forces every PCM
    sample to materialize; only scalars cross the wire. The shootout times
    the XLA pass chain vs the fused Pallas kernel on the same corpus so
    the `auto` backend selection is grounded in a hardware measurement.
    """
    from libacm_tpu.parallel import decode_corpus, decode_corpus_device

    paths = [str(f) for f in files]
    want_sum = None

    def run_device(backend: str = "auto") -> float:
        nonlocal want_sum
        t0 = time.perf_counter()
        corpus = decode_corpus_device(paths, backend=backend)
        cs = corpus.checksum()
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
        assert got == total_samples, (got, total_samples)
        assert all(r.ok for r in res)
        return dt

    log("framework: warmup (compile)...")
    run_device()
    run_host()
    # The TPU relay's throughput is volatile (congestion builds under
    # sustained load and drains when idle); min-of-N with short cooldowns
    # measures the pipeline, not the weather.
    times = []
    for i in range(8):
        times.append(run_device())
        log(f"  device run {i}: {times[-1]:.3f} s")
        time.sleep(1.0)
    dev = min(times)
    host = min(run_host() for _ in range(3))

    shoot = {}
    for backend in ("jax", "pallas"):
        try:
            run_device(backend)  # warmup/compile
            bt = min(run_device(backend) for _ in range(3))
            shoot[backend] = round(total_samples / bt / 1e6, 1)
            log(f"  backend {backend}: {bt:.3f} s = {shoot[backend]} Msamples/s")
        except Exception as e:  # pallas may be unsupported on this backend
            log(f"  backend {backend}: failed ({type(e).__name__}: {e})")
            shoot[backend] = None
    return dev, host, shoot


def main() -> int:
    files = ensure_corpus()
    n_files = N_SPEECH + N_MUSIC
    total_samples = n_files * NBLOCKS * ROWS * (1 << LEVEL)
    wire = sum(f.stat().st_size for f in files)
    log(f"corpus: {n_files} files x {NBLOCKS} blocks (level {LEVEL}, "
        f"rows {ROWS}) = {total_samples/1e6:.1f} Msamples, "
        f"{wire*8/total_samples:.2f} bits/sample on disk")

    ref = ensure_reference()
    if ref is not None:
        ref_s = time_reference(ref, files)
        ref_msps = total_samples / ref_s / 1e6
        log(f"reference acmtool -n: {ref_s:.3f} s = {ref_msps:.1f} Msamples/s")
    else:
        ref_msps = None
        log("reference binary unavailable; vs_baseline=null")

    fw_s, host_s, shoot = time_framework(files, total_samples)
    fw_msps = total_samples / fw_s / 1e6
    host_msps = total_samples / host_s / 1e6
    realtime = fw_msps * 1e6 / RATE
    log(f"framework (device-resident): {fw_s:.3f} s = {fw_msps:.1f} Msamples/s "
        f"({realtime:.0f}x realtime @ {RATE} Hz mono)")
    log(f"framework (PCM fetched to host): {host_s:.3f} s = "
        f"{host_msps:.1f} Msamples/s")

    print(json.dumps({
        "metric": "corpus_decode_Msamples_per_s",
        "value": round(fw_msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(fw_msps / ref_msps, 3) if ref_msps else None,
        "host_path_Msamples_per_s": round(host_msps, 2),
        "host_vs_baseline": (round(host_msps / ref_msps, 3)
                             if ref_msps else None),
        "backend_jax_Msamples_per_s": shoot.get("jax"),
        "backend_pallas_Msamples_per_s": shoot.get("pallas"),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
