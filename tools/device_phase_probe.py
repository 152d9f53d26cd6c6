"""One-shot device-pipeline phase diagnosis: waits for a responsive
relay window, then times each chunk dispatch of `decode_corpus_device`
(coalesce / device_put / jit dispatch) plus the end-to-end wall, twice.

Evidence tool for the device-path latency question: the relay captures
show a CONSTANT ~5.05 s device round across 20-33 MB/s bulk windows,
i.e. the path is fixed-latency-bound (serialized per-chunk transfers),
not bandwidth-bound. This pins down where the seconds go.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/device_phase_probe.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import libacm_tpu  # noqa: F401
import bench
from libacm_tpu.parallel import corpus as C


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> int:
    import jax

    if jax.default_backend() in ("cpu", "gpu"):
        log("no TPU backend")
        return 0
    deadline = time.time() + 6 * 3600
    while time.time() < deadline:
        rtt, mbps = bench.safe_probe(timeout_s=240.0)
        log(f"probe: rtt={rtt:.2f} s bulk={mbps:.1f} MB/s")
        if rtt < 5.0 and mbps >= 5.0:
            break
        time.sleep(240)
    else:
        log("no usable window in budget")
        os._exit(0)

    orig_coalesce = C._coalesce_wire

    def timed_dispatch(arrays, chunk, level, rows, nb, backend="jax",
                       wirebufs=None):
        from libacm_tpu.ops.synth_jax import synth_pcm_cols_blob

        t0 = time.perf_counter()
        blob, lens = orig_coalesce(arrays, wirebufs)
        t1 = time.perf_counter()
        dev = jax.device_put(blob)
        dev.block_until_ready()
        t2 = time.perf_counter()
        if wirebufs is not None:
            wirebufs.dev = (dev,)
        pcm, _ = synth_pcm_cols_blob(dev, level=level, rows=rows,
                                     batch=len(chunk), nb=nb,
                                     backend=backend, lens=lens)
        t3 = time.perf_counter()
        log(f"  chunk lvl{level}/r{rows} files={len(chunk)} "
            f"blob={len(blob) / 1e6:.2f}MB coalesce={t1 - t0:.3f} "
            f"put={t2 - t1:.3f} dispatch={t3 - t2:.3f}")
        return C._BucketOut(level=level, rows=rows, entries=chunk, pcm=pcm)

    C._dispatch_cols_wire = timed_dispatch

    from libacm_tpu.parallel import decode_corpus_device

    files = bench.ensure_corpus()
    paths = [str(f) for f in files]
    want = None
    for r in range(2):
        t0 = time.perf_counter()
        res, ok = bench._deadline(
            lambda: (lambda c: (c, c.checksum()))(decode_corpus_device(paths)),
            900.0, "device corpus round")
        if not ok:
            log("round stalled; giving up this window")
            break
        corpus, cs = res
        dt = time.perf_counter() - t0
        if want is None:
            want = cs
        assert cs == want
        log(f"round {r}: total={dt:.2f} s scan_s={corpus.summary.scan_s:.3f} "
            f"checksum ok")
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
