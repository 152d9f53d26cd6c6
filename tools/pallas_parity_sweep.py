"""On-hardware Pallas parity sweep: one small batch per level, pallas vs
XLA, bit-equality required (VERDICT r2 item 9 — CI covers the kernel in
interpreter mode only; this pins the real-TPU lowering for every level
the kernel claims).

Run standalone (prints one line per level) or via bench.py, which invokes
it in a subprocess with a timeout so a wedged remote-compile service
degrades the bench to "sweep skipped", not a hang.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_comp_cache")
)
sys.path.insert(0, _REPO)

import time  # noqa: E402

import numpy as np  # noqa: E402


def main() -> int:
    # --deadline-s=N: stop cleanly BETWEEN levels when the budget is
    # nearly gone and still print the summary line, so a slow remote
    # compile service yields a partial verdict instead of a killed
    # subprocess with an empty pipe (bench.py parses SWEEP RESULT).
    # Anchor the clock BEFORE the jax import: TPU backend init against a
    # degraded relay can itself take tens of seconds, and the parent's
    # hard timeout budget includes it.
    deadline = None
    levels = []
    for a in sys.argv[1:]:
        if a.startswith("--deadline-s="):
            deadline = time.monotonic() + float(a.split("=", 1)[1])
        else:
            levels.append(int(a))
    levels = levels or list(range(1, 15))

    import jax
    import jax.numpy as jnp

    from libacm_tpu.ops.synth_jax import synth_pcm_batch
    from libacm_tpu.ops.synth_pallas import pallas_supported, synth_pcm_pallas

    if jax.default_backend() in ("cpu", "gpu"):
        print(f"sweep skipped: no TPU ({jax.default_backend()} backend; "
              "CI covers interpreter-mode parity)", flush=True)
        return 0
    rng = np.random.default_rng(7)
    failures = 0
    ok_levels: list[int] = []
    stopped = False
    for level in levels:
        if deadline is not None and deadline - time.monotonic() < 45:
            print(f"DEADLINE: stopping before level {level}", flush=True)
            stopped = True
            break
        cols = 1 << level
        # rows: near the classic 2048-word block, rounded up so
        # rows*cols is a multiple of 128 (the kernel's supported set);
        # odd levels get +1 pre-rounding so both H=1 and H>1 tile
        # geometries and varying T-batching appear across the sweep
        base = max(1, min(64, 2048 // cols)) + (level % 2)
        mult = max(1, 128 // cols)
        rows = -(-base // mult) * mult
        if not pallas_supported(level, rows):
            print(f"level {level:2d}: skipped (unsupported geometry)",
                  flush=True)
            continue
        k = rng.integers(-300, 300, (2, 8, rows, cols)).astype(np.int16)
        vals = rng.integers(1, 3000, (2, 8)).astype(np.int32)
        wrap0 = rng.integers(-10000, 10000,
                             (2, max(2 * cols - 2, 1))).astype(np.int32)
        a, wa = synth_pcm_batch(jnp.asarray(k), jnp.asarray(vals),
                                jnp.asarray(wrap0), level=level, rows=rows)
        b, wb = synth_pcm_pallas(jnp.asarray(k), jnp.asarray(vals),
                                 jnp.asarray(wrap0), level=level, rows=rows)
        ok = bool(jnp.array_equal(a, b)) and bool(jnp.array_equal(wa, wb))
        print(f"level {level:2d}: rows {rows:4d} "
              f"{'OK' if ok else 'MISMATCH'} [{jax.default_backend()}]",
              flush=True)
        failures += 0 if ok else 1
        if ok:
            ok_levels.append(level)
    if failures:
        print(f"SWEEP RESULT: FAIL mismatch={failures}", flush=True)
    elif stopped:
        print("SWEEP RESULT: PARTIAL ok="
              + ",".join(str(v) for v in ok_levels), flush=True)
    else:
        print(f"SWEEP RESULT: PASS ok={len(ok_levels)} levels", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
