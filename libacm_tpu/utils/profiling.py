"""Tracing/profiling hooks (SURVEY §5 tracing).

The reference's only performance tooling is `acmtool -n` (decode with
output discarded, acmtool.c:402). Here:

- `trace(dir)` — context manager around jax.profiler.trace: captures a
  Perfetto/XPlane trace of everything inside (device kernels, transfers,
  host callbacks). View with TensorBoard or ui.perfetto.dev.
- `annotate(name)` — jax.profiler.TraceAnnotation wrapper for labeling
  host-side pipeline stages (scan, assemble, dispatch) inside a trace.
- `LIBACM_TPU_PROFILE=<dir>` — the acmtool CLI wraps its decode loop in
  `trace(dir)` when this is set (no CLI-flag change, so the reference's
  exact flag surface stays intact).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX profiler trace of the enclosed block into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def maybe_trace_from_env():
    """trace(...) if LIBACM_TPU_PROFILE is set, else no-op."""
    log_dir = os.environ.get("LIBACM_TPU_PROFILE")
    if not log_dir:
        yield
        return
    with trace(log_dir):
        yield
