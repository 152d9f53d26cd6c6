"""ctypes loader/wrapper for the C++ scanner (`_scan.cpp`).

Compiles the shared object on demand with g++ (no Python headers needed —
the ABI is plain C arrays) into a content-hash-keyed cache next to this
package, and exposes `scan_bytes` with semantics identical to
`oracle.scan_bytes` (differential-fuzzed in tests/test_scan_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

from ..format import ACM_HEADER_LEN, WAVC_HEADER_LEN
from . import oracle
from .oracle import BitReader, ScanResult, parse_header

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "_scan.cpp"

_lib = None
_tried = False


def _build() -> pathlib.Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = pathlib.Path(
        os.environ.get("LIBACM_TPU_CACHE", _HERE / "_build")
    )
    so = cache_dir / f"_scan-{tag}.so"
    if so.exists():
        return so
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=cache_dir, delete=False
        ) as tmp:
            tmp_path = pathlib.Path(tmp.name)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(tmp_path), str(_SRC)],
            check=True, capture_output=True,
        )
        tmp_path.replace(so)  # atomic under concurrent builders
        return so
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    fn = lib.acm_scan_blocks
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,  # data, nbytes
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,  # skip, level, rows
        ctypes.c_int64, ctypes.c_int64,  # max_blocks, max_events
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def scan_bytes(data: bytes, max_blocks: int | None = None) -> ScanResult:
    """Header parse (Python) + native block scan. Same result as the oracle."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native scanner not available")

    header = parse_header(BitReader(data))
    if header is None:
        raise ValueError("not an ACM stream")
    if max_blocks is None:
        max_blocks = header.n_blocks
    rows, cols = header.rows, header.cols
    skip_bits = 8 * (ACM_HEADER_LEN + (WAVC_HEADER_LEN if header.wavc_file else 0))

    # every recorded event consumes >= 20 payload bits (pwr+val), so this
    # bound cannot be hit; +4 covers reservoir-tail attempts
    max_events = (8 * (len(data) + 1)) // 20 + 4

    k = np.zeros((max_blocks, rows, cols), dtype=np.int16)
    pwr = np.zeros(max_blocks, dtype=np.uint8)
    val = np.zeros(max_blocks, dtype=np.uint16)
    events = np.zeros(max_events, dtype=np.int16)
    tell = np.zeros(max_events, dtype=np.int64)
    meta = np.zeros(5, dtype=np.int64)

    rc = lib.acm_scan_blocks(
        data, len(data), skip_bits, header.level, rows,
        max_blocks, max_events,
        _ptr(k, ctypes.c_int16), _ptr(pwr, ctypes.c_uint8),
        _ptr(val, ctypes.c_uint16), _ptr(events, ctypes.c_int16),
        _ptr(tell, ctypes.c_int64), _ptr(meta, ctypes.c_int64),
    )
    if rc != 0:
        # can't happen per the bound above; fall back to the spec anyway
        return oracle.scan_bytes(bytes(data), max_blocks)

    n_blocks, n_events, status, tell_end, tell0 = (int(x) for x in meta)
    return ScanResult(
        header=header,
        k=k[:n_blocks],
        pwr=pwr[:n_blocks],
        val=val[:n_blocks],
        n_blocks=n_blocks,
        events=events[:n_events].copy(),
        status=status,
        raw_tell=tell[:n_events].copy(),
        raw_tell0=tell0,
        raw_tell_end=tell_end,
    )
