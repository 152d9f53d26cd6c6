"""Bitstream front-end: serial VLC scan → dense coefficient tensors.

Two interchangeable backends produce identical ``ScanResult``s:

- ``oracle``: pure-NumPy/Python, the executable spec (slow, obviously right);
- ``native``: C++ scanner (fast path; the serial VLC decode is the one
  inherently sequential stage, so it runs as native host code — the
  reference's equivalent stage is native C too).

``scan_bytes`` picks the fastest available backend unless told otherwise.
"""

from __future__ import annotations

from . import oracle
from .oracle import BitReader, ScanResult, parse_header

_FORCED: str | None = None


def set_backend(name: str | None) -> None:
    """Force 'oracle' or 'native' (None = auto)."""
    global _FORCED
    assert name in (None, "oracle", "native")
    globals()["_FORCED"] = name


def _native():
    try:
        from . import native

        if native.available():
            return native
    except Exception:
        pass
    return None


def scan_bytes(data: bytes, max_blocks: int | None = None, backend: str | None = None) -> ScanResult:
    """Scan a whole in-memory ACM/WAVC stream with the active backend."""
    choice = backend or _FORCED
    if choice == "oracle":
        return oracle.scan_bytes(data, max_blocks)
    nat = _native()
    if nat is not None:
        return nat.scan_bytes(data, max_blocks)
    if choice == "native":
        raise RuntimeError("native scanner not available")
    return oracle.scan_bytes(data, max_blocks)
