"""Bounded-memory streaming playback/consumption of one ACM file.

    python examples/stream_player.py FILE [seek_seconds]

Shows the windowed AcmStream: the source is consumed incrementally
through a read()-only handle (no length, no mmap), at most `window_blocks`
decoded blocks stay resident, and output is byte-identical to a full-file
decode — the reference's plugin/player usage shape (SURVEY §3.5) with the
reference's own O(64 KiB + block) memory profile (decode.c:29, 41-67).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libacm_tpu.stream import AcmStream


class FileReader:
    """Deliberately minimal AcmIO: read() only (a pipe/VFS stand-in)."""

    def __init__(self, path):
        self._f = open(path, "rb")

    def read(self, size: int = -1) -> bytes:
        return self._f.read(size)


def main(argv):
    path = argv[0]
    s = AcmStream(FileReader(path), window_blocks=8)
    print(f"{path}: {s.channels} ch @ {s.rate} Hz, "
          f"level {s.info.acm_level}/rows {s.info.acm_rows}, "
          f"{s.time_total() / 1000:.1f} s")

    t0 = time.perf_counter()
    total = 0
    peak = 0
    while True:
        chunk = s.read_loop(8192)  # "play" 8 KiB at a time
        if not chunk:
            break
        total += len(chunk)
        peak = max(peak, s._win.resident_bytes())
    dt = time.perf_counter() - t0
    print(f"streamed {total / 2 / 1e6:.2f} Msamples in {dt:.2f}s "
          f"({total / 2 / dt / 1e6:.1f} Msamples/s), "
          f"peak window residency {peak / 1024:.0f} KiB")

    if len(argv) > 1:
        # interactive-seek shape: reopen seekably and jump around
        from libacm_tpu.stream import acm_open_file

        s2 = acm_open_file(path, window_blocks=8)
        ms = int(float(argv[1]) * 1000)
        reached = s2.seek_time(ms)
        print(f"seek to {ms} ms -> reached {reached} ms; "
              f"next chunk: {len(s2.read_loop(8192))} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
