"""Deterministic fixture-corpus generator (+ goldens from the C reference).

Usage:  python tests/make_fixtures.py [--goldens]

Writes tests/fixtures/*.acm covering the full grammar (SURVEY §4.2): every
filler (incl. all 14 linear widths and the 6 invalid codes), levels 0-9,
row-count edges, mono/stereo/mis-tagged files, WAVC wrappers, EOF-truncated
and corrupt streams. With --goldens (requires the compiled C reference at
/tmp/refbuild/src/acmtool or $ACMTOOL_REF), also writes
tests/goldens/<name>.raw / .wav / .info / .stderr captured from the
reference tool, which the test suite byte-compares against.

No game assets are used; everything is synthesized by libacm_tpu.testing.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from libacm_tpu import testing  # noqa: E402
from libacm_tpu.testing import BitWriter, BlockData, write_header  # noqa: E402

HERE = pathlib.Path(__file__).resolve().parent
FIXTURES = HERE / "fixtures"
GOLDENS = HERE / "goldens"


def all_fillers_stream(rng: np.random.Generator) -> bytes:
    """Blocks whose columns pin every decodable filler index."""
    level, rows = 5, 96  # 32 columns
    cols = 1 << level
    fillers = [0, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
               17, 18, 19, 20, 21, 22, 23, 24, 26, 27, 29]
    fillers += [0, 18, 21, 24, 27, 29][: cols - len(fillers)]
    ranges = {0: (0, 0), 17: (-1, 1), 18: (-1, 1), 19: (-1, 1),
              20: (-2, 2), 21: (-2, 2), 22: (-2, 2), 23: (-3, 3),
              24: (-3, 3), 26: (-4, 4), 27: (-4, 4), 29: (-5, 5)}
    blocks = []
    for _ in range(4):
        k = np.zeros((rows, cols), dtype=np.int32)
        for c, f in enumerate(fillers):
            if 3 <= f <= 16:
                lo, hi = -(1 << (f - 1)), (1 << (f - 1)) - 1
            else:
                lo, hi = ranges[f]
            k[:, c] = rng.integers(lo, hi + 1, size=rows)
            if f not in (0,) and rng.random() < 0.7:
                mask = rng.random(rows) < 0.5  # zero runs for pair forms
                k[mask, c] = 0
        blocks.append(BlockData(pwr=15, val=int(rng.integers(0, 1 << 16)),
                                k=k, fillers=list(fillers)))
    return testing.encode_acm(blocks, total_values=4 * rows * cols,
                              channels=1, rate=22050, level=level, rows=rows)


def corrupt_stream(rng: np.random.Generator) -> bytes:
    """Valid block 0, then a block with an invalid filler code (f_bad)."""
    level, rows = 3, 40
    cols = 1 << level
    good = testing.random_blocks(rng, level, rows, 1)[0]
    w = BitWriter()
    write_header(w, total_values=3 * rows * cols, channels=1, rate=22050,
                 level=level, rows=rows)
    w.put(good.pwr, 4)
    w.put(good.val, 16)
    for c in range(cols):
        testing.encode_column(w, good.k[:, c], testing.choose_filler(good.k[:, c]))
    # second block: two good columns, then invalid code 1
    w.put(2, 4)
    w.put(1234, 16)
    z = np.zeros(rows, dtype=np.int32)
    testing.encode_column(w, z, 0)
    testing.encode_column(w, z, 0)
    w.put(1, 5)  # f_bad → ACM_ERR_CORRUPT
    return w.getvalue()


def truncated_stream(rng: np.random.Generator, at_column: bool) -> bytes:
    """A stream cut off mid-block.

    at_column=True: cut exactly before a column code (clean EOF mid-block);
    otherwise: cut inside a filler payload (unexpected EOF). The cut must
    leave <5 (resp. <needed) bits even after the injected zero byte, so we
    trim whole bytes until the oracle reports the wanted status.
    """
    from libacm_tpu.scan import oracle

    level, rows = 4, 64
    cols = 1 << level
    blocks = testing.random_blocks(rng, level, rows, 3, max_pwr=8)
    # ensure wide linear fillers so payloads are long
    data = testing.encode_acm(blocks, total_values=6 * rows * cols,
                              channels=1, rate=22050, level=level, rows=rows)
    for cut in range(len(data) - 1, 14, -1):
        d = data[:cut]
        try:
            scan = oracle.scan_bytes(d)
        except ValueError:
            break
        has_err = bool((scan.events == -7).any())
        if at_column:
            ok = (not (scan.events < 0).any() and scan.status == -99
                  and 1 <= scan.n_blocks < 3)
        else:
            ok = has_err and scan.n_blocks >= 1
        if ok:
            return d
    raise RuntimeError("could not produce truncation fixture")


def build_fixtures() -> dict[str, bytes]:
    rng = np.random.default_rng(0xACD)
    fx: dict[str, bytes] = {}
    fx["speech_22k_mono.acm"] = testing.random_acm_bytes(
        rng, level=7, rows=16, n_blocks=24, channels=1, rate=22050)
    fx["music_44k_stereo.acm"] = testing.random_acm_bytes(
        rng, level=7, rows=16, n_blocks=30, channels=2, rate=44100)
    fx["mistagged_mono.acm"] = testing.random_acm_bytes(
        rng, level=6, rows=20, n_blocks=8, channels=1, rate=22050)
    fx["wavc_22k.acm"] = testing.random_acm_bytes(
        rng, level=5, rows=40, n_blocks=6, channels=1, rate=22050, wavc=True)
    fx["level0.acm"] = testing.random_acm_bytes(
        rng, level=0, rows=200, n_blocks=5, channels=1, rate=22050)
    fx["level9.acm"] = testing.random_acm_bytes(
        rng, level=9, rows=4, n_blocks=3, channels=1, rate=22050)
    fx["rows1.acm"] = testing.random_acm_bytes(
        rng, level=2, rows=1, n_blocks=6, channels=1, rate=22050)
    fx["rows4095.acm"] = testing.random_acm_bytes(
        rng, level=1, rows=4095, n_blocks=2, channels=1, rate=22050)
    fx["eofpad.acm"] = testing.random_acm_bytes(
        rng, level=4, rows=64, n_blocks=5, channels=1, rate=22050,
        total_values=5 * 64 * 16 + 321)
    fx["oddtotal_stereo.acm"] = testing.random_acm_bytes(
        rng, level=4, rows=64, n_blocks=5, channels=2, rate=22050,
        total_values=4 * 64 * 16 - 7)
    fx["partial_total.acm"] = testing.random_acm_bytes(
        rng, level=4, rows=64, n_blocks=5, channels=1, rate=22050,
        total_values=3 * 64 * 16 - 5)
    fx["allfillers.acm"] = all_fillers_stream(rng)
    fx["corrupt.acm"] = corrupt_stream(rng)
    fx["trunc_midfiller.acm"] = truncated_stream(rng, at_column=False)
    fx["trunc_colbound.acm"] = truncated_stream(rng, at_column=True)
    return fx


def main() -> None:
    make_goldens = "--goldens" in sys.argv
    FIXTURES.mkdir(exist_ok=True)
    fx = build_fixtures()
    for name, data in fx.items():
        (FIXTURES / name).write_bytes(data)
        print(f"{name}: {len(data)} bytes")

    if not make_goldens:
        return
    ref = os.environ.get("ACMTOOL_REF", "/tmp/refbuild/src/acmtool")
    if not os.path.exists(ref):
        raise SystemExit(f"reference acmtool not found at {ref}")
    GOLDENS.mkdir(exist_ok=True)
    import tempfile

    for name in fx:
        src = FIXTURES / name
        stem = name[: -len(".acm")]
        with tempfile.TemporaryDirectory() as d:
            raw = pathlib.Path(d) / "out.raw"
            r = subprocess.run([ref, "-d", "-r", "-o", str(raw), str(src)],
                               capture_output=True)
            (GOLDENS / f"{stem}.raw").write_bytes(raw.read_bytes())
            (GOLDENS / f"{stem}.stderr").write_bytes(
                r.stderr.replace(str(src).encode(), b"%SRC%"))
            (GOLDENS / f"{stem}.info").write_bytes(
                r.stdout.replace(str(src).encode(), b"%SRC%"))
            wav = pathlib.Path(d) / "out.wav"
            subprocess.run([ref, "-d", "-q", "-o", str(wav), str(src)],
                           capture_output=True)
            (GOLDENS / f"{stem}.wav").write_bytes(wav.read_bytes())
        print(f"goldens for {stem} done")


if __name__ == "__main__":
    main()
