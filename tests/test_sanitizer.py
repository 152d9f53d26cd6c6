"""ASAN/UBSAN run of the native scanner over a fuzz corpus (SURVEY §5).

Builds the scanner with -fsanitize=address,undefined as a standalone
binary and feeds it fixtures, random streams, truncations and bit-flip
mutants. Any sanitizer report makes the binary exit non-zero.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.format import ACM_HEADER_LEN, WAVC_HEADER_LEN
from libacm_tpu.scan.oracle import BitReader, parse_header

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE.parent / "libacm_tpu" / "scan"


@pytest.fixture(scope="module")
def san_bin(tmp_path_factory):
    out = tmp_path_factory.mktemp("san") / "sanscan"
    cmd = ["g++", "-O1", "-g", "-std=c++17",
           "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
           "-o", str(out), str(SRC / "_scan.cpp"),
           str(SRC / "_scan_sanmain.cpp")]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"sanitizer toolchain unavailable: {e}")
    return out


def _run(san_bin, tmp_path, data: bytes, i: int):
    hdr = parse_header(BitReader(data))
    if hdr is None:
        return
    f = tmp_path / f"in_{i}.acm"
    f.write_bytes(data)
    skip = 8 * (ACM_HEADER_LEN + (WAVC_HEADER_LEN if hdr.wavc_file else 0))
    r = subprocess.run(
        [str(san_bin), str(f), str(skip), str(hdr.level), str(hdr.rows),
         str(hdr.n_blocks)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, f"sanitizer fired on case {i}:\n{r.stderr[-2000:]}"


def test_sanitized_scan_fuzz(san_bin, tmp_path):
    rng = np.random.default_rng(1234)
    cases = []
    for f in sorted((HERE / "fixtures").glob("*.acm")):
        cases.append(f.read_bytes())
    for _ in range(10):
        cases.append(testing.random_acm_bytes(
            rng, level=int(rng.integers(0, 8)), rows=int(rng.integers(1, 60)),
            n_blocks=int(rng.integers(1, 5)), wavc=bool(rng.integers(0, 2)),
            max_pwr=int(rng.integers(0, 16)),
        ))
    base = cases[-1]
    for cut in range(14, len(base), max(1, len(base) // 15)):
        cases.append(base[:cut])
    for _ in range(25):
        mut = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            mut[int(rng.integers(14, len(mut)))] ^= 1 << int(rng.integers(0, 8))
        cases.append(bytes(mut))
    for i, data in enumerate(cases):
        _run(san_bin, tmp_path, data, i)
