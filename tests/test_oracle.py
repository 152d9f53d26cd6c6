"""Oracle (executable spec) unit tests: grammar round-trip, statuses, reader."""

import numpy as np
import pytest

from libacm_tpu import testing
from libacm_tpu.format import ACM_EXPECTED_EOF, AcmError
from libacm_tpu.scan import oracle


@pytest.mark.parametrize("level,rows", [(0, 1), (0, 7), (1, 1), (2, 9),
                                        (4, 64), (5, 33), (7, 16)])
def test_encoder_oracle_roundtrip(level, rows):
    rng = np.random.default_rng(level * 100 + rows)
    blocks = testing.random_blocks(rng, level, rows, 3)
    data = testing.encode_acm(blocks, total_values=3 * rows * (1 << level),
                              rng=rng)
    scan = oracle.scan_bytes(data)
    assert scan.n_blocks == 3
    assert scan.status in (0, ACM_EXPECTED_EOF)
    for i, b in enumerate(blocks):
        assert scan.pwr[i] == b.pwr
        assert scan.val[i] == b.val
        np.testing.assert_array_equal(scan.k[i], b.k.astype(np.int16))


def test_all_filler_indices_roundtrip():
    """Every decodable filler, including every linear width 3..16."""
    rng = np.random.default_rng(5)
    level, rows = 5, 24
    cols = 1 << level
    fillers = [0, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
               17, 18, 19, 20, 21, 22, 23, 24, 26, 27, 29]
    fillers += [0] * (cols - len(fillers))
    ranges = {0: (0, 0), 17: (-1, 1), 18: (-1, 1), 19: (-1, 1),
              20: (-2, 2), 21: (-2, 2), 22: (-2, 2), 23: (-3, 3),
              24: (-3, 3), 26: (-4, 4), 27: (-4, 4), 29: (-5, 5)}
    k = np.zeros((rows, cols), dtype=np.int32)
    for c, f in enumerate(fillers):
        lo, hi = ((-(1 << (f - 1)), (1 << (f - 1)) - 1)
                  if 3 <= f <= 16 else ranges[f])
        k[:, c] = rng.integers(lo, hi + 1, size=rows)
    blk = testing.BlockData(pwr=15, val=7, k=k, fillers=fillers)
    data = testing.encode_acm([blk], total_values=rows * cols)
    scan = oracle.scan_bytes(data)
    np.testing.assert_array_equal(scan.k[0], k.astype(np.int16))


def test_corrupt_fixture_status(fixtures_dir):
    data = (fixtures_dir / "corrupt.acm").read_bytes()
    scan = oracle.scan_bytes(data)
    assert int(AcmError.ERR_CORRUPT) in scan.events
    assert scan.n_blocks == 1
    assert scan.events[0] == 0  # block 0 decoded before the corruption


def test_truncation_statuses(fixtures_dir):
    mid = oracle.scan_bytes((fixtures_dir / "trunc_midfiller.acm").read_bytes())
    assert int(AcmError.ERR_UNEXPECTED_EOF) in mid.events
    col = oracle.scan_bytes((fixtures_dir / "trunc_colbound.acm").read_bytes())
    assert col.status == ACM_EXPECTED_EOF
    assert not (col.events < 0).any()


def test_bitreader_eof_zero_byte():
    """Trailing bits decode thanks to exactly one injected zero byte."""
    r = oracle.BitReader(b"\xff")
    assert r.get(4) == 0xF
    assert r.get(8) == 0x0F  # 4 real bits + 4 zero-byte bits
    assert r.get(4) == 0
    with pytest.raises(oracle.BitsExhausted):
        r.get(1)


def test_bitreader_lsb_first_order():
    r = oracle.BitReader(bytes([0b10110100, 0b01100001]))
    assert r.get(3) == 0b100
    assert r.get(5) == 0b10110
    assert r.get(8) == 0b01100001


def test_header_rejections():
    rng = np.random.default_rng(0)
    good = testing.random_acm_bytes(rng, level=1, rows=4, n_blocks=1)
    assert oracle.parse_header(oracle.BitReader(good)) is not None
    # wrong magic
    assert oracle.parse_header(oracle.BitReader(b"\x00" + good[1:])) is None
    # version != 1
    bad = good[:3] + b"\x02" + good[4:]
    assert oracle.parse_header(oracle.BitReader(bad)) is None
    # rate < 4096: rebuild a header with low rate
    w = testing.BitWriter()
    testing.write_header(w, 100, 1, 4095, 1, 4)
    assert oracle.parse_header(oracle.BitReader(w.getvalue())) is None
    # rows == 0
    w = testing.BitWriter()
    testing.write_header(w, 100, 1, 22050, 1, 0)
    assert oracle.parse_header(oracle.BitReader(w.getvalue())) is None
    # channels == 3
    w = testing.BitWriter()
    testing.write_header(w, 100, 3, 22050, 1, 4)
    assert oracle.parse_header(oracle.BitReader(w.getvalue())) is None


def test_wavc_header(fixtures_dir):
    data = (fixtures_dir / "wavc_22k.acm").read_bytes()
    hdr = oracle.scan_bytes(data).header
    assert hdr.wavc_file
    assert hdr.data_start == 42
    # breaking the magic 28 at word 6 must reject the file
    broken = bytearray(data)
    broken[16] = 29  # word[6] low byte lives at offset 4 + 6*2 = 16
    assert oracle.parse_header(oracle.BitReader(bytes(broken))) is None
