"""format.py unit tests."""

from libacm_tpu.format import (
    AcmError,
    AcmHeader,
    acm_strerror,
    resolve_channels,
)


def test_strerror_table():
    assert acm_strerror(0) == "No error"
    assert acm_strerror(-3) == "Not an ACM file"
    assert acm_strerror(-6) == "Corrupt file"
    assert acm_strerror(-7) == "Unexcpected EOF"  # [sic] like the reference
    assert acm_strerror(-8) == "Stream not seekable"
    assert acm_strerror(-99) == "Unknown error"
    assert acm_strerror(1) == "Unknown error"


def test_header_geometry():
    h = AcmHeader(total_values=10000, channels=1, rate=22050, level=4, rows=64)
    assert h.cols == 16
    assert h.block_len == 1024
    assert h.wrapbuf_len == 30
    assert h.data_start == 14
    assert h.n_blocks == 10  # ceil(10000/1024)
    hw = AcmHeader(total_values=1, channels=2, rate=44100, level=0, rows=1,
                   wavc_file=True)
    assert hw.cols == 1 and hw.wrapbuf_len == 0 and hw.data_start == 42


def test_resolve_channels():
    assert resolve_channels(1, False, 0) == 1
    assert resolve_channels(1, False, -1) == 2  # plain-ACM stereo quirk
    assert resolve_channels(1, True, -1) == 1   # WAVC trusted
    assert resolve_channels(2, False, -1) == 2
    assert resolve_channels(1, False, 2) == 2
    assert resolve_channels(2, True, 1) == 1
    assert resolve_channels(2, False, 5) == 5   # >0 passes through verbatim


def test_error_enum_values():
    assert int(AcmError.ERR_OTHER) == -1
    assert int(AcmError.ERR_OPEN) == -2
    assert int(AcmError.ERR_NOT_ACM) == -3
    assert int(AcmError.ERR_READ_ERR) == -4
    assert int(AcmError.ERR_BADFMT) == -5
    assert int(AcmError.ERR_CORRUPT) == -6
    assert int(AcmError.ERR_UNEXPECTED_EOF) == -7
    assert int(AcmError.ERR_NOT_SEEKABLE) == -8
