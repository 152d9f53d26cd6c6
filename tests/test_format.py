"""format.py unit tests."""

import pathlib

from libacm_tpu.format import (
    AcmError,
    AcmHeader,
    acm_strerror,
    is_acm,
    resolve_channels,
    sniff,
    sniff_bytes,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


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


def test_sniff_bytes_typefind():
    """Content sniffing, the typefind analog (plugin-gstreamer.c:159-170,
    plugin-xmms2.c:239-247)."""
    assert sniff_bytes(b"\x97\x28\x03\x01rest") == (True, False)
    assert sniff_bytes(b"\x97\x28\x03") == (True, False)  # 3-byte match
    assert sniff_bytes(b"\x97\x28\x03\x02") == (False, False)  # bad version
    assert sniff_bytes(b"WAVCV1.0" + b"\x97\x28\x03\x01") == (False, True)
    assert sniff_bytes(b"WAVCV2.0") == (False, False)
    assert sniff_bytes(b"WAVC") == (False, False)  # too short to be WAVC
    assert sniff_bytes(b"") == (False, False)
    assert sniff_bytes(b"RIFF....WAVE") == (False, False)
    assert is_acm(b"\x97\x28\x03\x01")
    assert is_acm(b"WAVCV1.0")
    assert not is_acm(b"\x00\x00\x00")


def test_sniff_fixture_files():
    acm, wavc = sniff(FIXTURES / "speech_22k_mono.acm")
    assert (acm, wavc) == (True, False)
    acm, wavc = sniff(FIXTURES / "wavc_22k.acm")
    assert (acm, wavc) == (False, True)


def test_walk_acm_by_content(tmp_path):
    """walk_acm finds payloads by magic regardless of extension."""
    from libacm_tpu.ingest import walk_acm

    (tmp_path / "sub").mkdir()
    plain = (FIXTURES / "speech_22k_mono.acm").read_bytes()
    wavc = (FIXTURES / "wavc_22k.acm").read_bytes()
    (tmp_path / "a.acm").write_bytes(plain)
    (tmp_path / "sub" / "b.dat").write_bytes(plain)     # wrong extension
    (tmp_path / "sub" / "c.acm").write_bytes(b"not audio")  # wrong content
    (tmp_path / "d.wavc").write_bytes(wavc)
    (tmp_path / "empty").write_bytes(b"")
    got = [p.name for p in walk_acm(tmp_path)]
    assert got == ["a.acm", "d.wavc", "b.dat"]
