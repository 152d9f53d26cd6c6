"""Production encoder: operator correctness, ridge analysis quality,
quantizer honesty, and decodability by the compiled C reference."""

import subprocess

import numpy as np
import pytest

from libacm_tpu import encode
from libacm_tpu.scan import oracle
from libacm_tpu.stream import acm_open_decoder


def test_inverse_pass_roundtrip():
    rng = np.random.default_rng(0)
    y0 = rng.integers(-2**31, 2**31, size=(24, 8), dtype=np.int64).astype(np.int32)
    carry = rng.integers(-1000, 1000, size=(2, 8)).astype(np.int32)
    s = encode.inverse_pass(y0, carry.astype(np.uint32))
    full = np.concatenate([carry, s]).astype(np.int32)
    sgn = np.where((np.arange(24) & 1) == 0, 1, -1).astype(np.int32)[:, None]
    y = sgn * (full[2:] + full[:-2]) + 2 * full[1:-1]
    np.testing.assert_array_equal(y, y0)


def test_analysis_inverts_synthesis():
    rng = np.random.default_rng(1)
    level, rows = 4, 12
    cols = 1 << level
    k = rng.integers(-100, 100, (rows, cols)).astype(np.int32)
    wrap = rng.integers(-500, 500, 2 * cols - 2).astype(np.int32)
    words, wrap_out = oracle.synth_block(k, 37, level, wrap)
    x0, wrap_rec = encode.analyze_block(words, level, rows, wrap)
    np.testing.assert_array_equal(x0, (k * 37).reshape(-1))
    np.testing.assert_array_equal(wrap_rec, wrap_out)


def test_forward_matches_integer_synthesis():
    rng = np.random.default_rng(2)
    level, rows = 5, 8
    cols = 1 << level
    x = rng.integers(-300, 300, rows * cols).astype(np.int32)
    want, _ = oracle.synth_block(x.reshape(rows, cols), 1, level,
                                 np.zeros(2 * cols - 2, np.int32))
    got = encode._forward(x.astype(np.float64), level, rows)
    # integer synthesis adds the +1 bias at pass-0 view column 0; the float
    # operator is the pure linear part
    bias = encode._offset(level, rows, np.zeros(2 * cols - 2, np.int32))
    np.testing.assert_allclose(got + bias, want.astype(np.float64))


def test_adjoint_identity():
    rng = np.random.default_rng(3)
    level, rows = 6, 4
    n = rows << level
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    lhs = float(encode._forward(x, level, rows) @ y)
    rhs = float(x @ encode._adjoint(y, level, rows))
    assert abs(lhs - rhs) < 1e-6 * max(1.0, abs(lhs))


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    noise = np.mean((a - b) ** 2)
    return 10 * np.log10(np.mean(a**2) / max(noise, 1e-12))


def _quiet_speech_bytes(seed, level=7, rows=16, nb=6):
    """In-image audio whose decode stays inside int16 (no output wrap)."""
    from libacm_tpu import testing

    rng = np.random.default_rng(seed)
    blocks = testing.speech_blocks(rng, level, rows, nb, base_pwr=5,
                                   decay_cols=6)
    for b in blocks:
        b.val = int(rng.integers(50, 300))
        b.fillers = [testing.choose_filler_best(b.k[:, c])
                     for c in range(b.k.shape[1])]
    return testing.encode_acm(blocks, nb * rows * (1 << level), level=level,
                              rows=rows)


def test_encode_pcm_in_image_content_high_fidelity():
    """PCM that a decoder produced (in-image) re-encodes near-losslessly."""
    data = _quiet_speech_bytes(4)
    _, pcm, _ = oracle.decode_bytes(data)
    res = encode.encode_pcm(pcm, level=7, rows=16, pwr=15)
    _, got, _ = oracle.decode_bytes(res.data)
    assert _snr(pcm, got) > 50.0
    err = int(np.abs(got.astype(np.int32) - pcm.astype(np.int32)).max())
    assert err == res.max_error  # encoder reports the true output error


def test_encode_pcm_tone():
    """Generic content: valid stream, honest error, codec-bound quality."""
    t = np.arange(4 * 2048)
    pcm = (9000 * np.sin(2 * np.pi * t * 440 / 22050)).astype(np.int16)
    res = encode.encode_pcm(pcm, level=7, rows=16, pwr=12)
    _, got, _ = oracle.decode_bytes(res.data)
    assert got.shape == pcm.shape
    assert _snr(pcm, got) > 12.0
    err = int(np.abs(got.astype(np.int32) - pcm.astype(np.int32)).max())
    assert err == res.max_error
    assert len(res.data) < pcm.nbytes // 2  # compresses >2x


def test_partial_final_block_and_stream_api():
    data = _quiet_speech_bytes(6, level=3, rows=10, nb=5)
    _, pcm0, _ = oracle.decode_bytes(data)
    pcm = pcm0[:333]  # not block-aligned
    res = encode.encode_pcm(pcm, level=3, rows=10, pwr=15)
    s = acm_open_decoder(res.data)
    got = np.frombuffer(s.read_loop(10**7), dtype="<i2")
    assert got.shape == pcm.shape
    assert _snr(pcm, got) > 30.0


def test_jax_backend_matches_numpy():
    data = _quiet_speech_bytes(11, nb=3)
    _, pcm, _ = oracle.decode_bytes(data)
    a = encode.encode_pcm(pcm, level=7, rows=16, pwr=13, backend="numpy")
    b = encode.encode_pcm(pcm, level=7, rows=16, pwr=13, backend="jax")
    _, ga, _ = oracle.decode_bytes(a.data)
    _, gb, _ = oracle.decode_bytes(b.data)
    # float32 vs float64 CG may differ in the last quantization bin;
    # both must hit the same quality class
    assert _snr(pcm, ga) > 50 and _snr(pcm, gb) > 50


def test_optimize_acm_lossless_and_smaller():
    rng = np.random.default_rng(7)
    from libacm_tpu import testing

    # fixture made with RANDOM filler choices → lots of slack to reclaim
    data = testing.random_acm_bytes(rng, level=5, rows=20, n_blocks=5)
    out = encode.optimize_acm(data)
    assert len(out) < len(data)
    _, a, _ = oracle.decode_bytes(data)
    _, b, _ = oracle.decode_bytes(out)
    np.testing.assert_array_equal(a, b)
    # already-optimal input comes back unchanged (never grows)
    assert encode.optimize_acm(out) == out


def test_optimize_acm_wavc_and_refusal():
    rng = np.random.default_rng(8)
    from libacm_tpu import testing

    data = testing.random_acm_bytes(rng, level=3, rows=8, n_blocks=3, wavc=True)
    out = encode.optimize_acm(data)
    _, a, _ = oracle.decode_bytes(data)
    _, b, _ = oracle.decode_bytes(out)
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        encode.optimize_acm(data[: len(data) // 2])


def test_c_reference_decodes_our_encodings(ref_acmtool, tmp_path):
    rng = np.random.default_rng(9)
    from libacm_tpu import testing

    cases = {}
    src_pcm = oracle.decode_bytes(
        testing.speech_acm_bytes(rng, level=7, rows=16, n_blocks=4))[1]
    cases["encode_pcm"] = encode.encode_pcm(src_pcm, level=7, rows=16,
                                            pwr=13).data
    cases["optimize"] = encode.optimize_acm(
        testing.random_acm_bytes(rng, level=4, rows=16, n_blocks=4))
    for name, data in cases.items():
        src = tmp_path / f"{name}.acm"
        src.write_bytes(data)
        out = tmp_path / f"{name}.raw"
        subprocess.run([ref_acmtool, "-d", "-r", "-q", "-o", str(out),
                        str(src)], check=True, capture_output=True)
        got = np.frombuffer(out.read_bytes(), dtype="<i2")
        _, ours, _ = oracle.decode_bytes(data)
        np.testing.assert_array_equal(got, ours, err_msg=name)
