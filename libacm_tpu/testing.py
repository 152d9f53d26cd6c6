"""Test-only ACM/WAVC *encoder* for fixture synthesis.

The reference ships no test corpus and game assets cannot be redistributed,
so the framework carries its own bitstream writer: the exact inverse of the
filler grammar the decoder implements (reference:
`/root/reference/src/decode.c:168-502`). It exists to synthesize fixtures
covering every filler, level, row-count edge, channel tagging, WAVC
wrapping, truncation and corruption case — and to generate benchmark
corpora. It is not a production audio encoder (no psychoacoustics; it
encodes given coefficient tensors, or random ones).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .format import ACM_ID

_MAP_1BIT = {-1: 0, +1: 1}
_MAP_2BIT_NEAR = {-2: 0, -1: 1, +1: 2, +2: 3}
_MAP_2BIT_FAR = {-3: 0, -2: 1, +2: 2, +3: 3}
_MAP_3BIT = {-4: 0, -3: 1, -2: 2, -1: 3, +1: 4, +2: 5, +3: 6, +4: 7}


class BitWriter:
    """LSB-first bit packer (inverse of the decoder's reservoir order)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._cur = 0
        self._nbits = 0

    def put(self, value: int, nbits: int) -> None:
        assert 0 <= value < (1 << nbits), (value, nbits)
        self._cur |= value << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._out.append(self._cur & 0xFF)
            self._cur >>= 8
            self._nbits -= 8

    def getvalue(self) -> bytes:
        out = bytes(self._out)
        if self._nbits:
            out += bytes([self._cur & 0xFF])
        return out


# --------------------------------------------------------------------------
# Per-filler column encoders: emit the bit pattern that the corresponding
# decoder filler reads back into exactly `ks`.
# --------------------------------------------------------------------------


def _enc_linear(w: BitWriter, ks, ind: int) -> None:
    middle = 1 << (ind - 1)
    for k in ks:
        w.put(int(k) + middle, ind)


def _enc_pairzero(w: BitWriter, ks, emit_nonzero) -> None:
    """Shared shape of k13/k24/k35/k45: `0`→two zeros, `10`→one zero,
    `11…`→nonzero via emit_nonzero."""
    i, rows = 0, len(ks)
    while i < rows:
        if ks[i] == 0:
            if i + 1 >= rows or ks[i + 1] == 0:
                w.put(0, 1)
                i += 2
            else:
                w.put(0b01, 2)  # bits read LSB-first: 1 then 0
                i += 1
        else:
            w.put(0b11, 2)
            emit_nonzero(w, int(ks[i]))
            i += 1


def _enc_k13(w, ks):
    _enc_pairzero(w, ks, lambda w, k: w.put(_MAP_1BIT[k], 1))


def _enc_k12(w, ks):
    for k in ks:
        if k == 0:
            w.put(0, 1)
        else:
            w.put(1, 1)
            w.put(_MAP_1BIT[int(k)], 1)


def _enc_k24(w, ks):
    _enc_pairzero(w, ks, lambda w, k: w.put(_MAP_2BIT_NEAR[k], 2))


def _enc_k23(w, ks):
    for k in ks:
        if k == 0:
            w.put(0, 1)
        else:
            w.put(1, 1)
            w.put(_MAP_2BIT_NEAR[int(k)], 2)


def _enc_k35(w, ks):
    def nz(w, k):
        if k in _MAP_1BIT:
            w.put(0, 1)
            w.put(_MAP_1BIT[k], 1)
        else:
            w.put(1, 1)
            w.put(_MAP_2BIT_FAR[k], 2)

    _enc_pairzero(w, ks, nz)


def _enc_k34(w, ks):
    for k in ks:
        k = int(k)
        if k == 0:
            w.put(0, 1)
        elif k in _MAP_1BIT:
            w.put(0b01, 2)
            w.put(_MAP_1BIT[k], 1)
        else:
            w.put(0b11, 2)
            w.put(_MAP_2BIT_FAR[k], 2)


def _enc_k45(w, ks):
    _enc_pairzero(w, ks, lambda w, k: w.put(_MAP_3BIT[k], 3))


def _enc_k44(w, ks):
    for k in ks:
        if k == 0:
            w.put(0, 1)
        else:
            w.put(1, 1)
            w.put(_MAP_3BIT[int(k)], 3)


def _enc_t15(w, ks):
    i, rows = 0, len(ks)
    while i < rows:
        g = [int(ks[i + j]) if i + j < rows else 0 for j in range(3)]
        w.put((g[0] + 1) + 3 * (g[1] + 1) + 9 * (g[2] + 1), 5)
        i += 3


def _enc_t27(w, ks):
    i, rows = 0, len(ks)
    while i < rows:
        g = [int(ks[i + j]) if i + j < rows else 0 for j in range(3)]
        w.put((g[0] + 2) + 5 * (g[1] + 2) + 25 * (g[2] + 2), 7)
        i += 3


def _enc_t37(w, ks):
    i, rows = 0, len(ks)
    while i < rows:
        g = [int(ks[i + j]) if i + j < rows else 0 for j in range(2)]
        w.put((g[0] + 5) + 11 * (g[1] + 5), 7)
        i += 2


#: filler index → (encoder, (min_k, max_k)) for non-linear fillers.
_ENCODERS = {
    0: (lambda w, ks: None, (0, 0)),
    17: (_enc_k13, (-1, 1)),
    18: (_enc_k12, (-1, 1)),
    19: (_enc_t15, (-1, 1)),
    20: (_enc_k24, (-2, 2)),
    21: (_enc_k23, (-2, 2)),
    22: (_enc_t27, (-2, 2)),
    23: (_enc_k35, (-3, 3)),
    24: (_enc_k34, (-3, 3)),
    26: (_enc_k45, (-4, 4)),
    27: (_enc_k44, (-4, 4)),
    29: (_enc_t37, (-5, 5)),
}


def encode_column(w: BitWriter, ks, filler: int) -> None:
    """Emit one column: 5-bit filler code + the filler's payload."""
    w.put(filler, 5)
    if 3 <= filler <= 16:
        _enc_linear(w, ks, filler)
    else:
        _ENCODERS[filler][0](w, ks)


def choose_filler_best(ks) -> int:
    """Pick the cheapest filler for `ks` (bit-exact trial encodes).

    Real-world ACM files are near-entropy-coded (the 13 kbps anchor,
    reference util.c:161-162); fixtures made with the randomized
    choose_filler are several times larger. Corpus generators use this.
    """
    lo, hi = int(np.min(ks)), int(np.max(ks))
    if lo == 0 and hi == 0:
        return 0
    cands = [f for f, (_, (flo, fhi)) in _ENCODERS.items()
             if f != 0 and flo <= lo and hi <= fhi]
    for ind in range(3, 17):
        if -(1 << (ind - 1)) <= lo and hi <= (1 << (ind - 1)) - 1:
            cands.append(ind)
            break
    best, best_bits = None, None
    for f in cands:
        w = BitWriter()
        encode_column(w, ks, f)
        bits = len(w._out) * 8 + w._nbits
        if best_bits is None or bits < best_bits:
            best, best_bits = f, bits
    if best is None:
        raise ValueError(f"coefficients out of range: [{lo}, {hi}]")
    return best


def choose_filler(ks, rng: np.random.Generator | None = None) -> int:
    """Pick a filler that can represent `ks` (randomized among candidates)."""
    lo, hi = int(np.min(ks)), int(np.max(ks))
    cands = [f for f, (_, (flo, fhi)) in _ENCODERS.items() if flo <= lo and hi <= fhi]
    # smallest linear filler that covers the range (ind >= 3)
    for ind in range(3, 17):
        if -(1 << (ind - 1)) <= lo and hi <= (1 << (ind - 1)) - 1:
            cands.append(ind)
            break
    if not cands:
        raise ValueError(f"coefficients out of range: [{lo}, {hi}]")
    if rng is None:
        return cands[-1]
    return int(cands[rng.integers(len(cands))])


@dataclasses.dataclass
class BlockData:
    pwr: int  # 4-bit; legal k range is [-2**pwr, 2**pwr - 1]
    val: int  # 16-bit amplitude step
    k: np.ndarray  # int[rows, cols] coefficient indices
    fillers: list[int] | None = None  # per-column; None = auto-choose


def write_header(
    w: BitWriter,
    total_values: int,
    channels: int,
    rate: int,
    level: int,
    rows: int,
) -> None:
    w.put(ACM_ID, 24)
    w.put(1, 8)  # version
    w.put(total_values & 0xFFFF, 16)
    w.put((total_values >> 16) & 0xFFFF, 16)
    w.put(channels, 16)
    w.put(rate, 16)
    w.put(level, 4)
    w.put(rows, 12)


def wavc_wrap(acm_bytes: bytes, raw_size: int | None = None) -> bytes:
    """Prepend the 28-byte WAVC wrapper (decode.c:687-710 checks 'WAVC',
    'V1.0' and word[6]==28; sizes are unchecked)."""
    if raw_size is None:
        raw_size = 0
    w = BitWriter()
    for ch in b"WAVC":
        w.put(ch, 8)
    words = [0x3156, 0x302E, raw_size & 0xFFFF, raw_size >> 16,
             len(acm_bytes) & 0xFFFF, len(acm_bytes) >> 16,
             28, 0, 1, 16, 22050, 0]
    for v in words:
        w.put(v, 16)
    return w.getvalue() + acm_bytes


def encode_acm(
    blocks: list[BlockData],
    total_values: int,
    channels: int = 1,
    rate: int = 22050,
    level: int | None = None,
    rows: int | None = None,
    rng: np.random.Generator | None = None,
) -> bytes:
    """Serialize a full plain-ACM stream (header + blocks)."""
    if level is None:
        level = int(np.log2(blocks[0].k.shape[1]))
    if rows is None:
        rows = blocks[0].k.shape[0]
    w = BitWriter()
    write_header(w, total_values, channels, rate, level, rows)
    for b in blocks:
        w.put(b.pwr, 4)
        w.put(b.val, 16)
        cols = b.k.shape[1]
        for c in range(cols):
            ks = b.k[:, c]
            f = b.fillers[c] if b.fillers is not None else choose_filler(ks, rng)
            encode_column(w, ks, f)
    return w.getvalue()


def random_blocks(
    rng: np.random.Generator,
    level: int,
    rows: int,
    n_blocks: int,
    max_pwr: int = 10,
) -> list[BlockData]:
    """Generate decodable random blocks.

    k values are kept within [-2**pwr, 2**pwr - 1] — indices outside the
    amplitude table are undefined behavior in the reference (it would read
    stale table memory), so conforming encoders never emit them.
    """
    cols = 1 << level
    out = []
    for _ in range(n_blocks):
        pwr = int(rng.integers(0, max_pwr + 1))
        val = int(rng.integers(0, 1 << 16))
        count = 1 << pwr
        k = np.zeros((rows, cols), dtype=np.int32)
        for c in range(cols):
            style = rng.integers(0, 4)
            if style == 0:
                pass  # zero column
            elif style == 1:  # small coefficients, map-filler friendly
                span = min(5, count)
                k[:, c] = rng.integers(-span, min(span, count - 1) + 1, size=rows)
            else:  # wide range → linear fillers
                k[:, c] = rng.integers(-count, count, size=rows)
                k[:, c] = np.clip(k[:, c], -count, count - 1)
            # sprinkle zero runs so pair-zero branches get exercised
            if style == 3:
                mask = rng.random(rows) < 0.6
                k[mask, c] = 0
        out.append(BlockData(pwr=pwr, val=val, k=k))
    return out


def speech_blocks(
    rng: np.random.Generator,
    level: int,
    rows: int,
    n_blocks: int,
    base_pwr: int = 6,
    decay_cols: float = 8.0,
) -> list[BlockData]:
    """Audio-realistic blocks: subband energy decays with frequency.

    Real ACM content (Fallout speech at ~13 kbps, README:82-83 +
    util.c:161-162) has most energy in the low subbands and silent high
    bands; this generator reproduces that shape (Laplacian coefficients
    under an exponential spectral envelope). `decay_cols` sets the
    envelope's 1/e width in columns; larger = denser, music-like content.
    """
    cols = 1 << level
    c_idx = np.arange(cols)
    out = []
    for _ in range(n_blocks):
        pwr = int(np.clip(base_pwr + rng.integers(-2, 3), 1, 15))
        count = 1 << pwr
        tau = decay_cols * (0.5 + rng.random())
        env = count * np.exp(-c_idx / max(tau, 1e-6))
        k = rng.laplace(0.0, np.maximum(env[None, :] / 3.0, 1e-9),
                        size=(rows, cols))
        k = np.clip(np.round(k), -count, count - 1).astype(np.int32)
        k[:, env < 1.0] = 0  # subthreshold bands are silent
        out.append(BlockData(pwr=pwr, val=int(rng.integers(100, 2000)), k=k))
    return out


def speech_acm_bytes(
    rng: np.random.Generator,
    level: int = 7,
    rows: int = 16,
    n_blocks: int = 8,
    channels: int = 1,
    rate: int = 22050,
    base_pwr: int = 6,
    decay_cols: float = 8.0,
    wavc: bool = False,
) -> bytes:
    """One-call audio-realistic fixture stream (see speech_blocks).

    Uses the cheapest covering filler per column, like real encoders —
    the randomized chooser (fixture coverage) inflates bitrates ~3x.
    """
    blocks = speech_blocks(rng, level, rows, n_blocks, base_pwr=base_pwr,
                           decay_cols=decay_cols)
    for b in blocks:
        b.fillers = [choose_filler_best(b.k[:, c]) for c in range(b.k.shape[1])]
    data = encode_acm(blocks, n_blocks * rows * (1 << level),
                      channels=channels, rate=rate, level=level, rows=rows)
    return wavc_wrap(data) if wavc else data


def random_acm_bytes(
    rng: np.random.Generator,
    level: int = 4,
    rows: int = 128,
    n_blocks: int = 4,
    channels: int = 1,
    rate: int = 22050,
    total_values: int | None = None,
    wavc: bool = False,
    max_pwr: int = 10,
) -> bytes:
    """One-call random fixture stream."""
    blocks = random_blocks(rng, level, rows, n_blocks, max_pwr=max_pwr)
    words = n_blocks * rows * (1 << level)
    if total_values is None:
        total_values = words
    data = encode_acm(
        blocks, total_values, channels=channels, rate=rate, level=level,
        rows=rows, rng=rng,
    )
    if wavc:
        data = wavc_wrap(data)
    return data
