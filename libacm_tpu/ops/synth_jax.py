"""JAX synthesis back-end: dequantize + subband filterbank + PCM format.

TPU-native reformulation of the reference's `juggle_block`
(`/root/reference/src/decode.c:508-577`): each of the log2(cols) passes is a
pure order-2 FIR over its *raw* inputs (SURVEY §2.6, simulation-verified),

    y[n] = s[n] + 2*s[n-1] + s[n-2]     (n even)
    y[n] = 2*s[n-1] - s[n-2] - s[n]     (n odd)

so a pass over the whole block is three shifted adds — no recurrence, no
strip loop (the reference's strips are a CPU cache artifact and provably do
not change results). Pass p views the flat rows*cols block as
(rows<<(p+1), cols>>(p+1)); s[-2], s[-1] come from the pass's segment of the
persistent inter-block carry `wrapbuf` (2*cols-2 ints). After pass 0 only,
+1 is added to element 0 of each pass-0 row (rounding bias,
decode.c:561-565); with level == 0 there is no pass and no bias
(decode.c:534-535).

**No serial scan over blocks.** The reference threads `wrapbuf` serially
from block to block, but because every pass is an FIR on *raw* (pre-output)
inputs, block i's pass-p carry is simply the last two rows of block i-1's
pass-p *input* — which is already known once pass p-1 has run for all
blocks. So the whole stream synthesizes as `level` fully-parallel steps:

    x_0 = k * val                    (all blocks at once)
    x_{p+1}[i] = FIR(x_p[i],  carry = x_p[i-1].last_two_rows)

This converts the reference's inherently-serial-looking carry chain into
pure data parallelism over blocks × files — the single most important
transformation for the TPU mapping (everything is one big elementwise
program, no `lax.scan`, no sequential dependency at all).

All arithmetic is int32 with two's-complement wraparound and the final
`>> level` is an arithmetic shift — the bit-exact contract of the format
(no saturation anywhere; decode.c:617-625).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..scan.oracle import ScanResult


def _wrap_layout(level: int, cols: int) -> list[tuple[int, int, int]]:
    """Static per-pass geometry: (wrap_offset, sub_len, sub_count_factor).

    Pass p's wrap segment has length 2*sub_len; segments are laid out
    consecutively (total 2*cols-2, decode.c:803).
    """
    out = []
    off = 0
    for p in range(level):
        sub_len = cols >> (p + 1)
        out.append((off, sub_len, 1 << (p + 1)))
        off += 2 * sub_len
    return out


def _signs(cnt: int) -> jnp.ndarray:
    """FIR sign pattern down a pass row axis: +1 even rows, -1 odd rows."""
    return jnp.asarray(
        np.where((np.arange(cnt) & 1) == 0, 1, -1).astype(np.int32)
    )


@functools.partial(jax.jit, static_argnames=("level", "rows"))
def synth_words(
    k: jax.Array,  # int16/int32 [nb, rows, cols] coefficient indices
    vals: jax.Array,  # int32 [nb] per-block amplitude step
    wrap0: jax.Array,  # int32 [2*cols-2] initial carry (zeros at stream start)
    *,
    level: int,
    rows: int,
) -> tuple[jax.Array, jax.Array]:
    """Synthesize all blocks of one stream — every pass parallel over blocks.

    Returns (words int32 [nb, rows*cols] pre-shift, final wrap carry).
    vmap over a leading file axis for batched corpora.
    """
    cols = 1 << level
    n = rows * cols
    nb = k.shape[0]
    if nb == 0:
        return jnp.zeros((0, n), jnp.int32), wrap0

    x = (k.astype(jnp.int32) * vals.astype(jnp.int32)[:, None, None]).reshape(nb, n)
    segs = []
    for p, (off, sub_len, f) in enumerate(_wrap_layout(level, cols)):
        cnt = rows * f
        mat = x.reshape(nb, cnt, sub_len)
        # carry for block i = last two raw rows of block i-1's pass-p input;
        # block 0 takes the stream carry's pass-p segment (wrapbuf semantics)
        seg0 = wrap0[off : off + 2 * sub_len].reshape(1, 2, sub_len)
        prev = jnp.concatenate([seg0, mat[:-1, -2:, :]], axis=0)
        s = jnp.concatenate([prev, mat], axis=1)  # [nb, cnt+2, sub_len]
        y = _signs(cnt)[None, :, None] * (s[:, 2:] + s[:, :-2]) + 2 * s[:, 1:-1]
        if p == 0:
            y = y.at[:, :, 0].add(1)  # rounding bias (decode.c:561-565)
        segs.append(mat[-1, -2:, :].reshape(-1))
        x = y.reshape(nb, n)
    wrap_f = jnp.concatenate(segs) if segs else wrap0
    return x, wrap_f


@functools.partial(jax.jit, static_argnames=("level",))
def words_to_pcm(words: jax.Array, *, level: int) -> jax.Array:
    """int32 words → int16 samples (arithmetic >> level, low 16 bits)."""
    return (words >> level).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("level", "rows"))
def synth_pcm(
    k: jax.Array, vals: jax.Array, wrap0: jax.Array, *, level: int, rows: int
) -> tuple[jax.Array, jax.Array]:
    """Fused synth + PCM formatting: int16 [nb, rows*cols] + final carry."""
    words, wrap_f = synth_words(k, vals, wrap0, level=level, rows=rows)
    return words_to_pcm(words, level=level), wrap_f


@functools.partial(jax.jit, static_argnames=("level", "rows"))
def synth_pcm_batch(
    k: jax.Array,  # [B, nb, rows, cols]
    vals: jax.Array,  # [B, nb]
    wrap0: jax.Array,  # [B, 2*cols-2]
    *,
    level: int,
    rows: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched corpora: vmap the per-stream synth over the file axis."""
    fn = functools.partial(synth_pcm, level=level, rows=rows)
    return jax.vmap(fn)(k, vals, wrap0)


def carry_of_block(
    k: jax.Array,  # int16/int32 [rows, cols] — block i-1's coefficients
    val: jax.Array,  # scalar int32
    *,
    level: int,
    rows: int,
) -> jax.Array:
    """Exact wrap carry left behind by a block, from that block alone.

    For rows >= 2, the carry tail of every pass depends only on the
    block's own data: the incoming carry pollutes only the first
    2*sub_len elements of each pass output, while the outgoing carry is
    the last 2*sub_len elements of each pass *input* — the regions never
    overlap (block_len >= cols + cols/2 whenever rows >= 2). Synthesizing
    one block with a zero carry therefore yields the true carry state,
    enabling O(1) random access into any stream (SURVEY §7.3.5): to decode
    blocks [a, b), synthesize block a-1 with zero carry for its wrap, then
    [a, b) with it. Callers must check rows >= 2 (or a == 0).
    """
    cols = 1 << level
    wrap0 = jnp.zeros(max(2 * cols - 2, 1), jnp.int32)
    _, wrap = synth_words(k[None], val.reshape(1), wrap0, level=level,
                          rows=rows)
    return wrap


@functools.partial(
    jax.jit, static_argnames=("level", "rows", "batch", "nb")
)
def synth_pcm_packed(
    p4: jax.Array, p8: jax.Array, p16: jax.Array,
    idx4: jax.Array, idx8: jax.Array, idx16: jax.Array,
    vals: jax.Array,  # [batch, nb]
    wrap0: jax.Array,  # [batch, 2*cols-2]
    *,
    level: int,
    rows: int,
    batch: int,
    nb: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched synth from wire-packed coefficients (see ops.packing).

    The blocks of all files in the batch are packed as one flat
    [batch*nb] pool; unpacking happens on device so only the packed
    payloads cross the host↔device link.
    """
    from .packing import unpack_blocks

    cols = 1 << level
    k = unpack_blocks(
        p4, p8, p16, idx4, idx8, idx16, nb=batch * nb, rows=rows, cols=cols
    ).reshape(batch, nb, rows, cols)
    fn = functools.partial(synth_pcm, level=level, rows=rows)
    return jax.vmap(fn)(k, vals, wrap0)


@functools.partial(
    jax.jit, static_argnames=("level", "rows", "batch", "nb", "backend")
)
def synth_pcm_cols(
    cls: jax.Array,  # uint8 [batch, nb, ceil(cols/4)] 2-bit-packed classes
    pay4: jax.Array, pay8: jax.Array, pay16: jax.Array,  # uint8 bit streams
    wid4: jax.Array, wid8: jax.Array, wid16: jax.Array,  # width nibbles
    vals: jax.Array,  # [batch, nb]
    wrap0: jax.Array,  # [batch, 2*cols-2]
    *,
    level: int,
    rows: int,
    batch: int,
    nb: int,
    backend: str = "jax",
) -> tuple[jax.Array, jax.Array]:
    """Batched synth from the exact-width per-column wire (scanner v2).

    The C++ scanner emits each nonzero column as rows*w bits at its
    filler's wire width, grouped into three class-family bit streams plus
    width nibbles and a 2-bit/column class map — the minimal link bytes
    short of entropy coding. Unpack (cumsum + 16-bit-window gathers) and
    synthesis fuse into one device program. backend="pallas" runs the
    filterbank through the fused VMEM kernel (ops.synth_pallas) instead
    of the XLA pass chain.
    """
    from .packing import unpack_columns

    cols = 1 << level
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    codes = (cls[..., None] >> shifts) & 3  # [batch, nb, stride, 4]
    codes = codes.reshape(batch, nb, -1)[..., :cols]
    k_cols = unpack_columns(
        codes.reshape(batch * nb * cols), pay4, pay8, pay16,
        wid4, wid8, wid16, rows=rows
    )  # [batch*nb*cols, rows]
    k = k_cols.reshape(batch, nb, cols, rows).transpose(0, 1, 3, 2)
    if backend == "pallas":
        from .synth_pallas import synth_pcm_pallas

        return synth_pcm_pallas(k, vals, wrap0, level=level, rows=rows)
    fn = functools.partial(synth_pcm, level=level, rows=rows)
    return jax.vmap(fn)(k, vals, wrap0)


def cols_blob_layout(level: int, batch: int, nb: int,
                     lens: tuple[int, int, int, int, int, int],
                     has_wrap: bool = True):
    """Byte offsets of each wire section inside the coalesced blob.

    Returns ([(off, size) per section in synth_pcm_cols arg order],
    total). All sizes are static per compiled program (the same values
    that shaped the separate arrays), so the device-side slices are
    static too. has_wrap=False omits the trailing wrap0 section (the
    streaming decode carries wrap on device between chunks).
    """
    cols = 1 << level
    stride = (cols + 3) // 4
    wlen = 2 * cols - 2
    l4, l8, l16, lw4, lw8, lw16 = lens
    sizes = [batch * nb * stride, l4, l8, l16, lw4, lw8, lw16,
             2 * batch * nb]
    if has_wrap:
        sizes.append(4 * batch * wlen)
    out, off = [], 0
    for sz in sizes:
        out.append((off, sz))
        off += sz
    return out, off


def _bytes_le(b: jax.Array, n: int, out_dtype) -> jax.Array:
    """Reassemble little-endian n-byte ints from a flat uint8 array.

    Manual byte math instead of bitcast_convert_type: explicit
    endianness, no alignment constraint on the blob slice.
    """
    parts = b.reshape(-1, n).astype(jnp.uint32)
    u = parts[:, 0]
    for i in range(1, n):
        u = u | (parts[:, i] << (8 * i))
    if out_dtype == jnp.int32:  # value-preserving bit pattern, not clamp
        return jax.lax.bitcast_convert_type(u, jnp.int32)
    return u.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("level", "rows", "batch", "nb", "backend",
                              "lens")
)
def synth_pcm_cols_blob(
    blob: jax.Array,  # uint8 [total]: all wire sections coalesced
    wrap0: jax.Array | None = None,  # int32 [batch, 2*cols-2] carry-in
    *,
    level: int,
    rows: int,
    batch: int,
    nb: int,
    backend: str = "jax",
    lens: tuple[int, int, int, int, int, int] = (),
) -> tuple[jax.Array, jax.Array]:
    """synth_pcm_cols over ONE coalesced uint8 wire blob.

    The relay transport pays a large fixed cost per transferred array
    (measured: a tuple device_put of nine arrays costs ~2x one
    contiguous array of the same bytes), so the host packs the whole
    chunk's wire into a single buffer and the sections are sliced back
    out on device at static offsets. vals (uint16) and wrap0 (int32)
    are reassembled from little-endian bytes. An explicit wrap0 array
    (the streaming decode's on-device carry) replaces the blob's wrap
    section, which must then be absent.
    """
    cols = 1 << level
    stride = (cols + 3) // 4
    wlen = 2 * cols - 2
    secs, total = cols_blob_layout(level, batch, nb, lens,
                                   has_wrap=wrap0 is None)
    assert blob.shape == (total,)
    parts = [blob[o : o + n] for o, n in secs]
    cls = parts[0].reshape(batch, nb, stride)
    vals = _bytes_le(parts[7], 2, jnp.uint16).reshape(batch, nb)
    if wrap0 is None:
        wrap0 = _bytes_le(parts[8], 4, jnp.int32).reshape(batch, wlen)
    return synth_pcm_cols(
        cls, *parts[1:7], vals, wrap0,
        level=level, rows=rows, batch=batch, nb=nb, backend=backend,
    )


# Padded-shape cache so per-stream decode doesn't recompile for every block
# count: nb is padded to the next power of two (garbage blocks are synthesized
# beyond the real ones and sliced off — harmless, the carry chain only ever
# flows forward).


def _pad_nb(nb: int) -> int:
    p = 1
    while p < nb:
        p *= 2
    return p


def decode_scan_result(scan: ScanResult, backend: str = "auto") -> np.ndarray:
    """Host wrapper: ScanResult → int16 PCM words (numpy, unclamped).

    Output covers the scanned blocks only; callers apply total_values /
    channel clamping (stream layer). backend="auto" uses the native host
    synth when available (streaming consumers want PCM bytes on the host;
    a device round-trip is pure waste) and XLA otherwise; "jax"/"pallas"
    force device synthesis, "host" requires the native path.
    """
    h = scan.header
    nb = scan.n_blocks
    if nb == 0:
        return np.zeros(0, dtype=np.int16)
    if scan.n_exceptions:
        # stale-amp-table stream (out-of-range coefficient indexes): only
        # the oracle's virtual table reproduces the reference exactly
        from ..scan import oracle as _oracle

        return _oracle.words_to_pcm(_oracle.synth_all(scan), h.level)
    if backend in ("auto", "host"):
        from ..scan import native as _native

        if _native.available():
            pcm, _ = _native.synth_dense(scan.k, scan.val, h.level, h.rows)
            return pcm.reshape(-1)
        if backend == "host":
            raise RuntimeError("native host synth unavailable")
        backend = "jax"
    nbp = _pad_nb(nb)
    k = scan.k
    vals = scan.val.astype(np.int32)
    if nbp != nb:
        k = np.concatenate(
            [k, np.zeros((nbp - nb,) + k.shape[1:], dtype=k.dtype)], axis=0
        )
        vals = np.concatenate([vals, np.zeros(nbp - nb, dtype=np.int32)])
    wrap0 = jnp.zeros(h.wrapbuf_len, dtype=jnp.int32)
    if backend == "pallas":
        from .synth_pallas import synth_pcm_pallas

        pcm, _ = synth_pcm_pallas(
            jnp.asarray(k)[None], jnp.asarray(vals)[None], wrap0[None],
            level=h.level, rows=h.rows,
        )
        pcm = pcm[0]
    else:
        pcm, _ = synth_pcm(
            jnp.asarray(k), jnp.asarray(vals), wrap0, level=h.level, rows=h.rows
        )
    return np.asarray(jax.device_get(pcm[:nb])).reshape(-1)
