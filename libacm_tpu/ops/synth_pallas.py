"""Fused Pallas TPU kernel for the synthesis filterbank.

One kernel fuses what the reference splits across three loops
(`/root/reference/src/decode.c`: amp-table dequant 591-599, juggle passes
508-577, PCM shift 617-625): dequantize k·val → log2(cols) FIR passes
(+1 rounding bias after pass 0) → arithmetic >> level → int16, entirely in
VMEM. The XLA path (ops.synth_jax) materializes every pass to HBM
(~4·level bytes/sample of traffic); this kernel reads k (int16) and writes
PCM (int16) exactly once — speed-of-light HBM traffic for the op.

Key layout trick: pass p's FIR on the (sub_count, sub_len) view is, on the
*flat* block index f with s = sub_len = cols >> (p+1),

    y[f] = sign(f//s) * (x[f] + x[f-2s]) + 2*x[f-s]

so instead of reshaping the tile per pass (Mosaic cannot shape-cast
arbitrarily), the block stays one [R, C] register tile over the flat index
(R·C = rows·cols) and each pass is two flat shifts. A flat shift by
s = q·C + r is a lane roll by r plus a row roll by q or q+1 selected by
lane index — pure VPU work with no relayouts. For cols <= 128 the natural
C = cols (R = rows); for larger cols the flat block is viewed as
C = 128 lanes x R = rows·cols/128 rows, which makes every level work with
the same kernel: the per-pass halo (x[-2s..-1], the reference's wrapbuf
segment) occupies the tail of H = cols/C extra rows prepended per pass
(2s <= cols = H·C always).

Grid = (files, blocks). TPU grids execute sequentially (last axis fastest),
so the inter-block carry lives in VMEM scratch [level, H, C] persisting
across the block axis: scratch[p] holds the last H flat rows of pass p's
input from the previous block (its tail 2·sub_len elements are the live
halo; the rest is never read). Host-side helpers convert to/from the
reference's packed wrapbuf layout ([2*cols-2], decode.c:803).

Constraints: level >= 1 and rows*cols*4 within a VMEM budget (huge
geometries — high level x high rows — fall back to the XLA path). All
arithmetic is int32 two's-complement (wrapping) as the format requires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .synth_jax import _wrap_layout, synth_pcm_batch

_LANES = 128
#: int32 elements per block tile above which we fall back to XLA (the
#: kernel holds ~3 tile copies in VMEM; 256K elems = 3 MiB comfortably
#: fits every production TPU's VMEM alongside double-buffered IO).
_MAX_TILE_ELEMS = 256 * 1024


def _flat_shift(x_ext: jax.Array, s: int, lane: jax.Array, C: int) -> jax.Array:
    """y[f] = x_ext[f - s] over the flat row-major index of [Rt, C].

    Positions f < s (within the halo region) read wrapped garbage from the
    bottom rows — callers prepend halo rows so real outputs never use them.
    """
    q, r = divmod(s, C)
    if r == 0:
        return pltpu.roll(x_ext, q, 0)
    a = pltpu.roll(x_ext, r, 1)  # a[row, c] = x[row, (c - r) mod C]
    lo = a if q == 0 else pltpu.roll(a, q, 0)
    hi = pltpu.roll(a, q + 1, 0)  # previous-row source for wrapped lanes
    return jnp.where(lane >= r, lo, hi)


def _kernel(k_ref, valr_ref, wrap0_ref, pcm_ref, wrapf_ref, wrap_sc,
            *, level: int, rows: int, H: int, C: int, T: int):
    cols = 1 << level
    n = rows * cols
    R = n // C  # flat rows per block
    TR = T * R  # flat rows per grid step (T consecutive blocks)
    i = pl.program_id(1)
    nsteps = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        wrap_sc[:] = wrap0_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (TR + H, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (TR + H, C), 0)
    flat = (row - H) * C + lane  # flat index of the non-halo region

    # T blocks concatenated along the flat axis ARE the stream: every
    # pass-p view of consecutive blocks stacks along its row axis (strip
    # re-blocking invariance, SURVEY §2.6), so one tile juggles T blocks
    # with the scratch carry crossing only the tile boundary. The
    # per-block dequant vals arrive pre-expanded per flat row.
    x = k_ref[0].reshape(TR, C).astype(jnp.int32) * valr_ref[0]
    for p in range(level):
        s = cols >> (p + 1)
        halo = wrap_sc[p]  # [H, C]; tail 2s elements are live
        new_halo = x[TR - H :, :]
        xe = jnp.concatenate([halo, x], axis=0)  # [TR+H, C]
        x1 = _flat_shift(xe, s, lane, C)
        x2 = _flat_shift(xe, 2 * s, lane, C)  # 2s == cols at p=0
        # sign of (flat // s): n % 2s == 0, so the pattern is per-block
        # consistent across the concatenated tile
        sign = 1 - 2 * ((flat >> (level - 1 - p)) & 1)
        y = sign * (xe + x2) + 2 * x1
        if p == 0:
            y = y + ((flat & (s - 1)) == 0).astype(jnp.int32)
        wrap_sc[p] = new_halo
        x = y[H:, :]

    pcm_ref[0] = (x >> level).astype(jnp.int16).reshape(T, R, C)

    @pl.when(i == nsteps - 1)
    def _():
        wrapf_ref[0] = wrap_sc[:]


def _geometry(level: int, rows: int) -> tuple[int, int]:
    """(H, C): lane width C and halo rows H = ceil(cols/C) for the tile.

    Full 128-lane tiles whenever rows*cols divides by 128 — a cols=16
    block at C=cols would drive 16 of 128 VPU lanes (the round-2 shootout
    loss); flat-viewing as [n/128, 128] works for every level because the
    pass shifts act on the flat index, and one halo row (>= cols >= 2s
    live tail elements) suffices for cols <= 128.
    """
    cols = 1 << level
    if cols > _LANES:
        return cols // _LANES, _LANES
    assert (rows * cols) % _LANES == 0  # pallas_supported gates this
    return 1, _LANES


def _blocks_per_step(level: int, rows: int, nb: int) -> int:
    """Largest power-of-two divisor of nb with tile size <= ~64K elems.

    TPU grids run sequentially; a 2048-element block per step leaves the
    VPU idle between steps (the other round-2 shootout loss). Batching T
    consecutive blocks per step amortizes the grid and keeps the carry
    chain exact (it rides inside the tile; scratch crosses steps).
    """
    n = rows << level
    t = max(1, (64 * 1024) // n)
    t = 1 << (t.bit_length() - 1)
    while t > 1 and (nb % t or t * n > _MAX_TILE_ELEMS):
        t //= 2
    return t


def wrapbuf_to_rowbuf(wrap: jax.Array, level: int, rows: int) -> jax.Array:
    """Reference wrapbuf [..., 2*cols-2] → kernel halo buffer
    [..., level, H, C].

    Pass p's segment (length 2*sub_len) lands in the tail of its
    flattened H·C-element halo (H·C >= cols >= 2*sub_len); the head is
    scratch the kernel never reads (zero-filled).
    """
    cols = 1 << level
    H, C = _geometry(level, rows)
    lead = wrap.shape[:-1]
    out = jnp.zeros(lead + (level, H * C), wrap.dtype)
    for p, (off, sub_len, _) in enumerate(_wrap_layout(level, cols)):
        seg = wrap[..., off : off + 2 * sub_len]
        out = out.at[..., p, H * C - 2 * sub_len :].set(seg)
    return out.reshape(lead + (level, H, C))


def rowbuf_to_wrapbuf(buf: jax.Array, level: int) -> jax.Array:
    """Inverse of wrapbuf_to_rowbuf (drops the dead head of each halo)."""
    cols = 1 << level
    lead = buf.shape[:-3]
    hc = buf.shape[-2] * buf.shape[-1]
    flat = buf.reshape(lead + (level, hc))
    segs = []
    for p, (off, sub_len, _) in enumerate(_wrap_layout(level, cols)):
        segs.append(flat[..., p, hc - 2 * sub_len :])
    return jnp.concatenate(segs, axis=-1)


def pallas_supported(level: int, rows: int) -> bool:
    """Geometries the fused kernel covers (others use the XLA path).

    rows*cols must divide by 128: the tile is always C = 128 lanes wide
    (a narrower C = cols tile would waste most of the VPU AND hits a
    Mosaic "unsupported shape cast" on real TPUs — found by the on-HW
    parity sweep; interpreter mode accepted it silently).
    """
    n = rows * (1 << level)
    return 1 <= level <= 15 and 0 < n <= _MAX_TILE_ELEMS and n % _LANES == 0


@functools.partial(jax.jit, static_argnames=("level", "rows"))
def synth_pcm_pallas(
    k: jax.Array,  # int16 [B, nb, rows, cols]
    vals: jax.Array,  # int32 [B, nb]
    wrap0: jax.Array,  # int32 [B, 2*cols-2]
    *,
    level: int,
    rows: int,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.synth_jax.synth_pcm_batch (bit-identical results).

    Returns (pcm int16 [B, nb, rows*cols], final wrap [B, 2*cols-2]).
    """
    B, nb = k.shape[0], k.shape[1]
    cols = 1 << level
    n = rows * cols

    if nb == 0 or not pallas_supported(level, rows):
        # level 0: dequant+shift only; oversized tiles: XLA path
        return synth_pcm_batch(k, vals, wrap0, level=level, rows=rows)

    H, C = _geometry(level, rows)
    R = n // C
    T = _blocks_per_step(level, rows, nb)
    # per-flat-row dequant vals (tiny: nb*R int32/file) — computed by XLA
    # so the kernel multiplies a [TR, 1] column against the [TR, C] tile
    # without any per-row dynamic indexing
    valr = jnp.repeat(vals.astype(jnp.int32), R, axis=1)[..., None]
    grid_spec = pl.GridSpec(
        grid=(B, nb // T),
        in_specs=[
            pl.BlockSpec((1, T, R, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T * R, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, level, H, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, R, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, level, H, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((level, H, C), jnp.int32)],
    )
    kernel = functools.partial(_kernel, level=level, rows=rows, H=H, C=C,
                               T=T)
    pcm, rowf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, nb, R, C), jnp.int16),
            jax.ShapeDtypeStruct((B, level, H, C), jnp.int32),
        ),
    )(k.reshape(B, nb, R, C), valr,
      wrapbuf_to_rowbuf(wrap0, level, rows))
    return pcm.reshape(B, nb, n), rowbuf_to_wrapbuf(rowf, level)
