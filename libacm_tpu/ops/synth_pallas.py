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
arbitrarily), the block stays a [rows, cols] tile and each pass is two
flat shifts — a lane roll plus a row roll with a lane-index select —
pure VPU work with no relayouts. The halo (x[-2s..-1], the reference's
wrapbuf segment) occupies the tail of one extra row prepended per pass.

Grid = (files, blocks). TPU grids execute sequentially (last axis fastest),
so the inter-block carry lives in VMEM scratch [level, 1, cols] persisting
across the block axis: scratch[p] holds the last flat row of pass p's
input from the previous block (its tail 2·sub_len elements are the live
halo; the rest is never read). Host-side helpers convert to/from the
reference's packed wrapbuf layout ([2*cols-2], decode.c:803).

Constraints: 1 <= level <= 7 (cols <= 128 so a flat row is one register
row). Larger cols fall back to the XLA path. All arithmetic is int32
two's-complement (wrapping) as the format requires.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .synth_jax import _wrap_layout, synth_pcm_batch


def _flat_shift(x_ext: jax.Array, s: int, lane: jax.Array) -> jax.Array:
    """y[f] = x_ext[f - s] over the flat row-major index of [R, C].

    Valid for 0 < s < C. Positions f < s read wrapped garbage from the last
    row — callers prepend a halo row so those positions are never used.
    """
    a = pltpu.roll(x_ext, s, 1)  # a[r, c] = x[r, (c - s) mod C]
    b = pltpu.roll(a, 1, 0)  # previous-row version for lanes that wrapped
    return jnp.where(lane >= s, a, b)


def _kernel(val_sref, k_ref, wrap0_ref, pcm_ref, wrapf_ref, wrap_sc,
            *, level: int, rows: int):
    cols = 1 << level
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        wrap_sc[:] = wrap0_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows + 1, cols), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows + 1, cols), 0)
    flat = (row - 1) * cols + lane  # flat index of the non-halo region

    x = k_ref[0, 0].astype(jnp.int32) * val_sref[b, i]
    for p in range(level):
        s = cols >> (p + 1)
        halo = wrap_sc[p]  # [1, cols]; tail 2s elements are live
        new_halo = x[rows - 1 :, :]
        xe = jnp.concatenate([halo, x], axis=0)  # [rows+1, cols]
        x1 = _flat_shift(xe, s, lane)
        # 2s == cols only at pass 0: a full-row shift
        x2 = _flat_shift(xe, 2 * s, lane) if 2 * s < cols else pltpu.roll(xe, 1, 0)
        sign = 1 - 2 * ((flat >> (level - 1 - p)) & 1)
        y = sign * (xe + x2) + 2 * x1
        if p == 0:
            y = y + ((flat & (s - 1)) == 0).astype(jnp.int32)
        wrap_sc[p] = new_halo
        x = y[1:, :]

    pcm_ref[0, 0] = (x >> level).astype(jnp.int16)

    @pl.when(i == nb - 1)
    def _():
        wrapf_ref[0] = wrap_sc[:]


def wrapbuf_to_rowbuf(wrap: jax.Array, level: int) -> jax.Array:
    """Reference wrapbuf [..., 2*cols-2] → kernel row buffer [..., level, 1, cols].

    Pass p's segment (length 2*sub_len) lands in the tail of its row; the
    head is scratch the kernel never reads (zero-filled).
    """
    cols = 1 << level
    lead = wrap.shape[:-1]
    out = jnp.zeros(lead + (level, 1, cols), wrap.dtype)
    for p, (off, sub_len, _) in enumerate(_wrap_layout(level, cols)):
        seg = wrap[..., off : off + 2 * sub_len]
        out = out.at[..., p, 0, cols - 2 * sub_len :].set(seg)
    return out


def rowbuf_to_wrapbuf(buf: jax.Array, level: int) -> jax.Array:
    """Inverse of wrapbuf_to_rowbuf (drops the dead head of each row)."""
    cols = 1 << level
    segs = []
    for p, (off, sub_len, _) in enumerate(_wrap_layout(level, cols)):
        segs.append(buf[..., p, 0, cols - 2 * sub_len :])
    return jnp.concatenate(segs, axis=-1)


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

    if level == 0 or cols > 128 or nb == 0:
        # level 0: dequant+shift only; cols>128: per-row layout trick needs
        # a flat row per register row — use the XLA path
        return synth_pcm_batch(k, vals, wrap0, level=level, rows=rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, rows, cols), lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, level, 1, cols), lambda b, i, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rows, cols), lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, level, 1, cols), lambda b, i, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((level, 1, cols), jnp.int32)],
    )
    kernel = functools.partial(_kernel, level=level, rows=rows)
    pcm, rowf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, nb, rows, cols), jnp.int16),
            jax.ShapeDtypeStruct((B, level, 1, cols), jnp.int32),
        ),
    )(vals.astype(jnp.int32), k, wrapbuf_to_rowbuf(wrap0, level))
    return pcm.reshape(B, nb, n), rowbuf_to_wrapbuf(rowf, level)
