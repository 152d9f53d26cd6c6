"""Corpus-scale batched decode: vmap over files, shard over TPU chips.

This layer is new capability the reference never had (it is a strictly
file-at-a-time C library, `/root/reference/src/decode.c:758-893`): decode
thousands of ACM/WAVC files as one data-parallel program. Per SURVEY §2.3,
files are fully independent, so the parallelization is:

  host:   scan every file's serial bitstream into dense coefficient
          tensors (oracle or C++ scanner), bucket files by (level, rows)
          — the static shape key — and pad each bucket to
          [B, nb_max, rows, cols];
  device: one jitted dispatch per bucket: dequant + filterbank + >>level
          (ops.synth_jax.synth_pcm_batch), batch axis sharded over a
          1-D `files` mesh via NamedSharding — XLA partitions the whole
          program with zero collectives (embarrassingly parallel);
  host:   per-file slice/clamp with the reference's exact stop semantics
          (total_values clamp + channel-multiple clamp, decode.c:848-857)
          and per-file error isolation (a corrupt file yields a status,
          never kills the batch).

Per-file error/EOF semantics mirror the reference *CLI* consumer
(`acmtool.c:269-310`): decoding stops at the first failed decode attempt,
the PCM produced before it is kept, and `filler_words` reports how many
zero words the CLI would append to reach the declared length.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import io as acmio
from ..format import (
    ACM_EXPECTED_EOF,
    ACM_ID,
    ACMInfo,
    AcmError,
    AcmException,
    AcmHeader,
    resolve_channels,
)
from ..scan import scan_bytes
from ..scan.oracle import ScanResult

Source = Union[str, os.PathLike, bytes, bytearray]


@dataclasses.dataclass
class FileResult:
    """Outcome of one corpus file (error-isolated)."""

    index: int
    info: ACMInfo | None
    #: int16 interleaved PCM words actually decoded (None if open failed).
    pcm: np.ndarray | None
    #: 0 on clean decode; else the first AcmError hit (ERR_NOT_ACM for
    #: unparseable files, ERR_CORRUPT / ERR_UNEXPECTED_EOF mid-stream).
    status: int
    #: zero words the reference CLI would append to reach the declared
    #: length (acmtool.c:293-310); 0 for a full decode.
    filler_words: int = 0

    @property
    def ok(self) -> bool:
        return self.status == 0


def _read_source(src: Source) -> bytes:
    if isinstance(src, (bytes, bytearray)):
        return bytes(src)
    with open(src, "rb") as f:
        return f.read()


def effective_stop(total: int, block_len: int, channels: int, words_avail: int) -> int:
    """Word position where the reference's read loop stops.

    Replays acm_read's per-call clamping (decode.c:848-857): each call takes
    min(remaining-in-block, total - pos) rounded down to a channel multiple;
    a zero-word round ends the stream (including the odd-block_len stereo
    wedge, where a final stranded word is never returned).
    """
    if channels <= 1:
        return min(total, words_avail)
    pos = 0
    while pos < min(total, words_avail):
        in_block = block_len - (pos % block_len)
        nw = min(in_block, total - pos, words_avail - pos)
        nw -= nw % channels
        if nw <= 0:
            break
        pos += nw
    return pos


@dataclasses.dataclass
class _Scanned:
    index: int
    header: AcmHeader
    scan: ScanResult
    channels: int
    n_good: int  # blocks before the first failed decode attempt
    first_err: int  # 0 or the first error event


def _scan_one(index: int, data: bytes, force_chans: int) -> Union[_Scanned, FileResult]:
    try:
        scan = scan_bytes(data)
    except (ValueError, AcmException):
        return FileResult(index=index, info=None, pcm=None,
                          status=int(AcmError.ERR_NOT_ACM))
    h = scan.header
    # blocks produced before the first failed attempt (CLI stops there)
    n_good = 0
    first_err = 0
    for ev in scan.events:
        if ev != 0:
            first_err = int(ev)
            break
        n_good += 1
    return _Scanned(
        index=index,
        header=h,
        scan=scan,
        channels=resolve_channels(h.channels, h.wavc_file, force_chans),
        n_good=n_good,
        first_err=first_err,
    )


def _info_of(s: _Scanned) -> ACMInfo:
    h = s.header
    return ACMInfo(
        channels=s.channels, rate=h.rate, acm_id=ACM_ID, acm_version=1,
        acm_channels=h.channels, acm_level=h.level, acm_cols=h.cols,
        acm_rows=h.rows,
    )


def make_mesh(n_devices: int | None = None, axis: str = "files") -> Mesh:
    """1-D device mesh over the `files` (data-parallel) axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_pow2(nb: int) -> int:
    p = 1
    while p < nb:
        p *= 2
    return p


def decode_corpus(
    sources: Sequence[Source],
    *,
    force_chans: int = 0,
    mesh: Mesh | None = None,
    backend: str = "jax",
    scan_backend: str | None = None,
) -> list[FileResult]:
    """Decode a corpus of ACM/WAVC files in batched device dispatches.

    Files are bucketed by (level, rows) — the static shape key — padded on
    the block axis, synthesized as [B, nb, rows, cols] with one jitted
    (and, under a mesh, sharded) dispatch per bucket, then sliced back to
    per-file PCM with reference-exact stop semantics.
    """
    del scan_backend  # reserved: oracle vs C++ scanner (scan module decides)
    results: list[FileResult | None] = [None] * len(sources)
    buckets: dict[tuple[int, int], list[_Scanned]] = {}
    for i, src in enumerate(sources):
        item = _scan_one(i, _read_source(src), force_chans)
        if isinstance(item, FileResult):
            results[i] = item
        else:
            buckets.setdefault((item.header.level, item.header.rows), []).append(item)

    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1

    for (level, rows), items in buckets.items():
        cols = 1 << level
        block_len = rows * cols
        wlen = 2 * cols - 2
        nb_max = max(1, _pad_pow2(max(s.n_good for s in items)))
        b = _round_up(len(items), n_shards)

        k = np.zeros((b, nb_max, rows, cols), dtype=np.int16)
        vals = np.zeros((b, nb_max), dtype=np.int32)
        for j, s in enumerate(items):
            ng = s.n_good
            if ng:
                k[j, :ng] = s.scan.k[:ng]
                vals[j, :ng] = s.scan.val[:ng].astype(np.int32)
        wrap0 = np.zeros((b, wlen), dtype=np.int32)

        args = (jnp.asarray(k), jnp.asarray(vals), jnp.asarray(wrap0))
        if mesh is not None:
            shardings = (
                NamedSharding(mesh, P("files", None, None, None)),
                NamedSharding(mesh, P("files", None)),
                NamedSharding(mesh, P("files", None)),
            )
            args = tuple(jax.device_put(a, sh) for a, sh in zip(args, shardings))

        if backend == "pallas":
            from ..ops.synth_pallas import synth_pcm_pallas as synth_fn
        else:
            from ..ops.synth_jax import synth_pcm_batch as synth_fn
        pcm_b, _ = synth_fn(*args, level=level, rows=rows)
        pcm_b = np.asarray(jax.device_get(pcm_b))  # [b, nb_max, block_len]

        for j, s in enumerate(items):
            h = s.header
            words_avail = s.n_good * block_len
            stop = effective_stop(h.total_values, block_len, s.channels, words_avail)
            pcm = pcm_b[j].reshape(-1)[:stop]
            want = h.total_values - (h.total_values % s.channels if s.channels > 1 else 0)
            status = 0
            if s.first_err not in (0, ACM_EXPECTED_EOF):
                status = s.first_err
            results[s.index] = FileResult(
                index=s.index,
                info=_info_of(s),
                pcm=pcm,
                status=status,
                filler_words=max(0, want - stop),
            )

    return results  # type: ignore[return-value]
