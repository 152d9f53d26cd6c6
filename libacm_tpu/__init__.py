"""libacm_tpu — TPU-native InterPlay ACM/WAVC decode framework.

A ground-up JAX/XLA/Pallas re-architecture of the capabilities of
markokr/libacm: bit-exact int16 PCM decode of the InterPlay ACM audio
format (Fallout 1/2, Baldur's Gate) with the reference's public API surface
and `acmtool` CLI semantics, plus a corpus-scale batched/sharded decode
layer the reference never had.

Layers (see SURVEY.md for the blueprint):
  - `format`   — on-disk format model + error taxonomy
  - `io`       — pluggable host IO, WAV writer, header patcher
  - `scan`     — serial bitstream front-end (C++ scanner + NumPy oracle)
  - `ops`      — TPU synthesis back-end (JAX reference + Pallas kernel)
  - `stream`   — reference-compatible streaming API (open/read/seek/info)
  - `parallel` — batched corpus decode: vmap over files, shard_map over chips
  - `cli`      — the acmtool command-line tool
"""

import os as _os

if _os.environ.get("LIBACM_TPU_PLATFORM"):
    # Select the JAX backend before any jax initialization. The env var
    # JAX_PLATFORMS alone is not reliable where a site hook re-exports a
    # platform plugin (e.g. a TPU tunnel); the config update always wins.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LIBACM_TPU_PLATFORM"])

from .format import (
    ACM_ID,
    ACM_WORD,
    ACMInfo,
    AcmError,
    AcmException,
    AcmHeader,
    acm_strerror,
    is_acm,
    sniff,
    sniff_bytes,
)
from .stream import (
    AcmStream,
    DecodeState,
    acm_bitrate,
    acm_channels,
    acm_close,
    acm_info,
    acm_open_decoder,
    acm_open_file,
    acm_pcm_tell,
    acm_pcm_total,
    acm_rate,
    acm_raw_tell,
    acm_raw_total,
    acm_read,
    acm_read_loop,
    acm_seek_pcm,
    acm_seek_time,
    acm_seekable,
    acm_time_tell,
    acm_time_total,
)

__version__ = "0.1"

__all__ = [
    "ACM_ID",
    "ACM_WORD",
    "ACMInfo",
    "AcmError",
    "AcmException",
    "AcmHeader",
    "AcmStream",
    "DecodeState",
    "acm_strerror",
    "is_acm",
    "sniff",
    "sniff_bytes",
    "acm_open_decoder",
    "acm_open_file",
    "acm_read",
    "acm_read_loop",
    "acm_close",
    "acm_info",
    "acm_seekable",
    "acm_rate",
    "acm_channels",
    "acm_bitrate",
    "acm_pcm_tell",
    "acm_pcm_total",
    "acm_time_tell",
    "acm_time_total",
    "acm_raw_tell",
    "acm_raw_total",
    "acm_seek_pcm",
    "acm_seek_time",
]
