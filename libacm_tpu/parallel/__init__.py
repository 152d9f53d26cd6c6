"""Batched / sharded corpus decode (data-parallel over files)."""

from .corpus import (
    DeviceCorpus,
    FileResult,
    decode_corpus,
    decode_corpus_device,
    effective_stop,
    make_mesh,
)

__all__ = [
    "DeviceCorpus",
    "FileResult",
    "decode_corpus",
    "decode_corpus_device",
    "effective_stop",
    "make_mesh",
]
