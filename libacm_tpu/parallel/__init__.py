"""Batched / sharded corpus decode (data-parallel over files)."""

from .corpus import (
    CorpusConfig,
    CorpusSummary,
    DeviceCorpus,
    FileResult,
    decode_corpus,
    decode_corpus_device,
    effective_stop,
    make_mesh,
)
from .random_access import BlockIndex, build_index, read_segment

__all__ = [
    "BlockIndex",
    "CorpusConfig",
    "CorpusSummary",
    "DeviceCorpus",
    "FileResult",
    "build_index",
    "decode_corpus",
    "decode_corpus_device",
    "effective_stop",
    "make_mesh",
    "read_segment",
]
