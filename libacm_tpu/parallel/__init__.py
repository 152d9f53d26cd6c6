"""Batched / sharded corpus decode (data-parallel over files)."""

from .corpus import (
    CorpusConfig,
    CorpusSummary,
    DeviceCorpus,
    FileResult,
    decode_corpus,
    decode_corpus_device,
    decode_corpus_host,
    decode_stream_device,
    effective_stop,
    make_mesh,
    resolve_device_backend,
)
from .random_access import (BlockIndex, RandomAccessCorpus, build_index,
                            read_segment)

__all__ = [
    "BlockIndex",
    "CorpusConfig",
    "CorpusSummary",
    "DeviceCorpus",
    "FileResult",
    "build_index",
    "decode_corpus",
    "decode_corpus_device",
    "decode_corpus_host",
    "decode_stream_device",
    "effective_stop",
    "make_mesh",
    "resolve_device_backend",
    "RandomAccessCorpus",
    "read_segment",
]
