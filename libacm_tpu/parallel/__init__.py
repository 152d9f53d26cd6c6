"""Batched / sharded corpus decode (data-parallel over files)."""

from .corpus import FileResult, decode_corpus, effective_stop, make_mesh

__all__ = ["FileResult", "decode_corpus", "effective_stop", "make_mesh"]
