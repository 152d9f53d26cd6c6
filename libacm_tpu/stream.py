"""Streaming decode API with reference-compatible semantics.

Python equivalent of the reference's L3/L4 surface
(`/root/reference/src/decode.c:758-893`, `util.c:93-277`): open / read /
read_loop / seek / info / telemetry / close, with the same observable
behavior — per-call block chunking, total_values clamp, channel-multiple
clamp, force_chans resolution, EOF quirks, error taxonomy, the
return-reached-position seek contract, and raw_tell byte accounting.

Architecture: instead of the reference's lazy per-block mutable pipeline,
a stream scans its bitstream once into dense coefficient tensors (host,
serial — oracle or C++ scanner) and synthesizes PCM on demand in one batched
device dispatch (JAX/Pallas). The read/seek state machine then just walks a
decoded int16 array while reproducing the C call-by-call arithmetic.

Error semantics match the reference exactly, including its
keep-going-after-error behavior: every read with no block ready consumes
one decode *attempt* (scan event); an attempt that failed with
ERR_CORRUPT / ERR_UNEXPECTED_EOF surfaces that error for that call, and the
next read continues from the bit position where the failed attempt stopped
— exactly what the C's next `decode_block` would do (decode.c:840-846).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Union

import numpy as np

from . import io as acmio
from . import scan as scanmod
from .format import (
    ACM_EXPECTED_EOF,
    ACM_HEADER_LEN,
    ACM_ID,
    ACM_WORD,
    ACMInfo,
    AcmError,
    AcmException,
    acm_strerror,
    resolve_channels,
)
from .scan.oracle import BitReader, ScanResult, parse_header

Source = Union[str, os.PathLike, bytes, bytearray, acmio.AcmIO]


@dataclasses.dataclass(frozen=True)
class DecodeState:
    """Serializable resume point of a stream (SURVEY §5 checkpoint/resume).

    The reference has no checkpointing — its analog is backward seek, a
    full reset + O(position) re-decode (util.c:214-253). Because this
    framework's heavy state (the scan + synthesized PCM) is a pure cache
    derived from the source bytes, the complete resumable state is just the
    read-cursor machine below; restoring is O(1) given the same source.
    The fields mirror the reference's live state (stream_pos/block_pos/
    block_ready, libacm.h:80-99) plus this design's event cursor.
    """

    stream_pos: int
    block_pos: int
    block_ready: bool
    event_idx: int
    cur_block: int
    blocks_popped: int
    end_attempted: bool
    post_seek: bool
    force_channels: int  # effective channel count (resolution result)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "DecodeState":
        return cls(**json.loads(s))


class AcmStream:
    """One open ACM/WAVC stream (analog of `ACMStream`, libacm.h:71-100)."""

    def __init__(self, src: acmio.AcmIO, force_chans: int = 0,
                 synth_backend: str | None = None):
        self._src = src
        self._closed = False
        self._synth_backend = synth_backend

        # data_len: only via an explicit length capability (C: NULL
        # get_length_func ⇒ 0 ⇒ not seekable, util.c:152-155).
        self._data_len = src.length() if hasattr(src, "length") else 0
        self._can_seek = hasattr(src, "seek")

        self._data = acmio.slurp(src)

        bits = BitReader(self._data)
        header = parse_header(bits)
        if header is None:
            # Any header failure maps to NOT_ACM (decode.c:783-784).
            self._close_src()
            raise AcmException(AcmError.ERR_NOT_ACM)
        self._header = header
        self._raw_tell0 = bits.loaded_bytes

        self.info = ACMInfo(
            channels=resolve_channels(header.channels, header.wavc_file, force_chans),
            rate=header.rate,
            acm_id=ACM_ID,
            acm_version=1,
            acm_channels=header.channels,
            acm_level=header.level,
            acm_cols=header.cols,
            acm_rows=header.rows,
        )
        self.total_values = header.total_values
        self.wavc_file = header.wavc_file

        # read-state machine (mirrors stream_pos/block_pos/block_ready)
        self._stream_pos = 0
        self._block_pos = 0
        self._block_ready = False
        self._event_idx = 0  # next scan event (decode attempt) to consume
        self._cur_block = 0  # pcm index of the ready block
        self._blocks_popped = 0
        self._end_attempted = False  # a decode attempt hit terminal EOF
        self._post_seek = False  # raw_tell counts from data_start after reset

        # lazy heavyweight state
        self._scan: ScanResult | None = None
        self._pcm: np.ndarray | None = None  # int16 words for scanned blocks
        self._seek_raw_tell: np.ndarray | None = None
        self._clean_until: int | None = None  # events[:clean_until] are all 0

    # -- lifecycle ---------------------------------------------------------

    def _close_src(self) -> None:
        if hasattr(self._src, "close"):
            try:
                self._src.close()
            except Exception:
                pass

    def close(self) -> None:
        """acm_close (decode.c:878-893). Idempotent."""
        if not self._closed:
            self._close_src()
            self._closed = True

    def __enter__(self) -> "AcmStream":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- front/back-end plumbing ------------------------------------------

    def _ensure_scan(self) -> ScanResult:
        if self._scan is None:
            bits = BitReader(self._data)
            hdr = parse_header(bits)
            assert hdr is not None
            self._scan = scanmod.scan_bytes(self._data, hdr.n_blocks)
        return self._scan

    def _ensure_pcm(self) -> np.ndarray:
        if self._pcm is None:
            from .ops.synth_jax import decode_scan_result

            self._pcm = decode_scan_result(
                self._ensure_scan(), backend=self._synth_backend or "auto"
            )
        return self._pcm

    # -- core read state machine (acm_read, decode.c:826-876) -------------

    def _read_core(self, numbytes: int, simulate: bool,
                   bigendianp: int, wordlen: int, sgned: int):
        """Returns bytes (possibly empty) or a negative error code."""
        if wordlen != 2:
            return int(AcmError.ERR_BADFMT)
        numwords = numbytes // 2

        if self._stream_pos >= self.total_values:
            return b""

        if not self._block_ready:
            scan = self._ensure_scan()
            if self._event_idx >= len(scan.events):
                # terminal: EXPECTED_EOF or block cap → EOF (decode.c:842-843)
                self._end_attempted = True
                return b""
            ev = int(scan.events[self._event_idx])
            self._event_idx += 1
            if ev != 0:
                # this attempt failed; the next read keeps going from the
                # failed attempt's bit position, like the reference
                return ev
            self._cur_block = self._blocks_popped
            self._blocks_popped += 1
            self._block_ready = True
            self._block_pos = 0

        h = self._header
        avail = h.block_len - self._block_pos
        numwords = min(numwords, avail)
        numwords = min(numwords, self.total_values - self._stream_pos)
        if self.info.channels > 1:
            numwords -= numwords % self.info.channels

        if simulate:
            out: bytes | int = numwords * wordlen
        else:
            pcm = self._ensure_pcm()
            start = self._cur_block * h.block_len + self._block_pos
            out = _format_samples(pcm[start : start + numwords], bigendianp, sgned)

        self._stream_pos += numwords
        self._block_pos += numwords
        if self._block_pos == h.block_len:
            self._block_ready = False
            self._cur_block += 1
        return out

    def _ensure_clean_until(self) -> int:
        """Index of the first failed decode attempt (len(events) if none)."""
        if self._clean_until is None:
            ev = self._ensure_scan().events
            nz = np.flatnonzero(ev != 0)
            self._clean_until = int(nz[0]) if len(nz) else len(ev)
        return self._clean_until

    def has_errors(self) -> bool:
        """True if any decode attempt in the stream failed.

        For a clean stream, read chunking is unobservable (errors are the
        only thing acm_read_loop's partial-data-wins rule can swallow or
        surface depending on chunk boundaries) — consumers like the CLI may
        then read in large chunks without changing a single output byte.
        """
        return self._ensure_clean_until() < len(self._ensure_scan().events)

    def _bulk_read(self, max_blocks: int, bigendianp: int, sgned: int):
        """Read up to max_blocks whole clean blocks in one numpy slice.

        State-transition-equivalent to that many _read_core iterations
        (pop event → copy whole block → block complete), valid only from a
        block boundary (not block_ready) with whole blocks inside
        total_values and block_len a channel multiple — every clamp in
        decode.c:848-857 is then a no-op. Returns formatted bytes or None.
        """
        h = self._header
        bl = h.block_len
        m = min(max_blocks,
                self._ensure_clean_until() - self._event_idx,
                (self.total_values - self._stream_pos) // bl)
        if m <= 0:
            return None
        pcm = self._ensure_pcm()
        start = self._blocks_popped * bl
        out = _format_samples(pcm[start : start + m * bl], bigendianp, sgned)
        self._event_idx += m
        self._blocks_popped += m
        self._cur_block = self._blocks_popped
        self._stream_pos += m * bl
        self._block_pos = bl  # same dead state a just-completed block leaves
        return out

    # -- public read API ---------------------------------------------------

    def read(self, numbytes: int, bigendianp: int = 0, wordlen: int = 2,
             sgned: int = 1) -> bytes:
        """One acm_read call: at most the remainder of the current block.

        Returns b"" at EOF; raises AcmException on error (module-level
        `acm_read` shim returns C-style codes instead).
        """
        res = self._read_core(numbytes, False, bigendianp, wordlen, sgned)
        if isinstance(res, int):
            raise AcmException(res)
        return res

    def read_loop(self, numbytes: int, bigendianp: int = 0, wordlen: int = 2,
                  sgned: int = 1) -> bytes:
        """acm_read_loop (util.c:258-277): drain until full or EOF. Partial
        data wins over a trailing error; an immediate error raises."""
        got = bytearray()
        left = numbytes
        h = self._header
        bl = h.block_len
        ch = self.info.channels
        fast = wordlen == 2 and (ch <= 1 or bl % ch == 0)
        while left > 0:
            if fast and not self._block_ready and left >= 2 * bl:
                res = self._bulk_read(left // (2 * bl), bigendianp, sgned)
                if res:
                    got += res
                    left -= len(res)
                    continue
            res = self._read_core(left, False, bigendianp, wordlen, sgned)
            if isinstance(res, int):  # error code
                if not got:
                    raise AcmException(res)
                break
            if not res:
                break
            got += res
            left -= len(res)
        return bytes(got)

    # -- checkpoint / resume (new capability; SURVEY §5) -------------------

    def get_state(self) -> DecodeState:
        """Snapshot the resumable decode state (cheap, O(1))."""
        return DecodeState(
            stream_pos=self._stream_pos,
            block_pos=self._block_pos,
            block_ready=self._block_ready,
            event_idx=self._event_idx,
            cur_block=self._cur_block,
            blocks_popped=self._blocks_popped,
            end_attempted=self._end_attempted,
            post_seek=self._post_seek,
            force_channels=self.info.channels,
        )

    def set_state(self, st: DecodeState) -> None:
        """O(1) resume from a snapshot taken on a stream of the same file.

        The effective channel count must match (it changes word
        accounting); everything heavy is re-derived lazily from the source.
        """
        if st.force_channels != self.info.channels:
            raise AcmException(
                AcmError.ERR_BADFMT,
                f"state has channels={st.force_channels}, "
                f"stream has {self.info.channels}",
            )
        self._stream_pos = st.stream_pos
        self._block_pos = st.block_pos
        self._block_ready = st.block_ready
        self._event_idx = st.event_idx
        self._cur_block = st.cur_block
        self._blocks_popped = st.blocks_popped
        self._end_attempted = st.end_attempted
        self._post_seek = st.post_seek

    # -- seeking (util.c:206-253) -----------------------------------------

    def seek_pcm(self, pcm_pos: int) -> int:
        word_pos = pcm_pos * self.info.channels
        if word_pos < self._stream_pos:
            if not self._can_seek:
                raise AcmException(AcmError.ERR_NOT_SEEKABLE)
            # full reset incl. wrapbuf zeroing — our wrap state is implicit
            # in the cached per-block synthesis, so only the cursor resets.
            self._stream_pos = 0
            self._block_pos = 0
            self._block_ready = False
            self._event_idx = 0
            self._cur_block = 0
            self._blocks_popped = 0
            self._end_attempted = False
            self._post_seek = True
        while self._stream_pos < word_pos:
            step = min(2048, word_pos - self._stream_pos)
            res = self._read_core(step * 2, True, 0, 2, 1)
            # simulate returns an int count, an error code, or b"" at EOF;
            # the reference breaks on res < 1 (util.c:248-250), errors
            # included — seek swallows them and reports the reached position.
            if not isinstance(res, int) or res < 1:
                break
        return self._stream_pos // self.info.channels

    def seek_time(self, pos_ms: int) -> int:
        res = self.seek_pcm(_time2pcm(pos_ms, self.info.rate))
        if res <= 0:
            return res
        return _pcm2time(res, self.info.rate)

    # -- telemetry (util.c:121-200) ---------------------------------------

    @property
    def rate(self) -> int:
        return self.info.rate

    @property
    def channels(self) -> int:
        return self.info.channels

    def seekable(self) -> bool:
        return self._data_len > 0

    def pcm_tell(self) -> int:
        return self._stream_pos // self.info.channels

    def pcm_total(self) -> int:
        return self.total_values // self.info.channels

    def time_tell(self) -> int:
        return _pcm2time(self.pcm_tell(), self.info.rate)

    def time_total(self) -> int:
        return _pcm2time(self.pcm_total(), self.info.rate)

    def raw_total(self) -> int:
        return self._data_len

    def raw_tell(self) -> int:
        """Bytes pulled into the bit reservoir so far (util.c:192-195).

        After a backward seek the reference restarts byte accounting at the
        plain-ACM header length (util.c:239 — a quirk it keeps even for
        WAVC); the post-seek reload boundaries are re-simulated exactly.
        """
        if not self._post_seek:
            if self._end_attempted:
                return self._ensure_scan().raw_tell_end
            if self._event_idx > 0:
                return int(self._ensure_scan().raw_tell[self._event_idx - 1])
            return self._raw_tell0
        # post-backward-seek accounting, from the data start
        if self._seek_raw_tell is None:
            from .scan import oracle as _oracle

            bits = BitReader(self._data[self._header.data_start :])
            res = _oracle.scan_blocks(bits, self._header, self._header.n_blocks)
            self._seek_raw_tell = np.concatenate(
                [res.raw_tell, [res.raw_tell_end]]
            )
        base = ACM_HEADER_LEN
        if self._end_attempted:
            return base + int(self._seek_raw_tell[-1])
        if self._event_idx > 0:
            return base + int(self._seek_raw_tell[self._event_idx - 1])
        return base

    def bitrate(self) -> int:
        if self.raw_total() == 0:
            return 13000  # author's typical-file fallback (util.c:161-162)
        t = self.time_total()
        if t > 0:
            return 8 * self.raw_total() * 1000 // t
        return 0


def _format_samples(words: np.ndarray, bigendianp: int, sgned: int) -> bytes:
    """s16/u16 × le/be output formats (decode.c:617-655)."""
    if not sgned:
        words = (words.view(np.uint16) ^ np.uint16(0x8000)).view(np.int16)
    if bigendianp:
        return words.astype(">i2").tobytes()
    return words.astype("<i2").tobytes()


def _pcm2time(pcm: int, rate: int) -> int:
    return pcm * 1000 // rate


def _time2pcm(ms: int, rate: int) -> int:
    return ms * rate // 1000


# ---------------------------------------------------------------------------
# Reference-named convenience API (libacm.h:103-170). These are thin, keep
# the C names and call shapes, and raise AcmException (whose .code is the
# C error value) where the C returns a negative code.
# ---------------------------------------------------------------------------


def _as_source(src: Source) -> acmio.AcmIO:
    if isinstance(src, (bytes, bytearray)):
        return acmio.BytesSource(bytes(src))
    if isinstance(src, (str, os.PathLike)):
        return acmio.FileSource(src)
    return src


def acm_open_decoder(src: Source, force_chans: int = 0) -> AcmStream:
    return AcmStream(_as_source(src), force_chans)


def acm_open_file(filename: str | os.PathLike, force_chans: int = 0) -> AcmStream:
    return AcmStream(acmio.FileSource(filename), force_chans)


def acm_read(acm: AcmStream, numbytes: int, bigendianp: int = 0,
             wordlen: int = 2, sgned: int = 1):
    """C-style: returns bytes (b'' at EOF) or a negative error int."""
    return acm._read_core(numbytes, False, bigendianp, wordlen, sgned)


def acm_read_loop(acm: AcmStream, numbytes: int, bigendianp: int = 0,
                  wordlen: int = 2, sgned: int = 1):
    try:
        return acm.read_loop(numbytes, bigendianp, wordlen, sgned)
    except AcmException as e:
        return e.code


def acm_close(acm: AcmStream) -> None:
    acm.close()


def acm_info(acm: AcmStream) -> ACMInfo:
    return acm.info


def acm_seekable(acm: AcmStream) -> bool:
    return acm.seekable()


def acm_rate(acm: AcmStream) -> int:
    return acm.rate


def acm_channels(acm: AcmStream) -> int:
    return acm.channels


def acm_bitrate(acm: AcmStream) -> int:
    return acm.bitrate()


def acm_pcm_tell(acm: AcmStream) -> int:
    return acm.pcm_tell()


def acm_pcm_total(acm: AcmStream) -> int:
    return acm.pcm_total()


def acm_time_tell(acm: AcmStream) -> int:
    return acm.time_tell()


def acm_time_total(acm: AcmStream) -> int:
    return acm.time_total()


def acm_raw_tell(acm: AcmStream) -> int:
    return acm.raw_tell()


def acm_raw_total(acm: AcmStream) -> int:
    return acm.raw_total()


def acm_seek_pcm(acm: AcmStream, pcm_pos: int) -> int:
    try:
        return acm.seek_pcm(pcm_pos)
    except AcmException as e:
        return e.code


def acm_seek_time(acm: AcmStream, pos_ms: int) -> int:
    try:
        return acm.seek_time(pos_ms)
    except AcmException as e:
        return e.code
