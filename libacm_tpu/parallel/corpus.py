"""Corpus-scale batched decode: vmap over files, shard over TPU chips.

This layer is new capability the reference never had (it is a strictly
file-at-a-time C library, `/root/reference/src/decode.c:758-893`): decode
thousands of ACM/WAVC files as one data-parallel program. Per SURVEY §2.3,
files are fully independent, so the parallelization is:

  host:   scan every file's serial bitstream into dense coefficient
          tensors (C++ scanner, oracle fallback), bucket files by
          (level, rows, padded-block-count) — the static shape key —
          and pad each bucket to [B, nb, rows, cols];
  device: one jitted dispatch per chunk of files: dequant + filterbank +
          >>level (ops.synth_jax.synth_pcm_batch), batch axis sharded over
          a 1-D `files` mesh via NamedSharding — XLA partitions the whole
          program with zero collectives (embarrassingly parallel);
  host:   per-file slice/clamp with the reference's exact stop semantics
          (total_values clamp + channel-multiple clamp, decode.c:848-857)
          and per-file error isolation (a corrupt file yields a status,
          never kills the batch).

Chunked dispatch pipelines the stages: while the device synthesizes chunk
N, the host scanner (GIL-free C++) is already scanning chunk N+1 and its
transfer is in flight — JAX's async dispatch gives the overlap for free.

Decoded PCM can stay **device-resident** (`decode_corpus_device`): the
north-star use of corpus decode is dataset ingest for TPU jobs, where
copying PCM back to the host would be pure waste. `decode_corpus` fetches
to host and returns per-file results.

Per-file error/EOF semantics mirror the reference *CLI* consumer exactly
(`acmtool.c:269-310`): decode errors are swallowed whenever the 8 KiB
read chunk already holds data (acm_read_loop's partial-data-wins rule,
util.c:271-272) and fatal only at chunk boundaries — see cli_stop_words.
`filler_words` reports how many zero words the CLI would append to reach
the declared length.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence, Union

logger = logging.getLogger("libacm_tpu.corpus")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format import (
    ACM_EXPECTED_EOF,
    ACM_ID,
    ACMInfo,
    AcmError,
    AcmException,
    AcmHeader,
    cli_total_bytes as _cli_total_bytes,
    resolve_channels,
)
from ..scan import scan_bytes
from ..scan.oracle import BitReader, parse_header

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


def cli_stop_words(events: np.ndarray, block_len: int, total: int,
                   channels: int, req_words: int = 4096) -> int:
    """Words `acmtool -d` would emit for a stream with these decode events.

    The reference CLI reads 8 KiB (4096-word) chunks via acm_read_loop
    (acmtool.c:269-291) whose partial-data-wins rule (util.c:271-272)
    SWALLOWS a decode error whenever any data was already read in that
    call — decoding then continues with the next block. An error stops the
    CLI only when it surfaces at a chunk boundary. This simulates the exact
    acm_read call-by-call arithmetic (decode.c:826-876) over the scan's
    event list: returns the emitted word count (error-truncated, channel-
    clamped, total-clamped).
    """
    pos = 0
    bpos = 0
    ready = False
    ei = 0
    while True:
        got = 0
        err = False
        left = req_words
        while left > 0:
            # --- one acm_read(left words) ---
            if pos >= total:
                break  # EOF, res=0
            if not ready:
                if ei >= len(events):
                    break  # clean EOF
                ev = int(events[ei])
                ei += 1
                if ev != 0:
                    err = True  # error code returned by this acm_read
                    break
                ready = True
                bpos = 0
            nw = min(left, block_len - bpos, total - pos)
            if channels > 1:
                nw -= nw % channels
            if nw <= 0:
                break  # wedged (stranded word); read_loop sees 0 bytes
            pos += nw
            bpos += nw
            got += nw
            left -= nw
            if bpos == block_len:
                ready = False
        if err and got == 0:
            return pos  # error surfaced at a chunk boundary: CLI stops
        if got == 0:
            return pos  # EOF / wedge
        # partial data wins: the error (if any) was swallowed; next call
        # re-enters decode_block after the failed attempt, like the C


def effective_stop(total: int, block_len: int, channels: int, words_avail: int) -> int:
    """Word position where the reference's read loop stops.

    Replays acm_read's per-call clamping (decode.c:848-857): each call takes
    min(remaining-in-block, total - pos) rounded down to a channel multiple;
    a zero-word round ends the stream (including the odd-block_len stereo
    wedge, where a final stranded word is never returned).
    """
    lim = min(total, words_avail)
    if channels <= 1:
        return lim
    if block_len % channels == 0:
        # pos stays block- and channel-aligned through every full-block
        # call, so only the final partial call rounds: closed form (the
        # per-block replay below costs ~block-count Python iterations)
        return lim - (lim % channels)
    pos = 0
    while pos < lim:
        in_block = block_len - (pos % block_len)
        nw = min(in_block, lim - pos)
        nw -= nw % channels
        if nw <= 0:
            break
        pos += nw
    return pos


def make_mesh(n_devices: int | None = None, axis: str = "files") -> Mesh:
    """1-D device mesh over the `files` (data-parallel) axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_blocks(nb: int) -> int:
    """Pad a block count to limit compile variants without pow2 waste."""
    if nb <= 8:
        return max(1, nb)
    if nb <= 32:
        return _round_up(nb, 8)
    return _round_up(nb, 32)


def _read_source(src: Source) -> bytes:
    if isinstance(src, (bytes, bytearray)):
        return bytes(src)
    with open(src, "rb") as f:
        return f.read()


def _reread_source(src: Source) -> bytes | None:
    """Full stream bytes from the START, for a source that may already
    have been consumed (the windowed scan is single-pass). None when the
    source cannot be rewound (read()-only object): the caller must fail
    loudly, not decode a tail as if it were the stream."""
    if isinstance(src, (bytes, bytearray)):
        return bytes(src)
    if hasattr(src, "read"):
        if not hasattr(src, "seek"):
            return None
        try:
            src.seek(0)
        except (OSError, ValueError):
            return None
        return bytes(src.read())
    return _read_source(src)  # path-like: reopen


def _peek_source(src: Source, n: int = 64) -> tuple[bytes, int]:
    """(first n bytes, total byte length) without slurping file sources.

    The bucketing pass needs only the header (<= 48 bytes) and the file
    size; reading whole files here would make a 10k-file ingest hold the
    entire corpus in host RSS up-front (BASELINE config 5).
    """
    if isinstance(src, (bytes, bytearray)):
        return bytes(src[:n]), len(src)
    with open(src, "rb") as f:
        head = f.read(n)
        size = os.fstat(f.fileno()).st_size
    return head, size


@dataclasses.dataclass
class _FileEntry:
    index: int
    #: original source; bytes are (re)loaded per chunk at scan time and
    #: released after — corpus host RSS stays O(chunk), not O(corpus)
    src: Source
    header: AcmHeader
    channels: int
    nbytes: int
    # filled at scan time:
    n_good: int = 0  # committed (successful) blocks, errors skipped over
    #: file vanished between the header peek and the chunk scan: the
    #: result becomes FileResult(pcm=None, status=ERR_OPEN), same as a
    #: header-pass open failure
    open_failed: bool = False
    first_err: int = 0
    #: per-attempt outcome list (0 = block, negative = error) — drives the
    #: CLI-equivalent stop position (see cli_stop_words)
    events: np.ndarray | None = None
    #: exact host-decoded PCM override (stale-amp-table streams take the
    #: oracle path; the device result for this file is ignored)
    host_pcm: np.ndarray | None = None

    def load_data(self) -> bytes:
        """File bytes; a vanished file marks the entry failed and decodes
        as zero blocks (the batch stays alive, the result is ERR_OPEN)."""
        try:
            return _read_source(self.src)
        except OSError:
            self._mark_open_failed()
            return b""

    def load_into(self, mv: memoryview, pos: int, cap: int) -> int:
        """Read up to cap file bytes straight into mv[pos:], returning the
        byte count (0 and open_failed on a vanished file) — the zero-copy
        loader for the batched chunk scan."""
        try:
            src = self.src
            if isinstance(src, (bytes, bytearray)):
                n = min(len(src), cap)
                mv[pos : pos + n] = memoryview(src)[:n]
                return n
            with open(src, "rb") as f:
                return f.readinto(mv[pos : pos + cap]) or 0
        except OSError:
            self._mark_open_failed()
            return 0

    def _mark_open_failed(self) -> None:
        self.open_failed = True
        self.n_good = 0
        self.first_err = int(AcmError.ERR_OPEN)
        self.events = np.zeros(0, dtype=np.int16)


@dataclasses.dataclass
class _BucketOut:
    """Device-side output of one bucket (all same (level, rows, nb))."""

    level: int
    rows: int
    entries: list[_FileEntry]
    pcm: jax.Array  # int16 [B, nb, rows*cols] (padded files/blocks included)
    # entries[j] always lives at pcm row j: shard groups are prefix-full
    # (every nonempty group before the last has exactly ceil(n/n_shards)
    # entries), so group-major positions and padded rows coincide.


@dataclasses.dataclass(frozen=True)
class CorpusConfig:
    """Batch-job configuration (SURVEY §5 config system).

    The reference's config surface is CLI flags + `force_chans` + the
    output-format triple; corpus jobs add scheduling knobs, gathered here
    as one frozen value so jobs are reproducible from their config.
    """

    force_chans: int = 0
    #: files per device dispatch; None = auto-size so each chunk carries
    #: ~8M samples (small files need big chunks to amortize dispatch RTTs)
    chunk_files: int | None = None
    pack: bool = True
    #: "auto": host-bound consumers use the fused native pipeline,
    #: device-bound ones XLA. "host" | "jax" | "pallas" force a backend.
    backend: str = "auto"
    #: decode threads for the host path (the fused native decoder releases
    #: the GIL with thread-local scratch, so file-level parallelism scales
    #: to physical cores); ignored by device backends, which pipeline
    #: host scan with device synth instead
    host_workers: int = 1


@dataclasses.dataclass
class CorpusSummary:
    """Observability counters for one corpus decode (SURVEY §5 metrics)."""

    n_files: int = 0
    n_ok: int = 0
    n_failed: int = 0  # unreadable / not-ACM
    n_partial: int = 0  # decoded with a mid-stream error status
    samples: int = 0
    wall_s: float = 0.0
    scan_s: float = 0.0  # host CPU in the bitstream front-end

    @property
    def msamples_per_s(self) -> float:
        return self.samples / self.wall_s / 1e6 if self.wall_s else 0.0

    def realtime_factor(self, rate: int = 22050) -> float:
        return self.msamples_per_s * 1e6 / rate

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["msamples_per_s"] = round(self.msamples_per_s, 2)
        return d


class DeviceCorpus:
    """Decoded corpus with PCM left on device (for TPU-side consumers)."""

    def __init__(self, n_files: int):
        self._n = n_files
        self._buckets: list[_BucketOut] = []
        self._failed: dict[int, FileResult] = {}
        self.summary = CorpusSummary(n_files=n_files)

    # -- construction (internal) -------------------------------------------

    def _add_failed(self, r: FileResult) -> None:
        self._failed[r.index] = r

    def _add_bucket(self, b: _BucketOut) -> None:
        self._buckets.append(b)

    # -- consumption ---------------------------------------------------------

    def block_until_ready(self) -> "DeviceCorpus":
        for b in self._buckets:
            b.pcm.block_until_ready()
        return self

    def checksum(self) -> int:
        """Device-side reduction over all decoded PCM (forces
        materialization; fetches only scalars). All buckets reduce inside
        one jitted program — a single host↔device round-trip.

        Padded rows/blocks are masked out (a padded all-zero block still
        synthesizes nonzero PCM via the rounding bias and inherited
        carry), so the digest depends only on corpus content — the same
        value for any chunk_files / mesh / backend configuration."""
        if not self._buckets:
            return 0
        args = []
        for b in self._buckets:
            ng = np.zeros(b.pcm.shape[0], dtype=np.int32)
            for j, e in enumerate(b.entries):
                ng[j] = min(e.n_good, b.pcm.shape[1])
            args += [b.pcm, ng]
        return int(_sum_all(*args)) & 0xFFFFFFFF

    def device_arrays(self) -> list[tuple[list[int], jax.Array]]:
        """[(file_indices, int16 pcm [B, nb, block_len])] per bucket."""
        return [([e.index for e in b.entries], b.pcm) for b in self._buckets]

    def to_results(self) -> list[FileResult]:
        """Fetch PCM to host and apply per-file reference stop semantics."""
        results: list[FileResult | None] = [None] * self._n
        for i, r in self._failed.items():
            results[i] = r
        for b in self._buckets:
            block_len = b.rows << b.level
            host = np.asarray(jax.device_get(b.pcm))
            for j, e in enumerate(b.entries):
                results[e.index] = _finalize(e, host[j].reshape(-1),
                                             block_len)
        return results  # type: ignore[return-value]


@jax.jit
def _sum_all(*args):
    """Masked content digest: args alternate (pcm [B, nb, L], n_good [B])."""
    tot = jnp.int32(0)
    for i in range(0, len(args), 2):
        pcm, ng = args[i], args[i + 1]
        mask = jnp.arange(pcm.shape[1])[None, :] < ng[:, None]
        tot = tot + jnp.sum(
            jnp.where(mask[:, :, None], pcm.astype(jnp.int32), 0),
            dtype=jnp.int32)
    return tot


def _finalize(e: _FileEntry, pcm_flat: np.ndarray, block_len: int) -> FileResult:
    if e.open_failed:
        return FileResult(index=e.index, info=None, pcm=None,
                          status=int(AcmError.ERR_OPEN))
    h = e.header
    if e.host_pcm is not None:
        pcm_flat = e.host_pcm
    total_bytes = _cli_total_bytes(h.total_values, e.channels)
    if total_bytes <= 0:
        info = ACMInfo(
            channels=e.channels, rate=h.rate, acm_id=ACM_ID, acm_version=1,
            acm_channels=h.channels, acm_level=h.level, acm_cols=h.cols,
            acm_rows=h.rows,
        )
        return FileResult(index=e.index, info=info,
                          pcm=np.zeros(0, dtype=np.int16),
                          status=e.first_err if e.first_err not in
                          (0, ACM_EXPECTED_EOF) else 0,
                          filler_words=0)
    if e.events is not None and e.first_err != 0:
        # errors present (first_err is the first nonzero event, so this
        # equals any(events != 0) without the per-file numpy reduction):
        # replicate the CLI's exact stop position (errors are swallowed
        # mid-chunk, fatal at chunk boundaries)
        stop = cli_stop_words(e.events, block_len, h.total_values, e.channels)
    else:
        stop = effective_stop(h.total_values, block_len, e.channels,
                              e.n_good * block_len)
    want = h.total_values - (h.total_values % e.channels if e.channels > 1 else 0)
    status = 0
    if e.first_err not in (0, ACM_EXPECTED_EOF):
        status = e.first_err
    info = ACMInfo(
        channels=e.channels, rate=h.rate, acm_id=ACM_ID, acm_version=1,
        acm_channels=h.channels, acm_level=h.level, acm_cols=h.cols,
        acm_rows=h.rows,
    )
    return FileResult(
        index=e.index, info=info, pcm=pcm_flat[:stop], status=status,
        filler_words=max(0, want - stop),
    )


def _apply_host_decode(e: _FileEntry, hd) -> None:
    """Copy a native HostDecode result into a _FileEntry (single site for
    the field mapping — used by both the corpus host path and the
    stale-amp-table fallback)."""
    e.n_good = hd.n_good
    e.first_err = hd.first_err
    e.events = hd.events
    e.host_pcm = hd.pcm


def _host_decode_fallback(e: _FileEntry, data: bytes | None = None) -> None:
    """Exact host decode for stale-amp-table streams.

    Rare (corrupt/hostile streams only): the k*val dequantization the
    device performs cannot reproduce the reference's stale table reads, so
    the file's PCM comes from the fused native host decoder (which
    reproduces the stale reads via its virtual table — see SynthEmitter
    in _scan.cpp) or, without the native library, the oracle; batch
    shape/dispatch is unaffected (the device output for this file's slot
    is simply ignored)."""
    if data is None:
        data = e.load_data()
    from ..scan import native as _native

    if _native.available():
        _apply_host_decode(e, _native.decode_host(data, e.header))
        return
    from ..scan import oracle as _oracle

    scan = _oracle.scan_bytes(data)
    e.n_good = scan.n_blocks
    _, e.first_err = _n_good(scan.events)
    e.events = scan.events
    e.host_pcm = _oracle.words_to_pcm(_oracle.synth_all(scan),
                                      e.header.level)


def _n_good(events: np.ndarray) -> tuple[int, int]:
    """(blocks before first failed attempt, first error or 0)."""
    ng = 0
    for ev in events:
        if ev != 0:
            return ng, int(ev)
        ng += 1
    return ng, 0


_SCAN_TLS = threading.local()


class _WireBufs:
    """One chunk's reusable wire buffers + the dispatch that may still be
    reading them. Allocating (and page-faulting) fresh multi-MB zeroed
    payload buffers per chunk cost ~15% of the device pipeline's host CPU;
    reuse needs only a small memset of the metadata arrays — the payload
    pools are written append-only up to their counters and the device
    gather never reads past them, so stale tail bytes are never observed.
    """

    def __init__(self, b: int, nb: int, level: int, rows: int):
        from ..scan.native import pay_stream_caps

        cols = 1 << level
        ncols_cap = b * nb * cols
        c4, c8, c16, cw = pay_stream_caps(ncols_cap, rows)
        self.key = (b, nb, level, rows)
        self.cls = np.zeros((b, nb, (cols + 3) // 4), dtype=np.uint8)
        self.pwr = np.zeros((b, nb), dtype=np.uint8)
        self.vals = np.zeros((b, nb), dtype=np.uint16)
        self.wrap0 = np.zeros((b, 2 * cols - 2), dtype=np.int32)
        self.pay4 = np.empty(c4, dtype=np.uint8)
        self.pay8 = np.empty(c8, dtype=np.uint8)
        self.pay16 = np.empty(c16, dtype=np.uint8)
        self.wid4 = np.empty(cw, dtype=np.uint8)
        self.wid8 = np.empty(cw, dtype=np.uint8)
        self.wid16 = np.empty(cw, dtype=np.uint8)
        # coalesced single-transfer wire blob (capacity = worst case of
        # every section; actual chunks use a prefix)
        self.blob = np.empty(
            self.cls.nbytes + self.vals.nbytes + self.wrap0.nbytes
            + c4 + c8 + c16 + 3 * cw, dtype=np.uint8)
        self.fut = None  # in-flight dispatch still reading these buffers
        self.dev = None  # the dispatch's device arrays (transfer tracking)

    def free(self) -> bool:
        if self.fut is not None and not self.fut.done():
            return False
        # fut.done() only means the dispatch was SUBMITTED; on PJRT the
        # async host→device copy may still be reading these numpy buffers
        # (ImmutableUntilTransferCompletes), so reuse also waits for the
        # transfers themselves (is_ready is non-blocking)
        return self.dev is None or all(d.is_ready() for d in self.dev)

    def reset(self) -> None:
        # metadata must be zero (class codes drive the device cumsum
        # gather; vals of padded blocks feed the checksum) — payloads not
        self.cls[:] = 0
        self.pwr[:] = 0
        self.vals[:] = 0
        self.fut = None
        self.dev = None


class _NeverDone:
    """Placeholder future: pins a _WireBufs as in-use between its scan
    and the attachment of the real dispatch future."""

    @staticmethod
    def done() -> bool:
        return False


_SCAN_HOLD = _NeverDone()


def _acquire_wire_bufs(b: int, nb: int, level: int, rows: int) -> _WireBufs:
    # The CPU backend zero-copies numpy arrays into jax.Arrays (aliasing:
    # verified empirically), so a reused buffer would corrupt live device
    # arrays — pool only on real accelerators, where transfers copy.
    if jax.default_backend() == "cpu":
        return _WireBufs(b, nb, level, rows)
    pool: list[_WireBufs] = getattr(_SCAN_TLS, "wire_pool", None)
    if pool is None:
        pool = _SCAN_TLS.wire_pool = []
    key = (b, nb, level, rows)
    for w in pool:
        if w.key == key and w.free():
            w.reset()
            return w
    # bound pool growth, but never below the in-flight window: on a slow
    # transfer link many chunks of one shape are in flight at once, and
    # evicting free buffers then forces fresh (page-faulting) allocations
    # in the scan loop — measured as a 2-3x scan_s inflation
    if len(pool) > 24:
        free = [w for w in pool if w.free()]
        busy = [w for w in pool if not w.free()]
        pool[:] = busy + free[:8]
    w = _WireBufs(b, nb, level, rows)
    pool.append(w)
    return w


def _scan_cols_wire(chunk: list[_FileEntry], level: int, rows: int, nb: int,
                    b_cap: int | None = None):
    """Host half of the cols-wire path: ONE batched native scan over the
    whole chunk (file bytes staged back to back in a pooled blob), writing
    straight into the chunk's (pooled) wire buffers. Returns
    (arrays, _WireBufs) — the caller attaches the dispatch future to the
    buffer set so it is not reused while the transfer may still read it.
    Scratch buffers are thread-local (decode_corpus may run concurrently)."""
    from ..format import ACM_HEADER_LEN, WAVC_HEADER_LEN
    from ..scan import native as _native

    cols = 1 << level
    b = max(len(chunk), b_cap or 0)  # uniform caps across shard groups
    w = _acquire_wire_bufs(b, nb, level, rows)

    if not chunk:  # empty shard group (chunk smaller than the mesh)
        return (w.cls, w.pay4[:2], w.pay8[:2], w.pay16[:2], w.wid4[:2],
                w.wid8[:2], w.wid16[:2], w.vals,
                np.zeros((0, 2 * cols - 2), dtype=np.int32)), w
    max_bytes = max(e.nbytes for e in chunk)
    bufs = getattr(_SCAN_TLS, "bufs", None)
    if bufs is None or not bufs.fits(max_bytes):
        bufs = _native.CorpusScanBuffers(max_file_bytes=max(1 << 22, max_bytes))
        _SCAN_TLS.bufs = bufs

    # stage file bytes back to back into the pooled blob (readinto: no
    # intermediate bytes objects); a file that grew since the header peek
    # is scanned at its peeked size (its bucket was chosen from that size)
    total = sum(e.nbytes for e in chunk)
    blob = getattr(_SCAN_TLS, "blob", None)
    if blob is None or len(blob) < total:
        blob = _SCAN_TLS.blob = np.empty(total + total // 4 + 4096,
                                         dtype=np.uint8)
    mv = memoryview(blob)
    offs = np.zeros(b, dtype=np.int64)
    lens = np.zeros(b, dtype=np.int64)
    skips = np.zeros(b, dtype=np.int64)
    maxbs = np.zeros(b, dtype=np.int64)
    pos = 0
    for j, e in enumerate(chunk):
        n = e.load_into(mv, pos, e.nbytes)
        offs[j] = pos
        lens[j] = n
        pos += n
        skips[j] = 8 * (ACM_HEADER_LEN
                        + (WAVC_HEADER_LEN if e.header.wavc_file else 0))
        maxbs[j] = min(e.header.n_blocks, nb)

    ev_cap = nb + 64
    out, events, ncol, bits = _native.scan_corpus_chunk(
        blob, offs, lens, skips, maxbs, level, rows,
        w.cls, w.pwr, w.vals, w.pay4, w.pay8, w.pay16,
        w.wid4, w.wid8, w.wid16, bufs, ev_cap,
    )
    for j, e in enumerate(chunk):
        if e.open_failed:
            continue  # slot stays zeroed; _finalize reports ERR_OPEN
        ng, err, oor, nev, ovf = (int(x) for x in out[j])
        e.n_good, e.first_err = ng, err
        if ovf:
            # heavily corrupt stream: event list overflowed the per-file
            # cap — rescan solo for the full CLI stop-semantics input
            e.events = _native.scan_bytes_packed(
                bytes(mv[offs[j] : offs[j] + lens[j]])).events
        else:
            e.events = events[j, :nev].copy()
        if oor:
            _host_decode_fallback(e, bytes(mv[offs[j] : offs[j] + lens[j]]))

    # payload pools are append-only up to the counters; padding slices to
    # stable 4096-byte shapes may expose stale (never-gathered) bytes.
    # Even lengths are load-bearing: the device unpack views streams as
    # uint16 pairs.
    def _pay(a: np.ndarray, used_bits: int) -> np.ndarray:
        return a[: min(_round_up(-(-used_bits // 8) + 2, 4096), len(a))]

    def _wid(a: np.ndarray, n_cols: int) -> np.ndarray:
        return a[: min(_round_up(-(-n_cols // 2), 512), len(a))]

    return (w.cls, _pay(w.pay4, bits[0]), _pay(w.pay8, bits[1]),
            _pay(w.pay16, bits[2]), _wid(w.wid4, ncol[0]),
            _wid(w.wid8, ncol[1]), _wid(w.wid16, ncol[2]),
            w.vals, w.wrap0), w


def _coalesce_wire(arrays, wirebufs=None) -> tuple[np.ndarray, tuple]:
    """Pack the nine wire sections into ONE contiguous uint8 buffer.

    The relay transport pays a large fixed cost per transferred array
    (measured: a nine-array tuple device_put costs ~2x one contiguous
    array of the same bytes), so each chunk ships as a single blob that
    the device program slices back apart at static offsets
    (ops.synth_jax.cols_blob_layout — the order here must match it:
    cls, pay4/8/16, wid4/8/16, vals, wrap0). The memcpy runs on the
    submitter thread, overlapped with the main thread's scan of the
    next chunk. Returns (blob view, payload/width section lengths)."""
    sections = tuple(arrays)  # 9 sections, or 8 when wrap rides on device
    lens = tuple(a.nbytes for a in sections[1:7])
    total = sum(a.nbytes for a in sections)
    if wirebufs is not None and len(wirebufs.blob) >= total:
        blob = wirebufs.blob
    else:
        blob = np.empty(total, np.uint8)
    off = 0
    for a in sections:
        n = a.nbytes
        blob[off : off + n] = a.reshape(-1).view(np.uint8)
        off += n
    return blob[:total], lens


def _dispatch_cols_wire(arrays, chunk, level: int, rows: int, nb: int,
                        backend: str = "jax", wirebufs=None) -> _BucketOut:
    """Device half: transfer the coalesced wire blob (one device_put —
    see _coalesce_wire) and dispatch the fused slice+unpack+synth."""
    from ..ops.synth_jax import synth_pcm_cols_blob

    blob, lens = _coalesce_wire(arrays, wirebufs)
    dev = jax.device_put(blob)
    if wirebufs is not None:
        wirebufs.dev = (dev,)  # pool reuse waits for this transfer
    pcm, _ = synth_pcm_cols_blob(
        dev, level=level, rows=rows, batch=len(chunk), nb=nb,
        backend=backend, lens=lens,
    )
    return _BucketOut(level=level, rows=rows, entries=chunk, pcm=pcm)


#: (platform, level, rows) -> measured winner ("jax" | "pallas")
_BACKEND_CACHE: dict[tuple[str, int, int], str] = {}


def _backend_cache_path() -> "os.PathLike | None":
    import pathlib

    base = os.environ.get("LIBACM_TPU_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "libacm_tpu")
    try:
        p = pathlib.Path(base)
        p.mkdir(parents=True, exist_ok=True)
        return p / "backend_shootout.json"
    except OSError:
        return None


def measure_backend(level: int, rows: int) -> tuple[str, dict]:
    """Time the XLA pass chain vs the fused Pallas kernel on THIS device
    for one geometry (device-resident synthetic data: pure compute, no
    transfer) and cross-check bit-exact equality. Returns
    (winner, {backend: Msamples/s}). The equality check doubles as an
    on-hardware Pallas parity probe for the geometry (exactness wins over
    speed on any mismatch — which would be a kernel bug, not a tradeoff).
    """
    import time as _time

    from ..ops.synth_jax import synth_pcm_batch
    from ..ops.synth_pallas import synth_pcm_pallas

    cols = 1 << level
    n = rows * cols
    # ~64M samples per timed run so compute dominates the dispatch RTT
    nb = 1024
    B = max(1, min(64, (1 << 26) // (n * nb)))
    # entropy-seeded inputs: the relay backend dedups (program, inputs)
    # executions ACROSS processes, so deterministic test vectors would be
    # served from its result cache on any re-measurement — timing a no-op
    seed = int.from_bytes(os.urandom(4), "little")
    key = jax.random.PRNGKey(seed)
    k = jax.random.randint(key, (B, nb, rows, cols), -2000, 2000,
                           jnp.int32).astype(jnp.int16)
    # fresh vals per rep: same dedup defense within the run
    nreps = 6
    valreps = [jnp.full((B, nb), 3 + (seed + 13 * r) % 30000, jnp.int32)
               for r in range(nreps + 1)]
    wrap0 = jnp.zeros((B, max(2 * cols - 2, 1)), jnp.int32)
    total = B * nb * n
    # block_until_ready is NOT a sync barrier on the relay backend (it can
    # return without a device round trip), so a timed region must end with a
    # genuine device->host fetch of a value that depends on the output.
    # Dispatch is async: queue nreps runs back-to-back and fetch all their
    # checksums at the end, so one region measures ~RTT + nreps*compute and
    # the per-run estimate stays conditioned even when compute << RTT jitter.
    rtt = float("inf")
    for _ in range(3):
        t0 = _time.perf_counter()
        int(jnp.sum(valreps[0][0, :1]))
        rtt = min(rtt, _time.perf_counter() - t0)
    speeds: dict[str, float] = {}
    outs = {}
    for name, fn in (("jax", synth_pcm_batch), ("pallas", synth_pcm_pallas)):
        try:
            pcm, _ = fn(k, valreps[0], wrap0, level=level, rows=rows)
            int(jnp.sum(pcm))  # compile + warm, real sync
            elapsed = float("inf")
            for trial in range(3):  # min-of-3 regions: relay weather
                t0 = _time.perf_counter()
                sums = []
                for r in range(1, nreps + 1):
                    vr = valreps[r] + trial  # fresh inputs every trial
                    pcm, _ = fn(k, vr, wrap0, level=level, rows=rows)
                    sums.append(jnp.sum(pcm))
                # ONE fetch: serial scalar fetches each pay their own RTT
                np.asarray(jnp.stack(sums))
                elapsed = min(elapsed,
                              max(_time.perf_counter() - t0 - rtt, 1e-9))
            speeds[name] = nreps * total / elapsed / 1e6
            outs[name] = pcm
        except Exception as exc:  # pallas unsupported on this backend
            logger.info("backend %s failed for (%d,%d): %s", name, level,
                        rows, exc)
            speeds[name] = 0.0
    if len(outs) == 2 and not bool(
            jnp.array_equal(outs["jax"], outs["pallas"])):
        logger.error("pallas/XLA mismatch at (level=%d, rows=%d); forcing "
                     "XLA", level, rows)
        return "jax", speeds
    winner = max(speeds, key=lambda b: speeds[b])
    return winner, speeds


def resolve_device_backend(backend: str, level: int, rows: int) -> str:
    """Map backend="auto" to the synthesis kernel for one bucket geometry.

    Measurement-grounded: the first time a geometry is decoded on an
    accelerator, both backends run a device-resident micro-shootout
    (measure_backend) and the winner is cached — in memory and on disk
    (~/.cache/libacm_tpu/backend_shootout.json, override dir with
    LIBACM_TPU_CACHE) so later processes skip the probe. CPU/GPU and
    unsupported geometries use the XLA path outright.
    """
    if backend != "auto":
        return backend
    from ..ops.synth_pallas import pallas_supported

    plat = jax.default_backend()
    if plat in ("cpu", "gpu") or not pallas_supported(level, rows):
        return "jax"
    key = (plat, level, rows)
    got = _BACKEND_CACHE.get(key)
    if got is not None:
        return got
    import json

    path = _backend_cache_path()
    disk: dict = {}
    if path is not None:
        try:
            disk = json.loads(path.read_text())
        except (OSError, ValueError):
            disk = {}
        hit = disk.get(f"{plat}/{level}/{rows}")
        if isinstance(hit, dict) and hit.get("winner") in ("jax", "pallas"):
            _BACKEND_CACHE[key] = hit["winner"]
            return hit["winner"]
    winner, speeds = measure_backend(level, rows)
    _BACKEND_CACHE[key] = winner
    logger.info("backend shootout (level=%d, rows=%d): %s", level, rows,
                {k_: round(v, 1) for k_, v in speeds.items()})
    if path is not None:
        disk[f"{plat}/{level}/{rows}"] = {
            "winner": winner,
            "speeds_Msamples_per_s": {k_: round(v, 1)
                                      for k_, v in speeds.items()},
        }
        try:
            path.write_text(json.dumps(disk, indent=1, sort_keys=True))
        except OSError:
            pass
    return winner


def decode_corpus_device(
    sources: Sequence[Source],
    *,
    force_chans: int = 0,
    mesh: Mesh | None = None,
    backend: str = "auto",
    chunk_files: int | None = None,
    pack: bool = True,
    config: CorpusConfig | None = None,
) -> DeviceCorpus:
    """Decode a corpus; leave PCM on device (see DeviceCorpus).

    Buckets files by (level, rows, padded block capacity), then per chunk of
    `chunk_files` files: host-scan, async-transfer, async-dispatch synthesis
    — successive chunks pipeline host scan against device work.
    """
    if config is not None:
        force_chans = config.force_chans
        chunk_files = config.chunk_files
        pack = config.pack
        backend = config.backend
    if backend == "host":
        backend = "jax"  # device decode: host backends don't apply here
    # "auto" resolves per bucket geometry (resolve_device_backend)
    t_start = time.perf_counter()
    out = DeviceCorpus(len(sources))

    # 1. cheap header pass → buckets keyed by static shape. Only a 64-byte
    # prefix + the file size are read here; full bytes load per chunk at
    # scan time, so ingest RSS is O(chunk), not O(corpus) (BASELINE cfg 5)
    buckets: dict[tuple[int, int, int], list[_FileEntry]] = {}
    for i, src in enumerate(sources):
        try:
            head, nbytes = _peek_source(src)
        except OSError:
            # per-file isolation covers IO too: an unreadable path yields
            # a FileResult (the reference CLI likewise reports and moves
            # on, acmtool.c:241-243), never kills the batch
            out._add_failed(FileResult(index=i, info=None, pcm=None,
                                       status=int(AcmError.ERR_OPEN)))
            continue
        header = parse_header(BitReader(head))
        if header is None:
            out._add_failed(FileResult(index=i, info=None, pcm=None,
                                       status=int(AcmError.ERR_NOT_ACM)))
            continue
        e = _FileEntry(
            index=i, src=src, header=header, nbytes=nbytes,
            channels=resolve_channels(header.channels, header.wavc_file,
                                      force_chans),
        )
        key = (header.level, header.rows,
               _pad_blocks(header.max_blocks_in(nbytes)))
        buckets.setdefault(key, []).append(e)

    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1

    use_cols_wire = pack
    if use_cols_wire:
        from ..scan import native as _native

        use_cols_wire = _native.available()

    # 2. per bucket, chunked scan → transfer → dispatch. The device
    # submission (which blocks the calling thread on the host→device wire)
    # runs on a single worker thread so the GIL-free C++ scan of chunk N+1
    # overlaps chunk N's transfer.
    submitter = ThreadPoolExecutor(max_workers=1)
    pending: list = []
    n_collected = 0
    try:
        for (level, rows, nb), entries in buckets.items():
            cols = 1 << level
            wlen = 2 * cols - 2
            eff = resolve_device_backend(backend, level, rows)
            if eff == "pallas":
                from ..ops.synth_pallas import synth_pcm_pallas as synth_fn
            else:
                from ..ops.synth_jax import synth_pcm_batch as synth_fn
            per_file = max(1, nb * rows * cols)
            if mesh is not None and not use_cols_wire:
                step = len(entries)
            elif chunk_files is not None:
                step = max(1, chunk_files) * n_shards
            else:
                # auto: ~16M samples per dispatch (per shard), 8..256
                # files — sized against the relay's per-dispatch latency,
                # not device occupancy (the TPU is never the bottleneck)
                step = min(256, max(8, -(-16_000_000 // per_file))) * n_shards
            if use_cols_wire:
                # device unpack computes bit offsets in int32: cap any
                # chunk's per-shard payload stream below 2^31 bits
                # (128M samples * 16 bits = 2^31)
                step = min(step,
                           max(n_shards, ((1 << 27) // per_file) * n_shards))
            for lo in range(0, len(entries), step):
                chunk = entries[lo : lo + step]
                # bound in-flight dispatches: caps host memory at
                # O(few chunks) of wire arrays and lets their pooled
                # buffers recycle; deep enough that a slow transfer link
                # stays saturated while the host scans ahead
                while len(pending) - n_collected >= 6:
                    out._add_bucket(pending[n_collected].result())
                    n_collected += 1
                if use_cols_wire and mesh is not None:
                    # packed + sharded: scan per shard group (payload
                    # offsets restart per group so gathers stay local),
                    # stack, shard_map — the mesh path now pipelines and
                    # packs exactly like the single-chip fast path
                    t0 = time.perf_counter()
                    per = -(-len(chunk) // n_shards)
                    groups = []
                    wires = []
                    try:
                        for s in range(n_shards):
                            g = chunk[s * per : (s + 1) * per]
                            arrays, w = _scan_cols_wire(g, level, rows, nb,
                                                        b_cap=per)
                            # hold the buffer NOW: every shard group
                            # shares the pool key (per, nb, level, rows),
                            # and until the dispatch future exists free()
                            # would hand group s's buffers to group s+1
                            # (reset + payload overwrite -> wrong PCM for
                            # shard s)
                            w.fut = _SCAN_HOLD
                            groups.append((g, arrays))
                            wires.append(w)
                        out.summary.scan_s += time.perf_counter() - t0
                        fut = submitter.submit(
                            _dispatch_cols_wire_sharded, mesh, groups,
                            wires, level, rows, nb, eff,
                        )
                    except BaseException:
                        # a failed scan/submit must not leave the holds
                        # pinned forever (the pool keeps busy buffers
                        # unconditionally -> unbounded leak on retry)
                        for w in wires:
                            w.fut = None
                        raise
                    for w in wires:
                        w.fut = fut
                    pending.append(fut)
                    continue
                if use_cols_wire:
                    t0 = time.perf_counter()
                    arrays, w = _scan_cols_wire(chunk, level, rows, nb)
                    out.summary.scan_s += time.perf_counter() - t0
                    fut = submitter.submit(
                        _dispatch_cols_wire, arrays, chunk, level, rows, nb,
                        eff, w,
                    )
                    w.fut = fut
                    pending.append(fut)
                    continue
                out._add_bucket(
                    _dispatch_dense(chunk, level, rows, nb, wlen, mesh,
                                    n_shards, synth_fn,
                                    pack=pack and eff == "jax")
                )
        for fut in pending[n_collected:]:
            out._add_bucket(fut.result())
    finally:
        submitter.shutdown(wait=False)

    s = out.summary
    for b in out._buckets:
        block_len = b.rows << b.level
        for e in b.entries:
            if e.open_failed:
                s.n_failed += 1
                continue
            s.samples += e.n_good * block_len
            if e.first_err in (0, ACM_EXPECTED_EOF):
                s.n_ok += 1
            else:
                s.n_partial += 1
    s.n_failed += len(out._failed)
    s.wall_s = time.perf_counter() - t_start
    logger.debug("corpus decode: %s", s.as_dict())
    return out


def _dispatch_dense(chunk, level, rows, nb, wlen, mesh, n_shards, synth_fn,
                    pack: bool) -> _BucketOut:
    """Dense-tensor path: oracle-or-native scan, optional per-block packing,
    optional mesh sharding (used for pallas backend, mesh runs, pack=False)."""
    cols = 1 << level
    b = _round_up(len(chunk), n_shards)
    k = np.zeros((b, nb, rows, cols), dtype=np.int16)
    vals = np.zeros((b, nb), dtype=np.int32)
    for j, e in enumerate(chunk):
        data = e.load_data()
        if e.open_failed:
            continue  # row stays zero; _finalize reports ERR_OPEN
        scan = scan_bytes(data)
        e.n_good = scan.n_blocks
        _, e.first_err = _n_good(scan.events)
        e.events = scan.events
        if scan.n_exceptions:
            _host_decode_fallback(e, data)  # stale-amp-table: exact path
        n = min(e.n_good, nb)
        if n:
            k[j, :n] = scan.k[:n]
            vals[j, :n] = scan.val[:n].astype(np.int32)
    wrap0 = np.zeros((b, wlen), dtype=np.int32)

    if mesh is None and pack:
        # pack coefficients for the wire; unpack happens on device (class
        # counts padded to multiples of 64 blocks to bound compiled shapes)
        from ..ops.packing import class_counts, pack_blocks
        from ..ops.synth_jax import synth_pcm_packed

        kflat = k.reshape(b * nb, rows, cols)
        pads = tuple(_round_up(c, 64) for c in class_counts(kflat))
        pk = pack_blocks(kflat, pad_to=pads)
        pcm, _ = synth_pcm_packed(
            jnp.asarray(pk.p4), jnp.asarray(pk.p8), jnp.asarray(pk.p16),
            jnp.asarray(pk.idx4), jnp.asarray(pk.idx8), jnp.asarray(pk.idx16),
            jnp.asarray(vals), jnp.asarray(wrap0),
            level=level, rows=rows, batch=b, nb=nb,
        )
    else:
        args = (jnp.asarray(k), jnp.asarray(vals), jnp.asarray(wrap0))
        if mesh is not None:
            shardings = (
                NamedSharding(mesh, P("files", None, None, None)),
                NamedSharding(mesh, P("files", None)),
                NamedSharding(mesh, P("files", None)),
            )
            args = tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
        pcm, _ = synth_fn(*args, level=level, rows=rows)
    return _BucketOut(level=level, rows=rows, entries=chunk, pcm=pcm)


#: bounded: the key includes per-shard wire lengths, so varied-shape
#: workloads (fuzzers, mixed serving) would otherwise grow a jit-object
#: entry per distinct layout forever (eviction just re-jits on next use)
@functools.lru_cache(maxsize=256)
def _sharded_cols_fn(mesh: Mesh, level: int, rows: int, batch: int, nb: int,
                     backend: str, lens: tuple):
    """shard_map'd per-device slice+unpack+synth over per-shard wire blobs.

    Each shard's whole wire (cls/payload streams/width nibbles/vals/
    wrap) rides in one uint8 blob row sharded along the file axis; the
    payload streams are scanned per shard group (offsets restart at zero
    per group) so the cumsum gather inside synth_pcm_cols stays
    shard-local — zero collectives, embarrassingly parallel
    (SURVEY §2.3.1).
    """
    from jax import shard_map

    from ..ops.synth_jax import synth_pcm_cols_blob

    n_shards = int(np.prod(mesh.devices.shape))

    def per_shard(blob):  # blob: uint8 [1, total] (this shard's wire)
        pcm, wrapf = synth_pcm_cols_blob(
            blob[0], level=level, rows=rows, batch=batch // n_shards,
            nb=nb, backend=backend, lens=lens,
        )
        return pcm, wrapf

    spec_b = P("files")
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the default replication check rejects; the program
    # is embarrassingly parallel (no collectives), so the check buys nothing
    return jax.jit(shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec_b,),
        out_specs=(spec_b, spec_b),
        check_vma=False,
    ))


def _dispatch_cols_wire_sharded(mesh, groups, wires, level: int, rows: int,
                                nb: int, backend: str) -> _BucketOut:
    """Mesh half of the packed path: coalesce each shard group's wire
    into ONE uint8 blob placed straight onto its device (one transfer
    per shard — the relay's per-array fixed cost dominates multi-array
    puts) and assemble the global [n_shards, total] blob with
    make_array_from_single_device_arrays — no host-side re-stack into
    fresh zeroed buffers. Payload slices are cut to a common
    4096-rounded length from the uniform-capacity pools so every
    shard's blob has identical layout."""
    n_shards = len(groups)
    cols = 1 << level
    b_shard = wires[0].cls.shape[0]
    devices = list(mesh.devices.flat)
    sh_b = NamedSharding(mesh, P("files"))

    # common padded payload lengths (clamped to the uniform pool capacity;
    # even, for the device's uint16 stream view)
    def _common(idx, pool):
        n = min(_round_up(max(g[1][idx].shape[0] for g in groups), 4096),
                len(pool))
        return n - (n & 1)

    n4 = _common(1, wires[0].pay4)
    n8 = _common(2, wires[0].pay8)
    n16 = _common(3, wires[0].pay16)
    nw4 = _common(4, wires[0].wid4)
    nw8 = _common(5, wires[0].wid8)
    nw16 = _common(6, wires[0].wid16)

    wlen = 2 * cols - 2
    zero_wrap = np.zeros((b_shard, wlen), dtype=np.int32)
    lens = (n4, n8, n16, nw4, nw8, nw16)
    pieces = []
    total = None
    for s, w in enumerate(wires):
        blob, _ = _coalesce_wire(
            (w.cls, w.pay4[:n4], w.pay8[:n8], w.pay16[:n16], w.wid4[:nw4],
             w.wid8[:nw8], w.wid16[:nw16], w.vals, zero_wrap), w)
        total = len(blob)
        pieces.append(jax.device_put(blob[None], devices[s]))
        w.dev = (pieces[-1],)
    B = n_shards * b_shard
    global_blob = jax.make_array_from_single_device_arrays(
        (n_shards, total), sh_b, pieces)
    fn = _sharded_cols_fn(mesh, level, rows, B, nb, backend, lens)
    pcm, _ = fn(global_blob)
    # entries in group-major order; padding rows only ever trail the
    # entries (groups are prefix-full), so entry j is pcm row j
    entries = [e for g, _ in groups for e in g]
    return _BucketOut(level=level, rows=rows, entries=entries, pcm=pcm)


#: windowed stream scan statuses (mirror _scan.cpp)
_EXPECTED_EOF = -99
_NEED_MORE_DATA = -98


class _StreamReader:
    """Incremental byte feeder for decode_stream_device: wraps a path,
    bytes, or read()-only object; never holds more than what the caller's
    window needs (paths are NOT slurped)."""

    def __init__(self, src: Source):
        self._close = None
        if isinstance(src, (bytes, bytearray)):
            import io as _io

            self._f = _io.BytesIO(src)
        elif hasattr(src, "read"):
            self._f = src
        else:
            self._f = open(src, "rb")
            self._close = self._f.close

    def read(self, n: int) -> bytes:
        return self._f.read(n) or b""

    def close(self) -> None:
        if self._close is not None:
            self._close()


def decode_stream_device(
    source: Source,
    *,
    mesh: Mesh | None = None,
    axis: str = "blocks",
    force_chans: int = 0,
    window_blocks: int | None = None,
) -> tuple[jax.Array, FileResult]:
    """Decode ONE stream with its block axis sharded across a mesh.

    The sequence-parallel analog (SURVEY §5 long-context): the carry-free
    synthesis formulation (ops.synth_jax — block i's pass-p carry is block
    i-1's pass-p input tail) makes the block axis pure data parallelism;
    sharding along it lets XLA insert the 2-row halo exchanges as
    collective-permutes over ICI automatically. Returns (pcm int16
    device array [nb, block_len] sharded along `axis`, FileResult with
    pcm=None carrying status/filler metadata).

    This is the SAME pipeline as the corpus path: windowed native packed
    scan → cols-wire chunks → device unpack + synth, with the filterbank
    carry threaded chunk to chunk ON DEVICE (never fetched). With
    `window_blocks=W`, host residency is O(byte window + one chunk's
    wire): each W-block wire chunk is dispatched as soon as it is
    scanned, so a huge file genuinely spans chips without ever being
    host-resident (the capability the reference approximates by
    streaming, decode.c:29,41-67); `source` may be a read()-only object.
    Default (None): one full-file window. Stale-amp-table streams
    (hostile input) fall back to the exact host decoder (O(file)): in
    full-file mode the bytes are already in hand (read()-only sources
    included), while the WINDOWED scan must re-read the stream — from a
    consumed read()-only source that is impossible, and a ValueError
    says so (AcmStream's windowed mode handles hostile pipes exactly
    instead).
    """
    from ..ops.synth_jax import synth_pcm_cols, synth_pcm_cols_blob
    from ..scan import native as _native

    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    use_native = _native.available()
    full_data: bytes | None = None  # full-file mode keeps the bytes in hand
    if not use_native or window_blocks is None:
        # one full-file window (and the only mode without the native
        # scanner, which then routes through the exact oracle fallback)
        try:
            if hasattr(source, "read") and not isinstance(
                    source, (bytes, bytearray)):
                data = bytes(source.read())  # fresh read()-only object
            else:
                data = _read_source(source)
        except OSError as exc:
            raise AcmException(AcmError.ERR_OPEN) from exc
        header = parse_header(BitReader(data))
        if header is None:
            raise AcmException(AcmError.ERR_NOT_ACM)
        full_data = data
        reader = _StreamReader(data[_stream_data_start(header):])
        # implicit window cap: the device unpack computes bit offsets in
        # int32, so one window's payload stream must stay under 2^31
        # bits — a huge file silently becomes multi-window
        W = max(min(header.max_blocks_in(len(data)),
                    (1 << 27) // max(header.block_len, 1) + 1), 1)
        nbytes = len(data)
    else:
        reader0 = _StreamReader(source)
        head = bytearray()
        while len(head) < 64:
            got = reader0.read(1 << 16)
            if not got:
                break
            head += got
        header = parse_header(BitReader(bytes(head)))
        if header is None:
            reader0.close()
            raise AcmException(AcmError.ERR_NOT_ACM)
        reader = _StreamReader(
            _PrefixedReader(head[_stream_data_start(header):], reader0))
        W = window_blocks
        nbytes = 0  # unknown; the windowed scan discovers the stream end

    e = _FileEntry(
        index=0, src=source, header=header, nbytes=nbytes,
        channels=resolve_channels(header.channels, header.wavc_file,
                                  force_chans),
    )
    level, rows, bl = header.level, header.rows, header.block_len
    wlen = max(header.wrapbuf_len, 1)
    W = max(_round_up(W, n_shards), n_shards)

    sh_blk = (NamedSharding(mesh, P(axis, None)) if mesh is not None
              else None)
    state = {"oor": not use_native, "events": []}
    pcm_parts = []
    if use_native:
        # dispatch each wire chunk as it is scanned; the wrap carry flows
        # chunk to chunk without leaving the device
        sh_cls = (NamedSharding(mesh, P(None, axis, None))
                  if mesh is not None else None)
        sh_v = (NamedSharding(mesh, P(None, axis)) if mesh is not None
                else None)
        sh_r = NamedSharding(mesh, P()) if mesh is not None else None
        backend = resolve_device_backend("auto", level, rows)
        wrapf = jnp.zeros((1, wlen), jnp.int32)
        if sh_r is not None:
            wrapf = jax.device_put(wrapf, sh_r)
        for (cls, pay4, pay8, pay16, wid4, wid8, wid16,
             vals) in _stream_wire_chunks(reader, e, W, state):
            if mesh is None:
                # single chip: one coalesced blob per window chunk (the
                # relay's per-array transfer cost — see _coalesce_wire);
                # the wrap carry stays a device array, not blob bytes
                blob, lens = _coalesce_wire(
                    (cls[None], pay4, pay8, pay16, wid4, wid8, wid16,
                     vals[None]))
                pcm_c, wrapf = synth_pcm_cols_blob(
                    jax.device_put(blob), wrapf, level=level, rows=rows,
                    batch=1, nb=W, backend=backend, lens=lens,
                )
                pcm_parts.append(pcm_c.reshape(W, bl))
                continue
            args = [cls[None], pay4, pay8, pay16, wid4, wid8, wid16,
                    vals[None]]
            args[0] = jax.device_put(args[0], sh_cls)
            args[7] = jax.device_put(args[7], sh_v)
            args[1:7] = [jax.device_put(a, sh_r) for a in args[1:7]]
            pcm_c, wrapf = synth_pcm_cols(
                *args, wrapf, level=level, rows=rows, batch=1, nb=W,
                backend=backend,
            )
            pcm_parts.append(pcm_c.reshape(W, bl))
    reader.close()

    e.events = (np.concatenate(state["events"]) if state["events"]
                else np.zeros(0, dtype=np.int16))
    if state["oor"]:
        # stale-amp-table stream (hostile input) or no native scanner:
        # only the exact host decode reproduces the reference — which
        # needs the stream from the start (the dirty-table values depend
        # on every prior block). Full-file mode already holds the whole
        # stream; only the windowed scan must re-read the source.
        data = full_data if full_data is not None else _reread_source(source)
        if data is None:
            raise ValueError(
                "hostile (stale-amp-table) stream from an unseekable "
                "source: the exact decode must re-read the stream; pass "
                "bytes/a path/a seekable object, or use "
                "AcmStream(window_blocks=N), which reproduces the "
                "stale-table semantics on the host in O(window) memory")
        _host_decode_fallback(e, data)
        nbp = max(_round_up(max(e.n_good, 1), n_shards), n_shards)
        full = np.zeros(nbp * bl, dtype=np.int16)
        n = min(len(e.host_pcm), nbp * bl)
        full[:n] = e.host_pcm[:n]
        pcm = full.reshape(nbp, bl)
        pcm = (jax.device_put(pcm, sh_blk) if sh_blk is not None
               else jnp.asarray(pcm))
    else:
        _, e.first_err = _n_good(e.events)
        pcm = (jnp.concatenate(pcm_parts, axis=0) if len(pcm_parts) > 1
               else pcm_parts[0] if pcm_parts
               else jnp.zeros((n_shards, bl), jnp.int16))
    meta = _finalize(e, np.zeros(0, np.int16), bl)
    meta.pcm = None
    return pcm, meta


class _PrefixedReader:
    """read()-only view that serves buffered head bytes first."""

    def __init__(self, pre: bytearray, rd: "_StreamReader"):
        self._pre, self._rd = bytearray(pre), rd

    def read(self, n: int) -> bytes:
        if self._pre:
            out = bytes(self._pre[:n])
            del self._pre[:n]
            return out
        return self._rd.read(n)


def _stream_data_start(header: AcmHeader) -> int:
    from ..format import ACM_HEADER_LEN, WAVC_HEADER_LEN

    return ACM_HEADER_LEN + (WAVC_HEADER_LEN if header.wavc_file else 0)


def _stream_wire_chunks(reader: "_StreamReader", e: _FileEntry, W: int,
                        state: dict):
    """Windowed packed scan of one stream, yielding full wire chunks.

    Each yielded chunk is (cls [W, stride], pay4, pay8, pay16, vals [W])
    covering W committed blocks (the final chunk may cover fewer; its
    tail rows are zero). Host residency: the byte window + one chunk's
    wire. Sets state["oor"] (stale-amp-table: caller must fall back) and
    appends per-window event arrays to state["events"]; e.n_good tracks
    committed blocks. The scan's first pass over data the window didn't
    fully cover is rolled back and retried with a grown window
    (NEED_MORE_DATA), so re-emission stays clean.
    """
    from ..scan import native as _native

    hdr = e.header
    level, rows, cols = hdr.level, hdr.rows, hdr.cols
    buf = bytearray()
    bit = 0
    eof = False
    # The reference stops reading once total_values words are delivered
    # (acm_read clamp, decode.c:853-854) — it never attempts the next
    # block, so bits past the declared block count must not contribute
    # events/status (the one-shot corpus scan bounds max_blocks by
    # header.n_blocks the same way; fuzz seed 9202: a clean stream with
    # trailing bits read as a doomed attempt turned status 0 into -7).
    remaining = hdr.n_blocks
    # initial prefetch guess: ~4 wire bits/sample + block/column headers
    need = max(1 << 16, (W * (rows * cols * 4 + 20 + 5 * cols)) // 8)
    bufs = _native.CorpusScanBuffers()
    while True:
        while not eof and len(buf) < need:
            got = reader.read(max(need - len(buf), 1 << 16))
            if not got:
                eof = True
                break
            buf += got
        if not bufs.fits(len(buf)):
            bufs = _native.CorpusScanBuffers(
                max_file_bytes=len(buf) + (1 << 16))
        c4, c8, c16, cw = _native.pay_stream_caps(W * cols, rows)
        cls = np.zeros((W, (cols + 3) // 4), dtype=np.uint8)
        pwr = np.zeros(W, dtype=np.uint8)
        vals = np.zeros(W, dtype=np.uint16)
        pay4 = np.zeros(c4, dtype=np.uint8)
        pay8 = np.zeros(c8, dtype=np.uint8)
        pay16 = np.zeros(c16, dtype=np.uint8)
        wid4 = np.zeros(cw, dtype=np.uint8)
        wid8 = np.zeros(cw, dtype=np.uint8)
        wid16 = np.zeros(cw, dtype=np.uint8)
        ng, _err, ncol, bits, oor, events = _native.scan_corpus_into(
            memoryview(buf), hdr, cls, pwr, vals, pay4, pay8, pay16,
            wid4, wid8, wid16, bufs, start_bit=bit, final=eof,
            max_blocks=min(W, remaining),
        )
        status = int(bufs.meta[2])
        resume = int(bufs.meta[10])
        if oor:
            state["oor"] = True
            return
        if status == _NEED_MORE_DATA and not eof:
            # window ran dry mid-scan: grow it and rescan from the window
            # start (fresh wire buffers per attempt: re-emission is clean)
            need = int(need * 1.7) + (1 << 16)
            continue
        state["events"].append(events)
        if ng > 0:
            e.n_good += ng
            remaining -= ng

            def _sl(a, used_bytes):
                # next-power-of-two bucketing: chunk shapes stay stable
                # across windows (bounded compile variants), bytes stay
                # within 2x of used
                n = max(256, 1 << (used_bytes + 1).bit_length())
                return a[: min(n, len(a) - (len(a) & 1))]

            yield (cls, _sl(pay4, -(-bits[0] // 8)),
                   _sl(pay8, -(-bits[1] // 8)),
                   _sl(pay16, -(-bits[2] // 8)),
                   _sl(wid4, -(-ncol[0] // 2)),
                   _sl(wid8, -(-ncol[1] // 2)),
                   _sl(wid16, -(-ncol[2] // 2)), vals)
        if status == _EXPECTED_EOF or remaining <= 0:
            return
        # full window committed (status 0): drop consumed bytes and keep
        # scanning — the buffer may still hold undecoded blocks even at
        # reader EOF; the final=True pass ends it with EXPECTED_EOF.
        # (Rebuild instead of `del buf[:drop]`: the ctypes call keeps a
        # cyclic export of the old buffer alive until gc, which would
        # make an in-place resize raise BufferError.)
        drop = resume // 8
        buf = bytearray(memoryview(buf)[drop:])
        bit = resume - 8 * drop


#: decode_corpus_host batching bounds: a batch holds at most this many
#: files / input bytes, so host residency stays O(batch) of raw bytes
#: (decoded PCM is O(corpus) regardless — the caller keeps every result)
_HOST_BATCH_FILES = 256
_HOST_BATCH_BYTES = 128 << 20


def decode_corpus_host(
    sources: Sequence[Source],
    *,
    force_chans: int = 0,
    workers: int = 1,
) -> list[FileResult]:
    """Pure-host corpus decode: fused C++ scan+synth, batched native calls.

    The host-output fast path: when the consumer needs PCM bytes on the
    host (CLI, WAV transcode, `decode_corpus`), synthesizing on device and
    fetching back wastes the device↔host link; the fused native pipeline
    (scan + filterbank + int16 in one cache-resident sweep per block,
    `_scan.cpp acm_decode_host`) beats the reference's single-core decode
    (acmtool.c:269-291 read loop) outright. Files cross the ctypes
    boundary in batches (`acm_decode_corpus_host_batch`) — one
    GIL-released native sweep per ~256 files instead of a Python round
    trip per file. Raw input bytes are held O(batch), not O(corpus).

    `workers > 1` decodes batches concurrently: the native call releases
    the GIL and every scratch/PCM pool is thread-local, so throughput
    scales with physical cores (unlike the strictly single-threaded
    reference). Results are index-ordered either way.
    """
    from ..scan import native as _native

    results: list[FileResult | None] = [None] * len(sources)

    def _run_batch(lo: int, hi: int) -> None:
        # read + header-parse this slice; failures resolve immediately
        blobs: list[bytes] = []
        headers = []
        idxs: list[int] = []
        for i in range(lo, hi):
            try:
                data = _read_source(sources[i])
            except OSError:
                results[i] = FileResult(index=i, info=None, pcm=None,
                                        status=int(AcmError.ERR_OPEN))
                continue
            header = parse_header(BitReader(data))
            if header is None:
                results[i] = FileResult(index=i, info=None, pcm=None,
                                        status=int(AcmError.ERR_NOT_ACM))
                continue
            blobs.append(data)
            headers.append(header)
            idxs.append(i)
        for s in range(0, len(idxs), _HOST_BATCH_FILES):
            # secondary split on input bytes so a batch of huge files
            # doesn't pin the whole slice's raw bytes at once
            t = s
            while t < min(s + _HOST_BATCH_FILES, len(idxs)):
                u = t
                nbytes = 0
                while (u < min(s + _HOST_BATCH_FILES, len(idxs))
                       and (u == t or nbytes + len(blobs[u])
                            <= _HOST_BATCH_BYTES)):
                    nbytes += len(blobs[u])
                    u += 1
                batch = _native.decode_corpus_host_batch(blobs[t:u],
                                                         headers[t:u])
                for off, bf in enumerate(batch):
                    i = idxs[t + off]
                    header = headers[t + off]
                    e = _FileEntry(
                        index=i, src=sources[i], header=header,
                        nbytes=len(blobs[t + off]),
                        channels=resolve_channels(header.channels,
                                                  header.wavc_file,
                                                  force_chans),
                    )
                    if bf.overflowed:
                        # heavily corrupt stream: its attempt list blew
                        # the batch's event slot — exact solo rescan
                        _apply_host_decode(
                            e, _native.decode_host(blobs[t + off], header))
                    else:
                        e.n_good = bf.n_good
                        e.first_err = bf.first_err
                        e.events = bf.events
                        e.host_pcm = bf.pcm
                    results[i] = _finalize(e, e.host_pcm, header.block_len)
                    blobs[t + off] = b""  # release raw bytes eagerly
                t = u

    if workers <= 1 or len(sources) <= 1:
        _run_batch(0, len(sources))
    else:
        step = -(-len(sources) // workers)
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(lambda lo: _run_batch(lo, min(lo + step,
                                                      len(sources))),
                        range(0, len(sources), step)))
    return results  # type: ignore[return-value]


def decode_corpus(
    sources: Sequence[Source],
    *,
    force_chans: int = 0,
    mesh: Mesh | None = None,
    backend: str = "auto",
    chunk_files: int | None = None,
    pack: bool = True,
    config: CorpusConfig | None = None,
) -> list[FileResult]:
    """Decode a corpus of ACM/WAVC files; PCM lands on the host per file.

    backend="auto" (default) picks the fused host pipeline when available —
    host-bound output should never pay a device round-trip — and otherwise
    falls back to device synthesis + fetch. Pass "jax"/"pallas" to force
    device synthesis (e.g. when the same corpus is also consumed on device)
    or "host" to require the native path. A `mesh` implies device decode.
    """
    host_workers = 1
    if config is not None:
        # a config wins over the keyword arguments entirely, exactly as in
        # decode_corpus_device — two entry points, one precedence rule
        force_chans = config.force_chans
        chunk_files = config.chunk_files
        pack = config.pack
        backend = config.backend
        host_workers = config.host_workers
    if backend in ("auto", "host") and mesh is None:
        from ..scan import native as _native

        if _native.available():
            return decode_corpus_host(sources, force_chans=force_chans,
                                      workers=host_workers)
        if backend == "host":
            raise RuntimeError("native host decoder unavailable")
    if backend in ("auto", "host"):
        backend = "jax"
    return decode_corpus_device(
        sources, force_chans=force_chans, mesh=mesh, backend=backend,
        chunk_files=chunk_files, pack=pack, config=config,
    ).to_results()
