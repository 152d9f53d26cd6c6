"""10k-file random-access RSS sweep (BASELINE config 5 evidence run).

Synthesizes a 10,000-file corpus on disk, then random-access-reads a
segment from every file through `RandomAccessCorpus` (default
`max_cached_files=8`) in two passes — forward, then a shuffled revisit
that reuses the cached indexes — and reports peak RSS against the
corpus size. The reference's analog is `acm_seek_pcm` per file
(`/root/reference/src/util.c:214-253`), which holds one stream at a
time; the corpus wrapper must likewise hold O(few files), not O(corpus).

Usage: PYTHONPATH=. LIBACM_TPU_PLATFORM=cpu python tools/rss_sweep.py [n_files]
Prints one summary line; exits nonzero if RSS grew by more than
RSS_BUDGET_MB over the post-synthesis baseline.
"""

import pathlib
import resource
import sys
import time

import numpy as np

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
RSS_BUDGET_MB = 256.0  # few files + index LRU + allocator slack
CORPUS_DIR = pathlib.Path(f"/tmp/libacm_tpu_rss_sweep_{N_FILES}")


def rss_mb() -> float:
    """CURRENT resident set (VmRSS), not ru_maxrss: the in-process corpus
    synthesis sets a lifetime peak that would mask all serving-phase
    growth (peak-vs-peak reads 0 even if serving held the whole corpus).
    What the sweep bounds — LRU cache residency — is persistent, so
    current RSS sampled after each pass captures it."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    from libacm_tpu import testing
    from libacm_tpu.parallel import RandomAccessCorpus

    CORPUS_DIR.mkdir(parents=True, exist_ok=True)
    files = [CORPUS_DIR / f"f{i:05d}.acm" for i in range(N_FILES)]
    t0 = time.perf_counter()
    for i, f in enumerate(files):
        if f.exists():
            continue
        rng = np.random.default_rng(7000 + i)
        f.write_bytes(testing.speech_acm_bytes(
            rng, level=3 + i % 3, rows=8 + 4 * (i % 5), n_blocks=4,
            channels=1 + i % 2))
    corpus_mb = sum(f.stat().st_size for f in files) / 1e6
    print(f"corpus: {N_FILES} files, {corpus_mb:.1f} MB on disk "
          f"(synth {time.perf_counter() - t0:.1f} s)", file=sys.stderr)

    rac = RandomAccessCorpus([str(f) for f in files])
    base = rss_mb()
    t0 = time.perf_counter()
    order = list(range(N_FILES))
    for i in order:
        rac.read(i, 5, 30)
    fwd_s = time.perf_counter() - t0
    rss_fwd = rss_mb()
    np.random.default_rng(0).shuffle(order)
    t0 = time.perf_counter()
    for i in order:
        rac.read(i, 5, 30)
    rev_s = time.perf_counter() - t0
    grew = max(rss_fwd, rss_mb()) - base
    ok = grew <= RSS_BUDGET_MB and rac.cached_files <= 8
    print(f"rss_sweep: n={N_FILES} corpus={corpus_mb:.1f}MB "
          f"rss_base={base:.1f}MB rss_growth={grew:.1f}MB "
          f"cached_files={rac.cached_files} "
          f"indexes={len(rac._index_lru)} "
          f"fwd={fwd_s:.1f}s revisit={rev_s:.1f}s "
          f"{'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
