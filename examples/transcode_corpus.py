"""Batch-transcode a directory of ACM/WAVC files to WAV.

    python examples/transcode_corpus.py IN_DIR OUT_DIR [--force-stereo]

Equivalent to running the reference's `acmtool -d` per file, but decodes
the whole corpus in batched TPU dispatches and reports summary throughput.
"""

import pathlib
import sys
import time

from libacm_tpu import ingest
from libacm_tpu.parallel import CorpusConfig


def main(argv):
    in_dir, out_dir = pathlib.Path(argv[0]), argv[1]
    force = 2 if "--force-stereo" in argv else 0
    # content sniffing, not extension matching: game archives hide ACM
    # payloads under arbitrary suffixes (the players' typefind analog)
    paths = ingest.walk_acm(in_dir)
    t0 = time.perf_counter()
    results = ingest.decode_to_wav_dir(
        paths, out_dir, config=CorpusConfig(force_chans=force))
    dt = time.perf_counter() - t0
    ok = sum(r.ok for r in results)
    samples = sum(len(r.pcm) for r in results if r.pcm is not None)
    print(f"{ok}/{len(paths)} files ok, {samples/1e6:.1f} Msamples "
          f"in {dt:.2f}s = {samples/dt/1e6:.1f} Msamples/s")
    for r in results:
        if not r.ok:
            print(f"  {paths[r.index].name}: status {r.status}")


if __name__ == "__main__":
    main(sys.argv[1:])
