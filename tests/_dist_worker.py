"""Worker process for the multi-process distributed test.

Usage: python _dist_worker.py <coordinator> <num_procs> <proc_id> <corpus_dir>

Bootstraps jax.distributed on the CPU backend, decodes this process's
static manifest shard, all-reduces the summary, and (process 0) prints the
global totals as one `RESULT {...}` JSON line.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    coord, n, pid, corpus_dir = sys.argv[1:5]
    from libacm_tpu.parallel import decode_corpus_device, distributed as dist

    dist.initialize(coord, int(n), int(pid))
    assert jax.process_count() == int(n), jax.process_count()

    paths = sorted(pathlib.Path(corpus_dir).glob("*.acm"))
    mine = dist.shard_manifest(paths)
    out = decode_corpus_device([str(p) for p in mine]).block_until_ready()
    local_sum = int(out.checksum())
    summary = dist.allreduce_summary(out.summary)
    if jax.process_index() == 0:
        d = summary.as_dict()
        d["shard_files"] = len(mine)
        print("RESULT " + json.dumps(d), flush=True)
    print("SHARD " + json.dumps(
        {"files": len(mine), "checksum": local_sum}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
