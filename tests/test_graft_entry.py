"""Driver entry points stay runnable: single-chip compile check +
multi-chip dry run of the PRODUCTION sharded pipeline.

`dryrun_multichip` is what the driver records as the multi-chip artifact
(MULTICHIP_r*.json); this test pins that it exercises the real serving
path — decode_corpus_device's cols-wire/shard_map/Pallas pipeline over a
virtual-device mesh, cross-checked against the reference-pinned host
path — and not just a toy op (VERDICT r4 item 3).
"""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        leaf.block_until_ready()


def test_dryrun_multichip_production_pipeline():
    # conftest forces the CPU backend with 8 virtual devices; the dry run
    # internally asserts bit-exactness of every leg (2-D toy mesh, corpus
    # files-mesh with XLA + interpreted-Pallas back-ends, single-device
    # mesh, blocks-mesh stream) against the host path.
    graft.dryrun_multichip(8)
