"""Feed an ACM corpus into a (mock) TPU training loop as fixed-size frames.

    python examples/training_ingest.py DIR [frame_samples]

Shows the device-resident path: PCM never returns to the host; a toy
jitted "feature" step consumes it directly.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp

from libacm_tpu.parallel import decode_corpus_device


@jax.jit
def feature_step(pcm_i16):
    x = pcm_i16.astype(jnp.float32) / 32768.0
    return jnp.mean(x * x)  # stand-in for a real model step


def main(argv):
    paths = sorted(pathlib.Path(argv[0]).glob("*.acm"))
    corpus = decode_corpus_device([str(p) for p in paths])
    energies = []
    for indices, pcm in corpus.device_arrays():
        energies.append((indices, feature_step(pcm)))
    for indices, e in energies:
        print(f"files {indices}: mean energy {float(e):.6f}")
    print("summary:", corpus.summary.as_dict())


if __name__ == "__main__":
    main(sys.argv[1:])
