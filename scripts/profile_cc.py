"""Micro-benchmark the CC Pallas kernel: time vs max_checks + convergence.

Uses both a realistic multi-blob mask and the bench-style random-weight
network mask (noisier, more components) at 480x640.
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timeit(fn, *args, iters=20):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.ops.connected_components import (
        label_components_pallas,
    )

    rng = np.random.default_rng(0)
    h, w = 480, 640

    # blobs: realistic clean scene
    blobs = np.zeros((1, h, w), bool)
    for _ in range(6):
        y, x = rng.integers(0, h - 120), rng.integers(0, w - 120)
        blobs[0, y:y + int(rng.integers(40, 120)),
              x:x + int(rng.integers(40, 120))] = True

    # noise: bench-style random-weight mask (many specks)
    noise = (rng.random((1, h, w)) > 0.72)

    for name, fg in (("blobs", blobs), ("noise", noise)):
        fg_j = jnp.asarray(fg)
        base = None
        for mc in (1, 2, 3, 4, 8, 64):
            f = jax.jit(lambda m, mc=mc: label_components_pallas(
                m, max_checks=mc))
            dt = timeit(f, fg_j)
            lab = np.asarray(f(fg_j))
            if mc == 64:
                base = lab
            print(f"{name}: max_checks={mc:3d} {dt*1e3:7.3f} ms", flush=True)
        # how many checks until converged?
        for mc in (1, 2, 3, 4, 8):
            f = jax.jit(lambda m, mc=mc: label_components_pallas(
                m, max_checks=mc))
            lab = np.asarray(f(fg_j))
            if np.array_equal(lab, base):
                print(f"{name}: converged by max_checks={mc}")
                break


if __name__ == "__main__":
    main()
