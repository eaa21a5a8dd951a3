"""Head-to-head vote-kernel variants on TPU."""

import functools
import time

import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.ops.voting import (
        vote_counts_jnp,
        vote_counts_pallas,
    )

    rng = np.random.default_rng(0)
    M, P = 16, 1024
    pts = jnp.asarray(rng.uniform(0, 640, (M, P, 2)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(M, P, 2)), jnp.float32)
    pv = jnp.ones((M, P), jnp.float32)

    for H in (1024, 4096):
        hyps = jnp.asarray(rng.uniform(0, 640, (M, H, 2)), jnp.float32)
        evals = M * H * P / 1e6

        for mb, th, tp, tag in [
            (8, 128, 128, "mb8 th128 tp128"),
            (8, 128, 256, "mb8 th128 tp256"),
            (8, 256, 512, "mb8 th256 tp512"),
            (8, 512, 1024, "mb8 th512 tp1024"),
            (16, 256, 256, "mb16 th256 tp256"),
        ]:
            try:
                f = jax.jit(functools.partial(
                    vote_counts_pallas, inlier_thresh=0.999,
                    m_block=mb, h_tile=th, p_tile=tp,
                ))
                t = timeit(f, hyps, pts, dirs, pv)
                print(f"H={H} pallas {tag}: {t:7.2f} ms  ({evals/t:.0f} Meval/ms)")
            except Exception as e:
                print(f"H={H} pallas {tag}: FAILED {type(e).__name__}")

        f = jax.jit(functools.partial(vote_counts_jnp, inlier_thresh=0.999,
                                      p_chunk=256))
        t = timeit(f, hyps, pts, dirs, pv)
        print(f"H={H} jnp fallback   : {t:7.2f} ms  ({evals/t:.0f} Meval/ms)")


if __name__ == "__main__":
    main()
