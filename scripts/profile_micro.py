"""Micro-profile the post-network ops on TPU to guide optimization."""

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
    from jax import lax

    rng = np.random.default_rng(0)
    B, H, W, C = 1, 480, 640, 7
    HW = H * W

    mask_logits = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(B, H, W, C - 1, 4)), jnp.float32)
    xy = jnp.asarray(rng.normal(size=(B, H, W, C - 1, 2)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(B, H, W, C - 1)), jnp.float32)
    scales = jnp.asarray(rng.normal(size=(B, H, W, C - 1, 3)), jnp.float32)

    f_argmax = jax.jit(lambda m: jnp.argmax(m, axis=-1).astype(jnp.int32))
    cat = f_argmax(mask_logits)
    print(f"argmax:            {timeit(f_argmax, mask_logits):7.2f} ms")

    def onehot_sum(cm, q, x, zz, s):
        oh = jax.nn.one_hot(cm - 1, C - 1, dtype=jnp.float32)
        return (
            jnp.sum(q * oh[..., None], 3),
            jnp.sum(x * oh[..., None], 3),
            jnp.sum(zz * oh, 3),
            jnp.sum(s * oh[..., None], 3),
        )

    f_oh = jax.jit(onehot_sum)
    print(f"onehot multiply:   {timeit(f_oh, cat, quat, xy, z, scales):7.2f} ms")

    def packed(cm, q, x, zz, s):
        field = jnp.concatenate([q, x, zz[..., None], s], axis=-1)  # [B,H,W,6,10]
        oh = jax.nn.one_hot(cm - 1, C - 1, dtype=jnp.float32)
        out = jnp.sum(field * oh[..., None], axis=3)  # [B,H,W,10]
        return out

    f_packed = jax.jit(packed)
    print(f"packed onehot:     {timeit(f_packed, cat, quat, xy, z, scales):7.2f} ms")

    def hw_major(cm, q, x, zz, s):
        field = jnp.concatenate([q, x, zz[..., None], s], axis=-1)
        f2 = field.reshape(B, HW, (C - 1) * 10).transpose(0, 2, 1)  # [B,60,HW]
        oh = jax.nn.one_hot(cm.reshape(B, HW) - 1, C - 1, dtype=jnp.float32)
        oh2 = oh.transpose(0, 2, 1)  # [B,6,HW]
        f3 = f2.reshape(B, C - 1, 10, HW)
        out = jnp.sum(f3 * oh2[:, :, None, :], axis=1)  # [B,10,HW]
        return out

    f_hw = jax.jit(hw_major)
    print(f"hw-major onehot:   {timeit(f_hw, cat, quat, xy, z, scales):7.2f} ms")

    # --- CC internals ---
    from fastposecnn_tpu.ops.connected_components import (
        _segmented_run_min, label_components,
    )

    fg = cat > 0
    f_scan1 = jax.jit(
        lambda m: _segmented_run_min(
            jnp.where(m[0], jnp.arange(HW, dtype=jnp.int32).reshape(H, W),
                      jnp.iinfo(jnp.int32).max), m[0], 1)
    )
    print(f"one row scan:      {timeit(f_scan1, fg):7.2f} ms")

    f_label = jax.jit(label_components)
    labels = f_label(fg)
    print(f"label_components:  {timeit(f_label, fg):7.2f} ms")

    flat = labels.reshape(B, HW)
    f_scatter = jax.jit(
        lambda fl: jnp.zeros((HW,), jnp.int32)
        .at[jnp.where(fl[0] >= 0, fl[0], 0)]
        .add((fl[0] >= 0).astype(jnp.int32))
    )
    areas = f_scatter(flat)
    print(f"area scatter-add:  {timeit(f_scatter, flat):7.2f} ms")

    f_topk = jax.jit(lambda a: lax.top_k(a, 16))
    print(f"top_k(HW,16):      {timeit(f_topk, areas):7.2f} ms")

    roots = f_topk(areas)[1]
    f_masks = jax.jit(
        lambda fl, r: (fl[0][None, :] == r[:, None]).astype(jnp.float32)
    )
    masks = f_masks(flat, roots)
    print(f"mask compare:      {timeit(f_masks, flat, roots):7.2f} ms")

    dense = jnp.asarray(rng.normal(size=(B, HW, 10)), jnp.float32)
    f_mm = jax.jit(
        lambda m, d: jnp.einsum("np,bpk->bnk", m, d,
                                preferred_element_type=jnp.float32)
    )
    print(f"segment matmul:    {timeit(f_mm, masks, dense):7.2f} ms")

    # --- sampling + one vote round ---
    from fastposecnn_tpu.ops.voting import (
        generate_hypotheses, sample_mask_points, vote_counts_pallas,
    )

    inst_masks = masks.reshape(B, 16, H, W)
    xyd = jnp.asarray(rng.normal(size=(B, H, W, 2)), jnp.float32)
    f_sample = jax.jit(
        lambda k: sample_mask_points(k, inst_masks, xyd, 1024)
    )
    key = jax.random.key(0)
    pts, dirs, npts, ptv = f_sample(key)
    print(f"sample points:     {timeit(f_sample, key):7.2f} ms")

    pts2 = pts.reshape(16, 1024, 2)
    dirs2 = dirs.reshape(16, 1024, 2)
    f_hyp = jax.jit(lambda k: generate_hypotheses(k, pts2, dirs2, 1024))
    hyps = f_hyp(key)
    print(f"hyp generation:    {timeit(f_hyp, key):7.2f} ms")

    pv = ptv.reshape(16, 1024).astype(jnp.float32)
    f_vote = jax.jit(
        lambda h: vote_counts_pallas(h, pts2, dirs2, pv, 0.999)
    )
    print(f"pallas vote 1024h: {timeit(f_vote, hyps):7.2f} ms")


if __name__ == "__main__":
    main()
