"""Probe vote-kernel variants on the real chip.

Times each variant with an in-jit fori_loop repeat (the axon tunnel makes
single-call wall timing useless; 50 chained iterations amortize dispatch).
Variants:
  a) fused single dot_general per P-chunk (current)
  b) two dot_generals per P-chunk, no output slicing
  c) pure-VPU broadcast arithmetic (no MXU)
  d) VPU per-instance grid (m_block=1, whole-H tile)
"""

import functools
import sys
import time

import numpy as np


def make_inputs(m=16, h=4096, p=1024, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    centers = rng.uniform(100, 500, size=(m, 1, 2))
    pts = centers + rng.normal(size=(m, p, 2)) * 40
    d = centers - pts
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    noise = rng.normal(size=d.shape) * 0.02
    d = d + noise
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hyps = centers + rng.normal(size=(m, h, 2)) * 5
    pv = (rng.uniform(size=(m, p)) < 0.9).astype(np.float32)
    return (jnp.asarray(hyps, jnp.float32), jnp.asarray(pts, jnp.float32),
            jnp.asarray(d, jnp.float32), jnp.asarray(pv, jnp.float32))


_PENDING = []


def timeit_in_jit(fn, args, iters=8):
    """Queue fn for trace-based timing (see report_trace); returns a
    placeholder so call sites stay unchanged. The xplane trace is the only
    reliable clock through the axon tunnel."""
    _PENDING.append((fn, args, iters))
    return float("nan")


def report_trace():
    """Run all queued variants under one jax.profiler trace; print each
    pallas custom-call's device time (custom calls appear as full.* ops)."""
    import glob
    import gzip
    import json as _json

    import jax

    fns = []
    for fn, args, iters in _PENDING:
        f = jax.jit(lambda *a, fn=fn: fn(*a))
        jax.block_until_ready(f(*args))  # compile outside the trace
        fns.append((f, args, iters))
    trace_dir = "/tmp/vote_probe_trace"
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for f, args, iters in fns:
            for _ in range(iters):
                out = f(*args)
            jax.block_until_ready(out)
    tr = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    data = _json.load(gzip.open(tr))
    evs = [e for e in data["traceEvents"]
           if e.get("ph") == "X" and "dur" in e and e.get("tid") == 3]
    import collections

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        if e["name"].startswith("full"):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    print("-- pallas custom-call device time per execution --")
    for k in sorted(agg):
        print(f"  {k}: {agg[k] / cnt[k] / 1000:.3f} ms x{cnt[k]}")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastposecnn_tpu.ops.voting import vote_counts_pallas, _round_up

    args = make_inputs()
    ref = None

    # a) current implementation
    t = timeit_in_jit(
        lambda *a: vote_counts_pallas(*a, inlier_thresh=0.999), args)
    ref = np.asarray(vote_counts_pallas(*args, inlier_thresh=0.999))
    print(f"a) fused-dot p512 current : {t:7.3f} ms")

    # b) two dots, no slicing
    def kernel_b(hx_ref, hy_ref, px_ref, py_ref, dx_ref, dy_ref, pv_ref,
                 out_ref, *, thresh_sq, p_tile):
        hx = hx_ref[...]
        hy = hy_ref[...]
        ones_h = jnp.ones_like(hx)
        hmat = jnp.stack([hx * hx, hy * hy, hx, hy, ones_h], axis=-1)
        hd = jnp.stack([hx, hy, ones_h], axis=-1)
        prec = lax.Precision.HIGHEST
        num_p = px_ref.shape[1]

        def body(i, acc):
            sl = pl.ds(i * p_tile, p_tile)
            px, py = px_ref[:, sl], py_ref[:, sl]
            dx, dy = dx_ref[:, sl], dy_ref[:, sl]
            pv = pv_ref[:, sl]
            ones_p = jnp.ones_like(px)
            pd = jnp.stack([dx, dy, -(px * dx + py * dy)], axis=-2)
            dot = lax.dot_general(hd, pd, (((2,), (1,)), ((0,), (0,))),
                                  precision=prec)
            pmat = jnp.stack(
                [ones_p, ones_p, -2 * px, -2 * py, px * px + py * py],
                axis=-2)
            vsq = lax.dot_general(hmat, pmat, (((2,), (1,)), ((0,), (0,))),
                                  precision=prec)
            inl = (dot > 0) & (dot * dot > thresh_sq * vsq)
            return acc + jnp.sum(jnp.where(inl, pv[:, None, :], 0.0), axis=2)

        out_ref[...] = lax.fori_loop(0, num_p // p_tile, body,
                                     jnp.zeros_like(hx))

    def variant_b(hyps, pts, dirs, pv, p_tile=512, m_block=8, h_tile=128):
        m, h, _ = hyps.shape
        p = pts.shape[1]
        mp, hp, pp = _round_up(m, m_block), _round_up(h, h_tile), _round_up(p, p_tile)
        pad2 = lambda x, t: jnp.pad(x, [(0, mp - m), (0, t - x.shape[1])])
        grid = (mp // m_block, hp // h_tile)
        hspec = pl.BlockSpec((m_block, h_tile), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        pspec = pl.BlockSpec((m_block, pp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(kernel_b, thresh_sq=0.999 ** 2, p_tile=p_tile),
            out_shape=jax.ShapeDtypeStruct((mp, hp), jnp.float32),
            grid=grid,
            in_specs=[hspec, hspec, pspec, pspec, pspec, pspec, pspec],
            out_specs=hspec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(pad2(hyps[..., 0], hp), pad2(hyps[..., 1], hp),
          pad2(pts[..., 0], pp), pad2(pts[..., 1], pp),
          pad2(dirs[..., 0], pp), pad2(dirs[..., 1], pp),
          pad2(pv, pp))
        return out[:m, :h]

    out_b = np.asarray(variant_b(*args))
    t = timeit_in_jit(variant_b, args)
    print(f"b) two-dot p512 noslice   : {t:7.3f} ms  match={np.abs(out_b-ref).max()}")

    # c) pure VPU broadcast arithmetic
    def kernel_c(hx_ref, hy_ref, px_ref, py_ref, dx_ref, dy_ref, pv_ref,
                 cc_ref, qq_ref, out_ref, *, thresh_sq, p_tile):
        hx = hx_ref[...]  # [MB, TH]
        hy = hy_ref[...]
        hsq = hx * hx + hy * hy
        num_p = px_ref.shape[1]

        def body(i, acc):
            sl = pl.ds(i * p_tile, p_tile)
            px, py = px_ref[:, sl], py_ref[:, sl]
            dx, dy = dx_ref[:, sl], dy_ref[:, sl]
            pv = pv_ref[:, sl]
            cc = cc_ref[:, sl]  # px*dx + py*dy
            qq = qq_ref[:, sl]  # px*px + py*py
            # [MB, TH, TP] via broadcasts
            dot = (hx[:, :, None] * dx[:, None, :]
                   + hy[:, :, None] * dy[:, None, :]
                   - cc[:, None, :])
            vsq = (hsq[:, :, None]
                   - 2.0 * (hx[:, :, None] * px[:, None, :]
                            + hy[:, :, None] * py[:, None, :])
                   + qq[:, None, :])
            inl = (dot > 0) & (dot * dot > thresh_sq * vsq)
            return acc + jnp.sum(jnp.where(inl, pv[:, None, :], 0.0), axis=2)

        out_ref[...] = lax.fori_loop(0, num_p // p_tile, body,
                                     jnp.zeros_like(hx))

    def variant_c(hyps, pts, dirs, pv, p_tile=512, m_block=8, h_tile=128):
        m, h, _ = hyps.shape
        p = pts.shape[1]
        mp, hp, pp = _round_up(m, m_block), _round_up(h, h_tile), _round_up(p, p_tile)
        pad2 = lambda x, t: jnp.pad(x, [(0, mp - m), (0, t - x.shape[1])])
        px, py = pts[..., 0], pts[..., 1]
        dx, dy = dirs[..., 0], dirs[..., 1]
        cc = px * dx + py * dy
        qq = px * px + py * py
        grid = (mp // m_block, hp // h_tile)
        hspec = pl.BlockSpec((m_block, h_tile), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        pspec = pl.BlockSpec((m_block, pp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(kernel_c, thresh_sq=0.999 ** 2, p_tile=p_tile),
            out_shape=jax.ShapeDtypeStruct((mp, hp), jnp.float32),
            grid=grid,
            in_specs=[hspec, hspec] + [pspec] * 7,
            out_specs=hspec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(pad2(hyps[..., 0], hp), pad2(hyps[..., 1], hp),
          pad2(px, pp), pad2(py, pp), pad2(dx, pp), pad2(dy, pp),
          pad2(pv, pp), pad2(cc, pp), pad2(qq, pp))
        return out[:m, :h]

    out_c = np.asarray(variant_c(*args))
    t = timeit_in_jit(variant_c, args)
    print(f"c) pure-VPU p512          : {t:7.3f} ms  match={np.abs(out_c-ref).max()}")

    # c2) pure VPU, p_tile=1024 (whole P resident)
    t = timeit_in_jit(functools.partial(variant_c, p_tile=1024), args)
    out_c2 = np.asarray(variant_c(*args, p_tile=1024))
    print(f"c2) pure-VPU p1024        : {t:7.3f} ms  match={np.abs(out_c2-ref).max()}")

    # b2) two-dot with h_tile=512
    t = timeit_in_jit(functools.partial(variant_b, h_tile=512, p_tile=256), args)
    out_b2 = np.asarray(variant_b(*args, h_tile=512, p_tile=256))
    print(f"b2) two-dot h512 p256     : {t:7.3f} ms  match={np.abs(out_b2-ref).max()}")

    report_trace()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
