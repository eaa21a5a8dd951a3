"""Soft hough voting: weighted-mean of hypotheses with outlier pruning.

Parity: the reference ships a second, pure-PyTorch voting implementation
alongside the PVNet CUDA path (FPC/lib/hough_voting.py:68-297 batched
weighted-mean voting; 474-579 z-score / IQR outlier pruning with
drop-or-replace). It is selected by HPARAM.PRUN_METHOD and friends
(FPC/config.py:96-105). This module is the TPU-native equivalent:

  1. hypotheses from random point pairs (shared `generate_hypotheses`);
  2. prune outliers by z-score or IQR per instance; drop (zero-weight) or
     replace with the mean/median hypothesis;
  3. weight each surviving hypothesis by how many mask points' unit vectors
     agree with it (dot(direction, hyp - pt) > 0), x3 when the hypothesis
     lands inside the mask (HV_HYPOTHESIS_IN_MASK_MULTIPLIER);
  4. center = weight-normalized mean of hypotheses.

Everything is fixed-shape and vmap-free (batched over instances directly);
quantile/median use sorts instead of the reference's per-instance Python
loops (hough_voting.py:536-557).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fastposecnn_tpu.ops.voting import generate_hypotheses, sample_mask_points


def _median(x: jax.Array, axis: int) -> jax.Array:
    return jnp.median(x, axis=axis)


def zscore_outliers(hyps: jax.Array, threshold: float) -> jax.Array:
    """[M, H, 2] -> [M, H] outlier mask (FPC hough_voting.py:508-524).

    Reference quirk preserved: only the *positive* tail is trimmed
    (z > threshold, not |z|)."""
    mean = jnp.mean(hyps, axis=1, keepdims=True)
    std = jnp.std(hyps, axis=1, keepdims=True, ddof=1)
    z = (hyps - mean) / jnp.maximum(std, 1e-8)
    out = z > threshold
    return out[..., 0] | out[..., 1]


def iqr_outliers(hyps: jax.Array, multiplier: float) -> jax.Array:
    """[M, H, 2] -> [M, H] outlier mask (FPC hough_voting.py:526-579).

    Q1/Q3 are medians of the below/above-median halves (inclusive), matching
    the reference's median-of-halves construction."""
    q2 = _median(hyps, axis=1)[:, None, :]  # [M, 1, 2]
    big = jnp.inf
    lower = jnp.where(hyps <= q2, hyps, big)
    higher = jnp.where(hyps >= q2, hyps, -big)
    # median over masked halves: sort and index the middle of the valid run
    def masked_median(x, ascending):
        s = jnp.sort(x, axis=1)
        count = jnp.sum(jnp.isfinite(x), axis=1, keepdims=True)
        if ascending:  # valid entries at the front
            lo = (count - 1) // 2
            hi = count // 2
        else:  # valid entries at the back (sorted ascending: tail)
            n = x.shape[1]
            lo = n - 1 - (count - 1) // 2
            hi = n - 1 - count // 2
        take = lambda i: jnp.take_along_axis(s, i, axis=1)
        return 0.5 * (take(lo) + take(hi))

    q1 = masked_median(lower, ascending=True)
    q3 = masked_median(higher, ascending=False)
    iqr = q3 - q1
    top = q3 + multiplier * iqr
    bot = q1 - multiplier * iqr
    out = (hyps > top) | (hyps < bot)
    return out[..., 0] | out[..., 1]


def prune_hypotheses(
    hyps: jax.Array,
    method: Optional[str],
    drop: bool,
    replacement: str = "median",
    zscore_threshold: float = 1.0,
    iqr_multiplier: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (pruned_hyps, keep_mask). Parity: FPC hough_voting.py:474-506."""
    if method is None or method == "none":
        return hyps, jnp.ones(hyps.shape[:2], bool)
    if method == "z-score":
        out = zscore_outliers(hyps, zscore_threshold)
    elif method == "iqr":
        out = iqr_outliers(hyps, iqr_multiplier)
    else:
        raise RuntimeError("Invalid PRUN_METHOD")
    if drop:
        return hyps, ~out
    if replacement == "mean":
        rep = jnp.mean(hyps, axis=1, keepdims=True)
    elif replacement == "median":
        rep = _median(hyps, axis=1)[:, None, :]
    else:
        raise RuntimeError("Invalid PRUN_OUTLIER_REPLACEMENT_STYLE")
    pruned = jnp.where(out[..., None], rep, hyps)
    return pruned, jnp.ones(hyps.shape[:2], bool)


def hypothesis_weights(
    hyps: jax.Array,  # [M, H, 2]
    pts: jax.Array,  # [M, P, 2]
    dirs: jax.Array,  # [M, P, 2]
    pvalid: jax.Array,  # [M, P]
    in_mask_multiplier: float = 3.0,
    p_chunk: int = 256,
) -> jax.Array:
    """Angular-agreement weights (FPC hough_voting.py:250-297): the number
    of points whose unit vector points toward the hypothesis, multiplied
    when the (rounded) hypothesis coincides with a mask point."""
    m, h, _ = hyps.shape
    p = pts.shape[1]
    pad = (-p) % p_chunk
    pts_p = jnp.pad(pts, [(0, 0), (0, pad), (0, 0)])
    dirs_p = jnp.pad(dirs, [(0, 0), (0, pad), (0, 0)])
    pv = jnp.pad(pvalid.astype(jnp.float32), [(0, 0), (0, pad)])
    n_chunks = (p + pad) // p_chunk

    def step(carry, chunk):
        weights, in_mask = carry
        cpts, cdirs, cpv = chunk
        a = hyps[:, :, None, :] - cpts[:, None, :, :]
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        agree = (jnp.sum(a * cdirs[:, None, :, :], axis=-1) > 0).astype(
            jnp.float32
        ) * cpv[:, None, :]
        weights = weights + jnp.sum(agree, axis=-1)
        hit = jnp.all(
            jnp.floor(hyps)[:, :, None, :] == cpts[:, None, :, :], axis=-1
        ).astype(jnp.float32) * cpv[:, None, :]
        in_mask = in_mask + jnp.sum(hit, axis=-1)
        return (weights, in_mask), None

    chunks = (
        pts_p.reshape(m, n_chunks, p_chunk, 2).transpose(1, 0, 2, 3),
        dirs_p.reshape(m, n_chunks, p_chunk, 2).transpose(1, 0, 2, 3),
        pv.reshape(m, n_chunks, p_chunk).transpose(1, 0, 2),
    )
    (weights, in_mask), _ = jax.lax.scan(
        step, (jnp.zeros((m, h)), jnp.zeros((m, h))), chunks
    )
    factor = jnp.where(in_mask == 1.0, in_mask_multiplier, 1.0)
    weights = factor * weights
    total = jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1.0)
    return weights / total


def soft_vote_centers(
    key: jax.Array,
    pts: jax.Array,
    dirs: jax.Array,
    active: jax.Array,
    num_hypotheses: int = 128,
    prun_method: Optional[str] = "iqr",
    prun_drop: bool = False,
    prun_replacement: str = "median",
    zscore_threshold: float = 1.0,
    iqr_multiplier: float = 1.5,
    in_mask_multiplier: float = 3.0,
    pt_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full soft-voting path. Returns (centers [M, 2],
    raw hypotheses [M, H, 2], pruned hypotheses [M, H, 2]) — the raw/pruned
    pair feeds the hough visualization (FPC hough_voting.py:61 keys)."""
    # Gradient-opaque like ops.voting.refine_centers_dense (see its
    # docstring): hypothesis 2x2 solves explode near-singular; vote
    # fields train via dense_supervision, not through voting.
    pts = jax.lax.stop_gradient(pts)
    dirs = jax.lax.stop_gradient(dirs)
    m, p, _ = pts.shape
    if pt_valid is None:
        pt_valid = jnp.ones((m, p), bool)
    pvalid = (pt_valid & active[:, None]).astype(jnp.float32)
    hyps = generate_hypotheses(key, pts, dirs, num_hypotheses)
    pruned, keep = prune_hypotheses(
        hyps, prun_method, prun_drop, prun_replacement,
        zscore_threshold, iqr_multiplier,
    )
    weights = hypothesis_weights(
        pruned, pts, dirs, pvalid, in_mask_multiplier
    )
    weights = weights * keep.astype(weights.dtype)
    total = jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-8)
    centers = jnp.sum(pruned * (weights / total)[..., None], axis=1)
    centers = jnp.where(active[:, None], centers, 0.0)
    return centers, hyps, pruned


def soft_hough_vote(
    key: jax.Array,
    agg: dict,
    max_points: int = 1024,
    num_hypotheses: int = 128,
    **kwargs,
) -> dict:
    """Drop-in alternative to ops.voting.hough_vote using soft voting."""
    b, n = agg["valid"].shape
    k_sample, k_vote = jax.random.split(key)
    pts, dirs, npts, pt_valid = sample_mask_points(
        k_sample, agg["instance_masks"], agg["xy_dense"], max_points
    )
    m = b * n
    centers, hyps, pruned = soft_vote_centers(
        k_vote,
        pts.reshape(m, max_points, 2),
        dirs.reshape(m, max_points, 2),
        agg["valid"].reshape(m) & (npts.reshape(m) >= 5),
        num_hypotheses=num_hypotheses,
        pt_valid=pt_valid.reshape(m, max_points),
        **kwargs,
    )
    out = dict(agg)
    out["xy"] = centers.reshape(b, n, 2)
    out["hypothesis"] = hyps.reshape(b, n, num_hypotheses, 2)
    out["pruned_hypothesis"] = pruned.reshape(b, n, num_hypotheses, 2)
    return out
