"""Vanishing-point RANSAC variants (homogeneous-coordinate hypotheses).

Parity: the reference ships CUDA kernels for vanishing-point voting that
FastPoseCNN's own pipeline never calls
(`generate_hypothesis_vanishing_point_kernel`,
`voting_for_hypothesis_vanishing_point_kernel`,
FPC/lib/ransac_voting_gpu_layer/src/ransac_voting_kernel.cu:170-351).
They are provided here for inventory completeness as batched, static-shape
jnp functions: hypotheses are homogeneous 2D points (x, y, z) built from
the cross product of two pixel rays' line representations, so parallel
rays vote for a point at infinity (z = 0) — the vanishing point.

Semantics replicated exactly:
  line_i = (d_y, -d_x, c_y d_x - c_x d_y)          (kernel:201-208)
  hyp    = line_0 x line_1                          (kernel:211-213)
  sign fix: if all four direction tests are negative, negate the
  homogeneous point; inconsistent signs (rays cannot both reach it)
  zero it out                                       (kernel:216-225)
  vote: diff = (h_x - c_x h_z, h_y - c_y h_z); require diff.d
  componentwise >= 0 and |cos(angle(d, diff))| > thresh
                                                    (kernel:287-309)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fastposecnn_tpu.ops.voting import _sample_pairs


def generate_hypotheses_vp(
    key: jax.Array,
    pts: jax.Array,   # [M, P, 2] pixel coords
    dirs: jax.Array,  # [M, P, 2] unit direction field
    num_hypotheses: int,
) -> jax.Array:
    """Random point-pair homogeneous intersections -> [M, H, 3]."""
    p0, d0, p1, d1 = _sample_pairs(key, pts, dirs, num_hypotheses)
    cx0, cy0 = p0[..., 0], p0[..., 1]
    cx1, cy1 = p1[..., 0], p1[..., 1]
    dx0, dy0 = d0[..., 0], d0[..., 1]
    dx1, dy1 = d1[..., 0], d1[..., 1]

    l0 = jnp.stack([dy0, -dx0, cy0 * dx0 - cx0 * dy0], axis=-1)
    l1 = jnp.stack([dy1, -dx1, cy1 * dx1 - cx1 * dy1], axis=-1)
    h = jnp.cross(l0, l1)  # (x, y, z)
    x, y, z = h[..., 0], h[..., 1], h[..., 2]

    val_x0 = dx0 * (x - z * cx0)
    val_x1 = dx1 * (x - z * cx1)
    val_y0 = dy0 * (y - z * cy0)
    val_y1 = dy1 * (y - z * cy1)
    flip = (val_x0 < 0) & (val_x1 < 0) & (val_y0 < 0) & (val_y1 < 0)
    h = jnp.where(flip[..., None], -h, h)
    inconsistent = (val_x0 * val_x1 < 0) | (val_y0 * val_y1 < 0)
    return jnp.where(inconsistent[..., None], 0.0, h)


def vote_counts_vp(
    hyps: jax.Array,   # [M, H, 3] homogeneous hypotheses
    pts: jax.Array,    # [M, P, 2]
    dirs: jax.Array,   # [M, P, 2]
    pvalid: jax.Array,  # [M, P] float 0/1
    inlier_thresh: float = 0.999,
    p_chunk: int = 512,
) -> jax.Array:
    """Inlier counts [M, H] for homogeneous hypotheses (kernel:268-309)."""
    m, p, _ = pts.shape
    pad = (-p) % p_chunk
    pts_p = jnp.pad(pts, [(0, 0), (0, pad), (0, 0)])
    dirs_p = jnp.pad(dirs, [(0, 0), (0, pad), (0, 0)])
    pv = jnp.pad(pvalid.astype(jnp.float32), [(0, 0), (0, pad)])
    n_chunks = (p + pad) // p_chunk
    thr_sq = float(inlier_thresh) ** 2
    hx, hy, hz = hyps[..., 0], hyps[..., 1], hyps[..., 2]

    def step(acc, chunk):
        cpts, cdirs, cpv = chunk  # [M, TP, 2], [M, TP]
        cx = cpts[..., 0][:, None, :]
        cy = cpts[..., 1][:, None, :]
        dx = cdirs[..., 0][:, None, :]
        dy = cdirs[..., 1][:, None, :]
        diff_x = hx[..., None] - cx * hz[..., None]
        diff_y = hy[..., None] - cy * hz[..., None]
        dot = dx * diff_x + dy * diff_y
        n1_sq = dx * dx + dy * dy
        n2_sq = diff_x * diff_x + diff_y * diff_y
        ok_norm = (n1_sq >= 1e-12) & (n2_sq >= 1e-12)
        ok_sign = (diff_x * dx >= 0) & (diff_y * dy >= 0)
        # |cos| > t  <=>  dot^2 > t^2 n1^2 n2^2
        inlier = ok_norm & ok_sign & (dot * dot > thr_sq * n1_sq * n2_sq)
        votes = jnp.where(inlier, cpv[:, None, :], 0.0)
        return acc + jnp.sum(votes, axis=-1), None

    chunks = (
        pts_p.reshape(m, n_chunks, p_chunk, 2).transpose(1, 0, 2, 3),
        dirs_p.reshape(m, n_chunks, p_chunk, 2).transpose(1, 0, 2, 3),
        pv.reshape(m, n_chunks, p_chunk).transpose(1, 0, 2),
    )
    acc0 = jnp.zeros(hyps.shape[:2], jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, chunks)
    return acc


def ransac_vanishing_points(
    key: jax.Array,
    pts: jax.Array,
    dirs: jax.Array,
    active: jax.Array,          # [M] bool
    num_hypotheses: int = 256,
    inlier_thresh: float = 0.999,
    pt_valid: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """One-shot vanishing-point estimate: best homogeneous point [M, 3]
    (unit-normalized) + its inlier count [M]."""
    m, p, _ = pts.shape
    if pt_valid is None:
        pt_valid = jnp.ones((m, p), bool)
    pvalid = (pt_valid & active[:, None]).astype(jnp.float32)
    hyps = generate_hypotheses_vp(key, pts, dirs, num_hypotheses)
    counts = vote_counts_vp(hyps, pts, dirs, pvalid, inlier_thresh)
    win = jnp.argmax(counts, axis=-1)
    best = jnp.take_along_axis(hyps, win[:, None, None], axis=1)[:, 0]
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    best = best / jnp.where(norm > 0, norm, 1.0)
    best_counts = jnp.take_along_axis(counts, win[:, None], axis=1)[:, 0]
    return jnp.where(active[:, None], best, 0.0), best_counts
