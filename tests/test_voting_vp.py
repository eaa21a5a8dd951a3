"""Vanishing-point voting variant tests (kernels the reference ships but
never calls, ransac_voting_kernel.cu:170-351)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu.ops.voting_vp import (
    generate_hypotheses_vp,
    ransac_vanishing_points,
    vote_counts_vp,
)


def parallel_field(h, w, direction):
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    return np.broadcast_to(d, (h, w, 2)).astype(np.float32).copy()


def grid_points(h, w):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


class TestVanishingPoint:
    def test_parallel_rays_meet_at_infinity(self):
        """All rays sharing one direction -> homogeneous point with z ~ 0
        aligned with the direction."""
        h = w = 8
        d = (3.0, 4.0)
        pts = grid_points(h, w)[None]  # [1, P, 2]
        dirs = parallel_field(h, w, d).reshape(1, -1, 2)
        hyps = np.asarray(
            generate_hypotheses_vp(jax.random.key(0), jnp.asarray(pts),
                                   jnp.asarray(dirs), 64)
        )[0]
        nonzero = hyps[np.abs(hyps).sum(-1) > 1e-4]
        assert len(nonzero) > 0
        hn = nonzero / np.linalg.norm(nonzero, axis=-1, keepdims=True)
        # z component vanishes; (x, y) parallel to the shared direction
        np.testing.assert_allclose(hn[:, 2], 0.0, atol=1e-5)
        cross = hn[:, 0] * 0.8 - hn[:, 1] * 0.6  # cross with unit (0.6, 0.8)
        np.testing.assert_allclose(cross, 0.0, atol=1e-4)

    def test_finite_intersection_matches_2d_center(self):
        """A converging field's vanishing point dehomogenizes to the 2D
        center the planar path recovers."""
        h = w = 24
        center = (11.0, 8.0)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        dx = center[0] - xs
        dy = center[1] - ys
        n = np.sqrt(dx * dx + dy * dy)
        n[n == 0] = 1.0
        dirs = np.stack([dx / n, dy / n], -1).astype(np.float32)
        pts = grid_points(h, w)[None]
        best, counts = ransac_vanishing_points(
            jax.random.key(1), jnp.asarray(pts),
            jnp.asarray(dirs.reshape(1, -1, 2)),
            jnp.asarray([True]), num_hypotheses=128,
        )
        b = np.asarray(best[0])
        assert abs(b[2]) > 1e-6  # finite point
        np.testing.assert_allclose(b[0] / b[2], center[0], atol=0.1)
        np.testing.assert_allclose(b[1] / b[2], center[1], atol=0.1)
        assert float(counts[0]) > 0.8 * pts.shape[1]

    def test_vote_counts_brute_force(self, rng):
        """vote_counts_vp matches a direct per-element transcription of
        voting_for_hypothesis_vanishing_point_kernel (cu:268-309)."""
        m, p, hn = 2, 48, 8
        pts = rng.uniform(0, 16, size=(m, p, 2)).astype(np.float32)
        ang = rng.uniform(0, 2 * np.pi, size=(m, p))
        dirs = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
        hyps = rng.normal(size=(m, hn, 3)).astype(np.float32)
        pv = (rng.random((m, p)) > 0.2).astype(np.float32)
        thresh = 0.999
        ref = np.zeros((m, hn))
        for mi in range(m):
            for hi in range(hn):
                hx, hy, hz = hyps[mi, hi]
                for ti in range(p):
                    cx, cy = pts[mi, ti]
                    ddx, ddy = dirs[mi, ti]
                    diff_x = hx - cx * hz
                    diff_y = hy - cy * hz
                    n1 = np.sqrt(ddx**2 + ddy**2)
                    n2 = np.sqrt(diff_x**2 + diff_y**2)
                    if n1 < 1e-6 or n2 < 1e-6:
                        continue
                    if diff_x * ddx < 0 or diff_y * ddy < 0:
                        continue
                    if abs((ddx * diff_x + ddy * diff_y) / (n1 * n2)) > thresh:
                        ref[mi, hi] += pv[mi, ti]
        got = np.asarray(vote_counts_vp(
            jnp.asarray(hyps), jnp.asarray(pts), jnp.asarray(dirs),
            jnp.asarray(pv), thresh,
        ))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_inconsistent_pairs_zeroed(self):
        """One ray toward the line intersection, one away: the rays cannot
        both reach the point, so the hypothesis is zeroed (kernel:222-225).
        """
        s = 1.0 / np.sqrt(2.0)
        pts = jnp.asarray([[[0.0, 0.0], [10.0, 0.0]]])
        # lines y=x and y=10-x intersect at (5,5); the first ray points
        # AWAY from it, the second toward it -> val_x0*val_x1 < 0.
        dirs = jnp.asarray([[[-s, -s], [-s, s]]])
        hyps = np.asarray(
            generate_hypotheses_vp(jax.random.key(0), pts, dirs, 8)
        )[0]
        # same-point pairs leave ~1e-8 fma residue in cross(l, l) (the CUDA
        # kernel has no degenerate-pair check either); threshold it away.
        keep = hyps[np.abs(hyps).sum(-1) > 1e-4]
        assert keep.shape[0] == 0  # every cross-pair zeroed

    def test_consistent_pair_survives(self):
        s = 1.0 / np.sqrt(2.0)
        pts = jnp.asarray([[[0.0, 0.0], [10.0, 0.0]]])
        dirs = jnp.asarray([[[s, s], [-s, s]]])  # both toward (5, 5)
        hyps = np.asarray(
            generate_hypotheses_vp(jax.random.key(0), pts, dirs, 16)
        )[0]
        keep = hyps[np.abs(hyps).sum(-1) > 1e-4]
        assert keep.shape[0] > 0
        dehom = keep[:, :2] / keep[:, 2:3]
        np.testing.assert_allclose(dehom, [[5.0, 5.0]] * len(dehom),
                                   atol=1e-4)
