"""RANSAC voting tests.

Central fixture (SURVEY.md §4a): a mask whose unit vectors all point exactly
at a chosen center must recover that center (the reference's only real unit
test, FPC/lib/hough_voting.py:583-619).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastposecnn_tpu.ops.voting import (
    generate_hypotheses,
    hough_vote,
    ransac_vote_centers,
    refine_centers,
    sample_mask_points,
    vote_counts_jnp,
    vote_counts_pallas,
)


def perfect_field(h, w, center_xy):
    """Unit vectors pointing from every pixel to center (x, y)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    dx = center_xy[0] - xs
    dy = center_xy[1] - ys
    norm = np.sqrt(dx * dx + dy * dy)
    norm[norm == 0] = 1.0
    return np.stack([dx / norm, dy / norm], axis=-1).astype(np.float32)


def make_instance(h=24, w=24, center=(11.0, 8.0), hole=True):
    mask = np.zeros((h, w), np.float32)
    mask[2:-2, 2:-2] = 1.0
    if hole:
        mask[int(center[1]), int(center[0])] = 0.0  # center not in mask
    field = perfect_field(h, w, center)
    return mask, field


class TestVoteCounts:
    def _setup(self, rng, m=3, p=256, hcount=64):
        pts = rng.uniform(0, 32, size=(m, p, 2)).astype(np.float32)
        dirs = rng.normal(size=(m, p, 2)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        hyps = rng.uniform(0, 32, size=(m, hcount, 2)).astype(np.float32)
        pvalid = (rng.random((m, p)) > 0.1).astype(np.float32)
        return map(jnp.asarray, (hyps, pts, dirs, pvalid))

    def test_pallas_matches_jnp(self, rng):
        hyps, pts, dirs, pvalid = self._setup(rng)
        ref = vote_counts_jnp(hyps, pts, dirs, pvalid, 0.999)
        got = vote_counts_pallas(hyps, pts, dirs, pvalid, 0.999, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_pallas_active_block_skip(self, rng):
        # m=10 over m_block=8 -> 2 blocks; only slots 0-2 active, so the
        # second block is skipped entirely via scalar prefetch. Counts must
        # equal the jnp reference with the inactive slots' points zeroed
        # (pvalid folds `active` in the production caller).
        hyps, pts, dirs, pvalid = self._setup(rng, m=10)
        active = jnp.asarray([True] * 3 + [False] * 7)
        pv = pvalid * active[:, None]
        ref = vote_counts_jnp(hyps, pts, dirs, pv, 0.999)
        got = vote_counts_pallas(hyps, pts, dirs, pv, 0.999, interpret=True,
                                 active=active)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
        assert not np.any(np.asarray(got)[3:])

    def test_counts_brute_force(self, rng):
        hyps, pts, dirs, pvalid = self._setup(rng, m=2, p=64, hcount=16)
        ref = np.zeros((2, 16))
        h_np, p_np, d_np, v_np = map(np.asarray, (hyps, pts, dirs, pvalid))
        for m in range(2):
            for h in range(16):
                for p in range(64):
                    a = h_np[m, h] - p_np[m, p]
                    na = np.linalg.norm(a) * np.linalg.norm(d_np[m, p])
                    if na > 0 and a @ d_np[m, p] / na > 0.999:
                        ref[m, h] += v_np[m, p]
        got = np.asarray(vote_counts_jnp(hyps, pts, dirs, pvalid, 0.999))
        np.testing.assert_allclose(got, ref, atol=1e-4)


class TestHypotheses:
    def test_perfect_intersection(self):
        # Two rays pointing at (5, 7) from different points intersect there.
        pts = jnp.asarray([[[0.0, 0.0], [10.0, 0.0]]])
        d0 = np.array([5.0, 7.0]) / np.linalg.norm([5.0, 7.0])
        d1 = np.array([-5.0, 7.0]) / np.linalg.norm([5.0, 7.0])
        dirs = jnp.asarray([[d0, d1]], jnp.float32)
        hyps = np.asarray(generate_hypotheses(jax.random.key(0), pts, dirs, 16))[0]
        # Pairs sampling the same point twice are degenerate -> (0, 0), like
        # the reference's random_(0, tn) index draws; all others intersect at
        # the center.
        is_zero = np.all(np.abs(hyps) < 1e-5, axis=-1)
        is_center = np.all(np.abs(hyps - np.array([5.0, 7.0])) < 1e-3, axis=-1)
        assert np.all(is_zero | is_center)
        assert is_center.any()

    def test_degenerate_parallel_is_zero(self):
        pts = jnp.asarray([[[0.0, 0.0], [1.0, 0.0]]])
        dirs = jnp.asarray([[[0.0, 1.0], [0.0, 1.0]]])
        hyps = generate_hypotheses(jax.random.key(0), pts, dirs, 4)
        np.testing.assert_array_equal(np.asarray(hyps[0]), 0.0)


class TestRansacCenter:
    def test_perfect_field_recovers_center(self):
        center = (11.0, 8.0)
        mask, field = make_instance(center=center)
        key = jax.random.key(0)
        pts, dirs, npts, ptv = sample_mask_points(
            key,
            jnp.asarray(mask)[None, None],
            jnp.asarray(field)[None],
            max_points=256,
        )
        centers, ratio, _ = ransac_vote_centers(
            jax.random.key(1),
            pts.reshape(1, 256, 2),
            dirs.reshape(1, 256, 2),
            npts.reshape(1),
            jnp.asarray([True]),
            round_hyp_num=64,
        )
        np.testing.assert_allclose(np.asarray(centers[0]), center, atol=0.05)
        assert float(ratio[0]) > 0.95

    def test_noisy_field_still_close(self, rng):
        center = (15.0, 9.0)
        mask, field = make_instance(h=32, w=32, center=center)
        field = field + rng.normal(size=field.shape).astype(np.float32) * 0.02
        pts, dirs, npts, ptv = sample_mask_points(
            jax.random.key(2),
            jnp.asarray(mask)[None, None],
            jnp.asarray(field)[None],
            max_points=512,
        )
        centers, _, _ = ransac_vote_centers(
            jax.random.key(3),
            pts.reshape(1, 512, 2),
            dirs.reshape(1, 512, 2),
            npts.reshape(1),
            jnp.asarray([True]),
            round_hyp_num=128,
        )
        np.testing.assert_allclose(np.asarray(centers[0]), center, atol=0.5)

    def test_tiny_mask_outputs_zero(self):
        mask = np.zeros((16, 16), np.float32)
        mask[3, 3] = 1.0  # below min_num
        field = perfect_field(16, 16, (8.0, 8.0))
        pts, dirs, npts, ptv = sample_mask_points(
            jax.random.key(0),
            jnp.asarray(mask)[None, None],
            jnp.asarray(field)[None],
            max_points=64,
        )
        centers, ratio, _ = ransac_vote_centers(
            jax.random.key(1),
            pts.reshape(1, 64, 2),
            dirs.reshape(1, 64, 2),
            npts.reshape(1),
            jnp.asarray([True]),
        )
        np.testing.assert_array_equal(np.asarray(centers[0]), 0.0)

    def test_voting_is_gradient_opaque(self):
        # Deliberate deviation (see refine_centers_dense docstring): the
        # LSQ backward explodes near-singular and was measured swamping
        # the dense field supervision by 217x l2 / 37000x max-element.
        # Vote fields train densely (PVNet-style); voting contributes NO
        # gradient.
        center = (11.0, 8.0)
        mask, field = make_instance(center=center)
        pts, dirs, npts, ptv = sample_mask_points(
            jax.random.key(0),
            jnp.asarray(mask)[None, None],
            jnp.asarray(field)[None],
            max_points=128,
        )
        pts = pts.reshape(1, 128, 2)
        npts = npts.reshape(1)

        def loss(d):
            c, _, _ = ransac_vote_centers(
                jax.random.key(1), pts, d, npts, jnp.asarray([True]),
                round_hyp_num=32, max_iter=3,
            )
            return jnp.sum(c**2)

        g = jax.grad(loss)(dirs.reshape(1, 128, 2))
        np.testing.assert_array_equal(np.asarray(g), 0.0)


class TestHoughVote:
    def test_batched_two_instances(self):
        h = w = 32
        c1, c2 = (8.0, 8.0), (24.0, 22.0)
        m1 = np.zeros((h, w), np.float32); m1[4:13, 4:13] = 1
        m2 = np.zeros((h, w), np.float32); m2[18:27, 20:29] = 1
        f = np.zeros((h, w, 2), np.float32)
        f1 = perfect_field(h, w, c1)
        f2 = perfect_field(h, w, c2)
        f[m1 > 0] = f1[m1 > 0]
        f[m2 > 0] = f2[m2 > 0]
        agg = {
            "instance_masks": jnp.asarray(np.stack([m1, m2]))[None],
            "valid": jnp.asarray([[True, True]]),
            "xy_dense": jnp.asarray(f)[None],
        }
        out = hough_vote(jax.random.key(0), agg, max_points=256, round_hyp_num=64)
        np.testing.assert_allclose(np.asarray(out["xy"][0, 0]), c1, atol=0.1)
        np.testing.assert_allclose(np.asarray(out["xy"][0, 1]), c2, atol=0.1)
        # hypothesis cloud exposed for matching keys / hough visualization
        # (FPC hough_voting.py:61): last round's hypotheses, clustered near
        # the true center for a perfect field.
        assert out["hypothesis"].shape == (1, 2, 64, 2)
        assert out["pruned_hypothesis"].shape == (1, 2, 64, 2)
        hyp0 = np.asarray(out["hypothesis"][0, 0])
        med = np.median(hyp0, axis=0)
        np.testing.assert_allclose(med, c1, atol=1.5)


class TestDenseRefinement:
    def test_dense_refine_recovers_center_and_grads(self):
        from fastposecnn_tpu.ops.voting import refine_centers_dense

        h = w = 32
        center = (11.0, 8.0)
        mask, field = make_instance(center=center)
        masks = jnp.asarray(mask)[None, None]         # [1,1,H,W]
        dense = jnp.asarray(field)[None]              # [1,H,W,2]
        win = jnp.asarray([[[center[0] + 0.4, center[1] - 0.3]]])

        out = refine_centers_dense(win, masks, dense, 0.999)
        np.testing.assert_allclose(np.asarray(out[0, 0]), center, atol=0.05)

        def loss(f):
            c = refine_centers_dense(win, masks, f, 0.999)
            return jnp.sum(c**2)

        # Gradient-opaque by design (see refine_centers_dense docstring):
        # fields train via dense_supervision, not through the LSQ solve.
        g = jax.grad(loss)(dense)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_hough_vote_uses_dense_refinement(self):
        # identical center recovery through the full hough_vote wrapper
        h = w = 32
        c1 = (8.0, 8.0)
        m1 = np.zeros((h, w), np.float32); m1[4:13, 4:13] = 1
        f = np.zeros((h, w, 2), np.float32)
        f1 = perfect_field(h, w, c1)
        f[m1 > 0] = f1[m1 > 0]
        agg = {
            "instance_masks": jnp.asarray(m1)[None, None],
            "valid": jnp.asarray([[True]]),
            "xy_dense": jnp.asarray(f)[None],
        }
        out = hough_vote(jax.random.key(0), agg, max_points=128,
                         round_hyp_num=32)
        np.testing.assert_allclose(np.asarray(out["xy"][0, 0]), c1, atol=0.05)
