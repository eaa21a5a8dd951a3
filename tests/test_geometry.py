"""Golden tests for the geometry core against scipy / hand-built references.

Strategy per SURVEY.md §4c: quaternion<->R, RT reconstruction, 3D IoU and
symmetric distance are checked against independent numpy/scipy
implementations.
"""

import jax.numpy as jnp
import jax
import numpy as np
import pytest
import scipy.spatial.transform as sst

from fastposecnn_tpu import constants, geometry


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuatRotmat:
    def test_matches_scipy(self, rng):
        q = random_quats(rng, 64)
        R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
        R_scipy = sst.Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(R, R_scipy, atol=1e-12)

    def test_roundtrip(self, rng):
        q = random_quats(rng, 64)
        R = geometry.quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(geometry.rotmat_to_quat(R))
        # q and -q are the same rotation
        dots = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-9)

    def test_unnormalized_matches_reference_formula(self, rng):
        # The reference applies the polynomial formula to unnormalized quats
        # (FPC gpu_tensor_funcs.py:306-326); ours must agree there too.
        q = rng.normal(size=(8, 4)) * 2.0
        R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
        q1, q2, q3, q4 = q.T
        r00 = q1**2 - q2**2 - q3**2 + q4**2
        np.testing.assert_allclose(R[:, 0, 0], r00, atol=1e-12)
        np.testing.assert_allclose(R[:, 0, 1], 2 * (q1 * q2 - q3 * q4), atol=1e-12)


class TestRT:
    def test_assemble_invert_roundtrip(self, rng):
        q = random_quats(rng, 16)
        R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
        T = rng.normal(size=(16, 3))
        RT = np.asarray(geometry.assemble_RT(jnp.asarray(R), jnp.asarray(T)))
        # matches dense inverse of [[R^-1, T], [0,0,0,1]]
        for i in range(16):
            inv_RT = np.block(
                [[np.linalg.inv(R[i]), T[i][:, None]], [np.zeros((1, 3)), 1.0]]
            )
            np.testing.assert_allclose(RT[i], np.linalg.inv(inv_RT), atol=1e-9)
        inv = np.asarray(geometry.invert_RT(jnp.asarray(RT)))
        eye = np.einsum("nij,njk->nik", RT, inv)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-9)

    def test_batch_get_RT_translation(self, rng):
        # Back-projection: K @ T * 1000/z == (x*z, y*z, z)/z -> pixel coords
        K = constants.INTRINSICS["CAMERA"]
        xy = rng.uniform(0, 640, size=(8, 2))
        z = rng.uniform(300, 3000, size=(8, 1))
        q = random_quats(rng, 8)
        R, T, RT = geometry.batch_get_RT(
            jnp.asarray(q), jnp.asarray(xy), jnp.asarray(z), jnp.asarray(np.linalg.inv(K))
        )
        T = np.asarray(T)
        reproj = (K @ T.T) / T.T[2]
        np.testing.assert_allclose(reproj[:2].T, xy, atol=1e-6)
        np.testing.assert_allclose(T[:, 2] * 1000, z[:, 0], atol=1e-6)
        # RT third row encodes depth: inv(RT)[2,3]*1000 == z (FPC dm.extract_z_from_RT)
        invRT = np.asarray(geometry.invert_RT(RT))
        np.testing.assert_allclose(invRT[:, 2, 3] * 1000, z[:, 0], atol=1e-3)

    def test_project_roundtrip(self, rng):
        K = jnp.asarray(constants.INTRINSICS["CAMERA"])
        q = random_quats(rng, 1)[0]
        R = geometry.quat_to_rotmat(jnp.asarray(q))
        T = jnp.asarray([0.1, -0.2, 1.5])
        RT = geometry.assemble_RT(R, T)
        origin = jnp.zeros((3, 1))
        # world origin projects to K @ T / T_z
        px = np.asarray(geometry.project_to_image(origin, RT, K))[:, 0]
        expect = np.asarray(K) @ np.asarray(T)
        expect = expect[:2] / expect[2]
        np.testing.assert_allclose(px, expect, atol=1e-9)


class TestIou3d:
    def test_identical_boxes(self):
        RT = jnp.eye(4)[None].repeat(3, axis=0)
        scales = jnp.asarray([[1.0, 2.0, 3.0]] * 3)
        iou = geometry.asymmetric_3d_iou(RT, RT, scales, scales)
        np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-9)
        iou_c = geometry.asymmetric_3d_iou(RT, RT, scales, scales, fpc_compat=True)
        np.testing.assert_allclose(np.asarray(iou_c), 1.0, atol=1e-9)

    def test_translated_boxes_true_iou(self):
        # Two unit cubes offset by 0.5 on x: intersection 0.5, union 1.5
        RT1 = jnp.eye(4)
        T = jnp.asarray([0.5, 0.0, 0.0])
        RT2 = geometry.assemble_RT(jnp.eye(3), T)
        scales = jnp.ones((3,))
        iou = geometry.asymmetric_3d_iou(RT1, RT2, scales, scales)
        np.testing.assert_allclose(float(iou), 0.5 / 1.5, atol=1e-6)

    def test_disjoint_boxes(self):
        RT1 = jnp.eye(4)
        RT2 = geometry.assemble_RT(jnp.eye(3), jnp.asarray([5.0, 0.0, 0.0]))
        scales = jnp.ones((3,))
        iou = geometry.asymmetric_3d_iou(RT1, RT2, scales, scales)
        assert float(iou) == 0.0


class TestQuatDistance:
    def test_raw_distance_zero_for_same(self, rng):
        q = jnp.asarray(random_quats(rng, 8))
        d = geometry.raw_quat_distance_deg(q, q)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
        d_neg = geometry.raw_quat_distance_deg(q, -q)
        np.testing.assert_allclose(np.asarray(d_neg), 0.0, atol=1e-6)

    def test_raw_distance_formula(self, rng):
        q0 = random_quats(rng, 16)
        q1 = random_quats(rng, 16)
        d = np.asarray(
            geometry.raw_quat_distance_deg(jnp.asarray(q0), jnp.asarray(q1))
        )
        expect = np.rad2deg(
            np.minimum(
                np.linalg.norm(q0 - q1, axis=-1), np.linalg.norm(q0 + q1, axis=-1)
            )
        )
        np.testing.assert_allclose(d, expect, atol=1e-9)

    def test_symmetric_distance_y_rotation_invariant(self):
        # A quaternion equal to a pure y-axis rotation of another must have
        # ~zero symmetric distance (the 360-step grid quantizes to <=0.5 deg).
        base = np.asarray([0.0, 0.0, 0.0, 1.0])
        # y-rotation by 37 deg in the reference's wxyz layout: (cos, 0, sin, 0)
        half = np.deg2rad(37.0) / 2
        rotated = np.asarray(
            geometry.quat_multiply_wxyz(
                jnp.asarray(base), jnp.asarray([np.cos(half), 0.0, np.sin(half), 0.0])
            )
        )
        d = geometry.symmetric_quat_distance_deg(
            jnp.asarray(base)[None], jnp.asarray(rotated)[None]
        )
        assert float(d[0]) < 0.51

    def test_dispatch_by_symmetry_flag(self, rng):
        q0 = jnp.asarray(random_quats(rng, 4))
        q1 = jnp.asarray(random_quats(rng, 4))
        sym = jnp.asarray([0, 1, 0, 1])
        d = geometry.quat_distance_deg(q0, q1, sym)
        raw = geometry.raw_quat_distance_deg(q0, q1)
        symd = geometry.symmetric_quat_distance_deg(q0, q1)
        np.testing.assert_allclose(np.asarray(d[0]), np.asarray(raw[0]))
        np.testing.assert_allclose(np.asarray(d[1]), np.asarray(symd[1]))

    def test_geodesic_is_true_rotation_angle(self):
        import scipy.spatial.transform as sst

        # A known 73-deg rotation about an arbitrary axis reads as exactly
        # 73 deg geodesic, sign-invariantly; the parity chord metric reads
        # 2*sin(73/2 deg) rad = ~36 deg for the same pair.
        axis = np.asarray([0.3, -0.8, 0.52]); axis /= np.linalg.norm(axis)
        q0 = sst.Rotation.identity().as_quat()
        q1 = sst.Rotation.from_rotvec(np.deg2rad(73.0) * axis).as_quat()
        zero = jnp.zeros((1,), jnp.int32)
        geo = geometry.geodesic_quat_distance_deg(
            jnp.asarray(q0)[None], jnp.asarray(q1)[None], zero)
        np.testing.assert_allclose(float(geo[0]), 73.0, atol=0.01)
        geo_neg = geometry.geodesic_quat_distance_deg(
            jnp.asarray(q0)[None], -jnp.asarray(q1)[None], zero)
        np.testing.assert_allclose(float(geo_neg[0]), 73.0, atol=0.01)
        chord = geometry.quat_distance_deg(
            jnp.asarray(q0)[None], jnp.asarray(q1)[None], zero)
        # chord between q0,q1 on S3 subtending theta/2: 2*sin(theta/4)
        expect_chord = np.rad2deg(2 * np.sin(np.deg2rad(73.0) / 4))
        np.testing.assert_allclose(float(chord[0]), expect_chord, atol=0.5)

    def test_geodesic_host_mirror_matches(self, rng):
        from fastposecnn_tpu import eval_host

        q0 = random_quats(rng, 8)
        q1 = random_quats(rng, 8)
        sym = np.asarray([0, 1] * 4)
        dev = np.asarray(geometry.geodesic_quat_distance_deg(
            jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(sym)))
        host = eval_host.geodesic_quat_distance_deg(q0, q1, sym)
        np.testing.assert_allclose(dev, host, atol=0.05)
        # symmetric slots are reduced by the y-rotation min
        assert (host[sym == 1] <= host.max() + 1e-9).all()

    def test_quat_canonical(self, rng):
        q = jnp.asarray(random_quats(rng, 32))
        c = geometry.quat_canonical(q)
        c_neg = geometry.quat_canonical(-q)
        # sign-invariant: q and -q map to the same representative
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_neg))
        # idempotent, rotation-preserving, pivot >= 0
        np.testing.assert_allclose(
            np.asarray(geometry.quat_canonical(c)), np.asarray(c))
        np.testing.assert_allclose(
            np.asarray(geometry.quat_to_rotmat(c)),
            np.asarray(geometry.quat_to_rotmat(q)), atol=1e-6)
        piv = np.take_along_axis(
            np.asarray(c), np.argmax(np.abs(np.asarray(c)), -1, keepdims=True), -1
        )
        assert (piv >= 0.5 / np.sqrt(4)).all()  # max |comp| >= 1/sqrt(4)


class TestAP:
    def test_calculate_ap(self):
        vals = jnp.asarray([1.0, 2.0, 3.0, jnp.nan, 10.0])
        valid = jnp.asarray([True, True, True, True, False])
        thr = jnp.asarray([0.5, 2.5, 100.0])
        ap = np.asarray(geometry.calculate_ap(vals, valid, thr, greater_is_better=False))
        # 3 finite valid values: <0.5 -> 0; <2.5 -> 2/3; <100 -> 3/3
        np.testing.assert_allclose(ap, [0.0, 2 / 3, 1.0], atol=1e-9)

    def test_joint_ap(self):
        a = jnp.asarray([1.0, 6.0, 4.0])
        b = jnp.asarray([1.0, 1.0, 9.0])
        valid = jnp.ones(3, bool)
        ap = np.asarray(
            geometry.calculate_joint_ap(
                a, b, valid, jnp.asarray([5.0, 10.0]), jnp.asarray([5.0, 10.0])
            )
        )
        np.testing.assert_allclose(ap, [1 / 3, 1.0], atol=1e-9)


class TestEvalHostParity:
    """eval_host (numpy, native f64) must mirror the jnp geometry math.

    Tests run with jax_enable_x64, so the jnp side is genuinely f64 here —
    a bitwise-meaningful comparison."""

    def test_quat_distance(self, rng):
        from fastposecnn_tpu import eval_host

        q0 = random_quats(rng, 16).astype(np.float64)
        q1 = random_quats(rng, 16).astype(np.float64)
        sym = rng.integers(0, 2, size=16)
        want = np.asarray(
            geometry.quat_distance_deg(
                jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(sym)
            )
        )
        got = eval_host.quat_distance_deg(q0, q1, sym)
        assert got.dtype == np.float64
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_3d_iou_and_offset(self, rng):
        from fastposecnn_tpu import eval_host

        n = 8
        q = random_quats(rng, n).astype(np.float64)
        T = rng.normal(size=(n, 3)) + np.asarray([0, 0, 3.0])
        R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
        RT1 = np.asarray(geometry.assemble_RT(jnp.asarray(R), jnp.asarray(T)))
        RT2 = np.asarray(
            geometry.assemble_RT(jnp.asarray(R), jnp.asarray(T + 0.05))
        )
        s1 = rng.uniform(0.2, 1.0, size=(n, 3))
        s2 = s1 * rng.uniform(0.8, 1.2, size=(n, 3))
        for compat in (False, True):
            want = np.asarray(
                geometry.asymmetric_3d_iou(
                    jnp.asarray(RT1), jnp.asarray(RT2),
                    jnp.asarray(s1), jnp.asarray(s2), fpc_compat=compat,
                )
            )
            got = eval_host.asymmetric_3d_iou(RT1, RT2, s1, s2,
                                              fpc_compat=compat)
            assert got.dtype == np.float64
            np.testing.assert_allclose(got, want, atol=1e-12)
        off_want = np.asarray(
            geometry.offset_error_cm(jnp.asarray(T), jnp.asarray(T + 0.05))
        )
        off_got = eval_host.offset_error_cm(T, T + 0.05)
        np.testing.assert_allclose(off_got, off_want, atol=1e-12)

    def test_ap_curves(self, rng):
        from fastposecnn_tpu import eval_host

        vals = rng.uniform(0, 60, size=100)
        vals[::17] = np.nan
        valid = rng.random(100) > 0.2
        thr = np.linspace(0, 60, 50)
        for greater in (False, True):
            want = np.asarray(
                geometry.calculate_ap(
                    jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(thr),
                    greater_is_better=greater,
                )
            )
            got = eval_host.calculate_ap(vals, valid, thr,
                                         greater_is_better=greater)
            np.testing.assert_allclose(got, want, atol=1e-12)
        off = rng.uniform(0, 10, size=100)
        want = np.asarray(
            geometry.calculate_joint_ap(
                jnp.asarray(vals), jnp.asarray(off), jnp.asarray(valid),
                jnp.asarray([5.0, 10.0]), jnp.asarray([5.0, 10.0]),
            )
        )
        got = eval_host.calculate_joint_ap(
            vals, off, valid, np.asarray([5.0, 10.0]), np.asarray([5.0, 10.0])
        )
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestSafeNormalizeGradients:
    def test_finite_grad_at_zero_vectors(self):
        """Background pixels / padded slots are exactly-zero vectors; the
        normalize gradient must stay finite there (the naive
        x / where(|x|>0, |x|, 1) formulation NaN'd every quaternion/xy
        gradient through 0 * NaN in where's backward)."""
        x = jnp.zeros((4, 3)).at[0].set(jnp.asarray([3.0, 4.0, 0.0]))

        def f(v):
            return jnp.sum(geometry.safe_normalize(v) ** 2)

        g = np.asarray(jax.grad(f)(x))
        assert np.isfinite(g).all()
        # zero rows keep identity behavior: d(sum(x^2))/dx = 2x = 0 there
        np.testing.assert_array_equal(g[1:], 0.0)
        # values unchanged by the reformulation
        out = np.asarray(geometry.safe_normalize(x))
        np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-6)
        np.testing.assert_array_equal(out[1:], 0.0)
