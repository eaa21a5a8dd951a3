"""Forward shape/NaN smoke tests for the network (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu.models import PoseRegressorNet


class TestPoseRegressorNet:
    def test_forward_shapes(self, rng):
        net = PoseRegressorNet(num_classes=7)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        variables = net.init(jax.random.key(0), x)
        out = net.apply(variables, x)
        assert out["mask"].shape == (1, 64, 64, 7)
        assert out["quaternion"].shape == (1, 64, 64, 24)
        assert out["xy"].shape == (1, 64, 64, 12)
        assert out["z"].shape == (1, 64, 64, 6)
        assert out["scales"].shape == (1, 64, 64, 18)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_train_mode_mutates_batch_stats(self, rng):
        net = PoseRegressorNet(num_classes=3)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        variables = net.init(jax.random.key(0), x)
        out, mutated = net.apply(
            variables,
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        assert "batch_stats" in mutated
        assert out["mask"].shape == (2, 32, 32, 3)

    def test_encoder_pyramid_channels(self, rng):
        from fastposecnn_tpu.models import ResNetEncoder

        enc = ResNetEncoder("resnet18")
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        variables = enc.init(jax.random.key(0), x)
        feats = enc.apply(variables, x)
        chans = [f.shape[-1] for f in feats]
        res = [f.shape[1] for f in feats]
        assert chans == [3, 64, 64, 128, 256, 512]
        assert res == [64, 32, 16, 8, 4, 2]


class TestUpsample:
    def test_bilinear_matches_torch_upsampling(self, rng):
        import torch

        from fastposecnn_tpu.models.fpn import upsample_bilinear

        x = rng.normal(size=(2, 6, 8, 3)).astype(np.float32)
        ours = np.asarray(upsample_bilinear(jnp.asarray(x), 4))
        ref = torch.nn.UpsamplingBilinear2d(scale_factor=4)(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_nearest_matches_torch(self, rng):
        import torch

        from fastposecnn_tpu.models.fpn import upsample_nearest

        x = rng.normal(size=(1, 5, 7, 2)).astype(np.float32)
        ours = np.asarray(upsample_nearest(jnp.asarray(x), 2))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
            mode="nearest",
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, ref)


def test_head_bias_init():
    """z/scales head bias inits land on the right channels (z channels are
    3k+2 of the translation head) and default to reference parity (zeros)."""
    from fastposecnn_tpu.models import PoseRegressorNet

    net = PoseRegressorNet(num_classes=4, z_bias_init=7.0,
                           scales_bias_init=0.25)
    v = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    tb = np.asarray(v["params"]["translation_head"]["conv"]["bias"])
    sb = np.asarray(v["params"]["scales_head"]["conv"]["bias"])
    assert tb.shape == (9,) and sb.shape == (9,)
    np.testing.assert_allclose(tb, [0, 0, 7.0] * 3)
    np.testing.assert_allclose(sb, [0.25] * 9)

    default = PoseRegressorNet(num_classes=4)
    v0 = default.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    np.testing.assert_allclose(
        np.asarray(v0["params"]["translation_head"]["conv"]["bias"]), 0.0
    )
