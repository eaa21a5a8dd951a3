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
