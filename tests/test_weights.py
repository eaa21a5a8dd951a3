"""Weight-import tests: conv/BN convention equivalence vs torch, and a full
synthesized-resnet18 state_dict conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.models.resnet import ResNetEncoder
from fastposecnn_tpu.models.weights import (
    convert_torch_resnet,
    load_pretrained_encoder,
)


def synth_resnet18_state_dict(rng):
    """Random state_dict with torchvision resnet18 keys/shapes."""
    sd = {}

    def conv(name, out_c, in_c, k):
        # fan-in scaling keeps 18 stacked layers finite in f32
        scale = 1.0 / np.sqrt(in_c * k * k)
        sd[f"{name}.weight"] = (
            rng.normal(size=(out_c, in_c, k, k)) * scale
        ).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_var"] = (
            rng.random(size=(c,)).astype(np.float32) + 0.5
        )

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_c = 64
    for stage in range(4):
        w = widths[stage]
        for b in range(2):
            t = f"layer{stage + 1}.{b}"
            conv(f"{t}.conv1", w, in_c if b == 0 else w, 3)
            bn(f"{t}.bn1", w)
            conv(f"{t}.conv2", w, w, 3)
            bn(f"{t}.bn2", w)
            if b == 0 and stage > 0:
                conv(f"{t}.downsample.0", w, in_c, 1)
                bn(f"{t}.downsample.1", w)
        in_c = w
    return sd


class TestConvBnEquivalence:
    def test_first_conv_bn_matches_torch(self, rng):
        """Our converted conv1+bn1(+relu) must reproduce torch exactly."""
        sd = synth_resnet18_state_dict(rng)
        x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)

        tconv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        tbn = torch.nn.BatchNorm2d(64, eps=1e-5)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(sd["conv1.weight"]))
            tbn.weight.copy_(torch.from_numpy(sd["bn1.weight"]))
            tbn.bias.copy_(torch.from_numpy(sd["bn1.bias"]))
            tbn.running_mean.copy_(torch.from_numpy(sd["bn1.running_mean"]))
            tbn.running_var.copy_(torch.from_numpy(sd["bn1.running_var"]))
            tbn.eval()
            ref = torch.relu(tbn(tconv(torch.from_numpy(x)))).numpy()

        enc = ResNetEncoder("resnet18")
        variables = enc.init(jax.random.key(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
        params, stats = convert_torch_resnet(sd)
        import flax

        v = flax.core.unfreeze(variables)
        v["params"]["conv1"]["kernel"] = params["conv1"]["kernel"]
        v["params"]["bn1"] = jax.tree.map(jnp.asarray, params["bn1"])
        v["batch_stats"]["bn1"] = jax.tree.map(jnp.asarray, stats["bn1"])
        feats = enc.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1)))
        ours = np.asarray(feats[1]).transpose(0, 3, 1, 2)  # stage-1 feature
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestFullConversion:
    def test_structure_and_shapes(self, rng):
        sd = synth_resnet18_state_dict(rng)
        net = PoseRegressorNet(num_classes=7)
        x = jnp.zeros((1, 32, 32, 3))
        variables = net.init(jax.random.key(0), x)
        merged = load_pretrained_encoder(variables, sd)
        # Every encoder param leaf must now equal the converted source.
        params, stats = convert_torch_resnet(sd)
        got = merged["params"]["encoder"]["layer2_0"]["downsample_conv"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(got), params["layer2_0"]["downsample_conv"]["kernel"]
        )
        # And the network still runs.
        out = net.apply(merged, x)
        assert np.isfinite(np.asarray(out["mask"])).all()

    def test_shape_mismatch_raises(self, rng):
        sd = synth_resnet18_state_dict(rng)
        sd["conv1.weight"] = sd["conv1.weight"][:32]  # wrong out channels
        net = PoseRegressorNet(num_classes=7)
        variables = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        try:
            load_pretrained_encoder(variables, sd)
            raised = False
        except ValueError as e:
            raised = "shape mismatch" in str(e)
        assert raised
