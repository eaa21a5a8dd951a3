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

    def test_full_model_logit_golden(self, rng):
        """Converted full checkpoint reproduces the torch reference network's
        logits (encoder + 4 smp FPN decoders + 4 heads) to ~1e-4.

        The torch side is `models.torch_ref.TorchPoseRegressor`, a replica
        of FPC/lib/pose_regressor.py:575-743 with the released-checkpoint
        state_dict key layout."""
        from fastposecnn_tpu.models.torch_ref import TorchPoseRegressor
        from fastposecnn_tpu.models.weights import load_full_checkpoint

        torch.manual_seed(0)
        classes = 3
        tmodel = TorchPoseRegressor(classes=classes).eval()
        # Non-trivial BN running stats so eval-mode normalization is tested.
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.5)
                    m.running_var.uniform_(0.5, 1.5)
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x))

        net = PoseRegressorNet(num_classes=classes)
        x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        variables = net.init(jax.random.key(0), x_nhwc)
        merged = load_full_checkpoint(variables, sd)
        ours = net.apply(merged, x_nhwc, train=False)

        for key in ("mask", "quaternion", "xy", "z", "scales"):
            got = np.asarray(ours[key]).transpose(0, 3, 1, 2)
            want = ref[key].numpy()
            np.testing.assert_allclose(
                got, want, atol=2e-4, rtol=1e-4,
                err_msg=f"logit mismatch in '{key}'",
            )

    def test_lightning_ckpt_roundtrip(self, rng, tmp_path):
        """A Lightning-style .ckpt ('model.'-prefixed state_dict +
        hyper_parameters) loads via load_any_checkpoint: arch fields merge
        (pose_regressor.py:516-525) and logits match torch."""
        from fastposecnn_tpu import config as C
        from fastposecnn_tpu.models.torch_ref import TorchPoseRegressor
        from fastposecnn_tpu.train import checkpoint as ckpt
        from fastposecnn_tpu.train import optim
        from fastposecnn_tpu.train.task import create_train_state

        torch.manual_seed(1)
        selected = ("bg", "bottle", "bowl")
        tmodel = TorchPoseRegressor(classes=len(selected)).eval()
        path = tmp_path / "epoch=9.ckpt"
        torch.save(
            {
                "state_dict": {
                    f"model.{k}": v for k, v in tmodel.state_dict().items()
                },
                "hyper_parameters": {
                    "MODEL": "PoseRegressor",
                    "BACKBONE_ARCH": "FPN",
                    "ENCODER": "resnet18",
                    "ENCODER_WEIGHTS": "imagenet",
                    "SELECTED_CLASSES": list(selected),
                },
            },
            path,
        )

        hp = C.inference()  # default 7-class preset
        assert ckpt.is_torch_checkpoint(path)
        hp = ckpt.merge_arch_from_any(path, hp)
        assert hp.SELECTED_CLASSES == selected  # arch came from the ckpt

        import dataclasses

        hp = dataclasses.replace(hp, IMAGE_HEIGHT=64, IMAGE_WIDTH=64)
        net = PoseRegressorNet(num_classes=hp.num_classes,
                               encoder_name=hp.ENCODER)
        state = create_train_state(
            net, optim.make_optimizer(hp), jax.random.key(0), hp
        )
        state, hp = ckpt.load_any_checkpoint(path, state, hp)

        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x))["mask"].numpy()
        got = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
        )["mask"]
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4, rtol=1e-4
        )

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
