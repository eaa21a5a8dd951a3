"""Import torch ResNet weights (torchvision/smp layout) into the flax encoder.

Parity: the reference gets ImageNet weights through
smp.encoders.get_encoder(..., weights='imagenet')
(FPC/lib/pose_regressor.py:607-613), which downloads a torchvision ResNet
state_dict. This module converts such a state_dict (loaded with
torch.load / from a .pth file) into the {params, batch_stats} subtrees of
`models.resnet.ResNetEncoder`.

Conventions converted:
  torch Conv2d weight [out, in, kh, kw]  ->  flax kernel [kh, kw, in, out]
  torch BatchNorm weight/bias            ->  flax scale/bias
  torch running_mean/var                 ->  flax batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from fastposecnn_tpu.models.resnet import RESNET_SPECS


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _bn(prefix: str, sd: Mapping) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_torch_resnet(
    state_dict: Mapping, encoder_name: str = "resnet18"
) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict -> (params, batch_stats) subtrees
    matching ResNetEncoder's module names."""
    sd = {k: v for k, v in state_dict.items()}
    spec = RESNET_SPECS[encoder_name]
    # Stem kernels zero-pad C_in 3->4 to match the encoder's padded RGB
    # wire (resnet.py stem note): zero weights x always-zero alpha channel
    # keeps the forward bit-identical to torch.
    conv1 = _conv(sd["conv1.weight"])
    conv1 = np.pad(conv1, ((0, 0), (0, 0), (0, 1), (0, 0)))
    params: Dict = {"conv1": {"kernel": conv1}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn("bn1", sd)

    for stage, num_blocks in enumerate(spec.stage_sizes):
        for b in range(num_blocks):
            t = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            block_p: Dict = {}
            block_s: Dict = {}
            n_convs = 3 if spec.block == "bottleneck" else 2
            for ci in range(1, n_convs + 1):
                block_p[f"conv{ci}"] = {"kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
                block_p[f"bn{ci}"], block_s[f"bn{ci}"] = _bn(f"{t}.bn{ci}", sd)
            if f"{t}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])
                }
                (
                    block_p["downsample_bn"],
                    block_s["downsample_bn"],
                ) = _bn(f"{t}.downsample.1", sd)
            params[name] = block_p
            stats[name] = block_s
    return params, stats


def load_pretrained_encoder(variables: Dict, state_dict: Mapping,
                            encoder_name: str = "resnet18") -> Dict:
    """Return a copy of the model variables with the encoder subtree
    replaced by converted torch weights (shape-checked)."""
    import jax

    params, stats = convert_torch_resnet(state_dict, encoder_name)
    new_vars = jax.tree.map(lambda x: x, variables)  # shallow-ish copy

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    import flax

    new_vars = flax.core.unfreeze(new_vars)
    merge(new_vars["params"]["encoder"], params, "params")
    merge(new_vars["batch_stats"]["encoder"], stats, "batch_stats")
    return new_vars


def _gn(prefix: str, sd: Mapping) -> Dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def convert_fpn_decoder(sd: Mapping, prefix: str) -> Dict:
    """smp FPNDecoder state_dict subtree -> flax `models.fpn.FPNDecoder`
    params. Key layout per smp's fpn/decoder.py (the reference instantiates
    it 4x, FPC/lib/pose_regressor.py:616-630):
      {prefix}.p5.{weight,bias}                       1x1 lateral
      {prefix}.p{4,3,2}.skip_conv.{weight,bias}       FPNBlock laterals
      {prefix}.seg_blocks.{i}.block.{j}.block.0.weight  conv3x3 (no bias)
      {prefix}.seg_blocks.{i}.block.{j}.block.1.{weight,bias}  GroupNorm
    """
    params: Dict = {}
    params["p5"] = {
        "kernel": _conv(sd[f"{prefix}.p5.weight"]),
        "bias": np.asarray(sd[f"{prefix}.p5.bias"]),
    }
    for lvl in (4, 3, 2):
        params[f"p{lvl}"] = {
            "kernel": _conv(sd[f"{prefix}.p{lvl}.skip_conv.weight"]),
            "bias": np.asarray(sd[f"{prefix}.p{lvl}.skip_conv.bias"]),
        }
    for i, n_upsamples in enumerate((3, 2, 1, 0)):
        seg: Dict = {}
        for j in range(max(1, n_upsamples)):
            t = f"{prefix}.seg_blocks.{i}.block.{j}.block"
            seg[f"block{j}"] = {
                "conv": {"kernel": _conv(sd[f"{t}.0.weight"])},
                "gn": _gn(f"{t}.1", sd),
            }
        params[f"seg{i}"] = seg
    return params


def convert_segmentation_head(sd: Mapping, prefix: str) -> Dict:
    """smp SegmentationHead (Sequential: conv at index 0) -> flax
    `models.fpn.SegmentationHead` params (FPC pose_regressor.py:633-666)."""
    return {
        "conv": {
            "kernel": _conv(sd[f"{prefix}.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.0.bias"]),
        }
    }


# torch attribute name -> flax module name (decoder, head) per task
_TASK_MODULES = {
    "mask": ("mask_decoder", "segmentation_head"),
    "rotation": ("rotation_decoder", "rotation_head"),
    "translation": ("translation_decoder", "translation_head"),
    "scales": ("scales_decoder", "scales_head"),
}


def convert_pose_regressor(
    state_dict: Mapping, encoder_name: str = "resnet18"
) -> Tuple[Dict, Dict]:
    """Full reference checkpoint -> (params, batch_stats) for
    `PoseRegressorNet`: encoder + 4 FPN decoders + 4 heads
    (FPC/lib/pose_regressor.py:606-666). Expects the `model.` prefix
    already stripped (pose_regressor.py:530) — `load_state_dict_file`
    does that for Lightning checkpoints."""
    enc_sd = {k[len("encoder."):]: v for k, v in state_dict.items()
              if k.startswith("encoder.")}
    enc_params, enc_stats = convert_torch_resnet(enc_sd, encoder_name)
    params: Dict = {"encoder": enc_params}
    stats: Dict = {"encoder": enc_stats}
    for task, (torch_dec, torch_head) in _TASK_MODULES.items():
        params[f"{task}_decoder"] = convert_fpn_decoder(state_dict, torch_dec)
        params[f"{task}_head"] = convert_segmentation_head(
            state_dict, torch_head
        )
    return params, stats


def load_full_checkpoint(variables: Dict, state_dict: Mapping,
                         encoder_name: str = "resnet18") -> Dict:
    """Return model variables with EVERY subtree replaced by converted
    torch weights (shape-checked against the flax init shapes)."""
    import flax
    import jax

    params, stats = convert_pose_regressor(state_dict, encoder_name)
    new_vars = flax.core.unfreeze(jax.tree.map(lambda x: x, variables))

    def merge(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    raise KeyError(f"no flax module at {path}/{k}")
                merge(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                dst[k] = v.astype(np.asarray(dst[k]).dtype)

    merge(new_vars["params"], params, "params")
    merge(new_vars["batch_stats"], stats, "batch_stats")
    return new_vars


def load_state_dict_file(path):
    """Load a torch .pth/.pt state_dict on CPU (no CUDA needed)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    # Lightning saves the task module; strip the nn.Module attribute prefix
    # exactly like the reference (FPC pose_regressor.py:530).
    obj = {k.replace("model.", "", 1) if k.startswith("model.") else k: v
           for k, v in obj.items()}
    return {k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")}
