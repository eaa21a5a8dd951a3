"""Minimal torch replica of the reference PoseRegressor (checkpoint layout).

Purpose: the released FastPoseCNN checkpoints (reference README.md:97) are
plain torch state_dicts whose key layout comes from torchvision ResNet +
segmentation_models_pytorch's FPN (smp commit 1f1be17, cited at
FPC/lib/pose_regressor.py:577-579). Neither torchvision nor smp is
available in this image, so this module re-creates ONLY the module tree
needed to (a) golden-test the torch->flax converter at logit level and
(b) let users load/inspect reference checkpoints without installing smp.

This is an independent implementation written from the architecture
description; the state_dict key names are forced by the checkpoint format:
  encoder.conv1.weight, encoder.layer{1-4}.{b}.conv{1,2}.weight, ...
  {mask,rotation,translation,scales}_decoder.p5.weight,
  ..._decoder.p{4,3,2}.skip_conv.weight,
  ..._decoder.seg_blocks.{i}.block.{j}.block.{0,1}.*,
  {segmentation,rotation,translation,scales}_head.0.{weight,bias}

Reference semantics replicated (FPC/lib/pose_regressor.py:575-743):
  - depth-5 resnet encoder -> 6 feature maps;
  - FPN decoder: 1x1 laterals to 256ch, nearest-x2 top-down adds,
    seg blocks (conv3x3 + GroupNorm(32) + ReLU, bilinear align_corners
    x2 upsamples) down to 128ch at 1/4 res, 'add' merge, Dropout2d(0.2);
  - heads: 1x1 conv + x4 UpsamplingBilinear2d (kernel_size=1, upsampling=4
    per pose_regressor.py:633-666);
  - xyz->xy,z channel split (pose_regressor.py:727-732).

Requires torch (cpu is fine); import is deferred so the rest of the
package never depends on it.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

_RESNET_STAGES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
}


class _BasicBlock(nn.Module):
    """torchvision BasicBlock key layout: conv1/bn1/conv2/bn2/downsample."""

    def __init__(self, in_ch: int, out_ch: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class TorchResNetEncoder(nn.Module):
    """smp ResNetEncoder contract: 6 feature maps, torchvision keys."""

    def __init__(self, name: str = "resnet18"):
        super().__init__()
        stages = _RESNET_STAGES[name]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        widths = (64, 128, 256, 512)
        in_ch = 64
        for i, (n_blocks, w) in enumerate(zip(stages, widths)):
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                blocks.append(_BasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.out_channels = (3, 64, 64, 128, 256, 512)

    def forward(self, x):
        feats = [x]
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            feats.append(x)
        return feats


class _Conv3x3GNReLU(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, upsample: bool):
        super().__init__()
        self.upsample = upsample
        self.block = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, stride=1, padding=1, bias=False),
            nn.GroupNorm(32, out_ch),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
        return x


class _FPNBlock(nn.Module):
    def __init__(self, pyramid_ch: int, skip_ch: int):
        super().__init__()
        self.skip_conv = nn.Conv2d(skip_ch, pyramid_ch, kernel_size=1)

    def forward(self, x, skip):
        return (F.interpolate(x, scale_factor=2, mode="nearest")
                + self.skip_conv(skip))


class _SegmentationBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, n_upsamples: int = 0):
        super().__init__()
        blocks = [_Conv3x3GNReLU(in_ch, out_ch, upsample=bool(n_upsamples))]
        blocks += [_Conv3x3GNReLU(out_ch, out_ch, upsample=True)
                   for _ in range(1, n_upsamples)]
        self.block = nn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class TorchFPNDecoder(nn.Module):
    def __init__(self, encoder_channels, pyramid_channels: int = 256,
                 segmentation_channels: int = 128, dropout: float = 0.2):
        super().__init__()
        self.out_channels = segmentation_channels
        c5, c4, c3, c2 = encoder_channels[::-1][:4]
        self.p5 = nn.Conv2d(c5, pyramid_channels, kernel_size=1)
        self.p4 = _FPNBlock(pyramid_channels, c4)
        self.p3 = _FPNBlock(pyramid_channels, c3)
        self.p2 = _FPNBlock(pyramid_channels, c2)
        self.seg_blocks = nn.ModuleList([
            _SegmentationBlock(pyramid_channels, segmentation_channels, n)
            for n in (3, 2, 1, 0)
        ])
        self.dropout = nn.Dropout2d(p=dropout, inplace=True)

    def forward(self, *features):
        c2, c3, c4, c5 = features[-4:]
        p5 = self.p5(c5)
        p4 = self.p4(p5, c4)
        p3 = self.p3(p4, c3)
        p2 = self.p2(p3, c2)
        maps = [b(p) for b, p in zip(self.seg_blocks, (p5, p4, p3, p2))]
        x = maps[0] + maps[1] + maps[2] + maps[3]
        return self.dropout(x)


def _segmentation_head(in_ch: int, out_ch: int, upsampling: int = 4
                       ) -> nn.Sequential:
    """smp SegmentationHead with kernel_size=1 (pose_regressor.py:637)."""
    layers = [nn.Conv2d(in_ch, out_ch, kernel_size=1)]
    if upsampling > 1:
        layers.append(nn.UpsamplingBilinear2d(scale_factor=upsampling))
    return nn.Sequential(*layers)


class TorchPoseRegressor(nn.Module):
    """The reference's pure network (pose_regressor.py:709-743), with the
    exact attribute names the Lightning checkpoints use (after the 'model.'
    prefix strip of pose_regressor.py:530)."""

    def __init__(self, classes: int = 7, encoder_name: str = "resnet18",
                 pyramid_channels: int = 256,
                 segmentation_channels: int = 128, upsampling: int = 4):
        super().__init__()
        self.classes = classes
        self.encoder = TorchResNetEncoder(encoder_name)
        ec = self.encoder.out_channels
        kw = dict(pyramid_channels=pyramid_channels,
                  segmentation_channels=segmentation_channels)
        self.mask_decoder = TorchFPNDecoder(ec, **kw)
        self.rotation_decoder = TorchFPNDecoder(ec, **kw)
        self.translation_decoder = TorchFPNDecoder(ec, **kw)
        self.scales_decoder = TorchFPNDecoder(ec, **kw)
        sc = segmentation_channels
        self.segmentation_head = _segmentation_head(sc, classes, upsampling)
        self.rotation_head = _segmentation_head(sc, 4 * (classes - 1),
                                                upsampling)
        self.translation_head = _segmentation_head(sc, 3 * (classes - 1),
                                                   upsampling)
        self.scales_head = _segmentation_head(sc, 3 * (classes - 1),
                                              upsampling)

    @torch.no_grad()
    def forward(self, x):
        feats = self.encoder(x)
        mask = self.segmentation_head(self.mask_decoder(*feats))
        quat = self.rotation_head(self.rotation_decoder(*feats))
        xyz = self.translation_head(self.translation_decoder(*feats))
        scales = self.scales_head(self.scales_decoder(*feats))
        # channel split per pose_regressor.py:727-732: per class k the xyz
        # group is (x,y,z) = channels (3k, 3k+1, 3k+2).
        n = xyz.shape[1]
        xy_index = [i for i in range(n) if i % 3 != 2]
        z_index = [i for i in range(n) if i % 3 == 2]
        return {
            "mask": mask,
            "quaternion": quat,
            "xy": xyz[:, xy_index],
            "z": xyz[:, z_index],
            "scales": scales,
        }
