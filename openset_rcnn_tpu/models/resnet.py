"""ResNet-50 backbone with FrozenBN, NHWC, explicit torch-compatible padding.

TPU-native rebuild of the d2 ResNet the reference composes via
``build_resnet_fpn_backbone`` (configs/Base-RCNN-FPN.yaml:3-8, SURVEY.md
§2.4). Key behavioral requirements reproduced:
  * FrozenBN everywhere (fixed running stats AND fixed affine params);
  * ``FREEZE_AT=2`` => stem + res2 receive no gradient (enforced by the
    optimizer's trainability mask, see engine/optimizer.py);
  * stride-2 convs with torch-style symmetric padding so ported torch
    weights produce identical activations (XLA 'SAME' pads asymmetrically).

Layout is NHWC (TPU-preferred); the conv compute dtype is configurable
(bfloat16 for the trunk keeps the MXU fed at full rate).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

# Block counts per stage for each supported depth.
STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics and affine parameters.

    Parameters live in the 'params' collection but are excluded from the
    optimizer by the trainability mask (they match d2's FrozenBatchNorm2d,
    which never updates).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        w = scale / jnp.sqrt(var + self.eps)
        b = bias - mean * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def _conv(features: int, kernel: int, stride: int = 1, name: str | None = None, dtype=None):
    # NOTE: without an explicit ``dtype``, flax promotes the input to the
    # param dtype (f32) — silently undoing any bf16 cast of the activations.
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
        dtype=dtype,
    )


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        dt = self.compute_dtype

        out = _conv(self.bottleneck_channels, 1, s1, name="conv1", dtype=dt)(x)
        out = FrozenBN(self.bottleneck_channels, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.bottleneck_channels, 3, s3, name="conv2", dtype=dt)(out)
        out = FrozenBN(self.bottleneck_channels, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.out_channels, 1, 1, name="conv3", dtype=dt)(out)
        out = FrozenBN(self.out_channels, name="bn3")(out)

        if self.has_shortcut:
            sc = _conv(self.out_channels, 1, self.stride, name="shortcut", dtype=dt)(x)
            sc = FrozenBN(self.out_channels, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Returns a dict of {res2, res3, res4, res5} NHWC feature maps."""

    depth: int = 50
    stem_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    compute_dtype: Any = jnp.float32
    remat: bool = False  # rematerialize blocks: ~30% more FLOPs, ~2x batch

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.compute_dtype)
        dt = self.compute_dtype if self.compute_dtype != jnp.float32 else None
        # Stem: 7x7/2 conv + 3x3/2 maxpool (torch padding 3 and 1).
        x = _conv(self.stem_channels, 7, 2, name="stem_conv", dtype=dt)(x)
        x = FrozenBN(self.stem_channels, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = nn.remat(BottleneckBlock) if self.remat else BottleneckBlock
        outputs: Dict[str, jnp.ndarray] = {}
        blocks = STAGE_BLOCKS[self.depth]
        out_ch = self.res2_out_channels
        bott_ch = out_ch // 4
        for stage_idx, num_blocks in enumerate(blocks):
            stage_name = f"res{stage_idx + 2}"
            for b in range(num_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                x = block_cls(
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    stride=stride,
                    stride_in_1x1=self.stride_in_1x1,
                    has_shortcut=(b == 0),
                    compute_dtype=dt,
                    name=f"{stage_name}_block{b}",
                )(x)
            if stage_name in self.out_features:
                outputs[stage_name] = x
            out_ch *= 2
            bott_ch *= 2
        return outputs
